package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[StringSim]] to the DuckDB oracle functions' semantics. The
  * expected values are DuckDB probe constants captured 2026-08-14
  * (`jaro_similarity` / `jaro_winkler_similarity` / `damerau_levenshtein`
  * in duckdb 1.x) — including the conventions that differ between common
  * implementations: byte (not code-point) alphabet, both-empty → 0.0,
  * integer-halved transpositions, strict > 0.7 boost threshold, prefix
  * cap 4, unrestricted (not OSA) Damerau. */
class StringSimSpec extends SparkSpec {

  private def jaro(a: String, b: String): Double =
    StringSim.jaroBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  private def jw(a: String, b: String): Double =
    StringSim.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
  private def dam(a: String, b: String): Int =
    StringSim.damerauBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("jaro matches DuckDB probe constants") {
    assert(math.abs(jaro("martha", "marhta") - 0.9444444444444445) < 1e-12)
    assert(math.abs(jaro("dixon", "dicksonx") - 0.7666666666666666) < 1e-12)
    assert(math.abs(jaro("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(jaro("CA", "ABC") == 0.0)
    assert(jaro("abcdef", "abcdef") == 1.0)
    assert(jaro("", "abc") == 0.0)
    assert(jaro("", "") == 0.0) // DuckDB: both-empty is 0, not 1
    assert(jaro("ab", "ba") == 0.0) // window 0 — no cross-position match
    // integer-halved transpositions: 3 mismatched aligned pairs → t=1
    assert(math.abs(jaro("abcdef", "bcaxyz") - 0.5555555555555555) < 1e-12)
    assert(math.abs(jaro("abcdef", "badcfe") - 0.8333333333333334) < 1e-12)
    // byte alphabet: é is 2 bytes, so the byte-level match set differs
    assert(math.abs(jaro("résumé", "resume") - 0.7222222222222222) < 1e-9)
  }

  test("jaro-winkler boost: threshold 0.7, prefix cap 4") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    // jaro 0.5619 < 0.7 with 4-byte common prefix: NOT boosted
    assert(math.abs(jw("abcdxxxxxx", "abcdyyyyyyzzzz") - 0.5619047619047619) < 1e-12)
    assert(math.abs(jw("aaaaa", "aabbb") - 0.6) < 1e-12)
    // 6-byte common prefix counts as 4 (cap): 0.8333… + 4·0.1·(1−j) = 0.9
    assert(math.abs(jw("abcdefxx", "abcdefyy") - 0.9) < 1e-12)
    // boundary arithmetic: (3/5 + 3/6 + 1)/3 lands just above 0.7 → boosted
    assert(math.abs(jw("abcxx", "abcyyy") - 0.79) < 1e-12)
  }

  test("damerau is unrestricted Lowrance–Wagner on bytes") {
    assert(dam("CA", "ABC") == 2) // OSA would give 3
    assert(dam("martha", "marhta") == 1)
    assert(dam("ab", "ba") == 1)
    assert(dam("kitten", "sitting") == 3)
    assert(dam("dixon", "dicksonx") == 4)
    assert(dam("", "") == 0)
    assert(dam("", "abc") == 3)
    assert(dam("résumé", "resume") == 4) // bytes, not code points
    assert(dam("日本語テスト", "日本語てすと") == 6)
  }

  test("expressions evaluate through SQL text and codegen") {
    val df = spark.range(1).selectExpr(
      "graft_jaro('martha', 'marhta') AS j",
      "graft_jaro_winkler('dixon', 'dicksonx') AS w",
      "graft_damerau('CA', 'ABC') AS d",
      "graft_jaro(NULL, 'x') AS nj")
    val r = df.collect()(0)
    assert(math.abs(r.getDouble(0) - 0.9444444444444445) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.8133333333333332) < 1e-12)
    assert(r.getInt(2) == 2)
    assert(r.isNullAt(3))
  }
}
