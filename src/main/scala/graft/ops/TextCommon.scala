package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-parity helpers shared by the text families (TextDedup,
  * Curation): one definition of the whitespace tokenizer and of the
  * DuckDB hex→BIGINT md5 parse, so the parity-critical tricks cannot
  * drift between families when one of them is tweaked. */
private[ops] object TextCommon {

  /** words of the lower-cased, trimmed text (Spark side); oracles mirror
    * it as `string_split_regex(lower(trim(text)), '\s+')`. */
  val wordsCol: Column = split(lower(trim(col("text"))), "\\s+")

  /** DuckDB hex→BIGINT parse of `len` hex chars of `expr` starting at
    * 1-based `from` (DuckDB has no conv()); mirrors Spark's
    * `conv(substring(expr, from, len), 16, 10)` bit for bit. */
  def duckHex(expr: String, len: Int, from: Int = 1): String = {
    val end = from + len
    raw"""list_sum(list_transform(range($from, $end),
         |      j -> CAST((strpos('0123456789abcdef', substr($expr, j, 1)) - 1) AS BIGINT)
         |           * (CAST(1 AS BIGINT) << (4 * (${end - 1} - j)))))""".stripMargin
  }
}
