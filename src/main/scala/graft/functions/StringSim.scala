package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro–Winkler similarity and unrestricted Damerau–Levenshtein
  * distance as native codegen'd Catalyst expressions.
  *
  * The reference's destination (ClickHouse) exposes the string-distance
  * family `jaroSimilarity` / `jaroWinklerSimilarity` /
  * `damerauLevenshteinDistance` / `editDistance` alongside the n-gram
  * similarity functions already covered (q42/q180/q201); fuzzy
  * record-linkage over short fields (names, titles, near-identical boilerplate
  * phrases) is the standard use. Spark has only `levenshtein`, so these are
  * the (b)-tier extension path from SURVEY.md §5 — codegen'd
  * `BinaryExpression`s whose generated code is one static call, keeping the
  * pair loop inside whole-stage codegen.
  *
  * Semantics are pinned to the DuckDB oracle's functions (probed, and
  * asserted against probe constants in StringSimSpec):
  *   - all three operate on UTF-8 BYTES, not code points ("résumé" vs
  *     "resume" → levenshtein 4, not 2) — matching DuckDB and ClickHouse;
  *   - Jaro: match window `max(|a|,|b|)/2 - 1` (floor, min 0), greedy
  *     left-to-right matching, transpositions = mismatched-aligned-pairs/2
  *     (integer division), sim = (m/|a| + m/|b| + (m-t)/m)/3; either side
  *     empty → 0.0 (including both empty — DuckDB's convention);
  *   - Jaro–Winkler: boost only when jaro > 0.7 (DuckDB's threshold),
  *     common-prefix length capped at 4 bytes, scale p = 0.1;
  *   - Damerau–Levenshtein: the UNRESTRICTED (Lowrance–Wagner) distance —
  *     "CA"→"ABC" = 2, not the optimal-string-alignment 3 — via the
  *     da[256]-alphabet DP over bytes (the byte alphabet is what makes the
  *     textbook da[] array a flat 256-slot table).
  *
  * Cost is O(|a|·|b|) per pair (DL allocates the (n+2)·(m+2) int matrix);
  * callers bound operand length by construction (q257 compares words ≤ 16
  * bytes after a first-byte block) — the same discipline as q180's
  * bounded-prefix Levenshtein.
  */
private[functions] trait StringSimBinary extends BinaryExpression {
  // NullType accepted for a bare NULL literal (parity with builtins like
  // levenshtein): the null-in → null-out path never reaches the kernel.
  private def ok(t: DataType) = t.isInstanceOf[StringType] || t == NullType
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
}

case class JaroSim(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringSim.jaro(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSim.jaro($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
    copy(left = l, right = r)
}

case class JaroWinklerSim(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringSim.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSim.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringSim.damerau(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSim.damerau($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

object StringSim {

  def jaro(a: UTF8String, b: UTF8String): Double = jaroBytes(a.getBytes, b.getBytes)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.getBytes
    val sb = b.getBytes
    val j = jaroBytes(sa, sb)
    if (j <= 0.7) j
    else {
      var l = 0
      val cap = math.min(4, math.min(sa.length, sb.length))
      while (l < cap && sa(l) == sb(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  private[functions] def jaroBytes(s: Array[Byte], t: Array[Byte]): Double = {
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val tr = mismatch / 2 // integer halving — DuckDB parity (StringSimSpec)
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - tr) / mm) / 3.0
  }

  def damerau(a: UTF8String, b: UTF8String): Int = damerauBytes(a.getBytes, b.getBytes)

  /** Lowrance–Wagner DP with the last-occurrence table over the 256-byte
    * alphabet. h is the (n+2)×(m+2) matrix flattened row-major. */
  private[functions] def damerauBytes(s: Array[Byte], t: Array[Byte]): Int = {
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val w = m + 2
    val h = new Array[Int]((n + 2) * w)
    h(0) = inf
    var i = 0
    while (i <= n) { h((i + 1) * w) = inf; h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { h(j + 1) = inf; h(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = da(t(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val trans = h(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        h((i + 1) * w + j + 1) = best
        j += 1
      }
      da(s(i - 1) & 0xff) = i
      i += 1
    }
    h((n + 1) * w + m + 1)
  }
}
