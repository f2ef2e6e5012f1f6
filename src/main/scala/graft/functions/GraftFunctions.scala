package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.Encoders

/** Session registration + Column-API wrappers for the engine's custom
  * functions. Registered through the FunctionRegistry so both SQL text and
  * the Column API (`call_function`) resolve them. */
object GraftFunctions {

  /** Idempotent; call once per SparkSession before using the wrappers. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "snappy_decode", exprs => SnappyDecode(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fold_accents", exprs => FoldAccents(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => ArrayDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_int", exprs => ArrayDotInt(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_dec", exprs => ArrayDotDec(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_matvec_dec", exprs => DecMatvec(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro", exprs => JaroSim(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", exprs => JaroWinklerSim(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_damerau", exprs => DamerauLevenshtein(exprs(0), exprs(1)), "scala_udf")
    spark.udf.register("weighted_avg", weightedAvgUdaf)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", topKBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk_weighted", topKWeightedBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_uniq_upto", uniqUpToBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_min_k", minKBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_split", md5SplitBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minHashBuilder, "scala_udf")
  }

  // ---- SQL surface for the mergeable sketch Aggregators (VERDICT r9
  // item 4): the reference's users speak SQL at the destination, so the
  // parity operators must resolve from SQL text, not only the typed
  // Column API. Each builder turns the call's trailing integer LITERAL
  // into the sketch size (state shape is a plan-time constant — a
  // per-row k would make partial buffers unmergeable) and wraps the
  // existing Aggregator in the same ScalaAggregator node
  // `functions.udaf` uses, so partial aggregation / map-side combine
  // behave identically to the typed path. ----

  /** The per-row sampling-coin idiom — the value of md5(x)'s first 8 hex
    * chars as an unsigned-32-bit long — via the native digest-bytes
    * expression instead of hex materialization + a general-radix string
    * parse: hex chars 1–8 are the top 32 bits of h1 (chars 1–14 ARE
    * digest bytes 0–6), so `conv(substring(md5(x), 1, 8), 16, 10)` ==
    * `graft_md5_split(x)[0] >> 24`, bit-exact (the h1 equality is
    * property-pinned in MinHashSigSpec; h1 < 2^56 makes the arithmetic
    * shift the unsigned one). For per-token/per-chunk coin volumes the
    * hex+conv cost class matters (SCALE.md round 13 measured it at ~3×
    * the digest itself on the shingle stage); per-doc coins keep the
    * hex form — the coin text doubles as the oracle's text there.
    * Caller must have run [[register]] on the session. */
  def coin8(x: Column): Column =
    org.apache.spark.sql.functions.shiftright(
      call_function("graft_md5_split", x).getItem(0), 24)

  /** Shared by the temp-function and extension registrations: a named
    * arity error instead of `exprs.head`'s bare NoSuchElementException on
    * zero args / silent drop of extras (ADVICE r13). */
  val md5SplitBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"graft_md5_split expects 1 argument, got ${exprs.length}")
    Md5Split(exprs.head)
  }

  private def litK(exprs: Seq[Expression], arity: Int, name: String): Int = {
    require(exprs.length == arity,
      s"$name expects $arity arguments, got ${exprs.length}")
    exprs.last match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$name: the sketch size must be an integer literal, got $other")
    }
  }

  /** `graft_topk(item, k)` — Misra–Gries candidate list (sorted array of
    * ≤2k items containing every item with frequency > n/k). */
  def topKBuilder(exprs: Seq[Expression]): Expression = {
    val k = litK(exprs, 2, "graft_topk")
    val bufEnc = ExpressionEncoder[Map[String, Long]]()
    val outEnc = ExpressionEncoder[Seq[String]]()
    new ScalaAggregator[String, Map[String, Long], Seq[String]](
      exprs.init, MisraGries(k)(bufEnc, outEnc),
      ExpressionEncoder[String](), bufEnc,
      true, true, 0, 0, Some("graft_topk"))
  }

  /** `graft_topk_weighted(item, weight, k)` — weighted Misra–Gries
    * candidates (every item with total weight > W/k retained). */
  def topKWeightedBuilder(exprs: Seq[Expression]): Expression = {
    val k = litK(exprs, 3, "graft_topk_weighted")
    val bufEnc = ExpressionEncoder[Map[String, Long]]()
    val outEnc = ExpressionEncoder[Seq[String]]()
    new ScalaAggregator[(String, Long), Map[String, Long], Seq[String]](
      exprs.init, MisraGriesWeighted(k)(bufEnc, outEnc),
      ExpressionEncoder[(String, Long)](), bufEnc,
      true, true, 0, 0, Some("graft_topk_weighted"))
  }

  /** `graft_min_k(x, k)` — the k smallest DISTINCT strings (the KMV
    * distinct sketch state / groupArraySorted surface, bounded state). */
  def minKBuilder(exprs: Seq[Expression]): Expression = {
    val k = litK(exprs, 2, "graft_min_k")
    val bufEnc = ExpressionEncoder[Seq[String]]()
    new ScalaAggregator[String, Seq[String], Seq[String]](
      exprs.init, MinK(k)(bufEnc, bufEnc),
      ExpressionEncoder[String](), bufEnc,
      true, true, 0, 0, Some("graft_min_k"))
  }

  /** `graft_uniq_upto(x, n)` — exact distinct count while ≤ n, else n+1
    * (bounded O(n) state per group). */
  def uniqUpToBuilder(exprs: Seq[Expression]): Expression = {
    val n = litK(exprs, 2, "graft_uniq_upto")
    val bufEnc = ExpressionEncoder[Set[Long]]()
    val outEnc = ExpressionEncoder[Long]()
    new ScalaAggregator[Long, Set[Long], Long](
      exprs.init, UniqUpTo(n)(bufEnc, outEnc),
      ExpressionEncoder[Long](), bufEnc,
      true, true, 0, 0, Some("graft_uniq_upto"))
  }

  /** `graft_minhash(h1, h2, k)` — the k-wide MinHash signature (one
    * `long[k]` buffer, seeds `(h1 + i·h2) mod (2^61−1)`) as an array;
    * bit-identical to k separate `min(pmod(h1 + i*h2, p))` columns. */
  def minHashBuilder(exprs: Seq[Expression]): Expression = {
    val k = litK(exprs, 3, "graft_minhash")
    val bufEnc = ExpressionEncoder[Array[Long]]()
    new ScalaAggregator[(Long, Long), Array[Long], Array[Long]](
      exprs.init, MinHashSig(k)(bufEnc),
      ExpressionEncoder[(Long, Long)](), bufEnc,
      true, true, 0, 0, Some("graft_minhash"))
  }

  def snappy_decode(c: Column): Column = call_function("snappy_decode", c)

  def nfc_normalize(c: Column): Column = call_function("nfc_normalize", c)

  def fold_accents(c: Column): Column = call_function("fold_accents", c)

  def graft_dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def graft_dot_int(a: Column, b: Column): Column = call_function("graft_dot_int", a, b)

  def graft_dot_dec(a: Column, b: Column): Column = call_function("graft_dot_dec", a, b)

  def graft_matvec_dec(a: Column, b: Column): Column =
    call_function("graft_matvec_dec", a, b)

  def weighted_avg(value: Column, weight: Column): Column =
    weightedAvgUdaf(value, weight)

  /** Weighted mean as a typed Aggregator (the UDAF surface, SURVEY.md §2.2).
    * Partial-aggregates (map-side combine) like any built-in: the buffer is
    * two doubles, merged associatively, so shuffle volume is |groups|. */
  case class WAvgBuf(wsum: Double, vsum: Double)

  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
      WAvgBuf(b.wsum + in._2, b.vsum + in._1 * in._2)
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.wsum + b.wsum, a.vsum + b.vsum)
    override def finish(r: WAvgBuf): Double =
      if (r.wsum == 0.0) Double.NaN else r.vsum / r.wsum
    override def bufferEncoder = Encoders.product[WAvgBuf]
    override def outputEncoder = Encoders.scalaDouble
  }

  lazy val weightedAvgUdaf = udaf(WeightedAvg)
}
