package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
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
      "graft_dot", exprs => ArrayDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_int", exprs => ArrayDotInt(exprs(0), exprs(1)), "scala_udf")
    spark.udf.register("weighted_avg", weightedAvgUdaf)
  }

  def snappy_decode(c: Column): Column = call_function("snappy_decode", c)

  def nfc_normalize(c: Column): Column = call_function("nfc_normalize", c)

  def graft_dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def graft_dot_int(a: Column, b: Column): Column = call_function("graft_dot_int", a, b)

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
