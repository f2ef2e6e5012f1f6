package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** Quality property the q139 oracle cannot express: int8 quantization is
  * an APPROXIMATION, so its top-k must substantially agree with the exact
  * float ranking it stands in for. */
class QuantizedAnnSpec extends SparkSpec {

  test("quantized top-10 recalls >= 7 of the exact raw-dot top-10") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.schema.Tables.t(spark, sf001, "embeddings")
    val qrow = emb.filter(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qe"))
    val exact = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qrow))
      .select(col("vec_id"), expr(
        "graft_dot(transform(embedding, x -> CAST(x AS DOUBLE)), qe)").as("d"))
      .orderBy(col("d").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val quantized = SparkEntry.queries("q139_quantized_ann")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exact & quantized).size
    assert(overlap >= 7, s"int8 recall@10 too low: $overlap/10 (exact=$exact, q=$quantized)")
  }

  test("quantized scores: integer dot exact, approx_dot consistent with it") {
    val rows = SparkEntry.queries("q139_quantized_ann")(spark, sf001).collect()
    assert(rows.length == 10)
    val qdots = rows.map(_.getLong(1))
    assert(qdots.zip(qdots.tail).forall { case (a, b) => a >= b }, "not descending")
    // approx_dot must be a positive rescale of q_dot (same sign, same order
    // up to per-vector scale wobble); spot-check sign agreement
    rows.foreach { r =>
      assert(r.getLong(1) == 0 || (r.getLong(1) > 0) == (r.getDouble(2) > 0))
    }
  }
}
