package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrowColumnarSpec extends SparkSpec {

  test("mapDoubleBatches runs a columnar kernel per Arrow batch, nulls preserved") {
    val s = spark
    import s.implicits._
    val df = Seq[java.lang.Double](1.0, 2.0, null, 4.0, 5.0, null, 7.0)
      .toDF("x")
    // kernel: x*2 + 1 over the whole vector (null slots untouched)
    val out = ArrowColumnar.mapDoubleBatches(df, "x", "y", batchSize = 3) { vec =>
      var i = 0
      while (i < vec.getValueCount) {
        if (!vec.isNull(i)) vec.set(i, vec.get(i) * 2.0 + 1.0)
        i += 1
      }
    }
    val rows = out.select("x", "y").collect().map { r =>
      (Option(r.get(0)).map(_.asInstanceOf[Double]),
       Option(r.get(1)).map(_.asInstanceOf[Double]))
    }.toSeq
    assert(rows == Seq(
      (Some(1.0), Some(3.0)), (Some(2.0), Some(5.0)), (None, None),
      (Some(4.0), Some(9.0)), (Some(5.0), Some(11.0)), (None, None),
      (Some(7.0), Some(15.0))))
  }

  test("mapDoubleBatches releases Arrow buffers under early termination (LIMIT)") {
    val s = spark
    import s.implicits._
    val df = (1 to 10000).map(_.toDouble).toDF("x")
    val out = ArrowColumnar.mapDoubleBatches(df, "x", "y", batchSize = 256)(_ => ())
    // LIMIT stops the consumer mid-partition; the task-completion hook
    // must still close the off-heap buffers (a leak throws on close, and
    // the allocator would log/throw IllegalStateException otherwise).
    assert(out.limit(7).collect().length == 7)
    // and a full pass still works afterwards
    assert(out.agg(sum("y")).as[Double].head() == (1 to 10000).map(_.toDouble).sum)
  }

  test("mapDoubleBatches validates column type") {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val e = intercept[IllegalArgumentException] {
      ArrowColumnar.mapDoubleBatches(df, "x", "y")(_ => ())
    }
    assert(e.getMessage.contains("must be DOUBLE"))
  }

  test("zscore kernel is bit-identical to the expression twin on embeddings") {
    val s = spark
    // the real operator: corpus standardization of embedding components
    val got = VectorSearch.componentZscores(s, sf001, batchSize = 512)
      .select("vec_id", "pos", "z")
    // expression-based twin computed independently (same agg, codegen'd
    // arithmetic instead of the Arrow kernel)
    val comps = graft.schema.Tables.t(s, sf001, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"), col("col").cast("double").as("comp"))
    val st = comps.agg(avg(col("comp")), stddev_samp(col("comp"))).head()
    val twin = comps.select(col("vec_id"), col("pos"),
      ((col("comp") - st.getDouble(0)) / st.getDouble(1)).as("z"))
    // (x − m) / sd is the same two IEEE-754 ops in both paths → exact match
    assert(got.count() == twin.count() && got.count() > 0)
    assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty)
  }

  test("zscore rejects a zero/NaN std") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, 2.0).toDF("x")
    intercept[IllegalArgumentException](ArrowColumnar.zscore(df, "x", "z", 0.0, 0.0))
  }
}
