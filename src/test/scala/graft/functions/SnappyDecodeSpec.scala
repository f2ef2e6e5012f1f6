package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnappyDecodeSpec extends SparkSpec {

  test("roundtrip through DataFrame expression (codegen path)") {
    import spark.implicits._
    val msgs = Seq("hello graft", """{"a":1}""", "")
    val df = msgs.map(m => SnappyDecode.compress(m.getBytes("UTF-8"))).toDF("payload")
    val out = df.select(expr("snappy_decode(payload)").cast("string").as("s"))
      .collect().map(_.getString(0))
    assert(out.toSeq == msgs)
  }

  test("null input → null output") {
    import spark.implicits._
    val df = Seq(Option.empty[Array[Byte]]).toDF("payload")
    assert(df.select(expr("snappy_decode(payload)")).collect().head.isNullAt(0))
  }

  test("corrupt payload → null (dead-letter semantics, not task failure)") {
    import spark.implicits._
    val df = Seq(Array[Byte](1, 2, 3, 4)).toDF("payload")
    assert(df.select(expr("snappy_decode(payload)")).collect().head.isNullAt(0))
  }

  test("non-binary input is rejected at analysis") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    intercept[Exception](df.select(expr("snappy_decode(x)")).collect())
  }
}
