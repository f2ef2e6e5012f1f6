package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {

  // explicit escapes throughout: composed vs decomposed forms are visually
  // identical, so raw literals would be at the mercy of editor/normalizer
  private val decomposedCafe = "cafe\u0301" // "e" + combining acute, 5 chars
  private val composedCafe = "caf\u00e9" // precomposed é, 4 chars

  test("composes decomposed sequences (codegen path via extensions)") {
    import spark.implicits._
    val df = Seq(decomposedCafe, "ascii only").toDF("s")
    val out = df.select(expr("nfc_normalize(s)").as("n"),
      length(col("s")).as("lr"), length(expr("nfc_normalize(s)")).as("ln"))
      .collect()
    assert(out(0).getString(0) == composedCafe)
    assert(out(0).getInt(1) == 5 && out(0).getInt(2) == 4)
    assert(out(1).getString(0) == "ascii only")
  }

  test("already-NFC input is returned unchanged (fast path, interpreted eval)") {
    val composed = org.apache.spark.unsafe.types.UTF8String.fromString(composedCafe)
    // the quick-check branch must return the SAME object, not a copy
    assert(NfcNormalize.normalize(composed) eq composed)
    val decomposed = org.apache.spark.unsafe.types.UTF8String.fromString(decomposedCafe)
    assert(NfcNormalize.normalize(decomposed).toString == composedCafe)
  }

  test("null input → null output") {
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("s")
    assert(df.select(expr("nfc_normalize(s)")).collect().head.isNullAt(0))
  }

  test("non-string input is rejected at analysis") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    intercept[Exception](df.select(expr("nfc_normalize(x)")).collect())
  }
}
