package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FoldAccentsSpec extends SparkSpec {

  private def refFold(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{Mn}+", "")

  test("native fold matches the regex reference, incl. multi-mark and non-Latin") {
    val cases = Seq(
      "crème brûlée", "déjà vu", "ñoño", "École", "üÜöÖ",
      "é̈clair", // stacked marks on one base
      "ASCII only stays ASCII", "",
      "mixed ascii and café and 漢字", "ẞ groß", "ₑ⃗vector")
    cases.foreach { c =>
      val got = spark.range(1).select(
        graft.functions.GraftFunctions.fold_accents(lit(c))).head().getString(0)
      assert(got == refFold(c), s"'$c': '$got' != '${refFold(c)}'")
    }
  }

  test("ASCII fast path returns the input byte-identically") {
    val s = "plain ascii text with 123 and !?"
    val got = spark.range(1).select(
      graft.functions.GraftFunctions.fold_accents(lit(s))).head().getString(0)
    assert(got == s)
  }

  test("SQL-callable via the extensions-registered name; null-safe") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT fold_accents('crème'), fold_accents(CAST(NULL AS STRING))").head()
    assert(r.getString(0) == "creme")
    assert(r.isNullAt(1))
  }
}
