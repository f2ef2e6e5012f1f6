package graft.ops

import org.apache.spark.sql.functions._

/** q330 tokenizer fertility: sequential JVM recomputation of every
  * metric from the learned merges, plus the bounds the metrics live in. */
class TokenizerFertilitySpec extends graft.SparkSpec {

  private def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b) {
          out.remove(out.length - 1); out += (a + b)
        } else out += x
      }
      out.toSeq
    }

  test("metrics match a sequential JVM tokenization pass") {
    val s = spark
    import s.implicits._
    val wd = graft.schema.Tables.t(s, sf001, "documents")
      .select(col("lang"), explode(TextCommon.wordsCol).as("word"))
    val qualifying = wd.filter(col("word").rlike("^[a-z]{4,}$"))
    val top20 = qualifying.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(20)
    val (merges, _) = SubstringOps.bpeTrain(top20, numMerges = 2)
    assert(merges.size === 2)

    val perLang = qualifying.as[(String, String)].collect()
      .groupBy(_._1).map { case (lang, rows) =>
        val toks = rows.map(r => applyMerges(r._2, merges).size.toLong).sum
        val chars = rows.map(_._2.length.toLong).sum
        lang -> (rows.length.toLong, toks, chars)
      }
    val all = wd.as[(String, String)].collect().groupBy(_._1).view.mapValues(_.length.toLong)

    val q = graft.SparkEntry.queries("q330_tokenizer_fertility")(s, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    perLang.foreach { case (lang, (occ, toks, chars)) =>
      val (qOcc, fert, cpt, bypass) = q(lang)
      assert(qOcc === occ, lang)
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(fert === r6(toks.toDouble / occ), lang)
      assert(cpt === r6(chars.toDouble / toks), lang)
      assert(bypass === r6((all(lang) - occ).toDouble / all(lang)), lang)
      // bounds: at least one symbol per word; merges can only shrink
      assert(fert >= 1.0 && cpt >= 1.0, lang)
      assert(fert <= chars.toDouble / occ, s"$lang fertility above raw char count")
    }
  }
}
