package graft.schema

import graft.SparkSpec
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Canary for driver-side testdata regeneration (VERDICT r7 item 3).
  *
  * Round 7 lost 20 queries and 6 tests to a single silent schema drift:
  * `events.ts` changed from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) parquet
  * and the loader's nanos rewrite became an AnalysisException. This suite
  * makes the next drift a NAMED failure that points at the table, before
  * any downstream query dies with an unrelated-looking error.
  */
class TestdataDriftSpec extends SparkSpec {

  test("all 10 tables load and are non-empty at sf0.001") {
    Tables.all.foreach { name =>
      val df = Tables.t(spark, sf001, name)
      assert(df.count() > 0, s"table '$name' is empty or failed to load")
    }
  }

  test("events.ts is a timestamp after Tables.t, whatever parquet shipped") {
    val ts = Tables.t(spark, sf001, "events").schema("ts").dataType
    assert(ts == TimestampType || ts == TimestampNTZType,
      s"events.ts loaded as $ts — loader must normalize to a timestamp")
  }

  test("views registration survives and registers every table") {
    Tables.views(spark, sf001)
    Tables.all.foreach { name =>
      assert(spark.catalog.tableExists(name), s"view '$name' not registered")
      assert(spark.sql(s"SELECT * FROM $name LIMIT 1").count() == 1L)
    }
  }
}
