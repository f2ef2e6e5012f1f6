package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.schema.Tables

/** Batch source formats beyond parquet (SURVEY.md §2.2 scans): CSV and
  * JSON-lines roundtrips must preserve the data the engine ingests —
  * JSON-lines mirrors the reference's message format (S5). */
class SourcesSpec extends SparkSpec {

  private lazy val events = Tables.t(spark, sf001, "events")
    .select("event_id", "user_id", "event_type", "value")

  test("JSON-lines roundtrip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-json").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("CSV roundtrip with header and explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(events.schema)
      .option("header", "true").csv(dir)
    assert(back.count() == events.count())
    val a = events.agg(sum("event_id"), sum("user_id")).collect().head
    val b = back.agg(sum("event_id"), sum("user_id")).collect().head
    assert(a == b)
  }
}
