package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SnappyDecode}
import graft.ingest.{Pipeline, TopicConfig}

/** Ingest hot-path throughput: snappy-decode → JSON parse → sorted
  * projection+cast over synthetic Kafka-like payloads built from the
  * events table. This is the pipeline the reference serializes behind one
  * global mutex (`/root/reference/internal/collector/collector.go:173-174`
  * — its design ceiling is one core of JSON parsing); here it scales with
  * cores. Prints one JSON line: messages/second through the full decode
  * path. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionDefaults.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import spark.implicits._

    // Build the payload corpus once: each event becomes a snappy-compressed
    // flat JSON message, exactly the reference's wire format.
    val events = schema.Tables.t(spark, sfDir, "events")
    val repeat = sys.env.getOrElse("GRAFT_INGEST_REPEAT", "10").toInt
    val payloads = events.select(
        to_json(struct(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("props"))).as("json"))
      .as[String]
      .mapPartitions(_.map(j => SnappyDecode.compress(j.getBytes("UTF-8"))))
      .toDF("value")
      .withColumn("__rep", explode(sequence(lit(1), lit(repeat))))
      .drop("__rep")
      .withColumn("topic", lit("bench.events"))
      .repartition(cpus.toInt * 2)
      .persist()
    val n = payloads.count() // materialize outside the timed region

    val tc = TopicConfig("bench.events", "events",
      "event_id\tInt64\t\t\nuser_id\tInt64\t\t\nevent_type\tString\t\t\nvalue\tFloat64\t\t")

    // warm-up (codegen/JIT), then timed passes
    def pass(): Long =
      Pipeline.projectTopic(Pipeline.decoded(payloads), tc).count()
    pass()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val cnt = pass()
      assert(cnt == n)
      (System.nanoTime() - t0) / 1e9
    }
    val median = times.sorted.apply(times.size / 2)
    println(s"""{"metric":"ingest_msgs_per_sec","value":${(n / median).toLong},""" +
      s""""unit":"msgs/sec","n_msgs":$n,"pass_secs":${times.map(t =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))).mkString("[", ",", "]")},"cpus":$cpus}""")
    spark.stop()
  }
}
