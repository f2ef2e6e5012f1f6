package graft.ops


import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Q
import graft.functions.{GraftFunctions, SnappyDecode}
import graft.schema.{ClickHouseSchema, Tables}

/** Batch-verifiable twins of the reference's ingest hot path (SURVEY.md
  * §2.1 S4–S13): snappy decode → JSON parse → schema-driven sorted
  * projection → cast, plus topic→table routing and count-threshold
  * batching semantics. The true streaming pipeline lives in
  * `graft.ingest.Pipeline`; these run the same column expressions in batch
  * so the DuckDB oracle can check them.
  */
object Ingest {

  /** Deterministic stand-ins for Kafka payloads (FIXTURES.md §B): flat JSON,
    * one row exercising absent-key→NULL, one with an extra key (dropped). */
  private val sampleMessages = Seq(
    """{"a": 1.5, "b": "x", "c": true}""",
    """{"a": 2.5, "b": "y", "c": false, "extra": 9}""",
    """{"b": "z", "d": null}""")

  val qs: Seq[Q] = Seq(

    // ---- S4+S5+S6: snappy decode → from_json → projection → aggregate ----
    // Input is built in-query (testdata has no binary column) and is
    // constant, so the oracle is the literal expected result.
    Q("q31_ingest_snappy",
      """SELECT CAST(3 AS BIGINT) AS n_msgs,
        |  4.0 AS sum_a,
        |  CAST(1 AS BIGINT) AS n_true,
        |  CAST(3 AS BIGINT) AS n_null_d""".stripMargin) { (s, _) =>
      GraftFunctions.register(s)
      import s.implicits._
      val payloads = sampleMessages.map(m => SnappyDecode.compress(m.getBytes("UTF-8")))
      val schema = StructType.fromDDL("a DOUBLE, b STRING, c BOOLEAN, d STRING")
      payloads.toDF("payload")
        .select(GraftFunctions.snappy_decode(col("payload")).cast("string").as("json"))
        .select(from_json(col("json"), schema).as("r"))
        .select(col("r.a").as("a"), col("r.b").as("b"), col("r.c").as("c"), col("r.d").as("d"))
        .agg(
          count(lit(1)).as("n_msgs"),
          sum(col("a")).as("sum_a"),
          sum(when(col("c"), 1).otherwise(0)).cast("long").as("n_true"),
          sum(when(col("d").isNull, 1).otherwise(0)).cast("long").as("n_null_d"))
    },

    // ---- S6+S13+S16: DESCRIBE-driven sorted projection + cast ----
    // A ClickHouse DESCRIBE TSV (the reference's schema bootstrap format)
    // drives column selection, alphabetical order, and Catalyst casts.
    // The reference shells out to clickhouse-local for this exact SELECT
    // (prepare-functions.go:161-176); here it is one codegen'd Project.
    Q("q32_projection_cast",
      """SELECT event_id, event_type, user_id, value
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val describeTsv =
        "value\tFloat64\t\t\nuser_id\tInt64\t\t\nevent_type\tString\t\t\nevent_id\tInt64\t\t"
      val schema = ClickHouseSchema.fromDescribe(describeTsv)
      ClickHouseSchema.sortedProjectCast(Tables.t(s, dir, "events"), schema)
        .orderBy(col("event_id"))
    },

    // ---- S9+S10+S11: topic→table routing + count-threshold batching ----
    // event_type plays the Kafka topic; n_batches is how many flushes the
    // reference's flush_count=1000 policy would produce per destination.
    Q("q33_route_flush",
      """SELECT event_type,
        |  count(*) AS n_msgs,
        |  CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_batches,
        |  min(ts) AS first_ts,
        |  max(ts) AS last_ts
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_msgs"),
          ceil(count(lit(1)) / 1000.0).cast("long").as("n_batches"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
        .orderBy(col("event_type"))
    },

    // ---- custom UDAF surface: typed Aggregator ----
    Q("q39_weighted_avg",
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      GraftFunctions.register(s)
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(GraftFunctions.weighted_avg(col("l_extendedprice"), col("l_quantity")), 2)
          .as("wavg_price"))
        .orderBy(col("l_returnflag"))
    }
  )
}
