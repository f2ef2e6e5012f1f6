package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.schema.ClickHouseSchema

/** Property tests for the reference's projection contract (SURVEY.md §1.2):
  * alphabetical column order, extra keys dropped, missing keys → NULL,
  * nested values preserved as real types (documented upgrade). */
class ProjectionSpec extends SparkSpec {

  private val tsv = "b\tString\t\t\na\tFloat64\t\t\nc\tNullable(Int64)\t\t"
  private val schema = ClickHouseSchema.fromDescribe(tsv)

  test("schema fields are alphabetical") {
    assert(schema.fieldNames.toSeq == Seq("a", "b", "c"))
  }

  test("projection keeps schema columns, drops extras, nulls missing") {
    import spark.implicits._
    val df = Seq("""{"b":"x","extra":99,"a":1.5}""").toDF("json")
      .select(from_json(col("json"), schema).as("r")).select("r.*")
    val out = ClickHouseSchema.sortedProjectCast(df, schema)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    val row = out.collect().head
    assert(row.getDouble(0) == 1.5 && row.getString(1) == "x" && row.isNullAt(2))
  }

  test("property: random flat objects respect the contract") {
    import spark.implicits._
    val keyGen = Gen.oneOf("a", "b", "c", "x", "y")
    val objGen = Gen.mapOf(Gen.zip(keyGen, Gen.choose(0, 999)))
    val listGen = Gen.listOfN(8, objGen)
    (0 until 20).foreach { i =>
      val objs = listGen.pureApply(Gen.Parameters.default, Seed(42L + i))
      val jsons = objs.map(m =>
        m.map { case (k, v) => s""""$k": $v""" }.mkString("{", ",", "}"))
      val df = jsons.toDF("json")
        .select(from_json(col("json"), schema).as("r")).select("r.*")
      val out = ClickHouseSchema.sortedProjectCast(df, schema)
      assert(out.columns.toSeq == Seq("a", "b", "c"))
      val rows = out.collect()
      rows.zip(objs).foreach { case (row, obj) =>
        // missing keys → NULL; extras never leak
        assert(row.isNullAt(0) == !obj.contains("a"))
        assert(row.isNullAt(2) == !obj.contains("c"))
        if (obj.contains("a")) assert(row.getDouble(0) == obj("a").toDouble)
      }
    }
  }

  test("missing column in input frame becomes typed NULL") {
    import spark.implicits._
    val df = Seq((1.0, "s")).toDF("a", "b") // no "c" column at all
    val out = ClickHouseSchema.sortedProjectCast(df, schema)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.schema("c").dataType == org.apache.spark.sql.types.LongType)
    assert(out.collect().head.isNullAt(2))
  }
}
