package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ClickHouseSchemaSpec extends AnyFunSuite {

  test("scalar type mapping (SURVEY.md §1.4)") {
    assert(ClickHouseSchema.toSparkType("Int8") == (ByteType, false))
    assert(ClickHouseSchema.toSparkType("UInt8") == (ShortType, false))
    assert(ClickHouseSchema.toSparkType("Int32") == (IntegerType, false))
    assert(ClickHouseSchema.toSparkType("UInt32") == (LongType, false))
    assert(ClickHouseSchema.toSparkType("Int64") == (LongType, false))
    assert(ClickHouseSchema.toSparkType("UInt64") == (DecimalType(20, 0), false))
    assert(ClickHouseSchema.toSparkType("Float32") == (FloatType, false))
    assert(ClickHouseSchema.toSparkType("Float64") == (DoubleType, false))
    assert(ClickHouseSchema.toSparkType("String") == (StringType, false))
    assert(ClickHouseSchema.toSparkType("FixedString(16)") == (StringType, false))
    assert(ClickHouseSchema.toSparkType("Date") == (DateType, false))
    assert(ClickHouseSchema.toSparkType("DateTime") == (TimestampType, false))
    assert(ClickHouseSchema.toSparkType("DateTime64(3)") == (TimestampType, false))
    assert(ClickHouseSchema.toSparkType("DateTime64(9, 'UTC')") == (TimestampType, false))
    assert(ClickHouseSchema.toSparkType("Decimal(12,4)") == (DecimalType(12, 4), false))
    assert(ClickHouseSchema.toSparkType("Enum8('a' = 1, 'b' = 2)") == (StringType, false))
    assert(ClickHouseSchema.toSparkType("Bool") == (BooleanType, false))
  }

  test("wrapper types: Nullable / LowCardinality / Array / Map") {
    assert(ClickHouseSchema.toSparkType("Nullable(Int64)") == (LongType, true))
    assert(ClickHouseSchema.toSparkType("LowCardinality(String)") == (StringType, false))
    assert(ClickHouseSchema.toSparkType("LowCardinality(Nullable(String))") == (StringType, true))
    assert(ClickHouseSchema.toSparkType("Array(Int32)") ==
      (ArrayType(IntegerType, containsNull = false), false))
    assert(ClickHouseSchema.toSparkType("Array(Nullable(String))") ==
      (ArrayType(StringType, containsNull = true), false))
    assert(ClickHouseSchema.toSparkType("Map(String, UInt32)") ==
      (MapType(StringType, LongType, valueContainsNull = false), false))
    assert(ClickHouseSchema.toSparkType("Map(String, Array(Int8))") ==
      (MapType(StringType, ArrayType(ByteType, containsNull = false),
        valueContainsNull = false), false))
    intercept[IllegalArgumentException](ClickHouseSchema.toSparkType("Tuple(Int8)"))
  }

  test("DESCRIBE TSV parse sorts fields alphabetically (reference invariant)") {
    val tsv = "zeta\tInt64\t\t\nalpha\tString\t\t\nmid\tNullable(Float64)\tDEFAULT\t0"
    val st = ClickHouseSchema.fromDescribe(tsv)
    assert(st.fieldNames.toSeq == Seq("alpha", "mid", "zeta"))
    assert(st("mid").dataType == DoubleType && st("mid").nullable)
  }
}
