package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** ClickHouse `DESCRIBE TABLE` → Spark schema bootstrap (SURVEY.md §1.4).
  *
  * The reference parses the 4-column TSV that `clickhouse-client --query
  * 'describe table T'` emits and keeps the type strings opaque
  * (`/root/reference/pkg/converter/converter.go:13-47`); actual casting is
  * delegated to clickhouse-local. We map the type strings to real Spark
  * `DataType`s so casts run inside Catalyst (whole-stage codegen) instead of
  * an external process.
  *
  * The reference's single structural invariant — columns alphabetically
  * sorted everywhere (`converter.go:61-66`, `prepare-functions.go:164-175`,
  * `collector.go:120-126`) — is preserved by [[sortedProjectCast]].
  */
object ClickHouseSchema {

  private val DecimalRe = """Decimal\((\d+)\s*,\s*(\d+)\)""".r
  private val DateTime64Re = """DateTime64\(\d+(?:\s*,.*)?\)""".r
  private val FixedStringRe = """FixedString\(\d+\)""".r
  private val EnumRe = """Enum(?:8|16)\(.*\)""".r
  private val ArrayRe = """Array\((.+)\)""".r
  private val MapRe = """Map\((.+)\)""".r
  private val NullableRe = """Nullable\((.+)\)""".r
  private val LowCardRe = """LowCardinality\((.+)\)""".r

  /** CH type string → (Spark type, nullable). Unsigned ints widen one step;
    * UInt64 maps to Decimal(20,0) so the full range is representable. */
  def toSparkType(chType: String): (DataType, Boolean) = chType.trim match {
    case NullableRe(inner) => (toSparkType(inner)._1, true)
    case LowCardRe(inner)  => toSparkType(inner)
    case "Int8"            => (ByteType, false)
    case "Int16" | "UInt8" => (ShortType, false)
    case "Int32" | "UInt16" => (IntegerType, false)
    case "Int64" | "UInt32" => (LongType, false)
    case "UInt64"          => (DecimalType(20, 0), false)
    case "Float32"         => (FloatType, false)
    case "Float64"         => (DoubleType, false)
    case "String"          => (StringType, false)
    case FixedStringRe()   => (StringType, false)
    case EnumRe()          => (StringType, false)
    case "Date" | "Date32" => (DateType, false)
    case "DateTime"        => (TimestampType, false)
    case DateTime64Re()    => (TimestampType, false)
    case "Bool"            => (BooleanType, false)
    case "UUID"            => (StringType, false)
    case DecimalRe(p, s)   => (DecimalType(p.toInt, s.toInt), false)
    case ArrayRe(inner) =>
      val (t, n) = toSparkType(inner)
      (ArrayType(t, containsNull = n), false)
    case MapRe(inner) =>
      // split on the top-level comma only (values may be nested types)
      val (k, v) = splitTopLevel(inner)
      (MapType(toSparkType(k)._1, toSparkType(v)._1, valueContainsNull = toSparkType(v)._2), false)
    case other =>
      throw new IllegalArgumentException(s"unsupported ClickHouse type: $other")
  }

  private def splitTopLevel(s: String): (String, String) = {
    var depth = 0
    s.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => return (s.substring(0, i), s.substring(i + 1))
        case _ =>
      }
    }
    throw new IllegalArgumentException(s"malformed Map type args: $s")
  }

  /** Parse `DESCRIBE TABLE` TSV (`name\ttype\tdefault_type\tdefault_expr`,
    * converter.go:23-27) into a StructType with fields sorted by name —
    * the reference's canonical column order. */
  def fromDescribe(tsv: String): StructType = {
    val fields = tsv.split('\n').iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val parts = line.split('\t')
        require(parts.length >= 2, s"malformed DESCRIBE line: $line")
        val (dt, nullable) = toSparkType(parts(1))
        StructField(parts(0), dt, nullable)
      }
      .toArray
      .sortBy(_.name)
    StructType(fields)
  }

  /** S6 + S13 in one Catalyst Project: keep only schema columns, cast each
    * to its mapped type, emit in alphabetical order. Missing columns become
    * typed NULLs (the reference rendered them as empty CSV fields; we use
    * real SQL NULL — documented upgrade, SURVEY.md §7.5). Extra input
    * columns are dropped, as in the reference. */
  def sortedProjectCast(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
