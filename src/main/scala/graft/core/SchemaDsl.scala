package graft.core

import org.apache.spark.sql.types._

/** String-driven schema construction (SURVEY.md §1.3 mode 2).
  *
  * The two biggest reference programs build their schemas from metadata
  * strings rather than case classes — bof_30_migrate.scala:25-36,716-854
  * (column lists with type codes) and sap_bw_api.scala:65-117 (SAP type
  * codes mapped to Spark types). `fromSpec` is that capability: a compact
  * `name:code` spec with reference-style short codes; `fromDdl` is the
  * standard DDL passthrough.
  */
object SchemaDsl {

  /** Standard `a INT, b STRING` DDL. */
  def fromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  private val codes: Map[String, DataType] = Map(
    "c" -> StringType, "char" -> StringType, "string" -> StringType,
    "i" -> IntegerType, "int" -> IntegerType,
    "l" -> LongType, "long" -> LongType, "bigint" -> LongType,
    "d" -> DoubleType, "dec" -> DoubleType, "double" -> DoubleType,
    "f" -> FloatType, "float" -> FloatType,
    "b" -> BooleanType, "bool" -> BooleanType,
    "date" -> DateType, "ts" -> TimestampType, "timestamp" -> TimestampType)

  /** Compact spec: `"name:code;name:code"` — e.g.
    * `"memnum:c;begindt:date;qty:d"`. All fields nullable, like the
    * reference's generated schemas. */
  def fromSpec(spec: String): StructType =
    StructType(spec.split(";").toIndexedSeq.map(_.trim).filter(_.nonEmpty).map { f =>
      val Array(name, code) = f.split(":").map(_.trim)
      val tpe = codes.getOrElse(code.toLowerCase,
        throw new IllegalArgumentException(s"unknown type code '$code' in '$f'"))
      StructField(name, tpe, nullable = true)
    })
}
