package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference engine's entire type system is a 21-entry HANA->BigQuery
  * string map (`HanaToBQ.java:59-81`) applied during schema discovery
  * (`HanaToBQ.java:120-136`), with a hard failure on any unmapped type
  * (`HanaToBQ.java:129-132`, "Unhandled Hana type").
  *
  * Here the same map lands on Spark `DataType`s (SURVEY.md §1.2). Two modes:
  *   - `RefCompatible`: reproduces the reference's lossy lanes
  *     (DECIMAL/SMALLDECIMAL -> FLOAT, i.e. DoubleType; all int widths -> 64-bit).
  *   - `Lossless`: keeps DECIMAL(p,s) as DecimalType and BLOB as BinaryType.
  */
object HanaTypes {

  sealed trait Mode
  case object RefCompatible extends Mode
  case object Lossless extends Mode

  /** HANA type name -> Spark type, reference-compatible lanes.
    * Source lines cited per entry (HanaToBQ.java:59-81). */
  private val base: Map[String, DataType] = Map(
    "NVARCHAR"     -> StringType,        // :60
    "VARCHAR"      -> StringType,        // :61
    "ALPHANUM"     -> StringType,        // :62
    "SHORTTEXT"    -> StringType,        // :63
    "BLOB"         -> StringType,        // :64 (ref stringifies blobs — lossy)
    "CLOB"         -> StringType,        // :65
    "NCLOB"        -> StringType,        // :66
    "TEXT"         -> StringType,        // :67
    "VARBINARY"    -> BinaryType,        // :68 (only BYTES lane)
    "INTEGER"      -> LongType,          // :69 (BQ INTEGER is 64-bit)
    "DATE"         -> DateType,          // :70
    "TIME"         -> StringType,        // :71 (Spark has no standalone TIME)
    "DATETIME"     -> TimestampNTZType,  // :72
    "BOOLEAN"      -> BooleanType,       // :73
    "TINYINT"      -> LongType,          // :74
    "SMALLINT"     -> LongType,          // :75
    "BIGINT"       -> LongType,          // :76
    "SMALLDECIMAL" -> DoubleType,        // :77 (ref: FLOAT — precision-lossy)
    "DECIMAL"      -> DoubleType,        // :78 (ref: FLOAT — precision-lossy)
    "DOUBLE"       -> DoubleType,        // :79
    "REAL"         -> DoubleType,        // :80
  )

  /** Lossless overrides for the lanes the reference degrades. */
  private val losslessOverrides: Map[String, DataType] = Map(
    "BLOB"         -> BinaryType,
    "SMALLDECIMAL" -> DecimalType(38, 18),
    "DECIMAL"      -> DecimalType(38, 18),
  )

  def mapping(mode: Mode): Map[String, DataType] = mode match {
    case RefCompatible => base
    case Lossless      => base ++ losslessOverrides
  }

  /** Resolve one HANA type name. Unknown type is a hard failure, matching
    * the reference's abort (`HanaToBQ.java:129-132`). */
  def toSpark(hanaType: String, mode: Mode = RefCompatible): DataType =
    mapping(mode).getOrElse(
      hanaType.toUpperCase,
      throw new IllegalArgumentException(s"Unhandled Hana type: $hanaType"))

  /** Build a Spark schema from discovered (name, hanaType) pairs in catalog
    * position order — the Spark-native form of the reference's TableSchema
    * assembly (`HanaToBQ.java:111-136`). */
  def schemaFor(cols: Seq[(String, String)], mode: Mode = RefCompatible): StructType =
    StructType(cols.map { case (n, t) => StructField(n, toSpark(t, mode)) })

  /** Column-wise cast of an existing DataFrame onto the mapped schema
    * (operator `cast_type_map`, SURVEY.md §2.2). Casts are Catalyst
    * expressions — codegen'd, no per-row interpretation. */
  def castTo(df: DataFrame, cols: Seq[(String, String)], mode: Mode = RefCompatible): DataFrame = {
    val exprs: Seq[Column] = cols.map { case (n, t) => col(n).cast(toSpark(t, mode)).as(n) }
    df.select(exprs: _*)
  }
}
