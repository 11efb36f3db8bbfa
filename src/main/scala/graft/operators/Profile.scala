package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table PROFILING — the first query a warehouse runs against an unknown
  * 100 TB feed: per column, row count, null count, exact distinct count,
  * and min/max. The ingest-time contract check (does this column look like
  * the dictionary says) and the stats a query planner's cost model wants.
  *
  * One aggregate pass produces every column's stats in a single job; the
  * per-column ROWS are then a narrow explode of the 1-row result. The
  * multiple `count(DISTINCT)`s plan as one Expand (a #cols-way row
  * multiplication before partial aggregation) — the standard exact-profile
  * cost; the 100 TB path swaps `approx_count_distinct` in (HLL sketches
  * don't hash-match across engines, so the ORACLE pins the exact form).
  *
  * min/max portability: floating columns report `min_num`/`max_num` as
  * DOUBLES (bit-exact, order-free); integer/decimal/string columns render
  * `min_str`/`max_str` canonically; timestamps render as EPOCH-SECOND
  * strings (engine string formats of timestamps differ; epoch longs
  * don't). */
object Profile {

  def tableProfile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = (if (columns.nonEmpty) columns else df.columns.toSeq).sorted
    def kind(dt: DataType): String = dt match {
      case DoubleType | FloatType                         => "num"
      case _: DecimalType                                 => "num"
      case ByteType | ShortType | IntegerType | LongType  => "str"
      case StringType                                     => "str"
      case TimestampType | TimestampNTZType | DateType    => "time"
      case _                                              => "skip"
    }
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val k = kind(df.schema(c).dataType)
      val mm = k match {
        case "num" => Seq(
          min(col(c)).cast("double").as(s"__${c}_mnn"),
          max(col(c)).cast("double").as(s"__${c}_mxn"),
          lit(null).cast("string").as(s"__${c}_mns"),
          lit(null).cast("string").as(s"__${c}_mxs"))
        case "str" => Seq(
          lit(null).cast("double").as(s"__${c}_mnn"),
          lit(null).cast("double").as(s"__${c}_mxn"),
          min(col(c)).cast("string").as(s"__${c}_mns"),
          max(col(c)).cast("string").as(s"__${c}_mxs"))
        case "time" => Seq(
          lit(null).cast("double").as(s"__${c}_mnn"),
          lit(null).cast("double").as(s"__${c}_mxn"),
          min(col(c).cast("timestamp").cast("long")).cast("string")
            .as(s"__${c}_mns"),
          max(col(c).cast("timestamp").cast("long")).cast("string")
            .as(s"__${c}_mxs"))
        case _ => Seq(
          lit(null).cast("double").as(s"__${c}_mnn"),
          lit(null).cast("double").as(s"__${c}_mxn"),
          lit(null).cast("string").as(s"__${c}_mns"),
          lit(null).cast("string").as(s"__${c}_mxs"))
      }
      Seq(count(col(c)).as(s"__${c}_nn"),
        count_distinct(col(c)).as(s"__${c}_nd")) ++ mm
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}_nn")).as("n_null"),
        col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_mnn").as("min_num"),
        col(s"__${c}_mxn").as("max_num"),
        col(s"__${c}_mns").as("min_str"),
        col(s"__${c}_mxs").as("max_str"))
    }: _*)
    one.select(explode(perCol).as("p")).select("p.*").orderBy("col_name")
  }
}
