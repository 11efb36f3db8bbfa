package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar function batteries: one query per family exercising the standard
  * string / date-time / array function surface with cross-engine-stable
  * semantics (each expression chosen so Spark and DuckDB agree exactly;
  * engine-divergent forms — e.g. dayofweek numbering — are normalized in
  * both). All narrow maps: no shuffle, fully codegen'd. */
object Scalars {

  /** String functions over documents. */
  def stringBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      upper(col("lang")).as("s_upper"),
      lower(col("source")).as("s_lower"),
      length(col("text")).cast("long").as("s_len"),
      substring(col("text"), 3, 10).as("s_substr"),
      concat_ws("|", col("lang"), col("source")).as("s_concat"),
      trim(lit("  x  ")).as("s_trim"),
      lpad(col("lang"), 5, "_").as("s_lpad"),
      rpad(col("lang"), 5, "_").as("s_rpad"),
      replace(col("source"), lit("src"), lit("origin")).as("s_replace"),
      split(col("text"), " ").getItem(0).as("s_first_tok"),
      regexp_extract(col("text"), "([a-z]+)", 1).as("s_re_first"),
      reverse(col("lang")).as("s_reverse"),
      instr(col("text"), "the").cast("long").as("s_instr"),
      left(col("text"), lit(5)).as("s_left"),
      repeat(col("lang"), 2).as("s_repeat"))
      .orderBy("doc_id")

  /** Date/time functions over events (second-floored epoch base for
    * determinism; dayofweek normalized to ISO Monday=1..Sunday=7 in both). */
  def dateBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      year(col("ts")).cast("long").as("d_year"),
      month(col("ts")).cast("long").as("d_month"),
      dayofmonth(col("ts")).cast("long").as("d_day"),
      hour(col("ts")).cast("long").as("d_hour"),
      minute(col("ts")).cast("long").as("d_minute"),
      dayofyear(col("ts")).cast("long").as("d_doy"),
      // ISO weekday: Spark dayofweek is 1=Sunday..7=Saturday
      (pmod(dayofweek(col("ts")) + 5, lit(7)) + 1).cast("long").as("d_isodow"),
      date_trunc("day", col("ts")).as("d_trunc_day"),
      date_add(col("ts").cast("date"), 30).as("d_plus30"),
      last_day(col("ts")).as("d_last_day"),
      quarter(col("ts")).cast("long").as("d_quarter"))
      .orderBy("event_id")

  /** Array functions over embeddings (scalar outputs for stable compare). */
  def arrayBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("a_size"),
      element_at(col("embedding"), 1).cast("double").as("a_first"),
      element_at(col("embedding"), -1).cast("double").as("a_last"),
      array_max(col("embedding")).cast("double").as("a_max"),
      array_min(col("embedding")).cast("double").as("a_min"),
      array_position(col("embedding"), array_max(col("embedding")))
        .cast("long").as("a_argmax"),
      size(filter(col("embedding"), x => x > 0)).cast("long").as("a_n_pos"),
      aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double"))
        .as("a_sum"),
      sort_array(slice(col("embedding"), 1, 4)).getItem(0)
        .cast("double").as("a_sorted_head"))
      .orderBy("vec_id")

  /** INTERSECT set operation (completes union/except coverage). */
  def intersectOp(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .intersect(c.filter(col("c_acctbal") > 1000).select("c_custkey"))
      .orderBy("c_custkey")
  }
}
