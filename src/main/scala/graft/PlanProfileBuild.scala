package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Plan evidence for the round-14 `Profile.buildProfile` rewrite. The
  * DECLARED q_table_profile lane plans as a `Scan ExistingRDD
  * graft_memo_pinned` (the owner-memo discipline), so `PlanSnap` cannot
  * show the build's plan change. This main explains the memo-FREE build:
  * `after` comes from the shipped `Profile.tableProfile`; `before` is the
  * round-13 two-pass shape reproduced verbatim (diffable against
  * `git show b1a6a8a:src/main/scala/graft/operators/Profile.scala`).
  * Usage: runMain graft.PlanProfileBuild <outDir> */
object PlanProfileBuild {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r14"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val li = graft.sources.Tables.lineitem(spark, dir)
    Files.createDirectories(Paths.get(outDir))
    def write(name: String, df: DataFrame): Unit = {
      val body = s"## $name (memo-free profile build over lineitem)\n\n```\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) + "```\n"
      Files.writeString(Paths.get(outDir, s"$name.txt"), body)
      println(s"wrote $outDir/$name.txt")
    }

    write("q_table_profile_build_after",
      graft.operators.Profile.tableProfile(li))

    // ---- round-13 shape, reproduced: pass 1 + rendered-string pass 2 ----
    val cols = li.columns.toSeq.sorted
    def kind(dt: DataType): String = dt match {
      case DoubleType | FloatType                        => "num"
      case _: DecimalType                                => "num"
      case ByteType | ShortType | IntegerType | LongType => "str"
      case StringType                                    => "str"
      case TimestampType | TimestampNTZType | DateType   => "time"
      case _                                             => "skip"
    }
    val kinds = cols.map(c => c -> kind(li.schema(c).dataType)).toMap
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val mm = kinds(c) match {
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
      count(col(c)).as(s"__${c}_nn") +: mm
    }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val basic = one.select(explode(array(cols.map { c =>
      struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}_nn")).as("n_null"),
        col(s"__${c}_mnn").as("min_num"), col(s"__${c}_mxn").as("max_num"),
        col(s"__${c}_mns").as("min_str"), col(s"__${c}_mxs").as("max_str"))
    }: _*)).as("p")).select("p.*")
    def render(c: String): Column = li.schema(c).dataType match {
      case DoubleType | FloatType =>
        (col(c).cast("double") + lit(0.0)).cast("string")
      case _ => kinds(c) match {
        case "time" => col(c).cast("timestamp").cast("string")
        case _      => col(c).cast("string")
      }
    }
    val vals = li
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), render(c).as("v"))): _*)).as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
      .where(col("v").isNotNull)
    val nd = vals.groupBy("c", "v").agg(count(lit(1)).as("__one"))
      .groupBy("c").agg(count(lit(1)).as("n_distinct"))
    write("q_table_profile_build_before",
      basic.join(broadcast(nd), basic("col_name") === nd("c"), "left")
        .select(col("col_name"), col("n_rows"), col("n_null"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
        .orderBy("col_name"))
    spark.stop()
  }
}
