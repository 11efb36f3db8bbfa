package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 stage breakdowns (guide §1.1: measure before touching).
  *
  * q_bucketed_join (1.74 s close vs 1.17 floor): the lane rewrites BOTH
  * bucketed tables per timed iteration by design — split the write cost
  * from the join/read cost, and test overlapping the two independent
  * writes from driver threads (guide §2.6: back-fill the write tail).
  *
  * q_table_profile (3.5 s driver): split pass 1 (counts + min/max agg)
  * from pass 2 (value-exploded distinct), and measure two candidate
  * pass-2 shapes: (a) typed grouping slots instead of rendered strings
  * (kills the double/long/timestamp→string render on every value), and
  * (b) a single exploded 2-level aggregate that folds pass 1 into pass
  * 2's first level (one scan, one explode, no second pass). */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val what = sys.env.getOrElse("SPARK_GRAFT_PROBE", "all")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    import graft.sources.Tables

    def timeIt(name: String)(body: => Unit): Unit = {
      val ts = (1 to iters).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"probe:$name")
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s min ${ts.min}%6.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---------------- q_bucketed_join ----------------
    if (what == "all" || what == "bucketed") {
      import graft.sources.BucketedTables
      timeIt("bkt_full")(noop(BucketedTables.colocatedJoinAgg(spark, sfDir)))
      val t = "probe_r14"
      val base = s"/tmp/graft_bucketed/$t"
      def oDf = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
      def lDf = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      timeIt("bkt_write_orders")(BucketedTables.writeBucketed(
        oDf, s"graft_bkt_orders_$t", s"$base/orders", 8, "o_orderkey"))
      timeIt("bkt_write_lineitem")(BucketedTables.writeBucketed(
        lDf, s"graft_bkt_lineitem_$t", s"$base/lineitem", 8, "l_orderkey"))
      timeIt("bkt_join_only") {
        val o = spark.table(s"graft_bkt_orders_$t")
        val l = spark.table(s"graft_bkt_lineitem_$t")
        noop(o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(28,10)")).cast("decimal(28,4)").cast("double").as("revenue"))
          .orderBy("o_orderpriority"))
      }
      timeIt("bkt_writes_parallel") {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val fo = scala.concurrent.Future(BucketedTables.writeBucketed(
          oDf, s"graft_bkt_orders_${t}_p", s"$base/orders_p", 8, "o_orderkey"))
        val fl = scala.concurrent.Future(BucketedTables.writeBucketed(
          lDf, s"graft_bkt_lineitem_${t}_p", s"$base/lineitem_p", 8, "l_orderkey"))
        scala.concurrent.Await.result(fo, scala.concurrent.duration.Duration.Inf)
        scala.concurrent.Await.result(fl, scala.concurrent.duration.Duration.Inf)
        pool.shutdown()
      }
      // sanity: parallel-written tables join to the same result
      val chk = {
        val o = spark.table(s"graft_bkt_orders_${t}_p")
        val l = spark.table(s"graft_bkt_lineitem_${t}_p")
        o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      }
      println(s"PROBE bkt_parallel_join_rows $chk")
    }

    // ---------------- q_table_profile ----------------
    if (what == "all" || what == "profile") {
      val li = Tables.lineitem(spark, sfDir)
      val cols = li.columns.toSeq.sorted
      def kindOf(c: String): String = li.schema(c).dataType match {
        case DoubleType | FloatType                        => "dbl"
        case _: DecimalType                                => "dec"
        case ByteType | ShortType | IntegerType | LongType => "int"
        case StringType                                    => "string"
        case TimestampType | TimestampNTZType | DateType   => "time"
        case _                                             => "other"
      }

      timeIt("profile_full")(noop(
        graft.operators.Profile.tableProfile(li)))

      // pass 1 alone: the one-row agg + explode to report grain
      timeIt("profile_pass1") {
        val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
          Seq(count(col(c)).as(s"__${c}_nn"),
            min(col(c)).cast("string").as(s"__${c}_mns"),
            max(col(c)).cast("string").as(s"__${c}_mxs"))
        }
        noop(li.agg(aggs.head, aggs.tail: _*))
      }

      // pass 2 alone, as shipped: rendered-string explode + 2-level agg
      timeIt("profile_pass2_rendered") {
        def render(c: String): Column = li.schema(c).dataType match {
          case DoubleType | FloatType =>
            (col(c).cast("double") + lit(0.0)).cast("string")
          case TimestampType | TimestampNTZType | DateType =>
            col(c).cast("timestamp").cast("string")
          case _ => col(c).cast("string")
        }
        val vals = li.select(explode(array(cols.map(c =>
            struct(lit(c).as("c"), render(c).as("v"))): _*)).as("e"))
          .select(col("e.c").as("c"), col("e.v").as("v"))
          .where(col("v").isNotNull)
        noop(vals.groupBy("c", "v").agg(count(lit(1)).as("__one"))
          .groupBy("c").agg(count(lit(1)).as("n_distinct")))
      }

      // candidate: typed grouping slots — no value rendering at all.
      // Exactly one slot is non-null per column kind, and `c` is in the
      // key, so grouping on the slot tuple == grouping on the native
      // value (Spark normalizes -0.0/NaN in grouping keys, matching
      // native count(DISTINCT) semantics).
      def slotStruct(c: String): Column = {
        val nL = lit(null).cast("long")
        val nD = lit(null).cast("double")
        val nC = lit(null).cast("decimal(38,18)")
        val nS = lit(null).cast("string")
        kindOf(c) match {
          case "dbl" => struct(lit(c).as("c"), nL.as("vl"),
            (col(c).cast("double") + lit(0.0)).as("vd"), nC.as("vc"), nS.as("vs"))
          case "dec" => struct(lit(c).as("c"), nL.as("vl"), nD.as("vd"),
            col(c).cast("decimal(38,18)").as("vc"), nS.as("vs"))
          case "int" => struct(lit(c).as("c"), col(c).cast("long").as("vl"),
            nD.as("vd"), nC.as("vc"), nS.as("vs"))
          case "time" => struct(lit(c).as("c"),
            unix_micros(col(c).cast("timestamp")).as("vl"),
            nD.as("vd"), nC.as("vc"), nS.as("vs"))
          case _ => struct(lit(c).as("c"), nL.as("vl"), nD.as("vd"),
            nC.as("vc"), col(c).cast("string").as("vs"))
        }
      }
      timeIt("profile_pass2_typed") {
        val vals = li.select(explode(array(cols.map(slotStruct): _*)).as("e"))
          .select(col("e.c").as("c"), col("e.vl").as("vl"),
            col("e.vd").as("vd"), col("e.vc").as("vc"), col("e.vs").as("vs"))
          .where(col("vl").isNotNull || col("vd").isNotNull ||
            col("vc").isNotNull || col("vs").isNotNull)
        noop(vals.groupBy("c", "vl", "vd", "vc", "vs")
          .agg(count(lit(1)).as("__one"))
          .groupBy("c").agg(count(lit(1)).as("n_distinct")))
      }

      // candidate: single exploded 2-level aggregate producing the FULL
      // profile (pass 1 folded into level 1; null rows kept as the
      // all-null-slot group so n_rows/n_null fall out of the same agg)
      timeIt("profile_combined") {
        val vals = li.select(explode(array(cols.map(slotStruct): _*)).as("e"))
          .select(col("e.c").as("c"), col("e.vl").as("vl"),
            col("e.vd").as("vd"), col("e.vc").as("vc"), col("e.vs").as("vs"))
        val isNullRow = col("vl").isNull && col("vd").isNull &&
          col("vc").isNull && col("vs").isNull
        val lvl1 = vals.groupBy("c", "vl", "vd", "vc", "vs")
          .agg(count(lit(1)).as("cnt"))
        val lvl2 = lvl1.groupBy("c").agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(isNullRow, col("cnt"))), lit(0L)).as("n_null"),
          count(when(!isNullRow, lit(1))).as("n_distinct"),
          min(col("vd")).as("mn_d"), max(col("vd")).as("mx_d"),
          min(col("vc")).as("mn_c"), max(col("vc")).as("mx_c"),
          min(col("vl")).as("mn_l"), max(col("vl")).as("mx_l"),
          min(col("vs")).as("mn_s"), max(col("vs")).as("mx_s"))
        def route(f: String => Column): Column =
          cols.foldLeft(lit(null).cast("string")) { (acc, c) =>
            when(col("c") === lit(c), f(c)).otherwise(acc)
          }
        // kind-routed final projection (11 rows; render cost irrelevant)
        val secs = (col("mn_l") - pmod(col("mn_l"), lit(1000000L))) / lit(1000000L)
        val secsMx = (col("mx_l") - pmod(col("mx_l"), lit(1000000L))) / lit(1000000L)
        val out = lvl2.select(
          col("c").as("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
          route(c => kindOf(c) match {
            case "dbl" => col("mn_d").cast("string")
            case "dec" => col("mn_c").cast("double").cast("string")
            case _     => lit(null).cast("string")
          }).cast("double").as("min_num"),
          route(c => kindOf(c) match {
            case "dbl" => col("mx_d").cast("string")
            case "dec" => col("mx_c").cast("double").cast("string")
            case _     => lit(null).cast("string")
          }).cast("double").as("max_num"),
          route(c => kindOf(c) match {
            case "int"    => col("mn_l").cast("string")
            case "time"   => secs.cast("long").cast("string")
            case "string" => col("mn_s")
            case "other"  => col("mn_s")
            case _        => lit(null).cast("string")
          }).as("min_str"),
          route(c => kindOf(c) match {
            case "int"    => col("mx_l").cast("string")
            case "time"   => secsMx.cast("long").cast("string")
            case "string" => col("mx_s")
            case "other"  => col("mx_s")
            case _        => lit(null).cast("string")
          }).as("max_str"))
          .orderBy("col_name")
        noop(out)
      }
    }
    spark.stop()
  }
}
