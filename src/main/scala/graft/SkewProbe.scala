package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** Planted-skew join stress — the measurement behind SCALE.md's salted-join
  * claims. Builds a join with a 100x-hot key from the sf-dir lineitem rows:
  *
  *   big side  = lineitem with join key `k`: a slice of rows collapses onto
  *               ONE hot key (0), the rest spread over `nKeys` uniform keys,
  *               so the hot key holds ~100x an average key's rows;
  *   small side = one row per key with a payload — too many rows to
  *               broadcast by policy (the probe pins
  *               autoBroadcastJoinThreshold = -1: the "small but not
  *               broadcastable" middle regime salting exists for).
  *
  * Three lanes, each timed and reduced to the same aggregate:
  *   plain_aqe_off — flat shuffle join, AQE disabled: the hot key's single
  *                   reducer is the straggler (the failure mode);
  *   plain_aqe_on  — AQE skew-join splitting (Spark's own post-shuffle fix);
  *   salted        — [[SaltedJoin.salted]], the in-key fix that also works
  *                   where AQE declines (windowed/bucketed constraints).
  *
  * Equality gate: all three lanes must produce identical (rows, sum) — the
  * salted join is a pure re-partitioning of the same logical join.
  *
  * Usage: runMain graft.SkewProbe <sfDir> [hotPct=2] [nKeys=5000] [salts=32]
  * Prints one JSON line with wall times and the equality verdict.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val hotPct = if (args.length > 1) args(1).toInt else 2
    val nKeys = if (args.length > 2) args(2).toInt else 5000
    val salts = if (args.length > 3) args(3).toInt else 32
    // row multiplier: replicate the fixture in-memory so the straggler's
    // work dwarfs per-task fixed costs (the regime a 100 TB hot key is in)
    val mult = if (args.length > 4) args(4).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the hot key holds hotPct% of ALL rows; an average cold key holds
    // (100-hotPct)%/nKeys — hotPct=2, nKeys=5000 puts the hot key at
    // ~100x the average
    val big = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("v"))
      .withColumn("__r", explode(sequence(lit(0L), lit(mult - 1L))))
      .withColumn("k",
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("__r")),
          lit(100L)) < hotPct, lit(0L))
          .otherwise(pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
            col("__r"), lit(7L)), lit(nKeys.toLong)) + 1L))
      .persist()
    val small = spark.range(0, nKeys + 1).select(col("id").as("k"),
        (col("id") % 97).cast("double").as("w"))
      .persist()
    val nBig = big.count()
    small.count()
    val hotRows = big.filter(col("k") === 0L).count()

    // DECIMAL sum: exact, order-insensitive — an IEEE double sum differs
    // in the last ulps between partitionings and would fail the equality
    // gate spuriously
    def agg(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        sum((col("v") * col("w")).cast("decimal(38,6)"))).head()
      (r.getLong(0), String.valueOf(r.get(1)))
    }
    // reducer for already-aggregated (k, s) frames
    def aggG(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)), sum(col("s"))).head()
      (r.getLong(0), String.valueOf(r.get(1)))
    }
    def timedWith(name: String, reduce: DataFrame => (Long, String))
                 (mk: => DataFrame): (Double, (Long, String)) = {
      val t0 = System.nanoTime()
      val a = reduce(mk)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[skew] $name%-16s $dt%7.2f s  rows=${a._1} sum=${a._2}")
      (dt, a)
    }
    def timed(name: String)(mk: => DataFrame): (Double, (Long, String)) =
      timedWith(name, agg)(mk)

    def withAqe(on: Boolean)(body: => (Double, (Long, String))) = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      try body finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      }
    }

    val (tOff, aOff) = withAqe(on = false) {
      timed("plain_aqe_off")(big.join(small, "k")) }
    val (tOn, aOn) = withAqe(on = true) {
      timed("plain_aqe_on")(big.join(small, "k")) }
    val (tSalt, aSalt) = withAqe(on = true) {
      timed("salted")(SaltedJoin.salted(big, small, Seq("k"),
        saltBy = Seq("l_orderkey", "l_linenumber", "__r"), salts = salts)) }

    // Scenario 2 — join feeding a SAME-KEY aggregation: AQE cannot split
    // the skewed join here (the aggregate requires hash(k) distribution,
    // and splitting would break it), so the hot key's reducer carries both
    // the join AND the agg. After a salted join the per-(k, salt) partial
    // aggregates combine map-side and only key-grain partials exchange —
    // the decomposable-agg case where salting wins once the hot reducer
    // is memory-bound (measured: 13.7 s vs 15.9 s at 24M rows / 2g heap;
    // with ample memory the constant costs favor the plain plan).
    def joinAgg(j: DataFrame): DataFrame =
      j.groupBy("k").agg(
        sum((col("v") * col("w")).cast("decimal(38,6)")).as("s"))
    val (tAggOn, gOn) = withAqe(on = true) {
      timedWith("join_agg_aqe", aggG)(joinAgg(big.join(small, "k"))) }
    val (tAggSalt, gSalt) = withAqe(on = true) {
      timedWith("join_agg_salted", aggG)(
        joinAgg(SaltedJoin.salted(big, small, Seq("k"),
          saltBy = Seq("l_orderkey", "l_linenumber", "__r"), salts = salts))) }

    val equal = aOff == aOn && aOn == aSalt && gOn == gSalt
    println(
      s"""{"n_big":$nBig,"hot_rows":$hotRows,"n_keys":$nKeys,"salts":$salts,""" +
      s""""plain_aqe_off_sec":$tOff,"plain_aqe_on_sec":$tOn,"salted_sec":$tSalt,""" +
      s""""join_agg_aqe_sec":$tAggOn,"join_agg_salted_sec":$tAggSalt,""" +
      s""""rows":${aSalt._1},"equal":$equal}""")
    spark.stop()
    if (!equal) sys.exit(1)
  }
}
