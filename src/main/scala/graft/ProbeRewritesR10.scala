package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the round-10 HOF→native rewrite candidates — the
  * [[ProbeRewritesR9]] protocol (back-to-back arms, the "rewrite OFF" arm
  * pinned by a value-identical shape the narrow matcher refuses, plan
  * self-check per arm, bit-parity require() after the timings):
  *
  *  - bucket_counts (BucketCountsRewrite): the PPJoin+ suffix-filter
  *    histogram under NearDup.prefixCandidates — the HOF rescans the whole
  *    shingle array once per bucket (16 passes); pin = pmod over the
  *    LONG-widened hash (same buckets, refused child shape).
  *  - band_keys (BandKeysRewrite): NearDup.bandFrame's per-band
  *    slice+concat_ws+md5 — 4 interpreted lambda evaluations per row;
  *    pin = struct fields renamed band0/key0 (names never affect values,
  *    nothing renames them back).
  *
  * The verdict drives GraftExtensions registration: a rule that does not
  * measure hot at sf1 data shapes is NOT shipped (VERDICT round-9 task 3 —
  * extend the rewrite lane by measurement, not enumeration). */
object ProbeRewritesR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.operators.NearDup.shingles(col("text")).as("sh"))
      .localCheckpoint()
    println(s"[probe] doc rows = ${docs.count()}")
    val sigs = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.functions.TextHashFunctions.minhash_signature(
        graft.operators.NearDup.shingles(col("text")), 16).as("sig"))
      .localCheckpoint()
    println(s"[probe] sig rows = ${sigs.count()}")

    def run(df: DataFrame, tag: String, expr: Column, iters: Int = 3): Double = {
      val plan = df.select(expr.as("x")).queryExecution.optimizedPlan.toString
      val natives = Seq("bucket_counts", "band_keys").filter(plan.contains)
      println(s"[probe] $tag plan natives: ${if (natives.isEmpty) "NONE (interpreted HOF)" else natives.mkString(",")}")
      var best = Double.MaxValue
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        df.select(sum(expr).as("s")).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"[probe] $tag%-28s iter$i $dt%6.2f s")
      }
      best
    }
    def parity(df: DataFrame, a: Column, b: Column, what: String): Unit = {
      val r = df.select(sum(a), sum(b)).collect()(0)
      require(r.get(0) == r.get(1), s"$what parity broke: ${r.get(0)} vs ${r.get(1)}")
    }

    // ---- 1. bucket histogram: 16-pass HOF vs one-pass native ----
    // consume via the full histogram sum (= non-null element count, forces
    // every bucket) — identical arithmetic on both arms
    def histConsume(hist: Column): Column =
      aggregate(hist, lit(0L), (a, x) => a + x.cast("long"))
    val histPinned = histConsume(transform(sequence(lit(0), lit(15)),
      k => size(filter(col("sh"),
        t => pmod(hash(t).cast("long"), lit(16L)) === k.cast("long")))))
    val histNative = histConsume(transform(sequence(lit(0), lit(15)),
      k => size(filter(col("sh"), t => pmod(hash(t), lit(16)) === k))))
    val h1 = run(docs, "hist-hof-interpreted", histPinned)
    val h2 = run(docs, "hist-native-rewritten", histNative)
    parity(docs, histPinned, histNative, "bucket_counts")
    println(f"[probe] RESULT bucket_counts hof=$h1%.2f s native=$h2%.2f s speedup=${h1 / h2}%.2fx")

    // ---- 2. band keys: 4-lambda slice+md5 HOF vs one-pass native ----
    // consume via the total key length (forces every md5)
    def bandsConsume(bands: Column, bf: String, kf: String): Column =
      aggregate(transform(bands, s => length(s.getField(kf)) + s.getField(bf)),
        lit(0L), (a, x) => a + x.cast("long"))
    def bandsOf(bf: String, kf: String): Column =
      transform(sequence(lit(0), lit(3)),
        b => struct(b.as(bf),
          md5(concat_ws("|", slice(col("sig"), b * 4 + 1, lit(4)))).as(kf)))
    val bandsPinned = bandsConsume(bandsOf("band0", "key0"), "band0", "key0")
    val bandsNative = bandsConsume(bandsOf("band", "key"), "band", "key")
    val b1 = run(sigs, "bands-hof-interpreted", bandsPinned)
    val b2 = run(sigs, "bands-native-rewritten", bandsNative)
    parity(sigs, bandsPinned, bandsNative, "band_keys")
    println(f"[probe] RESULT band_keys hof=$b1%.2f s native=$b2%.2f s speedup=${b1 / b2}%.2fx")

    spark.stop()
  }
}
