package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the round-9 HOF→native rewrites, one arm pair per rule —
  * the [[ProbeDotRewrite]] protocol: back-to-back in one session, the
  * "rewrite OFF" arm pinned WITHOUT touching session state by a value-
  * identical shape the narrow matcher refuses (·1.0 / ·1L twins, nested
  * concat), and a bit-parity require() after the timings.
  *
  *  - zip_subtract (ZipWithSubtractRewrite): the RPQ residual map
  *  - long_dot_product (LongDotRewrite): the SQ ANN int8 scoring loop
  *  - cosine_fold (CosineFoldRewrite): fused vs 3-pass DotProduct composition
  *  - minhash_signature (MinHashRewrite): HOF seeds×shingles md5 lambdas
  */
object ProbeRewritesR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPL", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .select(col("embedding").cast("array<double>").as("d"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 100.0).cast("long")).as("q"),
        col("embedding").as("f"),
        // a DISTINCT second operand: with b == a, codegen subexpression
        // elimination collapses the "3-pass" composition to one pass and
        // the A/B is rigged (measured: "fused" came out 0.8x)
        transform(col("embedding"), x => x + lit(1.0f)).as("f2"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 50.0).cast("long")).as("q2"))
      .localCheckpoint()
    println(s"[probe] vector rows = ${emb.count()} (replicate x$replicate)")

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(graft.operators.NearDup.shingles(col("text")).as("sh"))
      .localCheckpoint()
    println(s"[probe] doc rows = ${docs.count()}")

    def run(df: DataFrame, tag: String, expr: Column, iters: Int = 3): Double = {
      // self-check: print whether the arm's optimized plan holds the native
      // expression — a value-twin that an optimizer pass simplified into the
      // rewritable shape would silently measure native-vs-native
      val plan = df.select(expr.as("x")).queryExecution.optimizedPlan.toString
      // word-boundary-ish matching: "dot_product" is a substring of
      // "long_dot_product", so count occurrences not wrapped by the longer name
      val natives = Seq("zip_subtract", "long_dot_product", "cosine_fold",
        "minhash_signature").filter(plan.contains) ++
        (if (plan.replace("long_dot_product", "").contains("dot_product"))
           Seq("dot_product") else Nil)
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

    // ---- 1. zip_subtract: consume via the last residual element ----
    val subPinned = element_at(
      zip_with(col("d"), col("d"), (x, y) => x - y * lit(1.0)), 64)
    val subNative = element_at(
      zip_with(col("d"), col("d"), (x, y) => x - y), 64)
    val s1 = run(emb, "zipsub-hof-interpreted", subPinned)
    val s2 = run(emb, "zipsub-native-rewritten", subNative)
    parity(emb, subPinned, subNative, "zip_subtract")
    println(f"[probe] RESULT zip_subtract hof=$s1%.2f s native=$s2%.2f s speedup=${s1 / s2}%.2fx")

    // ---- 2. long dot product (int8 SQ scoring shape) ----
    def ldot2(mul: (Column, Column) => Column) = aggregate(
      zip_with(col("q"), col("q2"), (x, y) => mul(x, y)), lit(0L),
      (acc, x) => acc + x)
    // pin: TRY-mode multiply — value-identical on non-overflowing codes,
    // refused by the matcher BY CONTRACT (null-on-overflow has no native
    // twin), and no optimizer pass strips it. The x1L twin did NOT survive:
    // integral multiply-by-one is simplified and the arm went native.
    val l1 = run(emb, "longdot-hof-interpreted", ldot2(try_multiply))
    val l2 = run(emb, "longdot-native-rewritten", ldot2((x, y) => x * y))
    parity(emb, ldot2(try_multiply), ldot2((x, y) => x * y), "long_dot_product")
    println(f"[probe] RESULT long_dot hof=$l1%.2f s native=$l2%.2f s speedup=${l1 / l2}%.2fx")

    // ---- 3. cosine fusion: 3-pass DotProduct composition vs fused ----
    import graft.operators.Similarity
    def cosUnfused(a: Column, b: Column) =
      (Similarity.dot(a, b) * lit(1.0)) /
        (sqrt(Similarity.dot(a, a)) * sqrt(Similarity.dot(b, b)))
    val c1 = run(emb, "cosine-3pass-dots", cosUnfused(col("f"), col("f2")))
    val c2 = run(emb, "cosine-fused", Similarity.cosineHof(col("f"), col("f2")))
    parity(emb, cosUnfused(col("f"), col("f2")),
      Similarity.cosineHof(col("f"), col("f2")), "cosine_fold")
    println(f"[probe] RESULT cosine fused3pass=$c1%.2f s fused=$c2%.2f s speedup=${c1 / c2}%.2fx")

    // ---- 4. minhash signature: HOF lambdas vs one native call ----
    // pin: a trailing empty-string concat operand — byte-identical output,
    // a 4-element Concat the 3-element matcher refuses, and nothing strips
    // it. (The nested-concat pin did NOT survive: CombineConcats flattens
    // it back into the matchable 3-ary shape and the arm went native.)
    val mhPinned = length(element_at(
      transform(sequence(lit(0), lit(graft.operators.NearDup.NumHashes - 1)),
        s => array_min(transform(col("sh"),
          x => md5(concat(s.cast("string"), lit("_"), x, lit("")))))), 1))
    val mhNative = length(element_at(
      graft.operators.NearDup.minhashSigHof(col("sh")), 1))
    val m1 = run(docs, "minhash-hof-interpreted", mhPinned)
    val m2 = run(docs, "minhash-native-rewritten", mhNative)
    parity(docs, mhPinned, mhNative, "minhash")
    println(f"[probe] RESULT minhash hof=$m1%.2f s native=$m2%.2f s speedup=${m1 / m2}%.2fx")

    spark.stop()
  }
}
