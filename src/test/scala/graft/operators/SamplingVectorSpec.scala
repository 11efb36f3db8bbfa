package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Unit coverage for the round-3 curation additions: deterministic
  * stratified sampling, per-group quota caps, repetition ratio, PII scrub,
  * embedding normalize/quantize. */
class SamplingVectorSpec extends SparkSpec {

  test("stratified sampling is deterministic, content-addressed, and rate-respecting") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val s1 = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 37), 83)
    val s2 = Sampling.stratified(docs.repartition(7), "doc_id", "lang",
      Map("en" -> 37), 83)
    // same rows regardless of partitioning (content-addressed, no RNG)
    assert(s1.orderBy("doc_id").collect().toSeq ==
      s2.orderBy("doc_id").collect().toSeq)
    val total = docs.count().toDouble
    val kept = s1.count().toDouble
    assert(kept > 0 && kept < total)
    // en stratum keeps ~37%, the rest ~83% (loose bounds; hash is uniform)
    val enRate = s1.filter(s1("lang") === "en").count().toDouble /
      math.max(docs.filter(docs("lang") === "en").count().toDouble, 1.0)
    assert(enRate > 0.2 && enRate < 0.55, s"en rate $enRate")
  }

  test("token-budget mixture: hash-order prefix per stratum, boundary doc " +
       "included, zero-weight stratum excluded") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      size(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")),
        " ")).cast("long").as("n_tokens"))
    val budget = 20000L
    val weights = Map("en" -> 0.5, "de" -> 0.2)
    val out = Sampling.mixtureByTokens(docs, "doc_id", "lang", "n_tokens",
      weights, budget).collect()
    assert(out.nonEmpty)
    // zero-weight strata contribute nothing
    assert(out.forall(r => weights.contains(r.getAs[String]("lang"))))
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val quota = math.floor(budget * weights(lang)).toLong
      // every taken doc started strictly inside the quota (prefix property)
      rows.foreach { r =>
        assert(r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens") < quota)
      }
      // at most ONE doc straddles the boundary; the rest sit within quota
      assert(rows.count(_.getAs[Long]("cum_tokens") > quota) <= 1)
      // quota is met (or the stratum ran dry)
      val strataTotal = docs.filter(col("lang") === lang)
        .agg(sum("n_tokens")).collect()(0).getLong(0)
      val taken = rows.map(_.getAs[Long]("n_tokens")).sum
      assert(taken >= math.min(quota, strataTotal), s"$lang under-filled")
    }
    // deterministic under repartitioning
    val out2 = Sampling.mixtureByTokens(docs.repartition(7), "doc_id", "lang",
      "n_tokens", weights, budget).orderBy("doc_id").collect().toSeq
    assert(out.sortBy(_.getAs[Long]("doc_id")).toSeq == out2)
  }

  test("quota cap keeps at most n per group with a deterministic rank") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val capped = Sampling.quotaCap(docs, "lang", 30, Seq("doc_id"))
    val perGroup = capped.groupBy("lang").count().collect()
    assert(perGroup.forall(_.getLong(1) <= 30L))
    // rank 1..k contiguous within each group, ordered by doc_id
    val ranks = capped.filter(capped("lang") === perGroup.head.getString(0))
      .orderBy("doc_id").select("rk").collect().map(_.getLong(0)).toSeq
    assert(ranks == (1L to ranks.size))
  }

  test("weighted top-k sample: deterministic, partition-invariant, weight-monotone, no global sort") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val w = when(col("lang") === "en", 1).otherwise(4)
    val s1 = Sampling.weightedTopK(docs, "doc_id", w, 50)
    val s2 = Sampling.weightedTopK(docs.repartition(7), "doc_id", w, 50)
    assert(s1.orderBy("doc_id").collect().toSeq ==
      s2.orderBy("doc_id").collect().toSeq, "content-addressed: same draw")
    assert(s1.count() == 50)

    // monotonicity: raising ONE sampled doc's weight only raises its
    // priority — it cannot leave the sample
    val pick = s1.orderBy("pri").select("doc_id").collect().head.getLong(0)
    val boosted = Sampling.weightedTopK(docs, "doc_id",
      when(col("doc_id") === pick, 4).otherwise(w), 50)
    assert(boosted.filter(col("doc_id") === pick).count() == 1)

    // plan: TakeOrdered (per-partition k-heap), not a global Sort+Exchange
    val p = s1.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), p.take(2000))
  }

  test("repetition ratio counts duplicated word trigrams") {
    import spark.implicits._
    val df = Seq((1L, "a b c a b c a b c"), (2L, "all distinct words here now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df).orderBy("doc_id").collect()
    // 9 words -> 7 trigrams, 3 distinct ("a b c","b c a","c a b")
    assert(r(0).getLong(1) == 7L && r(0).getLong(2) == 3L)
    assert(math.abs(r(0).getDouble(3) - (1.0 - 3.0 / 7.0)) < 1e-15)
    assert(r(1).getLong(1) == r(1).getLong(2)) // no repetition
    assert(r(1).getDouble(3) == 0.0)
  }

  test("PII scrub counts and redacts emails and long digit runs") {
    import spark.implicits._
    val df = Seq((1L, "Contact Foo.Bar@Example.COM or call 12345678 now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df).collect().head
    assert(r.getLong(1) == 1L) // n_emails
    assert(r.getLong(2) == 1L) // n_longnums
    assert(r.getString(3) == "contact <email> or call <num> now")
  }

  test("int8 quantization digest: scale, floor semantics, zero-vector guard") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, -2.0f, 0.5f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = VectorOps.quantizeDigest(df).orderBy("vec_id").collect()
    assert(math.abs(r(0).getDouble(1) - math.sqrt(5.25)) < 1e-15) // l2_norm
    assert(r(0).getDouble(2) == 2.0)                              // max_abs
    // floor(1*63.5)=63, floor(-2*63.5)=-127, floor(0.5*63.5)=31
    assert(r(0).getLong(3) == 63L - 127L + 31L)                   // q_sum
    assert(r(0).getLong(4) == -127L && r(0).getLong(5) == 63L)
    assert(r(1).getDouble(1) == 0.0 && r(1).getLong(3) == 0L)     // zero vec
  }

  test("quantized values lie in [-127, 127] with signs preserved, for random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextFloat() - 0.5f) * rnd.nextInt(1000)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val rows = df.select(col("vec_id"),
        VectorOps.quantizedInt8(col("embedding")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      val q = rows(id)
      // int8 range: floor keeps positives <= 127; the negative max element
      // can land on -128 when (127/m)*m overshoots by an ulp — valid int8
      assert(q.forall(x => x >= -128L && x <= 127L), s"out of range: $q")
      v.zip(q).foreach { case (orig, quant) =>
        if (orig > 0) assert(quant >= 0L) else if (orig < 0) assert(quant <= 0L)
      }
      assert(q.exists(x => x >= 126L || x <= -127L), s"no full-scale element: $q")
    }
  }

  test("normalized vectors have unit norm (non-zero inputs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Seq(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val unit = df.select(VectorOps.normalized(col("embedding")).as("u"))
      .selectExpr("aggregate(u, cast(0.0 as double), (a, x) -> a + x * x) as n2")
      .collect().head.getDouble(0)
    assert(math.abs(unit - 1.0) < 1e-12)
  }

  test("random projection: basis vector reads out the sign column; scaling is exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 16
    val e0 = Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val e0x2 = e0.map(_ * 2.0f)
    val df = Seq((1L, e0.toSeq), (2L, e0x2.toSeq)).toDF("vec_id", "embedding")
    val r = df.select(col("vec_id"),
        VectorOps.randomProject(col("embedding"), outDims = 4, dim = dim).as("p"))
      .orderBy("vec_id").collect()
    val p1 = r(0).getSeq[Double](1)
    val p2 = r(1).getSeq[Double](1)
    // projecting e_0 yields column 0 of the ±1 sign matrix exactly
    (0 until 4).foreach { j =>
      assert(p1(j) == VectorOps.projSign(j, 0).toDouble, s"j=$j got ${p1(j)}")
    }
    // doubling the input doubles every output bit-exactly (±1.0 mult is exact)
    assert(p2 == p1.map(_ * 2.0))
  }

  test("mixture samplers: bucketed two-pass prefix identical to the corpus-window twins") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      size(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")),
        " ")).cast("long").as("n_tokens"))
    val weights = Map("en" -> 0.55, "de" -> 0.25, "fr" -> 0.0)
    // POSITIONAL schema parity: the two-pass form must return columns in
    // the same order as the window twins (positional consumers break if
    // the prefix-select joins reorder them)
    assert(Sampling.mixture(docs, "doc_id", "lang", weights, 400L)
        .columns.toSeq ==
      Sampling.mixtureWindow(docs, "doc_id", "lang", weights, 400L)
        .columns.toSeq, "mixture column order diverged from the window twin")
    assert(Sampling.mixtureByTokens(docs, "doc_id", "lang", "n_tokens",
        weights, 9000L).columns.toSeq ==
      Sampling.mixtureByTokensWindow(docs, "doc_id", "lang", "n_tokens",
        weights, 9000L).columns.toSeq,
      "mixtureByTokens column order diverged from the window twin")
    // row-budget form: same rows, same ranks
    val nowR = Sampling.mixture(docs, "doc_id", "lang", weights, 400L)
      .select("doc_id", "lang", "mix_rk").orderBy("doc_id").collect().toSeq
    val oldR = Sampling.mixtureWindow(docs, "doc_id", "lang", weights, 400L)
      .select("doc_id", "lang", "mix_rk").orderBy("doc_id").collect().toSeq
    assert(nowR.nonEmpty && nowR == oldR,
      s"mixture diverged: ${nowR.size} vs ${oldR.size} rows")
    // token-budget form: same docs, same cumulative, incl. the straddler
    val nowT = Sampling.mixtureByTokens(docs, "doc_id", "lang", "n_tokens",
        weights, 9000L)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
      .orderBy("doc_id").collect().toSeq
    val oldT = Sampling.mixtureByTokensWindow(docs, "doc_id", "lang",
        "n_tokens", weights, 9000L)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
      .orderBy("doc_id").collect().toSeq
    assert(nowT.nonEmpty && nowT == oldT,
      s"mixtureByTokens diverged: ${nowT.size} vs ${oldT.size} rows")
    // degenerate quotas: empty weights -> nothing; tiny budget -> prefix of 1
    assert(Sampling.mixture(docs, "doc_id", "lang", Map("xx" -> 1.0), 100L)
      .count() == 0)
    val one = Sampling.mixture(docs, "doc_id", "lang", Map("en" -> 1.0), 1L)
    val oneOld = Sampling.mixtureWindow(docs, "doc_id", "lang", Map("en" -> 1.0), 1L)
    assert(one.select("doc_id").collect().toSeq ==
      oneOld.select("doc_id").collect().toSeq)
  }

  test("epoch mixture: realized mass tracks epochs, copies contiguous, unmapped dropped") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01").select("doc_id", "lang")
    val strata = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val epochs = Map("en" -> 2.5, "de" -> 1.25, "fr" -> 1.0, "es" -> 0.5)
    val out = Sampling.epochMixture(docs, "doc_id", "lang", epochs)
      .select("doc_id", "lang", "n_copies", "copy")
      .as[(Long, String, Long, Long)].collect()
    // unmapped stratum fully dropped
    assert(!out.exists(_._2 == "zh"))
    // copies are contiguous 1..n_copies per doc
    out.groupBy(_._1).foreach { case (_, rows) =>
      val n = rows.head._3
      assert(rows.map(_._4).sorted.toSeq == (1L to n))
    }
    // realized per-stratum mass = epochs * stratum size, within the
    // binomial noise of the fractional-copy draw (content-addressed, but
    // the fixture is one sample of it)
    epochs.foreach { case (lang, e) =>
      val n = strata(lang).toDouble
      val realized = out.count(_._2 == lang).toDouble
      assert(math.abs(realized - e * n) <= 3 * math.sqrt(n) + 1,
        s"$lang: $realized vs ${e * n}")
    }
    // determinism: same call, same rows
    val again = Sampling.epochMixture(docs, "doc_id", "lang", epochs)
      .select("doc_id", "lang", "n_copies", "copy")
      .as[(Long, String, Long, Long)].collect()
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }
}
