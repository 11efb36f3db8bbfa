package graft.operators

import graft.SparkSpec

/** Preference-pair mining semantics: margin gating, widest-gap-first
  * ranking with deterministic tiebreaks, group isolation, and the top-pairs
  * cap. Uses the real classifier scores on synthetic single-token docs so
  * the expected scores are derivable from the model map. */
class DpoPairsSpec extends SparkSpec {

  // single-word docs: score = weight(featureId(word)); doc_id picks the group
  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scoreOf(word: String): Long = {
    val r = Classifier.scoreUnsorted(docs((0L, word))).head()
    r.getAs[Long]("score")
  }

  test("margin gates pairs; ranking is gap-desc with id tiebreaks; groups isolate") {
    // find two words with a large score gap and one in between
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet")
    val scored = words.map(w => w -> scoreOf(w)).sortBy(_._2)
    val lo = scored.head; val hi = scored.last
    assert(hi._2 - lo._2 > 0)
    val margin = hi._2 - lo._2 // only the extreme pair clears it
    val df = docs(
      (0L, lo._1), (200L, hi._1),          // group 0
      (1L, scored(4)._1), (201L, scored(5)._1)) // group 1: small gap
    val got = Classifier.preferencePairs(df, groups = 200L, margin = margin)
      .collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got.head
    assert(r.getAs[Long]("grp") == 0L)
    assert(r.getAs[Long]("chosen_id") == 200L)
    assert(r.getAs[Long]("rejected_id") == 0L)
    assert(r.getAs[Long]("gap") == margin)
  }

  test("topPairs caps per group; rk orders by gap descending") {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val scored = words.map(w => w -> scoreOf(w)).sortBy(_._2)
    // one group: 3 low docs + 1 high doc -> 3 qualifying pairs (margin 1)
    val hi = scored.last
    val df = docs(
      (0L, scored.head._1), (200L, scored(1)._1), (400L, scored(2)._1),
      (600L, hi._1))
    val got = Classifier.preferencePairs(df, groups = 200L,
      margin = hi._2 - scored(2)._2, topPairs = 2).collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 2L))
    // rk 1 has the widest gap
    assert(got(0).getAs[Long]("gap") >= got(1).getAs[Long]("gap"))
    assert(got.forall(_.getAs[Long]("chosen_id") == 600L))
  }

  test("per-group cap is result-identical to the uncapped quadratic recipe " +
      "(tie-heavy group, brute-force replay)") {
    // one group stuffed with 30 docs including many score TIES — the case
    // where the top-P/bottom-P pre-cap could miss a pair if the tiebreak
    // argument were wrong. Brute-force replay is the uncapped ground truth.
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val wScore = words.map(w => w -> scoreOf(w)).toMap
    val rows = (0 until 30).map(i =>
      (i * 200L, words(i % words.length))) // all in group 0, 6-way ties
    val df = docs(rows: _*)
    val margin = 1L
    val topPairs = 3
    val got = Classifier.preferencePairs(df, groups = 200L,
      margin = margin, topPairs = topPairs)
      .collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("chosen_id"),
        r.getAs[Long]("rejected_id"), r.getAs[Long]("gap")))
      .toSeq
    // uncapped replay: all pairs, margin-gated, (gap desc, c, r) order
    val scoredRows = rows.map { case (id, w) => (id, wScore(w)) }
    val brute = (for {
      (c, sc) <- scoredRows; (r, sr) <- scoredRows
      if sc - sr >= margin
    } yield (c, r, sc - sr))
      .sortBy { case (c, r, gap) => (-gap, c, r) }
      .take(topPairs)
      .zipWithIndex
      .map { case ((c, r, gap), i) => (i + 1L, c, r, gap) }
    assert(got == brute, s"capped=$got\nbrute=$brute")
  }

  test("fixture lane: every pair clears the margin, chosen outscores rejected") {
    val rows = Classifier.preferencePairs(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("gap") >= 40L)
      assert(r.getAs[Long]("s_chosen") - r.getAs[Long]("s_rejected")
        == r.getAs[Long]("gap"))
      assert(r.getAs[Long]("chosen_id") % 200 == r.getAs[Long]("grp"))
      assert(r.getAs[Long]("rejected_id") % 200 == r.getAs[Long]("grp"))
    }
  }
}
