package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Collocation mining + blocklist filtering. */
class TextMiningSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("collocations: counts are real and lift matches the hand formula") {
    val out = TextAnalysis.collocations(docs, minCount = 5, k = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(2) >= 5)) // c_ab >= minCount
    assert(out.forall(_.getDouble(5) > 0.0))
    // hand check: c_a equals the direct unigram count of w1
    val direct = docs.select(
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " "))
          .as("t")).filter(col("t") === out.head.getString(0)).count()
    assert(out.head.getLong(3) == direct)
  }

  test("collocations: selection is by lift with deterministic ties") {
    val a = TextAnalysis.collocations(docs, 5, 30).collect().toSeq
    val b = TextAnalysis.collocations(docs, 5, 30).collect().toSeq
    assert(a == b)
    // output presentation order is (w1, w2)
    val keys = a.map(r => (r.getString(0), r.getString(1)))
    assert(keys == keys.sorted)
  }

  test("collocations plan: unigram/total joins broadcast, no sort-merge join") {
    val p = TextAnalysis.collocations(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("blocklist: word-boundary matching and first-match attribution") {
    val d = Seq(
      (1L, "the slow join ran"),          // hits 'slow join'
      (2L, "a slowjoin is one word"),     // no word-boundary hit
      (3L, "fast scan then slow join"),   // both -> first in LIST order wins
      (4L, "nothing here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(d, Seq("slow join", "fast scan"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(1)).toSeq == Seq(true, false, true, false))
    assert(out(0).getString(2) == "slow join")
    // doc 3 contains both; attribution is blocklist order, not text order
    assert(out(2).getString(2) == "slow join")
    assert(out(3).isNullAt(2))
  }

  test("blocklist: punctuation normalizes away before matching") {
    val d = Seq((1L, "Slow, JOIN!")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(d, Seq("slow join")).collect()
    assert(out.head.getBoolean(1))
  }

  test("blocklist plan: zero-exchange narrow map (no join, no shuffle)") {
    val p = TextAnalysis.blocklistFilter(docs, Seq("slow join"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("keywords: k per doc, rarer terms outrank commoner ones at equal tf") {
    val out = TfIdf.topTermsPerDoc(docs, k = 3).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    assert(byDoc.values.forall(rs => rs.map(_.getLong(1)).sorted.toSeq ==
      (1L to rs.length).toSeq))
    // within one doc: among rows with equal tf, df must be non-increasing
    // with rank (idf is strictly decreasing in df)
    byDoc.values.foreach { rs =>
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          if (a.getLong(3) == b.getLong(3)) // equal tf
            assert(a.getLong(4) <= b.getLong(4), s"df ordering in doc ${a.getLong(0)}")
        case _ =>
      }
    }
  }

  test("join cardinality estimate is exact and the hot key is identified") {
    val ev = graft.sources.Tables.events(spark, sf)
    val right = ev.filter(col("event_type") =!= "view")
    val est = Validate.joinCardinality(ev, right, "user_id").collect().head
    val actual = ev.select("user_id")
      .join(right.select("user_id"), "user_id").count()
    assert(est.getLong(1) == actual, s"est ${est.getLong(1)} vs actual $actual")
    assert(est.getDouble(3) > 0.0 && est.getDouble(3) <= 1.0)
  }

  test("fertility: bpe tokens >= whitespace words, one row per language") {
    val f = TextAnalysis.fertilityReport(docs).collect()
    assert(f.length == 5)
    assert(f.forall(r => r.getDouble(4) >= 1.0), "regex splits at least per word")
  }

  test("domain report: verdict rules fire on constructed domains") {
    val d = Seq(
      // dup-heavy: 10 docs, 2 distinct texts
      ("d0", 1L, "aaa bbb", 7L), ("d0", 2L, "aaa bbb", 7L), ("d0", 3L, "aaa bbb", 7L),
      ("d0", 4L, "aaa bbb", 7L), ("d0", 5L, "ccc ddd", 7L), ("d0", 6L, "ccc ddd", 7L),
      ("d0", 7L, "ccc ddd", 7L), ("d0", 8L, "ccc ddd", 7L), ("d0", 9L, "ccc ddd", 7L),
      ("d0", 10L, "ccc ddd", 7L),
      // short-heavy: 2 of 3 docs under 120 chars
      ("d1", 11L, "x" * 50, 50L), ("d1", 12L, "y" * 50, 50L), ("d1", 13L, "z" * 200, 200L),
      // clean
      ("d2", 14L, "w" * 200, 200L), ("d2", 15L, "v" * 300, 300L),
    ).toDF("source", "doc_id", "text", "n_chars")
    val out = Validate.domainReport(d).collect()
    val verdicts = out.map(r => r.getString(0) -> r.getString(5)).toMap
    // d1 is ALSO dup-free/short-heavy; d0 trips short first? No: d0 docs are
    // 7 chars — short_heavy fires before dup_heavy (attribution order)
    assert(verdicts("d0") == "short_heavy")
    assert(verdicts("d1") == "short_heavy")
    assert(verdicts("d2") == "keep")
    // rebuild d0 with long texts so the dup rule is the first to fail
    val d0long = Seq.tabulate(10)(i =>
      ("d3", 20L + i, ("longtext " * 20) + (if (i < 1) "unique" else "dup"), 200L))
      .toDF("source", "doc_id", "text", "n_chars")
    val v3 = Validate.domainReport(d0long).collect().head.getString(5)
    assert(v3 == "dup_heavy")
  }

  test("domainReportApprox: exact columns ride along, HLL verdict/accuracy booleans hold") {
    import spark.implicits._
    val d = (Seq.tabulate(6)(i => ("d0", i.toLong, "tiny" + (i % 2), 7L)) ++
      Seq(("d1", 10L, "longer unique text one", 200L),
        ("d1", 11L, "longer duplicated text", 210L),
        ("d1", 12L, "longer duplicated text", 210L),
        ("d1", 13L, "longer duplicated text", 210L)) ++
      Seq(("d2", 14L, "w" * 200, 200L), ("d2", 15L, "v" * 300, 300L)))
      .toDF("source", "doc_id", "text", "n_chars")
    val exact = Validate.domainReport(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getString(5))).toMap
    val approx = Validate.domainReportApprox(d).collect()
    assert(approx.map(_.getString(0)).toSeq == Seq("d0", "d1", "d2"))
    approx.foreach { r =>
      val (nDocs, nDups, verdict) = exact(r.getString(0))
      assert(r.getLong(1) == nDocs)
      assert(r.getLong(4) == nDups)
      assert(r.getString(5) == verdict)
      // at these cardinalities HLL++ runs in sparse (exact) mode, so both
      // booleans are provably TRUE and the estimated verdict matches
      assert(r.getString(6) == verdict, "verdict_est diverged")
      assert(r.getBoolean(7), "est_within_tol false")
      assert(r.getBoolean(8), "verdict_agrees false")
    }
  }

  test("bm25: exact copy of the query outranks partial overlap; saturation caps tf") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),          // exact copy of the query
      (2L, "alpha beta something else here"),  // partial overlap
      (3L, "alpha " * 50),                     // tf-stuffed single term
      (4L, "unrelated words entirely distinct"))
      .toDF("doc_id", "text")
    val r = TfIdf.bm25TopK(docs, nQueries = 1, k = 4).collect()
    assert(r.head.getAs[Long]("n_id") == 1L, r.mkString("; "))
    // saturation + length norm: 50x'alpha' must NOT outrank the 2-term overlap
    val byId = r.map(x => x.getAs[Long]("n_id") -> x.getAs[Long]("rk")).toMap
    assert(byId(3L) > byId(2L), byId.toString)
  }

  test("bm25: b=0 removes length normalization (long doc score rises)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta " + ("filler " * 100)), // relevant but long
      (2L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
    def score(b: Double) = TfIdf.bm25TopK(docs, nQueries = 1, k = 2, b = b)
      .filter(col("n_id") === 1L).collect().head.getAs[Double]("bm25")
    assert(score(0.0) > score(0.75), "length penalty must hurt the long doc")
  }

  test("lexicalDiversity: hand-checked integers on a constructed corpus") {
    import spark.implicits._
    val docs = Seq(
      ("mono", 1L, "spam spam spam spam"),       // V=1, N=4, pairs=12
      ("rich", 2L, "one two three four"))        // V=4, N=4, pairs=0
      .toDF("source", "doc_id", "text")
    val byS = TextAnalysis.lexicalDiversity(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = byS("mono")
    assert(m.getAs[Long]("n_tokens") == 4L && m.getAs[Long]("n_types") == 1L)
    assert(m.getAs[Double]("simpson") == 1.0) // two random tokens always equal
    assert(m.getAs[Double]("effective_types") == 1.0)
    val r2 = byS("rich")
    assert(r2.getAs[Double]("ttr") == 1.0 && r2.getAs[Double]("simpson") == 0.0)
    assert(r2.isNullAt(r2.fieldIndex("effective_types"))) // 1/0 guarded to NULL
  }
}
