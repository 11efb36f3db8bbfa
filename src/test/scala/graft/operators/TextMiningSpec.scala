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
}
