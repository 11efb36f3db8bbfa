package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("exact duplicates verify at distance 0; a reordered doc is caught only by the char metric") {
    val t = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val syn = Seq(
      (1L, t),
      (2L, t),                                  // exact dup -> dist 0
      (3L, t.replace("quick", "quack")),        // 1-char substitution
      (4L, "completely different content about spark physical plans and shuffles entirely")
    ).toDF("doc_id", "text")
    val pairs = NearDup.editDistancePairs(syn, hammingMax = 16, maxRatioPct = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    assert(pairs.contains((1L, 2L, 0L)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 1L)) // quick->quack = 1 substitution
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("verification only tightens the simhash candidate set") {
    val cand = NearDup.simhashPairs(docs, 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val verified = NearDup.editDistancePairs(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(cand))
  }

  test("distanceCap dominates the relative bound on the fixture corpus") {
    // contract: cap >= 30% of the longest normalized doc, else thresholded
    // levenshtein (-1) could reject a pair the relative rule accepts
    val maxLen = docs.select(
      max(length(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))))
      .as[Int].head()
    assert(maxLen * 30 / 100 < 4000, s"normalized max len $maxLen breaks the default cap")
  }

  test("pair exchange carries no document text (ids+fingerprints only)") {
    val p = NearDup.editDistancePairs(docs).queryExecution.executedPlan.toString
    // the self-join's exchanges are on the blocked fingerprint frame; the
    // norm columns appear only in the post-candidate broadcast rejoin
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.forall(l => !l.contains("norm")), exchangeLines.mkString("\n"))
  }
}
