package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class CurationPipelineSpec extends SparkSpec {

  test("every gate does real work and the kept set is a strict, stable subset") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val kept = CurationPipeline.keptDocuments(spark, sf)
    val n = kept.count()
    assert(n > 0 && n < total, s"kept $n of $total — gates must filter but not empty")

    // near-dup removal: no surviving pair above the threshold among kept docs
    val keptDocs = docs.join(kept, "doc_id")
    val residualPairs = NearDup.minhashPairs(keptDocs, 0.5).count()
    assert(residualPairs == 0, "kept set must be near-dup free")

    // deterministic across runs
    val again = CurationPipeline.keptDocuments(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(again == kept.collect().map(_.getLong(0)).toSeq)
  }

  test("incremental admission: every stage fires on a planted batch, history untouched") {
    import spark.implicits._
    // ~290 chars, stopword-bearing: passes the len/stop-ratio quality gate
    val base =
      ("the quick brown fox jumps over a lazy dog of summer and winter " +
       "to spring in autumn is nice ") * 3
    val base2 =
      ("a stormy night sails the dark sea of stars and moons " +
       "to drift in silence is calm ") * 3
    def doc(id: Long, t: String) = (id, t.trim)
    val history = Seq(
      doc(1L, base + "one"),
      doc(2L, base2 + "anchor tail")
    ).toDF("doc_id", "text")
    val batch = Seq(
      doc(10L, "slow join " + base),          // blocklist (first stage wins)
      doc(11L, "short"),                      // quality (too short)
      doc(12L, base + "one"),                 // exact vs history doc 1
      doc(13L, base2 + "anchor tail extra"),  // near-dup of history doc 2
      doc(14L, ("the iron gate creaks while a raven calls of omens and " +
        "dust to settle in ruins is grim ") * 3),            // kept
      doc(15L, ("a copper kettle sings when the steam rises of dawn and " +
        "frost to melt in sunlight is warm ") * 3),  // within-batch exact seed
      doc(16L, ("a copper kettle sings when the steam rises of dawn and " +
        "frost to melt in sunlight is warm ") * 3)   // exact dup of 15
    ).toDF("doc_id", "text")
    val out = CurationPipeline.admitBatch(batch, history,
        Seq("slow join"), 0.5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "blocklist")
    assert(out(11L) == "quality")
    assert(out(12L) == "exact_dup")
    assert(out(13L) == "near_dup")
    assert(out(15L) == "kept")       // smaller id survives the within pair
    assert(out(16L) == "exact_dup")  // within-batch duplicate of 15
  }

  test("v5: blocklist gate bites, shards are monotone and full except the tail") {
    val v5 = CurationPipeline.trainingManifestV5(spark, sf).collect()
    assert(v5.nonEmpty)

    // no blocklisted doc survives into the manifest
    val docs = Tables.documents(spark, sf)
    val blockedIds = docs
      .filter(TextAnalysis.blockedBy(CurationPipeline.BlockPhrases, col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(blockedIds.nonEmpty, "fixture must exercise the gate")
    assert(v5.map(_.getLong(0)).toSet.intersect(blockedIds).isEmpty)

    // shard is monotone non-decreasing in pack_id; first-byte placement
    // bounds a non-final shard's shortfall by one pack (a pack straddling
    // the boundary stays in the shard holding its first token)
    val byPack = v5.groupBy(_.getLong(4)).toSeq.sortBy(_._1)
      .map { case (p, rs) => (p, rs.head.getLong(6), rs.map(_.getLong(2)).sum) }
    assert(byPack.map(_._2) == byPack.map(_._2).sorted)
    val maxPack = byPack.map(_._3).max
    val byShard = byPack.groupBy(_._2).toSeq.sortBy(_._1)
    byShard.dropRight(1).foreach { case (s, packs) =>
      assert(packs.map(_._3).sum > CurationPipeline.ShardTokens - maxPack,
        s"shard $s")
    }
    assert(byShard.length >= 2, "fixture must produce multiple shards")
  }
}
