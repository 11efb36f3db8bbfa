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
}
