package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSpec {

  test("facade smoke: every entry point returns a working plan") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val ev = Tables.events(spark, sf)

    assert(Graft.curate(spark, sf).count() > 0)
    assert(Graft.nearDuplicates(docs).count() > 0)
    assert(Graft.similarTopK(emb, 2, 3).count() == 6)
    assert(Graft.similarTopKIvf(emb, 2, 3).count() == 6)
    assert(Graft.languageId(docs).columns.contains("pred_lang"))
    assert(Graft.sessionize(ev).count() > 0)
    assert(Graft.trainValTestSplit(docs.select("doc_id"), "doc_id")
      .select("split").distinct().count() == 3)
    assert(Graft.validationReport(spark, sf)
      .agg(sum("n_violations")).first().getLong(0) == 0L)
    assert(Graft.containmentJoin(docs).count() > 0)
    assert(Graft.decontaminate(docs).columns.contains("contaminated"))
    assert(Graft.packSequences(docs).count() == docs.count())
    assert(Graft.normalizeText(docs).columns.contains("clean_md5"))
    assert(Graft.vocabulary(docs, 5).count() == 5)
    Graft.enableSqlFunctions(spark)
    assert(spark.sql("SELECT rolling_hash32('a')").first().getLong(0) == 'a'.toInt)
  }
}
