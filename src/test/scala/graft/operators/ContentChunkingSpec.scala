package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class ContentChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("chunks tile each document exactly: contiguous, 1..n, no overlap") {
    val bad = ContentChunking.cdcChunks(docs)
      .groupBy("doc_id")
      .agg(min("chunk_start").as("first"),
        max("chunk_end").as("last"),
        sum("chunk_len").as("covered"))
      .join(docs.select(col("doc_id"),
        size(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")),
          " ")).cast("long").as("n")), "doc_id")
      .filter(col("first") =!= 1 || col("last") =!= col("n") ||
        col("covered") =!= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("content-defined boundaries RESYNC after an edit; fixed-size chunks do not") {
    // drop the first token of one synthetic doc: every CDC chunk whose
    // window does not span the edit keeps its digest; fixed 16-token
    // chunking shifts every chunk after the edit
    val words = (1 to 400).map(i => s"w$i") // distinct tokens: every chunk digest unique
    val orig = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val edit = Seq((1L, words.drop(1).mkString(" "))).toDF("doc_id", "text")
    def digests(df: org.apache.spark.sql.DataFrame): Seq[String] =
      ContentChunking.cdcChunks(df).select("chunk_md5").as[String].collect().toSeq
    val a = digests(orig)
    val b = digests(edit)
    val shared = a.toSet.intersect(b.toSet).size
    // all chunks except the one containing the edit survive
    assert(shared >= a.length - 2,
      s"CDC resync failed: ${a.length} chunks, only $shared shared")
    // the fixed-size control: same edit, every chunk digest changes
    def fixedDigests(ws: Seq[String]): Seq[String] =
      ws.grouped(16).map(g => java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString)
        .toSeq
    val fShared = fixedDigests(words).toSet
      .intersect(fixedDigests(words.drop(1)).toSet).size
    assert(fShared == 0, "fixed-size chunking should not resync after a 1-token edit")
  }

  test("plan is narrow: no exchange except the presentation sort") {
    val p = ContentChunking.cdcChunks(docs).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("rangepartitioning"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("chunkReuse: identical corpora reuse everything; edits only lose their neighborhood") {
    val identical = ContentChunking.chunkReuse(docs, docs)
      .filter(col("reused_ratio") =!= 1.0).count()
    assert(identical == 0L)
    // prefix-edit every doc (worst case for fixed chunking): content-defined
    // chunks keep the majority of each multi-chunk doc
    val w = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val edited = docs.select(col("doc_id"),
      array_join(slice(w, lit(2), greatest(size(w) - 1, lit(0))), " ").as("text"))
    val r = ContentChunking.chunkReuse(docs, edited)
      .filter(col("n_chunks") >= 3)
      .agg(avg("reused_ratio")).head().getDouble(0)
    assert(r > 0.5, s"multi-chunk docs only reused $r after a 1-token prefix edit")
  }

  test("chunkReuse exchanges carry digests, never text or token arrays") {
    val p = ContentChunking.chunkReuse(docs, docs).queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(l => !l.contains("text") && !l.contains("w#")),
      exchanges.mkString("\n"))
  }

  test("short docs (fewer tokens than the window) yield one whole-doc chunk") {
    val tiny = Seq((9L, "alpha beta")).toDF("doc_id", "text")
    val rows = ContentChunking.cdcChunks(tiny).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(2) == 1L && rows.head.getLong(3) == 2L)
  }
}
