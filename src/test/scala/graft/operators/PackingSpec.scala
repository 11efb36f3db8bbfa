package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b c"),             // 3 tokens, start 0
    (1L, "d e f g h"),         // 5 tokens, start 3
    (2L, "i j"),               // 2 tokens, start 8
    (3L, "k l m n"),           // 4 tokens, start 10 -> crosses budget 8 at pack 1
    (4L, "o")                  // 1 token,  start 14
  ).toDF("doc_id", "text")

  test("packSequences: pack = first-token index div budget") {
    val r = Packing.packSequences(docs, budget = 8, bucketSize = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (0L, 3L, 0L, 0L),
      (1L, 5L, 3L, 0L),
      (2L, 2L, 8L, 1L),
      (3L, 4L, 10L, 1L),
      (4L, 1L, 14L, 1L)))
  }

  test("packCounts over precomputed counts equals packSequences; gaps in ids are fine") {
    import org.apache.spark.sql.functions._
    val counts = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    assert(Packing.packCounts(counts, budget = 8, bucketSize = 2).collect().toSeq
      == Packing.packSequences(docs, budget = 8, bucketSize = 2).collect().toSeq)
    // a scrub stage drops ids — placement stays a gapless token prefix-sum
    val gappy = Seq((0L, 3L), (2L, 5L), (9L, 2L)).toDF("doc_id", "n_tokens")
    val r = Packing.packCounts(gappy, budget = 8, bucketSize = 2)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((0L, 0L, 0L), (2L, 3L, 0L), (9L, 8L, 1L)))
  }

  test("packSequences: output invariant to bucketSize (offsets trick is exact)") {
    val expected = Packing.packSequences(docs, budget = 8, bucketSize = 1000).collect().toSeq
    for (b <- Seq(1L, 2L, 3L, 7L))
      assert(Packing.packSequences(docs, budget = 8, bucketSize = b).collect().toSeq
        == expected, s"bucketSize=$b diverged")
  }

  test("fimTransform: PSM parts reconstruct the original; parts non-empty; rate honored") {
    val out = Packing.fimTransform(Tables.documents(spark, sf)).collect()
    val applied = out.filter(_.getAs[Boolean]("fim_applied"))
    assert(applied.nonEmpty && applied.length < out.length)
    // rate ~50%: content-addressed selection should land well inside 30-70%
    val frac = applied.length.toDouble / out.length
    assert(frac > 0.3 && frac < 0.7, s"rate drifted: $frac")
    applied.foreach { r =>
      val (c1, c2, n) = (r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        r.getAs[Long]("n_tokens"))
      assert(1 <= c1 && c1 < c2 && c2 <= n - 1, s"cuts $c1/$c2/$n")
      val t = r.getAs[String]("fim_text")
      // PSM layout: reassembling prefix+middle+suffix re-creates the doc
      assert(t.startsWith("<PRE> ") && t.contains(" <SUF> ") && t.contains(" <MID> "))
      val body = t.stripPrefix("<PRE> ")
      val Array(pre, rest) = body.split(" <SUF> ", 2)
      val Array(suf, mid) = rest.split(" <MID> ", 2)
      assert(pre.nonEmpty && suf.nonEmpty && mid.nonEmpty)
      assert((pre.split(" ").length + mid.split(" ").length +
        suf.split(" ").length).toLong == n)
    }
  }
}
