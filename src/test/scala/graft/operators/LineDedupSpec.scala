package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // "nav bar" opens 3 of 4 docs -> boilerplate at 1/2 threshold
    (1L, "nav bar alpha beta gamma delta"),
    (2L, "nav bar epsilon zeta"),
    (3L, "nav bar eta theta"),
    (4L, "iota kappa lambda mu")
  ).toDF("doc_id", "text")

  test("lines chunks into fixed word-width segments, short tail kept") {
    val ln = LineDedup.lines(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(ln.count(_._1 == 1L) == 3)
    assert(ln.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("nav bar", "alpha beta", "gamma delta"))
    // 5-word doc would keep a 1-word tail
    val odd = LineDedup.lines(Seq((9L, "a b c d e")).toDF("doc_id", "text"), 2)
      .orderBy("line_no").collect().map(_.getString(2)).toSeq
    assert(odd == Seq("a b", "c d", "e"))
  }

  test("boilerplateLines finds the corpus-frequent head with its share") {
    val hot = LineDedup.boilerplateLines(docs, 2, 2).collect()
    assert(hot.length == 1)
    val r = hot.head
    assert(r.getAs[String]("line") == "nav bar")
    assert(r.getAs[Long]("doc_freq") == 3L && r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("doc_share") == 0.75)
  }

  test("scrub cuts boilerplate lines and reconstructs ordered text") {
    val out = LineDedup.scrub(docs, 2, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("text_kept") == "alpha beta gamma delta")
    assert(out(1L).getAs[Long]("n_lines") == 3L)
    assert(out(1L).getAs[Long]("dropped_lines") == 1L)
    assert(out(4L).getAs[String]("text_kept") == "iota kappa lambda mu")
    assert(out(4L).getAs[Long]("dropped_lines") == 0L)
    // a doc that is ALL boilerplate comes back empty, attribution intact
    val all = LineDedup.scrub(docs.union(
      Seq((5L, "nav bar")).toDF("doc_id", "text")), 2, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(all(5L).getAs[String]("text_kept") == "")
    assert(all(5L).getAs[Long]("kept_lines") == 0L)
  }

  test("scrubIncremental equals the from-scratch scrub restricted to the batch") {
    val all = docs.union(Seq(
      (5L, "nav bar omega psi"),
      (6L, "chi phi nav bar")
    ).toDF("doc_id", "text"))
    val hist = all.filter(col("doc_id") <= 4)
    val batch = all.filter(col("doc_id") >= 5)
    val incr = LineDedup.scrubIncremental(
      LineDedup.docFreq(hist, 2),
      hist.agg(count(lit(1)).as("n_docs")),
      batch, 2, 2)
    val scratch = LineDedup.scrub(all, 2, 2)
      .filter(col("doc_id") >= 5)
    assert(incr.collect().toSeq == scratch.collect().toSeq)
    // the batch's "nav bar" lines were cut by history-informed frequency
    val out = incr.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(5L).getAs[String]("text_kept") == "omega psi")
    assert(out(6L).getAs[Long]("dropped_lines") == 1L)
  }

  test("softDedupWeights: 1/cluster-size, singletons weight 1, mass = #clusters") {
    val d = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // {1,2,3} one cluster via transitive pairs, {4} {5} singletons
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val w = Dedup.softDedupWeights(d, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(w(1L).getAs[Long]("cluster_size") == 3L)
    assert(w(2L).getAs[Double]("weight") == 1.0 / 3.0)
    assert(w(2L).getAs[Long]("cluster_id") == 1L)
    assert(w(4L).getAs[Double]("weight") == 1.0)
    assert(w(5L).getAs[Long]("cluster_id") == 5L)
    val mass = w.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(mass - 3.0) < 1e-9) // one unit per cluster
  }
}
