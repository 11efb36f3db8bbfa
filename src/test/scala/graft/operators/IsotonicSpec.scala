package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Isotonic-calibration semantics: the relational minimax form must equal
  * a classic sequential pool-adjacent-violators reference exactly (both
  * express each fitted level as one division of the same exact integers),
  * stay monotone, and preserve already-monotone inputs. */
class IsotonicSpec extends SparkSpec {

  /** Reference PAV: pools (n, n_pos) blocks while the rate decreases. */
  private def pav(ladder: Seq[(Long, Long)]): Seq[Double] = {
    case class B(n: Long, pos: Long, span: Int) { def r: Double = pos.toDouble / n.toDouble }
    val st = scala.collection.mutable.Stack[B]()
    ladder.foreach { case (n, pos) =>
      var b = B(n, pos, 1)
      while (st.nonEmpty && st.top.r >= b.r) {
        val t = st.pop(); b = B(t.n + b.n, t.pos + b.pos, t.span + b.span)
      }
      st.push(b)
    }
    st.toSeq.reverse.flatMap(b => Seq.fill(b.span)(b.r))
  }

  /** Drive the operator with raw scores crafted so each score is its own
    * "truth batch"; recover the (bin -> n, n_pos) ladder it actually built
    * and compare fitted against the PAV reference bin-by-bin. */
  private def check(scored: org.apache.spark.sql.DataFrame): Unit = {
    val got = Classifier.isotonicCalibration(scored, "score", "truth")
      .collect()
    val ladder = got.map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_pos"))).toSeq
    val expect = pav(ladder)
    got.map(_.getAs[Double]("fitted")).zip(expect).zipWithIndex.foreach {
      case ((g, e), ix) => assert(g == e, s"bin index $ix: got $g expect $e")
    }
    // monotone non-decreasing, inside [0, 1]
    got.map(_.getAs[Double]("fitted")).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ =>
    }
    assert(got.forall(r => r.getAs[Double]("fitted") >= 0.0 &&
      r.getAs[Double]("fitted") <= 1.0))
  }

  private def scoredDf(rows: (Long, Boolean)*) = {
    import spark.implicits._
    rows.toDF("score", "truth")
  }

  test("violating ladder pools exactly like sequential PAV") {
    // scores spread across bins; truths engineered to zig-zag
    val rows = Seq.tabulate(300) { i =>
      val s = (i % 30) * 3000L - 45000L // 30 distinct margins, +/-
      val truth = (i * 2654435761L % 97) < (20 + (i % 30) * 2) // loosely rising
      (s, truth)
    }
    check(scoredDf(rows: _*))
  }

  test("already-monotone rates pass through unchanged") {
    // two far-apart margins: low one all-false, high one all-true
    val rows = Seq.fill(50)((-80000L, false)) ++ Seq.fill(50)((80000L, true))
    val got = Classifier.isotonicCalibration(
      scoredDf(rows: _*), "score", "truth").collect()
    assert(got.length == 2)
    assert(got.head.getAs[Double]("fitted") == 0.0)
    assert(got.last.getAs[Double]("fitted") == 1.0)
    check(scoredDf(rows: _*))
  }

  test("total inversion pools everything to the global rate") {
    val rows = Seq.fill(40)((-90000L, true)) ++ Seq.fill(60)((90000L, false))
    val got = Classifier.isotonicCalibration(
      scoredDf(rows: _*), "score", "truth").collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getAs[Double]("fitted") == 0.4))
  }

  test("weighted pooling: the pooled level is the weighted mean") {
    // bin A: n=10 rate 0.9 ; bin B: n=30 rate 0.5 -> pooled (9+15)/40 = 0.6
    val rows =
      Seq.fill(9)((-90000L, true)) ++ Seq.fill(1)((-90000L, false)) ++
      Seq.fill(15)((90000L, true)) ++ Seq.fill(15)((90000L, false))
    val got = Classifier.isotonicCalibration(
      scoredDf(rows: _*), "score", "truth").collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getAs[Double]("fitted") == 0.6))
  }

  test("fixture e2e matches PAV and stays monotone") {
    val scored = Classifier.scoreUnsorted(
      graft.sources.Tables.documents(spark, sf),
      keep = Seq((col("lang") === "en").as("truth")))
    check(scored)
  }
}
