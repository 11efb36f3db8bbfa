package graft.operators

import graft.SparkSpec

/** k-core semantics: hand graphs with known cores, cascading peeling
  * (multi-round), empty cores, reversed-duplicate edge hygiene, fixture
  * convergence, and — the round-10 change — ADAPTIVE peeling: a deep-shell
  * graph whose peel depth exceeds the old fixed 16-round budget must still
  * reach the true k-core, with `rounds` now a safety cap only. */
class KCoreSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  test("K4 clique with a pendant tail: 3-core is exactly the clique") {
    // clique 1-2-3-4 (deg 3 each), tail 1-5, 5-6
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L))
    val got = Graph.kCore(g, "a", "b", k = 3).collect()
    assert(got.map(_.getAs[Long]("node")).toSet == Set(1L, 2L, 3L, 4L))
    got.foreach { r =>
      assert(r.getAs[Long]("core_deg") == 3L)
      assert(r.getAs[Boolean]("in_core"))
    }
  }

  test("path graph cascades to empty over multiple rounds") {
    // 2-core of a path peels one layer per round from each end: a 5-node
    // path needs 3 rounds to vanish — inside the default budget
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(Graph.kCore(g, "a", "b", k = 2).collect().isEmpty)
    // but a single round leaves the partially-peeled interior, not in_core
    val one = Graph.kCore(g, "a", "b", k = 2, rounds = 1).collect()
    assert(one.nonEmpty && one.exists(!_.getAs[Boolean]("in_core")))
  }

  test("cycle survives the 2-core; pendant does not") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 9L))
    val got = Graph.kCore(g, "a", "b", k = 2).collect()
    assert(got.map(_.getAs[Long]("node")).toSet == Set(1L, 2L, 3L, 4L))
    got.foreach(r => assert(r.getAs[Long]("core_deg") == 2L))
  }

  test("reversed duplicates and self-loops are canonicalized away") {
    val g = edges((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
    // triangle 1-2-3: 2-core with deg exactly 2 (the (2,1) dup must not
    // double-count the 1-2 edge)
    val got = Graph.kCore(g, "a", "b", k = 2).collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getAs[Long]("core_deg") == 2L))
  }

  test("deep shell: a 40-node pendant chain peels to the true core past the old fixed-16 budget") {
    // cycle 1-2-3-4 (the 2-core) with a 40-node chain hanging off node 1:
    // only the chain's free END is degree-1 each round, so peeling removes
    // exactly one chain node per round — peel depth 40. The old fixed-16
    // form stopped mid-chain (in_core=false rows); adaptive peeling must
    // reach the fixpoint: exactly the cycle, all in_core.
    val chain = (0L until 40L).map(i => (100L + i, 101L + i))
    val g = edges(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 100L))
      ++ chain: _*)
    val got = Graph.kCore(g, "a", "b", k = 2).collect()
    assert(got.map(_.getAs[Long]("node")).toSet == Set(1L, 2L, 3L, 4L),
      s"expected the 4-cycle core, got ${got.map(_.getAs[Long]("node")).toSet}")
    got.foreach(r => assert(r.getAs[Boolean]("in_core")))
    // ...and the old budget really would have missed it: capped at 16
    // rounds the chain is only half peeled and the verdict says so
    val capped = Graph.kCore(g, "a", "b", k = 2, rounds = 16).collect()
    assert(capped.exists(!_.getAs[Boolean]("in_core")),
      "16 rounds unexpectedly reached the fixpoint on a 40-deep chain")
  }

  test("fixture co-purchase graph converges inside the round budget") {
    val got = Graph.kCore(
      Graph.coOccurrenceEdges(
        graft.sources.Tables.lineitem(spark, sf)
          .select(org.apache.spark.sql.functions.col("l_orderkey"),
            org.apache.spark.sql.functions.col("l_partkey")),
        "l_orderkey", "l_partkey"),
      "item_a", "item_b", k = 3, rounds = 8).collect()
    // converged = every survivor keeps >= k neighbors inside the core
    got.foreach(r => assert(r.getAs[Boolean]("in_core")))
  }
}
