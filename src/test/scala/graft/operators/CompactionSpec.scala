package graft.operators

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def files = Seq(
    // part p0: 5 files of 400 bytes -> bins 0,0,0 (1200 spill ok), 1, 1
    ("p0", 1L, 400L), ("p0", 2L, 400L), ("p0", 3L, 400L),
    ("p0", 4L, 400L), ("p0", 5L, 400L),
    // part p1: one oversized file + a small tail
    ("p1", 1L, 2500L), ("p1", 2L, 100L),
  ).toDF("part", "file_id", "bytes")

  test("placement: a file lands in the bin holding its first byte") {
    val a = Compaction.assign(files, 1000L).orderBy("part", "file_id").collect()
    val p0 = a.filter(_.getString(0) == "p0")
    assert(p0.map(_.getLong(4)).toSeq == Seq(0L, 0L, 0L, 1L, 1L))
    assert(p0.map(_.getLong(3)).toSeq == Seq(0L, 400L, 800L, 1200L, 1600L))
    // oversized file occupies bins 0..2's byte range but is one unit in bin 0
    val p1 = a.filter(_.getString(0) == "p1")
    assert(p1.map(_.getLong(4)).toSeq == Seq(0L, 2L))
  }

  test("plan: bytes conserved, only the last bin per partition undersized") {
    val p = Compaction.plan(files, 1000L).collect()
    assert(p.map(_.getLong(3)).sum == 2500L + 100L + 5 * 400L)
    val byPart = p.groupBy(_.getString(0))
    byPart.foreach { case (_, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      // every non-final bin reached the target
      assert(sorted.dropRight(1).forall(!_.getBoolean(6)))
    }
  }

  test("incremental placement equals from-scratch when new ids sort last") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("source as part", "doc_id as file_id", "n_chars as bytes")
    val (hist, batch) =
      (docs.filter($"file_id" < 250), docs.filter($"file_id" >= 250))
    val incr = Compaction.assignIncremental(hist, batch, 1000L)
      .orderBy("part", "file_id").collect().toSeq
    val scratch = Compaction.assign(docs, 1000L)
      .filter($"file_id" >= 250).orderBy("part", "file_id").collect().toSeq
    assert(incr == scratch && incr.nonEmpty)
    // history reaches the plan only as a per-dir aggregate broadcast: no
    // sort-merge join, and the only window runs over the new batch
    val p = Compaction.assignIncremental(hist, batch, 1000L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("plan on the fixture corpus: deterministic and partition-parallel") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("source as part", "doc_id as file_id", "n_chars as bytes")
    val a = Compaction.plan(docs, 1000L).collect().toSeq
    val b = Compaction.plan(docs, 1000L).collect().toSeq
    assert(a == b && a.nonEmpty)
    // plan text: the window partitions by the dir column (no global window)
    val plan = Compaction.assign(docs, 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(part"), plan.take(2000))
  }
}
