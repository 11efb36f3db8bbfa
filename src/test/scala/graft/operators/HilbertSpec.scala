package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class HilbertSpec extends SparkSpec {

  import spark.implicits._

  test("reference xy2d: bijective and neighbor-adjacent (exhaustive, 4 bits)") {
    val bits = 4; val n = 1 << bits
    val m = (for { x <- 0 until n; y <- 0 until n }
      yield Hilbert.xy2d(bits, x, y) -> (x, y)).toMap
    assert(m.size == n * n, "bijective over the full grid")
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = m(d.toLong); val (x2, y2) = m(d.toLong + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d not adjacent: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("column expression equals the reference on the full 4-bit grid") {
    val bits = 4; val n = 1 << bits
    val grid = (for { x <- 0L until n; y <- 0L until n } yield (x, y))
      .toDF("cx", "cy")
    // identity normalization: min 0, max n-1 over the full grid
    val out = Hilbert.withHKey(grid, Seq("cx", "cy"), bits)
      .select("cx", "cy", "hkey").collect()
    out.foreach { r =>
      assert(r.getLong(2) == Hilbert.xy2d(bits, r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("hilbert buckets are at least as tight as zorder's on the fixture") {
    val li = Tables.lineitem(spark, sf)
    def span(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => (r.getLong(3) - r.getLong(2)) + (r.getLong(5) - r.getLong(4))).sum
    val h = Hilbert.clusteringReport(li, Seq("l_partkey", "l_suppkey")).collect()
    val z = ZOrder.clusteringReport(li, Seq("l_partkey", "l_suppkey")).collect()
    // locality claim, measured: total per-bucket min/max span of the two
    // key columns — hilbert should not be materially worse than morton
    assert(span(h) <= (span(z) * 1.1).toLong, s"hilbert ${span(h)} vs z ${span(z)}")
  }

  test("the key pipeline is narrow: one broadcast stats join, no shuffle before the agg") {
    val p = Hilbert.withHKey(Tables.lineitem(spark, sf),
      Seq("l_partkey", "l_suppkey")).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }
}
