package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter-pruned equi-join: prune the probe side with a compact sketch
  * of the build side's keys BEFORE the join, so rows that cannot match never
  * enter the join exchange.
  *
  * This is the manual, deterministic form of Spark's runtime row-level
  * filtering (`InjectRuntimeFilter`), built from the same Catalyst pieces —
  * `bloom_filter_agg` on the build keys, `might_contain` on the probe — but
  * declared in the plan instead of depending on optimizer heuristics
  * (creation-side size thresholds, shuffle-presence checks) that may decline
  * to fire.
  *
  * Scale contract: the sketch is a single `aggregate` over the build side
  * (bytes, not rows — default 1M items ≈ 1.2 MB) broadcast to every probe
  * partition; probe rows failing `might_contain` drop BEFORE the join
  * shuffle. With a selective build side the exchange volume falls by the
  * match rate; false positives (~3%) are removed by the exact join, so the
  * result is identical to the plain join — which is exactly what the oracle
  * checks.
  *
  * VERSION PIN: `BloomFilterAggregate`, `BloomFilterMightContain`, and
  * `ScalarSubquery` are Catalyst-internal (private, no compatibility
  * promise) — constructor signatures or analyzer acceptance can change on
  * a Spark minor bump. Built and tested against Spark 4.1.x (same pin as
  * [[org.apache.spark.sql.graft.ColumnBridge]]); `BloomJoinSpec`'s
  * plan-shape assertions are the upgrade tripwire — if a bump breaks
  * compilation or planning here, prefer re-expressing the probe filter via
  * `expr("might_contain(...)")` should a stable SQL form accept a scalar
  * subquery by then. */
object BloomJoin {

  private def bloomAgg(keyHash: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(keyHash), expectedItems)
        .toAggregateExpression())

  /** `might_contain(bloom, xxhash64(key))` — no false negatives. */
  def mightContain(bloom: Column, keyHash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(keyHash)))

  /** Inner equi-join of `probe` to `build` on `key`, with the probe side
    * bloom-pruned first. Result is row-identical to
    * `probe.join(build, Seq(key))`.
    *
    * The sketch reaches the probe filter as a SCALAR SUBQUERY (the analyzer
    * rejects `might_contain` over a join attribute — it must be a constant
    * or subquery result, the same contract `InjectRuntimeFilter` satisfies):
    * the subquery executes once, its 1x1 binary result ships with the task
    * closures, and the probe filter evaluates locally — no join, no shuffle,
    * before the real equi-join. */
  def pruned(probe: DataFrame, build: DataFrame, key: String,
             expectedItems: Long = 1000000L): DataFrame = {
    val sketch = build.agg(
      bloomAgg(xxhash64(col(key)), expectedItems).as("__bloom"))
    val prunedProbe = probe.where(ColumnBridge.column(
      BloomFilterMightContain(
        ScalarSubquery(sketch.queryExecution.analyzed),
        ColumnBridge.expression(xxhash64(col(key))))))
    prunedProbe.join(build, Seq(key))
  }
}
