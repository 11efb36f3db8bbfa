package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical time-series operator Spark has
  * no built-in for (preference (a) from the build rules: composed from
  * existing ops, no custom plan node needed).
  *
  * Semantics: for each left event, attach the latest right row with the same
  * key and right.time <= left.time (ties at equal time match).
  *
  * Implementation is the union trick — NOT a range join (which explodes to a
  * cartesian per key) and NOT a per-key collect: tag both sides, union, one
  * shuffle on the key, and a running `last(ignoreNulls)` window carries the
  * most recent right row forward into each event row. Cost at 100 TB: a
  * single hash exchange of (events + right) and a sorted window per key —
  * the same price as any per-key window, with bounded state. */
object AsofJoin {

  /** events (event_id, user_id, ts_sec) ASOF LEFT JOIN orders
    * (o_custkey, o_sec, o_orderkey, o_totalprice) on user/time. Right rows
    * are first deduped to one per (key, time) — greatest o_orderkey wins —
    * so the match is deterministic under time ties. */
  def eventsToLatestOrder(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.select(
      col("user_id"), col("ts").cast("timestamp").cast("long").as("t"),
      col("event_id"))
    val wDedup = Window.partitionBy("user_id", "t")
      .orderBy(col("o_orderkey").desc)
    val o = orders.select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").cast("timestamp").cast("long").as("t"),
      col("o_orderkey"), col("o_totalprice"))
      .withColumn("__rn", row_number().over(wDedup))
      .filter(col("__rn") === 1).drop("__rn")

    val tagged = o.select(col("user_id"), col("t"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey"), col("o_totalprice"))
      .unionAll(e.select(col("user_id"), col("t"), lit(1).as("side"),
        col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice")))

    // order rows sort before event rows at equal t => t_order <= t_event matches
    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("side").asc, col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("matched_order", last("o_orderkey", ignoreNulls = true).over(w))
      .withColumn("matched_price", last("o_totalprice", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts_sec"),
        col("matched_order"), col("matched_price"))
      .orderBy("event_id")
  }
}
