package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed grid per key, carrying the last observation forward (gap fill).
  *
  * Implementation: per-key min/max bound the grid (small aggregate),
  * `sequence()` + explode generates grid timestamps (distributed — no
  * driver-side calendar loop), a union with the observations and one
  * running `last(ignoreNulls)` window does the forward fill. One shuffle on
  * the key; window state is bounded per key. */
object Resample {

  /** events -> per (user_id, grid slot of `stepSeconds`) forward-filled last
    * value. Grid covers [floor(min_ts), floor(max_ts)] per user. */
  def ffill(events: DataFrame, stepSeconds: Long = 3600L): DataFrame = {
    val obs = events.select(
      col("user_id"),
      col("ts").cast("timestamp").cast("long").as("t"),
      col("event_id"), col("value"))

    val grid = obs.groupBy("user_id")
      .agg((floor(min(col("t")) / stepSeconds) * stepSeconds).cast("long").as("lo"),
           (floor(max(col("t")) / stepSeconds) * stepSeconds).cast("long").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(stepSeconds))).as("t"))

    // tag: observations (side=0) sort before the grid point at the same t,
    // so a grid slot picks up an observation landing exactly on it
    val tagged = obs
      .select(col("user_id"), col("t"), lit(0).as("side"),
        col("event_id"), col("value"))
      .unionAll(grid.select(col("user_id"), col("t"), lit(1).as("side"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value")))

    val w = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("side").asc, col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("ffill_value", last("value", ignoreNulls = true).over(w))
      .withColumn("ffill_event", last("event_id", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("t").as("slot_sec"),
        col("ffill_event"), col("ffill_value"))
      .orderBy("user_id", "slot_sec")
  }
}
