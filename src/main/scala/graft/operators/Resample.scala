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

  /** Linear interpolation onto the same per-key grid: each slot takes
    * prev + (next - prev) * (t - t_prev) / (t_next - t_prev) between its
    * bracketing observations, the nearest observed value beyond the edges
    * (flat extrapolation). Same single shuffle as [[ffill]]; the backward
    * pass is a second window over the SAME partitioning (no new exchange).
    * The arithmetic is plain IEEE double in an engine-independent
    * parenthesization, so an oracle reproduces it bit-exactly. */
  def interpolate(events: DataFrame, stepSeconds: Long = 3600L): DataFrame = {
    val obs = events.select(
      col("user_id"),
      col("ts").cast("timestamp").cast("long").as("t"),
      col("event_id"), col("value"))

    val grid = obs.groupBy("user_id")
      .agg((floor(min(col("t")) / stepSeconds) * stepSeconds).cast("long").as("lo"),
           (floor(max(col("t")) / stepSeconds) * stepSeconds).cast("long").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(stepSeconds))).as("t"))

    // observations sort BEFORE the grid slot at the same t for the backward
    // pass and AFTER it for... no: one consistent order (obs first) works for
    // both directions because the windows exclude/include the current row
    // symmetrically via the side filter, not the frame bound
    val tagged = obs
      .select(col("user_id"), col("t"), lit(0).as("side"),
        col("event_id"), col("value"))
      .unionAll(grid.select(col("user_id"), col("t"), lit(1).as("side"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value")))

    val ord = Seq(col("t").asc, col("side").asc, col("event_id").asc_nulls_last)
    val wPrev = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward pass: `first(...) over (currentRow, unboundedFollowing)` is
    // the ONE window frame Spark executes by reprocessing the frame per row
    // — O(n²) per partition (measured: 13.5 s at sf0.1 vs 0.9 s for the
    // backward pass). The fix is the standard reversal: sort DESCENDING
    // (exact mirror order, asc_nulls_last → desc_nulls_first) and take the
    // running `last(...)` over the O(n) unboundedPreceding frame — "nearest
    // following observation" becomes "most recent in reverse order".
    val ordRev = Seq(col("t").desc, col("side").desc,
      col("event_id").desc_nulls_first)
    val wNextRev = Window.partitionBy("user_id").orderBy(ordRev: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // multiple observations in one second: prev takes the LAST of the tied
    // group (event_id order), next takes the FIRST — both deterministic
    val tObs = when(col("side") === 0, col("t"))
    val out = tagged
      .withColumn("vn", last("value", ignoreNulls = true).over(wNextRev))
      .withColumn("tn", last(tObs, ignoreNulls = true).over(wNextRev))
      .withColumn("vp", last("value", ignoreNulls = true).over(wPrev))
      .withColumn("tp", last(tObs, ignoreNulls = true).over(wPrev))
      .filter(col("side") === 1)
    out.select(col("user_id"), col("t").as("slot_sec"),
        when(col("tp").isNull, col("vn"))
          .when(col("tn").isNull, col("vp"))
          .when(col("tn") === col("tp"), col("vp"))
          .otherwise(col("vp") + (col("vn") - col("vp")) *
            ((col("t") - col("tp")).cast("double") / (col("tn") - col("tp")).cast("double")))
          .as("interp_value"))
      .orderBy("user_id", "slot_sec")
  }
}
