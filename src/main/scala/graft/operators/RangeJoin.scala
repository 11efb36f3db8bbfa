package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: points against `[lo, hi)` intervals,
  * optionally co-keyed on equality columns.
  *
  * Spark plans a bare non-equi join (`ts >= lo && ts < hi`) as a
  * BroadcastNestedLoopJoin — every point compared against every interval,
  * quadratic work and broadcast-bound; unusable once the interval side
  * outgrows the driver. Binning restores an equi-join: each interval is
  * replicated to the `ceil(len/bucket)+1` fixed-width buckets it overlaps,
  * each point lands in exactly ONE bucket (so no post-join dedup is needed),
  * and the join runs as a hash/sort-merge join on (keys..., bucket) with the
  * exact range predicate applied as a residual filter.
  *
  * Scale shape: one shuffle of each side on the bucket key; replication
  * factor = mean interval length / bucket width — pick `bucket` near the
  * typical interval length so intervals replicate ~2x. Skewed buckets are
  * ordinary join skew (AQE splits them). This is the standard interval-join
  * strategy in distributed engines; a merge-based interval join would need a
  * custom SparkPlan for strictly less shuffle, which the replication factor
  * rarely justifies.
  *
  * Domain note: bucket ids come from `floor(value / bucket)` in doubles —
  * exact for |value| < 2^53 (any epoch timestamp); `bucket` must be > 0.
  */
object RangeJoin {

  def binned(points: DataFrame, intervals: DataFrame,
             ts: String, lo: String, hi: String,
             bucket: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val b0 = floor(col(lo).cast("double") / bucket).cast("long")
    // hi is exclusive: the last covered bucket is floor((hi-1)/bucket);
    // greatest() guards empty intervals (hi <= lo), which replicate to one
    // bucket and match nothing
    val b1 = greatest(floor((col(hi).cast("double") - 1) / bucket).cast("long"), b0)
    val ivB = intervals.withColumn("__b", explode(sequence(b0, b1)))
    val ptB = points.withColumn("__b", floor(col(ts).cast("double") / bucket).cast("long"))
    ptB.join(ivB, keys :+ "__b")
      .filter(col(ts) >= col(lo) && col(ts) < col(hi))
      .drop("__b")
  }

  /** Assign every event to its gap-session window — the natural self-check
    * for the binned join (sessions partition each user's timeline, so the
    * output is total: one row per event). */
  def eventsToSessions(events: DataFrame, gapSeconds: Long = 1800L,
                       bucket: Long = 3600L): DataFrame = {
    val sessions = JsonOps.sessionize(events, gapSeconds)
      .withColumn("hi_excl", col("session_end") + 1)
      .select("user_id", "session_seq", "session_start", "hi_excl")
    val points = events.select(col("event_id"), col("user_id"),
      col("ts").cast("timestamp").cast("long").as("ts_sec"))
    binned(points, sessions, ts = "ts_sec", lo = "session_start",
      hi = "hi_excl", bucket = bucket, keys = Seq("user_id"))
      .select("event_id", "user_id", "session_seq")
      .orderBy("event_id")
  }
}
