package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: JSON property extraction,
  * tumbling-window aggregation (the batch analogue of the streaming path in
  * graft.streaming), and gap-based sessionization.
  *
  * Scale notes: JSON extraction is a narrow map (no shuffle); window agg
  * shuffles once on (window, type) with partial aggregation; sessionization
  * shuffles once on user_id — the window within a user is bounded by that
  * user's event count, so no global funnel.
  */
object JsonOps {

  /** `ext_json_props`: pull typed values out of JSON property bags. */
  def extractProps(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** Tumbling event-time window aggregation (`ext_window_events`):
    * 1-hour windows x event_type. */
  def windowedCounts(df: DataFrame): DataFrame =
    df.groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("hour_start", "event_type")

  /** Sliding event-time windows: 2-hour windows sliding by 1 hour — each
    * event contributes to 2 windows. Spark's `window(ts, len, slide)`
    * enumerates member windows per row (a generator, not a self-join);
    * the aggregation then shuffles once on (window_start, type). */
  def slidingCounts(df: DataFrame): DataFrame =
    df.groupBy(
        window(col("ts"), "2 hours", "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("win_start", "event_type")

  /** Gap-based sessionization: a new session starts when a user's inter-event
    * gap exceeds `gapSeconds`. Classic lag -> boundary flag -> running sum.
    * Second-granularity gap arithmetic (floored epoch) for cross-engine
    * determinism. */
  /** PEAK CONCURRENCY per day — maximum simultaneous sessions, by the
    * classic boundary sweep: +1 at each session start, −1 just after its
    * end, running-sum the deltas in time order; the max is the peak. Two
    * determinism moves: deltas AGGREGATE PER INSTANT before the running
    * sum (so tie order between a start and an end at the same second can
    * never change an intermediate value), and the cross-day carry uses
    * the offsets trick — per-day windows run in parallel and a tiny
    * day-grain cumsum broadcasts the carry-in, so no global window exists
    * (the [[graft.operators.Chunking]] distributed-boundaries shape).
    *
    * Scale shape: session derivation is the user-partitioned sessionize;
    * the sweep relation is 2×sessions, immediately collapsed to distinct
    * instants. */
  def peakConcurrency(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val sess = sessionize(events, gapSeconds)
    val bounds = sess.select(col("session_start").as("t"), lit(1L).as("d"))
      .unionAll(sess.select((col("session_end") + 1).as("t"), lit(-1L).as("d")))
    val byT = bounds.groupBy("t").agg(sum(col("d")).cast("long").as("delta"))
      .withColumn("day", to_date(timestamp_seconds(col("t"))))
    val wDay = Window.partitionBy("day").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = byT.withColumn("run", sum(col("delta")).over(wDay))
    val perDay = byT.groupBy("day").agg(sum(col("delta")).cast("long").as("day_total"))
    // densify over the observed day range: a day lying entirely inside a
    // multi-day session has NO boundary row, but its concurrency is the
    // carry all day — it must still appear in the report
    val spine = perDay.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val dense = spine.join(perDay, Seq("day"), "left")
      .withColumn("day_total", coalesce(col("day_total"), lit(0L)))
    val wDays = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    val carry = dense
      .withColumn("carry", coalesce(sum(col("day_total")).over(wDays), lit(0L)))
      .select("day", "carry")
    // day-open concurrency (the carry itself) is a peak candidate: a day
    // whose only boundary is a session END was at `carry` until that end;
    // a boundary-free day peaks AT the carry
    val runMax = run.groupBy("day").agg(max(col("run")).as("max_run"))
    carry.join(runMax, Seq("day"), "left")
      .select(col("day"),
        greatest(coalesce(col("max_run") + col("carry"), col("carry")),
          col("carry")).cast("long").as("peak_concurrency"))
      .orderBy("day")
  }

  def sessionize(df: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val withGap = df
      .withColumn("ts_sec", col("ts").cast("timestamp").cast("long"))
      .withColumn("prev_sec", lag("ts_sec", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > gapSeconds)
          .cast("long"))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
           min("ts_sec").as("session_start"),
           max("ts_sec").as("session_end"))
      .orderBy("user_id", "session_seq")
  }

  /** SFT chat-transcript ASSEMBLY — the conversational-training-data
    * recipe: gap-sessionize an interaction log ([[sessionize]]'s exact
    * recurrence), render each session as a role-tagged transcript in
    * deterministic (ts, event_id) order with roles alternating by turn
    * parity, and report per session the turn count, the whitespace-token
    * count (the same normalize/split idiom as the text lanes), and the
    * transcript's md5. The digest, not the raw string, is the output
    * contract — rows stay narrow at any session length, and two engines
    * agree on the digest iff they agree on every byte of the assembly.
    *
    * Scale shape: one shuffle on the user key (the sessionize window),
    * then a (user, session)-grain aggregate whose state is one session's
    * lines — bounded by session length, never corpus-scale. */
  def chatAssemble(df: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val sessions = df
      .withColumn("ts_sec", col("ts").cast("timestamp").cast("long"))
      .withColumn("prev_sec", lag("ts_sec", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > gapSeconds)
          .cast("long"))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySession = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts_sec", "event_id")
    val lines = sessions
      .withColumn("turn", row_number().over(bySession) - 1)
      .withColumn("line", concat(
        when(pmod(col("turn"), lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")),
        lit(": "), coalesce(col("event_type"), lit(""))))
    val assembled = lines
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          sort_array(collect_list(struct(
            col("ts_sec"), col("event_id"), col("line")))),
          s => s.getField("line")), "\n").as("transcript"))
    assembled.select(col("user_id"),
        col("session_seq").cast("long").as("session_seq"), col("n_turns"),
        size(split(trim(regexp_replace(lower(col("transcript")),
          "[^a-z0-9]+", " ")), " ")).cast("long").as("n_tokens"),
        md5(col("transcript")).as("transcript_md5"))
      .orderBy("user_id", "session_seq")
  }

  /** TRUE time-window running aggregates: a RANGE frame over epoch seconds
    * — each event sees the count/sum of its user's events in the trailing
    * `horizonSeconds`, regardless of how many rows that is (the ROWS-frame
    * battery in Relational.windowBattery counts rows; this one measures
    * TIME — the "activity in the last hour" feature shape). One shuffle on
    * the user key; frame state is the horizon's worth of rows per user.
    * Ties at the same second share identical frame values by construction
    * (the frame depends on the ORDER value, not the row), so output is
    * deterministic under any partitioning. */
  def rollingWindow(events: DataFrame, horizonSeconds: Long = 3600L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
      .rangeBetween(-horizonSeconds, 0)
    events
      .withColumn("ts_sec", col("ts").cast("timestamp").cast("long"))
      .select(col("user_id"), col("event_id"), col("ts_sec"),
        count(lit(1)).over(w).as("n_last_hour"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("sum_last_hour"))
      .orderBy("user_id", "ts_sec", "event_id")
  }

  /** Gap sessions via Spark's NATIVE `session_window` operator — the
    * built-in that [[sessionize]] hand-rolls, included so both forms are
    * first-class (the native one also runs under Structured Streaming with
    * state-store-backed session merging). Semantics differ at the boundary:
    * `session_window` MERGES while the next event is strictly inside
    * [prev, prev + gap) — an event exactly `gap` later starts a NEW session
    * — whereas [[sessionize]] splits only on gap STRICTLY GREATER. The
    * arithmetic is microsecond-exact inside Spark; outputs floor to epoch
    * seconds, mirrored by the oracle's `epoch_us // 1e6`. */
  def sessionWindows(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.withColumn("__ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("__ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"))
      .select(col("user_id"),
        col("w.start").cast("long").as("session_start"),
        col("w.end").cast("long").as("session_end"),
        col("n_events"), col("first_event"))
      .orderBy("user_id", "session_start")

  /** Sequential-pattern mining: the `n`-step event-type paths users
    * actually walk, ranked by frequency ("view > click > purchase" — the
    * navigation-flow / clickstream-analysis staple). A path is `n`
    * CONSECUTIVE events of one user in (ts, event_id) order; paths are
    * counted across all users.
    *
    * Scale: one shuffle on user_id; the lead() window is per-user
    * (parallel, bounded by a user's own event count — never a global
    * window); path counting partial-aggregates; the final top-k is a
    * TakeOrdered, not a global sort. Exact integer counts. */
  def topEventPaths(df: DataFrame, steps: Int = 3, topN: Int = 20): DataFrame = {
    require(steps >= 2, "a path needs at least 2 steps")
    val byUser = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val withLeads = (1 until steps).foldLeft(
      df.withColumn("ts_sec", col("ts").cast("timestamp").cast("long"))) {
      (d, i) => d.withColumn(s"__s$i", lead(col("event_type"), i).over(byUser))
    }
    val path = concat_ws(" > ",
      (col("event_type") +: (1 until steps).map(i => col(s"__s$i"))): _*)
    withLeads
      .filter((1 until steps).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .select(path.as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topN)
  }
}
