package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-funnel and cohort analytics over the `events` stream table — the
  * product-analytics battery the reference's warehouse targets (HANA →
  * BigQuery) exist to serve, expressed as composable aggregates.
  *
  * Scale notes (100 TB design):
  *   - every stage is a user-grain aggregate; events shrink to one row per
  *     user BEFORE any join, so joins carry |users| rows, never |events|;
  *   - all joins and aggregates key on user_id — one co-partitioning
  *     serves the whole funnel chain (AQE reuses the exchange);
  *   - timestamps compare in exact epoch MICROseconds (no truncation ties);
  *   - the final report is O(#stages) / O(#cohorts × #weeks) rows.
  */
object Funnel {

  private def micros(ts: Column): Column =
    unix_micros(ts.cast("timestamp"))

  /** Ordered-step conversion funnel: for each user, stage i+1 counts only
    * if its event happens strictly AFTER the user's stage-i time and within
    * `windowSeconds` of it. Returns one row per stage with the user count
    * and the conversion fraction vs the previous stage.
    *
    * Decorrelation: stage times chain left-to-right — stage i is a
    * user-grain `min(ts)` over events of that type filtered by the
    * (user-grain) stage i-1 time. Each stage is one aggregate + one join
    * on user_id, all pre-shrunk to user grain. */
  def conversionFunnel(events: DataFrame,
                       steps: Seq[String] = Seq("view", "click", "purchase"),
                       windowSeconds: Long = 7 * 24 * 3600L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val obs = events.select(col("user_id"),
      col("event_type"), micros(col("ts")).as("t"))
    val winMicros = windowSeconds * 1000000L

    // per-user stage-attainment times, chained
    val first = obs.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("t")).as("stage_t"))
    val stageTimes: Seq[DataFrame] = steps.tail.scanLeft(first) { (prev, step) =>
      obs.filter(col("event_type") === step)
        .join(prev.select(col("user_id").as("pu"), col("stage_t").as("prev_t")),
          col("user_id") === col("pu") &&
            col("t") > col("prev_t") && col("t") <= col("prev_t") + winMicros)
        .groupBy("user_id").agg(min(col("t")).as("stage_t"))
    }

    val counts = stageTimes.zip(steps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).cast("long").as("stage"), lit(step).as("step"),
            col("n_users"))
    }.reduce(_ unionAll _)

    // pct vs previous stage: lag over the O(#stages)-row report — the only
    // unpartitioned window in the operator runs over 3 rows
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage")
    counts
      .withColumn("pct_prev",
        when(col("stage") === 1, lit(100.0))
          .otherwise(lit(100.0) * col("n_users") / lag("n_users", 1).over(w)))
      .orderBy("stage")
  }

  /** Weekly cohort retention: cohort = ISO week of the user's first event;
    * a cell (cohort_week, offset) counts distinct users of that cohort
    * active `offset` weeks later, with the retention percentage against
    * the cohort size. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val userWeek = events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("timestamp").cast("long").as("week"))
      .distinct()
    val cohort = userWeek.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_n"))

    userWeek
      .join(cohort, "user_id")
      .withColumn("offset_weeks", ((col("week") - col("cohort_week")) / 604800L).cast("long"))
      .groupBy("cohort_week", "offset_weeks")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .withColumn("retention_pct", lit(100.0) * col("n_active") / col("cohort_n"))
      .select(col("cohort_week"), col("offset_weeks"), col("n_active"),
        col("cohort_n"), col("retention_pct"))
      .orderBy("cohort_week", "offset_weeks")
  }

  /** Cohort LTV curve — the revenue companion to [[cohortRetention]]:
    * per (cohort week, week offset), the cohort's weekly revenue and the
    * CUMULATIVE revenue per cohort member (the lifetime-value readout a
    * growth dashboard plots per cohort age). Offsets are the OBSERVED
    * grain (a cohort silent for a week has no row there; the cumulative
    * resumes at its next active week — the [[cohortRetention]] convention).
    *
    * Exactness: revenue is a DOUBLE column, and a double→decimal cast is
    * not correctly rounded on every engine (the cov-matrix lesson), so
    * values land on the 2⁻²⁰ grid via `floor(v·2²⁰)` — the multiply only
    * shifts the exponent (EXACT), floor is portable — and every sum and
    * running sum after that is exact integer arithmetic; each reported
    * number is one fixed double chain at the end. Grid error ≤2⁻²⁰ per
    * event — far below any LTV decision threshold.
    *
    * Scale shape: one row-grain aggregate to the (cohort, offset) grain;
    * the running sum is a window over that report-sized relation. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val uw = events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("timestamp").cast("long").as("week"),
      col("value"))
    val cohort = uw.select("user_id", "week").distinct()
      .groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_n"))
    val grid = floor(col("value").cast("double") * lit(1048576.0)).cast("long")
    val byOffset = uw
      .join(cohort, "user_id")
      .withColumn("offset_weeks",
        ((col("week") - col("cohort_week")) / 604800L).cast("long"))
      .groupBy("cohort_week", "offset_weeks")
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(grid).as("rev_q"))
    val w = Window.partitionBy("cohort_week").orderBy("offset_weeks")
      .rowsBetween(Window.unboundedPreceding, 0)
    byOffset
      .withColumn("cum_q", sum(col("rev_q")).over(w))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("offset_weeks"), col("n_active"),
        col("cohort_n"),
        (col("rev_q").cast("double") / lit(1048576.0)).as("week_revenue"),
        (col("cum_q").cast("double") / lit(1048576.0) /
          col("cohort_n").cast("double")).as("ltv_per_user"))
      .orderBy("cohort_week", "offset_weeks")
  }

  /** Volume TREND per event type: ordinary-least-squares slope/intercept of
    * daily counts against the day index — the "is this feed growing,
    * flat, or dying" line behind every ingest dashboard. Exactness: x is
    * a small integer day index and y an integer count, so ALL four OLS
    * moments (Σx, Σy, Σxy, Σx²) accumulate as exact integers; slope and
    * intercept are then two IEEE divisions — engine-portable with zero
    * tolerance. Slope units: events/day.
    *
    * Scale shape: one row-grain (type, day) count; the regression runs
    * over the metadata-sized daily relation. Verdict thresholds are
    * relative (0.2% of mean daily volume) so they survive any corpus
    * size. */
  def volumeTrend(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val indexed = daily
      .withColumn("x", datediff(col("day"), lit("2024-01-01").cast("date"))
        .cast("long"))
    indexed.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"),
        sum(col("n")).as("sy"),
        sum(col("x") * col("n")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope",
        (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n_days").cast("double"))
      .withColumn("mean_daily", col("sy").cast("double") / col("n_days"))
      .withColumn("verdict",
        when(col("slope") > lit(0.002) * col("mean_daily"), "growing")
          .when(col("slope") < lit(-0.002) * col("mean_daily"), "shrinking")
          .otherwise("flat"))
      .select("event_type", "n_days", "slope", "intercept", "mean_daily", "verdict")
      .orderBy("event_type")
  }

  /** First-order TRANSITION MATRIX over each user's event sequence — the
    * Markov-chain summary behind next-event models and journey analysis:
    * P(to | from) from adjacent-pair counts. Probabilities are one double
    * division from exact integer counts.
    *
    * Scale shape: ONE window pass partitioned by user (each user's events
    * sort locally — parallel across users), then a count shuffle whose
    * cardinality is |types|² rows; the row totals broadcast back. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type")
      .agg(sum(col("n")).cast("long").as("row_total"))
    pairs.join(broadcast(totals), "from_type")
      .withColumn("p", col("n").cast("double") / col("row_total"))
      .select("from_type", "to_type", "n", "row_total", "p")
      .orderBy("from_type", "to_type")
  }

  /** Rolling 7-day distinct users per day (WAU curve) — exact form: the
    * user-day relation (distinct-collapsed from events FIRST, so the
    * fan-out never touches event grain) fans each pair out to the 7
    * window-ends it contributes to, then one distinct-count per window
    * end. Early days report partial windows (standard); window-ends past
    * the last observed day are cut by a 1-row broadcast max.
    *
    * Scale shape: ×7 fan-out on |users×days|, one distinct-count shuffle
    * keyed by day. At planet scale the daily-HLL-sketch union replaces the
    * exact distinct (the [[graft.operators.Merge.incrementalDistinct]]
    * register-max mergeability argument, applied across a window). */
  def rollingDistinctUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val userDay = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = userDay.agg(max(col("day")).as("max_day"))
    userDay
      .withColumn("k", explode(sequence(lit(0), lit(windowDays - 1))))
      .withColumn("win_end", date_add(col("day"), col("k").cast("int")))
      .join(broadcast(maxDay))
      .filter(col("win_end") <= col("max_day"))
      .groupBy("win_end")
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy("win_end")
  }

  /** RFM SEGMENTATION — the classic user-value grid: per user, Recency
    * (days since last event, against the corpus max day), Frequency
    * (event count), Monetary (revenue on the 2⁻²⁰ grid — the
    * [[cohortLtv]] discipline for the double revenue column), each scored
    * into quintiles 1..5 and concatenated into the familiar "555" segment
    * label. Monetary/Frequency score high-is-better; Recency scores
    * 6 − quintile so the MOST RECENT users land at 5.
    *
    * Determinism & scale: quintiles come from a VALUE-GRAIN ladder
    * (groupBy metric value → cumulative count → back-join), not a global
    * row sort — ties share a ladder rung and therefore a score, and the
    * score is the exact integer ⌈5·cum/N⌉ (ceil by integer arithmetic,
    * no float). Every ladder must stay BOUNDED for the cumulative window
    * to be report-sized: R is bounded by the day span, F by the count
    * range, and M SCORES on the coarse 1/16 grid (m_q div 2¹⁶ — rungs
    * bounded by the revenue RANGE, not the user count; the reported
    * m_revenue keeps the full 2⁻²⁰ precision). Coarse-grid ties share a
    * score by design — the quintile of a lifetime-revenue figure does not
    * turn on its 5th decimal. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val grid = floor(col("value").cast("double") * lit(1048576.0)).cast("long")
    val maxDay = events.agg(max(to_date(col("ts"))).as("max_day"))
    val users = events
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("f"),
        coalesce(sum(grid), lit(0L)).as("m_q"))
      .crossJoin(broadcast(maxDay))
      .withColumn("r", datediff(col("max_day"), col("last_day")).cast("long"))
      // coarse 1/16-grid scoring key: bounded ladder rungs at any user count
      .withColumn("m_s",
        ((col("m_q") - pmod(col("m_q"), lit(65536L))) / 65536L).cast("long"))
      .select("user_id", "r", "f", "m_q", "m_s")
    val n = users.agg(count(lit(1)).as("n_users"))
    def ceil5(cum: Column, tot: Column): Column = {
      val x = cum * 5L + tot - 1L
      ((x - pmod(x, tot)) / tot).cast("long")
    }
    def laddered(metric: String, score: String,
                 invert: Boolean): DataFrame = {
      val lad = users.groupBy(col(metric).as("__v"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(
          Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(n))
      val s = ceil5(col("__cum"), col("n_users"))
      lad.select(col("__v"),
        (if (invert) lit(6L) - s else s).as(score))
    }
    users
      .join(laddered("r", "score_r", invert = true),
        users("r") === col("__v")).drop("__v")
      .join(laddered("f", "score_f", invert = false),
        users("f") === col("__v")).drop("__v")
      .join(laddered("m_s", "score_m", invert = false),
        users("m_s") === col("__v")).drop("__v")
      .select(col("user_id"), col("r"), col("f"),
        (col("m_q").cast("double") / lit(1048576.0)).as("m_revenue"),
        col("score_r"), col("score_f"), col("score_m"),
        concat(col("score_r").cast("string"), col("score_f").cast("string"),
          col("score_m").cast("string")).as("segment"))
      .orderBy("user_id")
  }

  /** STICKINESS report — per day: DAU, WAU (trailing 7), MAU (trailing
    * 28), and the DAU/MAU ratio the engagement dashboard tracks ("of the
    * monthly actives, what share shows up daily"). Built on the
    * [[rollingDistinctUsers]] explode-coverage trick: each (user, day)
    * visit covers the next k window-ends with a NARROW explode, so every
    * window's exact distinct count is one map-side-combinable aggregate —
    * no per-day re-scan, no approximate sketch. Days reported are those
    * with a full 28-day history ending inside the observed range (a
    * partial-history window understates MAU and poisons the ratio).
    *
    * Exactness: counts are exact integers; each ratio is ONE division.
    * Scale: the explode is ×(7+28) on the (user, day)-DISTINCT relation
    * (user-day grain, far below event grain); aggregates map-side combine
    * to day-grain rows. */
  def stickiness(events: DataFrame): DataFrame = {
    val userDay = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val bounds = userDay.agg(max(col("day")).as("max_day"),
      min(col("day")).as("min_day"))
    def rolling(days: Int, name: String): DataFrame = userDay
      .withColumn("k", explode(sequence(lit(0), lit(days - 1))))
      .withColumn("win_end", date_add(col("day"), col("k").cast("int")))
      .groupBy("win_end")
      .agg(countDistinct(col("user_id")).as(name))
    val dau = userDay.groupBy(col("day").as("win_end"))
      .agg(countDistinct(col("user_id")).as("dau"))
    dau
      .join(rolling(7, "wau"), Seq("win_end"))
      .join(rolling(28, "mau"), Seq("win_end"))
      .crossJoin(broadcast(bounds))
      .filter(col("win_end") <= col("max_day") &&
        date_sub(col("win_end"), 27) >= col("min_day"))
      .select(col("win_end").as("day"), col("dau"), col("wau"), col("mau"),
        (col("dau").cast("double") / col("mau").cast("double"))
          .as("dau_mau"),
        (col("wau").cast("double") / col("mau").cast("double"))
          .as("wau_mau"))
      .orderBy("day")
  }

  /** EWMA smoothing of the daily volume series per event type — the
    * exponential forecast behind burn-rate alerts, at α = 1/2 exactly:
    * s_t = (y_t + s_{t-1}) / 2. The recursion is order-sensitive and
    * float-powered in general; at α = 1/2 it has the closed form
    * s_t = (y_0 + Σ_{i=1..t} 2^{i-1}·y_i) / 2^t whose numerator is an
    * EXACT integer running sum and whose denominator is a bit-shift — no
    * libm pow (whose cross-engine rounding is not guaranteed), no
    * sequential float fold. One double division per row at the end.
    * Domain: series up to 62 points per key (shift width); daily series
    * re-anchor monthly long before that.
    *
    * Scale shape: one row-grain (type, day) count, then windows over the
    * metadata-sized daily relation, parallel across types. */
  def ewmaDaily(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("t", (row_number().over(w) - 1).cast("long"))
      .withColumn("__y0", first(col("n")).over(w))
      .withColumn("__term",
        when(col("t") === 0, lit(0L))
          .otherwise(call_function("shiftleft", lit(1L),
            (col("t") - 1).cast("int")) * col("n")))
      .withColumn("__run", sum(col("__term").cast("decimal(38,0)")).over(w))
      .withColumn("ewma",
        (col("__y0") + col("__run")).cast("double") /
          call_function("shiftleft", lit(1L), col("t").cast("int"))
            .cast("double"))
      .select("event_type", "day", "n", "ewma")
      .orderBy("event_type", "day")
  }

  /** Two-proportion z-test between experiment arms — the A/B-test readout:
    * conversion = the user emitted `convertType` at least `minCount` times
    * (a threshold rather than any-occurrence, because on a dense event
    * fixture every user fires every type at least once and p=1 makes the
    * statistic degenerate); arms split by user-id parity (stand-in for an
    * assignment column). z = (p1-p2)/sqrt(p̂(1-p̂)(1/n1+1/n2)) from exact
    * integer counts; `significant` at |z| > 1.96. No p-value (erf is not
    * engine-portable) — the z statistic and the 5% verdict are.
    *
    * Scale shape: one per-user pass (map-side combinable), then
    * 1-row arithmetic. */
  def abTest(events: DataFrame, convertType: String = "purchase",
             minCount: Long = 15L): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === convertType, 1L).otherwise(0L))
          >= minCount, 1L).otherwise(0L)
        .as("converted"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("converted")).cast("long").as("k"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("k").as("k_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("k").as("k_b"))
    a.crossJoin(broadcast(b))
      .withColumn("p_a", col("k_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("k_b").cast("double") / col("n_b"))
      .withColumn("p_pool",
        (col("k_a") + col("k_b")).cast("double") / (col("n_a") + col("n_b")))
      // degenerate pool (nobody or everybody converts) => the z statistic
      // is undefined (0/0 denominator) — NULL, not a runtime error (under
      // ANSI mode the unguarded division ABORTS; the round-7 sf1 probe hit
      // exactly this: 10x-busier users all cross the conversion threshold)
      .withColumn("z",
        when(col("p_pool") > 0 && col("p_pool") < 1,
          (col("p_a") - col("p_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .otherwise(lit(null).cast("double")))
      .withColumn("significant", abs(col("z")) > 1.96)
  }

  /** A/B POWER / MDE report — the design-review companion to [[abTest]]:
    * given the two arms' exact counts, report the minimum detectable
    * effect at the CURRENT sample (two-sided α=0.05, 80% power — the
    * z-constants are fixed literals shared with the oracle; no inverse
    * normal is evaluated anywhere), the per-arm sample size required to
    * detect the OBSERVED difference, and whether the experiment as run
    * was powered for what it saw. The observed difference uses the exact
    * cross-multiplied numerator (k_a·n_b − k_b·n_a)/(n_a·n_b) — the
    * [[Relational.welchTTest]] discipline — so a near-zero effect is not
    * an artifact of subtracting rounded rates.
    *
    * Scale shape: identical to [[abTest]] — one per-user aggregate
    * (map-side combinable), then 1-row arithmetic. */
  def abTestPower(events: DataFrame, convertType: String = "purchase",
                  minCount: Long = 15L): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === convertType, 1L).otherwise(0L))
          >= minCount, 1L).otherwise(0L)
        .as("converted"))
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("converted")).cast("long").as("k"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("k").as("k_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("k").as("k_b"))
    val zSum = lit(1.96) + lit(0.8416212335729143) // z_{0.975} + z_{0.80}
    a.crossJoin(broadcast(b))
      .withColumn("p_a", col("k_a").cast("double") / col("n_a").cast("double"))
      .withColumn("p_b", col("k_b").cast("double") / col("n_b").cast("double"))
      .withColumn("p_pool",
        (col("k_a") + col("k_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("diff",
        (col("k_a") * col("n_b") - col("k_b") * col("n_a")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .withColumn("mde", zSum *
        sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
          (lit(1.0) / col("n_a").cast("double") +
           lit(1.0) / col("n_b").cast("double"))))
      .withColumn("n_req_per_arm",
        when(col("diff") =!= 0.0,
          ceil(zSum * zSum *
            (col("p_a") * (lit(1.0) - col("p_a")) +
             col("p_b") * (lit(1.0) - col("p_b"))) /
            (col("diff") * col("diff"))).cast("long")))
      .withColumn("powered", abs(col("diff")) >= col("mde"))
      .select("n_a", "n_b", "p_a", "p_b", "diff", "mde",
        "n_req_per_arm", "powered")
  }

  /** CUSUM change-point detection over each event type's daily volume
    * series — the classic upward-shift detector: C_t = max(0, C_{t-1} +
    * (x_t - mean)). The sequential recurrence looks window-hostile, but it
    * has the exact prefix identity C_t = S_t - min(0, min_{s<=t} S_s)
    * with S_t = Σ(x_s - mean), so two ordered windows (running sum,
    * running min) compute it with NO sequential fold. Fractions are
    * cleared by working in 1/n_days units: d_t = n_days*x_t - total is an
    * exact integer, making every value engine-bit-identical.
    *
    * `is_peak` marks the day(s) where the statistic tops out — the
    * change-point estimate. Scale shape: one row-grain daily count, then
    * windows over the day-grain relation, parallel across event types. */
  def cusumDaily(events: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val ordered = byType.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__days", count(lit(1)).over(byType))
      .withColumn("__total", sum(col("n")).over(byType))
      .withColumn("d_units", col("__days") * col("n") - col("__total"))
      .withColumn("__cum", sum(col("d_units")).over(ordered))
      .withColumn("__runmin", min(col("__cum")).over(ordered))
      .withColumn("cusum_units", col("__cum") - least(col("__runmin"), lit(0L)))
      .withColumn("is_peak",
        col("cusum_units") === max(col("cusum_units")).over(byType))
      .select("event_type", "day", "n", "d_units", "cusum_units", "is_peak")
      .orderBy("event_type", "day")
  }

  /** Per-day distribution-drift timeline: the total-variation distance
    * between each day's event-type mix and the mix of the first `refDays`
    * days — the dashboard that turns "did the feed drift?" (`ksTest`, one
    * verdict) into WHEN it drifted. TV is the PSI-family metric with no
    * logarithm, so it stays engine-exact: per (day, type) the term is the
    * cross-multiplied integer |n_dt*N_ref - r_t*N_d| summed in
    * decimal(38,0) (overflow-safe at any cardinality), with ONE double
    * division per day at the end. Missing types on either side enter as
    * zeros via the day x type grid, so the metric sees the union support.
    *
    * Scale shape: one row-grain groupBy to (day, type) grain; everything
    * after operates on day/type-grain tables (broadcast joins). */
  def driftTimeline(events: DataFrame, refDays: Int = 7): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val d0 = daily.agg(min("day").as("__d0"))
    val days = daily.groupBy("day").agg(sum("n").as("n_day"))
      .crossJoin(broadcast(d0))
      .withColumn("in_ref", datediff(col("day"), col("__d0")) < refDays)
      .select("day", "n_day", "in_ref")
    val ref = daily.join(broadcast(days.filter(col("in_ref"))
        .select("day")), "day")
      .groupBy("event_type").agg(sum("n").as("r"))
    val refTot = ref.agg(sum("r").as("n_ref"))
    val types = daily.select("event_type").distinct()
    val dec = "decimal(38,0)"
    days.crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .join(broadcast(ref), Seq("event_type"), "left")
      .crossJoin(broadcast(refTot))
      .withColumn("term",
        abs(coalesce(col("n"), lit(0L)).cast(dec) * col("n_ref")
          - coalesce(col("r"), lit(0L)).cast(dec) * col("n_day")))
      .groupBy("day", "n_day", "in_ref", "n_ref")
      .agg(sum(col("term")).as("__tv_num"))
      .withColumn("tv", col("__tv_num").cast("double")
        / (lit(2.0) * col("n_day").cast("double") * col("n_ref").cast("double")))
      .select("day", "n_day", "in_ref", "tv")
      .orderBy("day")
  }

  /** Lagged cross-correlation of two event types' daily series — "does B
    * follow A, and by how many days?" (signup follows click, error follows
    * deploy). For each lag L in [-maxLag, maxLag], Pearson r between
    * a(t) and b(t+L) over the days where BOTH series have observations at
    * that shift (inner alignment — absent days are absent, not zero;
    * densify upstream if zeros are meant).
    *
    * Exactness: counts are integers, so all five moment sums are exact
    * decimals per lag; r is one fixed-order IEEE chain (the
    * `corrManual` discipline), NULL when either side is constant in the
    * overlap. Day-grain throughout — the row-grain pass is the one daily
    * groupBy, everything after is |days| x |lags| sized. */
  def crossCorrelation(events: DataFrame, typeA: String, typeB: String,
                       maxLag: Int = 3): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val a = daily.filter(col("event_type") === typeA)
      .select(col("day").as("a_day"), col("n").as("a_n"))
    val b = daily.filter(col("event_type") === typeB)
      .select(col("day").as("b_day"), col("n").as("b_n"))
    val dec20 = "decimal(20,0)"
    val dec30 = "decimal(30,0)"
    val lagged = a
      .select(col("a_day"), col("a_n"),
        explode(array((-maxLag to maxLag).map(lit(_)): _*)).as("lag"))
      .withColumn("b_key", date_add(col("a_day"), col("lag")))
      .join(b, col("b_key") === col("b_day"))
    val m = lagged.groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        sum(col("a_n").cast(dec20)).as("sa"),
        sum(col("b_n").cast(dec20)).as("sb"),
        sum((col("a_n") * col("b_n")).cast(dec30)).as("sab"),
        sum((col("a_n") * col("a_n")).cast(dec30)).as("saa"),
        sum((col("b_n") * col("b_n")).cast(dec30)).as("sbb"))
    m.select(col("lag").cast("long").as("lag"), col("n_days"),
        when((col("n_days") * col("saa") - col("sa") * col("sa")) === 0 ||
          (col("n_days") * col("sbb") - col("sb") * col("sb")) === 0,
          lit(null).cast("double"))
          .otherwise(
            (col("n_days") * col("sab") - col("sa") * col("sb")).cast("double")
              / (sqrt((col("n_days") * col("saa") - col("sa") * col("sa"))
                  .cast("double"))
                * sqrt((col("n_days") * col("sbb") - col("sb") * col("sb"))
                  .cast("double"))))
          .as("r"))
      .orderBy("lag")
  }

  /** MARKOV removal-effect attribution — the data-driven alternative to
    * rule-based attribution ([[attribution]]'s interval join): model the
    * session paths as a first-order Markov chain over channels with
    * absorbing CONVERT/END states, estimate P(convert) from START by
    * FIXED-COUNT value iteration, and credit each channel by its REMOVAL
    * EFFECT — how much P(convert) drops when the channel is knocked out
    * (visits to it become dead ends). Shares normalize the effects.
    *
    * Determinism contract (the kcore/holt discipline): the iteration
    * count is FIXED (a data-dependent convergence test can't be replayed
    * by an unrolled SQL oracle); each state's update folds its outgoing
    * terms in ASCENDING destination order with the conversion term added
    * LAST — `fold(0, terms…) + conv` — and every T(i,j) is the single
    * division n_ij/n_i of exact counts; the removal variant contributes
    * nothing for knocked-out destinations (bit-identical to forcing
    * p(channel)=0, since adding 0.0 is an IEEE identity). Paths truncate
    * at the FIRST conversion; events after it belong to no path.
    *
    * Scale shape: the row stream collapses to transition counts — a
    * (channels+1)² grain, never row-scale — in one sessionized window
    * pass; the chain solve runs driver-side on that model-sized matrix
    * (the PQ-codebook / Jacobi pattern). */
  def markovAttribution(events: DataFrame, convertType: String = "purchase",
                        gapSeconds: Long = 1800L, iters: Int = 12): DataFrame = {
    val START = "__start__"; val CONV = "__conv__"; val END = "__end__"
    val byUser = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val sess = events
      .filter(col("event_type").isNotNull)
      .withColumn("ts_sec", col("ts").cast("timestamp").cast("long"))
      .withColumn("prev_sec", lag("ts_sec", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > gapSeconds)
          .cast("long"))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val w = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts_sec", "event_id")
    val isConv = (col("event_type") === convertType).cast("long")
    // truncate each path at its FIRST conversion
    val kept = sess
      .withColumn("prior_conv", coalesce(
        sum(isConv).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("prior_conv") === 0L)
    val wk = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts_sec", "event_id")
    val steps = kept
      .withColumn("dst", when(col("event_type") === convertType, lit(CONV))
        .otherwise(col("event_type")))
      .withColumn("src", coalesce(lag("event_type", 1).over(wk), lit(START)))
      .withColumn("is_last",
        row_number().over(Window.partitionBy("user_id", "session_seq")
          .orderBy(col("ts_sec").desc, col("event_id").desc)) === 1)
    val walk = steps.select(col("src"), col("dst"))
      .unionAll(steps.filter(col("is_last") && col("dst") =!= CONV)
        .select(col("dst").as("src"), lit(END).as("dst")))
    val trans = walk.groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // ---- driver-side chain solve (model-sized: (channels+1)^2) ----
    val outSum = trans.groupBy(_._1).map { case (s, ts) => s -> ts.map(_._3).sum }
    val channels = (trans.map(_._1) ++ trans.map(_._2))
      .filter(s => s != START && s != CONV && s != END).distinct.sorted
    val srcs = trans.map(_._1).distinct.sorted
    val bySrc: Map[String, Array[(String, Long)]] = trans.groupBy(_._1)
      .map { case (s, ts) => s -> ts.map(t => (t._2, t._3)).sortBy(_._1) }
    def pStart(removed: Option[String]): Double = {
      var p = Map.empty[String, Double].withDefaultValue(0.0)
      for (_ <- 1 to iters) {
        p = srcs.map { i =>
          var acc = 0.0
          var conv = 0.0
          bySrc(i).foreach { case (dst, n) =>
            if (dst == CONV) conv = n.toDouble / outSum(i).toDouble
            else if (dst != END && !removed.contains(dst))
              acc += n.toDouble / outSum(i).toDouble * p(dst)
          }
          i -> (acc + conv)
        }.toMap.withDefaultValue(0.0)
      }
      p(START)
    }
    val pFull = pStart(None)
    val visits = trans.filter(t => channels.contains(t._2))
      .groupBy(_._2).map { case (c, ts) => c -> ts.map(_._3).sum }
    val effects = channels.map { c =>
      val pr = pStart(Some(c))
      val eff = if (pFull > 0.0) (pFull - pr) / pFull else Double.NaN
      (c, visits.getOrElse(c, 0L), pFull, pr, eff)
    }
    val total = effects.foldLeft(0.0)((a, e) => a + e._5)
    val spark = events.sparkSession
    import spark.implicits._
    effects.map { case (c, v, pf, pr, eff) =>
      (c, v, pf, pr, eff, if (total > 0.0) eff / total else Double.NaN)
    }.toSeq
      .toDF("channel", "n_visits", "p_conv", "p_conv_removed",
        "removal_effect", "share")
      .orderBy("channel")
  }

  /** HOLT linear-trend forecast (double exponential smoothing) of each
    * event type's daily volume — the capacity-planning readout on top of
    * the [[ewmaDaily]] level: EWMA alone lags a trending series by
    * construction; Holt carries an explicit trend term and extrapolates.
    *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1});  b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    * Init is the textbook l₁ = x₁, b₁ = x₂ − x₁ (b₁ = 0 for a 1-day
    * series); the recurrence folds over x₂..x_n IN DAY ORDER — the float
    * fold order IS the contract (same discipline as every sequential lane
    * here), with α, β fixed literals shared with the oracle. Forecast
    * ĥ(h) = l_n + h·b_n. Days are the OBSERVED series (no zero-padding —
    * the [[crossCorrelation]]/[[acfDaily]] convention).
    *
    * Scale shape: one row-grain map-side-combined daily aggregate; the
    * fold state is per-TYPE and day-grain-bounded (|days| elements), so
    * the collect_list is report-sized, never row-scale. */
  def holtForecast(events: DataFrame, alpha: Double = 0.2,
                   beta: Double = 0.1): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val series = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(struct(col("day"), col("x")))).as("__s"))
      .withColumn("xs", transform(col("__s"), s => s.getField("x")))
    val x1 = element_at(col("xs"), 1)
    val x2 = element_at(col("xs"), 2)
    val init = struct(
      x1.as("l"),
      when(col("n_days") >= 2L, x2 - x1).otherwise(lit(0.0)).as("t"))
    val a = lit(alpha); val a1 = lit(1.0 - alpha)
    val b = lit(beta); val b1 = lit(1.0 - beta)
    val folded = series.withColumn("st",
      aggregate(slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        init,
        (acc, x) => {
          val lNew = a * x + a1 * (acc.getField("l") + acc.getField("t"))
          struct(
            lNew.as("l"),
            (b * (lNew - acc.getField("l")) + b1 * acc.getField("t")).as("t"))
        }))
    folded.select(col("event_type"), col("n_days"),
        col("st").getField("l").as("level"),
        col("st").getField("t").as("trend"))
      .withColumn("fc_1", col("level") + lit(1.0) * col("trend"))
      .withColumn("fc_3", col("level") + lit(3.0) * col("trend"))
      .withColumn("fc_7", col("level") + lit(7.0) * col("trend"))
      .orderBy("event_type")
  }

  /** Autocorrelation function (ACF) of each event type's daily volume —
    * the self-similarity companion to [[crossCorrelation]] and the first
    * periodicity probe a drift dashboard runs ("does this feed have a
    * weekly pulse, and did it survive the pipeline change"): Pearson r
    * between the series and itself shifted by lag 1..maxLag, one row per
    * (event_type, lag).
    *
    * Same conventions as [[crossCorrelation]]: pairs are days where BOTH
    * endpoints observed events (no zero-padding — a fabricated zero day
    * manufactures correlation); exact integer moments with the
    * cross-multiplied Pearson numerator, one final IEEE division+sqrt
    * chain; degenerate (constant) windows yield null r.
    *
    * Scale shape: the self-join runs on the DAY-grain relation — |types|
    * × |days| rows regardless of event volume — fanned ×maxLag by a
    * narrow explode; one row-grain aggregate feeds it. */
  def acfDaily(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val dec20 = "decimal(20,0)"
    val dec30 = "decimal(30,0)"
    val a = daily.select(col("event_type"), col("day").as("a_day"),
      col("n").as("a_n"))
    val b = daily.select(col("event_type").as("b_type"),
      col("day").as("b_day"), col("n").as("b_n"))
    val lagged = a
      .select(col("event_type"), col("a_day"), col("a_n"),
        explode(array((1 to maxLag).map(lit(_)): _*)).as("lag"))
      .withColumn("b_key", date_add(col("a_day"), col("lag")))
      .join(b, col("event_type") === col("b_type") &&
        col("b_key") === col("b_day"))
    val m = lagged.groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_n").cast(dec20)).as("sa"),
        sum(col("b_n").cast(dec20)).as("sb"),
        sum((col("a_n") * col("b_n")).cast(dec30)).as("sab"),
        sum((col("a_n") * col("a_n")).cast(dec30)).as("saa"),
        sum((col("b_n") * col("b_n")).cast(dec30)).as("sbb"))
    m.select(col("event_type"), col("lag").cast("long").as("lag"),
        col("n_pairs"),
        when((col("n_pairs") * col("saa") - col("sa") * col("sa")) === 0 ||
          (col("n_pairs") * col("sbb") - col("sb") * col("sb")) === 0,
          lit(null).cast("double"))
          .otherwise(
            (col("n_pairs") * col("sab") - col("sa") * col("sb")).cast("double")
              / (sqrt((col("n_pairs") * col("saa") - col("sa") * col("sa"))
                  .cast("double"))
                * sqrt((col("n_pairs") * col("sbb") - col("sb") * col("sb"))
                  .cast("double"))))
          .as("r"))
      .orderBy("event_type", "lag")
  }

  /** Classical seasonal decomposition of each event type's daily series —
    * the STL-lite additive model every ops/drift dashboard starts from:
    * trend = centered 7-day moving average, seasonal = day-of-week mean of
    * the detrended series, residual = the rest. Days without a full
    * centered window (the first/last 3 per type) are cut, not padded —
    * a padded edge fabricates trend.
    *
    * Exactness discipline: no running double sums. The detrended value is
    * carried as the INTEGER numerator dn = 7n - sum7, the seasonal mean as
    * the integer pair (Σdn, n_dow), and residual = (dn·n_dow - Σdn) /
    * (7·n_dow) — every aggregate is exact integer arithmetic and each
    * output is ONE final IEEE division chain, identical in both engines
    * (a mean of doubles would be summation-order-dependent).
    *
    * Day-of-week is epoch-day mod 7 (engine-portable; calendar dow
    * functions disagree on week origin across engines).
    *
    * Scale shape: the series is day-grain — |types| x |days| rows whatever
    * the event volume — so the windows are bounded; the only corpus-scale
    * work is the first daily-count aggregate (map-side combined). Gappy
    * series should be resampled first ([[Resample]]); the 7-row window is
    * 7 observed days. */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val t = daily
      .withColumn("__sum7", sum(col("n")).over(w7))
      .withColumn("__cnt7", count(lit(1)).over(w7))
      .filter(col("__cnt7") === 7)
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7))
          .cast("long"))
      .withColumn("dn", col("n") * 7 - col("__sum7"))
    val wd = Window.partitionBy("event_type", "dow")
    t.withColumn("__sn", sum(col("dn")).over(wd))
      .withColumn("__nd", count(lit(1)).over(wd))
      .select(col("event_type"), col("day"), col("dow"), col("n"),
        (col("__sum7").cast("double") / 7.0).as("trend"),
        (col("dn").cast("double") / 7.0).as("detrended"),
        (col("__sn").cast("double") / (lit(7.0) * col("__nd").cast("double")))
          .as("seasonal"),
        ((col("dn") * col("__nd") - col("__sn")).cast("double") /
          (lit(7.0) * col("__nd").cast("double"))).as("residual"))
      .orderBy("event_type", "day")
  }

  /** Kaplan-Meier survival curve over per-subject activity spans — the
    * churn/retention statistic product analytics reports next to the
    * cohort table. Each subject contributes a duration (first→last
    * activity, days) and an event flag: `event` if the last activity
    * precedes the global horizon by more than `churnAfterDays` (observed
    * churn), else right-censored (still alive at the horizon).
    *
    * One row per distinct duration with ≥1 churn event: subjects at risk
    * `n_risk`, churn events `d_events`, same-duration censorings
    * `c_censored`, and the product-limit estimate
    * `S(t) = Π_{s≤t} (n_s - d_s)/n_s`.
    *
    * Determinism contract: everything up to the factors is exact integer
    * arithmetic (day grain, count ladders). The survival product is a
    * CONTRACTUAL LEFT-TO-RIGHT FOLD over duration-ordered factors — each
    * division and multiplication is a single correctly-rounded IEEE op, so
    * the fold sequence (not just the set) is the spec and the oracle
    * replays it bit-identically (`list(... ORDER BY)` + `list_reduce`).
    * No transcendental (the exp(Σln) form is banned house-wide).
    *
    * Scale: subjects shrink to one row each in the first aggregate
    * (row-grain groupBy, map-side combined); the curve frame is
    * O(#distinct durations) — report-sized — so its unpartitioned windows
    * are post-aggregation presentation, not data-scale work. */
  def survivalCurve(events: DataFrame, subjectCol: String, tsCol: String,
                    churnAfterDays: Int = 365): DataFrame = {
    val o = events.select(col(subjectCol).as("__subj"),
      col(tsCol).cast("date").as("__d"))
    val per = o.groupBy("__subj")
      .agg(min("__d").as("__first"), max("__d").as("__last"))
    val horizon = o.agg(max("__d").as("__mx"))
    val subj = per.crossJoin(broadcast(horizon))
      .select(
        datediff(col("__last"), col("__first")).cast("long").as("t"),
        (col("__last") < date_sub(col("__mx"), churnAfterDays))
          .cast("long").as("ev"))
    val byT = subj.groupBy("t")
      .agg(count(lit(1)).as("__m"), sum("ev").as("d_events"))
    val wAll = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val atRisk = byT
      .withColumn("n_risk",
        sum(col("__m")).over(Window.partitionBy()) -
          coalesce(sum(col("__m")).over(wPrev), lit(0L)))
      .filter(col("d_events") > 0)
      .withColumn("__fac",
        (col("n_risk") - col("d_events")).cast("double") /
          col("n_risk").cast("double"))
    atRisk
      .withColumn("survival",
        aggregate(collect_list(col("__fac")).over(wAll),
          lit(1.0d), (acc, x) => acc * x))
      .select(col("t").as("t_days"), col("n_risk"), col("d_events"),
        (col("__m") - col("d_events")).as("c_censored"), col("survival"))
      .orderBy("t_days")
  }
}
