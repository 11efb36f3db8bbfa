package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
