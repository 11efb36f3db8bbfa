package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental MERGE/upsert — the shape every recurring 100 TB pipeline
  * needs: a huge accumulated target plus a (much smaller) batch of updates,
  * reconciled by key. The reference's sink is append-only
  * (`HanaToBQ.java:258` WRITE_APPEND); these operators are the reconcile
  * step a user runs on top of an append log, expressed as plain relational
  * plans (no table-format dependency).
  *
  * Scale discipline — two regimes, two plans:
  *   - [[upsertReplace]] (updates win unconditionally): the target is only
  *     ANTI-JOINed against the update keys. With a small update batch the
  *     key set broadcasts, so the 100 TB target never shuffles — the scan
  *     streams through a BroadcastHashJoin(LeftAnti) and unions the batch.
  *     This is the plan to run nightly.
  *   - [[upsertLatest]] (version column wins, e.g. late/out-of-order CDC
  *     feeds where an "update" may be stale): needs per-key ordering, so it
  *     is one shuffle of target ∪ updates on the key — the honest lower
  *     bound for version reconciliation. Run it on the partitions a CDC
  *     feed actually touched, not the whole table.
  *   - [[scd2History]]: type-2 slowly-changing-dimension derivation
  *     (valid_from/valid_to ranges from a row-version log) — one shuffle on
  *     the key, windows bounded per key.
  */
object Merge {

  /** Updates replace target rows sharing their key; target rows with no
    * update pass through. Updates are first deduped to one row per key
    * (latest `version`, ties to the largest tiebreak) so a batch carrying
    * several versions of one key applies its newest.
    *
    * Plan shape: dedup shuffles only the UPDATE batch; the target side is a
    * broadcast left-anti join — zero target shuffle.
    *
    * The broadcast is FORCED by default (the batch is small by contract and
    * the hint is what keeps the target shuffle-free); `broadcastGuardRows`
    * opts into [[graft.core.Broadcasts.guarded]]'s row-count guard, falling
    * back to a plain anti join when a batch outgrows the 8 GB broadcast
    * regime instead of failing the job. */
  def upsertReplace(target: DataFrame, updates: DataFrame, keys: Seq[String],
                    version: Column, tiebreak: Seq[Column],
                    broadcastGuardRows: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: tiebreak.map(_.desc)): _*)
    val latest = updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val kept = target.join(
      graft.core.Broadcasts.guarded(latest.select(keys.map(col): _*),
        broadcastGuardRows),
      keys, "left_anti")
    kept.unionByName(latest)
  }

  /** Version-based upsert: across target ∪ updates, the row with the
    * greatest `version` per key wins (ties: updates side, then `tiebreak`
    * descending). Correct under out-of-order delivery — a stale "update"
    * loses to a newer target row. One shuffle on the key. */
  def upsertLatest(target: DataFrame, updates: DataFrame, keys: Seq[String],
                   version: Column, tiebreak: Seq[Column]): DataFrame = {
    val tagged = target.withColumn("__upd", lit(0))
      .unionByName(updates.withColumn("__upd", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: col("__upd").desc +: tiebreak.map(_.desc)): _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__upd")
  }

  /** Incremental AGGREGATE maintenance: yesterday's per-key aggregate
    * snapshot + today's delta rows -> today's snapshot, WITHOUT rescanning
    * the raw history. Works for any combinable aggregate — here the
    * standard quartet (count, decimal-exact sum, min, max): the delta is
    * aggregated alone (one small shuffle), full-outer-joined to the
    * snapshot on the key, and combined per column. The raw history is
    * never read — that's the entire point at 100 TB, where re-aggregating
    * from scratch costs a full corpus scan per day. Equivalence to the
    * from-scratch aggregate is the oracle's check.
    *
    * Snapshot schema contract: (keys..., n, sum_v, min_v, max_v) — exactly
    * what [[aggSnapshot]] emits, so day N's output is day N+1's input. */
  def aggSnapshot(rows: DataFrame, keys: Seq[String], valueCol: String,
                  orderCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_v"),
        min(col(orderCol)).as("min_v"),
        max(col(orderCol)).as("max_v"))

  def incrementalAgg(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                     valueCol: String, orderCol: String): DataFrame = {
    val d = aggSnapshot(delta, keys, valueCol, orderCol)
      .withColumnRenamed("n", "__dn").withColumnRenamed("sum_v", "__dsum")
      .withColumnRenamed("min_v", "__dmin").withColumnRenamed("max_v", "__dmax")
    snapshot.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
          // (28,2) = aggSnapshot's actual sum type (sum over decimal(18,2)
        // widens precision by 10) — the day-N-output-is-day-N+1-input
        // contract needs the SAME type, and a (18,2) narrowing would
        // silently null a per-key sum past 16 integer digits under ANSI-off
        (coalesce(col("sum_v"), lit(0).cast("decimal(28,2)"))
          + coalesce(col("__dsum"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("sum_v"),
        least(coalesce(col("min_v"), col("__dmin")),
          coalesce(col("__dmin"), col("min_v"))).as("min_v"),
        greatest(coalesce(col("max_v"), col("__dmax")),
          coalesce(col("__dmax"), col("max_v"))).as("max_v")): _*)
  }

  /** Incremental DISTINCT-COUNT maintenance — the aggregate
    * [[incrementalAgg]] can't combine (yesterday's distinct count + today's
    * is NOT the union's distinct count). The mergeable form is the
    * Datasketches HLL sketch: the snapshot stores one fixed-size sketch per
    * key, the delta builds its own, and day-N+1's snapshot is the per-key
    * `hll_union` — no history rescan, sketch-sized state, mathematically
    * mergeable (union of sketches IS the sketch of the union, not an
    * approximation of a merge). Estimates carry the usual HLL error
    * (~1.6% at default lgConfigK); the oracle checks the published bound
    * as boolean verdicts against exact counts (the approxSketches
    * pattern). */
  def distinctSnapshot(rows: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("dv_sketch"))

  def incrementalDistinct(snapshot: DataFrame, delta: DataFrame,
                          keys: Seq[String], valueCol: String): DataFrame = {
    val d = distinctSnapshot(delta, keys, valueCol)
      .withColumnRenamed("dv_sketch", "__dsk")
    snapshot.join(d, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("dv_sketch").isNull, col("__dsk"))
          .when(col("__dsk").isNull, col("dv_sketch"))
          .otherwise(hll_union(col("dv_sketch"), col("__dsk")))
          .as("dv_sketch"): _*)
      .withColumn("n_distinct_est", hll_sketch_estimate(col("dv_sketch")))
  }

  /** Snapshot DIFF — the added/removed/changed report a recurring corpus
    * pipeline runs between yesterday's and today's snapshots (what changed
    * drives re-embedding, re-dedup, cache invalidation downstream).
    *
    * Scale shape: both sides project down to (key, fingerprint) BEFORE the
    * join, so the single co-shuffle carries a key and a hash per row — never
    * document payloads; at 100 TB the exchange is the key space, not the
    * corpus. One full-outer join, fingerprint inequality = changed. Rows
    * equal on both sides are dropped (the interesting output is the delta;
    * unchanged is the overwhelming majority at scale). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   fingerprint: Column): DataFrame = {
    val o = oldSnap.select(col(key), fingerprint.as("__ofp"))
    val n = newSnap.select(col(key), fingerprint.as("__nfp"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__ofp").isNull, lit("added"))
          .when(col("__nfp").isNull, lit("removed"))
          .when(col("__ofp") =!= col("__nfp"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))
  }

  /** Corpus-level n-gram overlap between two snapshots via HLL sketch
    * inclusion-exclusion: |A ∩ B| = |A| + |B| - |A ∪ B|, with each term an
    * HLL estimate and the union estimated from `hll_union` of the two
    * sketches (union of sketches IS the sketch of the union). The
    * corpus-comparison companion to [[snapshotDiff]]: diff answers "which
    * keyed docs changed"; this answers "how much CONTENT do two corpora
    * share" with no key alignment at all — crawl-vs-crawl, vendor-vs-vendor,
    * train-vs-train comparisons before committing to a merge.
    *
    * Scale shape at 100 TB: each corpus reduces to ONE fixed-size sketch
    * through partial aggregation (map-side combine; the exchange carries
    * kilobyte sketches, not grams), so the whole comparison is two narrow
    * gram scans + a 1x1 join — never a gram-level co-shuffle, never a
    * pairwise doc join. Estimates carry the published HLL error (~1.6%
    * rsd at the default lgConfigK); inclusion-exclusion compounds the
    * error of three estimates, so overlap tolerance should be stated
    * against |A ∪ B|, not the (possibly tiny) overlap itself. */
  def corpusOverlap(a: DataFrame, b: DataFrame, n: Int = 8,
                    text: String = "text"): DataFrame = {
    def sk(df: DataFrame, name: String) =
      graft.core.Parallelism.forCompute(df)
        .select(explode(TextAnalysis.wordGrams(col(text), n)).as("g"))
        .agg(hll_sketch_agg(col("g")).as(name))
    sk(a, "__ska").crossJoin(sk(b, "__skb"))
      .select(
        hll_sketch_estimate(col("__ska")).as("n_a_est"),
        hll_sketch_estimate(col("__skb")).as("n_b_est"),
        hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
          .as("n_union_est"))
      .withColumn("n_overlap_est",
        col("n_a_est") + col("n_b_est") - col("n_union_est"))
      .withColumn("jaccard_est",
        col("n_overlap_est").cast("double") / col("n_union_est").cast("double"))
  }

  /** KMV (k-minimum-values) overlap estimation between two item sets — the
    * DIRECT-intersection companion to [[corpusOverlap]]'s HLL
    * inclusion-exclusion: the union sketch is the k smallest hashes of
    * both sides combined, the Jaccard estimate is the fraction of those
    * present in BOTH side sketches, and the intersection estimate is
    * jaccard x distinct-union. Every number here is engine-exact (md5
    * hashes + IEEE division), so the oracle hash-matches the ESTIMATES —
    * not just verdict booleans (HLL's register state is Spark-specific,
    * which is why [[corpusOverlap]] checks exact counts + bounds instead).
    *
    * Scale shape: per-side distinct on 8-byte hashes is the only row-grain
    * exchange; min-k selection is the bounded-heap typed Aggregator (O(k)
    * state per task, k rows per partition shuffle); everything downstream
    * operates on two k-element arrays in 1-row frames. Sketches merge by
    * "union then take k smallest" — shard/day/stream sketches compose. */
  def kmvOverlap(a: DataFrame, b: DataFrame, k: Int = 64,
                 item: String = "item"): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    import graft.functions.TopKAggregator.{MaxKByScore, ScoredL}
    def hashes(df: DataFrame) = df
      .select(conv(substr(md5(col(item)), lit(1), lit(15)), 16, 10)
        .cast("long").as("h"))
      .distinct()
    // min-k as max-k of the negation: 15 hex digits < 2^60, negation safe;
    // hits surface (iscore desc) = hash ascending
    def sketch(df: DataFrame, name: String) = hashes(df)
      .select(lit(0L).as("q_id"), col("h").as("n_id"), (-col("h")).as("iscore"))
      .as[ScoredL]
      .groupByKey(_.q_id)
      .agg(new MaxKByScore(k).toColumn.name("hits"))
      .map { case (_, hits) => hits.map(_.n_id).toArray }
      .toDF(name)

    val pow60 = math.pow(2, 60) // exact double
    def dEst(arr: Column): Column =
      lit((k - 1).toDouble) / (element_at(arr, k).cast("double") / lit(pow60))

    val exact = hashes(a).agg(count(lit(1)).as("n_a"))
      .crossJoin(hashes(b).agg(count(lit(1)).as("n_b")))
      .crossJoin(hashes(a).join(hashes(b), "h")
        .agg(count(lit(1)).as("n_inter_exact")))

    sketch(a, "ska").crossJoin(sketch(b, "skb")).crossJoin(exact)
      .withColumn("su",
        slice(array_sort(array_distinct(concat(col("ska"), col("skb")))), 1, k))
      .withColumn("jaccard_est",
        size(filter(col("su"), x =>
          array_contains(col("ska"), x) && array_contains(col("skb"), x)))
          .cast("double") / lit(k.toDouble))
      .select(col("n_a"), col("n_b"), col("n_inter_exact"),
        dEst(col("ska")).as("d_a_est"),
        dEst(col("skb")).as("d_b_est"),
        dEst(col("su")).as("d_union_est"),
        col("jaccard_est"),
        (col("jaccard_est") * dEst(col("su"))).as("inter_est"))
  }

  /** Signed aggregate snapshot for CDC feeds WITH DELETIONS: `op` is +1
    * (insert) / -1 (retract); n and sum_v fold as signed sums. The
    * retractable companion to [[aggSnapshot]]. */
  def retractSnapshot(rows: DataFrame, keys: Seq[String], valueCol: String,
                      op: String = "op"): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(
        sum(col(op)).cast("long").as("n"),
        sum((col(op) * col(valueCol)).cast("decimal(28,2)"))
          .cast("decimal(28,2)").as("sum_v"))

  /** CDC aggregate maintenance WITH RETRACTIONS: the delta carries op = +1
    * (insert) / -1 (delete of a previously-inserted row); counts and sums
    * are signed and fold associatively, so maintenance stays one
    * full-outer join per batch — no re-read of history. min/max are
    * deliberately ABSENT from this form: deleting the current min needs
    * the runner-up, i.e. the group's raw rows — the standard split between
    * retractable (count/sum/avg) and non-retractable (min/max/distinct)
    * maintenance, and [[incrementalAgg]] keeps min/max for append-only
    * feeds. Keys whose live count reaches 0 leave the snapshot entirely
    * (state shrinks with the data, as a maintained view must). */
  def incrementalAggRetract(snapshot: DataFrame, delta: DataFrame,
                            keys: Seq[String], valueCol: String,
                            op: String = "op"): DataFrame = {
    val d = retractSnapshot(delta, keys, valueCol, op)
      .withColumnRenamed("n", "__dn").withColumnRenamed("sum_v", "__dsum")
    snapshot.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(28,2)"))
          + coalesce(col("__dsum"), lit(0).cast("decimal(28,2)")))
          .cast("decimal(28,2)").as("sum_v")): _*)
      .filter(col("n") =!= 0L)
  }

  /** AS-OF snapshot reconstruction from [[scd2History]]'s validity ranges:
    * the table state at time `asOfEpoch` is every key's version whose
    * half-open [valid_from, valid_to) covers it. One filter over the
    * history — no window re-run; at scale the history's valid_from range
    * partitioning (or date partitioning of the lake table) prunes the
    * scan to ranges overlapping the probe. */
  def scd2AsOf(history: DataFrame, asOfEpoch: Long): DataFrame =
    history.filter(col("valid_from") <= asOfEpoch &&
      (col("valid_to").isNull || col("valid_to") > asOfEpoch))

  /** One-sided KMV sketch builder: the k smallest md5 hashes of the item
    * column (ascending) plus the distinct-count estimate. Unlike
    * [[kmvOverlap]]'s internal sketch there is NO separate distinct pass —
    * the `MinKDistinct` aggregator dedupes inside its O(k) buffer, which is
    * exactly what lets the SAME code run as a single streaming aggregation
    * (`StreamingOps.kmvDistinct`, complete mode): stream accumulation over
    * any trigger split lands on the batch sketch EXACTLY (asserted in the
    * streaming spec). Below k distinct items the sketch IS the distinct
    * set, so the estimate switches to the exact fill count. */
  def kmvSketch(df: DataFrame, k: Int = 64, item: String = "item"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TopKAggregator.MinKDistinct
    val pow60 = math.pow(2, 60) // exact double
    df.select(conv(substr(md5(col(item)), lit(1), lit(15)), 16, 10)
        .cast("long").as("h"))
      .as[Long]
      .groupByKey(_ => 0L)
      .agg(new MinKDistinct(k).toColumn.name("kmv"))
      .map { case (_, ks) => ks.toArray }
      .toDF("kmv")
      .withColumn("n_in_sketch", size(col("kmv")).cast("long"))
      .withColumn("d_est",
        when(col("n_in_sketch") < k, col("n_in_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("kmv"), k).cast("double") / lit(pow60))))
  }

  /** Bottom-k-by-hash uniform row sample — the STATE of the mergeable
    * quantile sketch ([[quantileSketch]]). Each row's priority is the
    * 60-bit md5 prefix of its id (content-addressed: no RNG, identical
    * across runs, engines and partitionings); the sample is the k rows
    * with the smallest priorities, which is a uniform-without-replacement
    * sample of the population. Sketches MERGE by "union the samples,
    * re-take the bottom k" — priorities are global, so the merged sample
    * equals the sample of the union (shard/day/stream states compose;
    * asserted in the spec). Selection is the bounded-heap typed Aggregator
    * carrying the value payload (O(k) state per task, k tuples per
    * partition on the final exchange) — ONE pass, no join-back, which is
    * also what lets the identical code run as a single streaming
    * aggregation (`StreamingOps.quantileSample`, complete mode; stream
    * accumulation lands on the batch sample exactly, spec-asserted).
    *
    * Same family as [[kmvSketch]] (distinct counts) and
    * `TextAnalysis.cmsSketch` (frequencies): this one answers QUANTILES —
    * rank-space accuracy ~ O(1/sqrt(k)) regardless of population size. */
  def quantileSample(df: DataFrame, k: Int = 256, id: String = "id",
                     valueCol: String = "v"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TopKAggregator.{MinKByPri, PriRow}
    val pri = conv(substr(md5(col(id).cast("string")), lit(1), lit(15)), 16, 10)
      .cast("long")
    // bottom-k by (hash asc, id asc): ties on the 60-bit prefix break by
    // id — a total order, so the sample is engine- and split-independent
    df.select(lit(0L).as("q_id"), pri.as("pri"),
        col(id).cast("long").as("n_id"), col(valueCol).cast("double").as("v"))
      .as[PriRow]
      .groupByKey(_.q_id)
      .agg(new MinKByPri(k).toColumn.name("s"))
      .flatMap { case (_, s) => s }
      .toDF("sid", "sv")
  }

  /** Mergeable quantile sketch + rank-space accuracy report: nearest-rank
    * quantile estimates from the [[quantileSample]] order statistics, each
    * audited against the full population — `n_le` is the exact count of
    * rows at or below the estimate, so `rank_err = |n_le/n - q|` is the
    * estimate's true rank-space error. One row per requested quantile.
    *
    * Everything is engine-exact (md5 priorities, sorted-array indexing,
    * exact counts, IEEE division in fixed order), so the oracle
    * hash-matches the ESTIMATES AND the error audit, not just verdicts.
    *
    * Scale shape: one row-grain pass for the sample (bounded-heap partial
    * aggs, k tuples per partition exchanged), one row-grain
    * conditional-count pass for the audit (the |qs| estimates broadcast;
    * partial aggregation leaves a |qs|-row exchange). Nothing row-grain
    * ever sorts globally or joins. */
  def quantileSketch(df: DataFrame, k: Int = 256, id: String = "id",
                     valueCol: String = "v",
                     qs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)): DataFrame =
    quantileSketchFromSample(df, quantileSample(df, k, id, valueCol),
      valueCol, qs)

  /** Per-GROUP [[quantileSketch]]: one bottom-k-by-hash sample per group
    * (per-domain length profiles, per-language score distributions — the
    * curation dashboard grain), same content-addressed priorities and
    * bounded-heap state, keyed by the group column. The audit joins the
    * (|groups| x |qs|)-row estimate frame back as a BROADCAST, so the
    * row-grain side exchanges once for the (group, q) conditional count
    * partial aggregation and never sorts. */
  def quantileSketchByGroup(df: DataFrame, k: Int = 64, group: String = "g",
                            id: String = "id", valueCol: String = "v",
                            qs: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TopKAggregator.{MinKByPriG, PriRowG}
    val pri = conv(substr(md5(col(id).cast("string")), lit(1), lit(15)), 16, 10)
      .cast("long")
    val sample = df.select(col(group).cast("string").as("g"), pri.as("pri"),
        col(id).cast("long").as("n_id"), col(valueCol).cast("double").as("v"))
      .as[PriRowG]
      .groupByKey(_.g)
      .agg(new MinKByPriG(k).toColumn.name("s"))
      .map { case (g, s) => (g, s.map(_._2).toArray.sorted) }
      .toDF("g", "svs")
    val tot = df.groupBy(col(group).cast("string").as("g"))
      .agg(count(lit(1)).as("n_total"))
    val est = sample.join(tot, "g")
      .withColumn("n_sample", size(col("svs")).cast("long"))
      .select(col("g"), col("svs"), col("n_sample"), col("n_total"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("est", element_at(col("svs"),
        greatest(lit(1), ceil(col("q") * col("n_sample")).cast("int"))))
      .select("g", "q", "est", "n_sample", "n_total")
    df.select(col(group).cast("string").as("g"),
        col(valueCol).cast("double").as("__v"))
      .join(broadcast(est), "g")
      .groupBy("g", "q", "est", "n_sample", "n_total")
      .agg(sum(when(col("__v") <= col("est"), 1L).otherwise(0L)).as("n_le"))
      .withColumn("rank_frac",
        col("n_le").cast("double") / col("n_total").cast("double"))
      .withColumn("rank_err", abs(col("rank_frac") - col("q")))
      .select("g", "q", "est", "n_sample", "n_total", "n_le", "rank_frac",
        "rank_err")
      .orderBy("g", "q")
  }

  /** [[quantileSketch]] over a PRE-BUILT (or shard-merged) sample state:
    * the maintenance form — shard/day states union, [[quantileSample]]
    * re-takes the bottom k (priorities are content-addressed, so the
    * merged state equals the from-scratch sample and the whole report is
    * provably identical to [[quantileSketch]] on the union; the oracle row
    * runs the from-scratch SQL against the merged plan). `df` is only
    * audited against (row-grain counts), never re-sampled. */
  def quantileSketchFromSample(df: DataFrame, sampleDf: DataFrame,
                               valueCol: String,
                               qs: Seq[Double]): DataFrame = {
    val sample = sampleDf
      .agg(sort_array(collect_list(col("sv"))).as("svs"),
        count(lit(1)).as("n_sample"))
      .crossJoin(df.agg(count(lit(1)).as("n_total")))
      .select(col("svs"), col("n_sample"), col("n_total"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("est", element_at(col("svs"),
        greatest(lit(1), ceil(col("q") * col("n_sample")).cast("int"))))
      .select(col("q"), col("est"), col("n_sample"), col("n_total"))
    // audit: exact rank of each estimate over the full population — the
    // |qs|-row estimate frame broadcasts into a conditional count
    val audited = df.select(col(valueCol).cast("double").as("__v"))
      .crossJoin(broadcast(sample))
      .groupBy("q", "est", "n_sample", "n_total")
      .agg(sum(when(col("__v") <= col("est"), 1L).otherwise(0L)).as("n_le"))
    audited
      .withColumn("rank_frac",
        col("n_le").cast("double") / col("n_total").cast("double"))
      .withColumn("rank_err", abs(col("rank_frac") - col("q")))
      .select("q", "est", "n_sample", "n_total", "n_le", "rank_frac", "rank_err")
      .orderBy("q")
  }

  /** Type-2 SCD derivation from a row-version log: each key's versions get
    * half-open validity ranges [valid_from, valid_to) in epoch seconds, the
    * open (current) version marked with valid_to NULL. Deterministic under
    * any partitioning: the per-key order is (version, tiebreak...) — callers
    * must make it total within a key. */
  def scd2History(log: DataFrame, keys: Seq[String], version: Column,
                  tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.asc +: tiebreak.map(_.asc)): _*)
    log.withColumn("valid_from", version.cast("timestamp").cast("long"))
      .withColumn("valid_to",
        lead(version.cast("timestamp").cast("long"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
