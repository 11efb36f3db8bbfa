package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Incremental MERGE/upsert semantics + the plan-shape claims behind them. */
class MergeSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf)
  private val keys = Seq("user_id", "event_type")

  test("snapshotDiff: planted add/remove/change classify; unchanged rows drop") {
    import spark.implicits._
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val diff = Merge.snapshotDiff(oldSnap, newSnap, "doc_id", md5(col("text")))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(diff == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("upsertReplace: every key appears once per update, pass-through otherwise") {
    val target = ev.filter(col("event_id") <= 700)
    val updates = ev.filter(col("event_id") > 700)
    val merged = Merge.upsertReplace(target, updates, keys,
      col("ts"), Seq(col("event_id")))
    // keys present in updates resolve to exactly the latest update row
    val updKeys = updates.select("user_id", "event_type").distinct()
    val fromUpdates = merged.join(updKeys, keys).count()
    assert(fromUpdates == updKeys.count(), "one row per updated key")
    // untouched target rows pass through unchanged
    val untouched = target.join(updKeys, keys, "left_anti")
    assert(merged.join(updKeys, keys, "left_anti").count() == untouched.count())
  }

  test("upsertLatest == upsertReplace when every update is strictly newer") {
    val target = ev.filter(col("event_id") <= 700)
    // shift updates far into the future so version order can't disagree
    val updates = ev.filter(col("event_id") > 700)
      .withColumn("ts", col("ts") + expr("INTERVAL 10 YEARS"))
    val a = Merge.upsertReplace(target, updates, keys, col("ts"), Seq(col("event_id")))
      .select("event_id", "user_id", "event_type")
    val b = Merge.upsertLatest(target, updates, keys, col("ts"), Seq(col("event_id")))
      .select("event_id", "user_id", "event_type")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("upsertLatest: a stale update loses to a newer target row") {
    import spark.implicits._
    val target = Seq((1L, "k", 100L, "new")).toDF("id", "key", "v", "src")
    val stale = Seq((2L, "k", 50L, "stale")).toDF("id", "key", "v", "src")
    val out = Merge.upsertLatest(target, stale, Seq("key"), col("v"), Seq(col("id")))
      .select("src").as[String].collect()
    assert(out.toSeq == Seq("new"))
  }

  test("scd2History: ranges are half-open, chain per key, one current row") {
    val h = Merge.scd2History(ev, keys, col("ts"), Seq(col("event_id")))
    // exactly one open (current) row per key
    val open = h.filter(col("is_current")).groupBy(keys.map(col): _*)
      .count().filter(col("count") =!= 1).count()
    assert(open == 0, "each key has exactly one current row")
    // each non-current row's valid_to equals the next row's valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts").asc, col("event_id").asc)
    val chained = h.withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(!col("is_current"))
      .filter(col("valid_to") =!= col("next_from"))
    assert(chained.count() == 0, "valid_to chains to the successor's valid_from")
  }

  test("incrementalAgg combines snapshot+delta: keys on one side only survive intact") {
    import spark.implicits._
    // key A in both, key B snapshot-only, key C delta-only
    val hist = Seq(("A", 10.0, 100L), ("A", 20.0, 110L), ("B", 5.0, 90L))
      .toDF("k", "value", "ts_sec")
    val delta = Seq(("A", 1.5, 200L), ("C", 7.0, 150L))
      .toDF("k", "value", "ts_sec")
    val snap = Merge.aggSnapshot(hist, Seq("k"), "value", "ts_sec")
    val got = Merge.incrementalAgg(snap, delta, Seq("k"), "value", "ts_sec")
      .select($"k", $"n", $"sum_v".cast("double"), $"min_v", $"max_v")
      .as[(String, Long, Double, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    val scratch = Merge.aggSnapshot(hist.unionAll(delta), Seq("k"), "value", "ts_sec")
      .select($"k", $"n", $"sum_v".cast("double"), $"min_v", $"max_v")
      .as[(String, Long, Double, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got == scratch)
    assert(got("B") == ((1L, 5.0, 90L, 90L)))   // snapshot-only passes through
    assert(got("C") == ((1L, 7.0, 150L, 150L))) // delta-only appears fresh
    assert(got("A") == ((3L, 31.5, 100L, 200L)))
  }

  test("incrementalDistinct: merged sketches estimate exactly like a single pass") {
    import spark.implicits._
    val hist = (1 to 400).map(i => ("t", i % 97L)).toDF("k", "uid")
    val delta = (1 to 300).map(i => ("t", (i % 53L) + 80L)).toDF("k", "uid")
      .unionAll(Seq(("fresh", 1L)).toDF("k", "uid"))
    val merged = Merge.incrementalDistinct(
        Merge.distinctSnapshot(hist, Seq("k"), "uid"), delta, Seq("k"), "uid")
      .select($"k", $"n_distinct_est").as[(String, Double)].collect().toMap
    val single = Merge.distinctSnapshot(hist.unionAll(delta), Seq("k"), "uid")
      .withColumn("e", hll_sketch_estimate(col("dv_sketch")))
      .select($"k", $"e").as[(String, Double)].collect().toMap
    // sketch union == sketch of the union: ESTIMATES are identical, not
    // merely close — that is what makes the maintenance loop sound
    assert(merged == single)
    assert(merged.contains("fresh")) // delta-only key appears
  }

  test("corpusOverlap: identical corpora -> jaccard ~1, disjoint -> overlap ~0") {
    import spark.implicits._
    val a = (1 to 40).map(i => (i.toLong,
      (1 to 12).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val exact = a.select(explode(TextAnalysis.wordGrams(col("text"), 8)).as("g"))
      .distinct().count()
    val same = Merge.corpusOverlap(a, a).collect().head
    // NOT asserting bit-equal estimates: datasketches HLL estimates depend
    // on partial-merge order, so two aggregations of the same input can
    // differ by a few counts — only the published error bound is contractual
    assert(math.abs(same.getAs[Long]("n_a_est") - exact) <= 0.05 * exact, s"$same vs $exact")
    assert(math.abs(same.getAs[Long]("n_b_est") - exact) <= 0.05 * exact)
    assert(math.abs(same.getAs[Double]("jaccard_est") - 1.0) <= 0.1)
    val b = (1 to 40).map(i => (i.toLong,
      (1 to 12).map(j => s"x${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val dis = Merge.corpusOverlap(a, b).collect().head
    // disjoint gram sets: overlap estimate within sketch noise of zero
    assert(math.abs(dis.getAs[Long]("n_overlap_est").toDouble)
      <= 0.05 * dis.getAs[Long]("n_union_est"))
  }

  test("corpusOverlap plan: partial sketch aggregation, no gram co-shuffle join") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val p = Merge.corpusOverlap(docs, docs).queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), "sketch agg must partial-aggregate")
    assert(!p.contains("SortMergeJoin"), "1x1 sketch join must not sort-merge")
  }

  test("upsertReplace plan: target side is a broadcast anti-join (no target shuffle)") {
    val target = ev.filter(col("event_id") <= 700)
    val updates = ev.filter(col("event_id") > 700)
    val merged = Merge.upsertReplace(target, updates, keys,
      col("ts"), Seq(col("event_id")))
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(3000))
  }

  test("incrementalAggRetract: deletes cancel exactly; fully-retracted keys vanish") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.5, 1), (1L, "a", 2.25, 1), (2L, "b", 7.0, 1))
      .toDF("k", "t", "value", "op")
    val snap = Merge.retractSnapshot(base, Seq("k", "t"), "value")
    // delete one of key 1's rows, BOTH == ALL of key 2's rows, insert key 3
    val delta = Seq((1L, "a", 2.25, -1), (2L, "b", 7.0, -1), (3L, "c", 5.0, 1))
      .toDF("k", "t", "value", "op")
    val out = Merge.incrementalAggRetract(snap, delta, Seq("k", "t"), "value")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        r.getDecimal(3).doubleValue)).sortBy(_._1)
    // key 2 fully retracted -> gone; key 1 keeps the exact remaining sum
    assert(out.toSeq == Seq((1L, 1L, 10.5), (3L, 1L, 5.0)), out.mkString(";"))
  }

  test("scd2AsOf: exactly one live version per key that existed at the probe") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, "v1", ts("2024-01-01 00:00:00")),
      (1L, "v2", ts("2024-01-10 00:00:00")),
      (1L, "v3", ts("2024-01-20 00:00:00")),
      (2L, "w1", ts("2024-01-18 00:00:00"))) // born after some probes
      .toDF("k", "payload", "ts")
    val h = Merge.scd2History(log, Seq("k"), col("ts"), Seq(col("payload")))
    def liveAt(s: String) = Merge.scd2AsOf(h, ts(s).getTime / 1000)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("payload")).toMap
    assert(liveAt("2024-01-05 00:00:00") == Map(1L -> "v1"))
    assert(liveAt("2024-01-15 00:00:00") == Map(1L -> "v2"))
    assert(liveAt("2024-01-25 00:00:00") == Map(1L -> "v3", 2L -> "w1"))
  }
}
