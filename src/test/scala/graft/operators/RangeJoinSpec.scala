package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Binned range join: result-identical to the naive theta join, but planned
  * as an equi-join on the bucket key instead of a BroadcastNestedLoopJoin. */
class RangeJoinSpec extends SparkSpec {

  private def events = Tables.events(spark, sf)

  test("binned join equals the naive theta join and is total over events") {
    val binned = RangeJoin.eventsToSessions(events).collect().toSeq
    // naive theta-join reference formulation
    val sessions = JsonOps.sessionize(events)
      .select(col("user_id").as("s_user"), col("session_seq"),
        col("session_start"), col("session_end"))
    val points = events.select(col("event_id"), col("user_id"),
      col("ts").cast("timestamp").cast("long").as("ts_sec"))
    val naive = points.join(sessions,
        col("user_id") === col("s_user") &&
          col("ts_sec") >= col("session_start") &&
          col("ts_sec") <= col("session_end"))
      .select("event_id", "user_id", "session_seq")
      .orderBy("event_id").collect().toSeq
    assert(binned == naive)
    // sessions partition each user's timeline -> exactly one row per event
    assert(binned.size == events.count())
  }

  test("binned plan is an equi-join on the bucket key, not a nested loop") {
    val df = RangeJoin.eventsToSessions(events)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2500))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2500))
  }

  test("binned equals naive for random intervals/points across bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { trial =>
      val iv = (1 to 40).map { i =>
        val lo = rnd.nextLong(2000L)
        (i.toLong, lo, lo + rnd.nextLong(300L)) // may be empty (hi == lo)
      }.toDF("iv_id", "lo", "hi")
      val pts = (1 to 300).map(i => (i.toLong, rnd.nextLong(2300L)))
        .toDF("pt_id", "ts")
      val bucket = Seq(7L, 64L, 1000L)(trial % 3)
      val got = RangeJoin.binned(pts, iv, "ts", "lo", "hi", bucket)
        .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
      val want = pts.join(iv, col("ts") >= col("lo") && col("ts") < col("hi"))
        .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"trial $trial bucket $bucket")
    }
  }

  test("empty and point intervals are safe; half-open bound respected") {
    import spark.implicits._
    val iv = Seq((1L, 100L, 100L), (2L, 100L, 101L), (3L, 200L, 400L))
      .toDF("iv_id", "lo", "hi")
    val pts = Seq((10L, 100L), (11L, 101L), (12L, 399L), (13L, 400L))
      .toDF("pt_id", "ts")
    val out = RangeJoin.binned(pts, iv, "ts", "lo", "hi", bucket = 64L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    // iv1 is empty [100,100) -> matches nothing; iv2 = {100}; iv3 = [200,400)
    assert(out == Set((10L, 2L), (12L, 3L)))
  }
}
