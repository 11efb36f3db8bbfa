package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupJsonSpec extends SparkSpec {
  import spark.implicits._

  test("dedupClusters closes pairs transitively: chains, stars, singletons-by-absence") {
    // chain 1-2-3-4 (1~2, 2~3, 3~4 but never 1~4), star 10-{11,12}, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val got = Dedup.dedupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupClusters converges on a 30-deep chain well under the diameter bound") {
    // worst case for plain min-propagation (needs 29 rounds); pointer
    // halving must close it within ~log2(30) rounds — maxIters = 8 proves
    // the speedup rather than trusting the docstring
    val chain = (1L until 31L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Dedup.dedupClusters(chain, maxIters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 31 && got.values.forall(_ == 1L))
  }

  test("dedupClusters with a reliable checkpoint dir produces the same labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a_id", "b_id")
    val got = Dedup.dedupClusters(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    // reliable checkpoints actually hit the configured directory
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0)
  }

  test("dedupClusters on fixture near-dup pairs: both members share a cluster") {
    val pairs = NearDup.minhashPairs(
      graft.sources.Tables.documents(spark, sf), 0.5)
    val clusters = Dedup.dedupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    pairs.select("a_id", "b_id").as[(Long, Long)].collect().foreach {
      case (a, b) => assert(clusters(a) == clusters(b), s"$a / $b split")
    }
    // cluster id is always a member's min id
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
  }

  test("duplicatedPassages finds cross-doc and within-doc spans and merges islands") {
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      // doc 1: 20-token passage embedded mid-doc (tokens 6..25 of 30)
      (1L, ((1 to 5).map(i => s"u$i") ++ Seq(passage) ++ (6 to 10).map(i => s"u$i")).mkString(" ")),
      // doc 2: same passage at the front (tokens 1..20 of 24)
      (2L, (Seq(passage) ++ (1 to 4).map(i => s"v$i")).mkString(" ")),
      // doc 3: all-unique tokens — must be absent from the output
      (3L, (1 to 30).map(i => s"q$i").mkString(" ")),
      // doc 4: a 16-token block repeated WITHIN the doc, separated by one token
      (4L, ((1 to 16).map(i => s"a$i") ++ Seq("z") ++ (1 to 16).map(i => s"a$i")).mkString(" ")),
      // doc 5: shorter than the window — no full window, absent
      (5L, (1 to 10).map(i => s"s$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedPassages(docs)
      .select("doc_id", "n_tokens", "n_dup_spans", "dup_tokens", "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(r == List(
      (1L, 30L, 1L, 20L, 20.0 / 30.0),
      (2L, 24L, 1L, 20L, 20.0 / 24.0),
      (4L, 33L, 2L, 32L, 32.0 / 33.0)))
  }

  test("scrubDuplicatedPassages cuts spans, keeps clean docs whole, keeps all docs") {
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, ((1 to 5).map(i => s"u$i") ++ Seq(passage) ++ (6 to 10).map(i => s"u$i")).mkString(" ")),
      (2L, (Seq(passage) ++ (1 to 4).map(i => s"v$i")).mkString(" ")),
      (3L, (1 to 30).map(i => s"q$i").mkString(" ")),
      (4L, ((1 to 16).map(i => s"a$i") ++ Seq("z") ++ (1 to 16).map(i => s"a$i")).mkString(" ")),
      (5L, (1 to 10).map(i => s"s$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.scrubDuplicatedPassages(docs)
      .select("doc_id", "n_tokens", "n_kept", "scrub_md5")
      .as[(Long, Long, Long, String)].collect().toList
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r == List(
      (1L, 30L, 10L, m(((1 to 5).map(i => s"u$i") ++ (6 to 10).map(i => s"u$i")).mkString(" "))),
      (2L, 24L, 4L, m((1 to 4).map(i => s"v$i").mkString(" "))),
      (3L, 30L, 30L, m((1 to 30).map(i => s"q$i").mkString(" "))),
      (4L, 33L, 1L, m("z")),
      (5L, 10L, 10L, m((1 to 10).map(i => s"s$i").mkString(" ")))))
  }

  test("duplicatedPassages plan: no cartesian product; digest-window marking") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val plan = Dedup.duplicatedPassages(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "pair detection must not cross-join")
    assert(plan.contains("Window"), "duplication marking should be a partitioned window")
    assert(!plan.toLowerCase.contains("broadcastnestedloop"))
  }

  test("keepFirst keeps exactly the first row per key under the given order") {
    val df = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L)).toDF("id", "k", "t")
    val r = Dedup.keepFirst(df, Seq("k"), Seq(col("t").asc, col("id").asc))
      .orderBy("k").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("exactText groups case/punctuation variants of the same text") {
    val df = Seq(
      (10L, "Hello,   World!"), (20L, "hello world"), (30L, "different")
    ).toDF("doc_id", "text")
    val r = Dedup.exactText(df).collect()
    assert(r.length == 2)
    val grp = r.find(_.getLong(1) == 10L).get
    assert(grp.getLong(2) == 2L) // both hello-world variants
  }

  test("sessionize splits on gaps > threshold and numbers sessions per user") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val df = Seq(
      (1L, 7L, at(0)), (2L, 7L, at(60)),          // session 1
      (3L, 7L, at(60 + 1801 + 60)),               // gap 1861s > 1800 -> session 2
      (4L, 8L, at(0))                              // other user -> own session 1
    ).toDF("event_id", "user_id", "ts")
    val r = JsonOps.sessionize(df).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSet == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("boundary gap == threshold stays in the same session (strict >)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val df = Seq((1L, 7L, at(0)), (2L, 7L, at(1800)))
      .toDF("event_id", "user_id", "ts")
    val r = JsonOps.sessionize(df).collect()
    assert(r.length == 1 && r(0).getLong(2) == 2L)
  }

  test("peakConcurrency: overlapping sessions counted; cross-day carry-in correct") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // three users: two overlapping morning sessions day 1 (peak 2), one
    // session from day-1 23:50 into day-2 00:10 (carry makes day-2 peak 1)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), "view", 0.0),
      (2L, 1L, ts("2024-01-01 09:20:00"), "view", 0.0),
      (3L, 2L, ts("2024-01-01 09:10:00"), "view", 0.0),
      (4L, 3L, ts("2024-01-01 23:50:00"), "view", 0.0),
      (5L, 3L, ts("2024-01-02 00:10:00"), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = JsonOps.peakConcurrency(ev).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got("2024-01-01") == 2L, got.toString)
    assert(got("2024-01-02") == 1L, got.toString) // pure carry-in, no day-2 start
  }

  test("clusterSurvivorsBy keeps the highest-score member; ties break to min id") {
    import spark.implicits._
    // cluster {1,2,3} via chain pairs; scores favor 2; {8,9} tie -> min id 8
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 20L), (7L, 5L), (8L, 30L), (9L, 30L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a_id", "b_id")
    val kept = Dedup.clusterSurvivorsBy(docs, pairs,
        org.apache.spark.sql.functions.col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 7L, 8L), kept.toString) // 2 wins on score, 7 untouched
  }

  test("topEventPaths: consecutive per-user trigrams, ordered by (ts, event_id)") {
    def ev(id: Long, user: Long, sec: Long, t: String) =
      (id, user, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)), t)
    // user 1 walks view>click>purchase>view; user 2 view>click>purchase;
    // same-second tie on user 2 resolved by event_id (4 before 5)
    val df = Seq(
      ev(1, 1, 100, "view"), ev(2, 1, 200, "click"),
      ev(3, 1, 300, "purchase"), ev(6, 1, 400, "view"),
      ev(4, 2, 500, "view"), ev(5, 2, 500, "click"), ev(7, 2, 600, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = JsonOps.topEventPaths(df, steps = 3, topN = 10)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "view > click > purchase" -> 2L,
      "click > purchase > view" -> 1L))
    // cross-user sequences must never form: total trigrams = 3, not 5
    assert(got.values.sum === 3L)
  }
}
