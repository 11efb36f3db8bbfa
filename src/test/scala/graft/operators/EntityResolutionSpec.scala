package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("resolve: records agreeing on ANY pass merge; closure spans passes") {
    // 1 and 2 share an email; 2 and 3 share a name -> {1,2,3} is ONE entity
    // even though 1 and 3 agree on nothing directly. 4 is a singleton.
    val recs = Seq(
      (1L, "alice", "a@x.com"),
      (2L, "alicia", "a@x.com"),
      (3L, "alicia", "b@x.com"),
      (4L, "bob", "c@x.com"))
      .toDF("id", "name", "email")
    val out = EntityResolution.resolve(recs, "id", Seq(col("name"), col("email")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((1L, 3L)))
    assert(out(2L) === ((1L, 3L)))
    assert(out(3L) === ((1L, 3L)))
    assert(out(4L) === ((4L, 1L)))
  }

  test("resolve: star edges span the same components as all intra-block pairs") {
    // a 4-record block: star (min->others) must yield one 4-entity, the
    // same closure the quadratic pair set would give
    val recs = (1L to 4L).map(i => (i, "same", s"e$i@x.com")).toDF("id", "name", "email")
    val out = EntityResolution.resolve(recs, "id", Seq(col("name")))
      .collect().map(r => (r.getLong(1), r.getLong(2))).distinct
    assert(out === Array((1L, 4L)))
  }

  test("resolve: null block keys never link") {
    val recs = Seq((1L, null, "a@x"), (2L, null, "b@x"), (3L, "n", "c@x"))
      .toDF("id", "name", "email")
    val out = EntityResolution.resolve(recs, "id", Seq(col("name"), col("email")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // all singletons
  }

  test("resolveIncremental: adoption, closure-through-batch, new entities, frozen bridges") {
    val history = Seq(
      (1L, "alice", "a@x.com"), (2L, "alicia", "a@x.com"), // entity 1
      (3L, "carol", "c@x.com"),                            // entity 3
      (5L, "eve", "e@x.com"))                              // entity 5
      .toDF("id", "name", "email")
    val hEnt = EntityResolution.resolve(history, "id",
      Seq(col("name"), col("email")))
    val batch = Seq(
      (10L, "ALICE", "a@x.com"),  // matches entity 1 by email
      (11L, "ALICE", "z@x.com"),  // matches history nothing; links to 10 intra-batch
      (12L, "dave", "d@x.com"),   // matches nothing -> new entity
      (13L, "carol", "e@x.com"))  // BRIDGE: entity 3 by name, entity 5 by email
      .toDF("id", "name", "email")
    val out = EntityResolution.resolveIncremental(history, hEnt, batch, "id",
        Seq(col("name"), col("email")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(10L) === ((1L, false)))
    assert(out(11L) === ((1L, false)), "closure through batch must adopt")
    assert(out(12L) === ((12L, true)))
    // bridge adopts the SMALLER history entity; history itself untouched
    assert(out(13L) === ((3L, false)))
    val hAfter = hEnt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hAfter(3L) === 3L && hAfter(5L) === 5L)
  }

  test("cusumDaily: equals the sequential max(0, prev + d) recurrence") {
    def ev(id: Long, day: Int, t: String) =
      (id, 1L, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), t)
    // type "a": daily counts 1,1,4 over 3 days -> total 6, mean 2
    // d_units (x3): 3*1-6=-3, -3, 3*4-6=6
    // cusum: max(0,-3)=0, max(0,0-3)=0, max(0,0+6)=6
    val rows = Seq(ev(1, 1, "a"), ev(2, 2, "a"),
      ev(3, 3, "a"), ev(4, 3, "a"), ev(5, 3, "a"), ev(6, 3, "a"))
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.cusumDaily(df).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("d_units"), r.getAs[Long]("cusum_units"),
        r.getAs[Boolean]("is_peak")))
    assert(got.toSeq === Seq(
      ("2024-01-01", -3L, 0L, false),
      ("2024-01-02", -3L, 0L, false),
      ("2024-01-03", 6L, 6L, true)))
  }

  test("recommendations: per-item rank, symmetric pairs, k cap") {
    // items 1,2 co-occur twice; 1,3 co-occur twice; 2,3 once (pruned)
    val b = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L),
      ("C", 1L), ("C", 3L), ("D", 1L), ("D", 3L), ("E", 2L), ("E", 3L))
      .toDF("basket", "item")
    val got = Graph.recommendations(b, "basket", "item", minCo = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // cnt: 1->4, 2->3, 3->3; cos(1,2)=2/sqrt(12)=cos(1,3) -> tie broken by id
    assert(got.toSeq === Seq((1L, 1L, 2L), (1L, 2L, 3L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }
}
