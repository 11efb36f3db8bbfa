package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Chat-assembly semantics: byte-exact transcript (verified through the
  * digest of a hand-built expected string), role parity, gap splitting,
  * and tie ordering by event id. */
class ChatAssembleSpec extends SparkSpec {

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.map { case (user, id, sec, t) =>
      (user, id, new Timestamp(sec * 1000L), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  test("transcript digest equals the hand-assembled string's md5; roles alternate") {
    val df = ev(
      (1L, 10L, 1000L, "click"),
      (1L, 11L, 1060L, "view"),
      (1L, 12L, 1100L, "purchase"))
    val r = JsonOps.chatAssemble(df).head()
    val expected = "user: click\nassistant: view\nuser: purchase"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[Long]("n_turns") == 3L)
    assert(r.getAs[String]("transcript_md5") == md)
    // tokens of "user click assistant view user purchase" = 6
    assert(r.getAs[Long]("n_tokens") == 6L)
  }

  test("a gap over 1800 s starts a new session with role parity RESET") {
    val df = ev(
      (1L, 10L, 1000L, "click"),
      (1L, 11L, 1100L, "view"),
      (1L, 12L, 9999L, "purchase")) // new session
    val rows = JsonOps.chatAssemble(df).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_turns")).toSeq == Seq(2L, 1L))
    // second session's single line is role "user" again
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("user: purchase".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(1).getAs[String]("transcript_md5") == md)
  }

  test("same-second events order by event_id; null event_type renders empty") {
    val df = ev(
      (1L, 20L, 1000L, "b"),
      (1L, 19L, 1000L, "a"))
      .unionAll(ev((2L, 30L, 1000L, "x")).withColumn("event_type",
        org.apache.spark.sql.functions.lit(null: String)))
    val rows = JsonOps.chatAssemble(df).collect()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L).head
    val md1 = java.security.MessageDigest.getInstance("MD5")
      .digest("user: a\nassistant: b".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(u1.getAs[String]("transcript_md5") == md1)
    val u2 = rows.filter(_.getAs[Long]("user_id") == 2L).head
    val md2 = java.security.MessageDigest.getInstance("MD5")
      .digest("user: ".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(u2.getAs[String]("transcript_md5") == md2)
    // "user" alone tokenizes to 1
    assert(u2.getAs[Long]("n_tokens") == 1L)
  }
}
