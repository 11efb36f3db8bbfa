package graft.operators

import graft.SparkSpec

/** Semantics for the log-free corpus-concentration audits: Gini over the
  * count-ascending rank ladder and Simpson-family diversity, both checked
  * against hand-computed exact values. */
class TokenConcentrationSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("tokenGini: hand ladder — counts a:4 b:2 c:1 d:1") {
    // ranks ascending by (count, token): c=1 r1, d=1 r2, b=2 r3, a=4 r4
    // src = 1 + 2 + 6 + 16 = 25; gini = (2*25 - 5*8) / (4*8) = 0.3125
    val got = TextAnalysis.tokenGini(
      docs((1L, "x", "a a A a. b b! c d"))).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Double]("gini") == 0.3125)
    assert(r.getAs[Double]("hapax_share") == 0.5)
    // vocab DIV 10 = 0 -> empty top decile by definition
    assert(r.getAs[Double]("top_decile_share") == 0.0)
  }

  test("tokenGini: uniform counts have gini exactly 0; skew raises it") {
    val uniform = TextAnalysis.tokenGini(
      docs((1L, "u", (1 to 20).map(i => s"t$i").mkString(" "))))
      .collect().head
    assert(uniform.getAs[Double]("gini") == 0.0)
    // 20 hapax + one 80x token: top decile (2 of 21 tokens) owns 81/100
    val skewed = TextAnalysis.tokenGini(
      docs((1L, "s", (1 to 20).map(i => s"t$i").mkString(" ") +
        (" big" * 80)))).collect().head
    assert(skewed.getAs[Double]("gini") > 0.5)
    assert(skewed.getAs[Long]("vocab") == 21L)
    // ascending ladder top-2: big(80) and the last hapax by token order
    assert(skewed.getAs[Double]("top_decile_share") == 81.0 / 100.0)
  }

  test("tokenDiversity: Simpson family on the hand ladder") {
    // counts a:4 b:2 c:1 d:1 -> sq = 22, N = 8
    val r = TextAnalysis.tokenDiversity(
      docs((1L, "x", "a a a a b b c d"))).collect().head
    assert(r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Long]("hapax") == 2L)
    assert(r.getAs[Double]("simpson_repeat") == 14.0 / 56.0)
    assert(r.getAs[Double]("effective_vocab") == 64.0 / 22.0)
    assert(r.getAs[Double]("type_token_ratio") == 0.5)
  }

  test("tokenDiversity: uniform corpus has effective_vocab == vocab") {
    val r = TextAnalysis.tokenDiversity(
      docs((1L, "u", (1 to 15).map(i => s"w$i").mkString(" "))))
      .collect().head
    assert(r.getAs[Double]("effective_vocab") == 15.0)
    assert(r.getAs[Double]("simpson_repeat") == 0.0)
    assert(r.getAs[Double]("hapax_share") == 1.0)
  }

  test("groups are independent ladders") {
    val got = TextAnalysis.tokenGini(docs(
        (1L, "a", "x x y"), (2L, "b", "z z z z q")))
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(got("a").getAs[Long]("n_tokens") == 3L)
    assert(got("b").getAs[Long]("n_tokens") == 5L)
    assert(got("a").getAs[Long]("vocab") == 2L)
    assert(got("b").getAs[Long]("vocab") == 2L)
  }

  test("plan: diversity is join-free; gini's only window is group-partitioned") {
    val div = TextAnalysis.tokenDiversity(
      graft.sources.Tables.documents(spark, sf))
    assert(!div.queryExecution.executedPlan.toString.contains("Join"))
    val gini = TextAnalysis.tokenGini(
      graft.sources.Tables.documents(spark, sf))
    val p = gini.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1500))
    // the rank/count windows are partitioned by grp — never a global sort
    assert(!p.matches("(?s).*Window.*partitionBy: \\[\\].*"), p.take(1500))
  }
}
