package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-10 operator-direct natives must be INVISIBLE except for speed:
  * each is compared against its portable HOF twin — on real fixture docs
  * AND on the corner rows (null arrays, null elements, empties, short
  * arrays) where the twins' null algebra is subtle. */
class TextScoreExpressionsSpec extends SparkSpec {

  import graft.operators.{Classifier, ContentChunking}

  test("token_score == the element_at(map)-fold HOF on fixture docs") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(300)
    val nat = Classifier.scoreUnsorted(docs).orderBy("doc_id").collect()
    val hof = Classifier.scoreUnsortedHof(docs).orderBy("doc_id").collect()
    assert(nat.length == hof.length && nat.nonEmpty)
    nat.zip(hof).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("token_score corners: null text, empty text, token hitting the model") {
    import spark.implicits._
    val docs = Seq((1L, Some("the quick brown fox")), (2L, None),
      (3L, Some("")), (4L, Some("   ")))
      .toDF("doc_id", "text").repartition(2)
    val nat = Classifier.scoreUnsorted(docs).orderBy("doc_id").collect()
    val hof = Classifier.scoreUnsortedHof(docs).orderBy("doc_id").collect()
    nat.zip(hof).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    // null text: whole row nulls except id (tokens null -> struct null)
    assert(nat(1).isNullAt(1) && nat(1).isNullAt(2) && nat(1).isNullAt(3))
  }

  test("gopher_stats == the three HOF stats incl. max-tf rescan, on fixtures + corners") {
    import spark.implicits._
    val fixture = graft.sources.Tables.documents(spark, sf).limit(300)
      .select(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ").as("w"))
    val corners = Seq(
      Some(Seq(Option("aa"), Option("bb"), Option("aa"), Option("aa"))),
      Some(Seq(Option("x1"), None, Option("x1"))),
      Some(Seq.empty[Option[String]]),
      Some(Seq(Option(""), Option("9"), Option("z"))),
      None).toDF("w").repartition(2)
    for (df <- Seq(fixture, corners)) {
      val out = df.select(
        TextScoreFunctions.gopher_stats(col("w")).as("nat"),
        aggregate(col("w"), lit(0L), (acc, x) => acc + length(x)).as("len_hof"),
        size(filter(col("w"), x => x.rlike("[a-z]"))).cast("long").as("na_hof"),
        array_max(transform(array_distinct(col("w")),
          x => size(filter(col("w"), y => y === x)))).cast("long").as("tf_hof"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        if (r.isNullAt(0)) {
          assert(r.isNullAt(1) && r.isNullAt(3), s"null-array twin mismatch: $r")
        } else {
          val s = r.getStruct(0)
          assert(s.get(0) == r.get(1), s"total_len: ${s.get(0)} vs ${r.get(1)}")
          assert(s.get(1) == r.get(2), s"n_alpha: ${s.get(1)} vs ${r.get(2)}")
          assert(s.get(2) == r.get(3), s"max_tf: ${s.get(2)} vs ${r.get(3)}")
        }
      }
    }
  }

  test("cdc_boundaries == the filter(sequence)+digest HOF on fixtures + corners") {
    import spark.implicits._
    val fixture = graft.sources.Tables.documents(spark, sf).limit(300)
      .select(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ").as("w"))
    val corners = Seq(
      Some((1 to 40).map(i => Option(s"tok$i"))),       // long enough for real boundaries
      Some(Seq(Option("a"), Option("b"))),              // shorter than the window
      Some(Seq(Option("a"), None, Option("c"), Option("d"), Option("e"))), // null skip
      Some(Seq.empty[Option[String]]),
      None).toDF("w").repartition(2)
    for ((df, window, divisor) <- Seq((fixture, 4, 16), (corners, 4, 2), (corners, 3, 1))) {
      val out = df.select(
        TextScoreFunctions.cdc_boundaries(col("w"), window, divisor).as("nat"),
        ContentChunking.cdcBoundariesHof(col("w"), size(col("w")), window, divisor).as("hof"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getSeq[Integer](0) == r.getSeq[Integer](1),
          s"bounds differ (window=$window divisor=$divisor): ${r.getSeq[Integer](0)} vs ${r.getSeq[Integer](1)}")
      }
    }
  }

  test("the live lanes produce identical results: cdcChunks pre/post native") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(200)
    // gold: chunk rows rebuilt from the HOF boundary column
    val w = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val gold = docs.select(col("doc_id"), w.as("w"), size(w).as("n"))
      .withColumn("bounds",
        ContentChunking.cdcBoundariesHof(col("w"), col("n"), 4, 16))
      .select(col("doc_id"), explode(col("bounds")).as("b"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val nat = ContentChunking.cdcChunks(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val diff = gold.union(nat)
      .groupBy("doc_id", "n_chunks").count().filter(col("count") =!= 2)
    assert(diff.isEmpty, s"chunk counts diverged: ${diff.collect().mkString(",")}")
  }
}
