package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq((1L, "hello world42, ok!"), (2L, "  a  b  ")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).orderBy("doc_id").collect()
    // "hello world42, ok!" -> ws: [hello, world42,, ok!] = 3
    // bpe: hello|world|42|,|ok|! = 6
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 6)
    assert(r(1).getLong(1) == 2) // trim collapses leading/trailing
  }

  test("rolling-hash fingerprint matches direct Karp-Rabin computation") {
    val df = Seq((1L, "The  quick-brown FOX")).toDF("doc_id", "text")
    val got = TextAnalysis.fingerprints(df).first()
    val norm = "the quick brown fox"
    val expected = norm.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    assert(got.getLong(2) == expected)
    assert(got.getString(1) == java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("langId: argmax with en-first precedence on ties") {
    val df = Seq(
      (1L, "the a and table"),       // en markers dominate
      (2L, "der und die tisch"),     // de markers dominate
      (3L, "x y z")).toDF("doc_id", "text") // all-zero tie except es 'y' -> es
    val r = TextAnalysis.langId(df).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("pred_lang") == "en")
    assert(r(1).getAs[String]("pred_lang") == "de")
    assert(r(2).getAs[String]("pred_lang") == "es")
  }

  test("quality: punct and stopword ratios on a known string") {
    val df = Seq((1L, "the cat, the hat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df).first()
    assert(r.getAs[Long]("len") == 17L)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-12)
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 4) < 1e-12)
  }

  test("normalizeText: NFC composes the decomposed accent and collapses whitespace") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val r = TextAnalysis.normalizeText(df).first()
    // dirty = "abc" + [tab c a f e U+0301 space newline space x] = 3 + 10 codepoints
    assert(r.getAs[Long]("n_cp_dirty") == 13L)
    // composed form: U+0301 merges into 'e' (-1 codepoint), tab/newline/
    // double-space collapse to single spaces, trailing whitespace trimmed
    val expected = "abc caf\u00e9 x"
    assert(r.getAs[String]("clean") == expected)
    assert(r.getAs[Long]("n_cp_clean") == expected.codePointCount(0, expected.length).toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("clean_md5") == md)
  }

  test("decontaminate: doc sharing a benchmark n-gram is flagged, clean doc is not") {
    val df = Seq(
      (10L, "alpha beta gamma delta"),   // benchmark (10 % 10 == 0)
      (11L, "alpha beta gamma epsilon"), // shares trigram "alpha beta gamma"
      (12L, "zeta eta theta iota")       // disjoint vocabulary
    ).toDF("doc_id", "text")
    val r = TextAnalysis.decontaminate(df, benchMod = 10, n = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_hit"), x.getAs[Boolean]("contaminated")))).toMap
    assert(!r.contains(10L)) // benchmark rows are not in the training output
    assert(r(11L) == ((1L, true)))
    assert(r(12L) == ((0L, false)))
  }

  test("qualityBuckets tiers by score with cuts-below-score assignment; plan has no sort") {
    // 9 docs whose chars_per_token strictly increases with doc id: token
    // lengths 1..9 -> terciles must be {1..3}, {4..6}, {7..9}
    val docs = (1 to 9).map(i => (i.toLong, Seq.fill(4)("x" * i).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityBuckets(docs)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert((1L to 3L).forall(got(_) == 0L), got.toString)
    assert((4L to 6L).forall(got(_) == 1L), got.toString)
    assert((7L to 9L).forall(got(_) == 2L), got.toString)
    val plan = TextAnalysis.qualityBuckets(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortExec") && !plan.toLowerCase.contains("rangepartitioning"),
      "bucketing must not globally sort: " + plan.take(400))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("percentile"),
      "boundaries must come from the percentile sketch aggregate")
  }

  test("decontaminateAttribution names the leaking bench doc with shared-gram counts") {
    val df = Seq(
      (10L, "alpha beta gamma delta"),        // bench A
      (20L, "zeta eta theta iota"),           // bench B
      (11L, "alpha beta gamma epsilon"),      // 1 trigram from A
      (12L, "zeta eta theta iota kappa"),     // 2 trigrams from B
      (13L, "mu nu xi omicron")               // clean
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.decontaminateAttribution(df, benchMod = 10, n = 3)
      .as[(Long, Long, Long)].collect().toList
    assert(pairs == List((11L, 10L, 1L), (12L, 20L, 2L)))
    // attribution's flagged train set == decontaminate's contaminated set
    val flagged = pairs.map(_._1).toSet
    val contaminated = TextAnalysis.decontaminate(df, benchMod = 10, n = 3)
      .filter(org.apache.spark.sql.functions.col("contaminated")).select("doc_id")
      .as[Long].collect().toSet
    assert(flagged == contaminated)
  }

  test("decontaminateNearDup: paraphrase-level copy of a bench doc is flagged, distinct doc is not") {
    val benchText = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    // doc 11: same text with one word changed -> high Jaccard vs bench doc 10
    val nearCopy = benchText.replace("quiet", "silent")
    val distinct =
      "completely unrelated prose about compilers optimizing relational query plans efficiently"
    val df = Seq((10L, benchText), (11L, nearCopy), (13L, distinct))
      .toDF("doc_id", "text")
    val r = TextAnalysis.decontaminateNearDup(df, benchMod = 10, threshold = 0.5)
      .as[(Long, Boolean)].collect().toMap
    assert(!r.contains(10L)) // bench doc itself is not training output
    assert(r(11L), "near-copy of a bench doc must flag")
    assert(!r(13L), "unrelated doc must not flag")
  }

  test("bigramFrequencySignal: counts and vocab hits are exact on a tiny corpus") {
    // "a b" occurs in both docs (freq 2), every other bigram once
    val df = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFrequencySignal(df, vocabSize = 2000)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // doc 1: bigrams ("a b", "b c") -> freqs 2 + 1 = 3, all in vocab
    assert(r(1L) == ((2L, 2L, 3L, 0.0)))
    // doc 2: bigram ("a b") -> freq 2
    assert(r(2L) == ((1L, 1L, 2L, 0.0)))
  }

  test("bigramFrequencySignal: bigrams outside the vocab head count as OOV") {
    // vocabSize 1 keeps only the most frequent bigram ("a b", freq 2; ties
    // broken by gram text) — "b c" becomes OOV
    val df = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFrequencySignal(df, vocabSize = 1)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(r(1L) == ((2L, 1L, 2L, 0.5)))
    assert(r(2L) == ((1L, 1L, 2L, 0.0)))
  }

  test("gopher rules: each rule fails on its crafted document, attribution names it") {
    import spark.implicits._
    val stop = "the a of and to in is" // 7 distinct stopwords
    val good = s"$stop quick brown foxes jump over many lazy dogs today quietly"
    val docs = Seq(
      1L -> good,                                     // passes everything
      2L -> s"$stop xx",                              // 9 words < 10 -> word_count
      3L -> (stop + " aa bb cc dd ee ff gg hh"),      // mean len < 3 -> mean_word_len
      4L -> "quick brown foxes jump over many lazy dogs today quietly more words",
                                                      // no stopwords -> stopwords
      5L -> (stop + " 1111 2222 3333 4444 5555 6666 7777 8888"),
                                                      // 7/15 alpha < 80% -> alpha_words
                                                      // (4-char numbers keep mean len >= 3)
      6L -> (stop + " spam spam spam spam spam spam spam spam")
                                                      // 8/15 same token > 30% -> repetition
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs)
      .select("doc_id", "keep", "first_fail")
      .as[(Long, Boolean, Option[String])].collect()
      .map { case (k, v, f) => k -> ((v, f)) }.toMap
    assert(r(1L) == ((true, None)))
    assert(r(2L) == ((false, Some("word_count"))))
    assert(r(3L) == ((false, Some("mean_word_len"))))
    assert(r(4L) == ((false, Some("stopwords"))))
    assert(r(5L) == ((false, Some("alpha_words"))))
    assert(r(6L) == ((false, Some("repetition"))))
  }
}
