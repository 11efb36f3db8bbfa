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
}
