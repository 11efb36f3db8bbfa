package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(url: String): String =
    UrlOps.canonicalize(Seq(url).toDF("url")).first()
      .getAs[String]("canon_url")

  test("scheme and host lowercase; www and default ports strip") {
    assert(canonOf("HTTP://WWW.Ex.COM:80/a") == "http://ex.com/a")
    assert(canonOf("HTTPS://Ex.Com:443/a") == "https://ex.com/a")
    assert(canonOf("https://ex.com:8080/a") == "https://ex.com:8080/a")
    // :80 is only default for http
    assert(canonOf("https://ex.com:80/a") == "https://ex.com:80/a")
  }

  test("path: case kept, duplicate slashes collapse, trailing strips, root stays") {
    assert(canonOf("http://ex.com/A//B///c/") == "http://ex.com/A/B/c")
    assert(canonOf("http://ex.com/") == "http://ex.com/")
    assert(canonOf("http://ex.com") == "http://ex.com/")
  }

  test("fragment drops; utm_/ref params drop; others keep order") {
    assert(canonOf("http://ex.com/p?utm_source=x&b=2&ref=r&a=1#frag")
      == "http://ex.com/p?b=2&a=1")
    assert(canonOf("http://ex.com/p?utm_campaign=x&ref=r")
      == "http://ex.com/p")
    // a param merely PREFIXED like a tracker survives
    assert(canonOf("http://ex.com/p?refx=1&utm=2")
      == "http://ex.com/p?refx=1&utm=2")
  }

  test("hostReport: canonical dedup collapses case/port/www/tracking variants") {
    val urls = Seq(
      "HTTP://WWW.One.COM:80/x?utm_source=a",
      "http://one.com/x",
      "http://one.com/x#frag",
      "https://two.com/y",
      "https://two.com/z").toDF("url")
    val r = UrlOps.hostReport(urls).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3))).toMap
    assert(r("one.com") == ((3L, 1L, 0L)))
    assert(r("two.com") == ((2L, 2L, 0L)))
  }

  test("synthesized corpus: canonicalization achieves real dedup wins") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    val r = UrlOps.hostReport(UrlOps.synthesizeUrls(docs))
      .agg(sum("n_urls").as("n"), sum("n_distinct_canon").as("d")).first()
    assert(r.getLong(0) == 400L)
    assert(r.getLong(1) < 400L, "expected canonical collapses")
  }
}
