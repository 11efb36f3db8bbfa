package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization a web-corpus pipeline runs
  * before URL-keyed dedup, host-level curation policy, and crawl-frontier
  * accounting. Two raw URLs that differ only in scheme/host case, default
  * ports, `www.`, duplicate path slashes, trailing slash, fragments, or
  * tracking parameters are the SAME document key; canonicalizing before
  * the dedup groupBy is what turns "distinct by raw string" into
  * "distinct by resource".
  *
  * Rules (RFC 3986 normalization plus the tracking-param scrub every
  * crawler applies): scheme and host lowercase; `www.` stripped; default
  * ports (http:80, https:443) dropped, others kept; path keeps its case
  * (paths are case-sensitive), duplicate slashes collapse, trailing slash
  * strips (root stays `/`); fragment drops; `utm_*` / `ref=` query params
  * drop, remaining params keep their original order.
  *
  * Everything is a zero-exchange narrow projection of RE2-portable
  * regexes (no lookaround, no backreferences) — the DuckDB oracle runs
  * the same patterns, and the whole chain stays inside whole-stage
  * codegen. */
object UrlOps {

  /** Adds `scheme`, `host`, `port` (empty when dropped), `canon_url`. */
  def canonicalize(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val scheme = lower(regexp_extract(col(urlCol), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^([^/?#]+)", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
    val rawPort = regexp_extract(hostport, ":([0-9]+)$", 1)
    val port = when(
      (scheme === "http" && rawPort === "80") ||
        (scheme === "https" && rawPort === "443"), lit(""))
      .otherwise(rawPort)
    val pq = regexp_replace(rest, "^[^/?#]+", "")
    val path0 = regexp_replace(
      regexp_extract(pq, "^([^?#]*)", 1), "/{2,}", "/")
    val path = when(length(path0) === 0, lit("/"))
      .when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = array_join(
      filter(split(regexp_extract(pq, "[?]([^#]*)", 1), "&"), p =>
        length(p) > 0 && substring(p, 1, 4) =!= "utm_" &&
          substring(p, 1, 4) =!= "ref="), "&")
    df.withColumn("scheme", scheme)
      .withColumn("host", host)
      .withColumn("port", port)
      .withColumn("canon_url", concat(
        scheme, lit("://"), host,
        when(port === "", lit("")).otherwise(concat(lit(":"), port)),
        path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Host-grain canonicalization report: raw vs canonical-distinct URL
    * counts (the dedup win), and how many URLs kept a non-default port. */
  def hostReport(df: DataFrame, urlCol: String = "url"): DataFrame =
    canonicalize(df, urlCol)
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canon_url")).as("n_distinct_canon"),
        sum(when(col("port") =!= "", 1L).otherwise(0L)).as("n_with_port"))
      .orderBy("host")

  /** Deterministic messy-URL synthesis from the doc id — upper/lower case
    * churn, www., default and non-default ports, duplicate slashes,
    * trailing slashes, tracking params and fragments, all keyed off the id
    * so the oracle rebuilds the identical strings. Hosts cycle mod 5 so
    * canonicalization produces REAL collapses: ids 10 apart share every
    * canonical component (host, scheme, port, path, surviving params)
    * while their raw strings differ in case, www., trailing slash and
    * fragment. */
  def synthesizeUrls(df: DataFrame, id: String = "doc_id"): DataFrame =
    df.withColumn("url", concat(
      when(pmod(col(id), lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://"),
      when(pmod(col(id), lit(3)) === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), pmod(col(id), lit(5)), lit(".Example.COM"),
      when(pmod(col(id), lit(2)) === 0, lit(":80"))
        .otherwise(when(pmod(col(id), lit(5)) === 0, lit(":8080"))
          .otherwise(lit(":443"))),
      lit("/Docs//Item/"), expr(s"cast($id as bigint) div 20"),
      when(pmod(col(id), lit(4)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&id="), pmod(col(id), lit(10)),
      lit("&ref=track#Sec"), pmod(col(id), lit(7))))
}
