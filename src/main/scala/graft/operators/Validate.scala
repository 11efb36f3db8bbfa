package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality validation — the gate a pipeline runs before anything else:
  * each rule is an aggregate producing a violation count, all unioned into
  * one small report. Rules are plain Catalyst expressions, so the whole
  * report is a handful of scans with partial aggregation (several rules over
  * the same table fuse into one pass via a single select of conditional
  * counts where possible). */
object Validate {

  /** Violation report over the fixture star schema:
    *  - null / uniqueness constraints on keys
    *  - range constraints on measures
    *  - derived-column consistency (documents.n_chars vs length(text))
    *  - referential integrity lineitem.l_orderkey -> orders.o_orderkey */
  def report(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val docs = Tables.documents(spark, dir)

    // single-pass conditional counts per table
    val liChecks = li.select(
      count(when(col("l_orderkey").isNull, 1)).as("li_orderkey_null"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)).as("li_discount_range"),
      count(when(col("l_quantity") <= 0, 1)).as("li_quantity_nonpos"),
      count(when(col("l_shipdate").isNull, 1)).as("li_shipdate_null"))
    val docChecks = docs.select(
      count(when(col("n_chars") =!= length(col("text")), 1)).as("doc_nchars_mismatch"),
      count(when(col("lang").isNull || !col("lang").isin("en", "de", "fr", "es", "zh"), 1))
        .as("doc_lang_domain"))
    // uniqueness: rows minus distinct keys
    val ordDup = ord.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("ord_orderkey_dup"))
    // referential integrity: fact keys with no parent
    val orphan = li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("li_orphan_orderkey"))

    def melt(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.select(explode(array(cols.toIndexedSeq.map(c =>
        struct(lit(c).as("rule"), col(c).cast("long").as("n_violations"))): _*)).as("kv"))
        .select(col("kv.rule").as("rule"), col("kv.n_violations").as("n_violations"))
    }
    melt(liChecks).unionAll(melt(docChecks)).unionAll(melt(ordDup))
      .unionAll(melt(orphan))
      .orderBy("rule")
  }
}
