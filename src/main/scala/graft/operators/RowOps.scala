package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row-level projections / filters from SURVEY.md §2.2 — the semantics the
  * reference implements in `HanaDBRowToTableRowFn` (per-row interpreted Java
  * loop) and in its pushed-down SQL templates, re-expressed as Catalyst
  * column expressions (whole-stage codegen, no per-row interpretation).
  */
object RowOps {

  /** `proj_stringify` (`HanaDBRowToTableRowFn.java:27-36`): every field to its
    * string form, keeping names. Spark `cast(string)` stands in for Java
    * `toString()` (divergences on decimals/timestamps documented SURVEY.md §7.4). */
  def stringifyAll(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => col(c).cast(StringType).as(c)): _*)

  /** `filt_null_literal` (`HanaDBRowToTableRowFn.java:33-35`): a value whose
    * string form is case-insensitively "null" is dropped (becomes SQL NULL).
    * Reproduced exactly, as a separate opt-in op — it silently nulls a real
    * string "NULL" (data-corruption footgun flagged in SURVEY.md §2.2). SQL
    * NULLs stay NULL (`filt_null_drop` `:31-32` — a TableRow key omission in
    * the ref, semantically identical to a NULL column after load). */
  def nullLiteralToNull(c: Column): Column =
    when(lower(c.cast(StringType)) === "null", lit(null).cast(StringType))
      .otherwise(c.cast(StringType))

  def dropNullLiterals(df: DataFrame, cols: Seq[String]): DataFrame = {
    val set = cols.toSet
    df.select(df.columns.toIndexedSeq.map { c =>
      if (set(c)) nullLiteralToNull(col(c)).as(c) else col(c)
    }: _*)
  }

  /** `pred_range_halfopen` (`HanaToBQ.java:58`): the per-chunk half-open
    * range predicate `ts >= lo AND ts < hi`. Catalyst pushes it into the
    * parquet row-group / JDBC scan. */
  def rangeHalfOpen(df: DataFrame, ts: String, lo: Column, hi: Column): DataFrame =
    df.filter(col(ts) >= lo && col(ts) < hi)

  /** `pred_gt` (`HanaToBQ.java:57`): strict lower bound. */
  def greaterThan(df: DataFrame, ts: String, start: Column): DataFrame =
    df.filter(col(ts) > start)

  /** `proj_columns` (`HanaToBQ.java:57`): explicit column-list projection. */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
}
