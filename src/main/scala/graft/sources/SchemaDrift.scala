package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution resolver for multi-batch lake ingests — the reality a
  * recurring pipeline meets after a few producer releases: early batches
  * miss columns that were added later, and narrow numeric types get
  * widened (INT -> BIGINT, FLOAT -> DOUBLE). The reference pins a single
  * remote schema per run (its type map is fail-closed, `core.HanaTypes`);
  * this is the companion for the ACCUMULATED output of many runs.
  *
  * Design: each batch is read with its OWN schema (one footer read — no
  * row-scan inference) and aligned to the caller's target schema by
  * explicit rules: missing columns null-fill, UPCASTS (intra-family
  * widenings) apply, extra columns drop, and any NARROWING or cross-family
  * change throws — fail-closed like the reference's type map, because a
  * silent downcast corrupts data at scale. The union is by name.
  *
  * Scale shape: alignment is a per-batch projection (zero exchange); the
  * union concatenates scans, so pushdown/pruning still reach each batch's
  * parquet reader. The drift REPORT touches only schemas — no data pass. */
object SchemaDrift {

  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType | ShortType | IntegerType, LongType) => true
    case (ByteType | ShortType, IntegerType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Project `df` onto `target`: upcast present columns, null-fill missing
    * ones, drop extras. Throws on any non-widening type change. */
  def alignToSchema(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      present.get(f.name) match {
        case Some(dt) if widens(dt, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) =>
          throw new IllegalArgumentException(
            s"refusing non-widening evolution for ${f.name}: $dt -> ${f.dataType}")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Read every batch path with its own schema, align each to `target`,
    * union by name. */
  def readEvolved(spark: SparkSession, paths: Seq[String],
                  target: StructType): DataFrame =
    paths.map(p => alignToSchema(spark.read.parquet(p), target))
      .reduce(_ unionByName _)

  /** Schema-only drift report: one row per batch with its missing / extra /
    * widened columns vs `target` (comma-joined, name-sorted). */
  def driftReport(spark: SparkSession, paths: Seq[String],
                  target: StructType): DataFrame = {
    import spark.implicits._
    val tgt = target.fields.map(f => f.name -> f.dataType).toMap
    paths.map { p =>
      val sch = spark.read.parquet(p).schema
      val present = sch.fields.map(f => f.name -> f.dataType).toMap
      val missing = tgt.keySet.diff(present.keySet).toSeq.sorted
      val extra = present.keySet.diff(tgt.keySet).toSeq.sorted
      val widened = tgt.keySet.intersect(present.keySet).toSeq.sorted
        .filter(n => present(n) != tgt(n) && widens(present(n), tgt(n)))
      (new Path(p).getName, missing.mkString(","), extra.mkString(","),
        widened.mkString(","))
    }.toDF("batch", "missing_cols", "extra_cols", "widened_cols")
  }

  /** Evidence query: two drifted batches of `orders` (an early one with an
    * INT key, FLOAT price and no clerk column; a later one at the target
    * types with an extra producer-debug column), resolved to one relation
    * and aggregated per batch — the oracle recomputes from the ORIGINAL
    * parquet, so value equality proves the widening path (including the
    * float truncation the early batch really suffered) and the null-fill. */
  def roundtripAgg(spark: SparkSession, dir: String): DataFrame = {
    val out = "/tmp/graft_schema_drift"
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(out), true)
    val orders = Tables.orders(spark, dir)

    // early batch: narrow types, clerk not yet emitted
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey").cast("int").as("o_orderkey"),
        col("o_custkey").cast("int").as("o_custkey"),
        col("o_totalprice").cast("float").as("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/batch1")
    // later batch: target types, plus a producer-debug extra column
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"), col("o_orderstatus"),
        lit("debug").as("producer_tag"))
      .write.mode("overwrite").parquet(s"$out/batch2")

    val target = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType),
      StructField("o_orderstatus", StringType)))
    readEvolved(spark, Seq(s"$out/batch1", s"$out/batch2"), target)
      .groupBy(pmod(col("o_orderkey"), lit(2)).as("batch_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("sum_keys"),
        // rounding-free price evidence: floor-sum + extremes carry the
        // float truncation exactly (a re-rounded decimal sum would trip
        // the engines' different half-rounding on exact .005 floats)
        sum(floor(col("o_totalprice")).cast("long")).as("sum_price_floor"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
          .as("n_null_status"))
      .orderBy("batch_mod")
  }
}
