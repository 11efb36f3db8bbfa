package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.{GraftConfig, HanaTypes}
import graft.operators.Chunking

/** End-to-end test of `src_jdbc_partitioned` against an embedded Derby
  * database (ships with Spark) — the closest offline stand-in for the
  * reference's HANA source: a table with a numeric timestamp column, read in
  * parallel half-open range chunks, one partition per predicate
  * (`HanaToDBRow.java:80-112` semantics). */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def setupTable(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE SRC") catch { case _: Exception => () }
      st.execute("CREATE TABLE SRC (TS BIGINT NOT NULL, ID BIGINT NOT NULL, VAL VARCHAR(20))")
      val ps = conn.prepareStatement("INSERT INTO SRC VALUES (?, ?, ?)")
      (0 until 1000).foreach { i =>
        ps.setLong(1, (i * 7919L) % 5000L) // scattered timestamps
        ps.setLong(2, i.toLong)
        ps.setString(3, s"v$i")
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  private def cfg = GraftConfig(
    tableName = "SRC", connectionString = url,
    driver = "org.apache.derby.jdbc.EmbeddedDriver",
    timestampColumn = "TS", startTime = 0L, chunkSize = 250L)

  test("partitioned JDBC read: one Spark partition per chunk, full coverage, schema discovered") {
    setupTable()
    val intervals = Seq((0L, 1250L), (1250L, 2500L), (2500L, 3750L),
      (3750L, GraftConfig.Sentinel))
    val df = JdbcPartitionedSource.read(spark, cfg, intervals)
    assert(df.rdd.getNumPartitions == 4)                  // chunk-per-partition
    assert(df.columns.toSeq == Seq("TS", "ID", "VAL"))    // driver-side resolveTable
    assert(df.count() == 1000L)                           // half-open chunks partition the data
    // rows with TS == 0 are in chunk 1 (lo inclusive); sentinel closes the top
    val perPart = df.withColumn("p", spark_partition_id())
      .groupBy("p").count().orderBy("p").collect().map(_.getLong(1))
    assert(perPart.sum == 1000L && perPart.forall(_ > 0))
  }

  test("chunk plan computed on the JDBC source feeds back as predicates (end-to-end loop)") {
    setupTable()
    // discover boundaries from the source itself, as the reference does
    val whole = JdbcPartitionedSource.read(spark, cfg, Seq((0L, GraftConfig.Sentinel)))
    val bounds = Chunking.boundaries(
      whole.withColumn("ts_epoch", col("TS")), "ts_epoch", Seq("ID"), 250L, -1L)
      .collect().map(_.getLong(0))
    val ivs = (Seq(-1L) ++ bounds).zip(bounds ++ Seq(GraftConfig.Sentinel))
      .map { case (lo, hi) => (lo + 1, hi + 1) } // shift: ref uses ts > start, read uses ts >= lo
    val df = JdbcPartitionedSource.read(spark, cfg, ivs)
    assert(df.count() == 1000L)
    assert(df.rdd.getNumPartitions == bounds.length + 1)
  }

  test("catalog fetch rejects non-identifier table names (injection guard)") {
    val e = intercept[IllegalArgumentException] {
      JdbcPartitionedSource.fetchCatalog(
        cfg.copy(tableName = "SRC'; DROP TABLE SRC--"))
    }
    assert(e.getMessage.contains("not a plain identifier"))
  }

  test("introspect applies the reference type map with fail-closed unknowns") {
    val schema = JdbcPartitionedSource.introspect(
      Seq("TS" -> "BIGINT", "VAL" -> "NVARCHAR"))
    assert(schema.fieldNames.toSeq == Seq("TS", "VAL"))
    intercept[IllegalArgumentException] {
      JdbcPartitionedSource.introspect(Seq("G" -> "ST_GEOMETRY"))
    }
  }

  // ---- HANA-dialect conformance (SURVEY §2.3 quirk + §3.2 subtlety a) ----
  // The reference's chunk query template uses %2$S — CAPITAL S — which
  // String.format-UPPERCASES the table name (HanaToBQ.java:57). Fine for
  // HANA's case-insensitive unquoted identifiers; breaking for quoted
  // case-sensitive ones. Derby reproduces the breakage; our engine passes
  // identifiers verbatim (quoted names round-trip).
  test("dialect quirk: %2$S-style uppercasing breaks quoted identifiers; " +
      "verbatim pass-through reads them (HanaToBQ.java:57)") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE \"src_lower\"") catch { case _: Exception => () }
      st.execute("CREATE TABLE \"src_lower\" (TS BIGINT NOT NULL, ID BIGINT NOT NULL)")
      st.execute("INSERT INTO \"src_lower\" VALUES (5, 1), (15, 2)")
      st.close()
    } finally conn.close()
    // the reference's behavior: "%2$S".format-style uppercase of the name —
    // a quoted lowercase identifier no longer resolves
    val upper = "\"src_lower\"".toUpperCase // what %2$S does to the template
    val broken = intercept[Exception] {
      JdbcPartitionedSource.read(spark,
        cfg.copy(tableName = upper), Seq((0L, GraftConfig.Sentinel))).count()
    }
    assert(broken.getMessage != null)
    // our engine: the identifier reaches the source verbatim
    val ok = JdbcPartitionedSource.read(spark,
      cfg.copy(tableName = "\"src_lower\""), Seq((0L, GraftConfig.Sentinel)))
    assert(ok.count() == 2L)
  }

  // §3.2 subtlety (a): the reference binds chunk bounds with setString
  // against a NUMERIC timestamp column (HanaToDBRow.java:108-109), leaning
  // on engine implicit coercion — digit-strings happen to work, anything
  // else is a runtime SQLException the type system never saw. Our engine
  // emits typed numeric literals in the partition predicates, so the
  // failure mode is unreachable. Derby reproduces both sides.
  test("dialect subtlety: string-bound numeric parameters coerce for digit-" +
      "strings and explode otherwise; typed predicates can't (HanaToDBRow.java:108-109)") {
    setupTable()
    val typedCount = JdbcPartitionedSource.read(spark, cfg, Seq((10L, 2000L)))
      .count()
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        "SELECT COUNT(*) FROM SRC WHERE TS >= ? AND TS < ?")
      // the reference's binding style: digit-strings coerce
      ps.setString(1, "10"); ps.setString(2, "2000")
      val rs = ps.executeQuery(); rs.next()
      assert(rs.getLong(1) == typedCount,
        "digit-string coercion must agree with the typed predicate")
      rs.close()
      // the hazard the typed path can't hit: a non-numeric bound is a
      // RUNTIME error on the worker, per-chunk, after the plan shipped
      // (Derby rejects at bind time; HANA at execute — either way the type
      // system never saw it)
      intercept[java.sql.SQLException] {
        ps.setString(1, "ten"); ps.setString(2, "2000")
        ps.executeQuery()
      }
      ps.close()
    } finally conn.close()
  }
}
