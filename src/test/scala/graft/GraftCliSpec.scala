package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.core.GraftConfig
import graft.sinks.AppendSink

/** CLI surface parity (`HanaToBQ.java:175-228`, `README:20-35`): the
  * reference's 10 `--flag=value` args with `withValidation` semantics, driven
  * end-to-end against embedded Derby as the JDBC stand-in. */
class GraftCliSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftcli;create=true"

  private def setupTable(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE SRC") catch { case _: Exception => () }
      st.execute("CREATE TABLE SRC (TS BIGINT NOT NULL, ID BIGINT NOT NULL, VAL VARCHAR(20))")
      val ps = conn.prepareStatement("INSERT INTO SRC VALUES (?, ?, ?)")
      (0 until 1000).foreach { i =>
        ps.setLong(1, (i * 7919L) % 5000L)
        ps.setLong(2, i.toLong)
        // plant the "null"-literal quirk (HanaDBRowToTableRowFn.java:33-35)
        ps.setString(3, if (i % 100 == 0) "NULL" else s"v$i")
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  /** The README's own invocation (`README:22-34`), verbatim shape: runner and
    * staging flags included, every pipeline option present. */
  private def readmeArgs(dest: String): Seq[String] = Seq(
    "--tempLocation=gs://my-bucket/temp",
    "--runner=DataflowRunner",
    "--project=my-project-id",
    "--stagingLocation=gs://my-bucket/staging",
    s"--connectionString=$url",
    "--tableName=SRC",
    "--username=app",
    "--password=secret",
    s"--destDataset=$dest",
    "--timestampColumn=TS",
    "--startTime=-1",
    "--endTime=2000000000",
    "--chunkSize=250",
    "--driver=org.apache.derby.jdbc.EmbeddedDriver")

  test("README arg list parses; runner/staging flags accepted as unknown, not fatal") {
    val p = GraftCli.parse(readmeArgs("/tmp/unused"))
    assert(p.cfg.tableName == "SRC")
    assert(p.cfg.username == "app" && p.cfg.password == "secret")
    assert(p.cfg.timestampColumn == "TS")
    assert(p.cfg.startTime == -1L)
    assert(p.cfg.endTime.contains(2000000000L))
    assert(p.cfg.chunkSize == 250L)
    assert(p.sinkFormat == "parquet")
    assert(p.unknown.keySet ==
      Set("tempLocation", "runner", "project", "stagingLocation"))
  }

  test("defaults mirror @Default: driver and chunkSize; endTime optional (dead in ref)") {
    val p = GraftCli.parse(Seq("--tableName=T", "--connectionString=x",
      "--username=u", "--password=p", "--destDataset=d",
      "--timestampColumn=TS", "--startTime=0"))
    assert(p.cfg.driver == "com.sap.db.jdbc.Driver")   // HanaToBQ.java:196-199
    assert(p.cfg.chunkSize == 1000000L)                // HanaToBQ.java:220-223
    assert(p.cfg.endTime.isEmpty)
    assert(p.cfg.effectiveEnd == GraftConfig.Sentinel) // HanaToBQ.java:166
  }

  test("missing required flags fail validation naming every missing flag") {
    val e = intercept[IllegalArgumentException] {
      GraftCli.parse(Seq("--tableName=T", "--startTime=5"))
    }
    assert(e.getMessage.startsWith("Missing required value for ["))
    Seq("--connectionString", "--username", "--password", "--destDataset",
      "--timestampColumn").foreach(f => assert(e.getMessage.contains(f), f))
    assert(!e.getMessage.contains("--tableName"))
    assert(!e.getMessage.contains("--startTime"))
  }

  test("malformed values fail fast: non-integer startTime, bad flag shape, bad chunkSize") {
    val base = Seq("--tableName=T", "--connectionString=x", "--username=u",
      "--password=p", "--destDataset=d", "--timestampColumn=TS")
    val e1 = intercept[IllegalArgumentException] {
      GraftCli.parse(base :+ "--startTime=tomorrow")
    }
    assert(e1.getMessage.contains("--startTime must be an integer"))
    val e2 = intercept[IllegalArgumentException] {
      GraftCli.parse(Seq("-tableName", "T"))
    }
    assert(e2.getMessage.contains("not of the form --flag=value"))
    val e3 = intercept[IllegalArgumentException] {
      GraftCli.parse((base :+ "--startTime=0") :+ "--chunkSize=0")
    }
    assert(e3.getMessage.contains("--chunkSize must be positive"))
  }

  test("end-to-end: README invocation against Derby — chunked read, stringify, null-literal drop, append") {
    setupTable()
    val dest = Files.createTempDirectory("graft_cli_sink").toString + "/out"
    val p = GraftCli.parse(readmeArgs(dest))
    val n = GraftCli.run(spark, p)
    assert(n == 1000L)
    val back = AppendSink.readBack(spark, dest)
    assert(back.count() == 1000L)
    assert(back.columns.toSeq == Seq("TS", "ID", "VAL"))
    // stringify stage: every sink column lands as string
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    // "null"-literal drop: the 10 planted "NULL" strings arrive as SQL NULL
    assert(back.filter(back("VAL").isNull).count() == 10L)
    assert(back.filter(back("VAL") === "NULL").count() == 0L)
  }

  test("sinkFormat=table routes through saveAsTable and counts the table") {
    setupTable()
    val p = GraftCli.parse(
      readmeArgs("graft_cli_table_sink") :+ s"--${GraftCli.SinkFormatFlag}=table")
    try {
      val n = GraftCli.run(spark, p)
      assert(n == 1000L)
      assert(spark.table("graft_cli_table_sink").count() == 1000L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_cli_table_sink")
  }

  test("jdbc vs parquet dispatch keys off the connection string scheme") {
    val jdbc = GraftCli.parse(readmeArgs("/tmp/unused"))
    assert(jdbc.cfg.connectionString.startsWith("jdbc:"))
    val pq = GraftCli.parse(Seq("--tableName=lineitem",
      s"--connectionString=$sf", "--username=u", "--password=p",
      "--destDataset=/tmp/unused", "--timestampColumn=ts_epoch",
      "--startTime=0"))
    assert(!pq.cfg.connectionString.startsWith("jdbc:"))
  }
}
