package graft.sinks

import graft.SparkSpec

/** `snk_bq_append` seam (`HanaToBQ.java:256-259`): the BigQuery write spec is
  * assembled and checkable without a live BigQuery — a connected environment
  * flips only `format`. */
class AppendSinkSpec extends SparkSpec {

  test("bigquery spec carries the reference's dispositions and the destination") {
    val spec = AppendSink.bigQuerySpec("dest_dataset.events")
    assert(spec("table") == "dest_dataset.events")
    assert(spec("writeDisposition") == "WRITE_APPEND")       // HanaToBQ.java:258
    assert(spec("createDisposition") == "CREATE_IF_NEEDED")  // HanaToBQ.java:259
  }

  test("the EXACT option map handed to format(\"bigquery\") — nothing more, nothing less") {
    // the one seam no sandbox run can exercise live; this pins the full
    // contract so a connected environment differs ONLY in `format`
    assert(AppendSink.bigQuerySpec("proj.dataset.table") == Map(
      "table" -> "proj.dataset.table",
      "writeDisposition" -> "WRITE_APPEND",      // HanaToBQ.java:258
      "createDisposition" -> "CREATE_IF_NEEDED"  // HanaToBQ.java:259
    ))
  }

  test("caller options pass through (and may override) the spec") {
    val spec = AppendSink.bigQuerySpec("d.t",
      Map("temporaryGcsBucket" -> "stage-bucket", "writeMethod" -> "indirect"))
    assert(spec("temporaryGcsBucket") == "stage-bucket")
    assert(spec("writeMethod") == "indirect")
    assert(spec("writeDisposition") == "WRITE_APPEND")
  }

  test("unknown sink format fails fast") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      AppendSink.append(df, "/tmp/nope", format = "avro")
    }
    assert(e.getMessage.contains("Unknown sink format"))
  }

  test("parquet format dispatch appends and round-trips") {
    import spark.implicits._
    val dest = java.nio.file.Files
      .createTempDirectory("graft_append").toString + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    AppendSink.append(df, dest)              // create-if-needed
    AppendSink.append(df, dest)              // append
    assert(AppendSink.readBack(spark, dest).count() == 4L)
  }

  test("idempotent sink: replayed batches are no-ops, partials invisible") {
    import spark.implicits._
    val dest = java.nio.file.Files
      .createTempDirectory("graft_idem").toString + "/t"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b2 = Seq((3L, "c")).toDF("id", "v")
    assert(AppendSink.appendIdempotent(b1, dest, 1L))       // first write
    assert(!AppendSink.appendIdempotent(b1, dest, 1L))      // replay: no-op
    assert(AppendSink.readCommitted(spark, dest).count() == 2L)
    assert(AppendSink.appendIdempotent(b2, dest, 2L))
    assert(AppendSink.readCommitted(spark, dest).count() == 3L)
    // a crash between data and marker: uncommitted dir exists but readers
    // never see it, and the retry overwrites (not duplicates) it
    b2.write.mode("overwrite").parquet(s"$dest/__batch_id=3")
    assert(AppendSink.readCommitted(spark, dest).count() == 3L)
    assert(AppendSink.appendIdempotent(b2, dest, 3L))       // retry commits
    assert(AppendSink.readCommitted(spark, dest).count() == 4L)
  }

  test("idempotent sink: crash DURING marker write replays as a no-op") {
    import spark.implicits._
    val dest = java.nio.file.Files
      .createTempDirectory("graft_idem_marker").toString + "/t"
    val b = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    // the marker is a zero-byte file created strictly AFTER the data
    // commit, so a crash mid-marker-write leaves exactly this state: data
    // complete, marker present but written by a process that died before
    // returning. Simulate it by hand instead of going through
    // appendIdempotent.
    b.write.mode("overwrite").parquet(s"$dest/__batch_id=7")
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dest/_committed_batch_7"), true).close()
    // the data was durable before the marker write began, so the batch IS
    // committed: the orchestrator's replay must be a no-op (no duplicate
    // write) and readers must see the rows exactly once
    assert(!AppendSink.appendIdempotent(b, dest, 7L))
    val got = AppendSink.readCommitted(spark, dest)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
    // and a LATER batch still lands normally next to the replayed one
    assert(AppendSink.appendIdempotent(b, dest, 8L))
    assert(AppendSink.readCommitted(spark, dest).count() == 4L)
  }
}
