package graft.sinks

import graft.SparkSpec

/** Exercises the `bigquery` dispatch lane of [[AppendSink.append]] END TO
  * END against [[FakeBigQuerySource]] (registered as `bigquery` via
  * ServiceLoader): not just the option-map assembly, but the real
  * `format("bigquery").save()` path — proving the reference's
  * WRITE_APPEND/CREATE_IF_NEEDED dispositions (`HanaToBQ.java:258-259`)
  * arrive at the connector boundary and the rows actually flow through the
  * connector's batch write. */
class FakeBigQuerySinkSpec extends SparkSpec {
  import spark.implicits._

  test("append(..., bigquery) delivers dispositions + rows to the connector") {
    FakeBigQuerySource.reset()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    AppendSink.append(df, "proj.dataset.events", format = "bigquery")
    val opts = FakeBigQuerySource.lastWriteOptions
    assert(opts.get("table").contains("proj.dataset.events"))
    assert(opts.get("writedisposition").orElse(opts.get("writeDisposition"))
      .contains("WRITE_APPEND"))
    assert(opts.get("createdisposition").orElse(opts.get("createDisposition"))
      .contains("CREATE_IF_NEEDED"))
    assert(FakeBigQuerySource.rowsCommitted == 3L)
  }

  test("caller-supplied extra options ride along without clobbering the spec") {
    FakeBigQuerySource.reset()
    val df = Seq((1L, "x")).toDF("id", "v")
    AppendSink.append(df, "proj.dataset.t2", format = "bigquery",
      options = Map("temporaryGcsBucket" -> "staging-bucket"))
    val opts = FakeBigQuerySource.lastWriteOptions
    assert(opts.get("temporarygcsbucket").orElse(opts.get("temporaryGcsBucket"))
      .contains("staging-bucket"))
    assert(opts.get("table").contains("proj.dataset.t2"))
    assert(FakeBigQuerySource.rowsCommitted == 1L)
  }
}
