package graft.sinks

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Test-only DataSourceV2 registered under the short name `bigquery`
  * (ServiceLoader entry in src/test/resources/META-INF/services): a
  * recording fake standing in for the public spark-bigquery connector, so
  * the FULL dispatch path — `AppendSink.append(..., "bigquery")` through
  * `format("bigquery").save()` to the connector's write builder — runs in
  * the sandbox. It captures the options Spark hands the connector and
  * counts the rows that flow through the batch write, then discards them.
  */
object FakeBigQuerySource {
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  @volatile var rowsCommitted: Long = -1L

  def reset(): Unit = { lastWriteOptions = Map.empty; rowsCommitted = -1L }

  case class FakeCommit(rows: Long) extends WriterCommitMessage
}

class FakeBigQuerySource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "bigquery"
  // writes arrive with the dataframe's schema; nothing to infer
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FakeBigQueryTable(schema)
}

class FakeBigQueryTable(tableSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "fake_bigquery"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    FakeBigQuerySource.lastWriteOptions = info.options.asScala.toMap
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pInfo: PhysicalWriteInfo): DataWriterFactory =
            new DataWriterFactory {
              override def createWriter(partitionId: Int,
                                        taskId: Long): DataWriter[InternalRow] =
                new DataWriter[InternalRow] {
                  private var n = 0L
                  override def write(record: InternalRow): Unit = n += 1
                  override def commit(): WriterCommitMessage =
                    FakeBigQuerySource.FakeCommit(n)
                  override def abort(): Unit = ()
                  override def close(): Unit = ()
                }
            }
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            FakeBigQuerySource.rowsCommitted =
              messages.map { case FakeBigQuerySource.FakeCommit(n) => n }.sum
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}
