package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector — the sink half of the source-extension
  * surface (SURVEY §2.1): an audit sink that runs the full V2 commit
  * protocol. Each task's `DataWriter` accumulates a partial
  * (row count, xor of the first column) and emits it as its
  * `WriterCommitMessage`; the driver-side `BatchWrite.commit` aggregates
  * the partials into the committed audit record — exactly the
  * two-phase-commit shape a real transactional sink (e.g. a warehouse
  * MERGE target) uses, with the job atomically visible only after
  * `commit`. `abort` drops the partials; nothing partial ever publishes.
  *
  * The audited (count, xor) pair is the same reconciliation triple core
  * `TableDiff` uses — so a write through this sink is cross-checkable
  * against any engine's scan of the same data (the q155 oracle).
  *
  * Usage: `df.write.format("graft-audit").option("tag", t).mode("append")
  * .save()`; committed results via [[AuditSink.committed]](t). */
class AuditSink extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-audit"

  // write-only: schema comes from the frame being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val tag = new CaseInsensitiveStringMap(properties).get("tag")
    require(tag != null && tag.nonEmpty, "graft-audit requires option(\"tag\", ...)")
    new AuditTable(tag, schema)
  }
}

object AuditSink {
  /** tag → (rows, xor of column 0) for every COMMITTED write job. */
  private val results = new ConcurrentHashMap[String, (Long, Long)]()
  def committed(tag: String): Option[(Long, Long)] = Option(results.get(tag))
  private[sources] def publish(tag: String, rows: Long, xor: Long): Unit =
    results.put(tag, (rows, xor))
}

private[sources] class AuditTable(tag: String, schema0: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_audit($tag)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().nonEmpty && info.schema().head.dataType == LongType,
      s"graft-audit expects a BIGINT first column to checksum, got ${info.schema().simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(tag)
      }
    }
  }
}

private[sources] case class AuditPartial(rows: Long, xor: Long)
  extends WriterCommitMessage

private[sources] class AuditBatchWrite(tag: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory

  /** Driver-side commit: the job becomes visible atomically, as ONE
    * aggregated record — the two-phase-commit contract. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val parts = messages.map(_.asInstanceOf[AuditPartial])
    AuditSink.publish(tag, parts.map(_.rows).sum,
      parts.foldLeft(0L)(_ ^ _.xor))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class AuditWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter
}

private[sources] class AuditWriter extends DataWriter[InternalRow] {
  private var rows = 0L
  private var xor = 0L
  override def write(record: InternalRow): Unit = {
    rows += 1
    xor ^= record.getLong(0)
  }
  override def commit(): WriterCommitMessage = AuditPartial(rows, xor)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
