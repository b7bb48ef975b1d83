package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 read connector for a deterministic synthetic grid table —
  * the source-EXTENSION surface beyond the file formats (SURVEY §2.1): a
  * `TableProvider` whose `ScanBuilder` does real filter pushdown
  * ([[org.apache.spark.sql.sources.Filter]] bounds on `i`/`j` tighten the
  * generation ranges — nothing filtered rowside is ever produced) and
  * column pruning (readers emit only the projected fields), and whose
  * `Batch` plans one `InputPartition` per surviving i-band — pushed
  * i-bounds PRUNE partitions before they are scheduled, the DSv2 analogue
  * of parquet row-group pruning.
  *
  * Table: `i` in [0, rows), `j` in [0, cols), payload
  * `v = (31·i + 17·j) mod 100` — pure integer arithmetic any engine
  * replays exactly.
  *
  * Usage: `spark.read.format("graft-grid").option("rows", n)
  * .option("cols", m).load()` (short name via `DataSourceRegister`). */
class GridSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-grid"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GridTable(opts.getLong("rows", 256L), opts.getLong("cols", 256L),
      opts.getInt("bands", 16))
  }
}

object GridSource {
  val Schema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  def payload(i: Long, j: Long): Long = (31L * i + 17L * j) % 100L

  /** Partitions planned by the LAST scan — observability hook the
    * partition-pruning spec asserts against (test-only; writes are
    * driver-side in `planInputPartitions`). */
  val lastPlannedPartitions = new AtomicInteger(-1)
}

private[sources] class GridTable(rows: Long, cols: Long, bands: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_grid(${rows}x$cols)"
  override def schema(): StructType = GridSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(rows, cols, bands)
}

private[sources] class GridScanBuilder(rows: Long, cols: Long, bands: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  // generation bounds, tightened by pushed filters: [iLo, iHi) × [jLo, jHi)
  private var iLo = 0L
  private var iHi = rows
  private var jLo = 0L
  private var jHi = cols
  private var pushed = Array.empty[Filter]
  private var required: StructType = GridSource.Schema

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  /** A bound filter on i/j is FULLY absorbed into the generation range —
    * accepted filters never reach a row that violates them, so they are
    * not returned as residual. Everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot { f =>
      val absorbed = f match {
        case GreaterThanOrEqual(c, v) => asLong(v).exists { x =>
          c match {
            case "i" => iLo = math.max(iLo, x); true
            case "j" => jLo = math.max(jLo, x); true
            case _ => false
          }
        }
        case GreaterThan(c, v) => asLong(v).exists { x =>
          c match {
            case "i" => iLo = math.max(iLo, x + 1); true
            case "j" => jLo = math.max(jLo, x + 1); true
            case _ => false
          }
        }
        case LessThan(c, v) => asLong(v).exists { x =>
          c match {
            case "i" => iHi = math.min(iHi, x); true
            case "j" => jHi = math.min(jHi, x); true
            case _ => false
          }
        }
        case LessThanOrEqual(c, v) => asLong(v).exists { x =>
          c match {
            case "i" => iHi = math.min(iHi, x + 1); true
            case "j" => jHi = math.min(jHi, x + 1); true
            case _ => false
          }
        }
        case EqualTo(c, v) => asLong(v).exists { x =>
          c match {
            case "i" => iLo = math.max(iLo, x); iHi = math.min(iHi, x + 1); true
            case "j" => jLo = math.max(jLo, x); jHi = math.min(jHi, x + 1); true
            case _ => false
          }
        }
        case _ => false
      }
      if (absorbed) pushed :+= f
      absorbed
    }
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GridScan(iLo, iHi, jLo, jHi, bands, rows, required)
}

private[sources] class GridScan(iLo: Long, iHi: Long, jLo: Long, jHi: Long,
                                bands: Int, rows: Long, required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-grid i=[$iLo,$iHi) j=[$jLo,$jHi) cols=[${required.fieldNames.mkString(",")}]"

  /** One partition per i-band that SURVIVES the pushed i-bounds — pruning
    * happens here, before any task is scheduled. */
  override def planInputPartitions(): Array[InputPartition] = {
    val bandSize = math.max(1L, (rows + bands - 1) / bands)
    val parts = (0L until rows by bandSize).flatMap { lo =>
      val hi = math.min(lo + bandSize, rows)
      val clLo = math.max(lo, iLo)
      val clHi = math.min(hi, iHi)
      if (clLo < clHi && jLo < jHi) Some(GridPartition(clLo, clHi, jLo, jHi))
      else None
    }.toArray[InputPartition]
    GridSource.lastPlannedPartitions.set(parts.length)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(required)

  /** MICRO_BATCH_READ path: the same (filter-tightened, column-pruned)
    * grid emitted as a stream of i-row chunks — a CUSTOM streaming source
    * with a real `Offset` protocol (offset = next unemitted i). Implements
    * `SupportsTriggerAvailableNow`, so an AvailableNow run drains
    * [iLo, iHi) across ⌈range/chunk⌉ micro-batches and stops — the
    * multi-batch shape is deterministic because chunking never changes
    * WHAT is emitted, only how it is sliced. */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GridStream(iLo, iHi, jLo, jHi, math.max(1L, (iHi - iLo) / 4), required)
}

private[sources] case class GridOffset(i: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = i.toString
}

private[sources] class GridStream(iLo: Long, iHi: Long, jLo: Long, jHi: Long,
                                  chunk: Long, required: StructType)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // all data is "available" up front; AvailableNow drains to this bound
  private val endBound = math.max(iLo, iHi)

  override def initialOffset(): Offset = GridOffset(iLo)
  override def deserializeOffset(json: String): Offset = GridOffset(json.toLong)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = GridOffset(endBound)

  /** Admission control: each planning round admits one chunk past `start`
    * — a genuine stateless multi-batch drain, not a single catch-all
    * batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    GridOffset(math.min(endBound, start.asInstanceOf[GridOffset].i + chunk))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GridOffset].i
    val hi = end.asInstanceOf[GridOffset].i
    if (lo < hi && jLo < jHi) Array(GridPartition(lo, hi, jLo, jHi))
    else Array.empty
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class GridPartition(iLo: Long, iHi: Long,
                                          jLo: Long, jHi: Long) extends InputPartition

private[sources] class GridReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GridReader(partition.asInstanceOf[GridPartition], required)
}

private[sources] class GridReader(p: GridPartition, required: StructType)
  extends PartitionReader[InternalRow] {

  // projectors resolved ONCE per partition, not per row
  private val fields: Array[(Long, Long) => Long] = required.fieldNames.map {
    case "i" => (i: Long, _: Long) => i
    case "j" => (_: Long, j: Long) => j
    case "v" => (i: Long, j: Long) => GridSource.payload(i, j)
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  private var i = p.iLo
  private var j = p.jLo - 1

  override def next(): Boolean = {
    j += 1
    if (j >= p.jHi) { j = p.jLo; i += 1 }
    i < p.iHi && j < p.jHi
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.map(f => f(i, j)).toIndexedSeq)

  override def close(): Unit = ()
}
