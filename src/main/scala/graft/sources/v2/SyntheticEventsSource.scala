package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's FLIP-27 unified
  * source (flink_arch.drawio page "Source": `Source` → `SourceReader` /
  * `SplitReader` pulling splits):
  *   - `InputPartition` ≙ split, `PartitionReader` ≙ SplitReader,
  *   - one `Table` serving BATCH_READ and MICRO_BATCH_READ — the same
  *     batch/stream unification the reference's
  *     translateForBatch/translateForStreaming split provides.
  *
  * Generates deterministic synthetic events (seeded splitmix64), so
  * reads are reproducible across retries/partitions — a stand-in for
  * any external split-based system (queue, table service, object
  * store listing).
  *
  * Options: `rows` (total), `numPartitions` (splits), `seed`,
  * `rowsPerBatch` (microbatch size).
  */
class SyntheticEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "synthetic-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val eventTypes: Array[String] = Array("view", "click", "purchase", "signup", "error")
  val baseMicros: Long = 1704067200000000L // 2024-01-01T00:00:00Z

  /** splitmix64 — deterministic per (seed, rowId). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def row(seed: Long, id: Long): InternalRow = {
    val h = mix(seed ^ id)
    InternalRow(
      id,
      baseMicros + id * 1000000L,
      java.lang.Math.floorMod(h, 1000L),
      UTF8String.fromString(eventTypes(java.lang.Math.floorMod(h >>> 10, eventTypes.length.toLong).toInt)),
      java.lang.Math.floorMod(h >>> 20, 100000L) / 100.0)
  }
}

final class SyntheticTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val rows = options.getLong("rows", 1000L)
  private val numPartitions = options.getInt("numPartitions", 4)
  private val seed = options.getLong("seed", 42L)
  private val rowsPerBatch = options.getLong("rowsPerBatch", 100L)

  override def name(): String = s"synthetic-events($rows)"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticEventsSource.schema
      override def toBatch: Batch = this

      // split enumeration ≙ createInputSplits(): contiguous id ranges
      override def planInputPartitions(): Array[InputPartition] =
        SyntheticTable.ranges(0L, rows, numPartitions).map {
          case (s, e) => RangePartition(s, e, seed): InputPartition
        }
      override def createReaderFactory(): PartitionReaderFactory = SyntheticReaderFactory

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SyntheticMicroBatch(rows, rowsPerBatch, numPartitions, seed)
    }
}

object SyntheticTable {
  def ranges(from: Long, until: Long, parts: Int): Array[(Long, Long)] = {
    val n = math.max(1, parts)
    val step = math.max(1L, (until - from + n - 1) / n)
    (from until until by step).map(s => (s, math.min(s + step, until))).toArray
  }
}

final case class RangePartition(start: Long, end: Long, seed: Long) extends InputPartition

/** ≙ SplitReader: pulls its split's records synchronously. */
object SyntheticReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = SyntheticEventsSource.row(p.seed, id)
      override def close(): Unit = ()
    }
  }
}

final case class LongOffset2(offset: Long) extends Offset {
  override def json(): String = offset.toString
}

/** Microbatch side: offsets are row ids. All rows are "available"
  * immediately (bounded source); batch pacing goes through
  * SupportsAdmissionControl — `ReadLimit.maxRows(rowsPerBatch)` bounds
  * each trigger from the start offset. (Pacing off `commit()` does not
  * work: MicroBatchExecution plans the next batch from offsets, not
  * commit callbacks.) */
final class SyntheticMicroBatch(rows: Long, rowsPerBatch: Long, numPartitions: Int, seed: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = LongOffset2(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-controlled; use latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LongOffset2].offset
    val step = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => rowsPerBatch
    }
    LongOffset2(math.min(rows, s + step))
  }
  override def reportLatestOffset(): Offset = LongOffset2(rows)
  override def deserializeOffset(json: String): Offset = LongOffset2(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[LongOffset2].offset, end.asInstanceOf[LongOffset2].offset)
    SyntheticTable.ranges(s, e, numPartitions).map {
      case (a, b) => RangePartition(a, b, seed): InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = SyntheticReaderFactory
  override def stop(): Unit = ()
}
