package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The STREAMING face of a merge table's change feed —
  * `spark.readStream.format("graft").option("changelog", true)`: a
  * [[MicroBatchStream]] whose offsets are the sink's own COMMITTED
  * VERSIONS, serving each version's `changelog/batch=<id>` rows exactly
  * once. The version log makes the stream replay-idempotent for free:
  *
  *  - `latestOffset` is the freshest `v=<id>/_SUCCESS` marker — a
  *    changelog directory whose version commit is still in flight
  *    (torn) is never planned, exactly the guard the batch reads apply;
  *  - a planned range `(start, end]` lists the feed's batch dirs in
  *    that range, and those dirs are FINAL once their version committed
  *    (the feed is append-only history — compaction and vacuum never
  *    touch it), so a restarted query re-planning the same range reads
  *    byte-identical rows. The two deliberate exceptions are loud, not
  *    silent: `truncateChangelog` drops old dirs behind a retention
  *    floor this planner refuses below, and `forget`'s changelog leg
  *    scrubs a forgotten key from history (GDPR outranks replay);
  *  - the un-replayed prefix is cut by Spark's own offset checkpoint;
  *    `sinceVersion` positions a FIRST run (it is the initial offset).
  *
  * This closes the polling gap: an external incremental consumer
  * (a downstream MV maintainer in another session, a medallion hop)
  * subscribes to the feed instead of re-reading `sinceVersion` cuts.
  * The ±op telescoping contract is the batch feed's
  * ([[graft.streaming.Streams.changelogOf]]): any grouped combinable
  * aggregate over the stream equals the same aggregate over the
  * resolved table once the feed drains.
  *
  * Executor-side reading uses parquet-mr's column-assembled Group API
  * directly (files are opened per partition on the executor — the
  * driver only lists directories), converting to Catalyst rows by the
  * declared read schema; a column missing from an older layer's file
  * (ADD-column evolution) surfaces as null, the same merged-schema
  * semantics the batch read serves. Served types: the full nested
  * algebra the merge-table sinks can write — flat primitives, decimal
  * (the warehouse money type), arrays (both parquet LIST shapes,
  * elements of any served type — embeddings, token ids, arrays of
  * structs), structs (typed metadata, recursively, with per-subfield
  * ADD evolution), and maps — so any schema `mergeSink`/
  * `mergeTableInsert` accepts is stream-consumable; an exotic
  * primitive outside that algebra (interval, unknown physical
  * encoding) refuses loudly rather than guessing. */
final class GraftChangelogStream(ref: GraftDataSource.TargetRef,
                                 readSchema: StructType,
                                 hadoopConf: Configuration)
    extends MicroBatchStream with SupportsAdmissionControl {
  import GraftChangelogStream._

  require(ref.changelog,
    "graft source: streaming reads serve the CHANGE FEED only — set " +
      "option(\"changelog\", true) on a merge-table target (a resolved " +
      "snapshot is state, not a stream; re-deriving deltas from it would " +
      "be a guess)")
  require(ref.asOf.isEmpty,
    "graft source: asOf pins a point-in-time BATCH read — a stream is " +
      "unbounded; cut a historical prefix with sinceVersion instead")

  private val spark = SparkSession.active

  override def initialOffset(): Offset = VersionOffset(ref.sinceVersion)

  // per-stream listing CURSOR: a version dir is IMMUTABLE once its
  // _SUCCESS marker exists, and version ids are DENSE (sink batch ids
  // and external claims both allocate max+1) modulo the narrow hole a
  // crashed claim leaves — so a steady-state trigger probes FORWARD
  // from the known committed frontier only: O(lookahead + |new|)
  // exists calls, never a re-list or re-probe of the whole history (a
  // long-lived feed at 10⁴ committed versions would otherwise pay 10⁴
  // stat RPCs every microbatch; the ChangelogCursorProbe pins the
  // steady-state median flat vs version count). The first call and
  // every `reconcileEvery`-th trigger run the full listing — the
  // backstop that finds commits beyond a wider-than-lookahead hole,
  // amortized O(|history| / 64) per trigger. Restart safety is
  // untouched: a fresh instance reconciles once and reaches the same
  // frontier, and planInputPartitions stays a pure function of its
  // range (below).
  //
  // Multi-writer visibility (the documented contract): the offset is
  // the committed MAX — a slower RACING writer whose version commits
  // below an offset this stream has already passed is served to
  // restarts and batch reads but not to this live stream instance.
  // Single-writer feeds (the sink path, or serialized external writes)
  // are dense, so every version is served exactly once.
  private var frontier: Option[Long] = None
  private var triggersSinceReconcile = 0L
  private val lookahead = 16
  private val reconcileEvery = 64

  private def latestCommitted(): Option[Long] = {
    val dir = new Path(ref.path)
    val fs = dir.getFileSystem(hadoopConf)
    def committed(id: Long): Boolean =
      fs.exists(new Path(s"${ref.path}/v=$id/_SUCCESS"))
    if (frontier.isEmpty || triggersSinceReconcile >= reconcileEvery) {
      // full listing, but only ids ABOVE the frontier need a marker
      // probe — a committed id at or below it can never raise the max
      triggersSinceReconcile = 0
      if (fs.exists(dir)) {
        val above = fs.listStatus(dir).iterator.flatMap { st =>
          val n = st.getPath.getName
          if (st.isDirectory && n.startsWith("v="))
            Some(n.stripPrefix("v=").toLong) else None
        }.filter(id => frontier.forall(_ < id)).toArray.sorted
        // highest committed first — probe from the top
        above.reverseIterator.find(committed)
          .foreach(id => frontier = Some(id))
      }
    } else {
      triggersSinceReconcile += 1
      var next = frontier.get + 1
      var misses = 0
      while (misses < lookahead) {
        if (committed(next)) { frontier = Some(next); misses = 0 }
        else misses += 1
        next += 1
      }
    }
    frontier
  }

  // clamped to never regress below sinceVersion: with a sinceVersion
  // cut ABOVE the committed max, a raw "committed max" offset would be
  // recorded below the initial offset, and versions the cut explicitly
  // excluded would be served once new commits land (double-serving for
  // an incremental consumer that already holds that prefix)
  override def latestOffset(): Offset =
    VersionOffset(math.max(ref.sinceVersion,
      latestCommitted().getOrElse(ref.sinceVersion)))

  // ---- admission control (maxVersionsPerTrigger) ----------------------
  // A consumer catching up on a long-lived feed must not receive 10⁵
  // committed versions as one microbatch: the option caps each
  // trigger's offset advance, so checkpoint commits land every few
  // versions and a mid-catch-up crash replays a bounded range. Pacing
  // is version-granular by design (a version is the sink's atomic
  // unit), so the engine's own ReadLimit hints are left at
  // all-available and the cap applies on top.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset = latestOffset()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val end = latestOffset().asInstanceOf[VersionOffset].version
    val s = start.asInstanceOf[VersionOffset].version
    val capped =
      if (ref.maxVersionsPerTrigger > 0L)
        math.min(end, s + ref.maxVersionsPerTrigger)
      else end
    // never below start: an offset regression would re-open a range the
    // checkpoint already cut (same clamp rationale as latestOffset())
    VersionOffset(math.max(s, capped))
  }

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s) return Array.empty
    // retention floor (truncateChangelog): a consumer whose checkpoint
    // or sinceVersion cut stands below it would plan a range whose
    // batch dirs were dropped — refuse loudly instead of serving a
    // silently-gapped feed (the dir-missing skip below is for version
    // ids that never HAD a batch dir, not for truncated history). One
    // tiny-dir listing per trigger, flat over stream lifetime.
    val floor = graft.streaming.Streams.changelogFloor(hadoopConf, ref.path)
    if (s < floor) throw new IllegalStateException(
      s"graft changelog stream: the feed at and below version $floor " +
        s"was dropped by truncateChangelog while this consumer stands " +
        s"at version $s — continuing would silently skip the truncated " +
        "history; re-bootstrap from a snapshot read (latestTable / " +
        "format(\"graft\")) and a fresh checkpoint with sinceVersion " +
        s">= $floor")
    val chDir = new Path(s"${ref.path}/changelog")
    val fs = chDir.getFileSystem(hadoopConf)
    if (!fs.exists(chDir)) return Array.empty
    // batch dirs in (start, end]: final once their version committed
    // (end never exceeds the committed max), so this plan is a pure
    // function of the range — replay-identical after restarts. The
    // range's ids are PROBED directly instead of listing the whole
    // changelog/ dir: planning cost is O(|this trigger's versions|),
    // flat over stream lifetime, never O(|history|) (a version id with
    // no batch dir — a compaction id, a no-op write — just misses).
    (s + 1 to e).flatMap { id =>
      val dir = new Path(chDir, s"batch=$id")
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          n.endsWith(".parquet")
      }.map(f => ChangelogFilePartition(f.getPath.toString, id)).toSeq
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangelogReaderFactory(readSchema, new SerializableConf(hadoopConf))
}

object GraftChangelogStream {

  /** A committed mergeSink version — the stream's offset unit. */
  final case class VersionOffset(version: Long) extends Offset {
    override def json(): String = version.toString
  }

  /** One data file of one committed changelog batch dir; `batch` is the
    * dir-encoded partition value the rows carry. */
  final case class ChangelogFilePartition(file: String, batch: Long)
      extends InputPartition

  /** Hadoop Configuration is not java-serializable; ship it the way
    * Spark ships its own task confs — Writable bytes. */
  final class SerializableConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  final class ChangelogReaderFactory(schema: StructType,
                                     conf: SerializableConf)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition)
        : PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[ChangelogFilePartition]
      new ChangelogFileReader(p, schema, conf.conf)
    }
  }

  /** parquet-mr Group-assembly reader for one flat-schema file,
    * projected and null-padded to the declared read schema. */
  final class ChangelogFileReader(part: ChangelogFilePartition,
                                  schema: StructType, conf: Configuration)
      extends PartitionReader[InternalRow] {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

    private val reader: ParquetReader[Group] = ParquetReader
      .builder(new GroupReadSupport(), new Path(part.file))
      .withConf(conf).build()
    private var current: Group = _

    override def next(): Boolean = {
      current = reader.read()
      current != null
    }

    override def get(): InternalRow = {
      val g = current
      val fileSchema = g.getType
      val values = schema.fields.map { f =>
        if (f.name == "batch") part.batch
        else if (!fileSchema.containsField(f.name)) null // ADD evolution
        else {
          val idx = fileSchema.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(idx) == 0) null
          else readValue(g, idx, f)
        }
      }
      new GenericInternalRow(values.asInstanceOf[Array[Any]])
    }

    private def readValue(g: Group, idx: Int, f: StructField): Any =
      readTyped(g, idx, 0, f.dataType, f.name)

    /** One value of any served type at (field idx, repetition rep) of
      * `g` — the single recursive dispatch all nesting levels share, so
      * arrays of structs of maps of decimals all ride the same code. */
    private def readTyped(g: Group, idx: Int, rep: Int, dt: DataType,
                          name: String): Any = dt match {
      case ArrayType(elem, _) => readList(g.getGroup(idx, rep), elem, name)
      case st: StructType => readStruct(g.getGroup(idx, rep), st)
      case MapType(kt, vt, _) => readMap(g.getGroup(idx, rep), kt, vt, name)
      case _ => readPrim(g, idx, rep, dt, name)
    }

    /** Typed metadata (the multimodal rows' shape), recursively: a
      * subfield missing from an older file's struct (ADD evolution)
      * surfaces as null, same as a missing top-level column. */
    private def readStruct(sub: Group, st: StructType): InternalRow = {
      val subSchema = sub.getType
      new GenericInternalRow(st.fields.map { sf =>
        if (!subSchema.containsField(sf.name)) null
        else {
          val si = subSchema.getFieldIndex(sf.name)
          if (sub.getFieldRepetitionCount(si) == 0) null
          else readTyped(sub, si, 0, sf.dataType, sf.name)
        }
      }.asInstanceOf[Array[Any]])
    }

    /** LIST decoding, both parquet shapes: the standard 3-level
      * `group (LIST) { repeated group list { optional elem } }` and
      * the legacy 2-level `group (LIST) { repeated elem }`. Which one
      * a file carries is decided by the parquet-format backward-compat
      * rules, not by guessing from the Spark type: a repeated
      * PRIMITIVE is always the element itself; a repeated GROUP is the
      * element iff it has more than one field or carries a legacy
      * element name (`array`, `<list>_tuple`) — otherwise it is the
      * 3-level wrapper whose single optional field is the element.
      * Elements recurse through [[readTyped]], so arrays of structs /
      * maps / arrays are served, not refused. */
    private def readList(listGroup: Group, elem: DataType,
                         name: String): Any = {
      val n = listGroup.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      val inner = listGroup.getType.getType(0)
      val innerIsElement = inner.isPrimitive || {
        val ig = inner.asGroupType()
        ig.getFieldCount != 1 || inner.getName == "array" ||
          inner.getName == listGroup.getType.getName + "_tuple"
      }
      var i = 0
      while (i < n) {
        out(i) =
          if (innerIsElement) readTyped(listGroup, 0, i, elem, name)
          else { // standard 3-level: repeated wrapper, optional elem
            val entry = listGroup.getGroup(0, i)
            if (entry.getFieldRepetitionCount(0) == 0) null
            else readTyped(entry, 0, 0, elem, name)
          }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    /** MAP decoding: `repeated group key_value { required key;
      * optional value }` — field POSITIONS are the contract (0 = key,
      * 1 = value), which covers the legacy `map`/MAP_KEY_VALUE name
      * too. Entry order is file order, matching what Spark's own
      * parquet reader serves for the batch feed. */
    private def readMap(mapGroup: Group, kt: DataType, vt: DataType,
                        name: String): Any = {
      val n = mapGroup.getFieldRepetitionCount(0)
      val keys = new Array[Any](n)
      val values = new Array[Any](n)
      var i = 0
      while (i < n) {
        val kv = mapGroup.getGroup(0, i)
        keys(i) = readTyped(kv, 0, 0, kt, s"$name!key")
        values(i) =
          if (kv.getType.getFieldCount < 2 ||
              kv.getFieldRepetitionCount(1) == 0) null
          else readTyped(kv, 1, 0, vt, s"$name!value")
        i += 1
      }
      import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
      new ArrayBasedMapData(new GenericArrayData(keys),
        new GenericArrayData(values))
    }

    private def readPrim(g: Group, idx: Int, rep: Int,
                         dataType: DataType, colName: String): Any = {
      val prim = g.getType.getType(idx)
      def unsupported = throw new UnsupportedOperationException(
        s"graft changelog stream: column '$colName' of type " +
          s"${dataType.catalogString} (parquet $prim) is not a type " +
          "the stream reader serves — merge-table change streams carry " +
          "primitives, decimal, arrays, structs, and maps (recursively)")
      dataType match {
        case IntegerType | DateType => g.getInteger(idx, rep)
        case LongType => g.getLong(idx, rep)
        case DoubleType => g.getDouble(idx, rep)
        case FloatType => g.getFloat(idx, rep)
        case BooleanType => g.getBoolean(idx, rep)
        case StringType =>
          UTF8String.fromBytes(g.getBinary(idx, rep).getBytes)
        case BinaryType => g.getBinary(idx, rep).getBytes
        case TimestampType | TimestampNTZType =>
          prim.asPrimitiveType().getPrimitiveTypeName match {
            case PrimitiveTypeName.INT64 => g.getLong(idx, rep)
            case PrimitiveTypeName.INT96 =>
              // 12 bytes little-endian: nanos-of-day, julian day
              val b = java.nio.ByteBuffer
                .wrap(g.getInt96(idx, rep).getBytes)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val nanos = b.getLong
              val julian = b.getInt
              (julian - 2440588L) * 86400000000L + nanos / 1000L
            case _ => unsupported
          }
        case ShortType => g.getInteger(idx, rep).toShort
        case ByteType => g.getInteger(idx, rep).toByte
        case dt: DecimalType =>
          // parquet physically stores decimal as INT32 (precision <= 9),
          // INT64 (<= 18), or a big-endian two's-complement unscaled
          // value in FIXED_LEN_BYTE_ARRAY/BINARY — all Group-readable;
          // the logical scale is the Spark type's own (the sinks wrote
          // this schema)
          prim.asPrimitiveType().getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 =>
              Decimal(g.getInteger(idx, rep).toLong, dt.precision, dt.scale)
            case PrimitiveTypeName.INT64 =>
              Decimal(g.getLong(idx, rep), dt.precision, dt.scale)
            case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY |
                 PrimitiveTypeName.BINARY =>
              val unscaled = new java.math.BigInteger(
                g.getBinary(idx, rep).getBytes)
              Decimal(new java.math.BigDecimal(unscaled, dt.scale),
                dt.precision, dt.scale)
            case _ => unsupported
          }
        case _ => unsupported
      }
    }

    override def close(): Unit = reader.close()
  }
}
