package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 GENERATOR source — the "infinite test-data tap" a
  * 100 TB pipeline uses for load generation, and this engine's proof of
  * the source-extension tier (SURVEY §7.4: custom sources only where the
  * built-ins can't express the semantics — a deterministic generated
  * table has no files to scan, so a custom `TableProvider` is the
  * genuinely Spark-native formulation, not `spark.range` + maps hidden
  * in driver code).
  *
  * Every row is a pure function of its id, so the source is:
  *   - PARALLEL: `slices` independent `InputPartition`s, each generating
  *     its own id range — the exact layout of a distributed generator
  *     (no shared state, no skew);
  *   - PRUNABLE: `SupportsPushDownFilters` narrows the generated id
  *     range from `event_id` range predicates — the generator analog of
  *     partition pruning (a filtered read COMPUTES less, not just
  *     returns less), visible as `pushed=[lo,hi)` in the scan
  *     description;
  *   - SKINNY: `SupportsPushDownRequiredColumns` prunes generated
  *     columns, so `select(one column)` materializes one column;
  *   - ORACLE-CHECKABLE: the id→column arithmetic is mirrored in DuckDB
  *     SQL over `range()` (bit-exact integer ops + one exact /100.0).
  *
  * Options: `rows` (default 100000), `slices` (default 8).
  */
class RangeGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeGenSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are contractually case-INsensitive, but getTable
    // receives the original-cased map — a raw .get("rows") would
    // silently ignore option("Rows", ...) and generate the default
    // row count with no error (round-17 review)
    val opts = new CaseInsensitiveStringMap(properties)
    new RangeGenTable(
      Option(opts.get("rows")).map(_.toLong).getOrElse(100000L),
      Option(opts.get("slices")).map(_.toInt).getOrElse(8),
      Option(opts.get("batchRows")).map(_.toLong).getOrElse(10000L))
  }
}

object RangeGenSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val EventTypes: Array[String] =
    Array("click", "view", "purchase", "signup", "error")

  /** The id→row arithmetic — one place, mirrored verbatim by the DuckDB
    * oracle (`q_gen_source`). The id pre-reduces mod a prime BEFORE the
    * Knuth multiply (the sampler guard elsewhere): the raw product
    * overflows a long at id ≈ 3.47e9 — BELOW the 2^32 bound the old doc
    * claimed — wrapping `value` negative here while the oracle's BIGINT
    * raises instead. Exact at ANY id now. */
  def userId(id: Long): Long = id % 97

  /** ONE slice-planning rule for the batch scan and the micro-batch
    * stream (round-17 review): the scaladoc's "a batch's partitions are
    * the same per-slice ranges the batch scan plans" identity was held
    * up by two hand-copied loops — a skew/slicing tweak to one would
    * silently diverge batch and streaming row production. */
  def sliceRanges(lo: Long, hi: Long, slices: Int,
      fields: Array[String]): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by per).map { s =>
      RangeGenPartition(s, math.min(s + per, hi), fields)
    }.toArray
  }
  // plain id % 5: the old (id * 31) % 5 was value-identical (31 ≡ 1 mod
  // 5) for every non-overflowing id but wrapped Long-negative at
  // id ≥ ~2.97e17 and crashed the array index — the same overflow class
  // the value() guard below already fixed
  def eventType(id: Long): String = EventTypes((id % 5).toInt)
  def value(id: Long): Double = (((id % 1048573L) * 2654435761L) % 100000L) / 100.0
}

final class RangeGenTable(rows: Long, slices: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"range_gen($rows)"
  override def schema(): StructType = RangeGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeGenScanBuilder(rows, slices, batchRows)
}

final class RangeGenScanBuilder(rows: Long, slices: Int, batchRows: Long)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = RangeGenSource.schema

  /** Range predicates on the id column shrink the GENERATED range —
    * compute-side pruning. Everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // v+1 must not wrap at Long.MaxValue (round-17 review): `> MaxValue`
    // is an empty range (no id exceeds it), `<= MaxValue` is vacuous —
    // the naive +1 turned the former into "everything" and the latter
    // into "nothing", both consumed as pushed so Spark kept no residual
    def succOrMax(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    val (accepted, rest) = filters.partition {
      case GreaterThan("event_id", v: Long) =>
        lo = if (v == Long.MaxValue) Long.MaxValue
             else math.max(lo, v + 1); true
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("event_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("event_id", v: Long) =>
        hi = math.min(hi, succOrMax(v)); true
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succOrMax(v)); true
      case IsNotNull(_) => true // nothing here is ever null
      case _ => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RangeGenScan(lo, math.max(lo, hi), slices, batchRows, required)
}

final case class RangeGenPartition(start: Long, end: Long, fields: Array[String])
    extends InputPartition

final class RangeGenScan(lo: Long, hi: Long, slices: Int, batchRows: Long,
    required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RangeGen(pushed=[$lo,$hi), cols=${required.fieldNames.mkString(",")})"

  /** Even id-range slices; empty slices are dropped. At cluster scale
    * this is one generator task per executor core with zero coordination. */
  override def planInputPartitions(): Array[InputPartition] =
    RangeGenSource.sliceRanges(lo, hi, slices, required.fieldNames)

  override def createReaderFactory(): PartitionReaderFactory =
    RangeGenReaderFactory

  /** Micro-batch face of the same generator: offsets are plain id
    * watermarks, each trigger admits `batchRows` more ids, and a batch's
    * partitions are the same per-slice ranges the batch scan plans — so
    * the streaming source shares ALL row-production code with the batch
    * one, and exactly-once restart falls out of the offset log for free
    * (the generator is a pure function of the id range). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeGenMicroBatchStream(lo, hi, slices, batchRows, required.fieldNames)
}

object RangeGenReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RangeGenReader(p.asInstanceOf[RangeGenPartition])
}

final case class GenOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

final class RangeGenMicroBatchStream(
    lo: Long, hi: Long, slices: Int, batchRows: Long, fields: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** The generated range is static, so Trigger.AvailableNow's "snapshot
    * the end, then drain in admission-controlled batches" needs no
    * preparation — `reportLatestOffset` already returns the fixed end. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = GenOffset(lo)
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  /** Admission control: each trigger advances the id watermark by the
    * read limit, never past the configured end. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].id
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows()
      // Trigger.Once passes ReadAllAvailable: the offset must jump to the
      // end — advancing one batch would silently drop every later row
      // (the Once query terminates after its single batch)
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
        hi - s
      case _ => batchRows
    }
    GenOffset(math.min(hi, s + step))
  }
  override def reportLatestOffset(): Offset = GenOffset(hi)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    RangeGenSource.sliceRanges(start.asInstanceOf[GenOffset].id,
      end.asInstanceOf[GenOffset].id, slices, fields)

  override def createReaderFactory(): PartitionReaderFactory = RangeGenReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class RangeGenReader(p: RangeGenPartition)
    extends PartitionReader[InternalRow] {
  private var id = p.start - 1
  // Column dispatch is resolved ONCE per partition into an extractor
  // table — the per-row loop below is then just `n` closure calls, no
  // string matching or per-row Array.map allocation beyond the row
  // itself (~100k rows/batch × 4 columns adds up in the micro-batch
  // stream, where this reader is re-created every trigger).
  private val extractors: Array[Long => Any] = p.fields.map[Long => Any] {
    case "event_id" => (i: Long) => java.lang.Long.valueOf(i)
    case "user_id" => (i: Long) => java.lang.Long.valueOf(RangeGenSource.userId(i))
    case "event_type" => (i: Long) => UTF8String.fromString(RangeGenSource.eventType(i))
    case "value" => (i: Long) => java.lang.Double.valueOf(RangeGenSource.value(i))
    case other => throw new IllegalArgumentException(
      s"RangeGenSource has no column '$other' (schema: event_id, user_id, event_type, value)")
  }
  override def next(): Boolean = { id += 1; id < p.end }
  override def get(): InternalRow = {
    val vals = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) { vals(i) = extractors(i)(id); i += 1 }
    new GenericInternalRow(vals)
  }
  override def close(): Unit = ()
}
