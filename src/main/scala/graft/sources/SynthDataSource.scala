package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic event generator — SURVEY.md §2 item 11b.
  *
  * `spark.read.format("graft.sources.SynthDataSource")
  *   .option("rows", N).option("partitions", P).load()`
  *
  * Demonstrates the Source extension surface end-to-end, not as a toy:
  *
  *  - **Filter pushdown with partition ELISION**: id-range predicates
  *    (`>`, `>=`, `<`, `<=`, `=` on `id`) push into the scan and whole
  *    input partitions outside the surviving [lo, hi) range are never
  *    planned — the DSv2 analog of parquet row-group/partition pruning,
  *    observable in `planInputPartitions().length`
  *    (SynthDataSourceSpec). Every other predicate is returned as a
  *    post-scan filter, so pushdown can never change semantics.
  *  - **Column pruning**: the reader materializes ONLY the pruned
  *    schema — an unselected column is never computed, not just
  *    dropped (the generation cost is per column, so pruning is real
  *    work saved, same as parquet's ReadSchema).
  *  - **Determinism / engine portability**: every cell derives from
  *    md5 of the row id under the house formula
  *    (`conv(substring(md5(tag || id), 1, 8), 16, 10)`), so a DuckDB
  *    oracle regenerates the identical table with `generate_series`
  *    and the same md5 arithmetic — the source's output is
  *    hash-verified cross-engine like every other operator [qo_synth].
  *
  * At fleet scale this shape is the standard benchmark/load-test
  * source (TPC-DS dsdgen-as-a-source, synthetic skew generators):
  * rows stream out of a closed formula, so input bandwidth is zero and
  * partitions scale to whatever parallelism the cluster has.
  */
class SynthDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // DSv2 reader options are case-insensitive everywhere else —
    // honor .option("Rows", N) too, and fail with the offending
    // key/value instead of a bare NumberFormatException.
    val opts = new CaseInsensitiveStringMap(properties)
    def num(key: String, default: Long, max: Long = Long.MaxValue): Long =
      Option(opts.get(key)).fold(default) { raw =>
        val v = try raw.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"synth option '$key' must be a number, got '$raw'")
        }
        if (v < 0 || v > max) throw new IllegalArgumentException(
          s"synth option '$key' must be in [0, $max], got '$raw'")
        v
      }
    // partitions is bounds-checked, never silently truncated to Int.
    new SynthTable(num("rows", 1000L),
      num("partitions", 4L, max = Int.MaxValue.toLong).toInt)
  }
}

object SynthDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val EventTypes: Array[String] =
    Array("view", "click", "purchase", "signup", "error")

  /** Epoch micros of 2024-01-01T00:00:00Z (session TZ is UTC). */
  val BaseMicros: Long = 1704067200000000L

  /** Unsigned 32-bit value of the first 8 md5 hex chars — the same
    * `conv(substring(md5(s),1,8),16,10)` formula as
    * [[graft.functions.Portable]], computable in any engine. */
  def h32(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

class SynthScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = SynthDataSource.Schema
  private var pushed: Array[Filter] = Array.empty
  // Surviving id range [lo, hi) after pushdown.
  var lo: Long = 0L
  var hi: Long = rows

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case i: Integer => Some(i.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v) => asLong(v).exists { l => lo = math.max(lo, l + 1); true }
      case GreaterThanOrEqual("id", v) => asLong(v).exists { l => lo = math.max(lo, l); true }
      case LessThan("id", v) => asLong(v).exists { l => hi = math.min(hi, l); true }
      case LessThanOrEqual("id", v) => asLong(v).exists { l => hi = math.min(hi, l + 1); true }
      case EqualTo("id", v) => asLong(v).exists { l => lo = math.max(lo, l); hi = math.min(hi, l + 1); true }
      case _ => false
    }
    pushed = accepted
    rejected // post-scan filters Spark must still evaluate
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SynthScan(rows, parts, lo, hi, required)
}

class SynthScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth rows=$rows range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val chunk = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map { p =>
        val s = math.max(p * chunk, lo)
        val e = math.min((p + 1) * chunk, hi)
        SynthPartition(s, e)
      }
      .filter(p => p.start < p.end) // partition elision from pushdown
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private val md = MessageDigest.getInstance("MD5")
      private var cur = p.start - 1
      // Generators per REQUIRED field only — pruned columns are never
      // computed (column pruning saves the md5, not just the bytes).
      private val gens: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "id" => (id: Long) => id
          case "ts" => (id: Long) => SynthDataSource.BaseMicros + id * 1000000L
          case "user_id" => (id: Long) =>
            SynthDataSource.h32(md, s"u:$id") % 1000L
          case "event_type" => (id: Long) => UTF8String.fromString(
            SynthDataSource.EventTypes(
              (SynthDataSource.h32(md, s"t:$id") % 5L).toInt))
          case "value" => (id: Long) =>
            (SynthDataSource.h32(md, s"v:$id") % 10000L).toDouble / 100.0
          case other => throw new IllegalArgumentException(
            s"unknown synth column $other")
        }
      }
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
