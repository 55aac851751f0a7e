package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full custom DataSourceV2 READ path — the connector seam itself,
  * exercised end to end (the reference's in-memory batch generator,
  * `host/testdata.cc`-style, expressed as a first-class Spark source
  * instead of `createDataFrame`): deterministic synthetic rows
  * `(id, mod7 = id % 7, cents = (id * 37) % 10000)` over `[0, n)`.
  *
  * What the seam must do at 100 TB, all implemented and plan-pinned:
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `id` FOLD INTO the generated range — the source
  *    never materializes out-of-range rows (the connector analog of
  *    partition pruning; consumed filters are removed from the plan, so
  *    no residual FilterExec re-checks them);
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *    requested columns are computed per row;
  *  - **parallelism** (`slices` option → that many [[InputPartition]]s
  *    over the surviving range — empty slices are never planned);
  *  - **statistics** ([[SupportsReportStatistics]]): post-pushdown
  *    row/byte counts, so the planner's broadcast/AQE decisions see the
  *    PRUNED size, not the raw domain.
  *
  * Usage: `spark.read.format("graft.sources.v2.SeqSource")
  *   .option("n", 1000000).option("slices", 8).load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val n = Option(properties.get("n")).map(_.toLong).getOrElse(1000000L)
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8)
    new SeqTable(n, slices)
  }
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("mod7", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  /** The row formula, shared by every reader (and mirrored arithmetically
    * by the DuckDB oracle).
    */
  def colValue(name: String, id: Long): Long = name match {
    case "id" => id
    case "mod7" => id % 7
    case "cents" => (id * 37) % 10000
    case other => throw new IllegalArgumentException(s"no column $other")
  }
}

class SeqTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq(n=$n)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices)
}

class SeqScanBuilder(n: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n // exclusive
  private var consumed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (taken, residual) = filters.partition {
      case GreaterThan("id", v: Long) => { lo = math.max(lo, v + 1); true }
      case GreaterThanOrEqual("id", v: Long) => { lo = math.max(lo, v); true }
      case LessThan("id", v: Long) => { hi = math.min(hi, v); true }
      case LessThanOrEqual("id", v: Long) => { hi = math.min(hi, v + 1); true }
      case EqualTo("id", v: Long) =>
        { lo = math.max(lo, v); hi = math.min(hi, v + 1); true }
      case IsNotNull("id") => true // id is never null — consumed for free
      case _ => false // e.g. predicates on mod7/cents — evaluated post-scan
    }
    consumed = taken
    residual
  }
  override def pushedFilters(): Array[Filter] = consumed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    SeqScan(math.max(lo, 0L), math.min(hi, n), slices, required)
}

case class SeqRange(from: Long, until: Long) extends InputPartition

case class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the plan string carries the folded range + surviving columns — what
  // PlanAuditSpec pins to prove the pushdown reached the source
  override def description(): String =
    s"SeqScan(range=[$lo,$hi), cols=${required.fieldNames.mkString(",")})"
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(hi - lo, 0L)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(rows * 8L * math.max(required.size, 1))
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }
  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(hi - lo, 0L)
    if (total == 0) return Array.empty
    val per = (total + slices - 1) / slices
    (0 until slices).iterator
      .map(i => SeqRange(lo + i * per, math.min(lo + (i + 1) * per, hi)))
      .filter(r => r.until > r.from) // out-of-range slices never planned
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = r.from - 1
      override def next(): Boolean = { cur += 1; cur < r.until }
      override def get(): InternalRow =
        new GenericInternalRow(
          cols.map(c => SeqSource.colValue(c, cur): Any))
      override def close(): Unit = ()
    }
  }
}
