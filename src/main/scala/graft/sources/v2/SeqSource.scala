package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportStatistics, SupportsRuntimeV2Filtering}
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
    // n is capped where the closed-form SUM(id) pushdown stays exact in
    // Long (ADVICE r14: above this the arithmetic-series product silently
    // overflowed instead of declining). sum([0, 2^32)) = 2^31 × (2^32 − 1)
    // is the largest any sub-range sum can reach, and it fits; a larger
    // domain fails HERE, loudly, not three operators later with a wrong
    // aggregate.
    require(n >= 0 && n <= (1L << 32),
      s"SeqSource n=$n out of [0, 2^32]: the closed-form SUM(id) pushdown " +
        "is only exact in Long up to that domain")
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
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownOffset
    with SupportsPushDownTopN {
  private var lo = 0L
  private var hi = n // exclusive
  private var consumed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema
  private var aggFns: Option[Array[String]] = None
  private var orderedDesc: Option[Boolean] = None

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

  // ---- AGGREGATE pushdown: COUNT(*) / SUM / MIN / MAX over `id` have
  // CLOSED FORMS on a range — the source answers them in O(1) without
  // generating a single row (what a 100 TB source does with its own
  // zone-map/footer statistics). Complete pushdown: Spark plans NO
  // aggregate operator at all, just a project over the 1-row scan.
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def fnOf(f: AggregateFunc): Option[String] = f match {
    case _: CountStar => Some("count")
    case s: Sum if !s.isDistinct && isId(s.column) => Some("sum")
    case m: Min if isId(m.column) => Some("min")
    case m: Max if isId(m.column) => Some("max")
    case _ => None // mod7/cents aggregates have no closed form — declined
  }
  private def handled(agg: Aggregation): Option[Array[String]] =
    if (agg.groupByExpressions.nonEmpty) None
    else {
      val fns = agg.aggregateExpressions.map(fnOf)
      if (fns.nonEmpty && fns.forall(_.isDefined)) Some(fns.map(_.get))
      else None
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    handled(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    handled(agg) match {
      case Some(fns) => aggFns = Some(fns); true
      case None => false
    }

  // ---- LIMIT / OFFSET / TopN pushdown: the generated sequence is
  // totally ordered by id, so all three are RANGE ARITHMETIC — limit
  // truncates the range end, offset advances the start, and an
  // ORDER BY id [DESC] LIMIT k is the first/last k of the (already
  // filter-folded) range. All COMPLETE (isPartiallyPushed = false): no
  // Limit, Offset, Sort or TakeOrdered operator survives in the plan.
  // TopN on any other ordering key (mod7/cents are not monotone in id)
  // is DECLINED and Spark keeps its own TakeOrdered.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit); true
  }
  override def pushOffset(offset: Int): Boolean = {
    lo = math.min(lo + offset, hi); true
  }
  override def isPartiallyPushed(): Boolean = false
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    orders match {
      case Array(o) if isId(o.expression) =>
        if (o.direction == SortDirection.ASCENDING) {
          hi = math.min(hi, lo + limit)
          orderedDesc = Some(false)
        } else {
          lo = math.max(lo, hi - limit)
          orderedDesc = Some(true)
        }
        true
      case _ => false
    }

  override def build(): Scan = {
    val (l, h) = (math.max(lo, 0L), math.min(hi, n))
    aggFns match {
      case Some(fns) => SeqAggScan(l, h, fns)
      case None => SeqScan(l, h, slices, required, orderedDesc)
    }
  }
}

/** The aggregate-pushdown scan: one partition, one row, closed-form
  * answers over `[lo, hi)` — `count = hi−lo`, `sum(id)` by the arithmetic
  * series, `min/max` the range ends (SQL-null on an empty range).
  */
case class SeqAggScan(lo: Long, hi: Long, fns: Array[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    fns.zipWithIndex.map { case (f, i) =>
      StructField(s"${f}_$i", LongType, nullable = f != "count")
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqAggScan(range=[$lo,$hi), aggs=${fns.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      private val localFns = fns
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val r = p.asInstanceOf[SeqRange]
          private var emitted = false
          override def next(): Boolean = { val f = !emitted; emitted = true; f }
          override def get(): InternalRow = {
            val cnt = math.max(r.until - r.from, 0L)
            def closed(f: String): Any = f match {
              case "count" => cnt
              case _ if cnt == 0 => null // SQL aggregate over empty input
              case "sum" =>
                // halve the EVEN factor first: with n ≤ 2^32 the result
                // always fits in Long, but the naive (ends × cnt) / 2
                // intermediate product can reach 2^65
                val ends = r.from + r.until - 1
                if (cnt % 2 == 0) ends * (cnt / 2) else (ends / 2) * cnt
              case "min" => r.from
              case "max" => r.until - 1
            }
            new GenericInternalRow(localFns.map(closed))
          }
          override def close(): Unit = ()
        }
    }
}

case class SeqRange(from: Long, until: Long) extends InputPartition

case class SeqScan(
    lo: Long, hi: Long, slices: Int, required: StructType,
    orderedDesc: Option[Boolean] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {
  // RUNTIME narrowing ([[SupportsRuntimeV2Filtering]], r14 verdict #4 —
  // the connector analog of the parquet path's DPP/bloom-semijoin rows):
  // when this scan is the fact side of a join whose dim side carries a
  // selective filter, Spark evaluates the dim's join keys FIRST and hands
  // them here as an IN predicate; the id range narrows and whole grid
  // cells below fall away before a single fact row is generated. The join
  // itself still verifies every surviving row, so range (min..max)
  // narrowing — the zone-map discipline — is sufficient, never wrong.
  @transient private var rlo = lo
  @transient private var rhi = hi
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))
  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      val longs: Array[Long] = p.children().collect {
        case l: Literal[_] if l.value().isInstanceOf[java.lang.Long] =>
          l.value().asInstanceOf[java.lang.Long].longValue()
      }
      p.name() match {
        case "IN" | "=" if longs.nonEmpty =>
          rlo = math.max(rlo, longs.min)
          rhi = math.min(rhi, longs.max + 1)
        case _ => () // unrecognized runtime predicate: prune nothing
      }
    }
  // partition count as actually planned — rendered into the description
  // so the executed plan string carries the pruning evidence
  @transient private var plannedParts = -1
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the plan string carries the folded range + surviving columns — what
  // PlanAuditSpec pins to prove the pushdown reached the source
  override def description(): String = {
    val ord = orderedDesc.map(d =>
      s", ordered=${if (d) "desc" else "asc"}").getOrElse("")
    val rt = if (rlo > lo || rhi < hi) s", runtime=[$rlo,$rhi)" else ""
    val parts = if (plannedParts >= 0) s", parts=$plannedParts" else ""
    s"SeqScan(range=[$lo,$hi)$rt$parts, cols=${required.fieldNames.mkString(",")}$ord)"
  }
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(hi - lo, 0L)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(rows * 8L * math.max(required.size, 1))
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }
  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(hi - lo, 0L)
    if (total == 0) { plannedParts = 0; return Array.empty }
    // a completely-pushed TopN must emit its rows IN ORDER — one
    // partition (the surviving range is at most the TopN limit anyway)
    val effSlices = if (orderedDesc.isDefined) 1 else slices
    val per = (total + effSlices - 1) / effSlices
    // the grid is laid over the STATIC range and cells are clipped to the
    // runtime range — cells wholly outside are PRUNED (fewer partitions =
    // fewer tasks), exactly how a partitioned table prunes directories
    val parts = (0 until effSlices).iterator
      .map(i => SeqRange(
        math.max(lo + i * per, rlo),
        math.min(math.min(lo + (i + 1) * per, hi), rhi)))
      .filter(r => r.until > r.from) // out-of-range slices never planned
      .toArray[InputPartition]
    plannedParts = parts.length
    parts
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames, orderedDesc.contains(true))
}

class SeqReaderFactory(cols: Array[String], desc: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = if (desc) r.until else r.from - 1
      override def next(): Boolean =
        if (desc) { cur -= 1; cur >= r.from }
        else { cur += 1; cur < r.until }
      override def get(): InternalRow =
        new GenericInternalRow(
          cols.map(c => SeqSource.colValue(c, cur): Any))
      override def close(): Unit = ()
    }
  }
}
