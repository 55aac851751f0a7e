package graft.sources.v2

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the custom connector seam ([[SeqSource]] is the read
  * half): a writable staging table under a managed directory, with the
  * two-phase commit protocol a 1000-executor write needs (the reference's
  * sink is a first-class node — `host/filter/filter_native.cc:64-66` — and
  * this is its Spark-connector re-expression).
  *
  * Commit protocol (the part that matters at scale):
  *  - each task attempt streams rows to a UNIQUE temp file under
  *    `<path>/.staging/` — speculative or retried attempts can never
  *    collide, and a dead attempt leaves only garbage in `.staging/`;
  *  - task `commit()` seals the temp file and reports it in the
  *    [[WriterCommitMessage]] — nothing is visible yet;
  *  - job `commit(messages)` — driver-side, after EVERY task succeeded —
  *    moves exactly the reported files into the table root, persists the
  *    schema, and drops a `_SUCCESS` marker LAST, so readers either see
  *    the complete previous snapshot or the complete new one;
  *  - job `abort()` deletes the staging leftovers; the visible table is
  *    untouched.
  *  SaveMode.Overwrite arrives as [[SupportsTruncate]]: the truncate is
  *  deferred to job commit (delete-then-move under the same marker
  *  discipline), so a failed overwrite never destroys the old snapshot.
  *
  * Row format: a length-prefixed little binary framing (per row: one
  * null-bit byte per column, then each non-null value by type; strings as
  * UTF-8 length+bytes). Deliberately simple — the CONNECTOR seam (schema
  * negotiation, distributed two-phase commit, read-back with pruning) is
  * what this class exercises; columnar encodings are parquet's job and
  * the parquet sink is a separate, already-covered path.
  *
  * Usage: `df.write.format("graft.sources.v2.StageSource")
  *   .option("path", dir).mode("append"|"overwrite").save()`, read back
  * with the same format+path. Supported column types: long, int, double,
  * string.
  */
class StageSource extends TableProvider {
  // writes hand the DataFrame's schema straight to getTable (no files to
  // infer from on first write)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = StageSource.pathOf(options.asScala.toMap.asJava)
    val f = new File(path, StageSource.SchemaFile)
    require(f.exists(),
      s"StageSource table at $path has no persisted schema — write first")
    StructType.fromDDL(new String(
      java.nio.file.Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    schema.fields.foreach(f => require(
      StageSource.supported(f.dataType),
      s"StageSource does not support column type ${f.dataType} (${f.name})"))
    new StageTable(StageSource.pathOf(properties), schema)
  }
}

object StageSource {
  val SchemaFile = "_schema.ddl"
  val SuccessFile = "_SUCCESS"
  val StatsFile = "_stats.tsv"

  /** Per-file, per-numeric-column [min,max] zone maps, recorded by each
    * writer task and persisted at job commit — the connector analog of
    * parquet row-group statistics. Line format:
    * `file \t col \t min \t max` (doubles via Double.toString for an
    * exact round-trip); a `file \t __rows \t n \t n` line carries the
    * row count. String columns record no stats (no pruning).
    */
  final case class ColRange(min: Double, max: Double)

  def readStats(path: String): Map[String, Map[String, ColRange]] = {
    val f = new File(path, StatsFile)
    if (!f.exists()) return Map.empty
    new String(java.nio.file.Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).toSeq
      .map { l =>
        val Array(file, colName, mn, mx) = l.split('\t')
        (file, colName, ColRange(mn.toDouble, mx.toDouble))
      }
      .groupBy(_._1)
      .map { case (file, rows) =>
        file -> rows.map(r => r._2 -> r._3).toMap
      }
  }

  def pathOf(properties: util.Map[String, String]): String = {
    val p = properties.get("path")
    require(p != null && p.nonEmpty, "StageSource requires option 'path'")
    p
  }

  def supported(t: DataType): Boolean = t match {
    case LongType | IntegerType | DoubleType | StringType => true
    case _ => false
  }

  def dataFiles(path: String): Array[File] = {
    val fs = new File(path).listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isFile && f.getName.startsWith("part-")).sortBy(_.getName)
  }
}

class StageTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_stage($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StageScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StageWriteBuilder(path, info.schema(), info.queryId(), truncate = false)
}

// ---------------------------------------------------------------- write

class StageWriteBuilder(
    path: String, schema: StructType, queryId: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new StageWriteBuilder(path, schema, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new StageBatchWrite(path, schema, queryId, truncate)
  }
}

case class StageCommit(
    tmpPath: String, rows: Long,
    // (col, min, max) for numeric columns with at least one non-null row
    stats: Array[(String, Double, Double)]) extends WriterCommitMessage

class StageBatchWrite(
    path: String, schema: StructType, queryId: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new StageWriterFactory(path, schema, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    root.mkdirs()
    // overwrite = truncate AT JOB COMMIT: the previous snapshot survives
    // any failure before this point
    if (truncate) {
      StageSource.dataFiles(path).foreach(f => f.delete(): Unit)
      new File(root, StageSource.SuccessFile).delete(): Unit
    }
    val statLines = new StringBuilder
    // append mode keeps the surviving files' zone maps; truncate starts
    // fresh (their files were just deleted)
    if (!truncate) {
      val f = new File(root, StageSource.StatsFile)
      if (f.exists())
        statLines.append(new String(
          java.nio.file.Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
    }
    messages.zipWithIndex.foreach { case (m, i) =>
      val c = m.asInstanceOf[StageCommit]
      val src = new File(c.tmpPath)
      val name = s"part-$queryId-$i.bin"
      val dst = new File(root, name)
      java.nio.file.Files.move(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      c.stats.foreach { case (colName, mn, mx) =>
        statLines.append(s"$name\t$colName\t$mn\t$mx\n")
      }
    }
    java.nio.file.Files.write(
      new File(root, StageSource.StatsFile).toPath,
      statLines.toString.getBytes(StandardCharsets.UTF_8)): Unit
    java.nio.file.Files.write(
      new File(root, StageSource.SchemaFile).toPath,
      schema.toDDL.getBytes(StandardCharsets.UTF_8)): Unit
    // marker LAST: its presence means "complete snapshot"
    java.nio.file.Files.write(
      new File(root, StageSource.SuccessFile).toPath,
      Array.emptyByteArray): Unit
    cleanStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanStaging()

  private def cleanStaging(): Unit = {
    val st = new File(path, ".staging")
    val fs = st.listFiles()
    if (fs != null) fs.filter(_.getName.contains(queryId)).foreach(f => f.delete(): Unit)
  }
}

class StageWriterFactory(path: String, schema: StructType, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StageDataWriter(path, schema, queryId, partitionId, taskId)
}

class StageDataWriter(
    path: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  // unique per task ATTEMPT (taskId is attempt-unique): retries and
  // speculative copies write disjoint temp files
  private val tmp = {
    val st = new File(path, ".staging")
    st.mkdirs()
    new File(st, s"tmp-$queryId-$partitionId-$taskId.bin")
  }
  private val out = new DataOutputStream(
    new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16))
  private var rows = 0L
  private val types = schema.fields.map(_.dataType)
  // running zone map per numeric column (NaN until a non-null value seen)
  private val mins = Array.fill(types.length)(Double.NaN)
  private val maxs = Array.fill(types.length)(Double.NaN)
  private def observe(i: Int, v: Double): Unit = {
    if (mins(i).isNaN || v < mins(i)) mins(i) = v
    if (maxs(i).isNaN || v > maxs(i)) maxs(i) = v
  }

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < types.length) {
      if (row.isNullAt(i)) out.writeByte(1)
      else {
        out.writeByte(0)
        types(i) match {
          case LongType =>
            val v = row.getLong(i); out.writeLong(v); observe(i, v.toDouble)
          case IntegerType =>
            val v = row.getInt(i); out.writeInt(v); observe(i, v.toDouble)
          case DoubleType =>
            val v = row.getDouble(i); out.writeDouble(v)
            if (!v.isNaN) observe(i, v)
          case StringType =>
            val b = row.getUTF8String(i).getBytes
            out.writeInt(b.length); out.write(b)
          case other => throw new IllegalStateException(s"unsupported $other")
        }
      }
      i += 1
    }
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val stats = types.indices.iterator
      .filter(i => !mins(i).isNaN)
      .map(i => (schema.fields(i).name, mins(i), maxs(i)))
      .toArray
    StageCommit(tmp.getAbsolutePath, rows, stats)
  }

  override def abort(): Unit = {
    out.close()
    tmp.delete(): Unit
  }

  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read

class StageScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = tableSchema
  private var skipFilters: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // Zone-map file skipping: comparison predicates on numeric columns are
  // REMEMBERED for partition pruning but returned as residuals — the
  // stats can only prove a whole file irrelevant, never filter rows, so
  // Spark must keep re-checking row-level (exactly parquet's row-group
  // stats contract).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skipFilters = filters.filter {
      case EqualTo(c, _: Number) => numeric(c)
      case GreaterThan(c, _: Number) => numeric(c)
      case GreaterThanOrEqual(c, _: Number) => numeric(c)
      case LessThan(c, _: Number) => numeric(c)
      case LessThanOrEqual(c, _: Number) => numeric(c)
      case _ => false
    }
    filters // all residual: skipping is pruning, not evaluation
  }
  private def numeric(c: String): Boolean =
    tableSchema.fields.find(_.name == c).exists(f => f.dataType match {
      case LongType | IntegerType | DoubleType => true
      case _ => false
    })
  override def pushedFilters(): Array[Filter] = skipFilters
  override def build(): Scan = StageScan(path, tableSchema, required, skipFilters)
}

case class StageFilePartition(file: String) extends InputPartition

/** One input partition per committed data file — file-grain parallelism,
  * the same unit the two-phase commit produced (one file per writer task).
  * Comparison predicates prune whole files against the commit-time zone
  * maps before any byte is read; a file with no recorded stats for a
  * column is never skipped on that column (nulls-only or legacy files
  * stay safe).
  */
case class StageScan(
    path: String, tableSchema: StructType, required: StructType,
    skipFilters: Array[Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics {
  @transient private var plannedFiles = -1
  @transient private var totalFiles = -1
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val skipped =
      if (plannedFiles >= 0) s", files=$plannedFiles/$totalFiles" else ""
    val sk = if (skipFilters.nonEmpty)
      s", skipBy=${skipFilters.mkString(";")}" else ""
    s"StageScan(path=$path$skipped$sk, cols=${required.fieldNames.mkString(",")})"
  }
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = StageSource.dataFiles(path).map(_.length).sum
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }
  // can a file whose column spans [min,max] possibly satisfy the filter?
  // Long→double zone maps round to nearest, so bounds are widened by one
  // ulp before disproving — a rounded-up min must never skip a file that
  // holds a slightly smaller true value.
  private def mightMatch(stats: Map[String, StageSource.ColRange], f: Filter): Boolean = {
    def rng(c: String): Option[(Double, Double)] =
      stats.get(c).map(r => (Math.nextDown(r.min), Math.nextUp(r.max)))
    f match {
      case EqualTo(c, v: Number) =>
        rng(c).forall { case (mn, mx) => v.doubleValue >= mn && v.doubleValue <= mx }
      case GreaterThan(c, v: Number) => rng(c).forall(_._2 > v.doubleValue)
      case GreaterThanOrEqual(c, v: Number) => rng(c).forall(_._2 >= v.doubleValue)
      case LessThan(c, v: Number) => rng(c).forall(_._1 < v.doubleValue)
      case LessThanOrEqual(c, v: Number) => rng(c).forall(_._1 <= v.doubleValue)
      case _ => true
    }
  }
  override def planInputPartitions(): Array[InputPartition] = {
    require(new File(path, StageSource.SuccessFile).exists(),
      s"StageSource table at $path has no _SUCCESS marker — incomplete snapshot")
    val stats = StageSource.readStats(path)
    val all = StageSource.dataFiles(path)
    totalFiles = all.length
    val kept = all.filter { f =>
      val fileStats = stats.getOrElse(f.getName, Map.empty)
      skipFilters.forall(mightMatch(fileStats, _))
    }
    plannedFiles = kept.length
    kept.map(f => StageFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new StageReaderFactory(tableSchema, required)
}

class StageReaderFactory(tableSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[StageFilePartition].file
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(file), 1 << 16))
      private val types = tableSchema.fields.map(_.dataType)
      // column pruning happens HERE: every stored column is decoded (the
      // framing is row-major), but only required ones are materialized
      // into the produced row
      private val keep = tableSchema.fields.map(f => required.fieldNames.contains(f.name))
      private val outIdx = {
        var j = -1
        tableSchema.fields.map { f =>
          if (required.fieldNames.contains(f.name)) { j += 1; j } else -1
        }
      }
      // local-file streams: available() is the exact remaining byte count
      // (FileInputStream tracks the fd position; the buffer adds its
      // unread window), so row framing needs no length prefix or footer
      override def next(): Boolean = in.available() > 0
      override def get(): InternalRow = {
        val r = new GenericInternalRow(required.length)
        var i = 0
        while (i < types.length) {
          val isNull = in.readByte() == 1
          if (isNull) {
            if (keep(i)) r.setNullAt(outIdx(i))
          } else types(i) match {
            case LongType =>
              val v = in.readLong(); if (keep(i)) r.setLong(outIdx(i), v)
            case IntegerType =>
              val v = in.readInt(); if (keep(i)) r.setInt(outIdx(i), v)
            case DoubleType =>
              val v = in.readDouble(); if (keep(i)) r.setDouble(outIdx(i), v)
            case StringType =>
              val n = in.readInt(); val b = new Array[Byte](n)
              in.readFully(b)
              if (keep(i)) r.update(outIdx(i), UTF8String.fromBytes(b))
            case other => throw new IllegalStateException(s"unsupported $other")
          }
          i += 1
        }
        r
      }
      override def close(): Unit = in.close()
    }
  }
}
