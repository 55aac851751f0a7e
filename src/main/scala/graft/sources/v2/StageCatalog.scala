package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graftshim.V2ExprShim
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal [[TableCatalog]] over [[StageSource]] tables — the seam that
  * turns the path-based staging connector into SQL-addressable tables
  * (`CREATE TABLE cat.ns.t … PARTITIONED BY (c)`, `INSERT INTO`,
  * `SELECT`, `DELETE FROM` — the DDL/DML surface a table format exposes;
  * the reference's tables are in-process arrays, so the catalog itself is
  * pure Spark-side semantics). Register with
  * `spark.sql.catalog.<name> = graft.sources.v2.StageCatalog` and
  * `spark.sql.catalog.<name>.root = <dir>`; each table lives under
  * `<root>/<namespace>/<table>` with the schema / partition spec /
  * snapshot files [[StageSource]] already maintains.
  *
  * Deliberately NOT implemented: ALTER/RENAME (schema evolution is a
  * table-format concern with its own round of invariants) — both throw
  * rather than half-work.
  */
class StageCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name requires option spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def nsOf(namespace: Array[String]): String = {
    require(namespace.length <= 1,
      s"StageCatalog supports a single namespace level, got ${namespace.mkString(".")}")
    if (namespace.isEmpty) "default" else namespace(0)
  }

  private def dirOf(ident: Identifier): File =
    new File(new File(root, nsOf(ident.namespace)), ident.name)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = new File(root, nsOf(namespace))
    val fs = d.listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => new File(f, StageSource.SchemaFile).exists())
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    new File(dirOf(ident), StageSource.SchemaFile).exists()

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!new File(dir, StageSource.SchemaFile).exists())
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    val schema = StructType.fromDDL(new String(
      java.nio.file.Files.readAllBytes(
        new File(dir, StageSource.SchemaFile).toPath), StandardCharsets.UTF_8))
    new StageTable(dir.getAbsolutePath, schema,
      StageSource.readPartCols(dir.getAbsolutePath))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    schema.fields.foreach(f => require(StageSource.supported(f.dataType),
      s"StageSource does not support column type ${f.dataType} (${f.name})"))
    val partCols = partitions.map { t =>
      V2ExprShim.identityColumn(t).getOrElse(throw new IllegalArgumentException(
        s"StageCatalog supports only identity partitioning, got $t"))
    }
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c not in schema ${schema.simpleString}"))
    val dir = dirOf(ident)
    dir.mkdirs()
    java.nio.file.Files.write(
      new File(dir, StageSource.SchemaFile).toPath,
      schema.toDDL.getBytes(StandardCharsets.UTF_8)): Unit
    if (partCols.nonEmpty)
      java.nio.file.Files.write(
        new File(dir, StageSource.PartColsFile).toPath,
        partCols.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    // an empty table is a COMPLETE (zero-file) snapshot: the marker makes
    // it immediately readable
    java.nio.file.Files.write(
      new File(dir, StageSource.SuccessFile).toPath,
      Array.emptyByteArray): Unit
    new StageTable(dir.getAbsolutePath, schema, partCols)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "StageCatalog does not support ALTER TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "StageCatalog does not support RENAME TABLE")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!new File(dir, StageSource.SchemaFile).exists()) false
    else {
      graft.engine.Fs.deleteRecursively(dir)
      true
    }
  }
}
