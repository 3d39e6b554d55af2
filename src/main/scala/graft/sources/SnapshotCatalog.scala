package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog over [[SnapshotTable]] bases — the `VERSION AS OF` /
  * `TIMESTAMP AS OF` surface:
  *
  * {{{
  *   spark.sql.catalog.snap      = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.snap.root = /warehouse/snapshots
  *
  *   SELECT ... FROM snap.`events` VERSION AS OF 3
  *   SELECT ... FROM snap.`events` TIMESTAMP AS OF '2026-08-01 00:00:00'
  * }}}
  *
  * Each table name is a child dir of `root` holding `_MANIFEST_v*` files;
  * a load resolves the requested version's manifest (head when
  * unqualified, [[SnapshotTable.versionAsOf]] for timestamps — micros from
  * the parser, mtime semantics from the store) and serves it as Spark's
  * own parquet table over exactly that version's data dirs — so every
  * parquet planner feature (pushdown, pruning, vectorization, row-group
  * stats) applies unchanged, and the manifest-carried schema rides along
  * as the user-specified schema (pre-evolution dirs read the evolved
  * columns as NULLs; time travel keeps each version's OWN shape).
  *
  * REFUSED loudly rather than served wrong:
  *  - versions carrying merge-on-read delete files: a catalog scan is a
  *    pure parquet read and cannot apply key masks — [[SnapshotTable
  *    .compact]] first, or read through [[SnapshotTable.readVersion]];
  *  - writes/DDL (read-only catalog: create/alter/drop/rename throw) —
  *    commits go through the table API, whose OCC protocol the SQL write
  *    path could not honor anyway.
  *
  * At 100 TB the load path costs one listing + one manifest read per
  * query — table resolution is metadata-only, the scan plans against the
  * version's dir list exactly like the API read. */
class SnapshotCatalog extends TableCatalog {

  private var catName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = options.get("root")
    require(root != null,
      s"SnapshotCatalog '$name' needs spark.sql.catalog.$name.root")
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  private def basePath(ident: Identifier): String = {
    if (ident.namespace().nonEmpty)
      throw new NoSuchTableException(ident)
    s"$root/${ident.name()}"
  }

  /** `<cat>.<tbl>.history` — the metadata table ([[SnapshotTable
    * .history]]): version-count-sized rows computed driver-side at
    * resolution and served through a local DSv2 batch, so the SQL
    * surface needs no files. Any other nested name refuses. */
  private def metadataTable(ident: Identifier): Option[Table] = {
    if (ident.namespace().length != 1) return None
    val base = s"$root/${ident.namespace()(0)}"
    if (SnapshotTable.headVersion(spark, base) == 0)
      throw new NoSuchTableException(ident)
    if (ident.name() != "history")
      throw new NoSuchTableException(ident)
    val rows = SnapshotTable.history(spark, base).map(h =>
      Seq[Any](h.version, h.commit_ms, h.n_data_dirs, h.n_delete_dirs,
        h.n_bounds, h.evolved, h.n_rows.map(Long.box).orNull))
    Some(new LocalRowsTable(
      s"$catName.${ident.namespace()(0)}.history",
      StructType.fromDDL("`version` INT, `commit_ms` BIGINT, " +
        "`n_data_dirs` INT, `n_delete_dirs` INT, `n_bounds` INT, " +
        "`evolved` BOOLEAN, `n_rows` BIGINT"),
      rows))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) return Array.empty
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) return Array.empty
    fs.listStatus(rp).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => SnapshotTable.headVersion(spark, s"$root/$n") > 0)
      .map(n => Identifier.of(Array.empty, n))
  }

  override def loadTable(ident: Identifier): Table =
    metadataTable(ident).getOrElse(tableAt(ident, None))

  /** `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(version.nonEmpty && version.forall(_.isDigit),
      s"snapshot versions are integers, got '$version'")
    tableAt(ident, Some(version.toInt))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds; manifest mtimes
    * are millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    tableAt(ident,
      Some(SnapshotTable.versionAsOf(spark, basePath(ident),
        timestampMicros / 1000L)))

  private def tableAt(ident: Identifier, version: Option[Int]): Table = {
    val base = basePath(ident)
    val head = SnapshotTable.headVersion(spark, base)
    if (head == 0) throw new NoSuchTableException(ident)
    val v = version.getOrElse(head)
    val snap = SnapshotTable.manifest(spark, base, v)
    require(snap.deleteDirs.isEmpty,
      s"$catName.${ident.name()} v$v carries merge-on-read delete files " +
        "— a SQL catalog scan is a pure parquet read and cannot apply " +
        "key masks; SnapshotTable.compact() the table first, or read " +
        "through SnapshotTable.readVersion")
    val schema: StructType = SnapshotTable.tableSchema(spark, snap)
    ParquetTable(s"$catName.${ident.name()}@v$v", spark,
      CaseInsensitiveStringMap.empty(), snap.dataDirs,
      Some(schema), classOf[ParquetFileFormat])
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"SnapshotCatalog is read-only ($op refused): commits go through " +
        "the SnapshotTable API, whose optimistic-concurrency protocol " +
        "the SQL write path could not honor")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME TABLE")
}

/** A driver-computed row set served as a DSv2 batch table — the vehicle
  * for metadata tables (version-count-sized; one partition, no files).
  * Values must be primitives/UTF8-encodable (the reader builds
  * GenericInternalRows directly). */
private[sources] class LocalRowsTable(tname: String,
    tschema: StructType, rows: Seq[Seq[Any]])
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.read._
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = tname
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tschema
      override def toBatch: Batch = this
      override def description(): String = s"LocalRows $tname"
      override def planInputPartitions(): Array[InputPartition] =
        Array(LocalRowsPartition(rows.map(_.toArray).toArray))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(
              p: InputPartition): PartitionReader[
                org.apache.spark.sql.catalyst.InternalRow] = {
            val data = p.asInstanceOf[LocalRowsPartition].rows
            new PartitionReader[
                org.apache.spark.sql.catalyst.InternalRow] {
              private var i = -1
              override def next(): Boolean = { i += 1; i < data.length }
              override def get()
                  : org.apache.spark.sql.catalyst.InternalRow = {
                val vals = data(i).map {
                  case s: String =>
                    org.apache.spark.unsafe.types.UTF8String.fromString(s)
                  case other => other.asInstanceOf[AnyRef]
                }
                new org.apache.spark.sql.catalyst.expressions
                  .GenericInternalRow(vals.asInstanceOf[Array[Any]])
              }
              override def close(): Unit = {}
            }
          }
        }
    }
}

private[sources] final case class LocalRowsPartition(rows: Array[Array[Any]])
  extends org.apache.spark.sql.connector.read.InputPartition
