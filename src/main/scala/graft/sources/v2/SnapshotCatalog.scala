package graft.sources.v2

import java.util

import graft.sources.Snapshots
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark V2 `TableCatalog` over the snapshot table format — the piece
  * that makes the whole format SQL-NATIVE. With
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.v2.SnapshotCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  * }}}
  *
  * plain SQL drives the table lifecycle end to end:
  *
  * {{{
  *   CREATE TABLE graft.ns.t (id BIGINT, v BIGINT)
  *   INSERT INTO graft.ns.t VALUES (1, 10)          -- tokenless commit
  *   INSERT OVERWRITE graft.ns.t SELECT ...          -- replace-publish
  *   SELECT * FROM graft.ns.t                        -- latest snapshot
  *   SELECT * FROM graft.ns.t VERSION AS OF 2        -- time travel
  *   SELECT * FROM graft.ns.t TIMESTAMP AS OF '...'  -- publish-time travel
  *   DROP TABLE graft.ns.t
  * }}}
  *
  * An identifier `ns….t` maps to the directory `warehouse/ns…/t`; the
  * catalog holds NO state of its own (the manifest chain in each table
  * directory is the single source of truth), so any number of sessions
  * and catalogs over one warehouse see the same committed versions —
  * exactly the property the optimistic manifest publish provides.
  * Reads resolve through the same [[SnapshotProvider]] plumbing as
  * `spark.read.format("graft-snapshot")` (manifest-level data skipping
  * included), and writes ride the V1Write fallback into
  * `Snapshots.commit` — one commit protocol under every surface.
  * `VERSION AS OF` / `TIMESTAMP AS OF` resolve through the same
  * version pinning as the reader options (timestamps via
  * [[Snapshots.versionAsOfTimestamp]], Iceberg's newest-at-or-before).
  *
  * Deliberately unsupported (loud, not silent): `ALTER TABLE` (schema
  * evolution goes through overwrite commits), partition transforms
  * (layout is the snapshot format's own: range/z-order rewrites).
  */
class SnapshotCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def name(): String = catalogName

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  private def spark: SparkSession = SparkSession.active

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  private def nsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace).mkString("/"))

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def isTable(path: String): Boolean =
    Snapshots.versions(spark, path).nonEmpty

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable((warehouse +: namespace :+ n).mkString("/")))
      .map(Identifier.of(namespace, _))
  }

  /** Resolve through the provider so catalog reads share the memoized
    * manifest resolution + pruning scan builder with the format path.
    */
  private def load(ident: Identifier, extra: Map[String, String]): Table = {
    val path = tablePath(ident)
    if (!isTable(path))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name())
    val p = new SnapshotProvider
    import scala.jdk.CollectionConverters._
    val opts = new CaseInsensitiveStringMap(
      (Map("path" -> path) ++ extra).asJava)
    p.getTable(p.inferSchema(opts), Array.empty,
      new util.HashMap[String, String](opts))
  }

  override def loadTable(ident: Identifier): Table = load(ident, Map.empty)

  /** `VERSION AS OF <v>` */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Map("asOf" -> version))

  /** `TIMESTAMP AS OF <ts>` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, Map("asOfTimestamp" -> (timestamp / 1000L).toString))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-snapshot tables manage their own layout (range/z-order " +
        "rewrites); PARTITIONED BY is not supported")
    val path = tablePath(ident)
    if (isTable(path))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name())
    // v1 = one empty parquet file carrying the schema: the committed
    // footer IS the table's schema record (no sidecar metadata to drift)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .repartition(1)
    Snapshots.commit(empty, path)
    loadTable(ident)
  }

  // ---- StagingTableCatalog: ATOMIC CTAS / RTAS ----
  // The staged write lands its data files under the table root but no
  // manifest references them until commitStagedChanges publishes — a
  // failed or aborted CTAS leaves no visible table, and REPLACE TABLE
  // AS SELECT swaps the file set in one atomic manifest publish (old
  // versions stay time-travelable, like every overwrite).

  private def staged(ident: Identifier, schema: StructType,
      partitions: Array[Transform], replace: Boolean,
      orCreate: Boolean): org.apache.spark.sql.connector.catalog.StagedTable = {
    require(partitions.isEmpty,
      "graft-snapshot tables manage their own layout (range/z-order " +
        "rewrites); PARTITIONED BY is not supported")
    new StagedSnapshotTable(tablePath(ident), schema, replace, orCreate)
  }

  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name())
    staged(ident, info.schema(), info.partitions(), replace = false, orCreate = false)
  }

  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ ident.namespace() :+ ident.name())
    staged(ident, info.schema(), info.partitions(), replace = true, orCreate = false)
  }

  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    staged(ident, info.schema(), info.partitions(), replace = true, orCreate = true)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-snapshot: ALTER TABLE is not supported — schema evolution " +
        "goes through overwrite commits (INSERT OVERWRITE with the new shape)")

  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    val existed = isTable(path)
    if (existed) Snapshots.drop(spark, path)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val src = new Path(tablePath(oldIdent))
    val dst = new Path(tablePath(newIdent))
    if (!isTable(src.toString))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName) ++ oldIdent.namespace() :+ oldIdent.name())
    require(!fs.exists(dst), s"rename target $dst already exists")
    fs.mkdirs(dst.getParent)
    // single directory rename; the manifests' file paths are absolute,
    // so rewrite them against the new root (driver-side metadata only).
    // Two invariants the rewrite must not break: (a) each manifest's
    // mtime IS its commit time (TIMESTAMP AS OF / history resolve on
    // it) — restore it after the rewrite; (b) a committed version must
    // never be lost mid-rewrite — replace atomically (nio ATOMIC_MOVE
    // on local paths; delete+rename elsewhere, ordered so a crash
    // leaves the .tmp recoverable beside the gap, never silent loss).
    require(fs.rename(src, dst), s"rename $src -> $dst failed")
    Snapshots.versions(spark, dst.toString).foreach { v =>
      val mf = new Path(s"$dst/manifest-v$v.json")
      val mtime = fs.getFileStatus(mf).getModificationTime
      val in = fs.open(mf)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val moved = text.replace(src.toUri.getPath, dst.toUri.getPath)
      if (moved != text) {
        val tmp = new Path(s"$dst/.manifest-v$v.rename.tmp")
        val out = fs.create(tmp, true)
        try out.write(moved.getBytes("UTF-8")) finally out.close()
        if (fs.getScheme == "file")
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp.toUri.getPath),
            java.nio.file.Paths.get(mf.toUri.getPath),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else {
          fs.delete(mf, false)
          require(fs.rename(tmp, mf), s"manifest rewrite failed for v$v")
        }
        fs.setTimes(mf, mtime, -1)
      }
    }
  }

  /** The in-flight side of an atomic CTAS/RTAS: collects the query's
    * output as staged data files (same distributed parquet write as
    * every commit), then publishes them as one manifest on
    * `commitStagedChanges` — create fails if the table appeared in the
    * meantime (never overwrites a race winner), replace publishes an
    * overwrite version with history intact. Abort reclaims the staged
    * directory; nothing was ever visible.
    */
  private class StagedSnapshotTable(path: String, tableSchema: StructType,
      replace: Boolean, orCreate: Boolean)
      extends org.apache.spark.sql.connector.catalog.StagedTable
      with org.apache.spark.sql.connector.catalog.SupportsWrite {

    import org.apache.spark.sql.connector.catalog.TableCapability

    @volatile private var stagedFiles: Seq[String] = Seq.empty
    @volatile private var reclaim: Seq[Path] = Seq.empty

    override def name(): String = s"graft-snapshot:$path (staged)"
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] = {
      import scala.jdk.CollectionConverters._
      Set(TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE).asJava
    }

    override def newWriteBuilder(
        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder =
      new org.apache.spark.sql.connector.write.WriteBuilder
          with org.apache.spark.sql.connector.write.SupportsTruncate {
        // RTAS plans a truncate-write; the staged replace already
        // replaces wholesale, so the flag needs no extra handling
        override def truncate() = this
        override def build(): org.apache.spark.sql.connector.write.Write =
          new org.apache.spark.sql.connector.write.V1Write {
            override def toInsertableRelation
                : org.apache.spark.sql.sources.InsertableRelation =
              (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
                val (files, dir) = Snapshots.stageData(data, path)
                stagedFiles = files
                reclaim = reclaim :+ dir
              }
          }
      }

    override def commitStagedChanges(): Unit = {
      val sp = SparkSession.active
      // an empty CTAS source stages zero files; publish one empty
      // schema-bearing file so the created table still has a schema
      if (stagedFiles.isEmpty) {
        val empty = sp.createDataFrame(
          sp.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)
          .repartition(1)
        val (files, dir) = Snapshots.stageData(empty, path)
        stagedFiles = files
        reclaim = reclaim :+ dir
      }
      try Snapshots.publishStaged(sp, path, stagedFiles, replace, orCreate): Unit
      catch { case e: Throwable => abortStagedChanges(); throw e }
    }

    override def abortStagedChanges(): Unit = {
      val f = new Path(path)
        .getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
      reclaim.foreach(f.delete(_, true))
    }
  }

  // ---- SupportsNamespaces: namespaces are plain directories ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory)
      // a table committed directly at the root (empty namespace) must
      // not double-report as a namespace — same filter as the scoped
      // overload
      .filterNot(st => isTable(st.getPath.toString))
      .map(st => Array(st.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .filterNot(st => isTable(st.getPath.toString))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        Seq(catalogName) ++ namespace)
    new util.HashMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(namespace)): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-snapshot namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    require(!isTable(dir.toString),
      s"${namespace.mkString(".")} is a table, not a namespace — " +
        "use DROP TABLE")
    if (!fs.exists(dir)) false
    else {
      require(cascade || fs.listStatus(dir).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(dir, true)
    }
  }
}
