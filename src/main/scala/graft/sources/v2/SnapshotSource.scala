package graft.sources.v2

import java.util

import graft.sources.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 surface for the [[graft.sources.Snapshots]] table
  * format, making snapshot reads and time travel SQL-reachable:
  *
  * {{{
  *   spark.read.format("graft-snapshot")
  *     .option("path", table).option("asOf", 2).load()
  * }}}
  *
  * The provider does exactly one format-specific thing — resolve the
  * requested version's manifest to its immutable data-file list — and
  * then hands that list to Spark's OWN parquet table implementation.
  * Everything a 100 TB scan needs (predicate pushdown to row-group
  * stats, column pruning, split planning, vectorized reading) is the
  * stock parquet path, visible as `PushedFilters`/`ReadSchema` in
  * explain; snapshot isolation holds because the file list is pinned
  * at table-resolution time, exactly like [[Snapshots.read]].
  *
  * Registered under the short name `graft-snapshot` via the standard
  * `DataSourceRegister` service loader.
  */
class SnapshotProvider extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def supportsExternalMetadata(): Boolean = false

  /** Spark calls inferSchema then getTable on the SAME provider
    * instance; resolving twice would double the manifest+footer I/O
    * and — with `asOf` unset — could pin a DIFFERENT version if a
    * commit lands between the two calls. Memoized per option set so
    * one load() resolves exactly once.
    */
  @volatile private var cached: (Map[String, String], ParquetTable) = null

  private def resolve(options: CaseInsensitiveStringMap): ParquetTable = {
    import scala.jdk.CollectionConverters._
    val key = options.asCaseSensitiveMap().asScala.toMap
    val c = cached
    if (c != null && c._1 == key) return c._2
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot requires .option(\"path\", <table dir>)"))
    val asOf = Option(options.get("asOf")).map(_.toLong)
    val spark = SparkSession.active
    // resolve "latest" to a CONCRETE version now, so the pinned file
    // list and the table name agree forever after
    val version = asOf.getOrElse(
      Snapshots.versions(spark, path).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no committed snapshot in $path")))
    val files = Snapshots.dataFiles(spark, path, Some(version))
    require(files.nonEmpty, s"snapshot v$version of $path lists no data files")
    val t = ParquetTable(s"graft-snapshot:$path@v$version",
      spark, options, files, None, classOf[ParquetFileFormat])
    cached = (key, t)
    t
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))
}
