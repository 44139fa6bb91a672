package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-isolated table format over plain parquet — the
  * manifest-pointer pattern (Iceberg/Delta's core idea, reduced to its
  * load-bearing parts) for sinks that need atomic publish, readers
  * that never see half-written data, and time travel:
  *
  *   <table>/data/<uuid>/part-*.parquet   immutable data files
  *   <table>/manifest-v<N>.json           snapshot N's file list
  *
  * A commit writes its data files first (invisible — readers only
  * follow manifests), then publishes `manifest-v<N>` via an atomic
  * single-file rename. The rename doubles as the optimistic-concurrency
  * lock: two writers racing to the same version cannot both win the
  * rename, and the loser retries against the next version number.
  *
  * Scale posture: the manifest is one small driver-side JSON per
  * version (file listing comes from the manifest, never from object-
  * store LIST); data reads are ordinary parquet scans, so pushdown,
  * pruning, and split planning are untouched. Readers pin a version at
  * plan time — a concurrent commit cannot change a running query's
  * file set (snapshot isolation).
  */
object Snapshots {

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = "manifest-v([0-9]+)\\.json".r

  /** Committed versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = new Path(table)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case ManifestRe(v) => Some(v.toLong)
      case _             => None
    }).sorted
  }

  private def manifestFiles(spark: SparkSession, table: String, v: Long): Seq[String] = {
    val f = fs(spark, table)
    val p = new Path(s"$table/manifest-v$v.json")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // manifest body: one absolute file path per line after the header
    // line "v<N>" — deliberately line-oriented so no JSON lib is needed
    text.linesIterator.drop(1).filter(_.nonEmpty).toSeq
  }

  /** Commit `df` as the next snapshot. `overwrite = false` appends to
    * the current snapshot's file set; `true` replaces it. Returns the
    * committed version. Retries (up to 5×) when another writer wins the
    * version race; data files written here stay referenced by OUR
    * manifest only, so a lost race never duplicates or orphans rows in
    * any published snapshot.
    */
  def commit(df: DataFrame, table: String, overwrite: Boolean = false): Long = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    val dataDir = new Path(s"$table/data/${java.util.UUID.randomUUID}")
    df.write.parquet(dataDir.toString)
    val newFiles = f.listStatus(dataDir).toSeq.map(_.getPath.toString)
      .filter(_.contains("part-")).sorted
    var attempt = 0
    while (attempt < 5) {
      val prev = versions(spark, table)
      val v = prev.lastOption.getOrElse(0L) + 1
      val base = if (overwrite || prev.isEmpty) Seq.empty
        else manifestFiles(spark, table, prev.last)
      val tmp = new Path(s"$table/.manifest-v$v.${java.util.UUID.randomUUID}.tmp")
      val out = f.create(tmp, false)
      try out.write((s"v$v\n" + (base ++ newFiles).mkString("\n"))
        .getBytes("UTF-8"))
      finally out.close()
      // atomic publish; rename-onto-existing fails => optimistic lock
      if (f.rename(tmp, new Path(s"$table/manifest-v$v.json"))) return v
      f.delete(tmp, false)
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot commit lost the version race 5 times on $table")
  }

  /** Read a snapshot (latest, or AS OF `asOf`). The file list is pinned
    * here, at plan time — concurrent commits are invisible.
    */
  def read(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed snapshot in $table")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    val files = manifestFiles(spark, table, v)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }
}
