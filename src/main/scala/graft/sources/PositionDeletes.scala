package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Position-delete sidecars: the MERGE-ON-READ half of the snapshot
  * format's DML (the copy-on-write half is `Snapshots.deleteWhere`).
  *
  * A MOR delete never rewrites a data file. It writes a small parquet
  * sidecar of `(file_path, pos)` pairs — the absolute data-file path and
  * the row's ordinal within that file, both taken from Spark's parquet
  * `_metadata` columns — and publishes a manifest whose `D `-prefixed
  * lines reference the sidecar. Readers subtract the positions with an
  * anti-join that touches ONLY the data files the sidecars name; every
  * other file reads exactly as before. At 100 TB this is the difference
  * between a 0.1%-selective DELETE costing ~0.1% of the table (COW
  * rewrite of every touched file) and costing a few MB of sidecar
  * writes: commit cost ∝ matched rows, not ∝ touched-file bytes. The
  * read-side tax is one broadcast anti-join over the touched files
  * until a purge/compaction folds the deletes back in (Iceberg's
  * position-delete / Delta's deletion-vector shape).
  *
  * Positions are stable because data files are immutable: every path in
  * a manifest is written once and only ever dropped, never modified —
  * the same invariant time travel already rides on.
  */
private[graft] object PositionDeletes {

  /** Sidecar schema (Iceberg's position-delete column names). */
  val FileCol = "file_path"
  val PosCol = "pos"
  val schema: StructType = new StructType()
    .add(FileCol, StringType, nullable = false)
    .add(PosCol, LongType, nullable = false)

  /** Internal column names the live-read anti-join threads through a
    * data scan. Double-underscored to stay out of user schemas; the
    * reader refuses a table whose data columns collide.
    */
  val MetaFile = "__gd_file"
  val MetaPos = "__gd_pos"

  /** The delete-side frame over `deleteFiles`, broadcast when the
    * sidecars are small (the common case — a selective delete's
    * positions are a few MB even on a huge table). Above the threshold
    * the anti-join falls back to a shuffle join; correctness is
    * identical.
    */
  def deleteSide(spark: SparkSession, table: String,
      deleteFiles: Seq[String]): DataFrame = {
    val df = spark.read.schema(schema).parquet(deleteFiles: _*)
      .select(col(FileCol).as("__dd_file"), col(PosCol).as("__dd_pos"))
    if (exceedsBroadcast(spark, table, deleteFiles)) df else broadcast(df)
  }

  /** True when the sidecars' total bytes exceed the broadcast/driver
    * threshold (`graft.snapshot.deleteBroadcastBytes`, 64 MB default) —
    * the shared routing decision of the read path's anti-join
    * (broadcast vs shuffle) and the delta-DML scan's delete application
    * (driver-built ordinal arrays vs task-side sidecar reads). An
    * unstat-able sidecar forces the conservative route outright — a
    * short-circuit, not a sentinel byte count, so many stat failures
    * can never overflow the sum back below the threshold.
    */
  private[graft] def exceedsBroadcast(spark: SparkSession, table: String,
      deleteFiles: Seq[String]): Boolean = {
    val f = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val threshold = spark.conf
      .get("graft.snapshot.deleteBroadcastBytes", (64L << 20).toString).toLong
    var bytes = 0L
    deleteFiles.foreach { p =>
      val len =
        try f.getFileStatus(new Path(p)).getLen
        catch { case scala.util.control.NonFatal(_) => return true }
      bytes = try math.addExact(bytes, math.max(len, 0L))
        catch { case _: ArithmeticException => return true }
      if (bytes > threshold) return true
    }
    bytes > threshold
  }

  /** Distinct data-file paths the sidecars reference — the set of files
    * whose reads need the anti-join. Driver-side, bounded by the count
    * of files ever touched by an unpurged delete (metadata-class, like
    * the manifest itself).
    */
  def referencedDataFiles(spark: SparkSession,
      deleteFiles: Seq[String]): Seq[String] =
    if (deleteFiles.isEmpty) Seq.empty
    else spark.read.schema(schema).parquet(deleteFiles: _*)
      .select(FileCol).distinct().collect().map(_.getString(0)).toSeq

  /** Append the `_metadata`-derived (file, pos) identity columns to a
    * parquet scan — the left side of the anti-join.
    */
  def withRowIdentity(scan: DataFrame): DataFrame = {
    require(!scan.columns.contains(MetaFile) && !scan.columns.contains(MetaPos),
      s"data schema must not contain reserved columns $MetaFile/$MetaPos")
    scan.select(col("*"),
      col("_metadata.file_path").as(MetaFile),
      col("_metadata.row_index").as(MetaPos))
  }

  /** Subtract deleted positions from a scan that carries the identity
    * columns. Keeps the identity columns when `keepIdentity` (the MOR
    * delete's own probe needs them); drops them otherwise.
    */
  def subtract(withIdentity: DataFrame, deletes: DataFrame,
      keepIdentity: Boolean = false): DataFrame = {
    val joined = withIdentity.join(deletes,
      withIdentity(MetaFile) === deletes("__dd_file") &&
        withIdentity(MetaPos) === deletes("__dd_pos"),
      "left_anti")
    if (keepIdentity) joined else joined.drop(MetaFile, MetaPos)
  }
}
