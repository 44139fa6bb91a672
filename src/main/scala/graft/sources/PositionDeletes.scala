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

  /** True when the sidecar at `path` is a v2 DELETION VECTOR file (one
    * row per data file, positions roaring/RLE-encoded in a binary
    * column — [[DeleteVectors]]) rather than the v1 one-row-per-
    * position layout. Dispatch is the footer schema; memoized like the
    * equality-sidecar key sets (sidecar files are immutable, and the
    * change feed probes per micro-batch).
    */
  private val kindMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[graft] def isDvSidecar(spark: SparkSession, path: String): Boolean = {
    val hit = kindMemo.get(path)
    if (hit != null) return hit.booleanValue()
    val isDv = spark.read.parquet(path).schema.fieldNames
      .contains(DeleteVectors.DvCol)
    if (kindMemo.size > 4096) kindMemo.clear()
    kindMemo.put(path, java.lang.Boolean.valueOf(isDv))
    isDv
  }

  private[graft] def invalidateKindMemo(tableNorm: String): Unit =
    kindMemo.keySet.removeIf(p =>
      new Path(p).toUri.getPath.startsWith(tableNorm + "/"))

  /** The delete-side frame over `deleteFiles` — (\_\_dd_file, \_\_dd_pos)
    * pairs whichever sidecar layout(s) recorded them: v1 rows pass
    * through, v2 deletion vectors decode DISTRIBUTED (each task expands
    * its files' bitmaps; memory ∝ one file's deletions). Broadcast when
    * the decoded side is small (the common case — a selective delete's
    * positions are a few MB even on a huge table); above the threshold
    * the anti-join falls back to a shuffle join; correctness is
    * identical.
    */
  def deleteSide(spark: SparkSession, table: String,
      deleteFiles: Seq[String]): DataFrame = {
    val (dvFiles, v1Files) = deleteFiles.partition(isDvSidecar(spark, _))
    val v1 = if (v1Files.isEmpty) None
      else Some(spark.read.schema(schema).parquet(v1Files: _*)
        .select(col(FileCol).as("__dd_file"), col(PosCol).as("__dd_pos")))
    val v2 = if (dvFiles.isEmpty) None
      else {
        import spark.implicits._
        Some(spark.read.schema(DeleteVectors.schema).parquet(dvFiles: _*)
          .select(col(FileCol), col(DeleteVectors.DvCol))
          .as[(String, Array[Byte])]
          .flatMap { case (f, b) =>
            DeleteVectors.decode(b).iterator.map(p => (f, p)) }
          .toDF("__dd_file", "__dd_pos"))
      }
    val df = (v1, v2) match {
      case (Some(a), Some(b)) => a.union(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        import spark.implicits._
        spark.emptyDataset[(String, Long)].toDF("__dd_file", "__dd_pos")
    }
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
    // a DELETION-VECTOR sidecar's bytes understate the decoded
    // (file, pos) rows the broadcast/driver route materializes — scale
    // them by a conservative expansion factor (scattered positions
    // decode ~2 B -> 8 B ordinal + row overhead; runs expand far more,
    // which is exactly when the task route should win)
    val dvFactor = spark.conf
      .get("graft.snapshot.dvExpansionFactor", "16").toLong
    var bytes = 0L
    deleteFiles.foreach { p =>
      val raw =
        try f.getFileStatus(new Path(p)).getLen
        catch { case scala.util.control.NonFatal(_) => return true }
      val len =
        try
          if (isDvSidecar(spark, p)) math.multiplyExact(math.max(raw, 0L), dvFactor)
          else math.max(raw, 0L)
        catch { case _: ArithmeticException => return true
                case scala.util.control.NonFatal(_) => return true }
      bytes = try math.addExact(bytes, len)
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
    // file_path-only projection reads BOTH sidecar layouts (v1 rows and
    // v2 deletion vectors share the column) without decoding anything
    else spark.read
      .schema(new StructType().add(FileCol, StringType, nullable = false))
      .parquet(deleteFiles: _*)
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
