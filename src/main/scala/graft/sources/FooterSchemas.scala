package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Driver-side parquet schema resolution for the snapshot format's
  * INTERNAL reads.
  *
  * Every schema-less `spark.read.parquet(...)` pays a Spark JOB for
  * footer inference (Spark 4 reads footers through a distributed pass
  * even for one file), and the DML/feed machinery plans dozens of such
  * reads per operation — at sf0.1 the measured cost is ~0.15 s of pure
  * job overhead each, the single largest component of commit/feed
  * latency (DmlProfile: 5-6 inference jobs per change-feed plan). The
  * files involved are the engine's OWN immutable outputs, so their
  * schemas can be read once, driver-side, from the footer — the same
  * per-file loop a commit's stats collection already does — and served
  * from a memo forever.
  *
  * Exactness: [[of]] reproduces what Spark's inference returns for a
  * single file — the footer's serialized Spark schema when present
  * (Spark-written files always carry
  * `org.apache.spark.sql.parquet.row.metadata`), else the parquet →
  * Spark conversion under the session's own conf flags. [[uniform]]
  * only short-circuits a multi-file read when EVERY file resolves to
  * the SAME schema, where merge-vs-first-file semantics cannot differ;
  * any disagreement (or unreadable footer) falls back to Spark's own
  * inference path, preserving its semantics bit-for-bit.
  */
object FooterSchemas {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private[graft] def invalidate(tableNorm: String): Unit =
    memo.keySet.removeIf(p =>
      new Path(p).toUri.getPath.startsWith(tableNorm + "/"))

  /** Per-file inferred schema, driver-side, memoized (data/sidecar
    * files are immutable and their UUID-dir paths never reused).
    */
  def of(spark: SparkSession, file: String): StructType = {
    val hit = memo.get(file)
    if (hit != null) return hit
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    val sch =
      try {
        val md = reader.getFooter.getFileMetaData
        val json = md.getKeyValueMetaData
          .get("org.apache.spark.sql.parquet.row.metadata")
        val fromJson =
          if (json == null) None
          else scala.util.Try(
            DataType.fromJson(json).asInstanceOf[StructType]).toOption
        fromJson.getOrElse(
          org.apache.spark.sql.GraftShim.footerSchema(spark, md.getSchema))
      } finally reader.close()
    if (memo.size > 65536) memo.clear()
    memo.put(file, sch)
    sch
  }

  /** The schema every file in `files` agrees on — None when any two
    * differ or any footer fails to read driver-side (the caller then
    * falls back to Spark's own distributed inference).
    */
  def uniform(spark: SparkSession, files: Seq[String]): Option[StructType] =
    try {
      if (files.isEmpty) None
      else {
        val first = of(spark, files.head)
        if (files.tail.forall(of(spark, _) == first)) Some(first) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
