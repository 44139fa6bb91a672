package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch ingestion surface (SURVEY §2.1).
  *
  * Spark's multi-file readers subsume the reference's manual loops: a
  * 50k-file glob is one `csv(dir)` call (S1 — pandas loop+concat in
  * lab01/tasks.ipynb:298-415), gzip is transparent via codec (S3), and
  * small-files cost is governed by `spark.sql.files.openCostInBytes`
  * rather than shell merges (S25). Schema-first everywhere — inference
  * double-scans (SURVEY §4).
  */
object Ingest {

  /** S1: many headerless CSVs with caller-supplied schema (lab01's
    * `names=[id,timestamp,items,category]` read).
    */
  def readHeaderlessCsv(spark: SparkSession, pathOrGlob: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "false").csv(pathOrGlob)

  /** S2/S13: header CSV; schema-first if given, else inference (the
    * reference's inferSchema wart — elevation_ft as string — is the
    * caller's trade-off; SURVEY §1.4).
    */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** S4/S5: schema-first JSONL (gzip transparent — part-*.jsonl.gz). */
  def readJsonl(spark: SparkSession, schema: StructType,
      paths: String*): DataFrame =
    spark.read.schema(schema).json(paths: _*)

  /** T7 quarantine: PERMISSIVE read that splits clean rows from corrupt
    * lines — the lab05 `_bad/` directory behavior
    * (dags/fuel_ingest_dag.py:184-194) without the Airflow machinery.
    * Corrupt raw lines are preserved verbatim in `quarantineDir`.
    */
  def readJsonlWithQuarantine(spark: SparkSession, schema: StructType,
      path: String, quarantineDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // one scan feeds both splits; permissive+corrupt requires it
    raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
      .write.mode("overwrite").text(quarantineDir)
    // detach the clean side from the JSON scan (a post-unpersist plan
    // whose pruned schema is corrupt-record-only would hit Spark's
    // QUERY_ONLY_CORRUPT_RECORD_COLUMN refusal), then release the
    // cache: returning a derived frame while `raw` stayed cached would
    // leak one unreleasable in-memory copy of the input per call. The
    // checkpoint blocks are reclaimed by the ContextCleaner when the
    // returned frame is dereferenced — unlike the orphaned cache.
    val clean = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
      .localCheckpoint()
    raw.unpersist()
    clean
  }

  /** CSV twin of [[readJsonlWithQuarantine]] — the m11 row-granular
    * contract on the CSV seam: a malformed line (wrong arity, uncastable
    * field) becomes a quarantine row carrying the verbatim raw line,
    * never a task failure, and clean rows proceed. Returned as ONE frame
    * with a `_quarantine_reason` column (null = clean) so callers can
    * route both sides without a second scan.
    *
    * The returned frame is `cache()`d (Spark's CSV reader rejects plans
    * whose required schema is only the internal corrupt-record column —
    * the exact shape a reason-only filter produces). The cache pins one
    * in-memory copy of the input per call: callers routing a large
    * ingest should `.unpersist()` the returned frame once both sides
    * are consumed.
    */
  def readCsvWithQuarantine(spark: SparkSession, schema: StructType,
      path: String, header: Boolean = false): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    spark.read.schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      // cache before deriving the reason: a caller filtering ONLY on
      // _quarantine_reason would otherwise prune the scan's required
      // schema down to the internal corrupt-record column alone, which
      // Spark's CSV reader rejects outright (same contract as the JSONL
      // twin above — one scan feeds both sides)
      .cache()
      .withColumn("_quarantine_reason",
        when(col("_corrupt_record").isNotNull,
          concat(lit("malformed_csv: "), col("_corrupt_record"))))
      .drop("_corrupt_record")
  }

  /** S6: one multi-line JSON document holding an array field; explode to
    * rows (lab02 users.json: `users[]` of nested structs).
    */
  def readJsonDocArray(spark: SparkSession, path: String,
      arrayField: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col(arrayField)).as("r"))
      .select("r.*")

  /** Apache combined log format + the reference's trailing kv fields
    * (lab02/tasks.ipynb:12-216):
    * ip - user [ts] "METHOD path proto" status bytes "ref" "ua"
    * level=L request_id=R error_type=E
    */
  val apacheLogPattern: String =
    """^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-) "([^"]*)" "([^"]*)"(?: level=(\S+))?(?: request_id=(\S+))?(?: error_type=(\S+))?.*$"""

  /** S7/F9: project structured columns out of raw log lines via
    * regexp_extract (the Spark-native zgrep/awk — A7/A11).
    */
  def parseApacheLogs(lines: DataFrame, column: String = "value"): DataFrame = {
    val c = col(column)
    def g(i: Int) = regexp_extract(c, apacheLogPattern, i)
    lines.select(
      g(1).as("ip"),
      g(3).as("user"),
      // CASE guards the parse: unmatched lines yield '' which would throw
      // under Spark 4's ANSI default (CaseWhen branches evaluate lazily)
      when(g(4) === "", lit(null))
        .otherwise(to_timestamp(g(4), "dd/MMM/yyyy:HH:mm:ss Z")).as("ts"),
      g(5).as("method"),
      g(6).as("path"),
      g(8).try_cast("int").as("status"),
      when(g(9) === "-", lit(null)).otherwise(g(9)).try_cast("long").as("bytes"),
      g(10).as("referrer"),
      g(11).as("user_agent"),
      when(g(12) === "", lit(null)).otherwise(g(12)).as("level"),
      when(g(13) === "", lit(null)).otherwise(g(13)).as("request_id"),
      when(g(14) === "", lit(null)).otherwise(g(14)).as("error_type"))
      .filter(col("ip") =!= "")
  }

  /** A11: the lab02 error-type histogram over parsed logs. */
  def errorHistogram(parsed: DataFrame): DataFrame =
    parsed.filter(col("error_type").isNotNull)
      .groupBy("error_type").count()
      .orderBy(desc("count"), col("error_type"))

  /** S25/U2: small-files compaction — bounded output file count without a
    * full shuffle.
    */
  def compact(df: DataFrame, files: Int): DataFrame = df.coalesce(files)

  /** S10: partitioned parquet write (overwrite), snappy. */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(dir)

  /** Clustered write: hive-partitioned layout + rows sorted within each
    * task before writing + a hard per-file row bound. At 100 TB this is
    * the layout that makes downstream reads cheap: partition pruning on
    * the directory column, min/max row-group skipping on the sort
    * column (parquet stats are tight when data is sorted), and bounded
    * file sizes so no task reads a monster file.
    */
  def writeClustered(df: DataFrame, dir: String, partCol: String,
      sortCol: String, maxRecordsPerFile: Long): Unit =
    df.sortWithinPartitions(partCol, sortCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .parquet(dir)
}
