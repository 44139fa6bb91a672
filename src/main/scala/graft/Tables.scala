package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-first loaders for the driver-provided star schema
  * (`/root/testdata/sf*` — see TESTDATA.md). Parquet carries its own
  * schema, so no inference pass is needed; loaders are thin and lazy.
  *
  * At 100 TB these would be catalog tables (partitioned/bucketed); the
  * single-parquet layout is the test harness's. All queries take the
  * directory as a parameter so the same code runs at any scale factor.
  */
object Tables {
  val starTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    // read nanos as long and rebuild a µs TimestampType column (documented
    // ns→µs truncation, SURVEY §1.2).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all star-schema tables as temp views for spark.sql paths. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    starTables.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
}
