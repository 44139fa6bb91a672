package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The reference's flagship batch pipeline end-to-end
  * (revenue_analysis/main.ipynb): schema-first JSONL reads (S4/S5) →
  * timestamp/date derivation (F8) → conditional revenue + bad-row filter
  * (F6/F4) → two broadcast left joins to the dimensions (J4) → 4-way
  * daily KPI aggregation (A4) → 7-day moving revenue (W1) → partitioned
  * parquet (S10) with pruned read-back (S11).
  */
object RevenueAnalysis {

  /** revenue_analysis/main.ipynb:83-146 — the three declared schemas. */
  val userSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("signup_date", DateType),
    StructField("plan", StringType),
    StructField("country", StringType),
    StructField("marketing_opt_in", BooleanType)))

  val itemSchema: StructType = StructType(Seq(
    StructField("item_id", IntegerType),
    StructField("category", StringType),
    StructField("tags", ArrayType(StringType))))

  val eventSchema: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("event", StringType),
    StructField("user_id", IntegerType),
    StructField("item_id", IntegerType),
    StructField("context", StructType(Seq(
      StructField("country", StringType),
      StructField("device", StringType),
      StructField("locale", StringType),
      StructField("session_id", StringType)))),
    StructField("props", StructType(Seq(
      StructField("price", DoubleType),
      StructField("payment_method", StringType),
      StructField("dwell_ms", IntegerType)))),
    StructField("exp", StructType(Seq(
      StructField("ab_group", StringType))))))

  /** The enriched event table: parsed times, revenue, joined dims. */
  def enrich(events: DataFrame, items: DataFrame, users: DataFrame): DataFrame = {
    val parsed = events
      .withColumn("ts", to_timestamp(col("ts")))
      .withColumn("date", to_date(col("ts")))
      .withColumn("revenue",
        when(col("event") === "purchase", col("props.price"))
          .otherwise(lit(0.0)).cast("double"))
      // drop ONLY the injected negative-price rows: a purchase with a
      // NULL props.price keeps its event/user counts (null revenue sums
      // as nothing) rather than vanishing from every KPI
      .filter(col("revenue").isNull || col("revenue") >= 0.0)
    parsed
      .join(broadcast(items), Seq("item_id"), "left")
      .join(broadcast(users.withColumnRenamed("id", "user_id")
        .select(col("user_id"), col("plan"), col("country").as("user_country"))),
        Seq("user_id"), "left")
  }

  /** Daily KPIs by (date, country, category) + 7-day moving revenue. */
  def dailyKpi(enriched: DataFrame): DataFrame = {
    val daily = enriched
      .groupBy(col("date"), col("context.country").as("country"), col("category"))
      .agg(
        count(lit(1)).as("events"),
        count(when(col("event") === "purchase", 1)).as("purchases"),
        sum(col("revenue").cast("decimal(18,4)")).cast("double").as("total_revenue"),
        countDistinct("user_id").as("unique_users"))
    val w = Window.partitionBy("country", "category").orderBy("date")
      .rowsBetween(-6, 0)
    daily.withColumn("revenue_7d", round(sum("total_revenue").over(w), 2))
  }

  /** Full pipeline: read → enrich → KPI → partitioned write → read-back. */
  def run(spark: SparkSession, usersPath: String, itemsPath: String,
      eventsGlob: String, outDir: String): DataFrame = {
    val users = spark.read.schema(userSchema).json(usersPath)
    val items = spark.read.schema(itemSchema).json(itemsPath)
    val events = spark.read.schema(eventSchema).json(eventsGlob)
    val kpi = dailyKpi(enrich(events, items, users))
    kpi.write.mode("overwrite").partitionBy("date").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
