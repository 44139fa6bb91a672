package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dbt-style staged model set (SURVEY §2 D1/D2, lab04c magic_shop)
  * re-expressed over the star schema: raw → staging (cast-and-conform,
  * F8/F12) → marts (agg-join fact with decimal money semantics, J5/A3),
  * with incremental delete+insert as dynamic partition overwrite keyed on
  * a yyyyMM month column (fct_orders.sql:9-16,22-32).
  */
object Marts {

  /** staging: conform customer (initcap / ifNull — stg_customers.sql:3-9). */
  def stgCustomers: Stages.Stage = Stages.Stage("stg_customers", Seq("customer"),
    ups => ups("customer").select(
      col("c_custkey").as("customer_id"),
      initcap(col("c_name")).as("customer_name"),
      coalesce(col("c_mktsegment"), lit("Unknown")).as("segment"),
      col("c_acctbal").cast("decimal(12,2)").as("acctbal")))

  /** staging: conform orders (lower/cast/decimal — stg_orders.sql:3-10). */
  def stgOrders: Stages.Stage = Stages.Stage("stg_orders", Seq("orders"),
    ups => ups("orders").select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      lower(col("o_orderstatus")).as("status"),
      col("o_totalprice").cast("decimal(12,2)").as("amount"),
      to_date(col("o_orderdate")).as("order_date"),
      date_format(col("o_orderdate"), "yyyyMM").as("order_month")))

  /** staging: line items as payments-against-order (stg_payments shape). */
  def stgPayments: Stages.Stage = Stages.Stage("stg_payments", Seq("lineitem"),
    ups => ups("lineitem").select(
      col("l_orderkey").as("order_id"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(12,2)").as("paid")))

  /** mart: customer dimension (concat/surrogate — dim_customers.sql:7-12). */
  def dimCustomers: Stages.Stage = Stages.Stage("dim_customers", Seq("stg_customers"),
    ups => ups("stg_customers").select(
      md5(concat_ws("|", col("customer_id"), col("customer_name"))).as("customer_sk"),
      col("customer_id"), col("customer_name"), col("segment")))

  /** mart: fact orders = staged orders LEFT JOIN pre-aggregated payments;
    * balance = amount - ifNull(paid, 0) in decimal(12,2)
    * (fct_orders.sql:20-46).
    */
  def fctOrders: Stages.Stage = Stages.Stage("fct_orders",
    Seq("stg_orders", "stg_payments"),
    ups => {
      val paid = ups("stg_payments")
        .groupBy("order_id")
        .agg(sum("paid").cast("decimal(12,2)").as("total_paid"))
      ups("stg_orders")
        .join(paid, Seq("order_id"), "left")
        .withColumn("total_paid",
          coalesce(col("total_paid"), lit(0).cast("decimal(12,2)")))
        .withColumn("balance",
          (col("amount") - col("total_paid")).cast("decimal(13,2)"))
    })

  def allStages: Seq[Stages.Stage] =
    Seq(stgCustomers, stgOrders, stgPayments, dimCustomers, fctOrders)

  /** Full run from the star-schema sources. */
  def run(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Stages.run(spark, allStages, Map(
      "customer" -> Tables.customer(spark, dir),
      "orders" -> Tables.orders(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir)))

  /** D2 incremental: recompute every order in the months `cutoff`
    * touches and replace exactly those month partitions at `path`. The
    * filter snaps to the MONTH boundary — dynamic partition overwrite
    * replaces whole order_month partitions, so a mid-month cutoff that
    * filtered on order_date would silently delete the partition's rows
    * before the cutoff day.
    */
  def incrementalFctOrders(spark: SparkSession, dir: String, path: String,
      cutoff: String): Unit = {
    val cutoffMonth = date_format(lit(cutoff).cast("date"), "yyyyMM")
    val slice = run(spark, dir)("fct_orders")
      .filter(col("order_month") >= cutoffMonth)
    Stages.overwritePartitions(slice, path, "order_month")
  }

  /** D3: the schema tests the dbt project declares (models/schema.yml). */
  def qualityChecks(models: Map[String, DataFrame]): Seq[Checks.CheckResult] = Seq(
    Checks.notNull(models("fct_orders"), "order_id"),
    Checks.unique(models("fct_orders"), "order_id"),
    Checks.acceptedValues(models("fct_orders"), "status", Seq("o", "f", "p")),
    Checks.notNull(models("dim_customers"), "customer_sk"),
    Checks.unique(models("dim_customers"), "customer_sk"),
    Checks.relationship(models("fct_orders"), "customer_id",
      models("dim_customers"), "customer_id"))
}
