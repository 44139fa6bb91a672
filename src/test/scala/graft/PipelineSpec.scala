package graft

import java.nio.file.Files

import graft.pipeline.{Checks, Marts, Stages}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {

  lazy val models: Map[String, org.apache.spark.sql.DataFrame] =
    Marts.run(spark, sf0001)

  test("D1: staged DAG resolves dependency order and registers views") {
    assert(models.keySet.intersect(
      Set("stg_customers", "stg_orders", "stg_payments", "dim_customers",
        "fct_orders")).size === 5)
    // views registered → usable from SQL
    assert(spark.sql("SELECT COUNT(*) FROM fct_orders").head.getLong(0) === 1500)
  }

  test("fct_orders: decimal money semantics, balance = amount - paid") {
    val f = models("fct_orders")
    assert(f.schema("amount").dataType.typeName.startsWith("decimal"))
    val bad = f.filter(col("balance") =!=
      (col("amount") - col("total_paid")).cast("decimal(13,2)")).count()
    assert(bad === 0)
  }

  test("D3: declared schema tests pass on the star-schema build") {
    val (ok, results) = Checks.runAll(Marts.qualityChecks(models))
    assert(ok, results.filterNot(_.passed).mkString(","))
  }

  test("Checks flag violations (negative case)") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), (null, 3)).toDF("k", "v")
    assert(!Checks.notNull(df, "k").passed)
    assert(!Checks.unique(df, "k").passed)
    assert(!Checks.acceptedValues(df, "k", Seq("b")).passed)
    assert(Checks.acceptedValues(df, "k", Seq("a")).passed) // nulls exempt
  }

  test("D2: incremental delete+insert touches only affected month partitions") {
    val path = Files.createTempDirectory("fct_inc").toString
    // full load first
    Stages.overwritePartitions(models("fct_orders"), path, "order_month")
    val full = spark.read.parquet(path)
    val months = full.select("order_month").distinct().count()
    val before = full.count()
    // incremental slice: only recent orders; poison older partitions would
    // disappear if the overwrite were static
    val maxDate = models("fct_orders").agg(max("order_date")).head.getDate(0).toString
    val cutoff = maxDate.substring(0, 8) + "01" // first of the last month
    Marts.incrementalFctOrders(spark, sf0001, path, cutoff)
    val after = spark.read.parquet(path)
    assert(after.count() === before) // untouched partitions retained
    assert(after.select("order_month").distinct().count() === months)
  }

  test("Stages runner fails fast on unknown deps and cycles") {
    intercept[IllegalArgumentException] {
      Stages.run(spark, Seq(Stages.Stage("x", Seq("nope"), _ => null)))
    }
    intercept[IllegalArgumentException] {
      Stages.run(spark, Seq(
        Stages.Stage("a", Seq("b"), _ => null),
        Stages.Stage("b", Seq("a"), _ => null)))
    }
  }
}
