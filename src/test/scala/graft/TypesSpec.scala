package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-system fidelity (SURVEY §1.2 + §7 hard-part 1): the lab05 fuel
  * schema exercises decimal(8,2)/(12,2), int16, float32, array<string>,
  * struct, date and tz-aware timestamps; decimal arithmetic must keep
  * HALF_UP / scale semantics.
  */
class TypesSpec extends SparkTestBase {

  import spark.implicits._

  val fuelSchema = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("dock", StructType(Seq(
      StructField("bay", ShortType), StructField("level", StringType)))),
    StructField("vessel_name", StringType),
    StructField("fuel_type", StringType),
    StructField("fuel_units", FloatType),
    StructField("unit_price", DecimalType(8, 2)),
    StructField("total_price", DecimalType(12, 2)),
    StructField("services", ArrayType(StringType)),
    StructField("is_emergency", BooleanType),
    StructField("exported_at", TimestampType),
    StructField("export_date", DateType),
    StructField("coord_lat", DoubleType),
    StructField("coord_lon", DoubleType)))

  def fuelRows: Seq[Row] = Seq(
    Row("tx-001", Row(3.toShort, "upper"), "Nostromo", "deuterium",
      12.5f, BigDecimal("104.57").bigDecimal, BigDecimal("1307.13").bigDecimal,
      Seq("refuel", "inspection"), false,
      java.sql.Timestamp.valueOf("2025-06-01 10:15:30"),
      java.sql.Date.valueOf("2025-06-01"), 13.7563, 100.5018),
    Row("tx-002", Row(1.toShort, "lower"), "Rocinante", "ice",
      99.25f, BigDecimal("12.00").bigDecimal, BigDecimal("1191.00").bigDecimal,
      Seq("refuel"), true,
      java.sql.Timestamp.valueOf("2025-06-01 10:16:30"),
      java.sql.Date.valueOf("2025-06-01"), -23.5505, -46.6333))

  test("fuel schema round-trips through parquet with exact types") {
    val dir = Files.createTempDirectory("fuel").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fuelRows), fuelSchema)
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("unit_price").dataType === DecimalType(8, 2))
    assert(back.schema("total_price").dataType === DecimalType(12, 2))
    assert(back.schema("fuel_units").dataType === FloatType)
    assert(back.schema("dock").dataType.asInstanceOf[StructType]("bay").dataType === ShortType)
    assert(back.count() === 2)
    val r = back.filter($"transaction_id" === "tx-001").head
    assert(r.getAs[Row]("dock").getAs[Short]("bay") === 3.toShort)
    assert(r.getAs[Seq[String]]("services") === Seq("refuel", "inspection"))
    assert(r.getAs[java.math.BigDecimal]("unit_price")
      .compareTo(new java.math.BigDecimal("104.57")) === 0)
  }

  test("decimal arithmetic: amount - coalesce(paid, 0) keeps scale (fct_orders semantics)") {
    val df = Seq(("a", BigDecimal("100.00"), Some(BigDecimal("40.25"))),
      ("b", BigDecimal("55.10"), None))
      .toDF("k", "amount", "paid")
      .select(col("k"), col("amount").cast("decimal(12,2)"),
        col("paid").cast("decimal(12,2)"))
    val out = df.withColumn("balance",
      col("amount") - coalesce(col("paid"), lit(0).cast("decimal(12,2)")))
    val bal = out.collect().map(r => r.getAs[String]("k") ->
      r.getAs[java.math.BigDecimal]("balance")).toMap
    assert(bal("a").compareTo(new java.math.BigDecimal("59.75")) === 0)
    assert(bal("b").compareTo(new java.math.BigDecimal("55.10")) === 0)
    // subtraction widens precision but keeps scale 2
    assert(out.schema("balance").dataType.asInstanceOf[DecimalType].scale === 2)
  }

  test("double -> decimal cast rounds HALF_UP (reference quantize semantics)") {
    val df = Seq(2.345, 2.344, -2.345).toDF("x")
      .select(col("x").cast("decimal(8,2)").as("d"))
    val vals = df.collect().map(_.getAs[java.math.BigDecimal](0).toPlainString)
    // 2.345 stored as the double 2.34499999...96 — HALF_UP applies to the
    // decimal expansion of that double, matching Python Decimal(str(x))
    // ROUND_HALF_UP on 2-dp inputs used by the reference generator
    assert(vals.toSeq === Seq("2.35", "2.34", "-2.35"))
  }

  test("CSV inference wart: mixed-type column inferred as string (S13)") {
    val dir = Files.createTempDirectory("wart").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/airports.csv"),
      "code,elevation_ft\nEWR,18\nSFO,13\nLHR,NA\n")
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/airports.csv")
    assert(df.schema("elevation_ft").dataType === StringType)
  }

  test("ns timestamps surfaced as microsecond TimestampType (documented truncation)") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.filter(col("ts").isNull).count() === 0)
  }
}
