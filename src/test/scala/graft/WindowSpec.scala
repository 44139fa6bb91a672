package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full Window surface beyond the reference's single moving-sum frame
  * (SURVEY §2.5: "Engine exposes the full Window surface").
  */
class WindowSpec extends SparkTestBase {

  lazy val daily = Tables.orders(spark, sf0001)
    .groupBy(to_date(col("o_orderdate")).as("d"))
    .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("rev"))

  val byDate = Window.orderBy("d")

  test("lag/lead: day-over-day deltas") {
    val df = daily
      .withColumn("prev", lag("rev", 1).over(byDate))
      .withColumn("next", lead("rev", 1).over(byDate))
      .withColumn("delta", col("rev") - col("prev"))
    assert(df.filter(col("prev").isNull).count() === 1) // only the first day
    assert(df.filter(col("next").isNull).count() === 1) // only the last day
    val rows = df.orderBy("d").collect()
    assert(rows(1).getAs[Double]("prev") === rows(0).getAs[Double]("rev"))
  }

  test("rank vs dense_rank vs row_number on ties") {
    import spark.implicits._
    val df = Seq(("a", 10), ("b", 10), ("c", 5), ("d", 1))
      .toDF("k", "v")
      .withColumn("rn", row_number().over(Window.orderBy(col("v").desc, col("k"))))
      .withColumn("rk", rank().over(Window.orderBy(col("v").desc)))
      .withColumn("dr", dense_rank().over(Window.orderBy(col("v").desc)))
    val m = df.collect().map(r => r.getString(0) ->
      (r.getAs[Int]("rn"), r.getAs[Int]("rk"), r.getAs[Int]("dr"))).toMap
    assert(m("a") === ((1, 1, 1)))
    assert(m("b") === ((2, 1, 1)))
    assert(m("c") === ((3, 3, 2)))
    assert(m("d") === ((4, 4, 3)))
  }

  test("range frame: 6-day RANGE window differs from 7-row ROWS when days gap") {
    val rows7 = daily.withColumn("w",
      sum("rev").over(byDate.rowsBetween(-6, 0)))
    val range7 = daily.withColumn("w",
      sum("rev").over(Window.orderBy(col("d").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400L, 0)))
    // both are valid 7-day definitions; both must compute without error
    assert(rows7.count() === range7.count())
  }

  test("running total and cumulative share") {
    val df = daily.withColumn("cum",
      sum("rev").over(byDate.rowsBetween(Window.unboundedPreceding, 0)))
    val last = df.orderBy(col("d").desc).limit(1).head.getAs[Double]("cum")
    val total = daily.agg(sum("rev")).head.getDouble(0)
    assert(math.abs(last - total) < 1e-6)
  }

  test("ntile buckets are balanced") {
    val df = Tables.customer(spark, sf0001)
      .withColumn("q", ntile(4).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))))
    val sizes = df.groupBy("q").count().orderBy("q")
      .collect().map(_.getLong(1))
    assert(sizes.sum === 150)
    assert(sizes.max - sizes.min <= 1)
  }
}
