package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the temporal joins: the scalable compositions
  * (tagged-union window as-of, day-bucketed range join) must equal the
  * brute-force inequality joins they replace.
  */
class TemporalSpec extends SparkTestBase {

  private def ev = Tables.events(spark, sf0001)
    .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
      col("event_type"))

  test("q29 as-of join equals the brute-force latest-view-per-click") {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("us").as("c_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("us").as("v_us"))
    val brute = clicks
      .join(views, col("c_user") === col("v_user") && col("v_us") <= col("c_us"))
      .groupBy(col("click_id"))
      .agg(max(struct(col("v_us"), col("v_id"))).as("best"))
      .select(col("click_id"), col("best.v_id").as("view_id"))
    val asOf = run("q29_asof_join").select("click_id", "view_id")
    assert(asOf.count() === brute.count())
    assert(asOf.join(brute, Seq("click_id", "view_id"), "left_anti").count() === 0)
  }

  test("q30 range join equals the brute-force inequality join") {
    val DayUs = 86400000000L
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("us").as("s_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("p_us"))
    val brute = purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("p_us") >= col("s_us") && col("p_us") < col("s_us") + DayUs)
      .select(col("signup_id"), col("purchase_id"))
    val bucketed = run("q30_range_join").select("signup_id", "purchase_id")
    assert(bucketed.count() === brute.count())
    assert(bucketed.join(brute, Seq("signup_id", "purchase_id"), "left_anti").count() === 0)
  }
}
