package graft

import graft.operators.Skew
import graft.plans.SemiJoinRewrite
import org.apache.spark.sql.functions._

class PlansSkewSpec extends SparkTestBase {

  test("SemiJoinRewrite turns join-on-distinct-keys into LeftSemi") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SemiJoinRewrite
    try {
      val orders = Tables.orders(spark, sf0001)
      val cust = Tables.customer(spark, sf0001)
      val keys = orders.select(col("o_custkey")).distinct()
      val q = cust.join(keys, cust("c_custkey") === keys("o_custkey"))
        .select(cust("c_custkey"), cust("c_name"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("LeftSemi"), s"no LeftSemi in:\n$optimized")
      // and semantics are unchanged vs the un-rewritten semi-join
      val expected = cust.join(orders.select("o_custkey"),
        cust("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
      assert(q.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(q).count() === 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SemiJoinRewrite)
    }
  }

  test("SemiJoinRewrite does NOT fire when right columns are projected") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SemiJoinRewrite
    try {
      val orders = Tables.orders(spark, sf0001)
      val cust = Tables.customer(spark, sf0001)
      val keys = orders.select(col("o_custkey")).distinct()
      val q = cust.join(keys, cust("c_custkey") === keys("o_custkey"))
        .select(cust("c_name"), keys("o_custkey")) // uses the right side
      assert(!q.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SemiJoinRewrite)
    }
  }

  test("salted sum/count equals direct aggregation") {
    val direct = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(sum("o_totalprice").as("sum_o_totalprice"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(
      Tables.orders(spark, sf0001), Seq("o_orderstatus"), "o_totalprice")
    val j = direct.as("d").join(salted.as("s"), Seq("o_orderstatus"))
    assert(j.filter(col("d.n") =!= col("s.n")).count() === 0)
    assert(j.filter(abs(col("d.sum_o_totalprice") - col("s.sum_o_totalprice")) > 1e-6)
      .count() === 0)
  }

  test("spread count-distinct equals countDistinct") {
    val direct = Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus").agg(countDistinct("o_custkey").as("d"))
    val spread = Skew.spreadCountDistinct(
      Tables.orders(spark, sf0001), "o_orderstatus", "o_custkey")
    val j = direct.join(spread, Seq("o_orderstatus"))
    assert(j.filter(col("d") =!= col("n_distinct_o_custkey")).count() === 0)
  }

  test("approx_count_distinct within 5% of exact at sf0.001 (scale path)") {
    val row = Tables.lineitem(spark, sf0001)
      .agg(countDistinct("l_orderkey").as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("s15 assignment is in-row over the broadcast codebook (no sort agg, no rank)") {
    // the structural claim behind the round-8 s15 rewrite (the former
    // min(struct) partial aggregate's array payload forced a SORT-based
    // aggregate whose spill made s15 the one superlinear endpoint): the
    // 16-row codebook packs into one broadcast row and each vector
    // folds its argmin IN-ROW — the corpus crosses no assignment
    // exchange and holds no per-group aggregation state on the way
    val plan = SparkEntry.queries("s15_kmeans_refine")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "codebook must reach the corpus as a broadcast, not a shuffle")
    assert(!plan.contains("SortAggregate"),
      s"assignment regressed to a sort-based aggregate:\n$plan")
    // and no per-vector rank window survives anywhere in the plan
    assert(!plan.contains("row_number"),
      "assignment regressed to a window rank")
  }
}
