package graft

import org.apache.spark.sql.functions._

/** Golden row counts at sf0.001 (pinned from the DuckDB-oracle-verified
  * run — testdata is deterministic, seed 42) plus structural invariants.
  */
class RelationalSpec extends SparkTestBase {

  val golden: Map[String, Long] = Map(
    "q1_agg" -> 6, "q2_filter_project" -> 385, "q3_revenue_by_nation" -> 25,
    "q4_exists_orders" -> 150, "q5_no_open_orders" -> 2, "q6_top_customers" -> 10,
    "q7_window_7d" -> 1402, "q8_count_distinct" -> 3, "q9_having" -> 25,
    "q10_union_all" -> 160, "q11_ilike" -> 7, "q12_case_when" -> 1000,
    "q13_date_pred" -> 3, "q14_multi_sort" -> 25, "q15_md5" -> 150,
    "q16_agg_join_coalesce" -> 150, "q17_rank_per_nation" -> 25,
    "q18_rollup" -> 19, "q19_json_extract" -> 100, "q20_regex_extract" -> 100)

  golden.foreach { case (name, n) =>
    test(s"$name returns $n rows at sf0.001") {
      assert(run(name).count() === n)
    }
  }

  test("entry flagship pipeline returns daily KPIs") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet ===
      Set("d", "event_type", "n_events", "revenue", "n_users", "revenue_7d"))
  }

  test("every oracle query name exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q1 aggregates are exact decimal sums (no FP drift between runs)") {
    val a = run("q1_agg").orderBy("l_returnflag", "l_linestatus").collect()
    val b = run("q1_agg").orderBy("l_returnflag", "l_linestatus").collect()
    assert(a.sameElements(b))
  }

  test("q6 top-k is ordered desc with deterministic tie-break") {
    val rows = run("q6_top_customers").collect()
    val spends = rows.map(_.getDouble(rows.head.fieldIndex("total_spend")))
    assert(spends.sameElements(spends.sorted(Ordering[Double].reverse)))
  }

  test("q17 rank yields exactly one row per nation") {
    val df = run("q17_rank_per_nation")
    assert(df.select("c_nationkey").distinct().count() === df.count())
  }

  test("q1 plan pushes the shipdate filter into the parquet scan") {
    val plan = run("q1_agg").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedFilters"))
  }
}
