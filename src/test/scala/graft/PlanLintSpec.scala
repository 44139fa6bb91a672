package graft

/** Blanket plan lint over every registered query: catches accidental
  * cartesian products and lost filter pushdown as the inventory grows
  * (the "explain and iterate" discipline, automated).
  */
class PlanLintSpec extends SparkTestBase {

  // all-pairs similarity queries legitimately build non-equi loop joins
  private val pairJoinQueries = Set("s2_cosine_neardup", "s1_knn_cosine",
    "s3_ann_lsh", "s4_ann_ivf", "d2_ngram_jaccard")

  test("no unintended CartesianProduct in any registered query plan") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(pairJoinQueries)
      .flatMap { name =>
        val plan = run(name).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("selective scans push their filters into parquet") {
    Seq("q1_agg", "q2_filter_project", "q13_date_pred", "q11_ilike").foreach { name =>
      val plan = run(name).queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        !plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
        s"$name lost filter pushdown")
    }
  }

  test("fact scans prune to the referenced columns only") {
    val plan = run("q1_agg").queryExecution.executedPlan.toString
    val readSchema = plan.replaceAll("(?s).*ReadSchema: struct<([^>]*)>.*", "$1")
    val cols = readSchema.split(",").map(_.split(":")(0).trim).toSet
    assert(!cols.contains("l_orderkey") && !cols.contains("l_partkey"),
      s"q1 reads unneeded columns: $cols")
  }
}
