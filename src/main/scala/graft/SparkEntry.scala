package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the domain modules under graft.operators.
  */
object SparkEntry {

  private def registry: Seq[QuerySpec] =
    operators.Relational.all ++ operators.TextAnalysis.all ++
      operators.Dedup.all ++ operators.Similarity.all ++
      operators.MultimodalQ.all ++ operators.Curation.all ++
      operators.Temporal.all ++ operators.Analytic.all ++
      operators.Incremental.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's flagship revenue_analysis daily-KPI pipeline
    * (revenue_analysis/main.ipynb:198-289): conditional revenue → daily
    * multi-agg → 7-day moving window.
    */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    operators.Relational.q21DailyKpi.run(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
