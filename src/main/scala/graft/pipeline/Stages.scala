package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged-model pipeline runner (SURVEY D1/D2 — the dbt raw→staging→marts
  * DAG, magic_shop models/): stages reference upstreams by name, the
  * runner resolves dependency order and registers each result as a temp
  * view so downstream stages can use either the DataFrame or spark.sql.
  */
object Stages {

  /** One model: `build` receives resolved upstream DataFrames by name. */
  final case class Stage(name: String, deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame)

  /** Topologically order and materialize all stages; returns every
    * stage's DataFrame by name. Cycles and missing deps fail fast.
    *
    * Stage names double as temp-view names, so one session must not run
    * two different source sets concurrently under the same stage names
    * (last registration wins for spark.sql consumers — the shared-state
    * hazard Tables.dirKey-suffixed views guard against elsewhere); pass
    * `viewSuffix` to disambiguate when two runs must coexist.
    */
  def run(spark: SparkSession, stages: Seq[Stage],
      sources: Map[String, DataFrame] = Map.empty,
      viewSuffix: String = ""): Map[String, DataFrame] = {
    val byName = stages.map(s => s.name -> s).toMap
    var done = sources
    var visiting = Set.empty[String]

    def resolve(name: String): DataFrame = done.getOrElse(name, {
      val st = byName.getOrElse(name,
        throw new IllegalArgumentException(s"unknown stage/source '$name'"))
      require(!visiting.contains(name), s"cycle at stage '$name'")
      visiting += name
      val ups = st.deps.map(d => d -> resolve(d)).toMap
      val df = st.build(ups)
      df.createOrReplaceTempView(name + viewSuffix)
      visiting -= name
      done += name -> df
      df
    })

    stages.foreach(s => resolve(s.name))
    done
  }

  /** D2: incremental delete+insert ≡ dynamic partition overwrite — only
    * the partitions present in `df` are replaced (the dbt
    * `incremental_strategy: delete+insert` + `partition_by toYYYYMM`
    * behavior, fct_orders.sql:9-16).
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCol: String): Unit =
    // per-write option, NOT a session-conf mutate/restore: the conf flip
    // would leak DYNAMIC mode to every concurrent writer on the session
    // for the duration of this (long) write job
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
}
