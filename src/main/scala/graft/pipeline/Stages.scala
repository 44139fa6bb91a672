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
    */
  def run(spark: SparkSession, stages: Seq[Stage],
      sources: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
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
      df.createOrReplaceTempView(name)
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
    df.sparkSession.conf.synchronized {
      val conf = df.sparkSession.conf
      val prev = conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
      try df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      finally conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
}
