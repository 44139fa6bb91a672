package graft

/** Plan auditor: prints formatted physical plans for the headline queries
  * so scan pushdown / broadcast choices / codegen spans can be reviewed
  * (run: sbt "runMain graft.Plans [queryName ...]").
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 8, appName = "graft-plans")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_revenue_by_nation", "q6_top_customers",
        "q16_agg_join_coalesce", "d3_minhash_lsh", "s1_knn_cosine")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
