package graft

/** Dev tool: prints the Exchange count (shuffle + broadcast) of every
  * registered query's executed plan — the source of truth for
  * ShuffleBudgetSpec's budgets (run: sbt "runMain graft.ExchangeCount").
  */
object ExchangeCount {
  def main(a: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 8, appName = "xcount")
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.001"
    // optional name filter: comma-separated query names as arg 2
    val want: String => Boolean =
      if (a.length > 1) a(1).split(',').toSet else _ => true
    SparkEntry.queries.keys.toSeq.sorted.filter(want).foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      println(s"XC $n ${"Exchange".r.findAllIn(plan).size}")
    }
    spark.stop()
  }
}
