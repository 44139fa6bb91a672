package graft

/** Dev tool: time individual registered queries (repeatably, in one JVM)
  * without paying for the whole bench — `sbt "runMain graft.QBench
  * q67_pagerank q64_basket_pairs [reps]"`. The first run of each query
  * includes codegen/footer warmup, so reps default to 2.
  *
  * Also the bench's FRESH-JVM steady-state probe: `Bench` forks this
  * main once per scale tier and parses the final `QBJSON {...}` line
  * (per-query minimum over reps — the steady state a fresh JVM reaches,
  * immune to the degraded-shared-JVM artifact pollution the round-8
  * official run recorded). `SPARK_GRAFT_QB_EVICT=1` drops memoized
  * intermediates AFTER each query's reps, so each query measures
  * against its own working set (the per-query-evict rule the in-JVM
  * tiers already follow).
  */
object QBench {
  def main(args: Array[String]): Unit = {
    // fail loudly on ambiguous args: two numbers (which is the rep
    // count?) or an empty token previously fell through to silent
    // defaults / NumberFormatException — a silently wrong rep count
    // skews exactly the comparison this tool exists for
    val (numeric, names0) = args.toSeq.partition(a => a.nonEmpty && a.forall(_.isDigit))
    require(args.forall(_.nonEmpty), "empty argument")
    require(numeric.lengthCompare(1) <= 0,
      s"at most one reps argument, got: ${numeric.mkString(", ")}")
    val (names, reps) = (names0, numeric.headOption.map(_.toInt).getOrElse(2))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val evict = sys.env.get("SPARK_GRAFT_QB_EVICT").contains("1")
    val spark = Sessions.local(cpus = cpus.toInt, appName = "qbench")
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    names.foreach { n =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"QB $n rep$i $sec%.2f s")
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), sec)
      }
      if (evict) Intermediates.dropAll()
    }
    println(best.map { case (k, v) => s""""$k":$v""" }
      .mkString("QBJSON {", ",", "}"))
    spark.stop()
  }
}
