package graft

/** Dev tool: time individual registered queries (repeatably, in one JVM)
  * without paying for the whole bench — `sbt "runMain graft.QBench
  * q67_pagerank q64_basket_pairs [reps]"`. The first run of each query
  * includes codegen/footer warmup, so reps default to 2.
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
    val spark = Sessions.local(cpus = cpus.toInt, appName = "qbench")
    names.foreach { n =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        println(f"QB $n rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
