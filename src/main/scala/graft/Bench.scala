package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    // warm the JVM / codegen / parquet footers once so per-query numbers
    // measure the queries, not first-touch setup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // elapsed is recorded even on failure (time-to-failure is real wall
    // time and keeps the total comparable across rounds); failures are
    // listed separately instead of poisoning the numbers with sentinels
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, dir).count() }
      catch { case _: Throwable => failed += s"$name@$dir" }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n, sfDir))
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // scale-stress tier: rebuild the fixture one decade up (disjoint key
    // shards — ScaleFixture scaladoc) and re-run the expensive tail in the
    // SAME warm JVM, so ratio ≈ data-scaling behavior, not setup noise.
    // A time budget bounds the tier; queries it skips are reported.
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET_SEC", "600").toDouble
    val sf1 =
      if (factor <= 1) ""
      else {
        val dst = ScaleFixture.defaultDst(sfDir, factor)
        val b0 = System.nanoTime()
        try {
          ScaleFixture.build(spark, sfDir, dst, factor)
          val buildSec = (System.nanoTime() - b0) / 1e9
          val base = results.toMap
          var spent = 0.0
          // two passes: the first pays any shared-intermediate builds for
          // the scaled dir (cold), the second measures the query alone
          // (warm). Base-run times are warm by construction — the full
          // registry pass populated the materialize-once seam — so the
          // scaling ratio compares warm to warm.
          val cold = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
          for (n <- ScaleFixture.heavyQueries if spent < budgetSec) {
            val t = run(n, dst); spent += t; cold += (n -> t)
          }
          val warm = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
          for ((n, _) <- cold if spent < budgetSec) {
            val t = run(n, dst); spent += t; warm += (n -> t)
          }
          val skipped = ScaleFixture.heavyQueries.drop(cold.size)
          val warmMap = warm.toMap
          // ratios are strictly warm-vs-warm (base times are warm by
          // construction); a budget-truncated warm pass yields no ratio
          // rather than a cold number mislabeled as one
          val ratios = cold.toSeq.flatMap { case (n, _) =>
            warmMap.get(n) match {
              case Some(t) if t > 0 && base.getOrElse(n, -1.0) > 0 =>
                Some(n -> t / base(n))
              case _ => None
            }
          }
          s""","sf1":{"factor":$factor,"build_sec":$buildSec,""" +
            s""""queries":${json(cold.toSeq)},"warm":${json(warm.toSeq)},""" +
            s""""ratio_vs_base":${json(ratios)},""" +
            s""""skipped":[${skipped.map("\"" + _ + "\"").mkString(",")}]}"""
        } catch { case e: Throwable =>
          s""","sf1":{"factor":$factor,"error":"${e.getClass.getSimpleName}"}"""
        }
      }
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(results)},"sf":"$sfDir"$failedJson$sf1}""")
    spark.stop()
  }
}
