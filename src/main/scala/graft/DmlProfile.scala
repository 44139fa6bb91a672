package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Dev measurement for the optimization rounds: per-step wall time of
  * the DML commit machinery on the q111-shaped fixture (commit → MOR
  * position delete → equality upsert → per-commit feed read), so the
  * registry's fixture-build seconds can be attributed to specific
  * engine steps instead of guessed at. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DmlProfile"`
  */
object DmlProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "dml-profile")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("SPARK_GRAFT_PROF_SITES"))
          println("DMLPROF-SITE " +
            j.stageInfos.lastOption.map(_.name).getOrElse("?"))
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet(): Unit
    })
    def t[A](what: String)(f: => A): A = {
      val (j0, k0) = (jobs.get(), tasks.get())
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let listener events drain
      println(f"DMLPROF $what $sec%.2f s jobs=${jobs.get() - j0} tasks=${tasks.get() - k0}")
      r
    }
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    t("warm-orders-count")(o.count())
    (1 to 2).foreach { round =>
      val root = java.nio.file.Files.createTempDirectory(s"dmlprof$round").toString + "/t"
      t(s"r$round-commit")(Snapshots.commit(o, root))
      t(s"r$round-mor-delete")(
        Snapshots.deleteWhereMor(spark, root, col("o_totalprice") > 400000))
      val b = o.filter(col("o_orderkey") % 11 === 4)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 7).as("o_totalprice"))
      t(s"r$round-upsert-eq")(Snapshots.upsertEq(spark, root, b, Seq("o_orderkey")))
      t(s"r$round-feed-plan")(
        Snapshots.changeFeedByVersion(spark, root, 1L, 3L))
      (1 to 3).foreach { rep =>
        t(s"r$round-feed-count-rep$rep")(
          Snapshots.changeFeedByVersion(spark, root, 1L, 3L).count())
      }
      t(s"r$round-read-live")(Snapshots.read(spark, root).count())
    }
    spark.stop()
  }
}
