package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Dev measurement: the MERGE-ON-READ READ-TAX CURVE — full-scan read
  * latency vs outstanding position-delete volume (~0 / 10k / 100k / 1M
  * deleted rows), on BOTH delete-side routes (broadcast anti-join vs
  * shuffle anti-join, forced via `graft.snapshot.deleteBroadcastBytes`).
  * The write-side economics are covered by MorEconomics; this is the
  * missing read half: how much tax outstanding sidecars add before a
  * purge folds them away, and where the broadcast threshold should sit.
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ReadTaxEconomics"`. Numbers land in PLANS.md (round-9 table).
  */
object ReadTaxEconomics {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 32, appName = "readtax-econ")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_TAX_FACTOR", "4").toInt
    def best(what: String)(f: => Any): Double = {
      var b = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        b = math.min(b, (System.nanoTime() - t0) / 1e9)
      }
      println(f"READTAX $what $b%.3f s")
      b
    }
    val li0 = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val li = (0 until factor).map(k =>
      li0.withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000000L)))
      .reduce(_ unionByName _)
      // a materialized unique row id gives exact, DISJOINT delete sets:
      // rid%240==0 (→ rid%3==0), rid%24==1 (→ rid%3==1), rid%3==2
      .withColumn("rid", monotonically_increasing_id())
    val mor = java.nio.file.Files.createTempDirectory("readtax").toString + "/t"
    Snapshots.commit(li.repartition(32), mor)
    val total = Snapshots.read(spark, mor).count()
    println(s"READTAX rows $total (factor $factor)")
    def agg(): Unit = {
      Snapshots.read(spark, mor).agg(sum("l_extendedprice")).head()
      ()
    }
    val fsys = new org.apache.hadoop.fs.Path(mor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sidecarBytes(): Long = Snapshots.deleteFiles(spark, mor).map(p =>
      fsys.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
    def measure(level: String): Unit = {
      val outstanding = total - Snapshots.read(spark, mor).count()
      println(s"READTAX [$level] outstanding $outstanding sidecar_bytes ${sidecarBytes()}")
      // broadcast route: threshold far above any sidecar here
      spark.conf.set("graft.snapshot.deleteBroadcastBytes", (1L << 40).toString)
      best(s"[$level] read_broadcast")(agg())
      // shuffle route: threshold under everything
      spark.conf.set("graft.snapshot.deleteBroadcastBytes", "1")
      best(s"[$level] read_shuffle")(agg())
      spark.conf.unset("graft.snapshot.deleteBroadcastBytes")
    }
    best("[0] read_clean")(agg())
    Snapshots.deleteWhereMor(spark, mor, col("rid") % 240 === 0)
    measure("10k")
    Snapshots.deleteWhereMor(spark, mor, col("rid") % 24 === 1)
    measure("100k")
    Snapshots.deleteWhereMor(spark, mor, col("rid") % 3 === 2)
    measure("1M")
    // single-shot: purge is not idempotent work (reps 2-3 would no-op)
    val t0 = System.nanoTime()
    Snapshots.purgeDeletes(spark, mor)
    println(f"READTAX purge ${(System.nanoTime() - t0) / 1e9}%.3f s")
    best("read_after_purge")(agg())
    spark.stop()
  }
}
