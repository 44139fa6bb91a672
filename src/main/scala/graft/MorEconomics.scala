package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Dev measurement: MERGE-ON-READ vs COPY-ON-WRITE delete economics on
  * the COW worst case — a selective predicate whose matches spread
  * across EVERY data file (so COW rewrites the whole table and MOR
  * writes one tiny sidecar). Prints commit cost both ways, the MOR
  * read tax before/after purge, and the purge cost. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MorEconomics"`
  * Numbers land in PLANS.md (round-8 MOR economics table).
  */
object MorEconomics {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 32, appName = "mor-econ")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MORECON $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // SPARK_GRAFT_MOR_FACTOR replicates lineitem in-flight for tier
    // points (orderkey shifted by multiples of 1e9, which preserves
    // the %1000 predicate's selectivity and spread)
    val factor = sys.env.getOrElse("SPARK_GRAFT_MOR_FACTOR", "1").toInt
    val li0 = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val li = (0 until factor).map(k =>
      li0.withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000000L)))
      .reduce(_ unionByName _)
    println(s"MORECON factor $factor")
    val base = java.nio.file.Files.createTempDirectory("morecon").toString
    val cow = s"$base/cow"; val mor = s"$base/mor"
    Snapshots.commit(li.repartition(32), cow)
    Snapshots.commit(li.repartition(32), mor)
    val pred = col("l_orderkey") % 1000 === 7 // ~0.1%, spread over all files
    def agg(tbl: String): Double =
      Snapshots.read(spark, tbl).agg(sum("l_extendedprice")).head().getDouble(0)
    val skipCow = sys.env.get("SPARK_GRAFT_MOR_SKIP_COW").contains("1")
    val skipMor = sys.env.get("SPARK_GRAFT_MOR_SKIP_MOR").contains("1")
    t("warmup_read")(agg(if (skipCow) mor else cow))
    if (!skipCow) t("cow_delete_commit")(Snapshots.deleteWhere(spark, cow, pred))
    if (skipMor) { spark.stop(); return }
    t("mor_delete_commit")(Snapshots.deleteWhereMor(spark, mor, pred))
    if (!skipCow) {
      val a = t("read_after_cow")(agg(cow))
      val b = t("read_after_mor")(agg(mor))
      assert(math.abs(a - b) < 1e-6 * math.abs(a), s"answers diverge: $a vs $b")
    } else t("read_after_mor")(agg(mor))
    t("mor_purge")(Snapshots.purgeDeletes(spark, mor))
    println(s"MORECON files_after_purge ${Snapshots.dataFiles(spark, mor).size}")
    t("read_after_purge")(agg(mor))
    t("read_after_purge_rep2")(agg(mor))
    val fsys = new org.apache.hadoop.fs.Path(mor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecarBytes = Snapshots.deleteFiles(spark, mor, Some(2L)).map(p =>
      fsys.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
    println(s"MORECON sidecar_bytes $sidecarBytes")
    spark.stop()
  }
}
