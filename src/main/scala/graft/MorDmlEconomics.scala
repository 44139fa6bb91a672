package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Dev measurement: DELTA-BASED (merge-on-read) vs COPY-ON-WRITE
  * UPDATE / MERGE economics on the COW worst case — a ~0.1% match set
  * SCATTERED across every data file, so the COW rewrite touches the
  * whole table while the delta write costs one sidecar plus the
  * updated rows. Both run through the SQL surface (the planner paths
  * users hit), answers are asserted equal, and the MOR read tax and
  * purge cost are printed alongside. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MorDmlEconomics"`
  * Numbers land in PLANS.md (round-8 MOR DML economics table).
  */
object MorDmlEconomics {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 32, appName = "mor-dml-econ")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MORDML $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val wh = java.nio.file.Files.createTempDirectory("mordmlecon").toString
    spark.conf.set("spark.sql.catalog.econ",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.econ.warehouse", wh)
    spark.sql("CREATE NAMESPACE econ.e")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice").cast("double").as("l_extendedprice"))
      .repartition(32)
    li.createOrReplaceTempView("econ_src")
    def mk(name: String, props: String): String = {
      spark.sql(s"CREATE TABLE econ.e.$name (l_orderkey BIGINT, " +
        "l_partkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE)" +
        (if (props.isEmpty) "" else s" TBLPROPERTIES ($props)"))
      spark.sql(s"INSERT INTO econ.e.$name SELECT * FROM econ_src")
      s"econ.e.$name"
    }
    def agg(tbl: String): Double =
      spark.sql(s"SELECT sum(l_extendedprice) FROM $tbl").head().getDouble(0)
    def files(name: String): Int =
      Snapshots.dataFiles(spark, s"$wh/e/$name").size

    // ---- UPDATE: ~0.1% matches scattered across every file ----
    val uCow = mk("ucow", "")
    val uMor = mk("umor", "'write.update.mode' = 'merge-on-read'")
    t("warmup_read")(agg(uCow))
    val upd = "SET l_extendedprice = l_extendedprice + 1 " +
      "WHERE l_orderkey % 1000 = 7"
    t("cow_update_commit")(spark.sql(s"UPDATE $uCow $upd"))
    t("mor_update_commit")(spark.sql(s"UPDATE $uMor $upd"))
    println(s"MORDML cow_files_after ${files("ucow")}")
    println(s"MORDML mor_files_after ${files("umor")} " +
      s"(sidecars ${Snapshots.deleteFiles(spark, s"$wh/e/umor").size})")
    val a1 = t("read_after_cow_update")(agg(uCow))
    val b1 = t("read_after_mor_update")(agg(uMor))
    assert(math.abs(a1 - b1) < 1e-6 * math.abs(a1), s"diverged: $a1 vs $b1")
    t("mor_update_purge")(
      spark.sql("CALL econ.system.purge_deletes(table => 'e.umor')"))
    t("read_after_purge")(agg(uMor))

    // ---- MERGE: scattered upsert (0.1% updates + 0.01% inserts) ----
    val mCow = mk("mcow", "")
    val mMor = mk("mmor", "'write.merge.mode' = 'merge-on-read'")
    spark.sql(
      """SELECT l_orderkey, l_partkey, l_quantity,
        |       l_extendedprice + 2 AS l_extendedprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |                                   ORDER BY l_partkey) rn
        |      FROM econ_src WHERE l_orderkey % 1000 = 7) WHERE rn = 1
        |UNION ALL
        |SELECT l_orderkey + 9000000000, l_partkey, l_quantity, 1.0
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |                                   ORDER BY l_partkey) rn
        |      FROM econ_src WHERE l_orderkey % 10000 = 13) WHERE rn = 1
        |""".stripMargin).createOrReplaceTempView("econ_upserts")
    // dedup to one source row per key (MERGE's cardinality contract);
    // note lineitem repeats l_orderkey, so matched rows per key > 1
    def merge(tbl: String): Unit = spark.sql(
      s"""MERGE INTO $tbl t USING econ_upserts s
         |ON t.l_orderkey = s.l_orderkey AND t.l_partkey = s.l_partkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin): Unit
    t("cow_merge_commit")(merge(mCow))
    t("mor_merge_commit")(merge(mMor))
    println(s"MORDML cow_merge_files_after ${files("mcow")}")
    println(s"MORDML mor_merge_files_after ${files("mmor")} " +
      s"(sidecars ${Snapshots.deleteFiles(spark, s"$wh/e/mmor").size})")
    val a2 = t("read_after_cow_merge")(agg(mCow))
    val b2 = t("read_after_mor_merge")(agg(mMor))
    assert(math.abs(a2 - b2) < 1e-6 * math.abs(a2), s"diverged: $a2 vs $b2")
    spark.stop()
  }
}
