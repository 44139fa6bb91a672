package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Dev measurement: CONTINUOUS CDC UPSERT economics — the shape where
  * equality deletes exist. Five sequential upsert batches (scattered
  * ~0.1% updates + ~0.03% inserts each) land on a 32-file orders table
  * through the three paths a user could pick:
  *
  *   A. `Snapshots.merge`   — COW probe + hit-file rewrite PER BATCH
  *   B. SQL MERGE, MOR mode — position-delta write (reads the target
  *      for row identity, writes sidecars, rewrites nothing)
  *   C. `Snapshots.upsertEq` — ZERO-probe commit (appends + key-set
  *      sidecar; never reads the target)
  *
  * Per-batch commit times are printed for each path, then the eq
  * path's deferred costs: the read tax with all five sidecars
  * outstanding, the purge (key-hit files only), and the post-purge
  * read. Final aggregates are asserted equal across all three paths.
  * Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.EqUpsertEconomics"`
  * Numbers land in PLANS.md (round-8 CDC upsert economics table).
  */
object EqUpsertEconomics {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = 32, appName = "eq-upsert-econ")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"EQECON $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val wh = java.nio.file.Files.createTempDirectory("equpsecon").toString
    spark.conf.set("spark.sql.catalog.eqecon",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.eqecon.warehouse", wh)
    spark.sql("CREATE NAMESPACE eqecon.e")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .repartition(32)
    o.createOrReplaceTempView("eqecon_src")

    // batch i: scattered updates (one residue class of 997) + inserts
    def batch(i: Int) = spark.sql(
      s"""SELECT o_orderkey, 'U$i' AS o_orderstatus,
         |       o_totalprice + $i AS o_totalprice
         |FROM eqecon_src WHERE o_orderkey % 997 = $i
         |UNION ALL
         |SELECT o_orderkey + 9000000000 AS o_orderkey,
         |       'N' AS o_orderstatus, CAST($i AS DOUBLE) AS o_totalprice
         |FROM eqecon_src WHERE o_orderkey % 3001 = $i""".stripMargin)
    val batches = (1 to 5).map(i => i -> batch(i).localCheckpoint()).toMap
    println(s"EQECON batch_rows ${batches(1).count()}")

    // ---- A: COW merge (probe + hit-file rewrite per batch) ----
    val tA = s"$wh/e/cowmerge"
    Snapshots.commit(o, tA)
    t("warmup_read")(Snapshots.read(spark, tA).count())
    (1 to 5).foreach { i =>
      t(s"cow_merge_b$i")(Snapshots.merge(spark, tA, batches(i), "o_orderkey"))
    }
    println(s"EQECON cow_files_after ${Snapshots.dataFiles(spark, tA).size}")

    // ---- B: SQL MERGE, merge-on-read (position-delta write) ----
    spark.sql("CREATE TABLE eqecon.e.mormerge (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('write.merge.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO eqecon.e.mormerge SELECT * FROM eqecon_src")
    (1 to 5).foreach { i =>
      batches(i).createOrReplaceTempView("eqecon_b")
      t(s"mor_merge_b$i")(spark.sql(
        """MERGE INTO eqecon.e.mormerge t USING eqecon_b s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    }
    println(s"EQECON mor_files_after " +
      s"${Snapshots.dataFiles(spark, s"$wh/e/mormerge").size} (sidecars " +
      s"${Snapshots.deleteFiles(spark, s"$wh/e/mormerge").size})")

    // ---- C: upsertEq (zero-probe commit) ----
    val tC = s"$wh/e/equps"
    Snapshots.commit(o, tC)
    (1 to 5).foreach { i =>
      t(s"eq_upsert_b$i")(
        Snapshots.upsertEq(spark, tC, batches(i), Seq("o_orderkey")))
    }
    println(s"EQECON eq_files_after ${Snapshots.dataFiles(spark, tC).size} " +
      s"(eq sidecars ${Snapshots.eqDeleteFiles(spark, tC).size})")

    // deferred costs of C: read tax with 5 sidecars, purge, read after
    def agg(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = df.agg(count(lit(1)), sum("o_totalprice")).head()
      (r.getLong(0), r.getDouble(1))
    }
    val a = t("read_after_cow")(agg(Snapshots.read(spark, tA)))
    val b = t("read_after_mor")(agg(spark.table("eqecon.e.mormerge")))
    val c1 = t("eq_read_5_sidecars")(agg(Snapshots.read(spark, tC)))
    t("eq_purge")(Snapshots.purgeEqDeletes(spark, tC))
    val c2 = t("eq_read_after_purge")(agg(Snapshots.read(spark, tC)))
    assert(a._1 == b._1 && b._1 == c1._1 && c1._1 == c2._1,
      s"row counts diverged: $a $b $c1 $c2")
    assert(math.abs(a._2 - c1._2) < 1e-6 * math.abs(a._2) &&
      math.abs(b._2 - c1._2) < 1e-6 * math.abs(b._2) &&
      math.abs(c1._2 - c2._2) < 1e-6 * math.abs(c1._2),
      s"sums diverged: $a $b $c1 $c2")
    println(s"EQECON rows ${a._1}")

    // ---- D: the PRUNED purge probe on a write-ordered table ----
    // key-range upserts on a clustered table: the probe's IN-list
    // prune (FileStats ranges) should cut the candidate set to the
    // key-range files; A/B via graft.snapshot.eqProbeInListMaxKeys=0
    def clustered(tag: String): String = {
      val tD = s"$wh/e/$tag"
      Snapshots.setSortSpec(spark, tD, Seq("o_orderkey"))
      Snapshots.commit(o, tD)
      val maxKey = spark.sql("SELECT max(o_orderkey) FROM eqecon_src")
        .head().getLong(0)
      val bD = spark.sql(
        s"""SELECT o_orderkey, 'T' AS o_orderstatus,
           |       o_totalprice + 9 AS o_totalprice
           |FROM eqecon_src WHERE o_orderkey >= ${(maxKey * 0.99).toLong}
           |""".stripMargin)
      Snapshots.upsertEq(spark, tD, bD, Seq("o_orderkey"))
      tD
    }
    val tOn = clustered("equpsrange1")
    spark.conf.set("graft.snapshot.eqProbeMinCandidates", "0")
    t("eq_purge_range_pruned")(Snapshots.purgeEqDeletes(spark, tOn))
    spark.conf.unset("graft.snapshot.eqProbeMinCandidates")
    val tOff = clustered("equpsrange2")
    spark.conf.set("graft.snapshot.eqProbeInListMaxKeys", "0")
    t("eq_purge_range_unpruned")(Snapshots.purgeEqDeletes(spark, tOff))
    spark.conf.unset("graft.snapshot.eqProbeInListMaxKeys")
    val dOn = agg(Snapshots.read(spark, tOn))
    val dOff = agg(Snapshots.read(spark, tOff))
    // row counts exact; double sums to relative tolerance (the two
    // routes' file layouts differ, so summation order does)
    assert(dOn._1 == dOff._1 &&
      math.abs(dOn._2 - dOff._2) < 1e-6 * math.abs(dOn._2),
      s"pruned vs unpruned purge diverged: $dOn $dOff")
    spark.stop()
  }
}
