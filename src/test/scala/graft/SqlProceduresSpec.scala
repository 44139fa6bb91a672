package graft

import java.nio.file.Files

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** `CALL <cat>.system.<proc>(...)` — table maintenance from plain SQL
  * through the ProcedureCatalog surface (SnapshotProcedures): compact,
  * optimize_zorder, restore, vacuum, gc, history. Each must behave
  * exactly like its Scala counterpart (same commit protocol) and return
  * its outcome as a result set.
  */
class SqlProceduresSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graftprocwh").toString
    spark.conf.set("spark.sql.catalog.proc_cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.proc_cat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS proc_cat.ns")
    dir
  }

  private def mk(name: String): String = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS proc_cat.ns.$name")
    spark.sql(s"CREATE TABLE proc_cat.ns.$name (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO proc_cat.ns.$name VALUES (1, 10), (2, 20)")
    spark.sql(s"INSERT INTO proc_cat.ns.$name VALUES (3, 30), (4, 40)")
    name
  }

  test("CALL compact merges small files, row-preserving, and returns the version") {
    val t = mk("c")
    val filesBefore = Snapshots.dataFiles(spark, s"$wh/ns/c", None).size
    assert(filesBefore > 1)
    val out = spark.sql(
      "CALL proc_cat.system.compact(table => 'ns.c', num_files => 1)").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(4L)) // create+2 inserts -> v4
    assert(Snapshots.dataFiles(spark, s"$wh/ns/c", None).size === 1)
    assert(spark.sql(s"SELECT sum(v) FROM proc_cat.ns.$t").head().getLong(0) === 100L)
  }

  test("CALL restore rolls back metadata-only; history lists every version") {
    val t = mk("r")
    spark.sql(s"DELETE FROM proc_cat.ns.$t WHERE id >= 3") // v4
    assert(spark.sql(s"SELECT count(*) FROM proc_cat.ns.$t").head().getLong(0) === 2L)
    val v = spark.sql(
      "CALL proc_cat.system.restore(table => 'ns.r', version => 3)")
      .head().getLong(0)
    assert(v === 5L)
    assert(spark.sql(s"SELECT count(*) FROM proc_cat.ns.$t").head().getLong(0) === 4L)
    val hist = spark.sql("CALL proc_cat.system.history(table => 'ns.r')")
      .select("version").collect().map(_.getLong(0)).toSeq
    assert(hist === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("CALL optimize_zorder re-clusters, row-preserving") {
    mk("z")
    val out = spark.sql(
      "CALL proc_cat.system.optimize_zorder(table => 'ns.z', " +
        "col1 => 'id', col2 => 'v', num_files => 1)").collect()
    assert(out.head.getLong(0) === 4L)
    assert(spark.sql("SELECT sum(v) FROM proc_cat.ns.z").head().getLong(0) === 100L)
  }

  test("CALL vacuum expires history; gc with default grace reclaims nothing live") {
    mk("g")
    assert(spark.sql("CALL proc_cat.system.gc(table => 'ns.g')")
      .head().getInt(0) === 0)
    val deleted = spark.sql(
      "CALL proc_cat.system.vacuum(table => 'ns.g', keep_versions => 1)")
      .head().getInt(0)
    assert(deleted >= 0)
    assert(Snapshots.versions(spark, s"$wh/ns/g") === Seq(3L))
    assert(spark.sql("SELECT sum(v) FROM proc_cat.ns.g").head().getLong(0) === 100L)
  }

  test("CALL table_changes returns the version-ranged per-commit feed") {
    val t = mk("tc")
    spark.sql(s"DELETE FROM proc_cat.ns.$t WHERE id = 2")          // v4
    spark.sql(s"INSERT INTO proc_cat.ns.$t VALUES (5, 50)")        // v5
    val feed = spark.sql("CALL proc_cat.system.table_changes(" +
      "table => 'ns.tc', from_version => 3, to_version => 5)")
    // dynamic result schema: table columns + the CDC metadata pair
    assert(feed.columns.toSet ===
      Set("id", "v", "_change_type", "_commit_version"))
    val rows = feed.select("_commit_version", "_change_type", "id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows === Set((4L, "delete", 2L, 20L), (5L, "insert", 5L, 50L)))
    // empty range: zero rows, not an error
    assert(spark.sql("CALL proc_cat.system.table_changes(" +
      "table => 'ns.tc', from_version => 5, to_version => 5)").count() === 0L)
    // the Scala guard surfaces through SQL: an uncommitted version
    // refuses loudly instead of returning a silent empty feed
    val e = intercept[Exception] {
      spark.sql("CALL proc_cat.system.table_changes(" +
        "table => 'ns.tc', from_version => 1, to_version => 99)")
    }
    assert(e.getMessage.contains("99"))
    // driver-materialization cap: a change set over the row cap refuses
    // with the distributed-consumer hint instead of OOMing the driver
    try {
      spark.conf.set("graft.snapshot.procedureMaxRows", "1")
      val big = intercept[Exception] {
        spark.sql("CALL proc_cat.system.table_changes(" +
          "table => 'ns.tc', from_version => 3, to_version => 5)")
      }
      assert(big.getMessage.contains("readChangeFeed"))
    } finally spark.conf.unset("graft.snapshot.procedureMaxRows")
  }

  test("SHOW PROCEDURES lists the system namespace; unknown procedure fails loudly") {
    wh
    val df = spark.sql("SHOW PROCEDURES IN proc_cat.system")
    val nameCol = df.columns.find(_.toLowerCase.contains("procedure"))
      .getOrElse(df.columns.last)
    val listed = df.select(nameCol).collect().map(_.getString(0)).toSet
    assert(Set("compact", "optimize_zorder", "restore", "vacuum", "gc",
      "history").subsetOf(listed))
    val e = intercept[Exception] {
      spark.sql("CALL proc_cat.system.nope(table => 'ns.g')")
    }
    assert(e.getMessage.contains("nope"))
  }
}
