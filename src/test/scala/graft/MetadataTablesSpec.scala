package graft

import java.nio.file.Files

import graft.sources.Snapshots

/** Iceberg-style SQL metadata tables: `SELECT * FROM cat.ns.t.history`
  * / `.files` / `.tags` serve the parent table's manifest state as
  * read-only rows. Driver-materialized LocalScan, bounded by
  * file/version count — the manifest-algebra envelope.
  */
class MetadataTablesSpec extends SparkTestBase {

  private def freshCat(): (String, String) = {
    val wh = Files.createTempDirectory("graft-meta").toString
    val cat = s"graft_meta_${wh.hashCode.abs}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.m")
    (cat, wh)
  }

  test("history / files / tags read the live manifest state from SQL") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.m.mt (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.m.mt VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.m.mt VALUES (3, 'c')")
    spark.sql(s"CALL $cat.system.tag('m.mt', 'audited', 2)")

    val hist = spark.sql(s"SELECT version, n_files FROM $cat.m.mt.history " +
      "ORDER BY version").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(hist.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(hist.last._2 >= 2, "v3 must reference at least both insert files")

    val files = spark.sql(
      s"SELECT path, rows, size_bytes FROM $cat.m.mt.files").collect()
    assert(files.length === hist.last._2)
    // exact footer row counts ride the stats sidecar; sizes are real
    assert(files.map(r => r.getLong(1)).sum === 3L,
      "rows across current files must equal the table's row count")
    assert(files.forall(_.getLong(2) > 0L), "on-disk sizes must be real")

    val tags = spark.sql(s"SELECT name, version FROM $cat.m.mt.tags")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(tags.toSeq === Seq(("audited", 2L)))
  }

  test("the metadata suffix never shadows a real table, and misses stay loud") {
    val (cat, _) = freshCat()
    // a REAL table named 'history' under a namespace resolves normally
    spark.sql(s"CREATE TABLE $cat.m.history (x BIGINT)")
    spark.sql(s"INSERT INTO $cat.m.history VALUES (42)")
    assert(spark.sql(s"SELECT x FROM $cat.m.history")
      .collect().map(_.getLong(0)).toSeq === Seq(42L))
    // a metadata suffix on a NON-table parent is a plain missing table
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.m.nope.files").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("files time-travels by version and tag; ledgers refuse AS OF loudly") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.m.tt (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.m.tt VALUES (1)")
    spark.sql(s"INSERT INTO $cat.m.tt VALUES (2)")
    spark.sql(s"CALL $cat.system.tag('m.tt', 'two', 2)")
    val atV2 = spark.sql(s"SELECT path FROM $cat.m.tt.files VERSION AS OF 2")
      .count()
    val atHead = spark.sql(s"SELECT path FROM $cat.m.tt.files").count()
    assert(atV2 < atHead, "v2's file set must be smaller than head's")
    assert(spark.sql(
      s"SELECT path FROM $cat.m.tt.files VERSION AS OF 'two'").count() === atV2)
    // history/tags are whole-table ledgers — AS OF is refused, not
    // silently ignored
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.m.tt.history VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("time travel"))
  }

  test("files reports bucket tags on a bucketed table") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.m.bt (k BIGINT, v BIGINT) " +
      s"PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.m.bt SELECT id, id FROM range(100)")
    val buckets = spark.sql(s"SELECT bucket FROM $cat.m.bt.files").collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(buckets.forall(_ >= 0), "every file of a bucketed table is tagged")
    assert(Snapshots.bucketSpec(spark, s"$wh/m/bt") === Some(("k", 4)))
  }

  test("partition_specs / materialized_views / retention expose the round-11 surfaces") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.m.ps (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (months(ts))")
    spark.sql(s"CALL $cat.system.evolve_partition_spec(" +
      "table => 'm.ps', spec => 'days(ts)')")
    val specs = spark.sql(s"SELECT epoch, transform, source_column, is_current " +
      s"FROM $cat.m.ps.partition_specs ORDER BY epoch").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(specs.toSeq === Seq((1, "months", "ts", false),
      (2, "days", "ts", true)))
    // retention: empty until declared, one row after
    assert(spark.sql(s"SELECT * FROM $cat.m.ps.retention").count() === 0L)
    spark.sql(s"CALL $cat.system.set_retention(table => 'm.ps', " +
      "keep_versions => 3, keep_days => 30)")
    val ret = spark.sql(s"SELECT keep_versions, keep_days " +
      s"FROM $cat.m.ps.retention").head
    assert(ret.getInt(0) === 3 && ret.getInt(1) === 30)
    // materialized_views: registered + staleness vs the base head
    spark.sql(s"CREATE TABLE $cat.m.mb AS SELECT * FROM VALUES " +
      "(1L, 'x', 5L), (2L, 'y', 7L) AS t(id, grp, v)")
    spark.sql(s"CALL $cat.system.create_materialized_view(" +
      "view => 'm.mbv', base => 'm.mb', group_by => 'grp', " +
      "aggs => 'sum(v) as sv')")
    def mvRow() = spark.sql(s"SELECT name, refreshed_through, base_head, " +
      s"stale FROM $cat.m.mb.materialized_views").head
    assert(mvRow().getString(0) === "mbv" && !mvRow().getBoolean(3))
    spark.sql(s"INSERT INTO $cat.m.mb VALUES (3L, 'x', 100L)")
    assert(mvRow().getBoolean(3), "an un-refreshed view reports stale")
    spark.sql(s"CALL $cat.system.refresh_mv(view => 'm.mbv')")
    val r = mvRow()
    assert(!r.getBoolean(3) && r.getLong(1) === r.getLong(2))
  }

  test("SHOW TBLPROPERTIES reflects the declared specs live") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.m.tp (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read', " +
      "'retention.versions' = '5')")
    def props() = spark.sql(s"SHOW TBLPROPERTIES $cat.m.tp").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val p0 = props()
    assert(p0.get("partition.spec") === Some("days(ts)"))
    assert(p0.get("write.delete.mode") === Some("merge-on-read"))
    assert(p0.get("retention.versions") === Some("5"))
    // live: evolving the spec changes what SHOW prints
    spark.sql(s"CALL $cat.system.evolve_partition_spec(" +
      "table => 'm.tp', spec => 'months(ts)')")
    assert(props().get("partition.spec") === Some("months(ts)"))
    spark.sql(s"CALL $cat.system.evolve_partition_spec(" +
      "table => 'm.tp', spec => 'none')")
    assert(!props().contains("partition.spec"))
  }
}
