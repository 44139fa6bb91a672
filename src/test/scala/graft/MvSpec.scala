package graft

import graft.sources.{MaterializedViews => MV, Snapshots}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Declarative incremental materialized views: create/refresh over the
  * change feed, the base+delta == recompute identity across every DML
  * form, emptied-group drops, NULL keys and NULL aggregates,
  * compaction/vacuum interplay, maintain()'s auto-refresh, the SQL
  * procedure surface, and the incrementalizable-contract refusals.
  */
class MvSpec extends SparkTestBase {

  import spark.implicits._

  private def fresh(tag: String): (String, String) = {
    val d = Files.createTempDirectory(s"mv-$tag").toString
    (s"$d/base", s"$d/view")
  }

  /** recompute the MV's query from the base directly */
  private def recompute(base: String): DataFrame =
    Snapshots.read(spark, base).groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum("v").cast("string").as("sv"))

  test("incremental refresh equals full recompute across append/merge/MOR-delete; groups drop") {
    val (base, view) = fresh("identity")
    Snapshots.commit((1L to 400L).map(i =>
      (i, if (i % 100 == 0) null else s"g${i % 4}", i * 3))
      .toDF("id", "grp", "v"), base)
    MV.create(spark, view, base, Seq("grp"),
      Seq(MV.AggDef("count", "*", "n"), MV.AggDef("sum", "v", "sv")))
    // v2 append (adds a brand-new group g9)
    Snapshots.commit((401L to 500L).map(i => (i, "g9", i * 3))
      .toDF("id", "grp", "v"), base)
    // v3 COW merge upsert: moves ids 1-50 into group gX
    Snapshots.merge(spark, base,
      (1L to 50L).map(i => (i, "gX", i * 100)).toDF("id", "grp", "v"), "id")
    // v4 MOR delete: empties g9 entirely
    Snapshots.deleteWhereMor(spark, base, col("grp") === "g9")
    MV.refresh(spark, view)
    val got = MV.read(spark, view)
      .select(col("grp"), col("n"), col("sv").cast("string").as("sv"))
    val want = recompute(base)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"mv=${got.collect().toSeq} recompute=${want.collect().toSeq}")
    // the emptied group is GONE, not zero
    assert(MV.read(spark, view).filter(col("grp") === "g9").count() === 0L)
    // NULL group key survived as its own group (null-safe combine)
    assert(MV.read(spark, view).filter(col("grp").isNull).count() === 1L)
  }

  test("avg serves sum/count; all-null groups serve NULL; no-op refresh keeps the version") {
    val (base, view) = fresh("avg")
    Snapshots.commit(Seq(
      (1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "a", java.lang.Long.valueOf(20L)),
      (3L, "b", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "grp", "v"), base)
    MV.create(spark, view, base, Seq("grp"),
      Seq(MV.AggDef("avg", "v", "av"), MV.AggDef("sum", "v", "sv"),
        MV.AggDef("count", "v", "nv")))
    val rows = MV.read(spark, view).orderBy("grp").collect()
    assert(rows(0).getString(0) === "a" && rows(0).getDouble(1) === 15.0)
    assert(rows(1).getString(0) === "b" && rows(1).isNullAt(1) &&
      rows(1).isNullAt(2) && rows(1).getLong(3) === 0L)
    val v1 = MV.refresh(spark, view) // base unchanged → same version
    assert(v1 === Snapshots.versions(spark, view).last)
    assert(MV.refreshedThrough(spark, view) ===
      Snapshots.versions(spark, base).last)
    // delta flips b's null to a value; avg follows
    Snapshots.merge(spark, base,
      Seq((3L, "b", 30L)).toDF("id", "grp", "v"), "id")
    MV.refresh(spark, view)
    val b = MV.read(spark, view).filter(col("grp") === "b").head
    assert(b.getDouble(1) === 30.0 && b.getLong(3) === 1L)
  }

  test("refresh across a compaction is a no-op fold; vacuum past the mark falls back to full recompute") {
    val (base, view) = fresh("maint")
    Snapshots.commit((1L to 100L).map(i => (i, s"g${i % 3}", i))
      .toDF("id", "grp", "v"), base)
    MV.create(spark, view, base, Seq("grp"),
      Seq(MV.AggDef("count", "*", "n"), MV.AggDef("sum", "v", "sv")))
    Snapshots.compact(spark, base) // row-preserving
    val v = MV.refresh(spark, view)
    assert(MV.refreshedThrough(spark, view) ===
      Snapshots.versions(spark, base).last)
    val got = MV.read(spark, view)
      .select(col("grp"), col("n"), col("sv").cast("string").as("sv"))
    assert(got.exceptAll(recompute(base)).isEmpty)
    // append twice, vacuum history out from under the refresh mark
    Snapshots.commit(Seq((101L, "g0", 7L)).toDF("id", "grp", "v"), base)
    Snapshots.commit(Seq((102L, "g1", 9L)).toDF("id", "grp", "v"), base)
    Snapshots.vacuum(spark, base, keepVersions = 1)
    assert(!Snapshots.versions(spark, base)
      .contains(MV.refreshedThrough(spark, view)))
    MV.refresh(spark, view) // full-recompute fallback
    val got2 = MV.read(spark, view)
      .select(col("grp"), col("n"), col("sv").cast("string").as("sv"))
    assert(got2.exceptAll(recompute(base)).isEmpty &&
      recompute(base).exceptAll(got2).isEmpty)
    assert(v > 0)
  }

  test("maintain() auto-refreshes registered stale views") {
    val (base, view) = fresh("auto")
    Snapshots.commit((1L to 60L).map(i => (i, s"g${i % 2}", i))
      .toDF("id", "grp", "v"), base)
    MV.create(spark, view, base, Seq("grp"),
      Seq(MV.AggDef("sum", "v", "sv")))
    assert(MV.registered(spark, base).map(_._1) ===
      Seq(new org.apache.hadoop.fs.Path(view).getName))
    Snapshots.commit(Seq((61L, "g0", 1000L)).toDF("id", "grp", "v"), base)
    val actions = Snapshots.maintain(spark, base)
    assert(actions.exists(_._1 == "refresh_mv"), s"got $actions")
    val got = MV.read(spark, view)
      .select(col("grp"), col("sv").cast("string").as("sv"))
    val want = Snapshots.read(spark, base).groupBy("grp")
      .agg(sum("v").cast("string").as("sv"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // idempotent second pass: nothing stale
    assert(!Snapshots.maintain(spark, base).exists(_._1 == "refresh_mv"))
    MV.drop(spark, view)
    assert(MV.registered(spark, base).isEmpty)
  }

  test("SQL procedures: create_materialized_view + refresh_mv") {
    val wh = Files.createTempDirectory("mv-sql").toString
    val c = s"mvcat_${Tables.dirKey(wh)}"
    spark.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    spark.sql(s"CREATE TABLE $c.ns.b AS SELECT * FROM VALUES " +
      "(1L, 'x', 10L), (2L, 'x', 20L), (3L, 'y', 5L) AS t(id, grp, v)")
    spark.sql(s"CALL $c.system.create_materialized_view(" +
      "view => 'ns.bv', base => 'ns.b', group_by => 'grp', " +
      "aggs => 'count(*) as n, sum(v) as sv', filter => 'v > 6')")
    spark.sql(s"INSERT INTO $c.ns.b VALUES (4L, 'y', 100L)")
    spark.sql(s"CALL $c.system.refresh_mv(view => 'ns.bv')")
    val rows = MV.read(spark, s"$wh/ns/bv").orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("x", 2L, 30L), ("y", 1L, 100L)))
  }

  test("refusals: min/max, no groups, dup aliases, unknown column, double create") {
    val (base, view) = fresh("refuse")
    Snapshots.commit(Seq((1L, "a", 2L)).toDF("id", "grp", "v"), base)
    def deny(body: => Any, frag: String): Unit = {
      val e = intercept[Exception](body)
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    deny(MV.create(spark, s"$view-m", base, Seq("grp"),
      Seq(MV.AggDef("min", "v", "m"))), "not incrementalizable")
    deny(MV.create(spark, s"$view-g", base, Nil,
      Seq(MV.AggDef("sum", "v", "s"))), "grouping column")
    deny(MV.create(spark, s"$view-d", base, Seq("grp"),
      Seq(MV.AggDef("sum", "v", "grp"))), "duplicate output")
    deny(MV.create(spark, s"$view-c", base, Seq("grp"),
      Seq(MV.AggDef("sum", "nope", "s"))), "not a column")
    MV.create(spark, view, base, Seq("grp"), Seq(MV.AggDef("sum", "v", "s")))
    deny(MV.create(spark, view, base, Seq("grp"),
      Seq(MV.AggDef("sum", "v", "s"))), "already exists")
  }
}
