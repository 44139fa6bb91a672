package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The DataSourceV2 surface over the snapshot format: format-string
  * reads, option-driven time travel, and — the part that matters at
  * 100 TB — proof that the manifest indirection costs nothing: filters
  * still reach the parquet row-group stats and projections still prune
  * the read schema, exactly as a direct-path scan.
  */
class SnapshotV2Spec extends SparkTestBase {

  import spark.implicits._

  private def committed(): String = {
    val t = Files.createTempDirectory("snapv2").resolve("t").toString
    Snapshots.commit((1L to 500L).toDF("id")
      .withColumn("v", col("id") * 7)
      .repartitionByRange(4, col("id")), t)
    Snapshots.commit((501L to 600L).toDF("id")
      .withColumn("v", col("id") * 7), t)
    t
  }

  test("format read equals the programmatic read; asOf time-travels") {
    val t = committed()
    val viaFormat = spark.read.format("graft-snapshot").option("path", t).load()
    assert(viaFormat.count() === 600)
    assert(viaFormat.collect().map(_.getLong(0)).toSet ===
      Snapshots.read(spark, t).collect().map(_.getLong(0)).toSet)
    val v1 = spark.read.format("graft-snapshot")
      .option("path", t).option("asOf", 1).load()
    assert(v1.count() === 500)
    assert(v1.agg(max("id")).head().getLong(0) === 500L)
  }

  test("pushdown survives the manifest indirection: PushedFilters + pruned ReadSchema") {
    val t = committed()
    val q = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("id") === 42L).select("v")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(294L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,42)]"), plan)
    // column pruning: the scan reads only what the query needs
    assert(plan.contains("ReadSchema: struct<id:bigint,v:bigint>"), plan)
  }

  test("V2 reads skip files at the manifest level: pushed filters prune before the scan") {
    import graft.sources.FileStats
    val t = Files.createTempDirectory("snapv2skip").resolve("t").toString
    Snapshots.commit((1L to 1000L).toDF("id").withColumn("v", col("id") * 7)
      .repartitionByRange(8, col("id")), t)
    FileStats.lastSourcePrune = None
    val rows = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("id") === 500L).select("v").as[Long].collect()
    assert(rows.toSeq === Seq(3500L))
    // the pushed filter reached the manifest-level pruner and a strict
    // subset of the 8 range files survived
    FileStats.lastSourcePrune match {
      case Some((kept, total)) =>
        assert(total === 8 && kept === 1, s"pruned $kept/$total")
      case None => fail("V2 scan never consulted the file-skipping pruner")
    }
    // a non-selective read keeps everything and stays correct
    assert(spark.read.format("graft-snapshot").option("path", t).load()
      .count() === 1000)
  }

  test("a format read pins its version: concurrent commits stay invisible") {
    val t = committed()
    val pinned = spark.read.format("graft-snapshot").option("path", t).load()
    Snapshots.commit(Seq((9999L, 1L)).toDF("id", "v"), t)
    // the file list was resolved at load(); the new commit is not in it
    assert(pinned.filter(col("id") === 9999L).count() === 0)
    assert(spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("id") === 9999L).count() === 1)
  }

  test("format write creates a fresh table: first append commits v1") {
    val t = Files.createTempDirectory("snapv2w").resolve("t").toString
    (1L to 100L).toDF("id").withColumn("v", col("id") * 3)
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    assert(Snapshots.versions(spark, t) === Seq(1L))
    val back = spark.read.format("graft-snapshot").option("path", t).load()
    assert(back.count() === 100)
    assert(back.agg(sum("v")).head().getLong(0) === (1L to 100L).map(_ * 3).sum)
  }

  test("format append on an existing table adds a version; time travel crosses it") {
    val t = committed() // v1 = 500 rows, v2 = +100
    (601L to 650L).toDF("id").withColumn("v", col("id") * 7)
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    assert(Snapshots.versions(spark, t) === Seq(1L, 2L, 3L))
    assert(spark.read.format("graft-snapshot").option("path", t).load()
      .count() === 650)
    // the pre-write version is untouched by the V2 write
    assert(spark.read.format("graft-snapshot")
      .option("path", t).option("asOf", 2).load().count() === 600)
  }

  test("format overwrite replaces the live file set but keeps history readable") {
    val t = committed()
    Seq((1L, 999L)).toDF("id", "v")
      .write.format("graft-snapshot").option("path", t).mode("overwrite").save()
    val live = spark.read.format("graft-snapshot").option("path", t).load()
    assert(live.count() === 1)
    assert(live.head().getLong(1) === 999L)
    // overwrite is a new VERSION, not a data purge: v2 still reads in full
    assert(spark.read.format("graft-snapshot")
      .option("path", t).option("asOf", 2).load().count() === 600)
  }

  test("a V2 write round-trips through the programmatic read (one format, two APIs)") {
    val t = Files.createTempDirectory("snapv2w2").resolve("t").toString
    Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    assert(Snapshots.read(spark, t).orderBy("k").collect().map(_.getString(0)).toSeq
      === Seq("a", "b"))
  }

  test("append with a mismatched schema is rejected against the COMMITTED schema") {
    val t = committed() // (id, v) bigint columns
    val err = intercept[IllegalArgumentException] {
      Seq(("oops", 1.5)).toDF("wrong_col", "v2")
        .write.format("graft-snapshot").option("path", t).mode("append").save()
    }
    assert(err.getMessage.contains("does not match committed schema"), err.getMessage)
    // reordered columns of the RIGHT schema are realigned, not rejected
    Seq((7777L, 601L)).toDF("v", "id").select(col("v"), col("id"))
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    val row = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("id") === 601L).select("v").as[Long].collect()
    assert(row.toSeq === Seq(7777L)) // landed in the id/v slots, not v/id
  }

  test("strict append re-validates at commit time: a raced schema-evolving overwrite fails the append, never mixes layouts") {
    // the V2 pre-check reads the committed schema, then commits — a
    // schema-evolving overwrite landing in between must fail the append
    // at the commit's own in-lock validation, not slip a second physical
    // layout into the new manifest. Simulate the lost race by calling
    // the strict commit directly AFTER the overwrite (equivalent to the
    // pre-check having passed against the stale version).
    val t = committed() // (id, v) bigint — the append's target schema
    // concurrent writer: overwrite evolves the schema to (id, w double)
    Snapshots.commit(Seq((1L, 0.5)).toDF("id", "w"), t, overwrite = true)
    val vsBefore = Snapshots.versions(spark, t)
    val err = intercept[IllegalStateException] {
      Snapshots.commit(Seq((601L, 77L)).toDF("id", "v"), t,
        strictAppendSchema = true)
    }
    assert(err.getMessage.contains("at commit time"), err.getMessage)
    // no version published, and the evolved table still reads cleanly
    assert(Snapshots.versions(spark, t) === vsBefore)
    assert(Snapshots.read(spark, t).columns.sorted.toSeq === Seq("id", "w"))
    // matching-schema strict append still lands
    Snapshots.commit(Seq((2L, 1.5)).toDF("id", "w"), t,
      strictAppendSchema = true)
    assert(Snapshots.read(spark, t).count() === 2)
  }

  test("hammer: strict appends raced against schema-evolving overwrites never mix layouts in a manifest") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = Files.createTempDirectory("snapv2race").resolve("t").toString
    Snapshots.commit(Seq((0L, 0L)).toDF("id", "v"), t)
    val appends = Future {
      (1 to 12).map { i =>
        try { Snapshots.commit(Seq((i.toLong, i.toLong)).toDF("id", "v"), t,
          strictAppendSchema = true); "ok" }
        catch { case _: IllegalStateException => "rejected" }
      }
    }
    val overwrites = Future {
      (1 to 6).foreach { i =>
        // alternate the schema: (id, v) bigint ↔ (id, w) double
        val df = if (i % 2 == 0) Seq((i.toLong, i.toLong)).toDF("id", "v")
          else Seq((i.toLong, i * 0.5)).toDF("id", "w")
        Snapshots.commit(df, t, overwrite = true)
      }
    }
    Await.result(appends.zip(overwrites), 120.seconds)
    // THE invariant: every published manifest's data files agree on one
    // schema signature — a strict append that raced an evolving
    // overwrite either failed or extended a same-schema base
    for (v <- Snapshots.versions(spark, t)) {
      val sigs = Snapshots.dataFiles(spark, t, Some(v))
        .map(f => spark.read.parquet(f).schema.fields
          .map(fl => (fl.name, fl.dataType.simpleString)).sortBy(_._1).toSeq)
        .distinct
      assert(sigs.size === 1, s"manifest v$v mixes layouts: $sigs")
    }
  }

  test("a user-supplied read schema that differs from the committed one fails loudly") {
    val t = committed()
    val err = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .schema(org.apache.spark.sql.types.StructType.fromDDL("id INT, bogus STRING"))
        .option("path", t).load().collect()
    }
    assert(err.getMessage.contains("committed schema"), err.getMessage)
  }

  test("missing path / unknown version fail loudly") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").load()
    }
    val t = committed()
    intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("path", t).option("asOf", 99).load()
    }
  }
}
