package graft

import graft.sources.{FileStats, Snapshots}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The two sidecar-stats scan shortcuts on the V2 snapshot read path,
  * and the statistics report that feeds the optimizer:
  *
  *  - metadata-only aggregates: unfiltered COUNT/MIN/MAX answered from
  *    parquet footer counters as a driver-local one-row scan — at
  *    100 TB these queries never open a data file;
  *  - exact row-count statistics on the plain scan, so the optimizer
  *    sees real cardinality for a snapshot table instead of a
  *    size-derived guess;
  *  - runtime (DPP-style) file skipping: a broadcast join against a
  *    selective dimension prunes fact FILES with the join keys Spark
  *    harvests at runtime — the stats-column generalization of
  *    hive-partition DPP.
  */
class SnapshotScanStatsSpec extends SparkTestBase {

  import spark.implicits._

  /** 4 commits × 1 range-disjoint file each over id∈[1,1000]; `flag`
    * is NULL on multiples of 10 (so COUNT(col) ≠ COUNT(*)).
    */
  private def rangedTable(): String = {
    val t = Files.createTempDirectory("snapstats").resolve("t").toString
    for (lo <- Seq(1L, 251L, 501L, 751L)) {
      Snapshots.commit(
        (lo until lo + 250L).toDF("id")
          .withColumn("v", col("id") * 7)
          .withColumn("flag", when(col("id") % 10 =!= 0, col("id") % 5))
          .coalesce(1),
        t)
    }
    t
  }

  private def snap(t: String): DataFrame =
    spark.read.format("graft-snapshot").option("path", t).load()

  test("unfiltered COUNT/MIN/MAX is answered from the manifest: LocalTableScan, no parquet scan") {
    val t = rangedTable()
    val agg = snap(t).agg(
      count(lit(1)).as("n"),
      count(col("flag")).as("n_flag"),
      min(col("id")).as("min_id"),
      max(col("id")).as("max_id"))
    val row = agg.head()
    assert(row.getLong(0) === 1000L)
    assert(row.getLong(1) === 900L) // 100 multiples of 10 are NULL
    assert(row.getLong(2) === 1L && row.getLong(3) === 1000L)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("metadata-agg"),
      s"expected a metadata-only scan, got:\n$plan")
    assert(!plan.contains("Parquet"), s"data files were opened:\n$plan")
  }

  test("plain count() on a snapshot table is metadata-only and exact") {
    val t = rangedTable()
    val df = snap(t)
    assert(df.count() === 1000L)
    // and stays exact across a COW delete (files rewritten, stats re-recorded)
    Snapshots.deleteWhere(spark, t, col("id") > 900L)
    assert(snap(t).count() === 900L)
  }

  test("the exactness gate declines what footers cannot answer: filters, SUM, floats — and stays correct") {
    val t = rangedTable()
    // filtered: footer counters describe whole files → scan path
    val filtered = snap(t).filter(col("id") <= 100L).agg(count(lit(1)).as("n"))
    assert(filtered.head().getLong(0) === 100L)
    assert(filtered.queryExecution.executedPlan.toString.contains("Parquet"),
      "a filtered count must not take the metadata path")
    // SUM has no footer counterpart → scan path, correct values
    val summed = snap(t).agg(sum(col("v")).as("s"))
    assert(summed.head().getLong(0) === (1L to 1000L).map(_ * 7).sum)
    assert(summed.queryExecution.executedPlan.toString.contains("Parquet"))
    // MIN over a double column declines (NaN-blind footers) but computes
    val d = Files.createTempDirectory("snapstatsd").resolve("t").toString
    Snapshots.commit(Seq((1L, 2.5), (2L, -3.5)).toDF("id", "x"), d)
    val mm = spark.read.format("graft-snapshot").option("path", d).load()
      .agg(min(col("x")).as("mn"))
    assert(mm.head().getDouble(0) === -3.5)
    assert(mm.queryExecution.executedPlan.toString.contains("Parquet"))
  }

  test("MIN/MAX over an all-NULL column is NULL via metadata") {
    val t = Files.createTempDirectory("snapstatsn").resolve("t").toString
    Snapshots.commit(
      Seq[(Long, Option[Long])]((1L, None), (2L, None)).toDF("id", "m"), t)
    val agg = spark.read.format("graft-snapshot").option("path", t).load()
      .agg(min(col("m")).as("mn"), max(col("m")).as("mx"), count(col("m")).as("n"))
    val row = agg.head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.getLong(2) === 0L)
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("the plain scan reports EXACT row count to the optimizer") {
    val t = rangedTable()
    val df = snap(t)
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan
    }.getOrElse(fail("no V2 scan relation in the plan"))
    val stats = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows.isPresent && stats.numRows.getAsLong === 1000L)
    assert(stats.sizeInBytes.isPresent && stats.sizeInBytes.getAsLong > 0L)
  }

  test("q96_metadata_agg: the registered oracle query takes the metadata path") {
    val df = run("q96_metadata_agg")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected metadata-only plan:\n$plan")
    assert(!plan.contains("Parquet"), s"data files were opened:\n$plan")
    val row = df.head()
    assert(row.getLong(0) === 1000L) // sf0.001 events
    assert(row.getLong(1) < 1000L && row.getLong(1) > 0L)
  }

  test("runtime file skipping: a selective broadcast join prunes fact files with runtime keys") {
    val t = rangedTable()
    // the dim must be file-backed: a LocalRelation's filter constant-folds
    // away at optimization, and DPP requires a surviving selective
    // predicate on the build side
    val dimPath = Files.createTempDirectory("snapstatsdim").resolve("d").toString
    Seq((600L, "keep"), (610L, "keep"), (620L, "drop")).toDF("k", "tag")
      .write.parquet(dimPath)
    val fact = snap(t)
    val dimF = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    FileStats.lastRuntimePrune = None
    val joined = fact.join(dimF, fact("id") === dimF("k"))
    val got = joined.select(col("k"), col("v")).as[(Long, Long)].collect().toSet
    assert(got === Set((600L, 4200L), (610L, 4270L)))
    FileStats.lastRuntimePrune match {
      case Some((kept, total)) =>
        // keys 600/610 live in one of the four range files
        assert(kept < total, s"runtime prune kept $kept/$total")
        assert(kept === 1 && total === 4, s"runtime prune kept $kept/$total")
      case None =>
        val plan = joined.queryExecution.executedPlan.toString
        fail(s"runtime filter never reached the snapshot scan; plan:\n$plan")
    }
  }
}
