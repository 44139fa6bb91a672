package graft

import java.nio.file.Files

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over bucketed snapshot tables: two tables
  * committed with the same `bucket(n, key)` layout equi-join on the
  * key with ZERO exchanges — the scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, the catalog's `bucket`
  * function anchors compatibility, and EnsureRequirements drops both
  * shuffles. At 100 TB this is the difference between moving both
  * fact tables over the network and moving nothing.
  */
class BucketedJoinSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val wh = {
    val dir = Files.createTempDirectory("graftbwh").toString
    spark.conf.set("spark.sql.catalog.bj_cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.bj_cat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bj_cat.ns")
    dir
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE settles
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("co-bucketed tables join with zero exchanges; values match the unbucketed join") {
    wh
    val left = (1L to 4000L).toDF("k").withColumn("lv", col("k") * 3)
    val right = (2001L to 6000L).toDF("k").withColumn("rv", col("k") % 97)
    Snapshots.commitBucketed(left, s"$wh/ns/bl", "k", 8)
    Snapshots.commitBucketed(right, s"$wh/ns/br", "k", 8)

    // hint("merge") forces SMJ over broadcast so the exchange question
    // is the join's, not the dimension-size heuristic's
    val a = spark.table("bj_cat.ns.bl").hint("merge")
    val b = spark.table("bj_cat.ns.br")
    val joined = a.join(b, "k").agg(
      count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))

    val expected = left.join(right, "k")
      .agg(count(lit(1)), sum(col("lv") + col("rv"))).head()
    val got = joined.head()
    assert(got.getLong(0) === expected.getLong(0))
    assert(got.getLong(1) === expected.getLong(1))
    assert(got.getLong(0) === 2000L)

    // the join itself is exchange-free: the only Exchange left is the
    // final single-group aggregation's
    val plan = {
      val j = spark.table("bj_cat.ns.bl").hint("merge")
        .join(spark.table("bj_cat.ns.br"), "k")
      j.collect()
      j.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Exchange"),
      s"expected a shuffle-free storage-partitioned join:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("appends keep the layout: a second bucketed commit still joins shuffle-free") {
    wh
    Snapshots.commitBucketed((1L to 1000L).toDF("k").withColumn("v", col("k")),
      s"$wh/ns/ap1", "k", 4)
    Snapshots.commitBucketed((1001L to 2000L).toDF("k").withColumn("v", col("k")),
      s"$wh/ns/ap1", "k", 4)
    Snapshots.commitBucketed((1L to 2000L).toDF("k").withColumn("w", col("k") * 2),
      s"$wh/ns/ap2", "k", 4)
    val j = spark.table("bj_cat.ns.ap1").hint("merge")
      .join(spark.table("bj_cat.ns.ap2"), "k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(j.count() === 2000L)
  }

  test("a mismatched bucket count falls back to a normal shuffled join, correct values") {
    wh
    Snapshots.commitBucketed((1L to 500L).toDF("k").withColumn("v", col("k")),
      s"$wh/ns/m8", "k", 8)
    Snapshots.commitBucketed((1L to 500L).toDF("k").withColumn("w", col("k")),
      s"$wh/ns/m4", "k", 4)
    val j = spark.table("bj_cat.ns.m8").hint("merge")
      .join(spark.table("bj_cat.ns.m4"), "k")
    assert(j.count() === 500L)
    assert(shuffles(spark.table("bj_cat.ns.m8").hint("merge")
      .join(spark.table("bj_cat.ns.m4"), "k")) > 0)
  }

  test("SQL DDL route: PARTITIONED BY (bucket(n, col)) + INSERT INTO routes through the bucketed writer") {
    wh
    spark.sql("CREATE TABLE bj_cat.ns.ddl1 (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE bj_cat.ns.ddl2 (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bj_cat.ns.ddl1 " +
      "SELECT id AS k, id * 2 AS v FROM range(1, 1001)")
    spark.sql("INSERT INTO bj_cat.ns.ddl2 " +
      "SELECT id AS k, id * 5 AS w FROM range(500, 1501)")
    assert(Snapshots.bucketSpec(spark, s"$wh/ns/ddl1").contains(("k", 4)))
    val j = spark.table("bj_cat.ns.ddl1").hint("merge")
      .join(spark.table("bj_cat.ns.ddl2"), "k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(j.count() === 501L)
    // and the schema-anchor does not break metadata COUNT
    assert(spark.sql("SELECT count(*) FROM bj_cat.ns.ddl1")
      .head().getLong(0) === 1000L)
  }

  test("the catalog's bucket function is SQL-callable and matches the writer's row routing") {
    wh
    val t = s"$wh/ns/fn"
    Snapshots.commitBucketed((1L to 200L).toDF("k").withColumn("v", col("k")),
      t, "k", 8)
    // every file's rows all hash to the file's directory bucket
    val byFile = Snapshots.read(spark, t)
      .withColumn("f", input_file_name())
      .withColumn("b", expr("bj_cat.bucket(8, k)"))
      .select("f", "b").distinct().collect()
    byFile.foreach { r =>
      val tag = Snapshots.bucketOfPath(r.getString(0))
      assert(tag.contains(r.getInt(1)),
        s"file ${r.getString(0)} carries rows of bucket ${r.getInt(1)}")
    }
    // and it agrees with Spark's own hash(): pmod(hash(k), 8)
    val diff = (1L to 200L).toDF("k")
      .withColumn("f1", expr("bj_cat.bucket(8, k)"))
      .withColumn("f2", pmod(hash(col("k")), lit(8)))
      .filter(col("f1") =!= col("f2")).count()
    assert(diff === 0L)
  }

  test("a FAILED first bucketed commit retires its own spec: write routing never flips as a side effect") {
    wh
    val t = s"$wh/ns/failspec"
    // an existing UNBUCKETED table with a committed schema (k, v)
    Snapshots.commit((1L to 100L).toDF("k").withColumn("v", col("k")), t)
    // a bucketed APPEND with a mismatched schema fails the in-lock
    // strict validation — AFTER the spec would have been persisted
    intercept[IllegalStateException] {
      Snapshots.commitBucketed(
        (1L to 10L).toDF("k").withColumn("other", col("k") * 2), t, "k", 4)
    }
    assert(Snapshots.bucketSpec(spark, t).isEmpty,
      "a commit that never published must not leave the table bucketed")
    // subsequent writes still route unbucketed and read back fine
    Snapshots.commit((101L to 110L).toDF("k").withColumn("v", col("k")), t)
    assert(Snapshots.read(spark, t).count() === 110L)
  }

  test("a zero-row bucketed OVERWRITE stays readable: schema anchor, spec intact") {
    wh
    spark.sql("CREATE TABLE bj_cat.ns.z0 (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bj_cat.ns.z0 SELECT id AS k, id AS v FROM range(1, 101)")
    spark.sql("INSERT OVERWRITE bj_cat.ns.z0 " +
      "SELECT id AS k, id AS v FROM range(1, 101) WHERE id < 0")
    assert(spark.table("bj_cat.ns.z0").count() === 0L,
      "emptying a bucketed table must not brick reads")
    assert(Snapshots.bucketSpec(spark, s"$wh/ns/z0").contains(("k", 4)))
    // refilling keeps the layout: the anchor file is bucket-tagged
    spark.sql("INSERT INTO bj_cat.ns.z0 SELECT id AS k, id AS v FROM range(1, 51)")
    assert(spark.table("bj_cat.ns.z0").count() === 50L)
  }

  test("a schema-evolving OVERWRITE past the bucket column retires the layout (the route out of bucketing)") {
    wh
    val t = s"$wh/ns/unbucket"
    Snapshots.commitBucketed((1L to 100L).toDF("k").withColumn("v", col("k")),
      t, "k", 4)
    assert(Snapshots.bucketSpec(spark, t).contains(("k", 4)))
    // the overwrite replaces the file set wholesale with a shape that
    // has no bucket column — pre-fix this threw and locked the table
    // to its bucket column forever
    Seq(("a", 1L), ("b", 2L)).toDF("name", "n")
      .write.format("graft-snapshot").option("path", t).mode("overwrite").save()
    assert(Snapshots.bucketSpec(spark, t).isEmpty,
      "the retired layout must not advertise a phantom bucket column")
    assert(Snapshots.read(spark, t).count() === 2L)
    // and appends now route unbucketed against the new schema
    Seq(("c", 3L)).toDF("name", "n")
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    assert(Snapshots.read(spark, t).count() === 3L)
  }

  test("REPLACE TABLE AS SELECT retires a stale bucket spec (or installs the new one)") {
    wh
    spark.sql("CREATE TABLE bj_cat.ns.rt (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bj_cat.ns.rt SELECT id AS k, id AS v FROM range(1, 101)")
    // replace WITHOUT a transform: the new definition is unbucketed,
    // so the old spec must go with the old file set
    spark.sql("REPLACE TABLE bj_cat.ns.rt AS SELECT 42L AS answer")
    assert(Snapshots.bucketSpec(spark, s"$wh/ns/rt").isEmpty,
      "RTAS without a transform must retire the old layout")
    assert(spark.table("bj_cat.ns.rt").head().getLong(0) === 42L)
    // replace WITH a transform installs the new layout wholesale
    spark.sql("REPLACE TABLE bj_cat.ns.rt PARTITIONED BY (bucket(2, k)) " +
      "AS SELECT id AS k FROM range(1, 51)")
    assert(Snapshots.bucketSpec(spark, s"$wh/ns/rt").contains(("k", 2)))
    assert(spark.table("bj_cat.ns.rt").count() === 50L)
  }

  test("bucketed CTAS: PARTITIONED BY (bucket(n, col)) AS SELECT joins shuffle-free") {
    wh
    spark.sql("CREATE TABLE bj_cat.ns.ctb1 PARTITIONED BY (bucket(4, k)) " +
      "AS SELECT id AS k, id * 2 AS v FROM range(1, 1001)")
    spark.sql("CREATE TABLE bj_cat.ns.ctb2 PARTITIONED BY (bucket(4, k)) " +
      "AS SELECT id AS k, id * 5 AS w FROM range(500, 1501)")
    assert(Snapshots.bucketSpec(spark, s"$wh/ns/ctb1").contains(("k", 4)))
    val j = spark.table("bj_cat.ns.ctb1").hint("merge")
      .join(spark.table("bj_cat.ns.ctb2"), "k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(j.count() === 501L)
  }

  test("bucket(0, k) is rejected at CREATE time, before anything persists") {
    wh
    intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE bj_cat.ns.b0 (k BIGINT) " +
        "PARTITIONED BY (bucket(0, k))")
    }
    assert(!new java.io.File(s"$wh/ns/b0/bucketspec").exists())
  }

  test("runtime file skipping runs on bucketed scans; emptied buckets survive as empty partitions") {
    wh
    val t = s"$wh/ns/rskip"
    // commit 1: one key → ONE bucket file; commit 2: a disjoint high
    // key range → four bucket files. A runtime probe for the low key
    // prunes all of commit 2, leaving three of four reported buckets
    // with NO files — the batch must re-emit them empty, not break
    // the key-grouped contract
    Snapshots.commitBucketed(Seq(1L).toDF("k").withColumn("v", lit(7L)),
      t, "k", 4)
    Snapshots.commitBucketed(
      (1000L to 1999L).toDF("k").withColumn("v", col("k")), t, "k", 4)
    val dimPath = java.nio.file.Files.createTempDirectory("bjdim")
      .resolve("d").toString
    Seq((1L, "keep"), (5L, "drop")).toDF("d", "tag").write.parquet(dimPath)
    val fact = spark.table("bj_cat.ns.rskip")
    val dimF = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    graft.sources.FileStats.lastRuntimePrune = None
    val joined = fact.join(dimF, fact("k") === dimF("d"))
    val got = joined.select(col("k"), col("v")).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 7L)))
    graft.sources.FileStats.lastRuntimePrune match {
      case Some((kept, total)) =>
        assert(kept < total, s"runtime prune kept $kept/$total")
      case None =>
        val plan = joined.queryExecution.executedPlan.toString
        fail(s"runtime filter never reached the bucketed scan; plan:\n$plan")
    }
    // and the SPJ contract is untouched on the full (unpruned) scan
    val spj = spark.table("bj_cat.ns.rskip").hint("merge")
      .join(spark.table("bj_cat.ns.rskip").select(col("k")), "k")
    spj.collect()
    assert(!spj.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  /** Exchange count in the AQE FINAL plan only (the full toString
    * includes the Initial Plan section, double-counting).
    */
  private def finalPlanExchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val fin = s.split("== Initial Plan ==").head
    "Exchange".r.findAllIn(fin).size
  }

  test("one-side shuffle: bucketed x plain join moves ONLY the plain side, hashed by the bucket function") {
    wh
    Snapshots.commitBucketed(
      (1L to 4000L).toDF("k").withColumn("lv", col("k") * 3),
      s"$wh/ns/oss", "k", 8)
    val plainPath = java.nio.file.Files.createTempDirectory("bjplain")
      .resolve("p").toString
    (2001L to 6000L).toDF("k").withColumn("rv", col("k") % 97)
      .write.parquet(plainPath)
    val j = spark.table("bj_cat.ns.oss").hint("merge")
      .join(spark.read.parquet(plainPath), "k")
    // exactly ONE exchange — the plain side's, partitioned by the
    // catalog's own bucket function into the fact's key grouping; the
    // (large) bucketed fact never moves
    assert(finalPlanExchanges(j) === 1)
    val plan = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("keygroupedpartitioning"),
      s"the shuffle must target the reported key grouping:\n$plan")
    assert(plan.contains("BucketFunction"),
      s"the shuffle must hash with the catalog bucket function:\n$plan")
    assert(j.count() === 2000L)
    // values match the ordinary join
    val expected = (1L to 4000L).toDF("k").withColumn("lv", col("k") * 3)
      .join((2001L to 6000L).toDF("k").withColumn("rv", col("k") % 97), "k")
      .agg(sum(col("lv") + col("rv"))).head().getLong(0)
    assert(spark.table("bj_cat.ns.oss")
      .join(spark.read.parquet(plainPath), "k")
      .agg(sum(col("lv") + col("rv"))).head().getLong(0) === expected)
  }

  test("groupBy on the bucket key aggregates with ZERO exchanges") {
    wh
    Snapshots.commitBucketed(
      (1L to 4000L).toDF("k").withColumn("v", col("k") * 3),
      s"$wh/ns/agg0", "k", 8)
    // two commits so the agg provably combines across files per bucket
    Snapshots.commitBucketed(
      (1L to 4000L).toDF("k").withColumn("v", col("k") * 5),
      s"$wh/ns/agg0", "k", 8)
    val a = spark.table("bj_cat.ns.agg0").groupBy("k").agg(sum("v").as("s"))
    assert(finalPlanExchanges(a) === 0,
      "a bucket-key aggregation must not shuffle: the scan is already " +
        "grouped by the key")
    assert(a.count() === 4000L)
    assert(a.filter(col("k") === 10L).head().getLong(1) === 80L) // 30 + 50
  }

  test("maintenance degrades gracefully: compact un-buckets, scan falls back, rows intact") {
    wh
    val t = s"$wh/ns/cp"
    Snapshots.commitBucketed((1L to 300L).toDF("k").withColumn("v", col("k")),
      t, "k", 4)
    Snapshots.compact(spark, t, numFiles = 1)
    // files are untagged now: no KeyGrouped reporting, ordinary join
    val j = spark.table("bj_cat.ns.cp").hint("merge")
      .join(spark.table("bj_cat.ns.cp").select(col("k")), "k")
    assert(j.count() === 300L)
  }
}
