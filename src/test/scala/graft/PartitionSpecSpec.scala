package graft

import graft.sources.{FileStats, PartitionSpecs, Snapshots}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hidden/transform partitioning (Iceberg partition-spec shape): DDL
  * surface, write-side clustering, scan-level pruning through footer
  * stats on the SOURCE column, metadata-only spec evolution across
  * epochs, DML respect, fork carry, and the refusal edges.
  */
class PartitionSpecSpec extends SparkTestBase {

  import spark.implicits._

  private def freshWh(tag: String): String =
    Files.createTempDirectory(s"pspec-$tag").toString

  private def cat(wh: String): String = {
    val c = s"pspec_${Tables.dirKey(wh)}"
    spark.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    c
  }

  /** six months of 1995, 600 rows, committed in SCATTERED order — the
    * layout spec, not caller discipline, must produce the clustering
    */
  private def sixMonths(n: Int = 600) =
    (0 until n).map { i =>
      val month = (i * 7) % 6 + 1 // scattered across months
      val day = i % 28 + 1
      (i.toLong, i * 1.5, java.sql.Timestamp.valueOf(
        f"1995-$month%02d-$day%02d 00:00:00"))
    }.toDF("id", "amt", "ts")

  test("PARTITIONED BY (months(ts)): writes cluster, time predicate prunes files") {
    val wh = freshWh("months")
    val c = cat(wh)
    spark.sql(s"CREATE TABLE $c.ns.pt (id BIGINT, amt DOUBLE, ts TIMESTAMP) " +
      "PARTITIONED BY (months(ts))")
    assert(PartitionSpecs.current(spark, s"$wh/ns/pt")
      .exists(s => s.transform == "months" && s.column == "ts"))
    sixMonths().createOrReplaceTempView("pspec_src")
    spark.sql(s"INSERT INTO $c.ns.pt SELECT * FROM pspec_src")
    // the landed data files are RANGE-DISJOINT on ts with month-aligned
    // boundaries — the property pruning rides on (the schema-anchor
    // file from CREATE is empty and records no stats)
    def ym(v: Any) = {
      val ld = java.time.LocalDateTime.ofEpochSecond(
        v.asInstanceOf[Long] / 1000000L, 0, java.time.ZoneOffset.UTC)
      ld.getYear * 100 + ld.getMonthValue
    }
    val stats = FileStats.load(spark, s"$wh/ns/pt")
    val ranges = stats.values.flatMap(_.get("ts")).collect {
      case r if r.min.isDefined && r.max.isDefined =>
        (ym(r.min.get), ym(r.max.get))
    }.toSeq.sortBy(_._1)
    assert(ranges.size > 1, s"clustering produced one file: $ranges")
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1, s"overlapping files: $ranges")
      case _ => ()
    }
    // a one-month predicate prunes the scan to a strict file subset
    FileStats.lastSourcePrune = None
    val feb = spark.sql(s"SELECT count(*) AS n FROM $c.ns.pt " +
      "WHERE ts >= TIMESTAMP '1995-02-01 00:00:00' " +
      "AND ts < TIMESTAMP '1995-03-01 00:00:00'").head.getLong(0)
    assert(feb === 100L)
    FileStats.lastSourcePrune match {
      case Some((kept, total)) =>
        assert(kept < total, s"no pruning: kept $kept of $total")
      case None => fail("scan never consulted the file pruner")
    }
  }

  test("spec evolution is metadata-only; pruning works across BOTH epochs") {
    val wh = freshWh("evolve")
    val c = cat(wh)
    spark.sql(s"CREATE TABLE $c.ns.ev (id BIGINT, amt DOUBLE, ts TIMESTAMP) " +
      "PARTITIONED BY (months(ts))")
    sixMonths(300).createOrReplaceTempView("pspec_ev1")
    spark.sql(s"INSERT INTO $c.ns.ev SELECT * FROM pspec_ev1")
    val epoch1Files = Snapshots.dataFiles(spark, s"$wh/ns/ev").toSet
    // evolve months -> days through the SQL procedure: zero rewrites
    val ep = spark.sql(s"CALL $c.system.evolve_partition_spec(" +
      "table => 'ns.ev', spec => 'days(ts)')").head
    assert(ep.getInt(0) === 2 && ep.getString(1) === "days(ts)")
    assert(Snapshots.dataFiles(spark, s"$wh/ns/ev").toSet === epoch1Files,
      "spec evolution must rewrite nothing")
    assert(PartitionSpecs.epochs(spark, s"$wh/ns/ev").map(_.transform)
      === Seq("months", "days"))
    // epoch-2 append clusters by day
    (0 until 200).map(i => (10000L + i, i * 2.0, java.sql.Timestamp.valueOf(
      f"1995-07-${i % 25 + 1}%02d 00:00:00")))
      .toDF("id", "amt", "ts").createOrReplaceTempView("pspec_ev2")
    spark.sql(s"INSERT INTO $c.ns.ev SELECT * FROM pspec_ev2")
    // a day predicate prunes across both epochs: at most the one July
    // day-file(s) plus zero month-files survive
    FileStats.lastSourcePrune = None
    val d = spark.sql(s"SELECT count(*) AS n FROM $c.ns.ev " +
      "WHERE ts >= TIMESTAMP '1995-07-03 00:00:00' " +
      "AND ts < TIMESTAMP '1995-07-04 00:00:00'").head.getLong(0)
    assert(d === 8L)
    val (kept, total) = FileStats.lastSourcePrune.getOrElse(
      fail("scan never consulted the file pruner"))
    assert(kept < total, s"no pruning: kept $kept of $total")
    // a month predicate on the OLD epoch still prunes (old files keep
    // their old layout and their stats)
    FileStats.lastSourcePrune = None
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.ev " +
      "WHERE ts >= TIMESTAMP '1995-03-01 00:00:00' " +
      "AND ts < TIMESTAMP '1995-04-01 00:00:00'").head.getLong(0) === 50L)
    val (k2, t2) = FileStats.lastSourcePrune.get
    assert(k2 < t2, s"no pruning on the old epoch: kept $k2 of $t2")
  }

  test("truncate and identity transforms cluster strings/ints; DML respects the spec") {
    val wh = freshWh("trunc")
    val t = s"$wh/tt"
    PartitionSpecs.evolve(spark, t, "truncate", "name", Some(2),
      Some(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType)))))
    val names = Seq("aardvark", "abacus", "baton", "bobcat", "cedar",
      "cobalt", "dune", "dingo")
    Snapshots.commit(
      (0 until 400).map(i => (i.toLong, names(i % names.length) + i))
        .toDF("id", "name"), t)
    val stats = FileStats.load(spark, t)
    val prefixes = stats.values.flatMap(_.get("name")).collect {
      case r if r.min.isDefined && r.max.isDefined =>
        (r.min.get.toString.take(2), r.max.get.toString.take(2))
    }.toSeq.sortBy(_._1)
    assert(prefixes.size > 1, s"clustering produced one file: $prefixes")
    prefixes.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1, s"overlapping files: $prefixes")
      case _ => ()
    }
    // a COW delete's rewrite re-clusters under the current spec and
    // stays correct
    Snapshots.deleteWhere(spark, t, col("id") % 2 === 0L)
    assert(Snapshots.read(spark, t).count() === 200L)
    // bobcat rows sit at i % 8 == 3 (all odd), so the even-id delete
    // left every one of the 50 in place
    assert(Snapshots.read(spark, t).filter(col("name").startsWith("bo"))
      .count() === 50L)
  }

  test("refusals: wrong column type, bad width, multiple transforms, unknown spec") {
    val wh = freshWh("refuse")
    val c = cat(wh)
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE $c.ns.r1 (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (months(id))"))
    assert(e1.getMessage.contains("timestamp/date"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $c.ns.r2 (id BIGINT, name STRING) " +
        "PARTITIONED BY (truncate(0, name))"))
    assert(e2.getMessage.contains("positive width"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      s"CREATE TABLE $c.ns.r3 (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (months(ts), days(ts))"))
    assert(e3.getMessage.contains("ONE layout transform"), e3.getMessage)
    spark.sql(s"CREATE TABLE $c.ns.r4 (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (months(ts))")
    val e4 = intercept[Exception](spark.sql(
      s"CALL $c.system.evolve_partition_spec(table => 'ns.r4', " +
        "spec => 'fortnights(ts)')"))
    assert(e4.getMessage.contains("unknown partition transform"), e4.getMessage)
    // renaming/dropping the transform's SOURCE column would silently
    // degrade the declared layout — refused like sort/bucket/bloom
    // columns, naming the evolve remedy
    spark.sql(s"INSERT INTO $c.ns.r4 VALUES (1, TIMESTAMP '1995-01-01 00:00:00')")
    val e5 = intercept[Exception](spark.sql(
      s"ALTER TABLE $c.ns.r4 RENAME COLUMN ts TO ts2"))
    assert(e5.getMessage.contains("partition-transform column"), e5.getMessage)
    val e6 = intercept[Exception](spark.sql(
      s"ALTER TABLE $c.ns.r4 DROP COLUMN ts"))
    assert(e6.getMessage.contains("partition-transform column"), e6.getMessage)
    // after retiring the spec, the rename goes through
    spark.sql(s"CALL $c.system.evolve_partition_spec(table => 'ns.r4', " +
      "spec => 'none')")
    spark.sql(s"ALTER TABLE $c.ns.r4 RENAME COLUMN ts TO ts2")
    assert(spark.sql(s"SELECT ts2 FROM $c.ns.r4").count() === 1L)
  }

  test("REPLACE without a transform retires the spec; fork carries it; none round-trips") {
    val wh = freshWh("lifecycle")
    val c = cat(wh)
    spark.sql(s"CREATE TABLE $c.ns.lt (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    val path = s"$wh/ns/lt"
    spark.sql(s"INSERT INTO $c.ns.lt VALUES " +
      "(1, TIMESTAMP '1995-01-01 00:00:00'), (2, TIMESTAMP '1995-01-02 00:00:00')")
    // fork carries the spec to the branch
    val br = s"$wh/ns/lt_br"
    Snapshots.fork(spark, path, br)
    assert(PartitionSpecs.current(spark, br)
      .exists(s => s.transform == "days" && s.column == "ts"))
    Snapshots.drop(spark, br)
    // RTAS without PARTITIONED BY retires the spec (epoch history keeps
    // the retirement point)
    spark.sql(s"REPLACE TABLE $c.ns.lt AS SELECT id FROM $c.ns.lt")
    assert(PartitionSpecs.current(spark, path).isEmpty)
    assert(PartitionSpecs.epochs(spark, path).last.transform === "none")
    // re-declare through the procedure (identity via bare column name)
    spark.sql(s"CALL $c.system.evolve_partition_spec(" +
      "table => 'ns.lt', spec => 'id')")
    assert(PartitionSpecs.current(spark, path)
      .exists(s => s.transform == "identity" && s.column == "id"))
  }
}
