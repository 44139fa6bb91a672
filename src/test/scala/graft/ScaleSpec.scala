package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

import graft.sources.Bucketing
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scale-path behaviors: bucketed shuffle-free joins, checkpoint-restart
  * exactly-once, and the real TCP socket source (lab06 parity).
  */
class ScaleSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketed join elides both shuffle exchanges") {
    Bucketing.writeBucketed(
      Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    // force the shuffle-or-bucket decision (broadcast would win at this SF)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(j.count() === Tables.lineitem(spark, sf0001).count())
      // contrast: the plain parquet join shuffles both sides
      val plain = Tables.orders(spark, sf0001).join(
        Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("T2: file-source restart from checkpoint neither duplicates nor drops") {
    val src = Files.createTempDirectory("ck_src").toString
    val out = Files.createTempDirectory("ck_out").toString
    val ck = Files.createTempDirectory("ck_ck").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "transaction_id STRING, amount DOUBLE")
    Seq(("t1", 1.0), ("t2", 2.0)).toDF("transaction_id", "amount")
      .write.parquet(s"$src/f1")
    val q1 = Streams.fileIngest(spark, s"$src/*", schema, "transaction_id", out, ck)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() === 2)
    // new file lands while the job is down; restart resumes from the
    // checkpoint: old files are not re-served, the new one is
    Seq(("t3", 3.0)).toDF("transaction_id", "amount")
      .write.parquet(s"$src/f2")
    val q2 = Streams.fileIngest(spark, s"$src/*", schema, "transaction_id", out, ck)
    q2.processAllAvailable(); q2.stop()
    val res = spark.read.parquet(out)
    assert(res.count() === 3, "restart must not duplicate or drop")
    assert(res.select("transaction_id").distinct().count() === 3)
  }

  test("S17: word count over a real TCP socket source") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val writerThread = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      out.println("graft spark graft")
      out.println("spark")
      Thread.sleep(3000) // keep the connection open while batches run
      out.close(); sock.close()
    })
    writerThread.start()
    val lines = graft.streaming.SourceFactory.open(spark,
      graft.streaming.SourceFactory.Socket("127.0.0.1", port))
    val q = Streams.wordCount(lines).writeStream
      .outputMode("complete").format("memory").queryName("sock_wc").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def counts() = spark.table("sock_wc").as[(String, Long)].collect().toMap
      while (counts().getOrElse("graft", 0L) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(counts() === Map("graft" -> 2L, "spark" -> 2L))
    } finally {
      q.stop(); server.close(); writerThread.join(5000)
    }
  }

  test("exact percentiles group-by (median / p90)") {
    val df = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))
    assert(df.count() === 3)
    val r = df.filter(col("median_qty") > col("p90_qty")).count()
    assert(r === 0)
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying most rows vs a uniform right side
      val left = ((1 to 200000).map(_ => 1) ++ (2 to 2000)).toDF("k")
      val right = (1 to 2000).map(i => (i, s"v$i")).toDF("k", "v")
      val joined = left.join(right, "k")
      // collect through the SAME QueryExecution — count() builds its own,
      // leaving this plan un-executed (isFinalPlan would stay false)
      assert(joined.collect().length === 200000 + 1999)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-split fires on the registered q61 skew join over real data") {
    // thresholds lowered so sf0.01's ~60k lineitem rows trip the same
    // machinery 100 TB partitions trip at the 256MB defaults
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // measured skew, not asserted-by-construction: hash-partitioning
      // the fact on the 3-value join key leaves ≥29 of 32 partitions
      // empty with everything piled into ≤3
      val sizes = Tables.lineitem(spark, sf001)
        .select("l_returnflag").repartition(32, col("l_returnflag"))
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
      assert(sizes.count(_ > 0) <= 3, sizes.mkString(","))
      assert(sizes.max > sizes.sum / 4, "expected ≥25% of rows in one partition")
      // production layout: many files → many mappers. AQE splits a skewed
      // reduce partition along MAPPER boundaries, so the single-row-group
      // test file must be re-chunked first (at 100 TB this is the natural
      // state; the sandbox's one-file table is the artifact)
      val tmpDir = Files.createTempDirectory("skew_sf").toString
      Tables.lineitem(spark, sf001).repartition(8)
        .write.mode("overwrite").parquet(s"$tmpDir/lineitem.parquet")
      // the registered query's own plan gets the runtime split
      val df = run("q61_skew_join", tmpDir)
      assert(df.collect().length === 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed q61 partitions:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("observe() collects data-quality metrics in the same pass") {
    // the no-extra-scan DQ pattern: at 100 TB a second quality pass is a
    // second 100 TB read — observe rides the existing job
    val obs = new org.apache.spark.sql.Observation("dq")
    val df = Tables.lineitem(spark, sf0001)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("high_qty"),
        count(when(col("l_shipdate").isNull, 1)).as("null_shipdates"))
      .filter(col("l_quantity") > 0)
    val total = df.count()
    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] === total)
    assert(m("high_qty").asInstanceOf[Long] > 0)
    assert(m("null_shipdates").asInstanceOf[Long] === 0L)
  }

  test("clustered write bounds per-file rows and sorts within files") {
    val dir = Files.createTempDirectory("clustered").toString
    sources.Ingest.writeClustered(
      Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity"),
      dir, "l_returnflag", "l_shipdate", 1000L)
    // hive layout: one directory per partition value
    val partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("l_returnflag="))
    assert(partDirs.nonEmpty)
    val files = partDirs.flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "maxRecordsPerFile should split output files")
    files.foreach { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select(col("l_shipdate").cast("string")).collect().map(_.getString(0))
      assert(rows.length <= 1000, s"${f.getName}: ${rows.length} rows")
      assert(rows.sameElements(rows.sorted),
        s"${f.getName} not sorted on l_shipdate")
    }
  }

  test("dynamic partition pruning reaches the fact scan through a dim join") {
    val dir = Files.createTempDirectory("dpp").toString
    sources.Ingest.writePartitioned(
      Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_returnflag", "l_quantity"),
      dir, "l_returnflag")
    // the dim must be file-backed: a LocalRelation's filter constant-folds
    // away at plan time, leaving no selective predicate for DPP to detect
    val dimDir = Files.createTempDirectory("dpp_dim").toString
    Seq(("R", "returned"), ("A", "accepted"), ("N", "in-flight"))
      .toDF("flag", "label").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    // tiny test partitions defeat the stats-based benefit estimate; the
    // pruning decision itself is what this test pins
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = fact.join(dim, col("l_returnflag") === col("flag"))
        .filter(col("label") === "returned")
        .groupBy("l_returnflag").agg(sum("l_quantity"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
    } finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // selective creation side (filtered orders) injects a bloom filter
      // into the lineitem scan, cutting shuffle volume before the join
      val orders = Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 300000)
        .select("o_orderkey")
      val q = Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(q.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
