package graft

import java.nio.file.Files

import graft.functions.AvroCodec
import graft.streaming.{KVStateTws, KeyedCounters, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // The reference's Event avro schema (lab06 spark_kafka_foreachbatch.py:53-65 shape)
  val eventSchema =
    """{"type":"record","name":"Event","fields":[
      |{"name":"user_id","type":"long"},
      |{"name":"event","type":"string"},
      |{"name":"amount","type":["null","double"],"default":null},
      |{"name":"ts","type":"long"}]}""".stripMargin

  test("avro round-trip: to_avro then from_avro preserves values") {
    val df = Seq((1L, "view", Some(9.5), 1700000000000L),
      (2L, "purchase", None, 1700000001000L))
      .toDF("user_id", "event", "amount", "ts")
    val bin = df.select(AvroCodec.to_avro(
      struct(col("user_id"), col("event"), col("amount"), col("ts")), eventSchema).as("value"))
    val back = bin.select(AvroCodec.from_avro(col("value"), eventSchema).as("data"))
      .select("data.*")
    val rows = back.orderBy("user_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "view"
      && rows(0).getDouble(2) === 9.5)
    assert(rows(1).isNullAt(2))
  }

  test("streaming word count from memory source (socket word-count parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val wc = Streams.wordCount(input.toDF())
    val q = wc.writeStream.outputMode("complete")
      .format("memory").queryName("wc_test").start()
    input.addData("spark streams spark", "hello streams")
    q.processAllAvailable()
    val counts = spark.table("wc_test").as[(String, Long)].collect().toMap
    q.stop()
    assert(counts === Map("spark" -> 2L, "streams" -> 2L, "hello" -> 1L))
  }

  test("avro decode inside a stream, keeping metadata columns") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Int)]
    // pre-encode two events
    val bin = Seq((7L, "click", Option.empty[Double], 5L))
      .toDF("user_id", "event", "amount", "ts")
      .select(AvroCodec.to_avro(struct(col("user_id"), col("event"),
        col("amount"), col("ts")), eventSchema).as("v"))
      .collect().map(_.getAs[Array[Byte]](0))
    val decoded = Streams.decodeAvro(
      input.toDF().toDF("value", "partition"), eventSchema)
    val q = decoded.writeStream.outputMode("append")
      .format("memory").queryName("avro_test").start()
    input.addData((bin(0), 3))
    q.processAllAvailable()
    val row = spark.table("avro_test").collect().head
    q.stop()
    assert(row.getAs[Long]("user_id") === 7L)
    assert(row.getAs[String]("event") === "click")
    assert(row.getAs[Int]("partition") === 3)
  }

  test("foreachBatch parquet sink partitions by batch_id with checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = tmp("fb_out"); val ck = tmp("fb_ck")
    val q = Streams.foreachBatchParquetSink(input.toDF(), out, ck)
    input.addData("a", "b")
    q.processAllAvailable()
    input.addData("c")
    q.processAllAvailable()
    q.stop()
    val res = spark.read.parquet(out)
    assert(res.count() === 3)
    assert(res.select("batch_id").distinct().count() === 2)
    assert(res.columns.contains("ingest_ts"))
  }

  test("file ingest dedups within batch and carries source_file (lab05 parity)") {
    val src = tmp("ing_src"); val out = tmp("ing_out"); val ck = tmp("ing_ck")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "transaction_id STRING, amount DOUBLE")
    Seq(("t1", 1.0), ("t2", 2.0), ("t2", 2.0))
      .toDF("transaction_id", "amount")
      .write.mode("overwrite").parquet(src)
    val q = Streams.fileIngest(spark, src, schema, "transaction_id", out, ck)
    q.processAllAvailable()
    q.stop()
    val res = spark.read.parquet(out)
    assert(res.count() === 2) // within-batch dup dropped
    assert(res.columns.contains("source_file"))
  }

  test("S21: upsert-append sink skips keys already in the sink across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val out = tmp("ups_out"); val ck = tmp("ups_ck")
    val q = Streams.upsertAppendSink(
      input.toDF().toDF("transaction_id", "amount"), "transaction_id", out, ck)
    try {
      input.addData(("t1", 1.0), ("t2", 2.0), ("t1", 1.0)) // in-batch dup
      q.processAllAvailable()
      input.addData(("t2", 99.0), ("t3", 3.0)) // t2 conflicts with sink
      q.processAllAvailable()
      val res = spark.read.parquet(out)
      assert(res.count() === 3)
      // first write wins — ON CONFLICT DO NOTHING semantics
      assert(res.filter($"transaction_id" === "t2").head.getDouble(1) === 2.0)
      // sink layout is key-hash bucketed…
      assert(new java.io.File(out).listFiles()
        .exists(_.getName.startsWith("__bucket=")), "sink not bucket-partitioned")
      // …and the conflict check's filter shape prunes partitions: the scan
      // carries a non-empty PartitionFilters on __bucket
      val plan = spark.read.parquet(out).filter($"__bucket".isin(0, 1))
        .queryExecution.executedPlan.toString
      val pf = plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      assert(pf.contains("__bucket"), s"no partition pruning in: $plan")
    } finally q.stop()
  }

  test("S21: sink written with a different nBuckets fails loudly, never mis-prunes") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmp("ups_nb_out"); val ck1 = tmp("ups_nb_ck1"); val ck2 = tmp("ups_nb_ck2")
    val in1 = MemoryStream[(String, Double)]
    val q1 = Streams.upsertAppendSink(
      in1.toDF().toDF("transaction_id", "amount"), "transaction_id", out, ck1,
      nBuckets = 8)
    in1.addData(("t1", 1.0))
    q1.processAllAvailable(); q1.stop()
    // same sink, different modulus: pruning would read the wrong
    // partitions and silently append duplicates — must throw instead
    val in2 = MemoryStream[(String, Double)]
    val q2 = Streams.upsertAppendSink(
      in2.toDF().toDF("transaction_id", "amount"), "transaction_id", out, ck2,
      nBuckets = 16)
    in2.addData(("t2", 2.0))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("nBuckets"))), ex.toString)
    // and the sink is untouched by the failed batch
    assert(spark.read.parquet(out).count() === 1)
  }

  test("S21/T7: replay after a lost checkpoint commit is exactly-once") {
    // Crash model: the batch's parquet append SUCCEEDED but the
    // checkpoint commit was lost (lab05's idempotency contract). The
    // engine then re-delivers the same data — simulated with a fresh
    // checkpoint dir — and the sink-side anti-join must drop every
    // already-sunk key: no duplicates, no loss.
    implicit val sqlCtx = spark.sqlContext
    val out = tmp("ups_xo_out"); val ck1 = tmp("ups_xo_ck1"); val ck2 = tmp("ups_xo_ck2")
    val in1 = MemoryStream[(String, Double)]
    val q1 = Streams.upsertAppendSink(
      in1.toDF().toDF("transaction_id", "amount"), "transaction_id", out, ck1)
    in1.addData(("t1", 1.0), ("t2", 2.0))
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() === 2)
    // replay the whole input plus one genuinely new row
    val in2 = MemoryStream[(String, Double)]
    val q2 = Streams.upsertAppendSink(
      in2.toDF().toDF("transaction_id", "amount"), "transaction_id", out, ck2)
    try {
      in2.addData(("t1", 1.0), ("t2", 2.0), ("t3", 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val res = spark.read.parquet(out)
    assert(res.count() === 3) // no dupes
    assert(res.select("transaction_id").as[String].collect().toSet
      === Set("t1", "t2", "t3")) // no loss
  }

  test("from_json with explicit schema parses the events props column") {
    val df = Tables.events(spark, sf0001)
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
      .select(col("p.k"))
    assert(df.filter(col("k").isNull).count() === 0)
    assert(df.agg(max("k")).head.getInt(0) <= 99)
  }

  test("watermark + tumbling window counts (idiomatic T6 upgrade)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "value")
    val agg = Streams.windowedCounts(events, "ts", "k", "10 minutes", "20 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_test").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    input.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(11), "b", 5.0))
    q.processAllAvailable()
    input.addData((t(59), "a", 9.0)) // advances watermark past first windows
    q.processAllAvailable()
    val rows = spark.table("win_test")
      .select("k", "n", "total_value").as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains(("a", 2L, 3.0)))
    assert(rows.contains(("b", 1L, 5.0)))
  }

  test("streaming session windows merge by gap and finalize on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "value")
    val agg = Streams.sessionCounts(events, "ts", "k", "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_test").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // a: one session (1,3 merge via <5m gap), then a separate burst at 20
    input.addData((t(1), "a", 1.0), (t(3), "a", 2.0), (t(20), "a", 4.0))
    q.processAllAvailable()
    input.addData((t(59), "z", 0.0)) // advance watermark, finalize sessions
    q.processAllAvailable()
    val rows = spark.table("sess_test")
      .select("k", "n_events", "total_value").as[(String, Long, Double)]
      .collect().toSet
    q.stop()
    assert(rows.contains(("a", 2L, 3.0)), s"merged session missing: $rows")
    assert(rows.contains(("a", 1L, 4.0)), s"separate session missing: $rows")
  }

  test("event-time lateness matrix: in-watermark, at-watermark, past-watermark arrivals") {
    // The late-data policy in one spec (SURVEY §2.9's "absent from
    // reference" behavior): with a 5-minute session gap and a 10-minute
    // watermark, a late record is DROPPED iff its event time is behind
    // the watermark at the batch it arrives in; an at-watermark record
    // (event time == watermark exactly) is still accepted; and a dropped
    // record must neither resurrect a finalized session nor open a
    // ghost session of its own.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "value")
    val agg = Streams.sessionCounts(events, "ts", "k", "5 minutes", "10 minutes")

    // the plan carries the watermark node with the configured delay —
    // the eviction/drop semantics below hinge on exactly this operator
    val wmNodes = agg.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }
    assert(wmNodes.nonEmpty, "no EventTimeWatermark in the session plan")
    assert(wmNodes.head.delay.toString.contains("10 minutes"), wmNodes.head.delay)

    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("lateness_test").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      // batch 1: seed a session for "sess" and push max event time to
      // 10:40 → watermark after this batch = 10:30
      input.addData((t(10), "sess", 1.0), (t(12), "sess", 2.0), (t(40), "adv", 1.0))
      q.processAllAvailable()
      // batch 2 (watermark = 10:30):
      //  past-watermark  — "sess" at 10:13 (session already finalized): drop
      //  at-watermark    — "edge" at exactly 10:30: accept
      //  in-watermark    — "lateok" at 10:33 (out of order vs 10:40): accept
      //  plus 10:70 to advance the watermark to 10:60 for finalization
      input.addData((t(13), "sess", 100.0), (t(30), "edge", 5.0),
        (t(33), "lateok", 7.0), (t(70), "adv2", 1.0))
      q.processAllAvailable()
      // batch 3: one more event so every session above is past-watermark
      input.addData((t(99), "z", 0.0))
      q.processAllAvailable()

      val rows = spark.table("lateness_test")
        .select("k", "session_start", "n_events", "total_value")
        .as[(String, java.sql.Timestamp, Long, Double)].collect()
      val byKey = rows.groupBy(_._1)
      // the seeded session finalized as exactly (2 events, 3.0) — the
      // past-watermark 100.0 record neither merged nor re-opened it
      assert(byKey("sess").toSeq === Seq(("sess", t(10), 2L, 3.0)), rows.toSeq)
      assert(!rows.exists(_._2 === t(13)), s"dropped record opened a ghost session: ${rows.toSeq}")
      // the at-watermark record survived as its own session
      assert(byKey("edge").toSeq === Seq(("edge", t(30), 1L, 5.0)), rows.toSeq)
      // the out-of-order-but-inside-watermark record survived
      assert(byKey("lateok").toSeq === Seq(("lateok", t(33), 1L, 7.0)), rows.toSeq)
      assert(byKey("adv").head._3 === 1L)
    } finally q.stop()
  }

  test("tumbling-window lateness: past-watermark arrival neither reopens nor ghosts a window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "value")
    val agg = Streams.windowedCounts(events, "ts", "k", "10 minutes", "20 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_win_test").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      input.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(45), "adv", 1.0))
      q.processAllAvailable() // watermark now 10:25 → window [10:00,10:10) final
      input.addData((t(3), "a", 100.0)) // past watermark: dropped
      input.addData((t(59), "adv", 1.0))
      q.processAllAvailable()
      val aRows = spark.table("late_win_test").filter(col("k") === "a")
        .select("n", "total_value").as[(Long, Double)].collect().toSeq
      assert(aRows === Seq((2L, 3.0)),
        s"late record leaked into a finalized tumbling window: $aRows")
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to views within the window") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Int, java.sql.Timestamp)]
    val clicks = MemoryStream[(Int, java.sql.Timestamp)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val joined = Streams.intervalJoin(
      views.toDF().toDF("v_item", "v_ts"), clicks.toDF().toDF("c_item", "c_ts"),
      "v_item", "c_item", "v_ts", "c_ts", withinSecs = 300, watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    try {
      views.addData((1, t(0)), (2, t(0)))
      clicks.addData((1, t(2)), (2, t(9)), (3, t(2))) // item2 too late, item3 unmatched
      q.processAllAvailable()
      views.addData((9, t(30))) // advance watermarks
      clicks.addData((9, t(31)))
      q.processAllAvailable()
      val rows = spark.table("ssj_test").select("v_item").as[Int].collect().toSet
      assert(rows.contains(1) && !rows.contains(2) && !rows.contains(3))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched views null-padded after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Int, java.sql.Timestamp)]
    val clicks = MemoryStream[(Int, java.sql.Timestamp)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val joined = Streams.intervalJoin(
      views.toDF().toDF("v_item", "v_ts"), clicks.toDF().toDF("c_item", "c_ts"),
      "v_item", "c_item", "v_ts", "c_ts", withinSecs = 300,
      watermark = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("loj_test").start()
    try {
      views.addData((1, t(0)), (2, t(0)))
      clicks.addData((1, t(2))) // item 2 never clicked
      q.processAllAvailable()
      views.addData((9, t(40))) // advance watermark far past item 2's interval
      clicks.addData((9, t(41)))
      q.processAllAvailable()
      val rows = spark.table("loj_test")
        .select("v_item", "c_item").collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
        .toSet
      assert(rows.contains(1 -> Some(1)), rows.toString)
      assert(rows.contains(2 -> None), s"unmatched view not emitted: $rows")
    } finally q.stop()
  }

  test("full-outer interval join emits unmatched rows from BOTH sides") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Int, java.sql.Timestamp)]
    val clicks = MemoryStream[(Int, java.sql.Timestamp)]
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val joined = Streams.intervalJoin(
      views.toDF().toDF("v_item", "v_ts"), clicks.toDF().toDF("c_item", "c_ts"),
      "v_item", "c_item", "v_ts", "c_ts", withinSecs = 300,
      watermark = "10 minutes", joinType = "full_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("foj_test").start()
    try {
      views.addData((1, t(0)), (2, t(0)))   // 2 never clicked
      clicks.addData((1, t(2)), (3, t(1)))  // 3 never viewed
      q.processAllAvailable()
      views.addData((9, t(40)))             // advance both watermarks
      clicks.addData((9, t(41)))
      q.processAllAvailable()
      val rows = spark.table("foj_test")
        .select("v_item", "c_item").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
      assert(rows.contains(Some(1) -> Some(1)), rows.toString)
      assert(rows.contains(Some(2) -> None), s"unmatched view missing: $rows")
      assert(rows.contains(None -> Some(3)), s"unmatched click missing: $rows")
    } finally q.stop()
  }

  test("transformWithState latest-value: RocksDB-backed set/overwrite semantics") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Encoders
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(providerKey)
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // state partition count is pinned at query start; 2 keeps the
    // per-batch RocksDB snapshot/cleanup fork storm out of test time
    spark.conf.set(partsKey, "2")
    implicit val kvEnc = Encoders.product[KVStateTws.KVSet]
    val input = MemoryStream[KVStateTws.KVSet]
    val out = KVStateTws.latestValueTws(input.toDS(), ttl = None)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("tws_test").start()
    try {
      input.addData(KVStateTws.KVSet("a", "1"), KVStateTws.KVSet("b", "x"))
      q.processAllAvailable()
      input.addData(KVStateTws.KVSet("a", "2"), KVStateTws.KVSet("a", "2b"))
      q.processAllAvailable() // state present across batches, last set wins
      val rows = spark.table("tws_test")
        .as[(String, String, Boolean)].collect().toList.sortBy(r => (r._1, r._2))
      assert(rows == List(("a", "1", false), ("a", "2b", true), ("b", "x", false)),
        rows.toString)
    } finally {
      q.stop()
      spark.conf.set(partsKey, prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("KV latest: the data-carried seq wins, not partition order; stale seq never rolls back") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedCounters.KVSet]
    val latest = KeyedCounters.latestValuePerKey(input.toDS(), ttlMs = 3600000)
    // NOTE: processing-time timeouts armed -> the engine schedules
    // no-data batches on its own and processAllAvailable() never
    // settles; poll the sink like the TTL tests do
    val q = latest.writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .format("memory").queryName("kv_seq_test").start()
    def emitted(): Seq[Option[String]] = spark.table("kv_seq_test")
      .as[KeyedCounters.KVLatest].collect()
      .filter(r => r.key == "k" && !r.expired).map(_.value).toSeq
    def pollFor(what: String)(p: Seq[Option[String]] => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!p(emitted()) && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(p(emitted()), s"expected $what, got ${emitted()}")
    }
    try {
      // adverse in-batch order: the high-seq row listed FIRST — a
      // "last row in the iterator wins" rule would keep the stale one
      input.addData(KeyedCounters.KVSet("k", "new", seq = 5),
        KeyedCounters.KVSet("k", "old", seq = 1))
      pollFor("seq 5 wins the batch")(_.contains(Some("new")))
      // a LATE lower-seq arrival in a later batch must not roll back:
      // its update must re-emit the RETAINED value, never "stale"
      input.addData(KeyedCounters.KVSet("k", "stale", seq = 3))
      pollFor("stale re-emits retained value")(e =>
        e.count(_ == Some("new")) >= 2)
      assert(!emitted().contains(Some("stale")), emitted().toString)
      input.addData(KeyedCounters.KVSet("k", "newest", seq = 9))
      pollFor("seq 9 advances")(_.contains(Some("newest")))
    } finally q.stop()
  }

  test("TTL keyed counters: INCR semantics then expiry tombstone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedCounters.Hit]
    val counters = KeyedCounters.ttlCounters(input.toDS(), ttlMs = 50)
    val q = counters.writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .format("memory").queryName("ttl_test").start()
    // NOTE: once processing-time timeouts are armed the engine schedules
    // no-data batches on its own, so processAllAvailable() never settles —
    // this test polls the sink instead.
    try {
      input.addData(KeyedCounters.Hit("alice", 1), KeyedCounters.Hit("alice", 1))
      def rows() = spark.table("ttl_test").as[KeyedCounters.KeyCount].collect()
      def pollFor(what: String)(p: KeyedCounters.KeyCount => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!rows().exists(p) && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(rows().exists(p), s"expected $what, got ${rows().mkString(",")}")
      }
      pollFor("alice count=2")(r => r.key == "alice" && r.count == 2 && !r.expired)
      pollFor("alice expiry tombstone")(r => r.key == "alice" && r.expired)
    } finally q.stop()
  }

  test("latest-value-per-key: set, overwrite, expiry → None (Redis SET/GET parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedCounters.KVSet]
    val latest = KeyedCounters.latestValuePerKey(input.toDS(), ttlMs = 50)
    val q = latest.writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .format("memory").queryName("kv_test").start()
    try {
      // two SETs in one batch: last one wins (overwrite semantics)
      input.addData(KeyedCounters.KVSet("drink", "latte"),
        KeyedCounters.KVSet("drink", "mocha"))
      def rows() = spark.table("kv_test").as[KeyedCounters.KVLatest].collect()
      def pollFor(what: String)(p: KeyedCounters.KVLatest => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (!rows().exists(p) && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(rows().exists(p), s"expected $what, got ${rows().mkString(",")}")
      }
      pollFor("overwrite to mocha")(r =>
        r.key == "drink" && r.value.contains("mocha") && !r.expired)
      // GET after TTL ≡ nil: tombstone with value=None
      pollFor("expiry tombstone")(r =>
        r.key == "drink" && r.value.isEmpty && r.expired)
    } finally q.stop()
  }

  test("S20: console sink prints the complete-mode word-count table") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val counts = Streams.wordCount(input.toDF().toDF("value"))
    val buf = new java.io.ByteArrayOutputStream()
    val oldOut = System.out
    System.setOut(new java.io.PrintStream(buf, true))
    // the sink prints from the stream-execution thread, which inherits
    // Console.out when started inside withOut
    try Console.withOut(buf) {
      val q = Streams.consoleSink(counts)
      try {
        input.addData("hello hello world")
        q.processAllAvailable()
      } finally q.stop()
    } finally System.setOut(oldOut)
    val out = buf.toString
    assert(out.contains("Batch:"), s"no console batch header in output")
    assert(out.contains("hello") && out.contains("word"),
      "word-count table not printed")
  }

  test("streaming dedup keeps first arrival per key within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "k", "value")
    val deduped = Streams.dedupStream(events, "ts", Seq("k"), "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_test").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // duplicate key "a" in the same batch and again in the next batch,
    // both inside the watermark window — only the first survives
    input.addData((t(1), "a", 1.0), (t(2), "a", 2.0), (t(3), "b", 3.0))
    q.processAllAvailable()
    input.addData((t(4), "a", 4.0), (t(5), "c", 5.0))
    q.processAllAvailable()
    val rows = spark.table("dedup_test")
      .select("k", "value").as[(String, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("a", 1.0), ("b", 3.0), ("c", 5.0)), rows.toString)
  }

  test("Trigger.AvailableNow drains the backlog, stops, resumes incrementally") {
    // the batch-catch-up trigger: process everything present, terminate,
    // and on the next run continue from the checkpoint — the shape a
    // scheduled 100 TB incremental ingest runs on (no always-on cluster)
    val srcDir = tmp("an_src")
    val outDir = tmp("an_out") + "/sink"
    val ckDir = tmp("an_ck")
    val schema = new org.apache.spark.sql.types.StructType().add("v", "long")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(srcDir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", outDir).start()
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    }
    Seq(1L, 2L, 3L).toDF("v").write.mode("append").json(srcDir)
    runOnce()
    assert(spark.read.parquet(outDir).count() === 3)
    Seq(4L, 5L).toDF("v").write.mode("append").json(srcDir)
    runOnce()
    val vs = spark.read.parquet(outDir).as[Long].collect().sorted
    assert(vs.sameElements(Array(1L, 2L, 3L, 4L, 5L)), vs.mkString(","))
  }
}
