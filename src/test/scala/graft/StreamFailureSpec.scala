package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming failure-injection matrix for the CDC-in chain (round-4
  * prescription): out-of-order sequence numbers across micro-batches, a
  * writer killed between its data write and its manifest publish (the
  * gc-able orphan), and batch replay — all driven through the REAL
  * mergeSink, with the uninterrupted run as the reference state.
  */
class StreamFailureSpec extends SparkTestBase {

  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def tbl(tag: String) =
    Files.createTempDirectory(tag).resolve("t").toString

  private def state(t: String): Set[(Long, Long, String)] =
    Snapshots.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("out-of-order sequences: a late lower-seq batch never rolls a key back") {
    val t = tbl("ooo")
    val ck = Files.createTempDirectory("ooock").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    mem.addData((1L, 20L, "new"), (2L, 5L, "b"))
    val q1 = streaming.Streams.mergeSink(
      mem.toDF().toDF("k", "seq", "v"), t, "k", "seq", ck)
    q1.processAllAvailable(); q1.stop()
    // late arrivals: k=1 seq=10 is STALE (table carries seq=20) and must
    // be skipped; k=2 seq=6 is fresh and must apply
    mem.addData((1L, 10L, "stale"), (2L, 6L, "b2"))
    val q2 = streaming.Streams.mergeSink(
      mem.toDF().toDF("k", "seq", "v"), t, "k", "seq", ck)
    q2.processAllAvailable(); q2.stop()
    assert(state(t) === Set((1L, 20L, "new"), (2L, 6L, "b2")))
  }

  test("kill between data write and manifest publish: orphan invisible, gc grace-correct") {
    val t = tbl("orph")
    Snapshots.commit(Seq((1L, 1L, "a")).toDF("k", "seq", "v"), t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a writer that died after writing data, before publishing: data
    // files exist under the table, no manifest references them
    val orphanDir = s"$t/data/crashed-${java.util.UUID.randomUUID}"
    Seq((99L, 9L, "zz")).toDF("k", "seq", "v").write.parquet(orphanDir)
    // invisible to readers and to the change feed
    assert(state(t) === Set((1L, 1L, "a")))
    assert(Snapshots.changes(spark, t, 1L, 1L).count() === 0)
    // fresh orphan survives a graceful gc (could be an in-flight writer)
    assert(Snapshots.gc(spark, t, graceMs = 3600 * 1000L) === 0)
    // aged orphan is reclaimed
    val old = System.currentTimeMillis() - 10 * 3600 * 1000L
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(orphanDir), true)
    while (it.hasNext) { val st = it.next(); fs.setTimes(st.getPath, old, old) }
    fs.setTimes(new org.apache.hadoop.fs.Path(orphanDir), old, old)
    assert(Snapshots.gc(spark, t, graceMs = 3600 * 1000L) > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(orphanDir)))
    assert(state(t) === Set((1L, 1L, "a")))
  }

  test("gc gates whole-dir reclaim on the NEWEST nested file, not the dir mtime") {
    val t = tbl("inflight")
    Snapshots.commit(Seq((1L, 1L, "a")).toDF("k", "seq", "v"), t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-flight writer shape: only _temporary task attempts, parent dir
    // mtime ALREADY past the grace window, newest nested file fresh —
    // the pre-fix gc would have deleted this mid-write
    val dir = new org.apache.hadoop.fs.Path(s"$t/data/inflight-x/_temporary/0")
    fs.mkdirs(dir)
    val f = new org.apache.hadoop.fs.Path(dir, "attempt-part-0")
    val out = fs.create(f, true); out.write(1); out.close()
    val old = System.currentTimeMillis() - 10 * 3600 * 1000L
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$t/data/inflight-x"), old, old)
    assert(Snapshots.gc(spark, t, graceMs = 3600 * 1000L) === 0)
    assert(fs.exists(f), "gc deleted an in-flight writer's work")
    // once the newest nested file ages out too, the residue is reclaimed
    fs.setTimes(f, old, old)
    fs.setTimes(dir, old, old)
    fs.setTimes(dir.getParent, old, old)
    assert(Snapshots.gc(spark, t, graceMs = 3600 * 1000L) > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/inflight-x")))
  }

  test("end-to-end: replay + orphan + out-of-order converge to the uninterrupted reference") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq((1L, 10L, "a1"), (2L, 10L, "b1"), (3L, 10L, "c1"))
    val b2 = Seq((1L, 20L, "a2"), (2L, 5L, "stale-b"), (4L, 20L, "d1"))

    // interrupted chain: batch 1, a crashed writer's orphan, batch 2,
    // then batch 2 REPLAYED through a fresh sink (crash after merge,
    // before the engine committed the offset)
    val t = tbl("e2e")
    val mem = MemoryStream[(Long, Long, String)]
    mem.addData(b1: _*)
    val q1 = streaming.Streams.mergeSink(
      mem.toDF().toDF("k", "seq", "v"), t, "k", "seq",
      Files.createTempDirectory("e2eck1").toString)
    q1.processAllAvailable(); q1.stop()
    Seq((99L, 99L, "orphan")).toDF("k", "seq", "v")
      .write.parquet(s"$t/data/crashed-${java.util.UUID.randomUUID}")
    val mem2 = MemoryStream[(Long, Long, String)]
    mem2.addData(b2: _*)
    val q2 = streaming.Streams.mergeSink(
      mem2.toDF().toDF("k", "seq", "v"), t, "k", "seq",
      Files.createTempDirectory("e2eck2").toString)
    q2.processAllAvailable(); q2.stop()
    val mem3 = MemoryStream[(Long, Long, String)]
    mem3.addData(b2: _*) // replay
    val q3 = streaming.Streams.mergeSink(
      mem3.toDF().toDF("k", "seq", "v"), t, "k", "seq",
      Files.createTempDirectory("e2eck3").toString)
    q3.processAllAvailable(); q3.stop()

    // reference: same events, one uninterrupted sink, single batch
    val ref = tbl("e2eref")
    val memR = MemoryStream[(Long, Long, String)]
    memR.addData((b1 ++ b2): _*)
    val qR = streaming.Streams.mergeSink(
      memR.toDF().toDF("k", "seq", "v"), ref, "k", "seq",
      Files.createTempDirectory("e2eckr").toString)
    qR.processAllAvailable(); qR.stop()

    assert(state(t) === state(ref))
    assert(state(t) === Set(
      (1L, 20L, "a2"), (2L, 10L, "b1"), (3L, 10L, "c1"), (4L, 20L, "d1")))
  }

  test("mergeSink absorbs concurrent committers: lost races retry, no writer clobbered") {
    // a tight loop of independent commits lands on the table WHILE the
    // sink merges its micro-batches — any merge that loses the version
    // race must re-probe and retry (pre-fix: the first loss killed the
    // streaming query), and neither side may lose the other's rows
    val t = tbl("race")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val landed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val bg = new Thread(() => {
      var i = 1L
      while (!stop.get && i <= 40) {
        try {
          Snapshots.commit(Seq((-i, 0L, s"bg-$i")).toDF("k", "seq", "v"), t)
          landed.add(-i)
        } catch { case _: Throwable => } // commit starved under contention
        i += 1
      }
    })
    bg.start()
    val mem = MemoryStream[(Long, Long, String)]
    val q = streaming.Streams.mergeSink(
      mem.toDF().toDF("k", "seq", "v"), t, "k", "seq",
      Files.createTempDirectory("raceck").toString)
    for (b <- 1 to 5) {
      mem.addData((1L, b.toLong, s"s-$b"), (b.toLong + 10L, 1L, s"n-$b"))
      q.processAllAvailable()
    }
    q.stop(); stop.set(true); bg.join()
    val st = state(t)
    // the sink's per-key final values survived every race
    assert(st.contains((1L, 5L, "s-5")))
    for (b <- 1 to 5) assert(st.contains((b.toLong + 10L, 1L, s"n-$b")))
    // every commit that RETURNED is still readable — a merge that lost
    // the race never published a manifest missing the winner's files
    import scala.jdk.CollectionConverters._
    for (k <- landed.asScala)
      assert(st.exists(_._1 == k), s"concurrent committer's row $k lost")
    assert(landed.size > 0, "background committer never landed — no contention")
  }
}
