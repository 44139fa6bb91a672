package graft

import java.nio.file.Files

import graft.sources.Snapshots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** `writeStream.format("graft-snapshot")` — the V2 surface's streaming
  * write path. The sink must be exactly-once under at-least-once batch
  * replay (tokened manifest commits), append a time-travelable version
  * per batch in Append mode, publish overwrite versions in Complete
  * mode, and reject Update at query start.
  */
class SnapshotStreamWriteSpec extends SparkTestBase {

  import spark.implicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tbl(tag: String) =
    Files.createTempDirectory(s"snapstream$tag").resolve("t").toString

  test("append mode: a snapshot version per micro-batch, readable and time-travelable") {
    val t = tbl("append")
    val ck = Files.createTempDirectory("snapstreamck").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("path", t).option("checkpointLocation", ck)
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val vs = Snapshots.versions(spark, t)
    assert(vs.size === 2, s"expected one version per batch, got $vs")
    // latest via the format read; the first batch alone via time travel
    val latest = spark.read.format("graft-snapshot").option("path", t).load()
    assert(latest.count() === 3)
    val v1 = spark.read.format("graft-snapshot")
      .option("path", t).option("asOf", vs.head).load()
    assert(v1.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("a replayed micro-batch commits nothing: tokens make the sink exactly-once") {
    // drive the sink directly with a pinned batchId — the deterministic
    // equivalent of a crash after commit but before the engine recorded
    // the offset, replayed through a FRESH sink instance on restart
    val t = tbl("replay")
    val provider = new graft.sources.v2.SnapshotProvider
    def sink() = provider.createSink(spark.sqlContext,
      Map("path" -> t, "checkpointLocation" -> "ckns"),
      Seq.empty, OutputMode.Append())
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink().addBatch(0, batch)
    assert(Snapshots.versions(spark, t).size === 1)
    sink().addBatch(0, batch) // replay: same namespace, same batchId
    assert(Snapshots.versions(spark, t).size === 1, "replayed batch published")
    assert(Snapshots.read(spark, t).count() === 2)
    // a DIFFERENT query (different checkpoint namespace) is not deduped
    provider.createSink(spark.sqlContext,
      Map("path" -> t, "checkpointLocation" -> "other-ckns"),
      Seq.empty, OutputMode.Append()).addBatch(0, batch)
    assert(Snapshots.versions(spark, t).size === 2)
  }

  test("complete mode: each batch is an overwrite version; history stays readable") {
    val t = tbl("complete")
    val ck = Files.createTempDirectory("snapstreamckc").toString
    val mem = MemoryStream[String]
    val counts = mem.toDF().toDF("word").groupBy("word")
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("graft-snapshot")
      .option("path", t).option("checkpointLocation", ck)
      .outputMode(OutputMode.Complete()).start()
    mem.addData("x", "y", "x")
    q.processAllAvailable()
    mem.addData("x")
    q.processAllAvailable()
    q.stop()
    val vs = Snapshots.versions(spark, t)
    assert(vs.size === 2)
    val latest = Snapshots.read(spark, t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest === Map("x" -> 3L, "y" -> 1L))
    val first = Snapshots.read(spark, t, asOf = Some(vs.head))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first === Map("x" -> 2L, "y" -> 1L))
  }

  test("update mode is rejected at query start") {
    val err = intercept[Exception] {
      val mem = MemoryStream[(Long, String)]
      mem.toDF().toDF("id", "v")
        .writeStream.format("graft-snapshot")
        .option("path", tbl("upd"))
        .option("checkpointLocation", Files.createTempDirectory("uck").toString)
        .outputMode(OutputMode.Update()).start()
    }
    assert(err.getMessage.contains("Update"), err.getMessage)
  }

  test("streaming appends interleave safely with batch V2 writes on one table") {
    // one table, two write APIs: batch V2 append creates it, a stream
    // appends two batches, a batch V2 append lands after — every
    // version readable, row set is the union, schemas never mix
    val t = tbl("mixed")
    Seq((100L, "batch0")).toDF("id", "v")
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    val ck = Files.createTempDirectory("snapstreamckm").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("path", t).option("checkpointLocation", ck)
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, "s1"))
    q.processAllAvailable()
    mem.addData((2L, "s2"))
    q.processAllAvailable()
    q.stop()
    Seq((200L, "batch1")).toDF("id", "v")
      .write.format("graft-snapshot").option("path", t).mode("append").save()
    assert(Snapshots.versions(spark, t).size === 4)
    assert(spark.read.format("graft-snapshot").option("path", t).load()
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 100L, 200L))
  }
}
