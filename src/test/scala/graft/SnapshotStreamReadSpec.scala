package graft

import java.nio.file.Files

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** `readStream.format("graft-snapshot")` — the snapshot table AS a
  * stream (the Delta/Iceberg incremental-consumer shape). First batch
  * is the full snapshot at query start; each later manifest version
  * arrives as one micro-batch of exactly its appended files; offsets
  * are manifest versions, so a checkpointed restart resumes without
  * re-delivery; non-append history (overwrite/compaction) fails loudly.
  */
class SnapshotStreamReadSpec extends SparkTestBase {

  import spark.implicits._

  private def tbl(tag: String) =
    Files.createTempDirectory(s"snapread$tag").resolve("t").toString

  test("initial batch is the full snapshot; later commits arrive as increments") {
    val t = tbl("inc")
    Snapshots.commit((1L to 100L).toDF("id"), t)
    Snapshots.commit((101L to 150L).toDF("id"), t)
    val q = spark.readStream.format("graft-snapshot").option("path", t).load()
      .writeStream.format("memory").queryName("snapread_inc")
      .option("checkpointLocation", Files.createTempDirectory("srck").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table("snapread_inc").count() === 150) // full v2 snapshot
    Snapshots.commit((151L to 170L).toDF("id"), t)
    q.processAllAvailable()
    q.stop()
    // only the 20 appended rows arrived — nothing re-delivered
    assert(spark.table("snapread_inc").count() === 170)
    assert(spark.table("snapread_inc").select("id").as[Long].collect().sorted
      .toSeq === (1L to 170L))
  }

  test("table-to-table pipe: snapshot source into tokened snapshot sink, exactly-once across restart") {
    val src = tbl("pipesrc")
    val dst = tbl("pipedst")
    val ck = Files.createTempDirectory("pipeck").toString
    Snapshots.commit((1L to 60L).toDF("id"), src)
    Snapshots.commit((61L to 90L).toDF("id"), src)
    def pipe() = spark.readStream.format("graft-snapshot").option("path", src)
      .load()
      .writeStream.format("graft-snapshot")
      .option("path", dst).option("checkpointLocation", ck)
      .outputMode("append").start()
    val q1 = pipe()
    q1.processAllAvailable(); q1.stop()
    assert(Snapshots.read(spark, dst).count() === 90)
    // new data lands in src while the pipe is DOWN; restart resumes at
    // the checkpointed version — the 90 initial rows must not re-arrive
    Snapshots.commit((91L to 99L).toDF("id"), src)
    val q2 = pipe()
    q2.processAllAvailable(); q2.stop()
    assert(Snapshots.read(spark, dst).select("id").as[Long].collect().sorted
      .toSeq === (1L to 99L))
    // one version per delivered batch on the sink side: initial + delta
    assert(Snapshots.versions(spark, dst).size === 2)
  }

  test("a vacuumed checkpoint offset refuses loudly by default (failOnDataLoss)") {
    // the Delta failOnDataLoss story: the stream checkpointed at v2,
    // went down, v3/v4 landed, vacuum expired everything but v4 — the
    // commits between checkpoint and oldest retained version are
    // unrecoverable and the restart must say so, not guess
    val src = tbl("vacsrc")
    val dst = tbl("vacdst")
    val ck = Files.createTempDirectory("vacck").toString
    Snapshots.commit((1L to 10L).toDF("id"), src)   // v1
    Snapshots.commit((11L to 20L).toDF("id"), src)  // v2
    def pipe() = spark.readStream.format("graft-snapshot").option("path", src)
      .load()
      .writeStream.format("graft-snapshot")
      .option("path", dst).option("checkpointLocation", ck)
      .outputMode("append").start()
    val q1 = pipe()
    q1.processAllAvailable(); q1.stop() // checkpoint at v2
    Snapshots.commit((21L to 30L).toDF("id"), src)  // v3
    Snapshots.commit((31L to 40L).toDF("id"), src)  // v4
    assert(Snapshots.vacuum(spark, src, keepVersions = 1) >= 0)
    assert(Snapshots.versions(spark, src) === Seq(4L))
    val q2 = pipe()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(10000)
    }
    q2.stop()
    def hasVacuumed(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("vacuumed")) ||
        hasVacuumed(t.getCause))
    assert(hasVacuumed(err), s"unexpected failure: ${err.getMessage}")
    // nothing was guessed into the sink
    assert(Snapshots.read(spark, dst).count() === 20)
  }

  test("failOnDataLoss=false resumes from the oldest retained version; the gap is lost") {
    val src = tbl("fodlsrc")
    val dst = tbl("fodldst")
    val ck = Files.createTempDirectory("fodlck").toString
    def pipe(fodl: Boolean) = spark.readStream.format("graft-snapshot")
      .option("path", src).option("failOnDataLoss", fodl.toString).load()
      .writeStream.format("graft-snapshot")
      .option("path", dst).option("checkpointLocation", ck)
      .outputMode("append").start()
    Snapshots.commit((1L to 10L).toDF("id"), src)   // v1
    Snapshots.commit((11L to 20L).toDF("id"), src)  // v2
    val q1 = pipe(fodl = true)
    q1.processAllAvailable(); q1.stop() // checkpoint at v2
    Snapshots.commit((21L to 30L).toDF("id"), src)  // v3 (will be the gap)
    Snapshots.commit((31L to 40L).toDF("id"), src)  // v4 (baseline after vacuum)
    Snapshots.vacuum(spark, src, keepVersions = 1)
    val q2 = pipe(fodl = false)
    q2.processAllAvailable()
    // the stream is live again; a new commit flows normally
    Snapshots.commit((41L to 50L).toDF("id"), src)  // v5
    q2.processAllAvailable(); q2.stop()
    val got = Snapshots.read(spark, dst).select("id").as[Long].collect().sorted.toSeq
    // 1-20 delivered before the outage; 21-40 are the DOCUMENTED loss
    // (baseline state at resume — not re-delivered, not merged into a
    // later diff); 41-50 flow after resume
    assert(got === ((1L to 20L) ++ (41L to 50L)),
      s"gap semantics violated: $got")
  }

  test("an overwrite in the tailed history fails the stream loudly") {
    val t = tbl("ovw")
    Snapshots.commit((1L to 10L).toDF("id"), t)
    val q = spark.readStream.format("graft-snapshot").option("path", t).load()
      .writeStream.format("memory").queryName("snapread_ovw")
      .option("checkpointLocation", Files.createTempDirectory("ovwck").toString)
      .start()
    q.processAllAvailable()
    Snapshots.commit((100L to 105L).toDF("id"), t, overwrite = true)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(10000)
    }
    q.stop()
    assert(err.getMessage.contains("not append-only") ||
      Option(err.getCause).exists(_.getMessage.contains("not append-only")),
      s"unexpected failure: ${err.getMessage}")
  }

  test("skipChangeCommits streams appends through interleaved rewrites") {
    val t = tbl("skip")
    Snapshots.commit((1L to 10L).toDF("id").withColumn("v", col("id")), t)
    val q = spark.readStream.format("graft-snapshot").option("path", t)
      .option("skipChangeCommits", "true").load()
      .writeStream.format("memory").queryName("snapread_skip")
      .option("checkpointLocation", Files.createTempDirectory("skipck").toString)
      .start()
    q.processAllAvailable() // initial: the full 10-row snapshot
    // one poll window spanning change and append commits interleaved:
    // merge (rewrite), append, compact (rewrite), append
    Snapshots.merge(spark, t, Seq((1L, 100L)).toDF("id", "v"), "id")
    Snapshots.commit(Seq((11L, 11L)).toDF("id", "v"), t)
    Snapshots.compact(spark, t)
    Snapshots.commit(Seq((12L, 12L)).toDF("id", "v"), t)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("snapread_skip").select("id", "v")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // the two appends arrived; neither rewrite re-delivered its carried
    // rows (id=1 keeps the INITIAL v — the merge's new row is a change,
    // not an append; 12 rows total, not 10+rewritten)
    assert(got.map(_._1) === (1L to 12L))
    assert(got.head === (1L, 1L))
  }

  test("readChangeFeed streams per-commit diffs: merge as pair, delete as deletes") {
    val t = tbl("cdf")
    Snapshots.commit((1L to 6L).toDF("id").withColumn("v", col("id") * 10), t)
    val q = spark.readStream.format("graft-snapshot").option("path", t)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("snapread_cdf")
      .option("checkpointLocation", Files.createTempDirectory("cdfck").toString)
      .start()
    q.processAllAvailable() // initial: full snapshot tagged insert
    assert(spark.table("snapread_cdf").filter(col("_change_type") === "insert")
      .count() === 6)
    // one poll window spanning an update-merge AND a delete: per-commit
    // granularity means the update surfaces as its delete+insert pair
    // and the deleted row as a delete — even though id=2's end-to-end
    // net effect in the window is just "v changed"
    Snapshots.merge(spark, t, Seq((2L, 999L)).toDF("id", "v"), "id")
    Snapshots.deleteWhere(spark, t, col("id") === 5L)
    q.processAllAvailable()
    q.stop()
    val changes = spark.table("snapread_cdf")
      .select("id", "v", "_change_type").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val initial = (1L to 6L).map(i => (i, i * 10, "insert"))
    val fromMerge = Seq((2L, 20L, "delete"), (2L, 999L, "insert"))
    val fromDelete = Seq((5L, 50L, "delete"))
    assert(changes === (initial ++ fromMerge ++ fromDelete).sorted)
    // a CDF consumer can maintain a mirror: inserts minus deletes == table
    val mirror = changes.filter(_._3 == "insert").map(c => (c._1, c._2))
      .diff(changes.filter(_._3 == "delete").map(c => (c._1, c._2)))
    assert(mirror.sorted ===
      Snapshots.read(spark, t).as[(Long, Long)].collect().sorted.toSeq)
    // readChangeFeed + skipChangeCommits is contradictory -> rejected
    intercept[Exception](spark.readStream.format("graft-snapshot")
      .option("path", t).option("readChangeFeed", "true")
      .option("skipChangeCommits", "true").load())
  }

  test("a user-supplied schema on a streaming read is rejected") {
    val t = tbl("sch")
    Snapshots.commit((1L to 5L).toDF("id"), t)
    val err = intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .schema(org.apache.spark.sql.types.StructType.fromDDL("bogus STRING"))
        .option("path", t).load()
    }
    assert(err.getMessage.contains("committed schema"), err.getMessage)
  }
}
