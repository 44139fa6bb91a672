package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CDC across row-preserving maintenance: the file-granular feed
  * (`changes`) and the streaming snapshot source walk history per step,
  * so compaction / z-order / bin-pack / purges contribute zero rows
  * instead of blinding every incremental consumer — while real change
  * commits (overwrite, MOR delete, equality upsert) still refuse.
  */
class CdcMaintenanceSpec extends SparkTestBase {

  import spark.implicits._

  private def tbl(tag: String): String =
    Files.createTempDirectory(s"cdcm-$tag").toString + "/t"

  test("changes() walks across compact/binpack/zorder; maintenance steps emit zero rows") {
    val t = tbl("walk")
    Snapshots.commit((1L to 100L).toDF("id").withColumn("v", col("id") * 2)
      .coalesce(2), t)                                         // v1
    Snapshots.commit((101L to 150L).toDF("id")
      .withColumn("v", col("id") * 2).coalesce(2), t)          // v2
    Snapshots.compact(spark, t, numFiles = 2)                  // v3
    Snapshots.commit((151L to 160L).toDF("id")
      .withColumn("v", col("id") * 2), t)                      // v4
    Snapshots.binPack(spark, t, 1L << 30, minInputFiles = 2)   // v5
    Snapshots.optimizeZOrder(spark, t, "id", "v", numFiles = 2) // v6
    Snapshots.commit((161L to 170L).toDF("id")
      .withColumn("v", col("id") * 2), t)                      // v7
    assert(Snapshots.versions(spark, t) === (1L to 7L))
    // appends land exactly once, originals readable across the rewrites
    assert(Snapshots.changes(spark, t, 1L, 7L)
      .select("id").as[Long].collect().sorted.toSeq === (101L to 170L))
    // a maintenance-only window is empty — compaction-only commits emit
    // zero change rows
    assert(Snapshots.changes(spark, t, 2L, 3L).count() === 0L)
    assert(Snapshots.changes(spark, t, 4L, 6L).count() === 0L)
    // the row-level feed agrees (its skip rule predates this walk)
    assert(Snapshots.changeFeed(spark, t, 2L, 3L).count() === 0L)
  }

  test("changes() still refuses real change commits, naming the right remedy") {
    val t = tbl("refuse")
    Snapshots.commit((1L to 50L).toDF("id"), t)              // v1
    Snapshots.commit((51L to 60L).toDF("id"), t)             // v2
    Snapshots.deleteWhereMor(spark, t, col("id") <= 5L)      // v3 (MOR)
    val e1 = intercept[Exception](Snapshots.changes(spark, t, 1L, 3L))
    assert(e1.getMessage.contains("merge-on-read DELETE"), e1.getMessage)
    // still fine up to the clean prefix
    assert(Snapshots.changes(spark, t, 1L, 2L).count() === 10L)
    Snapshots.purgeDeletes(spark, t)                         // v4 (maintenance)
    val e2 = intercept[Exception](Snapshots.changes(spark, t, 1L, 4L))
    assert(e2.getMessage.contains("merge-on-read DELETE"), e2.getMessage)
    // from AFTER the delete, across the purge alone: zero rows
    assert(Snapshots.changes(spark, t, 3L, 4L).count() === 0L)
    Snapshots.commit((100L to 110L).toDF("id"), t, overwrite = true) // v5
    val e3 = intercept[Exception](Snapshots.changes(spark, t, 4L, 5L))
    assert(e3.getMessage.contains("not append-only"), e3.getMessage)
  }

  test("mid-stream compaction: the stream survives and delivers only later appends") {
    val t = tbl("stream")
    Snapshots.commit((1L to 80L).toDF("id"), t)
    val q = spark.readStream.format("graft-snapshot").option("path", t).load()
      .writeStream.format("memory").queryName("cdcm_stream")
      .option("checkpointLocation", Files.createTempDirectory("cdcmck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdcm_stream").count() === 80L)
      // compaction lands BETWEEN the stream's polls — previously this
      // killed the stream with "not append-only"
      Snapshots.commit((81L to 90L).toDF("id"), t)
      Snapshots.compact(spark, t)
      Snapshots.commit((91L to 100L).toDF("id"), t)
      q.processAllAvailable()
      assert(spark.table("cdcm_stream").select("id").as[Long]
        .collect().sorted.toSeq === (1L to 100L),
        "appends around the compaction arrive exactly once")
    } finally q.stop()
  }

  test("an overwrite mid-stream still fails loudly (maintenance tolerance is not a loophole)") {
    val t = tbl("loud")
    Snapshots.commit((1L to 10L).toDF("id"), t)
    val q = spark.readStream.format("graft-snapshot").option("path", t).load()
      .writeStream.format("memory").queryName("cdcm_loud")
      .option("checkpointLocation", Files.createTempDirectory("cdcmlk").toString)
      .start()
    try {
      q.processAllAvailable()
      Snapshots.commit((100L to 105L).toDF("id"), t, overwrite = true)
      val e = intercept[Exception] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(e.getMessage.contains("not append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("not append-only")),
        e.getMessage)
    } finally q.stop()
  }
}
