package graft

import graft.operators.Dedup
import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming dedup-ingest sink: cross-batch exact + near suppression
  * through the band-index sidecar, tokened exactly-once commits, and
  * the two replay windows (full replay; crash between the data commit
  * and the index commit). Oracle-side semantics are pinned by
  * d14_stream_dedup; these specs pin the streaming/transactional
  * behavior the oracle cannot see.
  */
class StreamDedupSpec extends SparkTestBase {

  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private val bands = 4 // Dedup.Bands (private[operators])

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val nearDup = base.replace("upsilon", "omega") // 17/19 shingles shared
  private val other = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"

  private def tbl(tag: String) =
    Files.createTempDirectory(tag).resolve("t").toString

  test("exact + near dupes dropped across micro-batches; index rows consistent") {
    val t = tbl("dsink")
    val ck = Files.createTempDirectory("dsinkck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // doc 2 is an in-batch exact twin of 1 (keep the lower id)
    mem.addData((1L, base), (2L, base), (3L, other))
    val q = streaming.Streams.dedupSink(mem.toDF().toDF("doc_id", "text"), t, ck)
    q.processAllAvailable()
    // 4 = exact dup of committed 1; 5 = near dup of 1 (one word changed,
    // signature agreement ~0.9); 6 = novel
    mem.addData((4L, base), (5L, nearDup),
      (6L, "completely different words here indeed quite unlike anything"))
    q.processAllAvailable(); q.stop()
    val kept = Snapshots.read(spark, t).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 6L))
    // sidecar: one fingerprint row (carrying the signature) + one row
    // per band per KEPT doc — nothing indexed for dropped docs
    val idx = Snapshots.read(spark, s"$t/_index")
    assert(idx.filter(col("sig").isNotNull).count() === 3)
    assert(idx.filter(col("sig").isNull).count() === 3L * bands)
  }

  test("full replay with the same token leaves both tables untouched") {
    val t = tbl("dsinkrep")
    val d = Seq((10L, base), (11L, other)).toDF("doc_id", "text")
    Dedup.ingestBatch(t, d, "tok-A")
    val v1 = Snapshots.versions(spark, t)
    val i1 = Snapshots.versions(spark, s"$t/_index")
    Dedup.ingestBatch(t, d, "tok-A") // crash-after-both-commits replay
    assert(Snapshots.versions(spark, t) === v1)
    assert(Snapshots.versions(spark, s"$t/_index") === i1)
    assert(Snapshots.read(spark, t).count() === 2)
  }

  test("crash between data and index commit: replay completes the index, no double data") {
    val t = tbl("dsinkhalf")
    val d = Seq((20L, base), (21L, other)).toDF("doc_id", "text")
    // the crash half: the data commit landed with the sink's token, the
    // index commit never ran
    Snapshots.commit(d, t, token = Some("tok-B-data"))
    assert(Snapshots.versions(spark, s"$t/_index").isEmpty)
    Dedup.ingestBatch(t, d, "tok-B") // replay of the same micro-batch
    assert(Snapshots.read(spark, t).count() === 2)
    val idx = Snapshots.read(spark, s"$t/_index")
    assert(idx.filter(col("sig").isNotNull).count() === 2)
    assert(idx.filter(col("sig").isNull).count() === 2L * bands)
  }

  test("a fresh-checkpoint second sink is not swallowed by the first sink's batch-0 token") {
    val t = tbl("dsinkapp")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m1 = MemoryStream[(Long, String)]
    m1.addData((30L, base))
    val q1 = streaming.Streams.dedupSink(m1.toDF().toDF("doc_id", "text"), t,
      Files.createTempDirectory("ck1").toString)
    q1.processAllAvailable(); q1.stop()
    // a NEW sink (new checkpoint) restarts batch ids at 0 — its token
    // must differ or this commit would silently no-op
    val m2 = MemoryStream[(Long, String)]
    m2.addData((31L, other))
    val q2 = streaming.Streams.dedupSink(m2.toDF().toDF("doc_id", "text"), t,
      Files.createTempDirectory("ck2").toString)
    q2.processAllAvailable(); q2.stop()
    val kept = Snapshots.read(spark, t).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(30L, 31L))
  }
}
