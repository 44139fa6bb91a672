package graft

import graft.operators.Similarity
import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming IVF-index ingest: frozen-quantizer assignment through the
  * real micro-batch sink, append-only postings (history immutable under
  * later ingests), and tokened exactly-once replay. Search semantics
  * over the committed postings are pinned by s14_ivf_ingest's oracle;
  * these specs pin the streaming/transactional behavior the oracle
  * cannot see.
  */
class IvfIngestSpec extends SparkTestBase {

  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  // two well-separated 2-d centroids: cell assignment is unambiguous
  private def centroids = Seq(
    (100L, Seq(1.0, 0.0)),
    (200L, Seq(0.0, 1.0)))
    .toDF("cid", "cv")
    .withColumn("cn", sqrt(aggregate(col("cv"), lit(0.0), (a, x) => a + x * x)))

  private def batchDf(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  private def tbl(tag: String) =
    Files.createTempDirectory(tag).resolve("t").toString

  test("micro-batches assign to frozen centroids; postings accumulate append-only") {
    val t = tbl("ivfsink")
    val ck = Files.createTempDirectory("ivfsinkck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    mem.addData((1L, Seq(0.9, 0.1)), (2L, Seq(0.2, 0.8)))
    val q = streaming.Streams.ivfSink(
      mem.toDF().toDF("vec_id", "v")
        .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))),
      t, centroids, ck)
    q.processAllAvailable()
    mem.addData((3L, Seq(0.7, 0.3)), (4L, Seq(0.1, 0.9)))
    q.processAllAvailable(); q.stop()
    val got = Snapshots.read(spark, t).select("vec_id", "cell")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 100L, 2L -> 200L, 3L -> 100L, 4L -> 200L))
    // ingest 2 appended: version 1 still reads exactly the first batch
    val vs = Snapshots.versions(spark, t)
    assert(vs.length === 2)
    val v1 = Snapshots.read(spark, t, asOf = Some(vs.head))
      .select("vec_id").as[Long].collect().toSet
    assert(v1 === Set(1L, 2L))
  }

  test("replayed micro-batch with the same token commits exactly once") {
    val t = tbl("ivfrep")
    val b = batchDf((10L, Seq(0.9, 0.1)), (11L, Seq(0.1, 0.9)))
    Similarity.ivfIngest(t, b, centroids, "tok-A")
    val v1 = Snapshots.versions(spark, t)
    Similarity.ivfIngest(t, b, centroids, "tok-A") // crash-replay
    assert(Snapshots.versions(spark, t) === v1)
    assert(Snapshots.read(spark, t).count() === 2)
  }

  test("postings carry exact vectors: parquet round-trip preserves doubles") {
    val t = tbl("ivfrt")
    val v = Seq(math.Pi / 3, math.sqrt(2) / 7)
    Similarity.ivfIngest(t, batchDf((20L, v)), centroids, "tok-B")
    val back = Snapshots.read(spark, t)
      .select("v").as[Seq[Double]].head()
    assert(back === v) // bitwise equality, not approx
  }
}
