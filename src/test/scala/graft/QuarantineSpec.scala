package graft

import java.nio.file.{Files, Paths}

import graft.sources.Ingest
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class QuarantineSpec extends SparkTestBase {

  import spark.implicits._

  test("T7: corrupt JSONL rows split into quarantine, clean rows proceed") {
    val dir = Files.createTempDirectory("quar").toString
    Files.writeString(Paths.get(s"$dir/in.jsonl"),
      """{"id": 1, "amount": 10.5}
        |this is not json at all
        |{"id": 2, "amount": "NaNsense"}
        |{"id": 3, "amount": 7.0}
        |""".stripMargin)
    val schema = StructType.fromDDL("id INT, amount DOUBLE")
    val clean = Ingest.readJsonlWithQuarantine(
      spark, schema, s"$dir/in.jsonl", s"$dir/_bad")
    assert(clean.count() === 2)
    assert(clean.agg(sum("id")).head.getLong(0) === 4L)
    val bad = spark.read.text(s"$dir/_bad").as[String].collect()
    assert(bad.length === 2)
    assert(bad.exists(_.contains("not json")))
    assert(bad.exists(_.contains("NaNsense")))
  }

  test("stream-static broadcast enrichment joins dims without stream shuffle") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10, "books"), (20, "toys")).toDF("item_id", "category")
    val input = MemoryStream[(Int, Double)]
    val enriched = Streams.enrichStream(
      input.toDF().toDF("item_id", "value"), dim, Seq("item_id"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_test").start()
    try {
      input.addData((10, 1.0), (20, 2.0), (99, 3.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("item_id", "category").collect()
        .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
      assert(rows === Map(10 -> Some("books"), 20 -> Some("toys"), 99 -> None))
    } finally q.stop()
  }
}
