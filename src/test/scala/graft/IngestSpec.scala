package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IngestSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  val txSchema = StructType.fromDDL(
    "id INT, timestamp STRING, items STRING, category STRING")

  test("S1: many headerless CSVs read as one frame (lab01 parity)") {
    val dir = tmp("csvs")
    (0 until 20).foreach { i =>
      Files.writeString(Paths.get(s"$dir/part_$i.csv"),
        (0 until 10).map(j => s"${i * 10 + j},2025-01-01T00:00:00,apple;pear,Grocery").mkString("\n"))
    }
    val df = Ingest.readHeaderlessCsv(spark, s"$dir/*.csv", txSchema)
    assert(df.count() === 200)
    assert(df.schema.fieldNames.toSeq === Seq("id", "timestamp", "items", "category"))
    assert(df.agg(countDistinct("id")).head.getLong(0) === 200)
  }

  test("S3: gzip CSV reads transparently") {
    val dir = tmp("gz")
    val out = new GZIPOutputStream(Files.newOutputStream(Paths.get(s"$dir/tx.csv.gz")))
    out.write("1,2025-01-01,milk,Grocery\n2,2025-01-02,pen,Stationery\n".getBytes)
    out.close()
    val df = Ingest.readHeaderlessCsv(spark, s"$dir/tx.csv.gz", txSchema)
    assert(df.count() === 2)
    assert(df.filter($"category" === "Stationery").count() === 1)
  }

  test("S4: schema-first JSONL (gzip) with nested structs (revenue_analysis parity)") {
    val dir = tmp("jsonl")
    val schema = StructType.fromDDL(
      "ts STRING, event STRING, user_id INT, context STRUCT<country: STRING, device: STRING>, " +
        "props STRUCT<price: DOUBLE, payment_method: STRING>")
    val out = new GZIPOutputStream(Files.newOutputStream(Paths.get(s"$dir/part-00.jsonl.gz")))
    out.write(
      """{"ts":"2025-10-01T00:00:00+00:00","event":"purchase","user_id":7,"context":{"country":"DE","device":"ios"},"props":{"price":9.99,"payment_method":"card"}}
        |{"ts":"2025-10-01T00:01:00+00:00","event":"view","user_id":8,"context":{"country":"US","device":"web"},"props":{}}
        |""".stripMargin.getBytes)
    out.close()
    val df = Ingest.readJsonl(spark, schema, s"$dir/part-00.jsonl.gz")
    assert(df.count() === 2)
    assert(df.filter(col("props.price") > 9).select("context.country").head.getString(0) === "DE")
  }

  test("S6: multi-line JSON doc with users[] array explodes to rows (lab02 parity)") {
    val dir = tmp("docjson")
    Files.writeString(Paths.get(s"$dir/users.json"),
      """{"generated_at": "2025-01-01",
        | "users": [
        |  {"id": 1, "profile": {"name": "Ann", "ip": "10.0.0.1"}, "tags": ["a", "b"]},
        |  {"id": 2, "profile": {"name": "Bob", "ip": "10.0.0.2"}, "tags": []}
        |]}""".stripMargin)
    val df = Ingest.readJsonDocArray(spark, s"$dir/users.json", "users")
    assert(df.count() === 2)
    assert(df.select(col("profile.name")).as[String].collect().toSet === Set("Ann", "Bob"))
  }

  test("S7/A11: apache combined log parse + error histogram (lab02 parity)") {
    val lines = Seq(
      """10.0.0.1 - alice [01/Feb/2025:13:05:21 +0000] "GET /api/items HTTP/1.1" 200 512 "-" "curl/8.0" level=INFO request_id=r1""",
      """10.0.0.2 - - [01/Feb/2025:13:05:22 +0000] "POST /api/orders HTTP/1.1" 500 128 "http://x" "Mozilla/5.0" level=ERROR request_id=r2 error_type=ERROR:SCHEMA_MISMATCH""",
      """10.0.0.3 - - [01/Feb/2025:13:05:23 +0000] "GET /health HTTP/1.1" 503 - "-" "kube-probe" level=ERROR request_id=r3 error_type=ERROR:TIMEOUT""",
      """10.0.0.2 - - [01/Feb/2025:13:06:00 +0000] "GET /api/x HTTP/1.1" 500 64 "-" "curl/8.0" level=ERROR request_id=r4 error_type=ERROR:SCHEMA_MISMATCH""",
      "garbage line that matches nothing").toDF("value")
    val parsed = Ingest.parseApacheLogs(lines)
    assert(parsed.count() === 4) // garbage dropped
    val r1 = parsed.filter($"request_id" === "r1").head
    assert(r1.getAs[String]("method") === "GET")
    assert(r1.getAs[Int]("status") === 200)
    assert(r1.getAs[String]("user") === "alice")
    assert(parsed.filter($"request_id" === "r3").head.isNullAt(
      parsed.schema.fieldIndex("bytes")))
    val hist = Ingest.errorHistogram(parsed).as[(String, Long)].collect().toList
    assert(hist === List(("ERROR:SCHEMA_MISMATCH", 2L), ("ERROR:TIMEOUT", 1L)))
    // timestamps parsed with the %d/%b/%Y:%H:%M:%S %z pattern
    assert(parsed.filter($"ts".isNull).count() === 0)
  }

  test("S2/S13: header CSV round-trip with schema-first read") {
    val dir = tmp("hdr")
    val src = Seq((1, "EWR", 18), (2, "SFO", 13)).toDF("id", "airport", "elevation_ft")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/out")
    val schema = StructType.fromDDL("id INT, airport STRING, elevation_ft INT")
    val back = Ingest.readCsv(spark, s"$dir/out", Some(schema))
    assert(back.count() === 2)
    assert(back.schema("elevation_ft").dataType === IntegerType)
    // and the inference path (no schema) — returns data, types best-effort
    assert(Ingest.readCsv(spark, s"$dir/out").count() === 2)
  }

  test("S10/S11: partitioned write + partition-pruned read-back") {
    val dir = tmp("part")
    val df = Tables.events(spark, sf0001)
      .withColumn("d", to_date(col("ts")))
    Ingest.writePartitioned(df, s"$dir/daily", "d")
    val one = spark.read.parquet(s"$dir/daily").filter($"d" === "2024-01-03")
    assert(one.count() > 0)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters") || !scanned.contains("d=2024-01-01"))
  }
}
