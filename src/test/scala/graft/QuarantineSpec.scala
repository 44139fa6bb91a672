package graft

import java.nio.file.{Files, Paths}

import graft.sources.Ingest
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class QuarantineSpec extends SparkTestBase {

  import spark.implicits._

  /** Schemaless-binary Avro encode of a 2-field (long, string) record —
    * the same wire shape as the reference's fastavro schemaless_writer.
    */
  private object AvroTestData {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    def encode(schemaJson: String, id: Long, name: String,
        xs: Seq[Long] = null): Array[Byte] = {
      val schema = new Schema.Parser().parse(schemaJson)
      val rec = new GenericData.Record(schema)
      rec.put("id", id)
      rec.put("name", name)
      if (xs != null)
        rec.put("xs", java.util.Arrays.asList(xs.map(Long.box): _*))
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[Any](schema).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
  }

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

  test("CSV seam: malformed lines become quarantine rows with reason, task never fails") {
    val dir = Files.createTempDirectory("quarcsv").toString
    Files.writeString(Paths.get(s"$dir/in.csv"),
      """1,10.5,alpha
        |2,not_a_number,beta
        |3,7.25,gamma
        |garbage line with no commas at all plus,extra,fields,here,x
        |""".stripMargin)
    val schema = StructType.fromDDL("id INT, amount DOUBLE, tag STRING")
    val out = Ingest.readCsvWithQuarantine(spark, schema, s"$dir/in.csv").cache()
    assert(out.count() === 4) // every input line yields exactly one row
    val clean = out.filter(col("_quarantine_reason").isNull)
    assert(clean.count() === 2)
    assert(clean.agg(sum("amount")).head.getDouble(0) === 17.75)
    val bad = out.filter(col("_quarantine_reason").isNotNull)
      .select("_quarantine_reason").as[String].collect()
    assert(bad.length === 2)
    assert(bad.forall(_.startsWith("malformed_csv: ")))
    assert(bad.exists(_.contains("not_a_number"))) // verbatim raw line kept
  }

  test("Avro seam: from_avro_safe quarantines corrupt bytes row-granularly") {
    import graft.functions.AvroCodec
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":"string"}]}""".stripMargin
    val good1 = AvroTestData.encode(schemaJson, 1L, "alpha")
    val good2 = AvroTestData.encode(schemaJson, 2L, "beta")
    val corrupt = good1.take(3) // truncated mid-record: EOF during decode
    val junk = Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1, -1, -1)
    val df = Seq(
      (1, good1), (2, corrupt), (3, good2), (4, junk),
      (5, null.asInstanceOf[Array[Byte]])) // Kafka tombstone shape
      .toDF("row_id", "payload")
      .withColumn("dec", AvroCodec.from_avro_safe(col("payload"), schemaJson))
      .select(col("row_id"), col("dec.data.*"), col("dec._error"))
      .cache()
    assert(df.count() === 5) // no task failure despite 3 poisoned payloads
    val ok = df.filter(col("_error").isNull)
    assert(ok.select("row_id", "id", "name").collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getString(2))).toSet ===
      Set((1, 1L, "alpha"), (3, 2L, "beta")))
    val bad = df.filter(col("_error").isNotNull)
    assert(bad.count() === 3)
    // a NULL payload quarantines WITH a reason — it must never land on
    // the clean side as a null struct
    assert(bad.filter(col("row_id") === 5).select("_error").as[String]
      .head() === "null_payload")
    // reason names the decoder's failure, and data side is fully null
    assert(bad.select("_error").as[String].collect().forall(_.nonEmpty))
    assert(bad.filter(col("id").isNotNull || col("name").isNotNull).count() === 0)
  }

  test("Avro seam: a hostile multi-GB length prefix quarantines, never OOMs") {
    // schemaless binary Avro length prefixes are attacker-controlled;
    // the stock decoder allocates BEFORE hitting EOF, so without the
    // AvroLimits caps a ~1.5 GB string prefix is an OutOfMemoryError —
    // fatal, escaping the NonFatal quarantine catch. With the caps the
    // decode dies as SystemLimitException and quarantines like any
    // other poisoned record.
    import graft.functions.AvroCodec
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":"string"},
        |  {"name":"xs","type":{"type":"array","items":"long"}}]}""".stripMargin
    def prefixAttack(stringLen: Long, arrayLen: Long): Array[Byte] = {
      // id=7, then a string length prefix of `stringLen` with no bytes
      // behind it (or a valid tiny string and a hostile array length)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
      enc.writeLong(7L)
      if (stringLen > 0) enc.writeLong(stringLen) // hostile string prefix
      else { enc.writeString("ok"); enc.writeLong(arrayLen) } // hostile block count
      enc.flush()
      bos.toByteArray
    }
    val hugeString = prefixAttack(1_500_000_000L, 0)
    val hugeArray = prefixAttack(0, 1_000_000_000L)
    val good = AvroTestData.encode(schemaJson, 1L, "alpha", Seq(1L, 2L))
    val df = Seq((1, good), (2, hugeString), (3, hugeArray))
      .toDF("row_id", "payload")
      .withColumn("dec", AvroCodec.from_avro_safe(col("payload"), schemaJson))
      .select(col("row_id"), col("dec._error"))
    val byId = df.collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(byId(1).isEmpty, s"clean row quarantined: ${byId(1)}")
    assert(byId(2).exists(_.contains("SystemLimitException")),
      s"hostile string prefix produced ${byId(2)} instead of a bounded decode error")
    assert(byId(3).nonEmpty,
      s"hostile array block count must quarantine, got ${byId(3)}")
  }

  test("Avro seam: from_avro_safe matches from_avro bit-for-bit on clean input") {
    import graft.functions.AvroCodec
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":"string"}]}""".stripMargin
    val rows = (1L to 50L).map(i => AvroTestData.encode(schemaJson, i, s"n$i"))
    val df = rows.toDF("payload")
    val strict = df.select(AvroCodec.from_avro(col("payload"), schemaJson).as("d"))
      .select("d.id", "d.name").collect().toSeq
    val safe = df.select(AvroCodec.from_avro_safe(col("payload"), schemaJson).as("d"))
      .select("d.data.id", "d.data.name").collect().toSeq
    assert(strict === safe)
  }

  test("REST seam: fetch failures and malformed bodies quarantine with reasons") {
    import graft.sources.RestSource
    import graft.sources.RestSource.FetchResult
    val schema = StructType.fromDDL("order_id LONG, total DOUBLE")
    val results = Seq(
      FetchResult(1, 200, Some("""{"order_id": 1, "total": 9.5}"""), 1),
      FetchResult(2, 404, None, 1),                       // http error
      FetchResult(3, 500, None, 4),                       // retries exhausted
      FetchResult(4, 200, Some("""{"order_id": oops"""), 1), // poisoned body
      FetchResult(5, -1, None, 4),                        // IO timeout
      FetchResult(6, 200, Some("""{"order_id": 6, "total": 1.25}"""), 2),
      FetchResult(7, 200, Some(""), 1),                   // 200 with empty body
      FetchResult(8, 200, Some("null"), 1))               // 200 with JSON null
    val df = RestSource.parsedWithQuarantine(spark, results, schema).cache()
    assert(df.count() === 8) // one row per requested id, always
    val reasons = df.select("id", "_quarantine_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(reasons(1L).isEmpty && reasons(6L).isEmpty)
    assert(reasons(2L).contains("http_404"))
    assert(reasons(3L).contains("http_500"))
    assert(reasons(4L).exists(_.startsWith("malformed_json: ")))
    assert(reasons(5L).contains("http_-1"))
    assert(reasons(7L).contains("no_body"))     // empty body never looks clean
    assert(reasons(8L).exists(_.startsWith("malformed_json"))) // bare JSON null
    val clean = df.filter(col("_quarantine_reason").isNull)
    assert(clean.agg(sum("total")).head.getDouble(0) === 10.75)
    // quarantined rows carry nulls in the data columns, not junk
    assert(df.filter(col("_quarantine_reason").isNotNull)
      .filter(col("order_id").isNotNull || col("total").isNotNull).count() === 0)
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
