package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.{AvroFiles, RestSource}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkTestBase {

  import spark.implicits._

  // ---- S22: avro container files ----

  val orderSchema =
    """{"type":"record","name":"Order","fields":[
      |{"name":"order_id","type":"long"},
      |{"name":"status","type":"string"},
      |{"name":"total","type":"double"}]}""".stripMargin

  test("S22: avro container file write/read round-trip") {
    val dir = Files.createTempDirectory("avrof").toString
    val df = Seq((1L, "open", 10.5), (2L, "closed", 7.25), (3L, "open", 0.0))
      .toDF("order_id", "status", "total").repartition(2)
    AvroFiles.writeAvro(df, dir, orderSchema)
    val back = AvroFiles.readAvro(spark, s"$dir/*.avro", orderSchema)
    assert(back.count() === 3)
    assert(back.orderBy("order_id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "open", 10.5), (2L, "closed", 7.25), (3L, "open", 0.0)))
  }

  // ---- S23: rate-limited REST source against a local flaky server ----

  test("S23: REST fetch retries 5xx/429 and honors rate limit") {
    val hits = new AtomicInteger(0)
    val failFirst = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/item", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        hits.incrementAndGet()
        val id = x.getRequestURI.getPath.split("/").last
        val resp: (Int, String) =
          if (id == "13" && failFirst.putIfAbsent("13", true) == null)
            (500, "boom") // first hit on id 13 fails → client must retry
          else if (id == "21" && failFirst.putIfAbsent("21", true) == null)
            (429, "slow down")
          else (200, s"""{"id":$id,"total":${id.toInt * 1.5}}""")
        if (resp._1 == 429) x.getResponseHeaders.add("Retry-After", "0.05")
        val b = resp._2.getBytes
        x.sendResponseHeaders(resp._1, b.length)
        x.getResponseBody.write(b); x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val ids = (1L to 30L).toSeq
      val t0 = System.nanoTime()
      val res = RestSource.fetchAll(s"http://127.0.0.1:$port/item", ids,
        RestSource.Config(maxRequestsPerSecond = 200, retryBackoffMs = 20),
        workers = 8)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(res.count(_.status == 200) === 30) // all eventually succeed
      assert(res.find(_.id == 13).get.attempts >= 2) // retried the 500
      assert(res.find(_.id == 21).get.attempts >= 2) // retried the 429
      // 32 requests at 200 rps ⇒ ≥ ~150ms of pacing
      assert(elapsedMs >= 100, s"rate limiter did not pace: ${elapsedMs}ms")
      // parse into a DataFrame through the normal schema-first reader
      val bodies = res.flatMap(_.body)
      val parsed = spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL("id LONG, total DOUBLE"))
        .json(spark.createDataset(bodies))
      assert(parsed.count() === 30)
      assert(parsed.agg(sum("id")).head.getLong(0) === (1 to 30).sum.toLong)
    } finally server.stop(0)
  }

  // ---- S12/S15: CTAS-style export + direct-file SQL + literal tables ----

  test("S12: filtered parquet export queried directly via parquet.`path` SQL") {
    val dir = Files.createTempDirectory("ctas").toString
    Tables.customer(spark, sf0001).filter(col("c_mktsegment") === "BUILDING")
      .write.mode("overwrite").parquet(s"$dir/building")
    val n = spark.sql(s"SELECT COUNT(*) AS n FROM parquet.`$dir/building`")
      .head.getLong(0)
    assert(n === Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING").count())
    val top = spark.sql(
      s"SELECT c_name FROM parquet.`$dir/building` ORDER BY c_acctbal DESC LIMIT 1")
    assert(top.count() === 1)
  }

  test("ORC round-trip preserves decimal, array, and struct columns") {
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    val df = Seq(
      (1L, BigDecimal("12.34"), Seq(1, 2, 3), ("a", 9)),
      (2L, BigDecimal("-0.01"), Seq.empty[Int], ("b", 0)))
      .toDF("id", "amount", "xs", "kv")
      .select(col("id"), col("amount").cast("decimal(10,2)").as("amount"),
        col("xs"), col("kv"))
    df.write.mode("overwrite").orc(s"$dir/t")
    val back = spark.read.orc(s"$dir/t").orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getDecimal(1).toString === "12.34")
    assert(back(0).getSeq[Int](2) === Seq(1, 2, 3))
    assert(back(1).getStruct(3).getString(0) === "b")
    // predicate pushdown reaches the ORC scan too
    val plan = spark.read.orc(s"$dir/t").filter(col("id") === 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
  }

  test("DSv2 source: range pushdown and column pruning reach the scan") {
    val df = spark.read.format("graft.sources.v2.SyntheticDocsProvider")
      .option("rows", "10000").option("partitions", "8").load()
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 8)

    val q = df.filter(col("doc_id") >= 9000 && col("doc_id") < 9500)
      .select("doc_id", "lang")
    assert(q.count() === 500)
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    // the generator itself was narrowed — rows outside the range are
    // never produced — and only the two requested columns materialize
    assert(scan.description().contains("range=[9000,9500)"), scan.description())
    assert(scan.description().contains("cols=doc_id,lang"), scan.description())

    // deterministic content: same options => identical rows
    val again = spark.read.format("graft.sources.v2.SyntheticDocsProvider")
      .option("rows", "10000").option("partitions", "3").load()
      .filter(col("doc_id") === 9123).select("text", "n_chars").collect()
    val once = df.filter(col("doc_id") === 9123).select("text", "n_chars").collect()
    assert(again.sameElements(once))
    assert(once.head.getLong(1) === once.head.getString(0).length.toLong)
  }

  test("S15: in-memory literal table via createDataFrame and SQL INSERT") {
    val chars = Seq(("Luke", "Tatooine", 15000), ("Leia", "Alderaan", 14000),
      ("Vader", "Tatooine", 27000)).toDF("name", "homeworld", "midichlorians")
    chars.createOrReplaceTempView("characters_lit")
    val agg = spark.sql(
      """SELECT homeworld, COUNT(*) AS n, CAST(AVG(midichlorians) AS INT) AS avg_m
        |FROM characters_lit GROUP BY homeworld ORDER BY n DESC, homeworld""".stripMargin)
      .as[(String, Long, Int)].collect().toSeq
    assert(agg === Seq(("Tatooine", 2L, 21000), ("Alderaan", 1L, 14000)))
  }
}
