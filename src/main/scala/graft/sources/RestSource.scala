package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Rate-limited, retrying REST ingestion (SURVEY S23 — orders_server
  * clients: ≤N req/s token pacing, ≤3 retries honoring Retry-After on
  * 429, retry on 5xx/timeout; client_threads.py:73-168,
  * client_async.py:89-149).
  *
  * Deliberately a plain-Scala edge utility, not a Catalyst concern: it
  * produces a Seq of payloads on the driver (or inside mapPartitions for
  * executor-side fetching of per-partition id ranges at scale); parsing
  * into a DataFrame goes through the normal schema-first JSON reader.
  */
object RestSource {

  final case class Config(
      maxRequestsPerSecond: Double = 18.0,
      maxRetries: Int = 3,
      requestTimeout: Duration = Duration.ofSeconds(5),
      retryBackoffMs: Long = 200)

  final case class FetchResult(id: Long, status: Int, body: Option[String],
      attempts: Int)

  /** Token-pacing limiter: blocks so successive acquisitions stay under
    * the configured rate (the 18 req/s client limiter).
    */
  final class RateLimiter(perSecond: Double) {
    private val intervalNanos = (1e9 / perSecond).toLong
    private var next = System.nanoTime()
    def acquire(): Unit = synchronized {
      val now = System.nanoTime()
      if (next > now) {
        val waitMs = (next - now) / 1000000
        if (waitMs > 0) Thread.sleep(waitMs)
      }
      next = math.max(next + intervalNanos, System.nanoTime())
    }
  }

  /** GET one resource with retry/backoff. Retries 429 (honoring a
    * numeric Retry-After), 5xx and IO timeouts; gives up after
    * maxRetries leaving body=None.
    */
  def fetchOne(client: HttpClient, baseUrl: String, id: Long,
      limiter: RateLimiter, cfg: Config): FetchResult = {
    var attempt = 0
    var last: FetchResult = FetchResult(id, -1, None, 0)
    while (attempt <= cfg.maxRetries) {
      attempt += 1
      limiter.acquire()
      try {
        val req = HttpRequest.newBuilder(URI.create(s"$baseUrl/$id"))
          .timeout(cfg.requestTimeout).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case 200 =>
            return FetchResult(id, 200, Some(resp.body()), attempt)
          case 429 =>
            // RFC 9110 allows Retry-After as delta-seconds OR an
            // HTTP-date; a non-numeric form must degrade to the default
            // backoff, not blow up the whole fetch batch (the quarantine
            // contract: a flaky upstream never fails the task)
            val retryAfterMs = resp.headers().firstValue("Retry-After")
              .map[java.lang.Long] { s =>
                try (s.toDouble * 1000).toLong
                catch { case _: NumberFormatException => cfg.retryBackoffMs }
              }
              .orElse(cfg.retryBackoffMs)
            last = FetchResult(id, 429, None, attempt)
            Thread.sleep(retryAfterMs)
          case s if s >= 500 =>
            last = FetchResult(id, s, None, attempt)
            Thread.sleep(cfg.retryBackoffMs * attempt)
          case s =>
            return FetchResult(id, s, None, attempt) // 4xx: no retry
        }
      } catch {
        case _: java.io.IOException =>
          last = FetchResult(id, -1, None, attempt)
          Thread.sleep(cfg.retryBackoffMs * attempt)
      }
    }
    last
  }

  /** Parse fetch results into rows under the m11 row-granular quarantine
    * contract: every input id yields exactly one row — parsed fields for
    * a clean 200-with-valid-JSON fetch, otherwise nulls plus a
    * `_quarantine_reason` naming WHY (http status, missing body, or the
    * malformed payload). A flaky upstream or a poisoned response body
    * must never fail the task; the quarantined rows stay queryable for
    * triage and replay, the same shape as the media decode seam
    * (`Multimodal.featuresWithQuarantine`).
    *
    * Malformed-JSON detection uses `from_json`'s PERMISSIVE corrupt-
    * record column — the engine's own verdict on the payload, not a
    * re-parse.
    */
  def parsedWithQuarantine(spark: org.apache.spark.sql.SparkSession,
      results: Seq[FetchResult],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import spark.implicits._
    val raw = results.map(r => (r.id, r.status, r.body.orNull, r.attempts))
      .toDF("id", "status", "body", "attempts")
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val parsed = raw.withColumn("data",
      from_json(col("body"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    parsed.withColumn("_quarantine_reason",
        when(col("status") =!= 200,
          concat(lit("http_"), col("status").cast("string")))
          // empty/blank bodies short-circuit from_json BEFORE its
          // corrupt-record path (NULL struct, no _corrupt_record), and a
          // bare JSON `null` does the same — both must quarantine, not
          // land on the clean side as all-null rows
          .when(col("body").isNull || trim(col("body")) === "", lit("no_body"))
          .when(col("data._corrupt_record").isNotNull,
            concat(lit("malformed_json: "), col("data._corrupt_record")))
          .when(col("data").isNull, lit("malformed_json: null_body")))
      .select(Seq(col("id"), col("attempts"), col("_quarantine_reason")) ++
        schema.fieldNames.toSeq.map(f =>
          when(col("_quarantine_reason").isNull, col(s"data.$f"))
            .otherwise(lit(null)).as(f)): _*)
  }

  /** Fetch a batch of ids with bounded parallel workers sharing one rate
    * limiter (8 workers in the reference). Results keep input order.
    */
  def fetchAll(baseUrl: String, ids: Seq[Long], cfg: Config = Config(),
      workers: Int = 8): Seq[FetchResult] = {
    val limiter = new RateLimiter(cfg.maxRequestsPerSecond)
    val client = HttpClient.newBuilder()
      .connectTimeout(cfg.requestTimeout).build()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = ids.map { id =>
        new java.util.concurrent.Callable[FetchResult] {
          def call(): FetchResult = fetchOne(client, baseUrl, id, limiter, cfg)
        }
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }
}
