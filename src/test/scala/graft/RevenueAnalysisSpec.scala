package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.pipeline.RevenueAnalysis
import org.apache.spark.sql.functions._

class RevenueAnalysisSpec extends SparkTestBase {

  private def writeGz(path: String, content: String): Unit = {
    val out = new GZIPOutputStream(Files.newOutputStream(Paths.get(path)))
    out.write(content.getBytes); out.close()
  }

  lazy val dir: String = {
    val d = Files.createTempDirectory("ra").toString
    Files.writeString(Paths.get(s"$d/users.jsonl"),
      """{"id":1,"signup_date":"2025-01-01","plan":"pro","country":"DE","marketing_opt_in":true}
        |{"id":2,"signup_date":"2025-02-01","plan":"free","country":"US","marketing_opt_in":false}
        |""".stripMargin)
    Files.writeString(Paths.get(s"$d/items.jsonl"),
      """{"item_id":10,"category":"books","tags":["sale"]}
        |{"item_id":20,"category":"toys","tags":["new","gift"]}
        |""".stripMargin)
    // two gz parts; one negative-price bad row that must be dropped
    writeGz(s"$d/part-00.jsonl.gz",
      """{"ts":"2025-10-01T10:00:00+00:00","event":"purchase","user_id":1,"item_id":10,"context":{"country":"DE","device":"ios","locale":"de_DE","session_id":"s1"},"props":{"price":20.0,"payment_method":"card"},"exp":{"ab_group":"A"}}
        |{"ts":"2025-10-01T11:00:00+00:00","event":"view","user_id":2,"item_id":10,"context":{"country":"DE","device":"web","locale":"en_US","session_id":"s2"},"props":{"dwell_ms":1200},"exp":{"ab_group":"B"}}
        |{"ts":"2025-10-01T12:00:00+00:00","event":"purchase","user_id":2,"item_id":20,"context":{"country":"US","device":"web","locale":"en_US","session_id":"s3"},"props":{"price":-5.0,"payment_method":"card"},"exp":{"ab_group":"A"}}
        |""".stripMargin)
    writeGz(s"$d/part-01.jsonl.gz",
      """{"ts":"2025-10-02T09:00:00+00:00","event":"purchase","user_id":1,"item_id":10,"context":{"country":"DE","device":"ios","locale":"de_DE","session_id":"s4"},"props":{"price":30.0,"payment_method":"wallet"},"exp":{"ab_group":"A"}}
        |{"ts":"2025-10-02T09:30:00+00:00","event":"click","user_id":1,"item_id":20,"context":{"country":"DE","device":"ios","locale":"de_DE","session_id":"s4"},"props":{"dwell_ms":300},"exp":{"ab_group":"A"}}
        |""".stripMargin)
    d
  }

  lazy val result = RevenueAnalysis.run(spark,
    s"$dir/users.jsonl", s"$dir/items.jsonl", s"$dir/part-*.jsonl.gz",
    s"$dir/out/daily_kpi")

  test("flagship pipeline: KPIs match hand-computed values") {
    val rows = result.collect()
    // the negative-price purchase row is filtered out entirely
    assert(rows.map(_.getAs[Long]("events")).sum === 4)
    val de1 = result.filter(col("date") === "2025-10-01" &&
      col("country") === "DE" && col("category") === "books").head
    assert(de1.getAs[Long]("events") === 2)
    assert(de1.getAs[Long]("purchases") === 1)
    assert(de1.getAs[Double]("total_revenue") === 20.0)
    assert(de1.getAs[Long]("unique_users") === 2)
  }

  test("7-day moving revenue accumulates across days within (country,category)") {
    val de2 = result.filter(col("date") === "2025-10-02" &&
      col("country") === "DE" && col("category") === "books").head
    assert(de2.getAs[Double]("revenue_7d") === 50.0) // 20 + 30
  }

  test("output is partitioned by date and prunes on read") {
    val partDirs = new java.io.File(s"$dir/out/daily_kpi").listFiles()
      .filter(_.getName.startsWith("date=")).map(_.getName).sorted
    assert(partDirs.toSeq === Seq("date=2025-10-01", "date=2025-10-02"))
    val pruned = spark.read.parquet(s"$dir/out/daily_kpi")
      .filter(col("date") === "2025-10-02")
    assert(pruned.count() === 2) // DE books + DE toys (click row)
  }

  test("broadcast joins are planned for both dimensions") {
    val users = spark.read.schema(RevenueAnalysis.userSchema).json(s"$dir/users.jsonl")
    val items = spark.read.schema(RevenueAnalysis.itemSchema).json(s"$dir/items.jsonl")
    val events = spark.read.schema(RevenueAnalysis.eventSchema).json(s"$dir/part-*.jsonl.gz")
    val plan = RevenueAnalysis.enrich(events, items, users)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }
}
