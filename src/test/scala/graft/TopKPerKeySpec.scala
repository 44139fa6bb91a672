package graft

import graft.plans.{TopKPerKey, TopKPerKeyStrategy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkTestBase {

  private def withTopKRewrite[T](body: => T): T = {
    import graft.plans.TopKRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKRewrite
    try body
    finally {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
    }
  }

  test("TopKRewrite: rn<=k over desc row_number rewrites to heap operator") {
    withTopKRewrite {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      def query = Tables.orders(spark, sf0001)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val plan = query.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
      val got = query.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference result from the un-rewritten window route
      val want = {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == graft.plans.TopKRewrite)
        val r = Tables.orders(spark, sf0001)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.TopKRewrite
        r
      }
      assert(got == want)
    }
  }

  test("TopKRewrite guards: keeps the Window when rn is projected or order is asc") {
    withTopKRewrite {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      // rank column survives into the output → no rewrite
      val keepsRank = Tables.orders(spark, sf0001)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn")
      assert(keepsRank.queryExecution.executedPlan.toString.contains("Window"))
      // ascending order → no rewrite
      val asc = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
      val ascQ = Tables.orders(spark, sf0001)
        .withColumn("rn", row_number().over(asc))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey")
      assert(ascQ.queryExecution.executedPlan.toString.contains("Window"))
      // empty PARTITION BY (global top-k) → no rewrite: TopKPerKeyNode
      // would request ClusteredDistribution(Nil), which Spark rejects at
      // planning. Must still plan and execute via the window route.
      val global = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      val globalQ = Tables.orders(spark, sf0001)
        .withColumn("rn", row_number().over(global))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val gPlan = globalQ.queryExecution.executedPlan.toString
      assert(!gPlan.contains("TopKPerKey"), gPlan)
      assert(globalQ.count() === 3)
    }
  }

  private def withStrategy[A](body: => A): A = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    try body
    finally spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == TopKPerKeyStrategy)
  }

  test("custom physical top-k per key matches the window row_number result set") {
    withStrategy {
      val orders = Tables.orders(spark, sf0001)
      val custom = TopKPerKey(orders, Seq("o_custkey"), "o_totalprice", 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
      val viaWindow = orders
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      // same keys, same per-key row counts
      val cc = custom.groupBy("o_custkey").count().withColumnRenamed("count", "nc")
      val wc = viaWindow.groupBy("o_custkey").count().withColumnRenamed("count", "nw")
      assert(cc.join(wc, "o_custkey").filter(col("nc") =!= col("nw")).count() === 0)
      // same minimum selected price per key (the top-3 cutoff) — row-level
      // ties can differ, the multiset of prices cannot
      val cp = custom.groupBy("o_custkey")
        .agg(sort_array(collect_list("o_totalprice")).as("pc"))
      val wp = viaWindow.groupBy("o_custkey")
        .agg(sort_array(collect_list("o_totalprice")).as("pw"))
      assert(cp.join(wp, "o_custkey")
        .filter(to_json(col("pc")) =!= to_json(col("pw"))).count() === 0)
    }
  }

  test("plan contains TopKPerKeyExec with one exchange between partial and final") {
    withStrategy {
      val df = TopKPerKey(Tables.orders(spark, sf0001),
        Seq("o_custkey"), "o_totalprice", 2)
      val plan = df.queryExecution.executedPlan.toString
      assert("TopKPerKey ".r.findAllIn(plan).size === 2, plan)
      assert(plan.contains("Exchange"), plan)
    }
  }

  test("long order values beyond 2^53 keep native ordering") {
    withStrategy {
      import spark.implicits._
      // adjacent longs above 2^53 collapse to the same Double — a lossy
      // coercion would treat them as ties and may keep the wrong rows
      val base = (1L << 53) + 10
      val rows = (0 to 9).map(i => ("k", base + i))
      val top = TopKPerKey(rows.toDF("k", "v"), Seq("k"), "v", 3)
        .select("v").as[Long].collect().sorted.reverse
      assert(top.toSeq === Seq(base + 9, base + 8, base + 7))
    }
  }

  test("string order values are heap-safe (no buffer aliasing)") {
    withStrategy {
      import spark.implicits._
      val rows = ('a' to 'z').map(c => ("k", c.toString * 3))
      val top = TopKPerKey(rows.toDF("k", "v"), Seq("k"), "v", 2)
        .select("v").as[String].collect().sorted.reverse
      assert(top.toSeq === Seq("zzz", "yyy"))
    }
  }

  test("partial phase caps shuffled rows per key") {
    withStrategy {
      // a hot key spread over many partitions still only ships
      // partitions × k rows — verified behaviorally: results stay correct
      // when one key dominates
      import spark.implicits._
      val hot = (1 to 10000).map(i => ("hot", i.toDouble)) ++
        (1 to 10).map(i => (s"cold$i", i.toDouble))
      val df = hot.toDF("k", "v").repartition(16)
      val top = TopKPerKey(df, Seq("k"), "v", 5)
      val hotTop = top.filter(col("k") === "hot")
        .select("v").as[Double].collect().sorted.reverse
      assert(hotTop.toSeq === Seq(10000.0, 9999.0, 9998.0, 9997.0, 9996.0))
    }
  }
}
