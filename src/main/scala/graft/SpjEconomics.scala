package graft

import org.apache.spark.sql.functions._

/** Dev tool: measure the extended storage-partitioned-join surface at
  * a given SF dir — `sbt "runMain graft.SpjEconomics [sfDir]"`.
  *
  * Three comparisons, 3 reps each (rep1 includes first-touch):
  *  1. bucketed lineitem × PLAIN orders parquet — one-side shuffle
  *     (only orders moves, hashed by the catalog bucket function) vs
  *     the same join with v2 bucketing off (both sides shuffle);
  *  2. groupBy(bucket key) aggregation over the bucketed table (zero
  *     exchanges) vs over an unbucketed snapshot of the same rows;
  *  3. Exchange counts in the final AQE plan for each, as proof the
  *     wall-clock deltas come from the plan shape.
  */
object SpjEconomics {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus = cpus, appName = "spj-econ")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("spjecon").toString
    spark.conf.set("spark.sql.catalog.se_cat",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.se_cat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS se_cat.ns")

    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"),
      col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_orderdate"), col("o_orderpriority"))

    println(s"[spj-econ] building bucketed lineitem (32 buckets) at $wh")
    val tb0 = System.nanoTime()
    graft.sources.Snapshots.commitBucketed(li, s"$wh/ns/li_b", "l_orderkey", 32)
    graft.sources.Snapshots.commit(li, s"$wh/ns/li_plain")
    println(f"[spj-econ] build ${(System.nanoTime() - tb0) / 1e9}%.2f s")

    def finalExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val s = df.queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(s.split("== Initial Plan ==").head).size
    }

    def time(label: String, reps: Int)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      var ex = -1
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = mk()
        df.write.format("noop").mode("overwrite").save()
        ex = finalExchanges(df)
        println(f"[spj-econ] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s (finalExchanges=$ex)")
      }
    }

    def revenueJoin(fact: org.apache.spark.sql.DataFrame) =
      fact.hint("merge")
        .join(ord, fact("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))

    // 1. one-side shuffle ON (session default) — bucketed fact never moves
    time("join one-side-shuffle", 3)(() =>
      revenueJoin(spark.table("se_cat.ns.li_b")))

    // both-shuffle baseline: same data, unbucketed snapshot
    time("join both-shuffle   ", 3)(() =>
      revenueJoin(spark.read.format("graft-snapshot")
        .option("path", s"$wh/ns/li_plain").load()))

    // 2. bucket-key aggregation: zero exchanges vs shuffled agg
    time("agg bucket-key      ", 3)(() =>
      spark.table("se_cat.ns.li_b").groupBy("l_orderkey")
        .agg(sum("l_extendedprice").as("s"), count(lit(1)).as("n")))
    time("agg plain           ", 3)(() =>
      spark.read.format("graft-snapshot").option("path", s"$wh/ns/li_plain")
        .load().groupBy("l_orderkey")
        .agg(sum("l_extendedprice").as("s"), count(lit(1)).as("n")))

    // correctness cross-check: both join paths agree
    val a = revenueJoin(spark.table("se_cat.ns.li_b"))
      .orderBy("o_orderpriority").collect().map(r => (r.getString(0), math.round(r.getDouble(1))))
    val b = revenueJoin(li).orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1))))
    require(a.sameElements(b), s"SPJ join diverged: ${a.toSeq} vs ${b.toSeq}")
    println("[spj-econ] correctness cross-check OK")
    spark.stop()
  }
}
