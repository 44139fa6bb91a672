package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.functions._

/** Skew torture for the graph family (round-4 prescription): q67/q72
  * run on TPC-H-uniform keys, so these tests drive the SAME plan
  * shapes over a power-law graph — one vertex carrying ~30% of all
  * edges — and pin with executed-plan METRICS (not assertions-by-
  * construction) that neither the PageRank dst-aggregation nor the
  * BFS frontier join piles the hot vertex's raw edge list into one
  * reduce task.
  */
class SkewGraphSpec extends SparkTestBase {

  /** 400k edges, power-law dst: vertex 0 receives 30%, the rest
    * spreads over 997 cold vertices. Deterministic id arithmetic.
    */
  private def skewEdges = spark.range(400000).select(
    (col("id") % 9973).as("src"),
    when(col("id") % 10 < 3, lit(0L)).otherwise(col("id") % 997 + 1).as("dst"),
    lit(1.0).as("w"))

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hot-dst rank aggregation: map-side combine bounds what crosses the wire") {
    // AQE off so the static plan's metrics are directly addressable
    withConfs(Seq("spark.sql.adaptive.enabled" -> "false")) {
      val agg = skewEdges.groupBy("dst").agg(sum("w").as("inflow"))
      assert(agg.collect().length === 998)
      val partialOut = agg.queryExecution.executedPlan.collect {
        case h: HashAggregateExec if h.aggregateExpressions.exists(_.mode == Partial) =>
          h.metrics("numOutputRows").value
      }.sum
      // partial aggregation caps the shuffle at (#distinct dst × #map
      // partitions): the hot vertex crosses the wire as ONE row per
      // mapper, never as its 120k raw edges
      val mappers = skewEdges.rdd.getNumPartitions
      assert(partialOut > 0 && partialOut <= 998L * mappers,
        s"partial output $partialOut vs bound ${998L * mappers}")
      assert(partialOut * 10 <= 400000L,
        s"map-side combine did not absorb the hot key: $partialOut rows shuffled")
    }
  }

  test("hot-frontier BFS join: AQE splits the skewed src partition at runtime") {
    // q72's frontier-expansion shape (frontier ⋈ edges on src) with one
    // frontier vertex owning half the edge list; thresholds lowered so
    // the sandbox's MBs trip what 100 TB partitions trip at the 256MB
    // defaults (same machinery as the q61 proof, graph-shaped join)
    withConfs(Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val edges = spark.range(400000).select(
        when(col("id") < 200000, lit(0L)).otherwise(col("id") % 997 + 1).as("src"),
        (col("id") % 9973).as("dst")).localCheckpoint()
      val frontier = spark.range(0, 998)
        .select(col("id").as("src"), lit(1).as("level"))
      val step = frontier.join(edges, "src")
        .select(col("dst"), (col("level") + 1).as("level"))
      // collect through the SAME QueryExecution (count() builds its own)
      assert(step.collect().length === 400000)
      val plan = step.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot frontier vertex:\n${plan.take(3000)}")
    }
  }

  test("q77 fixture really is power-law and the registered round is exact") {
    val rows = run("q77_skew_inflow", sf001).collect()
    val hot = rows.find(_.getLong(0) == 0L).get
    val total = rows.map(_.getLong(1)).sum
    assert(hot.getLong(1).toDouble / total > 0.25, "fixture lost its skew")
    // cold-vertex domain: whatever partkey residues the SF populates
    assert(rows.length > 100 && rows.length <= 1001, rows.length)
  }
}
