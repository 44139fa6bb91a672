package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  test("zorder2 matches the reference bit-interleave on boundary values") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0), (0, 0xFFFF),
      (0xFFFF, 0xFFFF), (0xAAAA, 0x5555), (12345, 54321), (1, 0x8000))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zorder2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(got.toSeq === cases.map { case (x, y) => ZOrder.zorderRef(x, y) })
  }

  test("z-order clustered write narrows BOTH dimensions per file") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_out").toString
    // production z-order normalizes each column to comparable bit width
    // first (Delta range-buckets each dim): with raw values, the wider
    // column's high bits own the top of the code and coarse splits
    // degenerate to a single-column sort. custkey ≤ 150 is ~8 bits, so
    // orderkey is scaled into the same range.
    val df = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"))
      .withColumn("z", ZOrder.zorder2(col("o_custkey"),
        expr("o_orderkey div 6")))
    df.repartitionByRange(32, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dir)
    val files = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("o_custkey") - min("o_custkey")).as("ck_span"),
        (max("o_orderkey") - min("o_orderkey")).as("ok_span"),
        count(lit(1)).as("n"))
      .filter(col("n") > 10)
      .collect()
    assert(files.length >= 12, "expected many data files")
    val global = Tables.orders(spark, sf0001)
      .agg((max("o_custkey") - min("o_custkey")).as("ck"),
        (max("o_orderkey") - min("o_orderkey")).as("ok")).head
    val (gCk, gOk) = (global.getLong(0), global.getLong(1))
    // every z-clustered file spans strictly less than the whole domain in
    // at least one dimension, and the AVERAGE file is much tighter in
    // both — the property min/max pruning feeds on. A single-column sort
    // gives span ≈ global on the other column for every file.
    val avgCk = files.map(_.getLong(1)).sum / files.length
    val avgOk = files.map(_.getLong(2)).sum / files.length
    assert(avgCk * 2 < gCk, s"custkey avg span $avgCk vs global $gCk")
    assert(avgOk * 2 < gOk, s"orderkey avg span $avgOk vs global $gOk")
  }

  test("d13: near-dup candidate subgraphs are cliques — gcc at 10000 bp") {
    val row = run("d13_triangles", sf0001).head
    // this corpus's LSH graph is transitive (clusters are genuine copies)
    assert(row.getLong(2) === 10000L, row.toString)
    assert(row.getLong(0) >= 1L)
  }

  test("bloom: no false negatives, real rejections, merge-order-free") {
    import graft.functions.BloomAgg._
    val members = Tables.customer(spark, sf0001)
      .filter(col("c_nationkey") === 7)
      .select(col("c_custkey").cast("string").as("k"))
    val bf = members.agg(bloom_build(col("k")).as("bf"))
    // probe every member through the filter — a Bloom filter NEVER
    // false-negatives
    val misses = members.crossJoin(broadcast(bf))
      .filter(!bloom_probe(col("bf"), col("k")))
    assert(misses.count() === 0, "false negative")
    // non-members are mostly rejected (16 words / ~6 keys at this SF —
    // far under saturation)
    val nonMembers = Tables.customer(spark, sf0001)
      .filter(col("c_nationkey") =!= 7)
      .select(col("c_custkey").cast("string").as("k"))
    val accepted = nonMembers.crossJoin(broadcast(bf))
      .filter(bloom_probe(col("bf"), col("k"))).count()
    assert(accepted < nonMembers.count() / 2,
      s"filter rejects too little: $accepted of ${nonMembers.count()}")
    // partial/final merge across many partitions = single-partition build
    val many = members.repartition(13)
      .agg(bloom_build(col("k")).as("bf")).head.getSeq[Long](0)
    val one = members.coalesce(1)
      .agg(bloom_build(col("k")).as("bf")).head.getSeq[Long](0)
    assert(many === one, "merge topology changed the filter")
  }

  test("s9: covariance matrix is upper-triangular, diagonal nonnegative") {
    val rows = run("s9_covariance", sf0001).collect()
    assert(rows.length === 64 * 65 / 2)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0), r.getLong(1))
      assert(j >= i)
      if (i == j) assert(r.getLong(6) >= 0L, s"var($i) < 0")
    }
    // n is the vector count everywhere
    assert(rows.map(_.getLong(2)).distinct.toSeq ===
      Seq(Tables.embeddings(spark, sf0001).count()))
  }
}
