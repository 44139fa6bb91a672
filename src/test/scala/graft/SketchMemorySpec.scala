package graft

import graft.functions.{BloomAgg, TopKWords}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Memory posture of the custom sketch aggregates (round-4
  * prescription): their buffers must stay at their DOCUMENTED bounds no
  * matter how many rows stream through — that is the entire point of a
  * sketch at 100 TB — and their results must survive the sort-based
  * fallback path (ObjectHashAggregate spilling partials through
  * serialize/deserialize/merge) bit-for-bit.
  */
class SketchMemorySpec extends SparkTestBase {

  import spark.implicits._

  test("BloomAgg buffer is exactly words*8 bytes at any input cardinality") {
    val agg = BloomAgg(BoundReference(0, StringType, nullable = true),
      words = 16, hashes = 3, salt = "bloom")
    var buf = agg.createAggregationBuffer()
    assert(agg.serialize(buf).length === 16 * 8)
    (0 until 50000).foreach { i =>
      buf = agg.update(buf, InternalRow(UTF8String.fromString(s"key$i")))
    }
    // 50k distinct keys later: same 128 bytes — executors ship the bit
    // array, never the key set
    assert(agg.serialize(buf).length === 16 * 8)
    var other = agg.createAggregationBuffer()
    (50000 until 100000).foreach { i =>
      other = agg.update(other, InternalRow(UTF8String.fromString(s"key$i")))
    }
    assert(agg.serialize(agg.merge(buf, other)).length === 16 * 8)
  }

  test("TopKWords buffer never exceeds capacity, under reduce or merge") {
    val a = new TopKWords(capacity = 64, k = 10)
    var buf = a.zero
    (0 until 100000).foreach(i => buf = a.reduce(buf, s"w${i % 1000}"))
    assert(buf.counts.size <= 64, s"reduce grew the buffer to ${buf.counts.size}")
    var other = a.zero
    (0 until 100000).foreach(i => other = a.reduce(other, s"x$i"))
    assert(other.counts.size <= 64)
    assert(a.merge(buf, other).counts.size <= 64, "merge exceeded capacity")
  }

  test("sort-based fallback (the spill path) reproduces BloomAgg bit-exactly") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    def bloomByNation(): Map[Int, Seq[Long]] = Tables.customer(spark, sf001)
      .groupBy("c_nationkey")
      .agg(BloomAgg.bloom_build(col("c_custkey").cast("string")).as("bf"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val normal = bloomByNation()
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "1") // every group spills to the sort-based path
    try {
      val spilled = bloomByNation()
      assert(spilled.keySet === normal.keySet)
      normal.foreach { case (k, v) =>
        assert(spilled(k) === v, s"nation $k bit array diverged under spill")
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sort-based fallback reproduces TopKWords exactly") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    // capacity >= distinct items -> the sketch is exact, so spilled and
    // in-memory runs must agree exactly, not just within error bounds
    def topk(): Map[String, Seq[(String, Long)]] =
      Tables.orders(spark, sf001)
        .select(col("o_orderstatus").as("g"), col("o_orderpriority").as("w"))
        .as[(String, String)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new TopKWords(capacity = 100, k = 3).toColumn)
        .collect().toMap
    val normal = topk()
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "1")
    try assert(topk() === normal)
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
