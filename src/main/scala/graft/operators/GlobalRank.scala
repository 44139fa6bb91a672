package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row_number over a UNIQUE sort key — the 100 TB
  * replacement for `Window.orderBy(...)` (which Spark plans as a
  * single-partition window, serializing the whole input through one
  * task).
  *
  * Decomposition: range-partition on the sort key → per-partition
  * row_number → add the row count of all earlier partitions. Wide
  * stages are one range exchange and the per-partition sort; the only
  * driver-side data is one row count per partition (bounded by the
  * shuffle-partition count, not the data). The ranged frame is
  * localCheckpoint'ed so the partition-count job and the rank job read
  * the SAME materialized partitioning — partition ids are data, not a
  * recomputation hazard.
  *
  * Callers must pass a tie-broken (unique) sort key; with uniqueness,
  * row_number == rank == dense_rank, so this one helper serves all
  * three (t7's vocabulary rank, q36's ntile bucketing).
  */
object GlobalRank {

  /** df plus a 1-based global row number (LongType) in column `out`,
    * and the total row count (already known from the offsets pass —
    * free for callers like ntile that need n).
    */
  def rowNumberWithTotal(df: DataFrame, sort: Seq[Column], out: String): (DataFrame, Long) = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, sort: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, cnt)) =>
      (pid + 1, acc + cnt)
    }.take(counts.length).map { case (_, off) => off }
    val offByPid = counts.map(_._1).zip(offsets).toMap
    // flat constant-folded array lookup, O(1) per row with constant
    // expression depth — a p-deep when/otherwise chain would blow
    // codegen/stack limits at production shuffle-partition counts
    // (p in the thousands) and cost O(p) branches per row
    val offArr = Array.tabulate(p)(pid => offByPid.getOrElse(pid, 0L))
    val offCol = element_at(array(offArr.map(lit(_)): _*), col("__pid") + 1)
    val wLocal = Window.partitionBy("__pid").orderBy(sort: _*)
    val ranked = ranged
      .withColumn(out, row_number().over(wLocal) + offCol)
      .drop("__pid")
    (ranked, counts.map(_._2).sum)
  }

  def rowNumber(df: DataFrame, sort: Seq[Column], out: String): DataFrame =
    rowNumberWithTotal(df, sort, out)._1

  /** NTILE(k) over a global unique sort order without a global window:
    * global row number via the two-pass rank, then the closed-form
    * bucket from (row, n) — the first n mod k buckets get ceil(n/k)
    * rows, the rest floor(n/k), exactly SQL NTILE semantics.
    */
  def ntile(df: DataFrame, sort: Seq[Column], k: Int, out: String): DataFrame = {
    val (ranked, n) = rowNumberWithTotal(df, sort, "__rn")
    val small = n / k
    val rem = n % k
    val bucket =
      if (small == 0) col("__rn") // fewer rows than buckets: bucket = row
      else if (rem == 0) (col("__rn") - 1) / lit(small) + 1
      else when(col("__rn") <= rem * (small + 1),
          (col("__rn") - 1) / lit(small + 1) + 1)
        .otherwise((col("__rn") - 1 - rem * (small + 1)) / lit(small) + rem + 1)
    // Column `/` is double division; row counts are far inside double
    // exactness so the floor cast is exact
    ranked.withColumn(out, floor(bucket).cast("int")).drop("__rn")
  }
}
