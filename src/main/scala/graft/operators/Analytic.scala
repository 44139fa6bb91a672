package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic-window operator family beyond the q7/q17 basics: lag deltas,
  * ntile bucketing, RANGE-interval frames, INTERSECT, above-group-average
  * filtering. Reference intent: the lab02/lab04 notebook KPI analyses
  * (revenue_analysis/main.ipynb trend cells) generalized to the window
  * shapes any warehouse user expects.
  *
  * Money arithmetic follows the house determinism rule (QuerySpec doc):
  * sums in DECIMAL(18,4) — order-independent and identical across
  * engines — cast to double only at the output boundary.
  */
object Analytic {

  /** Day-over-day revenue delta via lag(). The window is ordered by date
    * with no partition: its cardinality is the DATE DOMAIN (a few
    * thousand rows after the pre-aggregation), not the fact-table row
    * count, so the single-partition sort is bounded at any corpus scale —
    * the orders scan itself aggregates map-side before the shuffle.
    */
  val qLagDelta: QuerySpec = QuerySpec.sql(
    "q35_lag_delta",
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders GROUP BY 1
      |)
      |SELECT d, CAST(rev AS DOUBLE) AS rev,
      |       CAST(LAG(rev) OVER (ORDER BY d) AS DOUBLE) AS prev_rev,
      |       CAST(rev - LAG(rev) OVER (ORDER BY d) AS DOUBLE) AS delta
      |FROM d""".stripMargin) { (s, dir) =>
    val w = Window.orderBy("d")
    Tables.orders(s, dir)
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
      .withColumn("prev", lag("rev", 1).over(w))
      .select(col("d"), col("rev").cast("double").as("rev"),
        col("prev").cast("double").as("prev_rev"),
        (col("rev") - col("prev")).cast("double").as("delta"))
  }

  /** NTILE(4) wealth quartiles over customers, fully tie-broken
    * (acctbal DESC, custkey) so both engines assign identical buckets.
    * NTILE needs a total order; at 100 TB the same statistic comes from
    * approx quantile boundaries + a bucket join — this operator is the
    * exact small-dimension form (customer is the dimension side here).
    */
  val qNtile: QuerySpec = QuerySpec.sql(
    "q36_ntile",
    """SELECT c_custkey, c_acctbal,
      |       NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey")))
          .as("quartile"))
  }

  /** INTERSECT (distinct set semantics): nations present on BOTH the
    * customer and supplier side. Plan: two pre-aggregated distinct sets
    * then a hash semi-intersection — key width is the nation domain.
    */
  val qIntersect: QuerySpec = QuerySpec.sql(
    "q37_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
  }

  /** Customers above their nation's average balance — the correlated
    * scalar-subquery shape, executed as a broadcast join against the
    * 25-row per-nation aggregate. The comparison avoids division AND
    * doubles: `bal * n > sum` in DECIMAL is exact in both engines,
    * whereas comparing against a computed double average could flip
    * boundary rows.
    */
  val qAboveAvg: QuerySpec = QuerySpec.sql(
    "q38_above_nation_avg",
    """WITH n AS (
      |  SELECT c_nationkey AS nk, COUNT(*) AS n,
      |         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s
      |  FROM customer GROUP BY 1
      |)
      |SELECT c_custkey, c_nationkey, c_acctbal
      |FROM customer JOIN n ON c_nationkey = nk
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val perNation = c.groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("s"))
    c.join(broadcast(perNation), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
      .select("c_custkey", "c_nationkey", "c_acctbal")
  }

  /** Trailing-30-day revenue per customer via a RANGE frame keyed on an
    * integer day number (epoch days) — the value-based frame q7's ROWS
    * frame cannot express (gaps in the date series must widen the frame,
    * not shift it). Pre-aggregates to one row per (customer, day) before
    * the window, so frame evaluation touches the day domain per customer,
    * and both the aggregation and the window shuffle on o_custkey —
    * one exchange, reused.
    */
  val qRangeFrame: QuerySpec = QuerySpec.sql(
    "q39_range_frame_30d",
    """WITH d AS (
      |  SELECT o_custkey,
      |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT o_custkey, day,
      |       CAST(SUM(rev) OVER (PARTITION BY o_custkey ORDER BY day
      |         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
      |FROM d""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-29, 0)
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
          .cast("long").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
      .select(col("o_custkey"), col("day"),
        sum("rev").over(w).cast("double").as("rev_30d"))
  }

  val all: Seq[QuerySpec] =
    Seq(qLagDelta, qNtile, qIntersect, qAboveAvg, qRangeFrame)
}
