package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators over `events` — the two join shapes Spark has
  * no native operator for, each expressed through its standard scalable
  * composition rather than an inequality join:
  *
  *  - AS-OF join: tag both sides, union, one window pass per key ordered
  *    by time — `last(right-side, ignoreNulls)` carries the most recent
  *    right row forward to every left row. ONE shuffle on the join key,
  *    state bounded by the window frame; never a per-row range probe.
  *  - RANGE join: quantize each interval into coarse time buckets,
  *    equi-join point events on (key, bucket), then verify exact
  *    containment. The candidate join is a hash join on short keys; the
  *    verify is a codegen'd filter. (DuckDB's native inequality join is
  *    the oracle, so the bucketing is checked against true range-join
  *    semantics, not mirrored.)
  *
  * Both work in integer epoch-µs (unix_micros / epoch_us) — the q26
  * convention that makes window arithmetic bit-identical across engines.
  */
object Temporal {

  /** Click→view attribution as-of join: for every click, the same user's
    * most recent view at-or-before the click. Views at the exact click
    * timestamp count (side orders views first); ties on (us) cannot occur
    * in this corpus but the (us, side, event_id) total order pins
    * determinism anyway.
    */
  /** The tagged-union as-of machinery shared by q29 (backward: latest
    * `rightType` at-or-before each `leftType` event) and q56 (forward:
    * earliest at-or-after — the identical scan with the ordering
    * reversed). One shuffle on user_id, no join operator; `side` orders
    * right rows first at equal us in both directions, so boundary-equal
    * matches count. The tie-break/frame logic lives ONLY here — the two
    * queries previously each carried a hand-mirrored copy.
    */
  private def asOfJoin(s: org.apache.spark.sql.SparkSession, dir: String,
      rightType: String, leftType: String, forward: Boolean,
      outId: String, outGap: String, gapExpr: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    val rights = e.filter(col("event_type") === rightType)
      .select(col("user_id"), col("us"), col("event_id"), lit(0).as("side"))
    val lefts = e.filter(col("event_type") === leftType)
      .select(col("user_id"), col("us"), col("event_id"), lit(1).as("side"))
    val base = Window.partitionBy("user_id")
    val w = (if (forward)
        base.orderBy(col("us").desc, col("side").asc, col("event_id").desc)
      else base.orderBy(col("us").asc, col("side").asc, col("event_id").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rights.unionAll(lefts)
      .withColumn(outId,
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("r_us",
        last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col(outId).isNotNull)
      .select(col("event_id").as("click_id"), col("user_id"), col(outId),
        expr(gapExpr).as(outGap))
  }

  val qAsOf: QuerySpec = QuerySpec.sql(
    "q29_asof_join",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events
      |), tagged AS (
      |  SELECT user_id, us, event_id, 0 AS side FROM e WHERE event_type = 'view'
      |  UNION ALL
      |  SELECT user_id, us, event_id, 1 AS side FROM e WHERE event_type = 'click'
      |), w AS (
      |  SELECT user_id, us, event_id, side,
      |         LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY us, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
      |         LAST_VALUE(CASE WHEN side = 0 THEN us END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY us, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_us
      |  FROM tagged
      |)
      |SELECT event_id AS click_id, user_id, view_id,
      |       CAST((us - view_us) // 1000000 AS BIGINT) AS gap_s
      |FROM w WHERE side = 1 AND view_id IS NOT NULL""".stripMargin) { (s, dir) =>
    asOfJoin(s, dir, rightType = "view", leftType = "click", forward = false,
      outId = "view_id", outGap = "gap_s",
      gapExpr = "(us - r_us) div 1000000") // integer µs→s, no float
  }

  private val DayUs = 86400000000L

  /** Signup→purchase range join: purchases of the same user inside the
    * 24 h window a signup opens. Spark side buckets each window into its
    * ≤ 2 covering UTC days and equi-joins purchases on (user, day); a
    * (signup, purchase) pair can match only in the purchase's own day
    * bucket, so no dedup pass is needed. The oracle runs the genuine
    * inequality join.
    */
  val qRange: QuerySpec = QuerySpec.sql(
    "q30_range_join",
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events
       |), s AS (SELECT event_id AS signup_id, user_id, us AS s_us FROM e
       |         WHERE event_type = 'signup'),
       |p AS (SELECT event_id AS purchase_id, user_id, us AS p_us FROM e
       |      WHERE event_type = 'purchase')
       |SELECT s.signup_id, p.purchase_id, s.user_id,
       |       CAST((p.p_us - s.s_us) // 60000000 AS BIGINT) AS mins_after
       |FROM s JOIN p
       |  ON p.user_id = s.user_id
       | AND p.p_us >= s.s_us AND p.p_us < s.s_us + $DayUs""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
    // a 24h window covers at most 2 UTC days — explode into day buckets
    val dayOf = expr(s"us div $DayUs")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("us").as("s_us"), explode(array(dayOf, dayOf + 1)).as("day"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("p_us"), dayOf.as("day"))
    purchases
      .join(signups, col("user_id") === col("s_user") && purchases("day") === signups("day"))
      .filter(col("p_us") >= col("s_us") && col("p_us") < col("s_us") + DayUs)
      .select(col("signup_id"), col("purchase_id"), col("user_id"),
        expr("(p_us - s_us) div 60000000").as("mins_after"))
  }

  /** Forward as-of join (time-to-conversion): for every click, the same
    * user's EARLIEST purchase at-or-after it. The q29 machinery scanned
    * in reverse — tag, union, one descending window pass per user
    * carrying the nearest future purchase backward. Purchases at the
    * exact click timestamp count (side orders purchases first at equal
    * us). Still one shuffle on user_id.
    */
  val qForwardAsOf: QuerySpec = QuerySpec.sql(
    "q56_forward_asof",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events
      |), tagged AS (
      |  SELECT user_id, us, event_id, 0 AS side FROM e WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, us, event_id, 1 AS side FROM e WHERE event_type = 'click'
      |), w AS (
      |  SELECT user_id, us, event_id, side,
      |         LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY us DESC, side ASC, event_id DESC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_id,
      |         LAST_VALUE(CASE WHEN side = 0 THEN us END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY us DESC, side ASC, event_id DESC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_us
      |  FROM tagged
      |)
      |SELECT event_id AS click_id, user_id, purchase_id,
      |       CAST((p_us - us) // 1000000 AS BIGINT) AS wait_s
      |FROM w WHERE side = 1 AND purchase_id IS NOT NULL""".stripMargin) { (s, dir) =>
    asOfJoin(s, dir, rightType = "purchase", leftType = "click", forward = true,
      outId = "purchase_id", outGap = "wait_s",
      gapExpr = "(r_us - us) div 1000000")
  }

  /** q79: per-key time-series resample — gap-fill each user's daily
    * activity over their own [first, last] calendar spine and linearly
    * interpolate the missing days between the surrounding observed
    * points (the feature-engineering step that turns sparse event logs
    * into dense per-entity curves). Interpolation is EXACT integer
    * arithmetic in milli-units — (pv·(next−d) + nv·(d−prev)) · 1000
    * div gap_len — so the hash gate holds without float tolerance.
    *
    * Scale shape: the spine is generated in-row (`sequence` explode, no
    * join against a global calendar), the observed counts join back on
    * (user_id, day), and both IGNORE-NULLS window passes share the
    * user_id partitioning — per-partition sorts bounded by each user's
    * span, never a global sort. The q75 window pattern applied to
    * resampling.
    */
  val qInterpolate: QuerySpec = QuerySpec.sql(
    "q79_interpolate",
    """WITH d AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT user_id, CAST(unnest(generate_series(CAST(MIN(day) AS TIMESTAMP),
      |    CAST(MAX(day) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM d GROUP BY user_id
      |), j AS (
      |  SELECT s.user_id, s.day, d.n
      |  FROM spine s LEFT JOIN d ON d.user_id = s.user_id AND d.day = s.day
      |), f AS (
      |  SELECT user_id, day, n,
      |    LAST_VALUE(n IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    LAST_VALUE(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
      |    FIRST_VALUE(n IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    FIRST_VALUE(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |  FROM j
      |)
      |SELECT user_id, day, n AS observed,
      |       CASE WHEN n IS NOT NULL THEN n * 1000
      |            ELSE (pv * (nd - day) + nv * (day - pd)) * 1000 // (nd - pd)
      |       END AS interp_milli
      |FROM f""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
      // both the spine build and the join probe read this relation —
      // without materialization the events scan + aggregation run twice
      .localCheckpoint()
    val spine = d.groupBy("user_id")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("day"))
    val wPrev = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(d, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("n"), ignoreNulls = true).over(wPrev))
      .withColumn("pd", last(when(col("n").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("n"), ignoreNulls = true).over(wNext))
      .withColumn("nd", first(when(col("n").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("day"), col("n").as("observed"),
        when(col("n").isNotNull, col("n") * 1000)
          .otherwise(expr(
            "(pv * datediff(nd, day) + nv * datediff(day, pd)) * 1000L div datediff(nd, pd)"))
          .as("interp_milli"))
  }

  val all: Seq[QuerySpec] = Seq(qAsOf, qRange, qForwardAsOf, qInterpolate)
}
