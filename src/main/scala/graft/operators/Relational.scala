package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory over the star schema — covers SURVEY.md
  * §2.2 (filters/projections), §2.3 (joins), §2.4 (aggregations), §2.5
  * (windows), §2.6 (sort/limit), §2.7 (set ops), §2.8 (scalar functions).
  *
  * Scale posture: dimension joins broadcast (region/nation/supplier/part
  * are small at any SF); fact-fact joins shuffle on their keys and rely on
  * AQE for skew; aggregations are partial+final hash aggs; top-k uses
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  /** Exact money aggregate: sum in DECIMAL(18,4) (order-independent,
    * no FP accumulation), surface as double. Oracle mirror:
    * CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE). Avoids both
    * summation-order ULP noise and engine round() half-boundary skew.
    */
  private def msum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** TPC-H Q1-style pricing summary: filter → multi-agg groupBy.
    * Ref: revenue_analysis/main.ipynb:258-277 (multi-agg), lab03 HAVING.
    */
  val q1Agg: QuerySpec = QuerySpec.sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        (msum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (msum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Row-level projection + conjunctive filter; arithmetic left exact
    * (row-level IEEE ops are engine-independent).
    * Ref: lab01/tasks.ipynb:594-606 (point filter), F2/F4/F6.
    */
  val q2Filter: QuerySpec = QuerySpec.sql(
    "q2_filter_project",
    """SELECT l_orderkey, l_partkey, l_linenumber,
      |       l_extendedprice * l_discount AS disc_amount
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_quantity < 10
      |  AND l_returnflag IN ('A', 'R')""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_discount") >= 0.05 && col("l_quantity") < 10 &&
        col("l_returnflag").isin("A", "R"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        (col("l_extendedprice") * col("l_discount")).as("disc_amount"))
  }

  /** Multi-way join with broadcast dims: lineitem⋈orders⋈customer⋈nation⋈region,
    * revenue per nation. Ref: J4 (broadcast left joins,
    * revenue_analysis/main.ipynb:239-257), J6.
    */
  val q3JoinNation: QuerySpec = QuerySpec.sql(
    "q3_revenue_by_nation",
    """SELECT n.n_name AS nation, r.r_name AS region,
      |       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_lines
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY n.n_name, r.r_name""".stripMargin) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"), col("r_name").as("region"))
      .agg(
        msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Semi-join: customers having at least one order (the lab03 J1 intent —
    * join against a DISTINCT key set ≡ EXISTS). Ref: lab03/sql/script1.sql:37-38.
    */
  val q4Semi: QuerySpec = QuerySpec.sql(
    "q4_exists_orders",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Anti-join: customers with no open ('O') order (NOT EXISTS over a
    * filtered subquery — non-trivial at every SF).
    */
  val q5Anti: QuerySpec = QuerySpec.sql(
    "q5_no_open_orders",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'O')""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "O").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Top-k with deterministic tie-break → TakeOrderedAndProject physically.
    * Ref: O1/O4 (start_wars ORDER BY … DESC + LIMIT).
    */
  val q6TopK: QuerySpec = QuerySpec.sql(
    "q6_top_customers",
    """SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
      |       COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY total_spend DESC, o_custkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(msum(col("o_totalprice")).as("total_spend"), count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)
  }

  /** Moving-frame window sum (the reference's single window use, W1):
    * daily revenue per order priority, 7-day ROWS frame.
    * Ref: revenue_analysis/main.ipynb:278-289.
    */
  val q7Window: QuerySpec = QuerySpec.sql(
    "q7_window_7d",
    """WITH daily AS (
      |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS daily_rev
      |  FROM orders
      |  GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
      |)
      |SELECT o_orderpriority, d, daily_rev,
      |       ROUND(SUM(daily_rev) OVER (
      |         PARTITION BY o_orderpriority ORDER BY d
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
      |FROM daily""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("d"))
      .agg(msum(col("o_totalprice")).as("daily_rev"))
    val w = Window.partitionBy("o_orderpriority").orderBy("d").rowsBetween(-6, 0)
    daily.withColumn("rev_7d", round(sum("daily_rev").over(w), 2))
  }

  /** Exact distinct aggregation (A4's count_distinct) + plain counts. */
  val q8Distinct: QuerySpec = QuerySpec.sql(
    "q8_count_distinct",
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
      |       COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n_customers"), count(lit(1)).as("n_orders"))
  }

  /** Group-by + HAVING (A5: lab03 coffee-culprits shape). */
  val q9Having: QuerySpec = QuerySpec.sql(
    "q9_having",
    """SELECT c_nationkey, COUNT(*) AS n
      |FROM customer
      |GROUP BY c_nationkey
      |HAVING COUNT(*) >= 3""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
  }

  /** UNION ALL by position (U1: my_first_dbt_model.sql:12-18). */
  val q10Union: QuerySpec = QuerySpec.sql(
    "q10_union_all",
    """SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
      |UNION ALL
      |SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer""".stripMargin) { (s, dir) =>
    val sup = Tables.supplier(s, dir)
      .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"), lit("supplier").as("kind"))
    val cus = Tables.customer(s, dir)
      .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"), lit("customer").as("kind"))
    sup.union(cus)
  }

  /** Case-insensitive pattern filter (F3: ILIKE, lab03/sql/script1.sql:36). */
  val q11Ilike: QuerySpec = QuerySpec.sql(
    "q11_ilike",
    """SELECT p_partkey, p_name, p_type
      |FROM part
      |WHERE p_name ILIKE '%WiDgEt%' AND p_type ILIKE '%econ%'""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_name").ilike("%WiDgEt%") && col("p_type").ilike("%econ%"))
      .select("p_partkey", "p_name", "p_type")
  }

  /** Conditional projection (F6: when/otherwise revenue derivation,
    * revenue_analysis/main.ipynb:210-230) — row-level, exact.
    */
  val q12CaseWhen: QuerySpec = QuerySpec.sql(
    "q12_case_when",
    """SELECT event_id, user_id,
      |       CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS revenue,
      |       CASE WHEN value >= 100 THEN 'high' WHEN value >= 50 THEN 'mid'
      |            ELSE 'low' END AS band
      |FROM events
      |WHERE value >= 0""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("value") >= 0)
      .select(col("event_id"), col("user_id"),
        when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)).as("revenue"),
        when(col("value") >= 100, "high").when(col("value") >= 50, "mid")
          .otherwise("low").as("band"))
  }

  /** Date + time-of-day predicates (F5: lab03/sql/script1.sql:16-18,39-40). */
  val q13DatePred: QuerySpec = QuerySpec.sql(
    "q13_date_pred",
    """SELECT event_id, user_id, event_type
      |FROM events
      |WHERE CAST(ts AS DATE) >= DATE '2024-01-02'
      |  AND CAST(ts AS DATE) < DATE '2024-01-05'
      |  AND EXTRACT(hour FROM ts) >= 13 AND EXTRACT(hour FROM ts) < 15""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(to_date(col("ts")) >= lit("2024-01-02") &&
        to_date(col("ts")) < lit("2024-01-05") &&
        hour(col("ts")) >= 13 && hour(col("ts")) < 15)
      .select("event_id", "user_id", "event_type")
  }

  /** Multi-key sort over a dim join (O2; small-table global sort). */
  val q14MultiSort: QuerySpec = QuerySpec.sql(
    "q14_multi_sort",
    """SELECT r.r_name AS region, n.n_name AS nation, n.n_nationkey
      |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY region, nation""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"), col("n_nationkey"))
      .orderBy("region", "nation")
  }

  /** md5 proof-hash over normalized names (lab03/sql/script1.sql:67,70). */
  val q15Md5: QuerySpec = QuerySpec.sql(
    "q15_md5",
    """SELECT c_custkey, md5(lower(trim(c_name))) AS name_hash
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"), md5(lower(trim(col("c_name")))).as("name_hash"))
  }

  /** Join to pre-aggregated subquery + null coalescing (J5 + F12:
    * fct_orders.sql:20-46 shape — LEFT JOIN aggregate, ifNull → 0).
    */
  val q16AggJoin: QuerySpec = QuerySpec.sql(
    "q16_agg_join_coalesce",
    """SELECT c.c_custkey, c.c_name,
      |       COALESCE(t.total, 0.0) AS spend,
      |       COALESCE(t.n, 0) AS n_orders
      |FROM customer c
      |LEFT JOIN (
      |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total, COUNT(*) AS n
      |  FROM orders GROUP BY o_custkey
      |) t ON c.c_custkey = t.o_custkey""".stripMargin) { (s, dir) =>
    val agg = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(msum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
    Tables.customer(s, dir)
      .join(agg, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("total"), lit(0.0)).as("spend"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
  }

  /** Ranking window: top account per nation via row_number (full Window
    * surface beyond the reference's single frame use).
    */
  val q17Rank: QuerySpec = QuerySpec.sql(
    "q17_rank_per_nation",
    """SELECT c_nationkey, c_custkey, c_acctbal
      |FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer
      |) WHERE rn = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("c_nationkey", "c_custkey", "c_acctbal")
  }

  /** ROLLUP grouping sets (free from Catalyst; exposed for completeness). */
  val q18Rollup: QuerySpec = QuerySpec.sql(
    "q18_rollup",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
  }

  /** JSON field extraction from a string column (§2.8 struct/JSON:
    * get_json_object ≡ DuckDB json_extract_string).
    */
  val q19Json: QuerySpec = QuerySpec.sql(
    "q19_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       COUNT(*) AS n
      |FROM events
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
  }

  /** VARIANT ingestion for truly-dynamic JSON (round-10 verdict #6 —
    * SURVEY §1.2's semi-structured mapping, upgraded from fixed-path
    * `get_json_object` to Spark 4's open-schema VariantType): payloads
    * whose SHAPE varies row to row (three nested layouts + a malformed
    * tail) parse ONCE into a variant column — no schema declaration, no
    * per-path re-parse — and typed paths extract lazily from the binary
    * encoding. The quarantine contract is row-granular: `try_parse_json`
    * turns malformed payloads into NULL variants (never a task failure,
    * the m11 decode-quarantine rule applied to JSON), and they surface
    * as their own `__quarantined` group so ingest loss is always
    * visible, never silent. Scale posture: parse-once + binary
    * extraction is the 100 TB answer to heterogeneous event streams —
    * one pass over the strings, paths decoded per reference without
    * re-tokenizing, all codegen-native expressions. Oracle mirrors the
    * same payload construction and extraction with DuckDB's JSON
    * functions under a `json_valid` guard.
    */
  val q117Variant: QuerySpec = QuerySpec.sql(
    "q117_variant_ingest",
    """WITH payloads AS (
      |  SELECT CASE
      |    WHEN event_type = 'click' THEN
      |      '{"kind":"click","meta":{"uid":' || user_id || ',"tags":["a","b"]},"vals":[' || (event_id % 5) || ',' || (event_id % 7) || ']}'
      |    WHEN event_type = 'view' THEN
      |      '{"kind":"view","n":' || (event_id % 100) || '}'
      |    WHEN event_type = 'error' THEN
      |      '{"kind":"error","detail":{"code":' || (user_id % 13) || '}}'
      |    ELSE '{"kind":"' || event_type || '", broken'
      |  END AS payload FROM events
      |), parsed AS (
      |  SELECT CASE WHEN json_valid(payload) THEN payload END AS j
      |  FROM payloads
      |)
      |SELECT CASE WHEN j IS NOT NULL
      |            THEN json_extract_string(j, '$.kind')
      |            ELSE '__quarantined' END AS kind,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract(j, '$.meta.uid') AS BIGINT)) AS BIGINT) AS sum_uid,
      |       CAST(SUM(CAST(json_extract(j, '$.n') AS BIGINT)) AS BIGINT) AS sum_n,
      |       CAST(SUM(CAST(json_extract(j, '$.detail.code') AS BIGINT)) AS BIGINT) AS sum_code,
      |       CAST(SUM(CAST(json_extract(j, '$.vals[1]') AS BIGINT)) AS BIGINT) AS sum_val1
      |FROM parsed GROUP BY 1""".stripMargin) { (s, dir) =>
    val payload = expr(
      """CASE
        |  WHEN event_type = 'click' THEN
        |    concat('{"kind":"click","meta":{"uid":', user_id, ',"tags":["a","b"]},"vals":[', event_id % 5, ',', event_id % 7, ']}')
        |  WHEN event_type = 'view' THEN
        |    concat('{"kind":"view","n":', event_id % 100, '}')
        |  WHEN event_type = 'error' THEN
        |    concat('{"kind":"error","detail":{"code":', user_id % 13, '}}')
        |  ELSE concat('{"kind":"', event_type, '", broken')
        |END""".stripMargin)
    Tables.events(s, dir)
      .select(payload.as("payload"))
      .select(expr("try_parse_json(payload)").as("v"))
      .select(
        expr("coalesce(variant_get(v, '$.kind', 'string'), '__quarantined')").as("kind"),
        expr("variant_get(v, '$.meta.uid', 'bigint')").as("uid"),
        expr("variant_get(v, '$.n', 'bigint')").as("n0"),
        expr("variant_get(v, '$.detail.code', 'bigint')").as("code"),
        expr("variant_get(v, '$.vals[1]', 'bigint')").as("val1"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("uid").as("sum_uid"),
        sum("n0").as("sum_n"), sum("code").as("sum_code"),
        sum("val1").as("sum_val1"))
  }

  /** Regex extraction (F9: zgrep error_type + filename patterns). */
  val q20Regex: QuerySpec = QuerySpec.sql(
    "q20_regex_extract",
    """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_mod,
      |       COUNT(*) AS n
      |FROM events
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("bigint").as("k_mod"))
      .groupBy("k_mod").agg(count(lit(1)).as("n"))
  }

  /** The flagship revenue_analysis daily-KPI pipeline as an oracle query
    * (conditional revenue F6 → multi-agg A4 → 7-day moving window W1 —
    * revenue_analysis/main.ipynb:198-289).
    */
  val q21DailyKpi: QuerySpec = QuerySpec.sql(
    "q21_daily_kpi",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type,
      |         COUNT(*) AS n_events,
      |         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
      |                            ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |         COUNT(DISTINCT user_id) AS n_users
      |  FROM events
      |  GROUP BY 1, 2
      |)
      |SELECT d, event_type, n_events, revenue, n_users,
      |       ROUND(SUM(revenue) OVER (
      |         PARTITION BY event_type ORDER BY d
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS revenue_7d
      |FROM daily""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .withColumn("d", to_date(col("ts")))
      .groupBy("d", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        msum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("revenue"),
        countDistinct("user_id").as("n_users"))
    val w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    daily.withColumn("revenue_7d", round(sum("revenue").over(w), 2))
  }

  /** The lab03 multi-step SQL investigation shape (script1.sql:11-70):
    * temp-table chain — DISTINCT key set → join/filter window → HAVING
    * culprits → final lookup with md5 proof column. Runs through the
    * spark.sql text path with temp views (SURVEY §3.3); the oracle
    * expresses the same chain as CTEs.
    */
  val q22Investigation: QuerySpec = QuerySpec.sql(
    "q22_sql_investigation",
    """WITH suspects AS (
      |  SELECT DISTINCT o_custkey AS custkey
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      |    AND o_orderstatus = 'F'
      |), repeat_offenders AS (
      |  SELECT o.o_custkey AS custkey, COUNT(*) AS n
      |  FROM orders o JOIN suspects s ON o.o_custkey = s.custkey
      |  WHERE o.o_orderstatus = 'F'
      |  GROUP BY o.o_custkey
      |  HAVING COUNT(*) >= 3
      |)
      |SELECT c.c_custkey, c.c_name, r.n AS f_orders,
      |       md5(lower(trim(c.c_name))) AS proof
      |FROM repeat_offenders r
      |JOIN customer c ON c.c_custkey = r.custkey""".stripMargin) { (s, dir) =>
    // dir-keyed view names: fixed names are shared session state — two
    // dirs constructing concurrently would bind one query's SQL to the
    // other dir's tables
    val k = Tables.dirKey(dir)
    val vOrders = s"g_orders_$k"; val vCustomer = s"g_customer_$k"
    val vSuspects = s"g_suspects_$k"; val vOffenders = s"g_offenders_$k"
    Tables.orders(s, dir).createOrReplaceTempView(vOrders)
    Tables.customer(s, dir).createOrReplaceTempView(vCustomer)
    s.sql(
      s"""SELECT DISTINCT o_custkey AS custkey FROM $vOrders
        |WHERE to_date(o_orderdate) >= DATE '1995-01-01' AND o_orderstatus = 'F'
        |""".stripMargin).createOrReplaceTempView(vSuspects)
    s.sql(
      s"""SELECT o.o_custkey AS custkey, COUNT(*) AS n
        |FROM $vOrders o JOIN $vSuspects s ON o.o_custkey = s.custkey
        |WHERE o.o_orderstatus = 'F'
        |GROUP BY o.o_custkey HAVING COUNT(*) >= 3
        |""".stripMargin).createOrReplaceTempView(vOffenders)
    s.sql(
      s"""SELECT c.c_custkey, c.c_name, r.n AS f_orders,
        |       md5(lower(trim(c.c_name))) AS proof
        |FROM $vOffenders r JOIN $vCustomer c ON c.c_custkey = r.custkey
        |""".stripMargin)
  }

  /** A8: mode / most-common value via count+sort+limit (lab01 "most
    * common category among sampled rows").
    */
  val q23Mode: QuerySpec = QuerySpec.sql(
    "q23_mode",
    """SELECT p_type, COUNT(*) AS n
      |FROM part
      |GROUP BY p_type
      |ORDER BY n DESC, p_type
      |LIMIT 1""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .groupBy("p_type").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p_type"))
      .limit(1)
  }

  /** F13: deterministic "seeded" sample — hash-ordered take-k is the
    * engine-portable analog of sample(seed=42) (any engine reproduces the
    * same rows from the md5 order).
    */
  val q24Sample: QuerySpec = QuerySpec.sql(
    "q24_hash_sample",
    """SELECT doc_id, lang, source
      |FROM documents
      |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(10)
  }

  /** Stratified deterministic sample: k rows per group in md5 order —
    * the per-class downsampling a training-data pipeline runs (balanced
    * corpora), reproducible in any engine.
    */
  val q25Stratified: QuerySpec = QuerySpec.sql(
    "q25_stratified_sample",
    """SELECT doc_id, lang
      |FROM (
      |  SELECT doc_id, lang,
      |         ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents
      |) WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("doc_id", "lang")
  }

  /** Sessionization: split each user's event stream on >30-minute gaps
    * (lag + running sum of session-start flags). All arithmetic is
    * integer epoch-microseconds so both engines cut sessions on exactly
    * the same boundaries.
    */
  val q26Sessionize: QuerySpec = QuerySpec.sql(
    "q26_sessionize",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, us,
      |         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |                   > 1800000000 OR
      |              LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM t
      |), sessions AS (
      |  SELECT user_id, event_id,
      |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no,
      |         us
      |  FROM flagged
      |)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |       COUNT(*) AS n_events,
      |       CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_s
      |FROM sessions
      |GROUP BY user_id, session_no""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val t = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val flagged = t.withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
    flagged
      .withColumn("session_no",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        expr("(max(us) - min(us)) div 1000000").as("duration_s"))
  }

  /** CUBE grouping sets (the §2.4 note: free from Catalyst, exposed). */
  val q27Cube: QuerySpec = QuerySpec.sql(
    "q27_cube",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), msum(col("l_quantity")).as("qty"))
  }

  /** EXCEPT set difference (§2.7 "available free in Spark if exposed"). */
  val q28Except: QuerySpec = QuerySpec.sql(
    "q28_except",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
  }

  /** SCD2 interval build: run-length encode each user's event_type
    * stream into validity intervals (change detection via lag, run ids
    * via running sum, one interval row per run, valid_to = next run's
    * start). Every window shares the user_id partitioning — one shuffle
    * total, the slowly-changing-dimension shape at any scale.
    */
  val q31Scd2: QuerySpec = QuerySpec.sql(
    "q31_scd2_intervals",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
      |), chg AS (
      |  SELECT user_id, us, event_id, event_type,
      |         CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_chg
      |  FROM e
      |), runs AS (
      |  SELECT user_id, us, event_type,
      |         SUM(is_chg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      |  FROM chg
      |), iv AS (
      |  SELECT user_id, event_type, CAST(run_id AS BIGINT) AS version,
      |         MIN(us) AS valid_from_us, COUNT(*) AS n_events
      |  FROM runs GROUP BY user_id, event_type, run_id
      |)
      |SELECT user_id, event_type, version, valid_from_us, n_events,
      |       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
      |       (LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) IS NULL) AS is_current
      |FROM iv""".stripMargin) { (s, dir) =>
    // the single copy of the run segmentation lives with the SCD2
    // family (q80 stitches incrementally on the same logic)
    Incremental.scd2Runs(Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type")))
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from_us"), col("n_events"), col("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Pivot with an explicit value list (no driver-side distinct scan to
    * discover columns — the declared domain keeps the plan static at any
    * input size). Oracle = conditional aggregation, the portable
    * equivalent.
    */
  val q32Pivot: QuerySpec = QuerySpec.sql(
    "q32_pivot",
    """SELECT CAST(ts AS DATE) AS d,
      |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  /** Exact discrete percentiles per group without any approximate sketch:
    * rank rows once, pick the ceil(n·p) row value — the portable
    * percentile_disc. One window shuffle on the group key.
    */
  val q33Percentiles: QuerySpec = QuerySpec.sql(
    "q33_percentile_disc",
    """WITH r AS (
      |  SELECT event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |)
      |SELECT event_type,
      |       MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN value END) AS p50,
      |       MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN value END) AS p90,
      |       MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99
      |FROM r GROUP BY event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    val n = Window.partitionBy("event_type")
    Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .groupBy("event_type")
      .agg(
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("value"))).as("p90"),
        max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("value"))).as("p99"))
  }

  /** The salted two-phase aggregation surfaced through the oracle gate:
    * identical result to a direct group-by (sum/count are decomposable),
    * but hot keys spread over 16 reducers in the partial phase —
    * l_returnflag has 3 values, the canonical hot-key aggregation.
    */
  val q34Salted: QuerySpec = QuerySpec.sql(
    "q34_salted_agg",
    """SELECT l_returnflag,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_quantity,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    // decimal partials (the house determinism rule): the salted two-
    // phase sums in a different order than the oracle's single pass,
    // so a double accumulator would be ULP-dependent on the split
    Skew.saltedSumCount(
      Tables.lineitem(s, dir)
        .withColumn("l_quantity", col("l_quantity").cast("decimal(18,4)")),
      Seq("l_returnflag"), "l_quantity")
      .withColumn("sum_l_quantity", col("sum_l_quantity").cast("double"))
  }

  val all: Seq[QuerySpec] = Seq(
    q1Agg, q2Filter, q3JoinNation, q4Semi, q5Anti, q6TopK, q7Window,
    q8Distinct, q9Having, q10Union, q11Ilike, q12CaseWhen, q13DatePred,
    q14MultiSort, q15Md5, q16AggJoin, q17Rank, q18Rollup, q19Json, q20Regex,
    q117Variant,
    q21DailyKpi, q22Investigation, q23Mode, q24Sample, q25Stratified,
    q26Sessionize, q27Cube, q28Except, q31Scd2, q32Pivot, q33Percentiles,
    q34Salted)
}
