package graft

/** Blanket plan lint over every registered query: catches accidental
  * cartesian products and lost filter pushdown as the inventory grows
  * (the "explain and iterate" discipline, automated).
  */
class PlanLintSpec extends SparkTestBase {

  // the only intended nested-loop joins: s1 broadcasts the 10-row query
  // side over the corpus, s4 broadcasts 16 centroids for cell assignment,
  // p4 cross-joins three single-row aggregate frames. Everything else —
  // including the dedup/similarity pair generators — must candidate
  // through equi-joins: an all-pairs loop join is the canonical
  // 100 TB scale-killer.
  // t6 broadcasts a 1-row corpus-count aggregate, like p4's report frames;
  // p8 cross-joins the |langs|-row allocation against two 1-row totals;
  // s7/s8 compose s1 (the exact baseline), so they inherit s1's intended
  // broadcast-query loop join; d13 crosses its two single-row census
  // aggregates (triangles × wedges) like p4's report frames
  // q73 crosses the |types|-row DISTINCT event_type relation with
  // itself (a < b pair fan-out) — the fact table only ever equi-joins
  private val intendedLoopJoins = Set("s1_knn_cosine", "s4_ann_ivf",
    "p4_quality_report", "t6_vocab_df", "p8_proportional_sample",
    "s7_ann_recall", "s8_quant_error", "d13_triangles", "q73_kmv_setops",
    "d16_source_overlap", "p13_mix_rebalance", "d17_bloom_dedup",
    "s12_pq_knn", "p14_budget_select", "s13_ivf_pq",
    // p15 broadcasts its 1-row leak-audit count like p4's report frames
    "p15_leakage_split",
    // s15's two assignment passes broadcast the 16-row codebook (s4's
    // intended per-row argmin loop join)
    "s15_kmeans_refine",
    // d20 broadcasts its 1-row ground-truth count like p4's report frames
    "d20_lsh_tradeoff",
    // t18 broadcasts the 1-row MAX(doc_id) decile edge
    "t18_vocab_growth",
    // q98 broadcasts its 1-row pre-publish count (p4's report shape)
    "q98_wap_publish",
    // q101 broadcasts the same 1-row count, read back through the tag
    "q101_sql_wap",
    // q105/q106 broadcast a 1-row pre-delete / sidecar count (q98's
    // report shape); their data-path joins are broadcast-hash anti
    "q105_mor_delete", "q106_mor_sql",
    // q107/q108 broadcast a 1-row changed-count / pre-merge count
    // (same report shape); the changed-count probe itself is an
    // equi-join on o_orderkey
    "q107_mor_update", "q108_mor_merge")

  test("no unintended CartesianProduct or nested-loop join in any registered query plan") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(intendedLoopJoins)
      .flatMap { name =>
        val plan = run(name).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) Some(name) else None
      }
    assert(offenders.isEmpty, s"loop joins in: $offenders")
  }

  test("selective scans push their filters into parquet") {
    Seq("q1_agg", "q2_filter_project", "q13_date_pred", "q11_ilike").foreach { name =>
      val plan = run(name).queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        !plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
        s"$name lost filter pushdown")
    }
  }

  test("fact scans prune to the referenced columns only") {
    val plan = run("q1_agg").queryExecution.executedPlan.toString
    val readSchema = plan.replaceAll("(?s).*ReadSchema: struct<([^>]*)>.*", "$1")
    val cols = readSchema.split(",").map(_.split(":")(0).trim).toSet
    assert(!cols.contains("l_orderkey") && !cols.contains("l_partkey"),
      s"q1 reads unneeded columns: $cols")
  }

  test("q73 never rereads raw events (the per-pair fan-out must not return)") {
    // Round 5 restructured q73's exact audit to inclusion–exclusion:
    // the sketch, type-universe and distinct-user relations are each
    // built from ONE events scan and localCheckpoint'ed, so the
    // registered plan is joins over LogicalRDDs with ZERO direct
    // events.parquet scans. The round-4 shape — pairs ⋈ raw events per
    // pair side — would put full-width events scans back into this
    // plan; that shape was the measured worst scaler at 10× data
    // (13.1× warm).
    val plan = run("q73_kmv_setops").queryExecution.executedPlan.toString
    val eventsScans = "events\\.parquet".r.findAllIn(plan).size
    assert(eventsScans === 0,
      s"q73 plan scans events.parquet $eventsScans times (expected 0 — " +
        s"all events reads belong in the once-each checkpoint builds):\n$plan")
  }

  test("V2 snapshot write keeps the data path distributed (no driver-side collect)") {
    // The write surface's contract: executors write the parquet files
    // (Spark's FileFormatWriter), the driver only publishes the
    // manifest. A refactor that collects rows and writes them
    // driver-side would cap the writable table at driver memory — the
    // canonical 100 TB write-path killer. QueryExecutionListener sees
    // every Dataset action: a data-path collect() surfaces as a
    // "collect"/"collectAsList" funcName; the legitimate path surfaces
    // as a distributed file-write command.
    import java.nio.file.Files
    import scala.collection.mutable
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val seen = mutable.ListBuffer.empty[(String, String)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        seen.synchronized { seen += ((funcName, qe.executedPlan.toString)) }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      val t = Files.createTempDirectory("v2lint").resolve("t").toString
      (1L to 1000L).toDF("id").write.format("graft-snapshot")
        .option("path", t).mode("append").save()
      // listener delivery is async (no public waitUntilEmpty) — poll for
      // the write command to land, then give stragglers one more beat
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          !seen.synchronized(seen.exists { case (_, p) =>
            p.contains("WriteFiles") || p.contains("InsertIntoHadoopFsRelationCommand") }))
        Thread.sleep(50)
      Thread.sleep(200)
      val collected = seen.synchronized(seen.toList)
      val collects = collected.collect {
        case (fn, _) if fn.startsWith("collect") || fn == "toLocalIterator" => fn
      }
      assert(collects.isEmpty,
        s"V2 write triggered driver-side materialization: $collects")
      assert(collected.exists { case (_, plan) =>
        plan.contains("WriteFiles") || plan.contains("InsertIntoHadoopFsRelationCommand")
      }, s"V2 write produced no distributed file-write execution; saw: ${collected.map(_._1)}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("unpartitioned windows run only over bounded post-aggregation domains") {
    // Window.orderBy with no partition spec plans as a single-partition
    // sort — the whole input serializes through one task. That's only
    // acceptable when the input's cardinality is a GROUP-KEY DOMAIN
    // (dates, deciles, languages, length buckets), never a raw table.
    // This lint pins both halves: (a) no query outside the waived set
    // has an unpartitioned window at all, and (b) every waived site's
    // window input subtree contains an Aggregate, so a future edit
    // can't silently slide a raw-table scan under one of these windows.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val boundedDomain = Set(
      "q35_lag_delta",          // lag over per-date aggregate (|dates|)
      "t18_vocab_growth",       // running sums over 10 decile rows
      "p8_proportional_sample", // quota ranks over |langs| rows
      "p9_length_histogram")    // share-of-total over 5 bucket rows
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = run(name).queryExecution.optimizedPlan
      val unpart = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (unpart.isEmpty) None
      else if (!boundedDomain(name)) Some(s"$name (unwaived unpartitioned window)")
      else if (unpart.exists(_.child.collectFirst { case a: Aggregate => a }.isEmpty))
        Some(s"$name (waived window's input subtree lost its Aggregate)")
      else None
    }
    assert(offenders.isEmpty, s"single-partition window risk in: $offenders")
  }

  test("q84's stream feed stays distributed (no table collect during build)") {
    // Round 6 fed the q84 snapshot-stream write by collecting the full
    // orders table into MemoryStream — a driver-OOM at scale. The
    // rebuilt feed spills shards to parquet and streams them through
    // the file source; this lint pins that no Dataset action named
    // collect*/toLocalIterator fires anywhere in the build. A fresh
    // session forces the ensureBuilt cache to miss, so the build
    // actually runs under the listener.
    import scala.collection.mutable
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val s2 = spark.newSession()
    val seen = mutable.ListBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        seen.synchronized { seen += funcName }: Unit
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    s2.listenerManager.register(listener)
    try {
      SparkEntry.queries("q84_stream_snapshot_write")(s2, sf0001)
      Thread.sleep(500) // listener delivery is async
      val collects = seen.synchronized(seen.toList)
        .filter(fn => fn.startsWith("collect") || fn == "toLocalIterator")
      assert(collects.isEmpty,
        s"q84 build materialized data on the driver: $collects")
    } finally s2.listenerManager.unregister(listener)
  }

  test("hot row-level paths stay inside whole-stage codegen") {
    // the scan→filter→project→partial-agg pipeline of each of these must
    // run generated code (an interpreted expression in the hot path shows
    // up here as a missing WholeStageCodegen wrapper)
    val expectCodegen = Seq("q1_agg", "q2_filter_project", "q9_having",
      "q12_case_when", "q13_date_pred", "q21_daily_kpi",
      "t2_quality_score", "t3_lang_id", "t8_redact", "s5_quantize_int8")
    val missing = expectCodegen.flatMap { name =>
      // codegen stages print as `*(n) Operator`, but only once AQE has
      // executed the stages — collect through the SAME QueryExecution
      // (count() would build a fresh one and leave this plan unexecuted)
      val df = run(name)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("*(")) None else Some(name)
    }
    assert(missing.isEmpty, s"no codegen span in: $missing")
  }
}
