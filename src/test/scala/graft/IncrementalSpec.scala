package graft

import org.apache.spark.sql.functions._

/** Semantic contracts of the incremental-processing family beyond the
  * oracle hash gate: the refresh identity, dedup drop/keep behavior on
  * planted inputs, PQ code bounds, and BFS frontier monotonicity.
  */
class IncrementalSpec extends SparkTestBase {

  import spark.implicits._

  test("q70: base+delta partial merge equals a direct full aggregation") {
    val merged = run("q70_incremental_agg", sf001)
    val direct = Tables.orders(spark, sf001)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"),
        max("o_totalprice").as("max_price"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("d15: every kept batch doc is genuinely new — no exact text twin in the index") {
    // the operator's survivors, recomputed membership from first principles:
    // a batch doc (doc_id % 5 = 4) whose md5(text) exists in the index
    // (doc_id % 5 <> 4) must NOT contribute to any kept count
    val docs = Tables.documents(spark, sf001)
    val exactDup = docs.filter(col("doc_id") % 5 === 4)
      .withColumn("h", md5(col("text")))
      .join(docs.filter(col("doc_id") % 5 =!= 4)
        .select(md5(col("text")).as("h")).distinct(), "h")
      .count()
    val batchTotal = docs.filter(col("doc_id") % 5 === 4).count()
    val kept = run("d15_incremental_dedup", sf001)
      .agg(sum("n_kept")).head().getLong(0)
    assert(kept <= batchTotal - exactDup,
      s"kept=$kept must exclude all $exactDup exact dupes of $batchTotal")
    assert(kept > 0, "a healthy corpus keeps most of the new batch")
  }

  test("t15: a planted dominant adjacent pair tops the BPE count") {
    // engine semantics on controlled input (the oracle checks testdata;
    // this pins the pair construction itself)
    val df = Seq.fill(50)("x y z").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    df.createOrReplaceTempView("t15docs")
    val t = split(col("text"), " ")
    val top = df.select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").count().orderBy(desc("count"), col("pair"))
      .head()
    assert(top.getString(0) === "x y" && top.getLong(1) === 50L)
  }

  test("s11: every packed PQ code decodes to 4 nibbles in [0, 15]") {
    val codes = run("s11_pq_codes", sf001).select("pq_code").as[Long].collect()
    assert(codes.nonEmpty)
    codes.foreach { c =>
      assert(c >= 0 && c < 65536, s"packed code $c out of 16-bit range")
    }
    // codes must actually use the space (not collapse to one value)
    assert(codes.distinct.length > 10, "degenerate codebook assignment")
  }

  test("d17: the Bloom prefilter actually prunes — few novel docs reach the join") {
    import graft.functions.BloomAgg
    val docs = Tables.documents(spark, sf001)
    val isBatch = col("doc_id") % 5 === 4
    val idx = docs.filter(!isBatch).select(md5(col("text")).as("h"))
    val bf = idx.agg(BloomAgg.bloom_build(col("h"), words = 1024).as("bf"))
    val probed = docs.filter(isBatch)
      .withColumn("h", md5(col("text")))
      .crossJoin(broadcast(bf))
      .withColumn("maybe", BloomAgg.bloom_probe(col("bf"), col("h"), words = 1024))
    val total = probed.count()
    val positives = probed.filter(col("maybe")).count()
    val trueDupes = docs.filter(isBatch).withColumn("h", md5(col("text")))
      .join(idx.distinct(), "h").select("doc_id").distinct().count()
    // 65536 bits over ~400 index keys, 3 hashes → theoretical fp well
    // under 1%; 5% is the regression bound. positives = dupes + fps.
    assert(positives - trueDupes <= math.max(2L, total / 20),
      s"bloom passed ${positives - trueDupes} false positives of $total")
  }

  test("q72: BFS levels are monotone over the frontier expansion") {
    val lv = run("q72_bfs_levels", sf001)
    // level 0 is exactly the single source customer
    assert(lv.filter(col("level") === 0).count() === 1)
    // bipartite graph: customers sit on even levels, suppliers on odd
    val parityViolations = lv.filter(
      (col("kind") === "c" && col("level") % 2 =!= 0) ||
      (col("kind") === "s" && col("level") % 2 =!= 1)).count()
    assert(parityViolations === 0)
  }

  test("q73: KMV union estimate is within 60% of exact on every pair") {
    // k=16 gives ~1/sqrt(14) ≈ 27% standard error; 60% is the
    // deterministic-seed regression bound, not a statistical claim
    val rows = run("q73_kmv_setops", sf001)
      .select("est_union", "exact_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(0), r.getLong(1))
      assert(math.abs(est - exact) <= 0.6 * exact,
        s"KMV estimate $est too far from exact $exact")
    }
  }

  test("q73: a type whose user_ids are ALL NULL still appears in the pair universe") {
    // The oracle's `types` CTE enumerates DISTINCT event_type from ALL
    // events while the sketch relation is NULL-guarded; deriving the
    // Spark fan-out from the sketch would silently drop every pair that
    // touches an all-NULL type. Pin the aligned semantics: such a type
    // pairs with sketched types (exact side counts it as 0 distinct
    // users; the estimate falls back to the other side's sketch), and a
    // pair of TWO all-NULL types drops on both engines (no merged
    // sketch row survives the final inner join).
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("q73null").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, uid: java.lang.Long, tpe: String) =
      (id, t0, uid, tpe, 1.0, "{}")
    val rows =
      (1L to 5L).map(u => ev(u, u, "a")) ++          // users 1..5
      (3L to 7L).map(u => ev(10 + u, u, "b")) ++     // users 3..7
      Seq(ev(100, null, "c"), ev(101, null, "c"),    // all-NULL type
          ev(102, null, "d"))                        // second all-NULL type
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = run("q73_kmv_setops", dir)
      .select("ta", "tb", "est_union", "exact_union").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d")), s"pair universe was ${out.keySet}")
    // |a ∪ b| = 7 exactly; both sketches have < 16 hashes → est is exact
    assert(out(("a", "b")) === ((7L, 7L)))
    // all-NULL side contributes nothing: union == the sketched side
    assert(out(("a", "c")) === ((5L, 5L)))
    assert(out(("b", "d")) === ((5L, 5L)))
  }

  test("q83: hopping windows place every event in exactly two buckets") {
    // slide 30m, duration 1h: Σn over hopping buckets = 2 × Σn over
    // tumbling buckets = 2 × |events|
    val hopping = run("q83_hopping_window", sf001)
      .agg(sum("n")).head.getLong(0)
    val tumbling = run("q82_tumbling_window", sf001)
      .agg(sum("n")).head.getLong(0)
    val events = Tables.events(spark, sf001).count()
    assert(tumbling === events)
    assert(hopping === 2 * events)
  }

  test("q84: the streamed snapshot table holds exactly one version per micro-batch") {
    run("q84_stream_snapshot_write", sf001).collect() // force the build
    import graft.operators.Incremental
    val root = Incremental.snapRoot(spark, sf001, "snapstreamw")
    // 3 shards → versions 1..3; the replayed batch published NOTHING
    assert(graft.sources.Snapshots.versions(spark, root) === Seq(1L, 2L, 3L))
  }

  test("q85: delete is file-granular — carried files survive the rewrite byte-identical") {
    run("q85_snapshot_delete", sf001).collect() // force the build
    import graft.operators.Incremental
    import graft.sources.Snapshots
    val root = Incremental.snapRoot(spark, sf001, "snapdel")
    val before = Snapshots.dataFiles(spark, root, Some(1L)).toSet
    val after = Snapshots.dataFiles(spark, root, Some(2L)).toSet
    val carried = before & after
    // the predicate (o_totalprice > 200000) hits most ranges, but the
    // point of the spec is structural: every untouched file is the SAME
    // file (path identity = zero rewrite), and at least one file was
    // actually rewritten
    assert((after -- before).nonEmpty, "delete rewrote nothing")
    assert(carried.forall(before), "carried files changed identity")
    // no deleted row survives, no kept row lost
    val kept = Snapshots.read(spark, root)
    assert(kept.filter(col("o_totalprice") > 200000).count() === 0)
  }

  test("d16: identical sources would agree on all 16 mins; disjoint near none") {
    val rows = run("d16_source_overlap", sf001)
      .select("agree16", "exact_bp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (agree, bp) = (r.getLong(0), r.getLong(1))
      // signature agreement tracks exact Jaccard directionally: high
      // overlap cannot show zero agreement and vice versa
      if (bp >= 5000) assert(agree >= 8, s"J=$bp bp but only $agree/16 agree")
      if (bp == 0) assert(agree <= 8, s"disjoint sets but $agree/16 agree")
    }
  }

  test("q80 scd2Apply stitches all three boundary cases: extend, close, new user") {
    import graft.sources.Snapshots
    import graft.operators.Incremental
    val root = java.nio.file.Files.createTempDirectory("scd2spec")
      .resolve("t").toString
    def ev(rows: (Long, Long, Long, String)*) =
      rows.toDF("user_id", "event_id", "us", "event_type")
    // base: u1 open on 'a' (extend case), u2 open on 'a' (close case)
    Snapshots.commit(
      Incremental.scd2WithSk(
        Incremental.scd2Runs(ev((1L, 1L, 100L, "a"), (2L, 2L, 100L, "a")))
          .drop("version", "n_events")),
      root)
    // batch: u1 continues 'a' then flips to 'b'; u2 flips to 'b'
    // immediately; u3 is brand new with two runs
    Incremental.scd2Apply(spark, root, ev(
      (1L, 3L, 200L, "a"), (1L, 4L, 300L, "b"),
      (2L, 5L, 250L, "b"),
      (3L, 6L, 220L, "x"), (3L, 7L, 260L, "y")))
    val got = Snapshots.read(spark, root)
      .select("user_id", "event_type", "valid_from_us", "valid_to_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got === Set(
      (1L, "a", 100L, 300L),  // extended: original from kept, closed at flip
      (1L, "b", 300L, -1L),
      (2L, "a", 100L, 250L),  // closed at the first new change
      (2L, "b", 250L, -1L),
      (3L, "x", 220L, 260L),  // new user inserted whole
      (3L, "y", 260L, -1L)))
    // and the full-recompute identity holds on the union of both halves
    val full = Incremental.scd2Runs(ev(
      (1L, 1L, 100L, "a"), (2L, 2L, 100L, "a"),
      (1L, 3L, 200L, "a"), (1L, 4L, 300L, "b"),
      (2L, 5L, 250L, "b"),
      (3L, 6L, 220L, "x"), (3L, 7L, 260L, "y")))
      .select("user_id", "event_type", "valid_from_us", "valid_to_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got === full)
  }

  test("scd2 runs stay uniquely keyed under same-microsecond timestamp ties") {
    import graft.operators.Incremental
    import spark.implicits._
    // two runs starting at the SAME microsecond: without the event_id
    // tie-break both would carry sk user:100 and merge would reject
    val runs = Incremental.scd2WithSk(Incremental.scd2Runs(
      Seq((1L, 1L, 100L, "a"), (1L, 2L, 100L, "b"))
        .toDF("user_id", "event_id", "us", "event_type")))
    val rows = runs.select("sk", "event_type", "valid_to_us").collect()
    assert(rows.map(_.getString(0)).distinct.length === 2)
    // deterministic chain: 'a' (eid 1) precedes 'b' (eid 2)
    val byType = rows.map(r => r.getString(1) ->
      (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(byType === Map("a" -> 100L, "b" -> -1L))
  }
}
