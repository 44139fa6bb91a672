package graft

import org.apache.spark.sql.functions._

/** Specs for the analytic-window family (q35–q39) and the round-2
  * curation/text/similarity additions (p6, p7, t7, s6). The oracle gate
  * hash-checks values; these specs assert the semantic invariants and
  * determinism properties the hashes alone don't explain.
  */
class AnalyticSpec extends SparkTestBase {

  test("q35 lag delta: delta equals rev - prev_rev and first row is null") {
    val rows = run("q35_lag_delta").orderBy("d").collect()
    assert(rows.nonEmpty)
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev_rev")))
    rows.drop(1).foreach { r =>
      val rev = r.getDouble(r.fieldIndex("rev"))
      val prev = r.getDouble(r.fieldIndex("prev_rev"))
      val delta = r.getDouble(r.fieldIndex("delta"))
      assert(math.abs((rev - prev) - delta) < 1e-5)
    }
  }

  test("q36 ntile: four quartiles, sizes differ by at most one, ordered") {
    val rows = run("q36_ntile").collect()
    val sizes = rows.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1)
    // every member of quartile 1 outranks (>= balance) every member of 4
    val q1min = rows.filter(_.getInt(2) == 1).map(_.getDouble(1)).min
    val q4max = rows.filter(_.getInt(2) == 4).map(_.getDouble(1)).max
    assert(q1min >= q4max)
  }

  test("q37 intersect: subset of both sides, distinct") {
    val out = run("q37_intersect").collect().map(_.getInt(0)).toSeq
    assert(out.distinct.size == out.size)
    val c = Tables.customer(spark, sf0001)
      .select(col("c_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    val s = Tables.supplier(spark, sf0001)
      .select(col("s_nationkey")).distinct().collect().map(_.getInt(0)).toSet
    assert(out.toSet == (c intersect s))
  }

  test("q38 above-nation-average: every kept row beats its nation mean") {
    val kept = run("q38_above_nation_avg")
    val stats = Tables.customer(spark, sf0001)
      .groupBy(col("c_nationkey").as("nk"))
      .agg(avg("c_acctbal").as("mean")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    kept.collect().foreach { r =>
      assert(r.getDouble(2) > stats(r.getInt(1)) - 1e-9)
    }
  }

  test("q39 range frame: 30-day window matches brute-force recompute") {
    val out = run("q39_range_frame_30d").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val perDay = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
          .cast("long").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    val byCust = perDay.groupBy(_._1._1)
    out.foreach { case ((ck, day), got) =>
      val want = byCust(ck)
        .filter { case ((_, d), _) => d <= day && d >= day - 29 }
        .map(_._2).sum
      assert(math.abs(got - want) < 1e-4, s"cust $ck day $day")
    }
  }

  test("p6 domain mix: kept-rate per source tier tracks rate_bp, deterministic") {
    val a = run("p6_domain_mix", sf001).collect()
    val b = run("p6_domain_mix", sf001).collect()
    assert(a.map(_.getLong(0)).sorted.sameElements(b.map(_.getLong(0)).sorted))
    val keptBySrc = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // full-rate tier keeps everything (25 docs/source at sf0.01)
    assert((0 until 5).forall(i => keptBySrc.getOrElse(s"src$i", 0) == 25))
    // sampled tiers keep strictly fewer in aggregate
    val lowTier = keptBySrc.filter { case (k, _) => k.drop(3).toInt >= 10 }.values.sum
    assert(lowTier < 10 * 25)
  }

  test("p7 decontamination: flags exactly the eval docs sharing a 5-gram with train") {
    val flagged = run("p7_ngram_decontam", sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.nonEmpty)
    assert(flagged.values.forall(_ >= 1))
    // brute-force recompute on the raw text
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toSet else Set(t)
    }
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100 < 80
    }
    val trainGrams = docs.filter(d => isTrain(d._1)).flatMap(d => grams(d._2)).toSet
    val expect = docs.filterNot(d => isTrain(d._1))
      .map { case (id, t) => id -> grams(t).count(trainGrams.contains) }
      .filter(_._2 >= 1).toMap
    assert(flagged == expect.map { case (k, v) => k -> v.toLong })
  }

  test("q40 funnel: stage timestamps strictly ordered, nulls propagate forward") {
    val rows = run("q40_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val signup = r.getLong(1)
      if (!r.isNullAt(2)) assert(r.getLong(2) > signup)
      if (!r.isNullAt(3)) { assert(!r.isNullAt(2)); assert(r.getLong(3) > r.getLong(2)) }
    }
  }

  test("q41 cohort retention: offsets non-negative, cell count bounded by cohort size") {
    val rows = run("q41_cohort_retention").collect()
    assert(rows.nonEmpty)
    val cohortSize = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L)
      assert(r.getLong(2) <= cohortSize(r.getLong(0)))
    }
  }

  test("d8 keep-best: kept doc is the cluster's max-quality member") {
    val kept = run("d8_keep_best", sf001).collect()
    assert(kept.nonEmpty)
    val labels = run("d5_dedup_clusters", sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = Tables.documents(spark, sf001)
      .selectExpr("doc_id",
        """(47 * least(size(split(text, ' ')) * 10000L div 64, 10000)
          | + 31 * (10000 - size(filter(split(text, ' '), t -> t IN ('the', 'a'))) * 10000L div size(split(text, ' ')))
          | + 22 * least(n_chars * 10000L div 400, 10000)) div 100 AS q""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.foreach { r =>
      val (cid, kdoc, kq, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = byCluster(cid)
      assert(members.size.toLong == n)
      assert(members.contains(kdoc))
      assert(kq == members.map(quality).max)
      // tie-break: smallest doc_id among max-quality members
      assert(kdoc == members.filter(quality(_) == kq).min)
    }
  }

  test("q42 topk-per-key: custom operator agrees with the window route") {
    val custom = run("q42_topk_per_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val windowed = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == windowed)
  }

  test("q43 dispersion: matches Spark's var_pop/stddev_pop within 1e-5 relative") {
    val got = run("q43_dispersion").collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ref = Tables.customer(spark, sf0001)
      .groupBy("c_nationkey")
      .agg(var_pop("c_acctbal").as("v"), stddev_pop("c_acctbal").as("sd"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { case (nk, (v, sd)) =>
      assert(math.abs(v - ref(nk)._1) / ref(nk)._1 < 1e-5)
      assert(math.abs(sd - ref(nk)._2) / ref(nk)._2 < 1e-5)
    }
  }

  test("t8 redact: no digits survive; count matches the runs removed") {
    val rows = run("t8_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getString(1)
      assert(!red.exists(_.isDigit), red)
      assert(r.getLong(2) == "#".r.findAllIn(red).size)
    }
  }

  test("q44 grouping sets: exactly the three requested cells, no cross cell") {
    val rows = run("q44_grouping_sets").collect()
    val statusCells = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val prioCells = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val cross = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(cross.isEmpty, "GROUPING SETS must not contain the cross cell")
    assert(grand.length == 1)
    assert(rows.length == statusCells.length + prioCells.length + 1)
    val total = Tables.orders(spark, sf0001).count()
    assert(grand.head.getLong(2) == total)
    assert(statusCells.map(_.getLong(2)).sum == total)
    assert(prioCells.map(_.getLong(2)).sum == total)
  }

  test("q45 first/last: single-order customers have first=last and null second") {
    val counts = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("q45_first_last").collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val n = counts(r.getLong(0))
      if (n == 1L) {
        assert(r.getDouble(1) == r.getDouble(3))
        assert(r.isNullAt(2))
      } else assert(!r.isNullAt(2))
    }
  }

  test("p8 proportional sample: exact budget, quotas within 1 of proportional") {
    val rows = run("p8_proportional_sample", sf001).collect()
    assert(rows.length == 100)
    val got = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val pop = Tables.documents(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = pop.values.sum.toDouble
    got.foreach { case (lang, k) =>
      val exact = 100.0 * pop(lang) / total
      assert(math.abs(k - exact) < 1.0, s"$lang: $k vs $exact")
    }
    // deterministic: same docs on a second run
    val again = run("p8_proportional_sample", sf001).collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
  }

  test("q46/q47 multiset ops: copies = min / clamped difference of multiplicities") {
    val e = Tables.events(spark, sf0001)
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inter = run("q46_intersect_all").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val diff = run("q47_except_all").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    (views.keySet ++ clicks.keySet).foreach { u =>
      val v = views.getOrElse(u, 0L); val c = clicks.getOrElse(u, 0L)
      assert(inter.getOrElse(u, 0L) == math.min(v, c), s"user $u intersect")
      assert(diff.getOrElse(u, 0L) == math.max(0L, v - c), s"user $u except")
    }
  }

  test("q48 KMV sketch: estimate lands within the k=16 error envelope, deterministic") {
    val rows = run("q48_kmv_distinct", sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getLong(2); val exact = r.getLong(3)
      assert(est >= exact / 3 && est <= exact * 3, s"${r.getString(0)}: $est vs $exact")
    }
    val again = run("q48_kmv_distinct", sf001).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("t7 surprisal: rank 1 is the highest-df token; mean_rank_bp = sum/n") {
    val rows = run("t7_surprisal", sf001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 10000L / r.getLong(2))
    }
  }

  test("t7 vocab rank is distributed: equals dense_rank with no global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.window.WindowExec
    val tok = Tables.documents(spark, sf001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val dfT = tok.distinct().groupBy("token").agg(count(lit(1)).as("df"))
    val got = operators.TextAnalysis.rankedVocab(spark, dfT)
    // the token tie-break makes the key unique, so dense_rank is the
    // ground truth the two-pass rank must reproduce exactly
    val want = dfT.withColumn("rnk", dense_rank()
        .over(Window.orderBy(col("df").desc, col("token"))).cast("int"))
      .select("token", "rnk")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // and the distributed form never plans a partition-less window
    // (unwrap AQE — collect() does not recurse into AdaptiveSparkPlanExec)
    val root = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val wins = root.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      got.queryExecution.executedPlan.toString)
  }

  test("q36 ntile is distributed: equals built-in NTILE, no global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.window.WindowExec
    val got = run("q36_ntile", sf001)
    val want = Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey")))
          .as("quartile"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    val root = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val wins = root.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      got.queryExecution.executedPlan.toString)
  }

  test("GlobalRank.ntile matches SQL NTILE for sizes that do not divide k") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // n = 10, k = 4 -> buckets of 3,3,2,2; n = 3, k = 4 -> bucket = row
    for (n <- Seq(3, 10, 17)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toLong)).toDF("id", "v")
      val got = operators.GlobalRank.ntile(df, Seq(col("v").desc, col("id")), 4, "b")
      val want = df.withColumn("b",
        ntile(4).over(Window.orderBy(col("v").desc, col("id"))))
      assert(got.exceptAll(want).count() === 0, s"n=$n")
      assert(want.exceptAll(got).count() === 0, s"n=$n")
    }
  }

  test("s6 centroid: |labels| x dim rows; n is the label's vector count") {
    val rows = run("s6_centroid_int8", sf001).collect()
    val labels = Tables.embeddings(spark, sf001)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.length == labels.size * 64)
    rows.foreach(r => assert(r.getLong(3) == labels(r.getInt(0))))
  }

  test("q64 basket pairs: ordered pairs, support equals a recount") {
    val rows = run("q64_basket_pairs", sf001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1) && r.getLong(2) >= 1))
    // support of the top pair recounted from the raw table
    val top = rows.head
    val i = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct()
    val n = i.filter(col("l_partkey") === top.getLong(0))
      .join(i.filter(col("l_partkey") === top.getLong(1)), "l_orderkey")
      .count()
    assert(n === top.getLong(2))
  }

  test("q65 islands partition the key set: disjoint, complete, ordered") {
    val rows = run("q65_order_gaps", sf001)
      .orderBy("island_start").collect()
    val nKeys = Tables.orders(spark, sf001)
      .select("o_orderkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum === nKeys)
    rows.foreach(r =>
      assert(r.getLong(1) - r.getLong(0) + 1 === r.getLong(2)))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) < b.getLong(0) - 1)
      case _ =>
    }
  }

  test("q67 pagerank: mass conserved, suppliers outrank customers") {
    val rows = run("q67_pagerank", sf001).collect()
    val n = rows.length
    // symmetric graph, no dangling nodes: total rank mass stays 1
    val mass = rows.map(_.getDouble(2)).sum / 1e6
    assert(math.abs(mass - 1.0) < 1e-4, s"mass=$mass")
    rows.foreach { r =>
      assert(Set("c", "s").contains(r.getString(0)))
      assert(r.getDouble(2) > 0)
    }
    // ~100 suppliers absorb the rank of ~1000 customers: the top node
    // must be a supplier and the supplier mean must dominate
    val (sup, cus) = rows.partition(_.getString(0) == "s")
    assert(rows.maxBy(_.getDouble(2)).getString(0) == "s")
    assert(sup.map(_.getDouble(2)).sum / sup.length >
      cus.map(_.getDouble(2)).sum / cus.length)
    assert(n === sup.length + cus.length && sup.length < cus.length)
  }

  test("q66 MAD: 3 flags; mad bounded by max |x - median|") {
    val rows = run("q66_mad", sf001).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val f = r.getString(0); val med = r.getDouble(1); val mad = r.getDouble(2)
      val ext = Tables.lineitem(spark, sf001)
        .filter(col("l_returnflag") === f)
        .agg(max(abs(col("l_extendedprice") - med)),
          min("l_extendedprice"), max("l_extendedprice")).head()
      assert(mad >= 0 && mad <= ext.getDouble(0))
      assert(med >= ext.getDouble(1) && med <= ext.getDouble(2))
    }
  }
}
