package graft

import graft.functions.{Portable, TopKWords, VecOps}
import graft.operators.Skew
import graft.pipeline.{Checks, Marts, Stages}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.Random

/** Pins the round-6 review-fix semantics — each test fails on a revert
  * of the corresponding fix.
  */
class ReviewFixesSpec extends SparkTestBase {

  import spark.implicits._

  test("Portable.shingles binds the passed column, not a column named 'text'") {
    // frame with BOTH a decoy 'text' column and the real payload: the
    // old expr-based build silently shingled the decoy
    val df = Seq(("alpha beta gamma delta", "wrong wrong wrong wrong"))
      .toDF("body", "text")
    val out = df.select(Portable.shingles(col("body"), 3).as("sh"))
      .head.getSeq[String](0)
    assert(out === Seq("alpha beta gamma", "beta gamma delta"))
  }

  test("vec_dot yields NULL on mismatched lengths and null elements") {
    val df = Seq(
      (1L, Seq(Some(1.0), Some(2.0), Some(3.0)), Seq(Some(1.0), Some(1.0), Some(1.0))),
      (2L, Seq(Some(1.0), Some(2.0)), Seq(Some(1.0))), // dimension break
      (3L, Seq(Some(1.0), None), Seq(Some(1.0), Some(1.0))) // null element
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), VecOps.vec_dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 6.0)
    assert(rows(1).isNullAt(1), "mismatched lengths must not truncate-and-score")
    assert(rows(2).isNullAt(1), "a null element must poison the product")
    // and the HOF/oracle form agrees on the same inputs
    val hof = df.selectExpr("id",
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v) AS d")
      .orderBy("id").collect()
    (0 until 3).foreach(i => assert(rows(i).isNullAt(1) === hof(i).isNullAt(1)))
  }

  test("Portable.WsRegex collapses vertical tab like RE2's explicit class") {
    // Java \s includes U+000B, RE2 \s does not — the explicit class is
    // the cross-engine definition (verified against DuckDB 1.x)
    val out = spark.range(1)
      .select(regexp_replace(lit("ab\tc"), Portable.WsRegex, " ").as("t"))
      .head.getString(0)
    assert(out === "a b c")
  }

  test("char-entropy splits on codepoints, not UTF-16 code units") {
    // one supplementary-plane char: 2 code units, 1 codepoint
    val chars = spark.range(1)
      .select(explode(regexp_extract_all(lit("x😀y"), lit("(?s)."), lit(0))).as("ch"))
      .as[String].collect()
    assert(chars === Seq("x", "😀", "y"))
  }

  test("TopKWords tree-indexed eviction matches the full-scan reference") {
    // random stream, tight capacity: replay the same stream through the
    // previous O(capacity)-minBy reference implementation and require
    // identical counters — the sorted side index must not change results
    val rnd = new Random(42)
    val stream = Seq.fill(5000)(s"w${rnd.nextInt(300)}")
    val agg = new TopKWords(capacity = 64, k = 10)
    var buf = agg.zero
    stream.foreach(w => buf = agg.reduce(buf, w))
    val reference = mutable.Map.empty[String, Long]
    stream.foreach { item =>
      if (reference.contains(item)) reference(item) += 1L
      else if (reference.size < 64) reference(item) = 1L
      else {
        val (minK, minV) = reference.minBy { case (kk, vv) => (vv, kk) }
        reference.remove(minK)
        reference(item) = minV + 1L
      }
    }
    assert(buf.counts.toMap === reference.toMap)
  }

  test("spreadCountDistinct ignores NULL values like countDistinct") {
    val df = Seq(("k1", Some("a")), ("k1", None), ("k2", None))
      .toDF("k", "v")
    val got = Skew.spreadCountDistinct(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("k1" -> 1L)) // k2 has no non-null values at all
    val builtin = df.groupBy("k").agg(countDistinct("v").as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === builtin)
  }

  test("relationship check skips NULL child keys (dbt semantics)") {
    val child = Seq(Some(1L), Some(2L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Checks.relationship(child, "fk", parent, "pk")
    assert(r.passed, s"NULL FK must not be a violation: $r")
    val broken = Checks.relationship(Seq(Some(9L)).toDF("fk"), "fk", parent, "pk")
    assert(!broken.passed)
  }

  test("incremental fct_orders snaps the cutoff to the month boundary") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-marts-midmonth").toString
    Marts.incrementalFctOrders(spark, sf0001, path, cutoff = "1995-06-15")
    val full = Marts.run(spark, sf0001)("fct_orders")
      .filter(col("order_month") === "199506").count()
    val got = spark.read.parquet(path)
      .filter(col("order_month") === "199506").count()
    // a mid-month cutoff must still carry the WHOLE overwritten month —
    // the order_date filter variant dropped days 1-14 of June
    assert(got === full,
      s"month partition 199506 lost rows: $got of $full")
  }

  test("GlobalRank offset lookup stays flat and exact across partitions") {
    val n = 5000L
    val df = spark.range(n).toDF("id")
    val ranked = operators.GlobalRank.rowNumber(df, Seq(col("id")), "rn")
    // rank must be the exact global 1..n sequence (catches any offset
    // table misalignment from the array-lookup rewrite)
    val bad = ranked.filter(col("rn") =!= col("id") + 1).count()
    assert(bad === 0)
  }

  test("Stages.run viewSuffix isolates two source sets in one session") {
    Stages.run(spark,
      Seq(Stages.Stage("rf_model", Seq("src"), ups => ups("src"))),
      Map("src" -> Seq(1).toDF("v")), viewSuffix = "_a")
    Stages.run(spark,
      Seq(Stages.Stage("rf_model", Seq("src"), ups => ups("src"))),
      Map("src" -> Seq(1, 2).toDF("v")), viewSuffix = "_b")
    assert(spark.sql("SELECT COUNT(*) FROM rf_model_a").head.getLong(0) === 1L)
    assert(spark.sql("SELECT COUNT(*) FROM rf_model_b").head.getLong(0) === 2L)
  }
}
