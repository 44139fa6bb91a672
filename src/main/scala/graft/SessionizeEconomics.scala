package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q26_sessionize scaling attribution (round-8 verdict item: the
  * per-decade exponent rises 0.35 → 0.60 → 0.87 — name the driver
  * before it crosses 1).
  *
  * The query is one hash shuffle of events by user_id, one
  * per-partition sort by (user_id, us, event_id), two Window operators
  * sharing that sort (lag + running sum — O(1) state per row), then a
  * partial+final hash aggregation on (user_id, session_no). Candidate
  * drivers for the rising exponent:
  *
  *  A. shuffle + sort constant amortizing (fixed startup cost shrinks
  *     relative to n log n work → measured e CONVERGES to ~1 from
  *     below; nothing to fix, the asymptote is the sort)
  *  B. window/session state growth (would show as the window stage
  *     growing FASTER than the sort skeleton — a real superlinear term)
  *
  * This main times three nested cuts of the plan, min-of-reps warm,
  * on `SPARK_GRAFT_SF_DIR`:
  *   sort    — shuffle by user_id + sortWithinPartitions (the skeleton
  *             every later stage rides)
  *   window  — skeleton + both Window operators (adds the per-row
  *             lag/sum state, no aggregation)
  *   full    — the registered q26 (adds the second shuffle + agg)
  *
  * If (window − sort) and (full − window) grow at ≤ the skeleton's
  * rate across tiers, the exponent story is (A): the skeleton IS the
  * asymptote. Run via tools/q26_tiers.sh across the 10×/32×/64×
  * fixtures.
  */
object SessionizeEconomics {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus = cpus.toInt, appName = "q26-econ")

    def base(s: SparkSession): DataFrame =
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))

    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")

    def cutSort(s: SparkSession): DataFrame =
      base(s).repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")

    def cutWindow(s: SparkSession): DataFrame = {
      val flagged = base(s).withColumn("prev_us", lag("us", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
      flagged.withColumn("session_no",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    }

    def time(name: String, mk: SparkSession => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): an aggregate lets ColumnPruning drop
        // the Window operators entirely (a count over a windowed frame
        // reads as a bare scan count), which silently guts the cuts
        // this tool exists to compare
        mk(spark).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q26E $name min ${ts.min}%.2f s reps ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("sort", cutSort)
    time("window", cutWindow)
    time("full", s => SparkEntry.queries("q26_sessionize")(s, dir))
    spark.stop()
  }
}
