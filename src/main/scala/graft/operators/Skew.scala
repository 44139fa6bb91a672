package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §7 hard-part 7 — the reference's event
  * generator deliberately skews country). AQE's skew-join handling covers
  * joins; these cover aggregations where one hot key floods a single
  * reducer: decomposable aggregates run in two phases over a salted key,
  * count-distinct spreads by pre-distincting on (key, value).
  */
object Skew {

  /** Two-phase salted sum/count: partial aggregate over (keys, salt) —
    * hot keys spread over `salts` reducers — then final merge by keys.
    * Result is identical to a direct groupBy (sum/count are decomposable);
    * only the shuffle distribution changes.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n"))
  }

  /** Skew-safe exact count-distinct: distinct over (key, value) first —
    * a shuffle keyed by the pair, so a hot key's values spread — then a
    * plain count per key. Equivalent to countDistinct(value) per key.
    */
  def spreadCountDistinct(df: DataFrame, key: String, valueCol: String): DataFrame =
    // NULL is not a value to countDistinct — without the filter a key
    // with one NULL row reads one too high (and all-NULL keys read 1)
    df.select(col(key), col(valueCol)).filter(col(valueCol).isNotNull)
      .distinct()
      .groupBy(key).agg(count(lit(1)).as(s"n_distinct_$valueCol"))
}
