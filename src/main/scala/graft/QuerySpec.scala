package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables.
  *
  * Determinism rules (the driver hash-compares values after sorting
  * columns by name):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - aggregate doubles are rounded (sum→2dp, avg/ratio→4dp) so
  *    summation-order ULP noise cannot flip the hash;
  *  - any LIMIT/top-k is fully ordered with an integer tie-break key;
  *  - row-level double arithmetic is left exact (IEEE ops match across
  *    engines when the expression shape matches).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {

  /** Registry variant that routes through the Intermediates registry —
    * the producer side of the materialize-once seam: whichever of the
    * registered query and its consumers runs first builds and
    * checkpoints, everyone else (same session + dir) reads the
    * materialized result. Results are identical; only recomputation is
    * eliminated.
    */
  def memo: QuerySpec = copy(run = (s, d) => Intermediates.of(this)(s, d))
}

object QuerySpec {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}
