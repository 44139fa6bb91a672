package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by bounded-round min-label
  * propagation — the standard 100 TB clustering shape (dedup clusters,
  * semantic near-dup groups): each round is one equi-join + one
  * aggregation, `localCheckpoint`ed so the lineage stays flat and the
  * convergence check scans the just-materialized blocks.
  *
  * Converges in at most `maxRounds` rounds for components whose
  * diameter is below it; a wider component fails loudly rather than
  * emit labels that would disagree with the transitive-closure oracle.
  * (Min propagation shrinks every label monotonically, so
  * changed ⟺ neighbor-min < old label — no second comparison job.)
  */
object ConnectedComponents {

  /** Labels every id that appears in `pairs` (two id columns, one row
    * per undirected edge) with the minimum id reachable from it.
    * Returns (id, label).
    */
  def labels(pairs: DataFrame, idA: String, idB: String,
      maxRounds: Int = 15): DataFrame = {
    val p = pairs.select(col(idA).as("a"), col(idB).as("b"))
    val edges = p.union(p.select(col("b").as("a"), col("a").as("b")))
    val members = edges.select(col("a").as("id")).distinct()
    var labels = members.withColumn("label", col("id"))
    var i = 0
    var converged = false
    while (i < maxRounds && !converged) {
      val neighborMin = edges
        .join(labels, edges("b") === labels("id"))
        .groupBy(edges("a").as("id"))
        .agg(min("label").as("nlabel"))
      val next = labels.drop("label")
        .join(neighborMin, Seq("id"), "left")
        .join(labels.select(col("id"), col("label").as("old")), Seq("id"))
        .select(col("id"),
          least(coalesce(col("nlabel"), col("old")), col("old")).as("label"),
          (coalesce(col("nlabel"), col("old")) < col("old")).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("id", "label")
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge within $maxRounds rounds")
    labels
  }
}
