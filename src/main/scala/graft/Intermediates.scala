package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Materialize-once registry for composed operators.
  *
  * Audit/report queries compose other operators (d8/d12 build on d5's
  * cluster labels, s7 on s1+s3, p11 on p3+p7). Re-running the parent
  * pipeline inline per consumer is correct but wasteful — at 100 TB a
  * production DAG materializes each intermediate once and every consumer
  * reads the materialized copy (the dbt staged-model pattern:
  * magic_shop/models/marts/fct_orders.sql builds on staged intermediates,
  * it never re-derives them).
  *
  * This registry is that seam inside one Spark application:
  * `Intermediates.of(spec)(s, dir)` runs the spec AT MOST ONCE per
  * (session, data dir) and hands every consumer the same
  * `localCheckpoint`ed result — materialized to block storage, lineage
  * truncated, freed with the session. On a cluster the same seam would
  * write a temp parquet instead; the contract (materialize once, reuse
  * everywhere) is identical, and the cached results here are the small
  * ones by construction: labels, candidate pairs, top-k lists — never
  * the corpus.
  *
  * Keyed by session identity so a restarted session can never see
  * another session's orphaned blocks.
  */
object Intermediates {
  private val cache = TrieMap.empty[(String, String, String), DataFrame]
  private val locks = TrieMap.empty[(String, String, String), Object]

  // applicationId + identity, not identityHashCode alone: the hash is a
  // non-unique ~31-bit value, so a restarted session could collide with
  // a dead one's entry and be handed a DataFrame bound to a STOPPED
  // context. The applicationId changes with every context, so stale
  // entries can never alias a live session; a residual same-context
  // identity collision would at worst serve a sibling session's frame
  // over the same live block manager.
  private def sessionKey(s: SparkSession): String =
    s"${s.sparkContext.applicationId}-${System.identityHashCode(s)}"

  def of(spec: QuerySpec)(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, spec.name)(spec.run(s, dir))

  /** Same contract for shared sub-relations that are not themselves
    * registered queries (e.g. the exploded shingle-hash relation d2 and
    * d7 both aggregate over).
    */
  def cached(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    val k = (sessionKey(s), dir, key)
    cache.get(k) match {
      case Some(df) => df
      case None =>
        // per-key lock around the build: TrieMap.getOrElseUpdate may
        // evaluate the thunk in two racing threads and DISCARD one
        // result — whose localCheckpoint blocks would then be pinned
        // with no cache reference to ever unpersist them (the exact
        // leak dropAll() exists to prevent). One builder per key wins
        // the race by construction; the double-check keeps the fast
        // path lock-free.
        locks.getOrElseUpdate(k, new Object).synchronized {
          cache.getOrElseUpdate(k, build.localCheckpoint())
        }
    }
  }

  /** Test seam: drop all cached results (e.g. between suites that reuse
    * one session but mutate inputs).
    */
  def clear(): Unit = cache.clear()

  /** Evict every cached intermediate whose data dir is NOT `keepDir`,
    * releasing the checkpoint blocks eagerly. The bench runs three data
    * scales through one JVM; without eviction each tier's multi-GB
    * intermediates (the dst-partitioned edge relation alone is ~GBs at
    * 32×) stay resident while the next tier runs — exactly the
    * block-manager pressure that spilled the 32× tier. A real
    * deployment keeps one dataset's working set; so does the bench now.
    */
  def dropExcept(keepDir: String): Unit =
    drop(cache.keys.filter(_._2 != keepDir).toSeq)

  /** Evict EVERYTHING, releasing the checkpoint blocks eagerly. The
    * 32× bench tier runs each curve query against its own working set:
    * checkpoint blocks live inside the protected storage fraction
    * (unevictable), so a prior query's multi-GB seam would otherwise
    * squeeze the next query's execution memory into OOM at that data
    * scale.
    */
  def dropAll(): Unit = drop(cache.keys.toSeq)

  private def drop(keys: Seq[(String, String, String)]): Unit =
    keys.foreach { k =>
      cache.remove(k).foreach { df =>
        org.apache.spark.sql.GraftShim.logicalPlan(df) match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            // best-effort: blocks of a stopped context are already gone,
            // and a dead entry must not abort the eviction sweep
            try lr.rdd.unpersist(blocking = true)
            catch { case _: IllegalStateException => () }
          case _ => ()
        }
      }
    }
}
