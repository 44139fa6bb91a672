package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Redis-style keyed counters with TTL expiry (SURVEY S24/T8/A10 — the
  * coffee_shop lab: SET/GET/INCR with EX; coffee_shop/main.ipynb:36-131)
  * re-expressed as stateful streaming: INCR ≡ keyed count update, EX/TTL ≡
  * processing-time state timeout, read-after-expiry→None ≡ state removal
  * on timeout.
  *
  * flatMapGroupsWithState is used (rather than transformWithState) as the
  * stable API surface — SURVEY §7 hard-part 4.
  */
object KeyedCounters {

  case class Hit(key: String, n: Long)
  case class KeyCount(key: String, count: Long, expired: Boolean)

  /** Streaming INCR-with-TTL: emits the running count per key on every
    * update; on TTL expiry emits a final tombstone (expired=true) and
    * drops the state.
    */
  def ttlCounters(hits: Dataset[Hit], ttlMs: Long): Dataset[KeyCount] = {
    implicit val enc = Encoders.product[KeyCount]
    implicit val kenc = Encoders.STRING
    implicit val senc = Encoders.scalaLong
    hits.groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyCount](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, rows: Iterator[Hit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(KeyCount(key, last, expired = true))
          } else {
            val prev = state.getOption.getOrElse(0L)
            val next = prev + rows.map(_.n).sum
            state.update(next)
            state.setTimeoutDuration(ttlMs)
            Iterator(KeyCount(key, next, expired = false))
          }
      }
  }
}
