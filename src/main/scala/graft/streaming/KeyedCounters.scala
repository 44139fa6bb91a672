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
  /** `seq`: the data-carried change order (see KVStateTws.KVSet) —
    * group-iterator order is not arrival order. Default 0 keeps
    * reference-parity call sites; ties break on value.
    */
  case class KVSet(key: String, value: String, seq: Long = 0L)
  case class KVLatest(key: String, value: Option[String], expired: Boolean)

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

  /** Streaming SET-with-TTL: plain Redis SET/GET of arbitrary values
    * (coffee_shop/main.ipynb:36-54, `SET key value EX ttl`) — each
    * incoming row overwrites the key's value (last set in the batch
    * wins), every update emits the current value, and TTL expiry emits a
    * `value=None` tombstone and drops the state (read-after-expiry ≡
    * GET → nil). Same flatMapGroupsWithState machinery as ttlCounters —
    * INCR and SET differ only in the state merge function.
    */
  def latestValuePerKey(sets: Dataset[KVSet], ttlMs: Long): Dataset[KVLatest] = {
    implicit val enc = Encoders.product[KVLatest]
    implicit val kenc = Encoders.STRING // doubles as the String state encoder
    implicit val senc = Encoders.product[(Long, String)]
    sets.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, String), KVLatest](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, rows: Iterator[KVSet], state: GroupState[(Long, String)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator(KVLatest(key, None, expired = true))
          } else {
            // highest (seq, value) wins — deterministic within the
            // batch and across batches (KVStateTws's contract)
            var kept = state.getOption.orNull
            rows.foreach { r =>
              if (kept == null || r.seq > kept._1 ||
                  (r.seq == kept._1 && r.value > kept._2))
                kept = (r.seq, r.value)
            }
            state.update(kept)
            state.setTimeoutDuration(ttlMs)
            Iterator(KVLatest(key, Option(kept._2), expired = false))
          }
      }
  }
}
