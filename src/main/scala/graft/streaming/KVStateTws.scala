package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** The Redis SET/GET-with-TTL op on the transformWithState API — the
  * successor to flatMapGroupsWithState that KeyedCounters deliberately
  * avoided while it was evolving (SURVEY §7 hard-part 4). Kept alongside
  * the FMGWS version: same semantics, two state backends.
  *
  * transformWithState gives TTL natively (TTLConfig per state variable —
  * no manual timeout bookkeeping) but requires the RocksDB state store
  * provider; callers set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider` before starting the query.
  * At 100 TB/day this is the backend that matters anyway: RocksDB state
  * spills to disk and snapshots incrementally, where the default
  * in-memory provider caps state at executor heap.
  */
object KVStateTws {

  /** `seq` is the change-sequence the DATA carries (event time, CDC
    * LSN…): "last set wins" must be an ordering of the data, never the
    * shuffle's group-iterator order, which is neither deterministic
    * across recomputation nor arrival order (mergeSink's APPLY CHANGES
    * contract). The default 0 keeps reference-parity call sites
    * compiling; ties on seq break on value for a deterministic winner.
    */
  case class KVSet(key: String, value: String, seq: Long = 0L)

  /** wasPresent=false means the key was absent OR its TTL had lapsed —
    * exactly Redis `SET` observing a prior `GET → nil`. */
  case class KVOut(key: String, value: String, wasPresent: Boolean)

  class LatestValueProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, KVSet, KVOut] {

    @transient private var state: ValueState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, String)]("latest",
        Encoders.product[(Long, String)],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String, rows: Iterator[KVSet],
        timerValues: TimerValues): Iterator[KVOut] = {
      val present = state.exists()
      // highest (seq, value) wins — deterministic within the batch AND
      // across batches (a late lower-seq arrival never rolls back)
      var best: KVSet = null
      rows.foreach { r =>
        if (best == null || r.seq > best.seq ||
            (r.seq == best.seq && r.value > best.value)) best = r
      }
      val kept =
        if (present) {
          val (s0, v0) = state.get()
          if (s0 > best.seq || (s0 == best.seq && v0 > best.value)) (s0, v0)
          else (best.seq, best.value)
        } else (best.seq, best.value)
      state.update(kept)
      Iterator.single(KVOut(key, kept._2, present))
    }
  }

  /** With a TTL the query runs in processing-time mode and the engine
    * schedules cleanup micro-batches continuously — correct in
    * production, but a busy-loop under MemoryStream tests, so the spec
    * exercises the ttl=None path and KeyedCounters keeps the tested
    * TTL semantics on the stable API.
    */
  def latestValueTws(sets: Dataset[KVSet],
      ttl: Option[java.time.Duration]): Dataset[KVOut] = {
    implicit val out: Encoder[KVOut] = Encoders.product[KVOut]
    implicit val kenc: Encoder[String] = Encoders.STRING
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    sets.groupByKey(_.key)
      .transformWithState(new LatestValueProcessor(ttl), mode,
        OutputMode.Update())
  }
}
