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

  case class KVSet(key: String, value: String)

  /** wasPresent=false means the key was absent OR its TTL had lapsed —
    * exactly Redis `SET` observing a prior `GET → nil`. */
  case class KVOut(key: String, value: String, wasPresent: Boolean)

  class LatestValueProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, KVSet, KVOut] {

    @transient private var state: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[String]("latest", Encoders.STRING,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String, rows: Iterator[KVSet],
        timerValues: TimerValues): Iterator[KVOut] = {
      val present = state.exists()
      var last: String = null
      rows.foreach(r => last = r.value) // last SET in the batch wins
      state.update(last)
      Iterator.single(KVOut(key, last, present))
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
