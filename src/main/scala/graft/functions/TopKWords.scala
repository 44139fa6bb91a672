package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

object TopKWords {

  /** Space-saving buffer: the counters map plus a transient sorted index
    * over (count, item) used for O(log capacity) min-eviction. The index
    * is rebuilt lazily after deserialization / merge (eviction only ever
    * happens at capacity, so the one-off O(n log n) rebuild amortizes
    * over the stream); only `counts` crosses the wire. Eviction picks the
    * minimum by (count, item) — the exact tie-break the previous
    * full-scan `minBy` used, so results are bit-identical.
    */
  final class Buf extends Serializable {
    val counts: mutable.Map[String, Long] = mutable.Map.empty
    @transient private var order: mutable.TreeSet[(Long, String)] = _

    private def ensureOrder(): mutable.TreeSet[(Long, String)] = {
      if (order == null) {
        order = mutable.TreeSet.empty[(Long, String)]
        counts.foreach { case (item, cnt) => order += ((cnt, item)) }
      }
      order
    }

    def add(item: String, capacity: Int): Unit = {
      counts.get(item) match {
        case Some(c) =>
          counts(item) = c + 1L
          if (order != null) { order -= ((c, item)); order += ((c + 1L, item)) }
        case None if counts.size < capacity =>
          counts(item) = 1L
          if (order != null) order += ((1L, item))
        case None =>
          val o = ensureOrder()
          val evicted @ (minV, minK) = o.head
          o -= evicted
          counts.remove(minK)
          counts(item) = minV + 1L
          o += ((minV + 1L, item))
      }
    }

    def mergeFrom(other: Buf, capacity: Int): Unit = {
      order = null // wholesale rewrite; rebuild lazily if eviction resumes
      other.counts.foreach { case (item, cnt) =>
        counts(item) = counts.getOrElse(item, 0L) + cnt
      }
      // shrink back to capacity, dropping the smallest counters
      if (counts.size > capacity) {
        val keep = counts.toSeq.sortBy { case (kk, vv) => (-vv, kk) }.take(capacity)
        counts.clear()
        keep.foreach { case (kk, vv) => counts(kk) = vv }
      }
    }
  }
}

/** Space-saving heavy-hitters sketch as a typed `Aggregator` — the
  * custom-aggregate rung of the extension ladder (SURVEY §2.11: reserve
  * `Aggregator[IN,BUF,OUT]` for sketches). Tracks at most `capacity`
  * counters; when full, an incoming unseen item replaces the current
  * minimum and inherits its count (+1), so every true count is bounded by
  * [reported - minError, reported]. With capacity >= distinct items the
  * sketch is exact. Eviction is O(log capacity) via a sorted side index
  * (see [[TopKWords.Buf]]) — the defining property of the stream-summary
  * structure; a full-map min scan per unseen item would be
  * O(rows × capacity) on high-cardinality streams.
  *
  * Merge is commutative up to the standard space-saving error bounds;
  * results are returned sorted by (count desc, item) for stable output.
  */
class TopKWords(capacity: Int, k: Int)
    extends Aggregator[String, TopKWords.Buf, Seq[(String, Long)]] {

  require(capacity >= 1 && k >= 1, s"capacity=$capacity, k=$k must be >= 1")

  override def zero: TopKWords.Buf = new TopKWords.Buf

  override def reduce(buf: TopKWords.Buf, item: String): TopKWords.Buf = {
    buf.add(item, capacity)
    buf
  }

  override def merge(a: TopKWords.Buf, b: TopKWords.Buf): TopKWords.Buf = {
    a.mergeFrom(b, capacity)
    a
  }

  override def finish(buf: TopKWords.Buf): Seq[(String, Long)] =
    buf.counts.toSeq.sortBy { case (kk, vv) => (-vv, kk) }.take(k)

  override def bufferEncoder: Encoder[TopKWords.Buf] =
    Encoders.kryo[TopKWords.Buf]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
