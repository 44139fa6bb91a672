package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Space-saving heavy-hitters sketch as a typed `Aggregator` — the
  * custom-aggregate rung of the extension ladder (SURVEY §2.11: reserve
  * `Aggregator[IN,BUF,OUT]` for sketches). Tracks at most `capacity`
  * counters; when full, an incoming unseen item replaces the current
  * minimum and inherits its count (+1), so every true count is bounded by
  * [reported - minError, reported]. With capacity >= distinct items the
  * sketch is exact.
  *
  * Merge is commutative up to the standard space-saving error bounds;
  * results are returned sorted by (count desc, item) for stable output.
  */
class TopKWords(capacity: Int, k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long],
      item: String): mutable.Map[String, Long] = {
    if (buf.contains(item)) buf(item) += 1L
    else if (buf.size < capacity) buf(item) = 1L
    else {
      val (minK, minV) = buf.minBy { case (kk, vv) => (vv, kk) }
      buf.remove(minK)
      buf(item) = minV + 1L
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (item, cnt) =>
      a(item) = a.getOrElse(item, 0L) + cnt
    }
    // shrink back to capacity, dropping the smallest counters
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (kk, vv) => (-vv, kk) }.take(capacity)
      a.clear()
      keep.foreach { case (kk, vv) => a(kk) = vv }
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (kk, vv) => (-vv, kk) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
