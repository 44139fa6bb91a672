package graft.functions

/** Minimal open-addressing long→double hash map for broadcast-side
  * lookups in iterative operators (q67 PageRank's rank vector). The
  * boxed alternatives measured badly in the hot path: an immutable
  * `Map[Long, Double]` HAMT walk plus two boxings per probe tripled the
  * 32×-tier round time. This is two primitive arrays, linear probing,
  * byteswap mixing — ~16 bytes/entry, zero allocation per probe, and a
  * plain-array payload that serializes compactly into a broadcast.
  *
  * Build single-threaded, then treat as read-only (the broadcast
  * contract). Keys must not equal `Long.MinValue` (the empty sentinel) —
  * graph node ids here are non-negative.
  */
final class LongDoubleHash private (
    private val keys: Array[Long],
    private val vals: Array[Double],
    private val mask: Int) extends Serializable {

  def get(k: Long, default: Double): Double = {
    var i = scala.util.hashing.byteswap64(k).toInt & mask
    var kk = keys(i)
    while (kk != k) {
      if (kk == LongDoubleHash.Empty) return default
      i = (i + 1) & mask
      kk = keys(i)
    }
    vals(i)
  }

  def put(k: Long, v: Double): Unit = {
    require(k != LongDoubleHash.Empty, "Long.MinValue is the empty sentinel")
    var i = scala.util.hashing.byteswap64(k).toInt & mask
    while (keys(i) != LongDoubleHash.Empty && keys(i) != k)
      i = (i + 1) & mask
    keys(i) = k
    vals(i) = v
  }
}

object LongDoubleHash {
  val Empty: Long = Long.MinValue

  /** Capacity is the next power of two at least 2× `size` — load factor
    * ≤ 0.5 keeps probe chains short.
    */
  def ofSize(size: Int): LongDoubleHash = {
    val cap = math.max(16, Integer.highestOneBit(size * 2 - 1) << 1)
    val keys = new Array[Long](cap)
    java.util.Arrays.fill(keys, Empty)
    new LongDoubleHash(keys, new Array[Double](cap), cap - 1)
  }
}
