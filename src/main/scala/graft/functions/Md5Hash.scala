package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Shared md5-prefix arithmetic + shingle iteration for the portable
  * hash expressions. Six call sites (ShingleHash32/60, MinHashSig,
  * SimHash60, SubstringFp, BloomAgg) must stay BIT-IDENTICAL to each
  * other and to the DuckDB oracles' `('0x' || substring(md5(x), 1, n))`
  * casts — one definition here keeps a future tweak from silently
  * diverging a subset of them.
  */
private[functions] object Md5Hash {

  // plan objects are shared across local-mode task threads and
  // MessageDigest is not thread-safe
  private val tl = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def digest(s: String): Array[Byte] =
    tl.get().digest(s.getBytes(StandardCharsets.UTF_8))

  /** First 8 md5 hex chars of the digest as unsigned int
    * (== Portable.h32). */
  def h32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** First 15 md5 hex chars of the digest, sign-safe in int64
    * (== Portable.h60). */
  def h60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def h32(s: String): Long = h32(digest(s))
  def h60(s: String): Long = h60(digest(s))

  /** Apply `f` to each FIRST-OCCURRENCE-distinct n-token shingle of
    * `text`; a text shorter than n tokens collapses to one shingle, the
    * whole text (the Portable.shingles guard, mirrored in every oracle).
    */
  def foreachDistinctShingle(text: String, n: Int)(f: String => Unit): Unit = {
    val words = text.split(" ", -1)
    if (words.length >= n) {
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val sh = sb.toString
        if (seen.add(sh)) f(sh)
        i += 1
      }
    } else {
      f(text)
    }
  }
}
