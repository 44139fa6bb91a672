package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct content-defined substring fingerprints, the row-local half
  * of substring-level dedup (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): at every position where the
  * k-char gram hashes to `0 mod m` (a content-defined anchor — the
  * winnowing/CDC trick that makes the fingerprint set OFFSET-INVARIANT,
  * so a long substring shared by two documents anchors at the same
  * in-substring offsets no matter where it sits in each document), emit
  * the 60-bit hash of the `win`-char window starting there.
  *
  * Value-identical to the DuckDB composition
  * `generate_series` position explode + `('0x'||substring(md5(...)))`
  * casts (see d19's oracle), but runs as one tight per-row loop — the
  * array-expression form would interpret two lambdas per character.
  * Expected fingerprint density is 1/m per character, so the exploded
  * relation downstream is ~len/m rows per document, not len.
  *
  * Scale note: the per-position md5 anchor probe is the portability
  * price (md5 is the one hash both engines compute identically); a
  * production deployment swaps in a Karp-Rabin/Buzhash ROLLING anchor
  * probe — O(1) per position instead of O(k) — with the identical plan
  * shape, since the anchor predicate is local to this expression.
  */
case class SubstringFp(child: Expression, k: Int, win: Int, mod: Int)
    extends UnaryExpression with CodegenFallback {

  require(k <= win, s"anchor gram k=$k must fit in the window win=$win")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // plan objects are shared across local-mode task threads and
  // MessageDigest is not thread-safe
  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def digest(s: String): Array[Byte] =
    md5.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** First 8 md5 hex chars as unsigned int (== Portable.h32). */
  private def h32(s: String): Long = {
    val d = digest(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 15 md5 hex chars, sign-safe in int64 (== Portable.h60). */
  private def h60(s: String): Long = {
    val d = digest(s)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    var p = 0
    val last = text.length - win
    while (p <= last) {
      if (h32(text.substring(p, p + k)) % mod == 0) {
        val f = h60(text.substring(p, p + win))
        if (seen.add(f)) out += f
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): SubstringFp =
    copy(child = newChild)
}

object SubstringFp {
  def fingerprints(text: Column, k: Int = 8, win: Int = 40,
      mod: Int = 32): Column =
    GraftShim.column(SubstringFp(GraftShim.expression(text), k, win, mod))
}
