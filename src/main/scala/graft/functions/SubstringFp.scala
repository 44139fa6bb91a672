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

  require(k > 0 && win > 0 && mod > 0,
    s"anchor k=$k, window win=$win, mod=$mod must all be positive")
  require(k <= win, s"anchor gram k=$k must fit in the window win=$win")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    var p = 0
    val last = text.length - win
    while (p <= last) {
      if (Md5Hash.h32(text.substring(p, p + k)) % mod == 0) {
        val f = Md5Hash.h60(text.substring(p, p + win))
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
