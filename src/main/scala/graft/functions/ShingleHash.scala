package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes as one native expression:
  * split on spaces → n-gram shingles (whole text when shorter than n) →
  * first-occurrence dedupe → md5 → first 8 hex chars as int64.
  *
  * Value-identical to the composable form
  * `transform(Portable.shingles(text, n), h32)` and to the DuckDB oracle
  * (`Portable.shinglesSql` + the '0x'||substring(md5) cast), but runs as
  * a single tight loop — the HOF chain interprets a lambda per shingle
  * and dominated the dedup-family runtime. The shingle walk and hash
  * arithmetic live in [[Md5Hash]], shared with MinHashSig/SimHash60/
  * SubstringFp/BloomAgg so the six stay bit-identical by construction.
  */
case class ShingleHash32(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    Md5Hash.foreachDistinctShingle(text, n)(sh => out += Md5Hash.h32(sh))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32 =
    copy(child = newChild)
}

/** 60-bit variant of [[ShingleHash32]]: first 15 md5 hex chars as int64
  * (sign-safe), value-identical to
  * `transform(Portable.shingles(text, n), h60)` and the oracle's
  * `('0x' || substring(md5(g), 1, 15))::BIGINT`. Used where downstream
  * joins need the wider key (5-gram decontamination, boilerplate df) —
  * at corpus scale 32 bits collide on n-grams, 60 bits do not.
  */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    Md5Hash.foreachDistinctShingle(text, n)(sh => out += Md5Hash.h60(sh))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

/** The K MinHash signature values in one row-level pass: shingle hashes
  * (exactly ShingleHash32's loop) folded directly into the K running
  * minima of `(2i+1)·h + 104729·i mod P` — no explode, no aggregation,
  * no shuffle. Value-identical to
  * `explode(shingleHashes(text)) → groupBy(doc).agg(min(perm_i(x)))`
  * (the shape d3 used through round 1) and to the DuckDB oracle's
  * list_transform/list_min composition; turns the signature build into
  * an embarrassingly parallel projection.
  */
case class MinHashSig(child: Expression, n: Int, k: Int, p: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val mins = Array.fill(k)(Long.MaxValue)
    Md5Hash.foreachDistinctShingle(text, n) { sh =>
      val h = Md5Hash.h32(sh)
      var i = 1
      while (i <= k) {
        val v = ((2L * i + 1) * h + 104729L * i) % p
        if (v < mins(i - 1)) mins(i - 1) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object ShingleHash {
  def shingleHashes(text: Column, n: Int = 3): Column =
    GraftShim.column(ShingleHash32(GraftShim.expression(text), n))

  def shingleHashes60(text: Column, n: Int = 3): Column =
    GraftShim.column(ShingleHash60(GraftShim.expression(text), n))

  def minHashSig(text: Column, n: Int = 3, k: Int = 16,
      p: Long = Portable.MinHashP): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(text), n, k, p))
}
