package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter aggregate: a custom TypedImperativeAggregate whose
  * buffer is the bit array itself — per-partition partial filters OR-merge
  * into the final (classic map-side combine, the whole point of a Bloom
  * build at 100 TB: each executor ships `words` longs, not its keys).
  *
  * Bit positions derive from md5 (`Portable.h32` idiom), which makes the
  * filter BIT-REPRODUCIBLE across engines — the DuckDB oracle computes
  * the identical array with SQL bit_or, something impossible with
  * Spark's built-in bloom_filter_agg (whose layout is
  * implementation-defined). OR is commutative and associative, so the
  * result is independent of row order and merge topology — safe under
  * the driver's hash gate.
  *
  * The production use is the semi-join filter: build over a dimension's
  * keys, broadcast `words` longs, probe the fact scan (the explicit form
  * of the runtime bloom the optimizer injects — ScaleSpec proves that
  * path; this one is user-directed and persistable).
  */
case class BloomAgg(
    child: Expression,
    words: Int,
    hashes: Int,
    salt: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(words > 0 && hashes > 0)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  // Md5Hash.h32 == first 8 md5 hex chars parsed base-16, the exact value
  // the oracle's '0x'||substring(md5(...), 1, 8) cast computes — and it
  // reuses a thread-local digest instead of allocating one per input row.
  private def positions(key: String): Array[Int] = {
    val out = new Array[Int](hashes)
    var i = 0
    while (i < hashes) {
      out(i) = (Md5Hash.h32(s"$salt:$i:$key") % (words * 64L)).toInt
      i += 1
    }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      positions(key).foreach(p => buf(p / 64) |= 1L << (p % 64))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_build expects a string key, got $other")
    }
  }
  override def withNewMutableAggBufferOffset(n: Int): BloomAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
  override def prettyName: String = "bloom_build"
}

object BloomAgg {
  /** words×64-bit Bloom filter over a string key column. */
  def bloom_build(key: Column, words: Int = 16, hashes: Int = 3,
      salt: String = "bloom"): Column =
    GraftShim.column(
      BloomAgg(GraftShim.expression(key), words, hashes, salt)
        .toAggregateExpression())

  /** Membership probe against a built filter (array<bigint>): true iff
    * every hash position's bit is set. Same md5-derived positions as
    * the build — a codegen-friendly composition of built-in catalyst
    * expressions (raw expressions, not Columns, so the same builder
    * serves both the DataFrame API and the SQL function registry;
    * the analyzer's type coercion inserts the string→binary and
    * integer-division casts exactly as it does for the SQL forms).
    */
  def probeExpr(bf: Expression, key: Expression, words: Int = 16,
      hashes: Int = 3, salt: String = "bloom"): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, And, BitwiseAnd,
      Cast, Concat, Conv, Divide, ElementAt, EqualTo, Literal, Md5, Not,
      Pmod, ShiftLeft, Substring}
    import org.apache.spark.sql.types.{IntegerType, LongType}
    (0 until hashes).map { i =>
      val hex = Substring(Md5(Concat(Seq(Literal(s"$salt:$i:"), key))),
        Literal(1), Literal(8))
      val pos = Pmod(Cast(Conv(hex, Literal(16), Literal(10)), LongType),
        Literal(words * 64L))
      val word = ElementAt(bf,
        Add(Cast(Divide(pos, Literal(64L)), IntegerType), Literal(1)))
      val bit = ShiftLeft(Literal(1L), Cast(Pmod(pos, Literal(64L)), IntegerType))
      Not(EqualTo(BitwiseAnd(word, bit), Literal(0L))): Expression
    }.reduce(And(_, _))
  }

  def bloom_probe(bf: Column, key: Column, words: Int = 16,
      hashes: Int = 3, salt: String = "bloom"): Column =
    GraftShim.column(probeExpr(GraftShim.expression(bf),
      GraftShim.expression(key), words, hashes, salt))
}
