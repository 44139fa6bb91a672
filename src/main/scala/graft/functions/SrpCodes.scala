package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All sign-random-projection band codes of a vector in ONE native pass.
  *
  * The composed form — `bands × planes` separate `vec_dot(v, lit(w))`
  * expressions summed with when/otherwise — expands to 160 inlined loops
  * in a single generated method once DotProduct gained real codegen;
  * past the JIT's huge-method limit the whole projection runs in the
  * bytecode interpreter (observed: s2's code build doubled). This
  * expression is the MinHashSig treatment for SRP: the plane matrix
  * rides along as a literal, the row pass is one compiled nested loop,
  * and CodegenFallback costs a single call per row.
  *
  * Bit semantics are identical to the composed form (and the DuckDB
  * oracle): bit r of band j is set iff dot(v, w[j*planesPerBand+r]) > 0
  * with the same left-to-right summation fold.
  */
case class SrpBandCodes(child: Expression, weights: Seq[Seq[Double]],
    planesPerBand: Int) extends UnaryExpression with CodegenFallback {

  require(planesPerBand > 0 && weights.length % planesPerBand == 0,
    s"weights.length=${weights.length} must be a positive multiple of " +
      s"planesPerBand=$planesPerBand — a remainder would silently drop " +
      "trailing hyperplanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_band_codes expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val w: Array[Array[Double]] =
    weights.map(_.toArray).toArray
  @transient private lazy val nBands: Int = w.length / planesPerBand

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](nBands)
    var j = 0
    while (j < nBands) {
      var code = 0L
      var r = 0
      while (r < planesPerBand) {
        val plane = w(j * planesPerBand + r)
        val m = math.min(n, plane.length)
        var s = 0.0
        var i = 0
        while (i < m) { s += v.getDouble(i) * plane(i); i += 1 }
        if (s > 0) code |= (1L << r)
        r += 1
      }
      out(j) = code
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandCodes =
    copy(child = newChild)
}

object SrpCodes {
  /** Band codes for `v` against `weights` (bands × planesPerBand rows). */
  def srp_band_codes(v: Column, weights: Array[Array[Double]],
      planesPerBand: Int): Column =
    GraftShim.column(SrpBandCodes(GraftShim.expression(v),
      weights.map(_.toSeq).toSeq, planesPerBand))
}
