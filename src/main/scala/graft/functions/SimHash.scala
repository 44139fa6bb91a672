package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash over distinct whitespace tokens as one native
  * expression: token → 60-bit md5-derived hash → per-bit ±1 votes →
  * sign bits. Value-identical to the HOF/`aggregate` formulation and the
  * DuckDB oracle (first 15 md5 hex chars as int64, bits 0..59), but runs
  * as a tight loop (the interpreted form evaluates 60×|tokens| lambdas
  * per row).
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (seen.add(w)) {
        val h = Md5Hash.h60(w)
        var bit = 0
        while (bit < 60) {
          if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash {
  def simhash60(text: Column): Column =
    GraftShim.column(SimHash60(GraftShim.expression(text)))
}
