package graft.functions

import org.apache.spark.sql.{catalyst, Column}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve over two 16-bit dimensions — the multi-column
  * clustering key behind OPTIMIZE ZORDER-style data layout: sorting by
  * the interleaved value co-locates rows that are close in BOTH
  * dimensions, so min/max file statistics prune scans on either column
  * (a single-column sort only ever prunes its own column).
  *
  * The interleave is the classic mask-spread: each step doubles the gap
  * between payload bits (via `| (x << k)` then masking), four steps take
  * 16 contiguous bits to every-other-bit; the two spread words OR
  * together offset by one. Implemented with multiply-by-2^k instead of a
  * shift operator so the identical textual formula runs in Spark SQL and
  * the DuckDB oracle.
  */
object ZOrder {

  /** (shift, mask) per spread step; masks in decimal for SQL parity:
    * 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555.
    */
  val steps: Seq[(Int, Long)] = Seq(
    (8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))

  /** Spread the low 16 bits of `c` to even bit positions of a 32-bit word. */
  def spread16(c: Column): Column =
    steps.foldLeft(c.bitwiseAND(lit(65535L))) { case (acc, (sh, m)) =>
      acc.bitwiseOR(acc * lit(1L << sh)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code: x in even bits, y in odd bits. */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(spread16(y) * lit(2L))

  /** The same formula as a raw catalyst tree — the SQL-function builder
    * path (Column-built trees reach the registry unresolved in Spark 4).
    */
  def zorder2Expr(x: catalyst.expressions.Expression,
      y: catalyst.expressions.Expression): catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    def spread(c: Expression): Expression =
      steps.foldLeft[Expression](BitwiseAnd(Cast(c, LongType), Literal(65535L))) {
        case (acc, (sh, m)) =>
          BitwiseAnd(BitwiseOr(acc, Multiply(acc, Literal(1L << sh))), Literal(m))
      }
    BitwiseOr(spread(x), Multiply(spread(y), Literal(2L)))
  }

  /** The same computation as oracle SQL text (DuckDB dialect = the same
    * `& | *` operators), as a chain of CTE steps over columns x and y.
    */
  def zorderSqlCtes(from: String): String = {
    val spreadSteps = steps.zipWithIndex.map { case ((sh, m), i) =>
      val prev = if (i == 0) "s0" else s"s$i"
      s"s${i + 1} AS (SELECT (((xs | (xs * ${1L << sh})) & $m)) AS xs, " +
        s"(((ys | (ys * ${1L << sh})) & $m)) AS ys FROM $prev)"
    }.mkString(",\n")
    s"""s0 AS (SELECT x & 65535 AS xs, y & 65535 AS ys FROM $from),
       |$spreadSteps,
       |zz AS (SELECT (xs | (ys * 2)) AS z FROM s${steps.length})""".stripMargin
  }

  /** Reference implementation for specs: plain-Scala bit interleave. */
  def zorderRef(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }
}
