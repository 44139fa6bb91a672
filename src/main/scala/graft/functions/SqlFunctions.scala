package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** The native graft expressions surfaced as SQL functions, so
  * `spark.sql` users get the same codegen'd operators the DataFrame
  * layer uses. One list, two registration paths: builder-owned sessions
  * via `GraftPlannerExtensions` (injectFunction), driver-owned sessions
  * via `Sessions.tune` (sessionState.functionRegistry).
  */
object SqlFunctions {

  private def fn(name: String, usage: String)(b: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (args: Seq[Expression]) => b(args))

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_vec_dot",
      "graft_vec_dot(a, b) - codegen'd double-array dot product") {
      args => DotProduct(args(0), args(1))
    },
    fn("graft_simhash60",
      "graft_simhash60(text) - 60-bit SimHash signature") {
      args => SimHash60(args(0))
    },
    fn("graft_shingle_hashes",
      "graft_shingle_hashes(text) - distinct 3-token shingle h32 hashes") {
      args => ShingleHash32(args(0), 3)
    },
    fn("graft_minhash_sig",
      "graft_minhash_sig(text) - 16-permutation MinHash signature") {
      args => MinHashSig(args(0), 3, 16, Portable.MinHashP)
    },
    fn("graft_zorder2",
      "graft_zorder2(x, y) - 32-bit Morton interleave of two 16-bit dims") {
      args => ZOrder.zorder2Expr(args(0), args(1))
    },
    fn("graft_from_avro",
      "graft_from_avro(bytes, 'schemaJson') - decode Avro binary to struct") {
      args => FromAvro(args(0), litString(args(1), "avro schema"))
    },
    fn("graft_to_avro",
      "graft_to_avro(struct, 'schemaJson') - encode struct to Avro binary") {
      args => ToAvro(args(0), litString(args(1), "avro schema"))
    },
    fn("graft_from_avro_safe",
      "graft_from_avro_safe(bytes, 'schemaJson') - decode-or-quarantine: " +
        "struct(data, _error), corrupt bytes yield a reason, never a failure") {
      args => FromAvroSafe(args(0), litString(args(1), "avro schema"))
    })

  /** Post-construction registration (idempotent — replaces on re-run). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, b)
  }
}
