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

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(i: Int, _) => i
    case Literal(l: Long, _) if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
    case Literal(l: Long, _) => throw new IllegalArgumentException(
      s"$what out of int range: $l")
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** args(i) as an int literal, or `default` when the call omitted it. */
  private def intArg(args: Seq[Expression], i: Int, default: Int,
      what: String): Int =
    if (args.length > i) litInt(args(i), what) else default

  private def stringArg(args: Seq[Expression], i: Int, default: String,
      what: String): String =
    if (args.length > i) litString(args(i), what) else default

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
    },
    fn("graft_shingle_hashes60",
      "graft_shingle_hashes60(text[, n]) - distinct n-token (default 3) " +
        "shingle h60 hashes (the d19/substring-dedup fingerprint basis)") {
      args => ShingleHash60(args(0), intArg(args, 1, 3, "shingle n"))
    },
    fn("graft_substring_fps",
      "graft_substring_fps(text[, k, win, mod]) - winnowed substring " +
        "fingerprints: h60 of each win-char window whose k-char anchor " +
        "hash is 0 mod `mod` (defaults 8, 40, 32)") {
      args => SubstringFp(args(0), intArg(args, 1, 8, "anchor k"),
        intArg(args, 2, 40, "window"), intArg(args, 3, 32, "mod"))
    },
    fn("graft_bloom_build",
      "graft_bloom_build(key[, words, hashes, salt]) - aggregate a " +
        "words*64-bit Bloom filter (array<bigint>) over a string key; " +
        "bit-reproducible across engines (md5 positions). Defaults 16, 3, " +
        "'bloom'") {
      // a bare AggregateFunction: the analyzer wraps it in
      // AggregateExpression(Complete) exactly as for built-in aggregates
      args => BloomAgg(args(0), intArg(args, 1, 16, "words"),
        intArg(args, 2, 3, "hashes"), stringArg(args, 3, "bloom", "salt"))
    },
    fn("graft_bloom_probe",
      "graft_bloom_probe(bf, key[, words, hashes, salt]) - membership " +
        "probe against a graft_bloom_build filter; true iff every hash " +
        "position's bit is set. Parameters must match the build's") {
      args => BloomAgg.probeExpr(args(0), args(1),
        intArg(args, 2, 16, "words"), intArg(args, 3, 3, "hashes"),
        stringArg(args, 4, "bloom", "salt"))
    })

  /** Post-construction registration (idempotent — replaces on re-run). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    // The typed Aggregator rung goes through the udaf bridge (a
    // ScalaAggregator needs its input encoder, which the
    // expression-builder path above cannot carry). Space-saving top-k:
    // capacity 1000 counters, report 10 — exact when distinct ≤
    // capacity, bounded-error beyond.
    spark.udf.register("graft_topk_words",
      org.apache.spark.sql.functions.udaf(
        new TopKWords(capacity = 1000, k = 10),
        org.apache.spark.sql.Encoders.STRING))
    // NOT registered, by design: SrpBandCodes (its hyperplane weights
    // are a runtime-derived double matrix — no sane SQL-literal form;
    // DataFrame-only via SrpCodes.srp_band_codes).
  }
}
