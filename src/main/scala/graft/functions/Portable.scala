package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives shared by the dedup /
  * similarity / text-analysis operators and their DuckDB oracles.
  *
  * All hashes derive from md5 hex (identical in every engine) rather than
  * engine-native hash functions (Spark's xxhash64 and DuckDB's hash()
  * disagree). Arithmetic stays in signed-64 range so `%` behaves the same
  * in both engines (all operands positive).
  */
object Portable {

  /** Prime just above 2^32 — modulus for the MinHash permutation family. */
  val MinHashP: Long = 4294967311L

  /** 32-bit portable hash: first 8 md5 hex chars as unsigned int. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit portable hash: first 15 md5 hex chars (sign-safe in int64). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace as an EXPLICIT char class — Java regex `\\s` includes
    * U+000B (vertical tab) while DuckDB's RE2 `\\s` does not, so any
    * portable fingerprint built on `\\s` diverges on VT-bearing text.
    * The escape sequences here parse identically in Java and RE2, so
    * the SAME string serves both the Spark side and (interpolated) the
    * oracle SQL.
    */
  val WsRegex: String = "[ \\t\\n\\x0B\\f\\r]+"

  /** Distinct word n-gram shingles; docs shorter than n collapse to the
    * whole text as one shingle (oracle SQL mirrors the same guard).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    // built from the passed Column (an `expr` form would hardcode a
    // column literally named `text` and silently read the wrong column
    // on frames that have one)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n))))))
      .otherwise(array(text))
  }

  /** The same shingle definition as DuckDB SQL (text column `text`). */
  def shinglesSql(n: Int = 3): String =
    s"""CASE WHEN len(string_split(text, ' ')) >= $n
       |  THEN list_distinct(list_transform(
       |    generate_series(1, len(string_split(text, ' ')) - ${n - 1}),
       |    i -> array_to_string(string_split(text, ' ')[i:i+${n - 1}], ' ')))
       |  ELSE [text] END""".stripMargin
}
