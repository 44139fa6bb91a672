package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * Brute-force cosine top-k is the correctness baseline (broadcast the
  * small query side, expression-level dot products inside codegen, rank
  * with a window). The LSH-bucketed variant is the scale path: candidate
  * generation touches only same-bucket rows, so the quadratic term drops
  * to bucket-local work — at 100 TB the bucket join shuffles on a short
  * integer key instead of materializing the cross product.
  */
object Similarity {

  /** embedding as double[] — float math differs between engines; double
    * arithmetic with a fixed fold order is bit-reproducible.
    */
  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private val cosineSql =
    "list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)))"

  /** Brute-force cosine top-5 neighbors for query vectors vec_id < 10. */
  val sKnn: QuerySpec = QuerySpec.sql(
    "s1_knn_cosine",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
       |         ${cosineSql.format("q.qv", "e.v", "q.qv", "q.qv", "e.v", "e.v")} AS c
       |  FROM q JOIN e ON e.vec_id <> q.qid
       |), ranked AS (
       |  SELECT query_id, neighbor_id,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY ROUND(c, 6) DESC, neighbor_id) AS rank,
       |         c
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, rank, ROUND(c, 4) AS cosine
       |FROM ranked WHERE rank <= 5""".stripMargin) { (s, dir) =>
    val e = Tables.embeddings(s, dir).select(col("vec_id"), dvec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = cosine(col("qv"), col("v"))
    val w = Window.partitionBy("query_id").orderBy(round(col("c"), 6).desc, col("neighbor_id"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"), c.as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("c"), 4).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (cos >= 0.45). The all-pairs
    * form is the verifier; at scale it runs per LSH bucket (s3).
    */
  val sNearDup: QuerySpec = QuerySpec.sql(
    "s2_cosine_neardup",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ROUND(${cosineSql.format("a.v", "b.v", "a.v", "a.v", "b.v", "b.v")}, 4) AS cosine
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${cosineSql.format("a.v", "b.v", "a.v", "a.v", "b.v", "b.v")} >= 0.45""".stripMargin) { (s, dir) =>
    val e = Tables.embeddings(s, dir).select(col("vec_id"), dvec(col("embedding")).as("v"))
    val c = cosine(col("a.v"), col("b.v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(c >= 0.45)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(c, 4).as("cosine"))
  }

  /** Sign-random-projection LSH bucketing — the ANN scale path.
    * Hyperplane weights are portable integers: w[p][i] =
    * (h32("p:i") % 2001 - 1000) / 1000, so the bucketing is deterministic
    * and engine-independent. Top-5 within bucket only (approximate —
    * rows-only correctness check; recall measured in tests against s1).
    */
  val sAnnLsh: QuerySpec = QuerySpec.rowsOnly("s3_ann_lsh") { (s, dir) =>
    val nPlanes = 8
    val e = Tables.embeddings(s, dir).select(col("vec_id"), dvec(col("embedding")).as("v"))
    // bucket = sign bits of 8 hyperplane projections
    val bucket = aggregate(
      sequence(lit(0), lit(nPlanes - 1)), lit(0L),
      (acc, p) => acc + when(
        aggregate(
          zip_with(col("v"),
            transform(sequence(lit(0), size(col("v")) - 1),
              i => (Portable.h32(concat_ws(":", p.cast("string"), i.cast("string"))) % 2001L
                - 1000L).cast("double") / 1000.0),
            (x, w) => x * w),
          lit(0.0), (a2, v2) => a2 + v2) > 0,
        pow(lit(2.0), p).cast("long")).otherwise(0L))
    val eb = e.withColumn("bucket", bucket)
    val q = eb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket").as("qb"))
    val c = cosine(col("qv"), col("v"))
    val w = Window.partitionBy("query_id").orderBy(round(col("c"), 6).desc, col("neighbor_id"))
    eb.join(broadcast(q), col("bucket") === col("qb") && col("vec_id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"), c.as("c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("c"), 4).as("cosine"))
  }

  val all: Seq[QuerySpec] = Seq(sKnn, sNearDup, sAnnLsh)
}
