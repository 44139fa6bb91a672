package graft

import org.apache.spark.sql.functions._

class AnnClusterSpec extends SparkTestBase {

  test("s4 IVF ANN agrees with brute force on scores and gets nonzero recall") {
    val ivf = run("s4_ann_ivf")
    val brute = run("s1_knn_cosine")
      .withColumnRenamed("cosine", "bcos").withColumnRenamed("rank", "brank")
    assert(ivf.count() > 0)
    // scores for shared (query, neighbor) pairs must match exactly
    val joined = ivf.join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("cosine") =!= col("bcos")).count() === 0)
    // recall@5 of a single-probe IVF on random vectors is modest but
    // must be well above zero
    val recall = joined.count().toDouble / brute.count()
    assert(recall > 0.1, s"recall@5 = $recall")
  }

  test("s5 int8 quantization bounded and deterministic") {
    val q = run("s5_quantize_int8")
    assert(q.count() === 500)
    assert(q.filter(col("qmax") > 127 || col("qmax") < -127).count() === 0)
    assert(q.exceptAll(run("s5_quantize_int8")).count() === 0)
  }

  test("d5 clusters: every d3 candidate pair lands in one cluster") {
    val clusters = run("d5_dedup_clusters")
    val pairs = run("d3_minhash_lsh").select("doc_a", "doc_b")
    val ca = clusters.withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("cluster_id", "cl_a")
    val cb = clusters.withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("cluster_id", "cl_b")
    val mismatched = pairs.join(ca, "doc_a").join(cb, "doc_b")
      .filter(col("cl_a") =!= col("cl_b")).count()
    assert(mismatched === 0)
    // cluster label is the minimum member id
    val badLabel = clusters.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count()
    assert(badLabel === 0)
  }
}
