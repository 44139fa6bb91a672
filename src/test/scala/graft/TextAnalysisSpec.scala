package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  test("t1 token counts: regex tokens >= whitespace tokens") {
    val df = run("t1_token_count")
    assert(df.count() === 20)
    assert(df.filter(col("re_tokens") < col("ws_tokens")).count() === 0)
  }

  test("t2 quality_bp bounded in [0, 10000]") {
    val df = run("t2_quality_score")
    assert(df.count() === 500)
    assert(df.filter(col("quality_bp") < 0 || col("quality_bp") > 10000).count() === 0)
  }

  test("t3 lang-id: marker_bp consistent with prediction threshold") {
    val df = run("t3_lang_id")
    assert(df.filter(col("predicted") === "en" && col("marker_bp") < 500).count() === 0)
  }

  test("t4 fingerprint: md5 fp unique for distinct texts, stable across runs") {
    val a = run("t4_fingerprint")
    assert(a.select("fp_md5").distinct().count() === 500)
    val b = run("t4_fingerprint")
    assert(a.exceptAll(b).count() === 0)
  }
}
