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

  test("t5 repetition: distinct share bounded, and repeats exist in corpus") {
    val df = run("t5_repetition")
    assert(df.count() === 500)
    assert(df.filter(col("distinct_bp") <= 0 || col("distinct_bp") > 10000).count() === 0)
    // this vocab-dense corpus repeats trigrams — the signal discriminates
    assert(df.filter(col("distinct_bp") < 10000).count() > 0)
  }

  test("t6 vocab df: df bounded by corpus size, share consistent") {
    val df = run("t6_vocab_df")
    assert(df.filter(col("df") > 500 || col("df") < 1).count() === 0)
    assert(df.filter(col("doc_share_bp") =!= expr("df * 10000 div 500")).count() === 0)
  }

  test("p5 packing: per-shard streams are contiguous and pack ids match offsets") {
    val df = run("p5_sequence_packing")
    assert(df.count() === 500)
    // offsets tile each shard's stream exactly: sum of spans = max end
    val byShard = df.groupBy("shard").agg(
      sum("n_tok").as("total"),
      max(col("offset") + col("n_tok")).as("end"),
      min("offset").as("start"))
    assert(byShard.filter(col("total") =!= col("end") || col("start") =!= 0).count() === 0)
    assert(df.filter(col("pack_id") =!= expr("offset div 512")).count() === 0)
  }

  test("t13 entropy bounded by log2(distinct chars); uniform text exact") {
    val rows = run("t13_char_entropy").collect()
    assert(rows.length === Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val k = r.getLong(1); val h = r.getDouble(2)
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"doc ${r.getLong(0)}: H=$h k=$k")
    }
  }

  test("t14 LM score: known <= total, bp bounded, one doc recomputed") {
    val rows = run("t14_lm_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, nk, kbp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nk <= nb && kbp >= 0 && kbp <= 10000)
      if (nk == 0) assert(r.isNullAt(4))
      else assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000)
    }
    // recompute doc 0 against the collected LM
    val lm = run("t11_bigram_lm").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val ws = Tables.documents(spark, sf0001).filter(col("doc_id") === 0)
      .head().getAs[String]("text").split(" ")
    val bgs = ws.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
    val known = bgs.flatMap(lm.get)
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) === bgs.length && r0.getLong(2) === known.length)
    if (known.nonEmpty) assert(r0.getLong(4) === known.sum / known.length)
  }

  test("p12 curriculum: buckets 1..4 per lang, sizes differ by at most 1") {
    val rows = run("p12_curriculum", sf001).collect()
    assert(rows.length === Tables.documents(spark, sf001).count())
    val sizes = rows.groupBy(r => (r.getString(1), r.getInt(3)))
      .view.mapValues(_.length)
    sizes.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val s = sizes.filter(_._1._1 == lang).values.toSeq
      assert(s.max - s.min <= 1, s"$lang: $s")
      assert(sizes.keys.filter(_._1 == lang).map(_._2).toSeq.sorted == Seq(1, 2, 3, 4))
    }
    // best quality in bucket 1: per lang, min quality in bucket 1 >= max in bucket 4
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val b1 = rs.filter(_.getInt(3) == 1).map(_.getLong(2))
      val b4 = rs.filter(_.getInt(3) == 4).map(_.getLong(2))
      assert(b1.min >= b4.max)
    }
  }
}
