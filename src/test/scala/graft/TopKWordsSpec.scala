package graft

import graft.functions.TopKWords
import org.apache.spark.sql.functions._

class TopKWordsSpec extends SparkTestBase {

  import spark.implicits._

  lazy val words = Tables.documents(spark, sf0001)
    .select(explode(split(col("text"), " ")).as("w"))
    .as[String]

  test("space-saving with capacity >= vocabulary is exact") {
    val exact = words.groupBy("w").count()
      .orderBy(desc("count"), col("w")).as[(String, Long)]
      .collect().take(5).toSeq
    val sketch = words
      .select(udaf(new TopKWords(capacity = 1000, k = 5)).apply(col("w")).as("top"))
      .as[Seq[(String, Long)]].head
    assert(sketch === exact)
  }

  test("space-saving with tight capacity surfaces genuinely heavy items") {
    // skewed stream: one item dominates (heavy-hitter guarantees need
    // skew — on uniform data no small sketch can identify a top item)
    val skewed = (Seq.fill(500)("whale") ++
      (1 to 40).flatMap(i => Seq.fill(10)(s"minnow$i"))).toDS()
    val sketch = skewed
      .select(udaf(new TopKWords(capacity = 8, k = 3)).apply(col("value")).as("top"))
      .as[Seq[(String, Long)]].head
    assert(sketch.head._1 === "whale")
    assert(math.abs(sketch.head._2 - 500L) <= 100L,
      s"heavy count estimate too far off: ${sketch.head}")
  }

  test("per-group typed aggregation: top words per language") {
    val agg = new TopKWords(capacity = 1000, k = 3)
    val perLang = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("top"))
    val m = perLang.collect().toMap
    assert(m.size === 5)
    assert(m.values.forall(_.size === 3))
  }
}
