package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** VariantType ingestion (round-10 verdict #6): the open-schema JSON
  * column — parse once, extract typed paths from the binary encoding,
  * quarantine malformed rows row-granularly — and its round trip
  * through the snapshot format's parquet files.
  */
class VariantSpec extends SparkTestBase {

  import spark.implicits._

  test("heterogeneous payloads parse to ONE variant column; typed paths extract per shape") {
    val df = Seq(
      """{"a": 1, "nest": {"x": [10, 20, 30]}}""",
      """{"a": "two", "extra": true}""",
      """[1, 2, 3]""",
      """"bare string"""",
      """{"a": 9, "nest": {"x": []}}""").toDF("payload")
      .select(expr("parse_json(payload)").as("v"))
    assert(df.schema("v").dataType ===
      org.apache.spark.sql.types.VariantType)
    val got = df.select(
      expr("try_variant_get(v, '$.a', 'bigint')").as("a_long"),
      expr("variant_get(v, '$.nest.x[1]', 'bigint')").as("x1"),
      expr("variant_get(v, '$[0]', 'bigint')").as("arr0"),
      expr("schema_of_variant(v)").as("shape"))
      .collect()
    assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 20L)
    // '$.a' holds a STRING on row 2 — try_variant_get's typed read is
    // NULL (variant_get would refuse the cast loudly); the string-typed
    // path still serves it
    assert(got(1).isNullAt(0))
    assert(df.select(expr("variant_get(v, '$.a', 'string')"))
      .collect()(1).getString(0) === "two")
    assert(got(2).getLong(2) === 1L) // top-level array indexes
    assert(got(3).isNullAt(0) && got(3).isNullAt(1) && got(3).isNullAt(2))
    assert(got(4).isNullAt(1)) // empty array: index out of range = NULL
    // per-row shape is observable (the open-schema property)
    assert(got.map(_.getString(3)).distinct.length === 5)
  }

  test("quarantine contract: try_parse_json is row-granular NULL, parse_json is loud") {
    val mixed = Seq("""{"k": 1}""", """{"k": """, "not json").toDF("s")
    val tried = mixed.select(expr("try_parse_json(s)").as("v"))
    assert(tried.filter(col("v").isNull).count() === 2)
    assert(tried.filter(col("v").isNotNull).count() === 1)
    intercept[Exception] {
      mixed.select(expr("parse_json(s)").as("v")).collect()
    }
  }

  test("variant columns round-trip through snapshot-table parquet (write, read, DML carry)") {
    val t = java.nio.file.Files.createTempDirectory("varsnap").toString + "/t"
    val df = spark.range(1, 21)
      .select(col("id"),
        expr("""parse_json(concat('{"tag":"t', id % 3, '","deep":{"v":', id * 100, '}}'))""").as("doc"))
    Snapshots.commit(df, t)
    val back = Snapshots.read(spark, t)
    assert(back.schema("doc").dataType ===
      org.apache.spark.sql.types.VariantType)
    // extraction over the parquet-round-tripped binary
    val s1 = back.select(expr("variant_get(doc, '$.deep.v', 'bigint')").as("x"))
      .agg(sum("x")).head.getLong(0)
    assert(s1 === (1L to 20L).map(_ * 100).sum)
    // appends keep the variant column; COW delete rewrites carry it
    Snapshots.commit(spark.range(21, 26).select(col("id"),
      expr("""parse_json(concat('{"tag":"new","deep":{"v":', id * 100, '}}'))""").as("doc")), t)
    Snapshots.deleteWhere(spark, t, col("id") % 2 === 0)
    val after = Snapshots.read(spark, t)
    assert(after.count() === 13L)
    val tags = after.select(expr("variant_get(doc, '$.tag', 'string')").as("g"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags("new") === 3L) // 21..25 odd: 21, 23, 25
    assert(after.filter(expr("variant_get(doc, '$.deep.v', 'bigint') = 2100")).count() === 1L)
  }
}
