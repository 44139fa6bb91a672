package graft

import graft.sources.Snapshots
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Snapshot-table contract: atomic manifest publish, snapshot-isolated
  * reads, time travel, append vs overwrite, and the optimistic version
  * race (the rename lock).
  */
class SnapshotsSpec extends SparkTestBase {

  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("snap").resolve("t").toString

  test("append commits accumulate; overwrite replaces; time travel reads both") {
    val t = tbl()
    val v1 = Snapshots.commit((1 to 10).toDF("x"), t)
    val v2 = Snapshots.commit((11 to 15).toDF("x"), t)
    assert(v1 === 1L && v2 === 2L)
    assert(Snapshots.read(spark, t).count() === 15)
    assert(Snapshots.read(spark, t, asOf = Some(1L)).count() === 10)
    val v3 = Snapshots.commit((100 to 101).toDF("x"), t, overwrite = true)
    assert(v3 === 3L)
    assert(Snapshots.read(spark, t).select(sum("x")).head().getLong(0) === 201L)
    // earlier snapshots still intact after the overwrite
    assert(Snapshots.read(spark, t, asOf = Some(2L)).count() === 15)
    assert(Snapshots.versions(spark, t) === Seq(1L, 2L, 3L))
  }

  test("a pinned reader never sees a commit that lands after planning") {
    val t = tbl()
    Snapshots.commit((1 to 10).toDF("x"), t)
    val pinned = Snapshots.read(spark, t) // plan-time file set
    Snapshots.commit((11 to 20).toDF("x"), t)
    assert(pinned.count() === 10)
    assert(Snapshots.read(spark, t).count() === 20)
  }

  test("losing the version race retries onto the next version, no row loss") {
    val t = tbl()
    Snapshots.commit((1 to 5).toDF("x"), t)
    // occupy version 2 the way a racing winner would: publish a valid
    // manifest carrying v1's files (rename-onto-existing must then fail
    // for our writer, forcing the retry path to v3)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1Files = scala.io.Source.fromInputStream(
      fs.open(new org.apache.hadoop.fs.Path(s"$t/manifest-v1.json")), "UTF-8")
      .mkString
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$t/manifest-v2.json"), false)
    out.write(("v2" + v1Files.dropWhile(_ != '\n')).getBytes("UTF-8")); out.close()
    val v = Snapshots.commit((6 to 9).toDF("x"), t)
    assert(v === 3L)
    assert(Snapshots.read(spark, t).count() === 9)
    assert(Snapshots.read(spark, t, asOf = Some(2L)).count() === 5)
  }

  test("parquet pushdown survives the manifest indirection") {
    val t = tbl()
    Snapshots.commit((1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s"), t)
    val df = Snapshots.read(spark, t).filter(col("id") === 7L)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"), scan)
    assert(df.count() === 1)
  }
}
