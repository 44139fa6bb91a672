package graft

import graft.streaming.JdbcUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Contract test for the JDBC upsert sink against an in-memory fake of
  * the statement interface (no database ships in this environment): pins
  * the statement text, the page-size batching, and the ON CONFLICT DO
  * NOTHING idempotence the store provides.
  */
object FakeStore {
  val rows = new java.util.concurrent.ConcurrentHashMap[String, Seq[Any]]()
  val pageSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  def clear(): Unit = { rows.clear(); pageSizes.clear() }
}

/** putIfAbsent ≡ INSERT … ON CONFLICT DO NOTHING. Serializable — created
  * per partition on executors like the real JDBC factory.
  */
case class FakeFactory(keyIdx: Int) extends JdbcUpsert.ExecutorFactory {
  override def create(columns: Seq[String]): JdbcUpsert.UpsertExecutor =
    new JdbcUpsert.UpsertExecutor {
      override def executeBatch(rows: Seq[Seq[Any]]): Unit = {
        FakeStore.pageSizes.add(rows.size)
        rows.foreach(r => FakeStore.rows.putIfAbsent(r(keyIdx).toString, r))
      }
      override def close(): Unit = ()
    }
}

class JdbcUpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("statement text matches the reference's ON CONFLICT DO NOTHING shape") {
    assert(JdbcUpsert.insertOnConflictSql("fuel_prices",
      Seq("transaction_id", "amount"), "transaction_id") ===
      "INSERT INTO fuel_prices (transaction_id, amount) VALUES (?, ?) " +
        "ON CONFLICT (transaction_id) DO NOTHING")
  }

  test("writeBatch pages rows at batchSize per partition, all rows land") {
    FakeStore.clear()
    val df = (1 to 25).map(i => (s"k$i", i.toDouble)).toDF("k", "v").repartition(1)
    JdbcUpsert.writeBatch(df, FakeFactory(0), batchSize = 10)
    val pages = FakeStore.pageSizes.toArray(Array.empty[Integer]).map(_.toInt)
    assert(pages.sum === 25)
    assert(pages.max <= 10, s"page exceeded batchSize: ${pages.toSeq}")
    assert(FakeStore.rows.size === 25)
  }

  test("streaming sink: in-batch dedup + store-side conflict drop = first write wins") {
    FakeStore.clear()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = JdbcUpsert.sink(input.toDF().toDF("transaction_id", "amount"),
      "transaction_id", FakeFactory(0), tmp("jdbc_ck"), batchSize = 2)
    try {
      input.addData(("t1", 1.0), ("t2", 2.0), ("t1", 1.0)) // in-batch dup
      q.processAllAvailable()
      input.addData(("t2", 99.0), ("t3", 3.0)) // t2 conflicts with store
      q.processAllAvailable()
      assert(FakeStore.rows.size === 3)
      assert(FakeStore.rows.get("t2")(1) === 2.0) // first write won
    } finally q.stop()
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString
}
