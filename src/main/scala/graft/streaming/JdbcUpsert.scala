package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** The real JDBC upsert sink path (SURVEY S21): foreachBatch executing
  * batched `INSERT … ON CONFLICT (key) DO NOTHING` statements, the exact
  * shape of the reference's Postgres loader
  * (lab05-airflow/dags/fuel_ingest_dag.py:169-182 — `execute_values` with
  * `page_size=1000` ↔ JDBC `addBatch`/`executeBatch` pages of
  * `batchSize`).
  *
  * The statement layer is a trait so the identical sink logic runs
  * against a real `java.sql` connection in production and against an
  * in-memory fake in tests (no database ships in this environment — the
  * contract test pins the semantics: batching page size, per-partition
  * connections, conflict-drop idempotence).
  */
object JdbcUpsert {

  /** One batched upsert page executor. Implementations must be
    * creatable on executors (the factory is shipped into
    * foreachPartition), so they hold no driver-side resources.
    */
  trait UpsertExecutor {
    /** Execute one page of rows as a single batched statement. */
    def executeBatch(rows: Seq[Seq[Any]]): Unit
    def close(): Unit
  }

  /** Executor factory, serialized into each partition task. */
  trait ExecutorFactory extends Serializable {
    def create(columns: Seq[String]): UpsertExecutor
  }

  /** Identifiers are interpolated into statement text, so they must be
    * plain SQL names — anything else (quotes, spaces, semicolons) would
    * break the statement or smuggle SQL in. `table` additionally allows
    * one schema qualifier dot.
    */
  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r
  private def checkIdent(kind: String, s: String): String = {
    val parts = if (kind == "table") s.split('.').toSeq else Seq(s)
    require(parts.nonEmpty && parts.forall(Ident.matches),
      s"unsafe $kind identifier for SQL interpolation: '$s'")
    s
  }

  /** The statement text the real path prepares — kept as a pure function
    * so tests can pin it without a database.
    */
  def insertOnConflictSql(table: String, columns: Seq[String], key: String): String =
    s"INSERT INTO ${checkIdent("table", table)} " +
      s"(${columns.map(checkIdent("column", _)).mkString(", ")}) VALUES " +
      s"(${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${checkIdent("key", key)}) DO NOTHING"

  /** Real java.sql-backed factory. Compiles against the JDK's java.sql;
    * needs the target database's driver jar on the executor classpath at
    * runtime (none ships in this environment — contract-tested via the
    * in-memory fake instead).
    */
  final case class JdbcExecutorFactory(url: String, table: String, key: String,
      props: Map[String, String] = Map.empty) extends ExecutorFactory {
    override def create(columns: Seq[String]): UpsertExecutor = new UpsertExecutor {
      private val conn = {
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        java.sql.DriverManager.getConnection(url, p)
      }
      private val stmt =
        conn.prepareStatement(insertOnConflictSql(table, columns, key))
      override def executeBatch(rows: Seq[Seq[Any]]): Unit = {
        rows.foreach { r =>
          r.zipWithIndex.foreach { case (v, i) => stmt.setObject(i + 1, v) }
          stmt.addBatch()
        }
        stmt.executeBatch()
      }
      override def close(): Unit = {
        stmt.close()
        conn.close()
      }
    }
  }

  /** Write one micro-batch through the executor in pages of `batchSize`
    * rows — one connection per partition, created on the executor (no
    * driver collect; the batch streams partition-parallel into the
    * store). Exposed for foreachBatch composition and direct batch use.
    */
  def writeBatch(batch: DataFrame, factory: ExecutorFactory,
      batchSize: Int = 1000): Unit = {
    val columns = batch.columns.toSeq
    batch.foreachPartition { rows: Iterator[Row] =>
      val ex = factory.create(columns)
      try rows.grouped(batchSize).foreach { page =>
        ex.executeBatch(page.map(_.toSeq).toSeq)
      }
      finally ex.close()
    }
  }

  /** S21: the streaming JDBC upsert sink — per micro-batch, dedup within
    * the batch on the key (the store's ON CONFLICT handles cross-batch
    * conflicts), then page batched inserts per partition.
    */
  def sink(df: DataFrame, key: String, factory: ExecutorFactory,
      checkpointDir: String, batchSize: Int = 1000): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeBatch(batch.dropDuplicates(key), factory, batchSize)
      }
      .start()
}
