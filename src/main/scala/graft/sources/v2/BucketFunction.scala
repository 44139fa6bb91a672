package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** The V2 `bucket` function backing storage-partitioned joins on
  * bucketed snapshot tables.
  *
  * Spark resolves a scan's reported `bucket(n, col)` transform against
  * the table's FunctionCatalog and compares both join sides by the
  * BOUND function's `canonicalName` + arguments — two snapshot tables
  * bucketed with the same (n) are recognized as co-partitioned and the
  * equi-join on their bucket columns plans with ZERO exchanges.
  *
  * `produceResult` must agree EXACTLY with the writer's row router
  * (`Snapshots.commitBucketed` uses Spark's `hash()` — Murmur3 with
  * seed 42 — then `pmod`): Spark may evaluate it when shuffling a
  * non-bucketed side to match (`spark.sql.sources.v2.bucketing
  * .shuffle.enabled`), and a divergent result would co-locate the
  * wrong rows. NULL keys hash to the seed itself, exactly like
  * Catalyst's `hash(NULL)`.
  *
  * Bound for BIGINT keys only — the murmur3 long-hash is
  * width-specific, and the writer requires a LongType bucket column
  * for the same reason.
  */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, key): pmod(murmur3(key), n) — the bucketed snapshot " +
      "table row router"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, key BIGINT), got $inputType")
    val Array(n, k) = inputType.fields
    require(n.dataType == IntegerType,
      s"bucket: numBuckets must be INT, got ${n.dataType}")
    require(k.dataType == LongType,
      s"bucket: key must be BIGINT, got ${k.dataType}")
    Bound
  }

  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      // Catalyst's hash() folds a NULL child by leaving the running
      // hash at the seed
      val h =
        if (input.isNullAt(1)) 42
        else Murmur3_x86_32.hashLong(input.getLong(1), 42)
      ((h % n) + n) % n
    }
  }
}
