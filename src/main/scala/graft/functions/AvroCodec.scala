package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** from_avro / to_avro as custom Catalyst expressions over the bundled
  * avro-core 1.12 (the spark-avro module is not on the classpath — SURVEY
  * §2.11/U2). Mirrors the behavior the reference uses in
  * lab06-avro-streaming/spark_kafka_foreachbatch.py:51-66 (`from_avro(
  * col("value"), schema_json)` then `select("data.*")`).
  *
  * Supported Avro types: boolean/int/long/float/double/string/bytes,
  * records (nested), arrays, and nullable unions ["null", T]. Schemaless
  * binary encoding (no container header), matching fastavro's
  * schemaless_writer used by the reference producer
  * (lab06-avro-streaming/async_data_gen.py:72-76).
  */
/** JVM-wide Avro decode-length limits. Schemaless binary Avro carries
  * length prefixes for string/bytes/array values, and the stock decoder
  * allocates the buffer BEFORE discovering the stream is truncated — so
  * a hostile record encoding a multi-GB length raises OutOfMemoryError,
  * a fatal error that escapes the `NonFatal` quarantine catch ("one
  * poisoned Kafka record must not kill the job"). Avro 1.12 enforces
  * caps via `SystemLimitException`, whose static init reads the three
  * `org.apache.avro.limits.*` system properties exactly once — install
  * them BEFORE the first decode anywhere in the JVM (every graft Avro
  * seam calls [[install]] from its schema-parse initializer, which runs
  * on executors too, ahead of the first `read()`). Over-limit lengths
  * then surface as `SystemLimitException` (an `AvroRuntimeException`,
  * caught and quarantined like any other decode error).
  */
object AvroLimits {
  /** 64 MB per string/bytes value: far above any sane record field,
    * far below an allocation that threatens an executor heap.
    */
  val MaxValueBytes: Int = 64 * 1024 * 1024
  /** 16M elements per array/map: bounds downstream per-element work. */
  val MaxCollectionItems: Int = 1 << 24

  @volatile private var installed = false

  def install(): Unit = if (!installed) synchronized {
    if (!installed) {
      // property names are hardcoded (not read from
      // SystemLimitException's constants): touching that class here
      // would run its static init before the properties exist
      Seq(
        "org.apache.avro.limits.bytes.maxLength" -> MaxValueBytes,
        "org.apache.avro.limits.string.maxLength" -> MaxValueBytes,
        "org.apache.avro.limits.collectionItems.maxLength" -> MaxCollectionItems
      ).foreach { case (k, v) =>
        if (System.getProperty(k) == null) System.setProperty(k, v.toString)
      }
      installed = true
    }
  }
}

object AvroCodec {

  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   => ArrayType(sparkType(s.getElementType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.toArray.map { f0 =>
        val f = f0.asInstanceOf[Schema.Field]
        StructField(f.name(), sparkType(f.schema()), nullable = isNullable(f.schema()))
      })
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, s"only [null, T] unions supported: $s")
      sparkType(nonNull.head)
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.toArray.exists(_.asInstanceOf[Schema].getType == Schema.Type.NULL)

  private def nonNullSchema(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .find(_.getType != Schema.Type.NULL).get
    else s

  /** avro runtime value → catalyst value */
  def toCatalyst(v: Any, s: Schema): Any = {
    if (v == null) return null
    nonNullSchema(s).getType match {
      case Schema.Type.STRING => UTF8String.fromString(v.toString)
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.ARRAY =>
        val el = nonNullSchema(s).getElementType
        val xs = v.asInstanceOf[java.util.Collection[Any]]
        new GenericArrayData(xs.toArray.map(toCatalyst(_, el)))
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        val sch = nonNullSchema(s)
        val fields = sch.getFields
        val arr = new Array[Any](fields.size())
        var i = 0
        while (i < fields.size()) {
          arr(i) = toCatalyst(rec.get(i), fields.get(i).schema())
          i += 1
        }
        InternalRow.fromSeq(arr.toIndexedSeq)
      case _ => v
    }
  }

  /** catalyst value → avro runtime value */
  def fromCatalyst(v: Any, s: Schema): Any = {
    if (v == null) return null
    nonNullSchema(s).getType match {
      case Schema.Type.STRING => v.toString
      case Schema.Type.BYTES  => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.ARRAY =>
        val el = nonNullSchema(s).getElementType
        val ad = v.asInstanceOf[ArrayData]
        val dt = sparkType(el)
        val out = new java.util.ArrayList[Any](ad.numElements())
        (0 until ad.numElements()).foreach(i => out.add(fromCatalyst(ad.get(i, dt), el)))
        out
      case Schema.Type.RECORD =>
        val sch = nonNullSchema(s)
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(sch)
        val fields = sch.getFields
        (0 until fields.size()).foreach { i =>
          val fs = fields.get(i).schema()
          rec.put(i, fromCatalyst(row.get(i, sparkType(fs)), fs))
        }
        rec
      case _ => v
    }
  }

  def from_avro(c: Column, schemaJson: String): Column =
    GraftShim.column(FromAvro(GraftShim.expression(c), schemaJson))

  /** Decode-or-quarantine variant (the m11 row-granular contract applied
    * to the Avro seam): returns `struct(data: T, _error: string)` where
    * exactly one side is set. Corrupt bytes become a quarantine-able row
    * with the decoder's reason — never a task failure, the property a
    * 100 TB at-least-once ingest cannot live without (one poisoned Kafka
    * record must not kill the job).
    */
  def from_avro_safe(c: Column, schemaJson: String): Column =
    GraftShim.column(FromAvroSafe(GraftShim.expression(c), schemaJson))

  def to_avro(c: Column, schemaJson: String): Column =
    GraftShim.column(ToAvro(GraftShim.expression(c), schemaJson))
}

/** binary → struct, schemaless Avro binary encoding. */
case class FromAvro(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = {
    AvroLimits.install() // before the first decode on this JVM (executor-side too)
    new Schema.Parser().parse(schemaJson)
  }
  // one plan object is shared across local-mode task threads (same
  // assumption as ShingleHash32's ThreadLocal MessageDigest): reader and
  // the reused decoder both carry per-read mutable state, so they must be
  // per-thread or concurrent tasks corrupt each other's decodes
  @transient private lazy val readerTL =
    ThreadLocal.withInitial[GenericDatumReader[GenericRecord]](
      () => new GenericDatumReader[GenericRecord](schema))
  @transient private lazy val decoderTL = new ThreadLocal[BinaryDecoder]

  override def dataType: DataType = AvroCodec.sparkType(schema)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val decoder = DecoderFactory.get().binaryDecoder(bytes, decoderTL.get())
    decoderTL.set(decoder)
    AvroCodec.toCatalyst(readerTL.get().read(null, decoder), schema)
  }

  override protected def withNewChildInternal(newChild: Expression): FromAvro =
    copy(child = newChild)
}

/** binary → struct(data, _error): [[FromAvro]] that quarantines instead
  * of throwing. A decode failure yields (null, reason); success yields
  * (row, null). Schemaless Avro binary has no framing, so the only
  * failure signals are EOF/overrun/malformed-union — all surfaced as the
  * exception's class+message, which is what a quarantine reason column
  * needs for triage.
  */
case class FromAvroSafe(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = {
    AvroLimits.install() // before the first decode on this JVM (executor-side too)
    new Schema.Parser().parse(schemaJson)
  }
  @transient private lazy val readerTL =
    ThreadLocal.withInitial[GenericDatumReader[GenericRecord]](
      () => new GenericDatumReader[GenericRecord](schema))
  @transient private lazy val decoderTL = new ThreadLocal[BinaryDecoder]

  override def dataType: DataType = StructType(Seq(
    StructField("data", AvroCodec.sparkType(schema), nullable = true),
    StructField("_error", StringType, nullable = true)))

  // a NULL payload (e.g. a Kafka tombstone) must quarantine WITH a
  // reason, not evaluate to a null struct that the standard routing
  // filter (_error IS NULL → clean) would misclassify as a clean row —
  // so bypass UnaryExpression's null short-circuit
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) InternalRow(null, UTF8String.fromString("null_payload"))
    else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val decoder = DecoderFactory.get().binaryDecoder(bytes, decoderTL.get())
      decoderTL.set(decoder)
      val rec = readerTL.get().read(null, decoder)
      InternalRow(AvroCodec.toCatalyst(rec, schema), null)
    } catch { case scala.util.control.NonFatal(e) =>
      InternalRow(null, UTF8String.fromString(
        s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): FromAvroSafe =
    copy(child = newChild)
}

/** struct → binary, schemaless Avro binary encoding. */
case class ToAvro(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = {
    AvroLimits.install() // before the first decode on this JVM (executor-side too)
    new Schema.Parser().parse(schemaJson)
  }
  @transient private lazy val writer = new GenericDatumWriter[Any](schema)

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any = {
    val out = new ByteArrayOutputStream()
    val enc: BinaryEncoder = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(AvroCodec.fromCatalyst(input, schema), enc)
    enc.flush()
    out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): ToAvro =
    copy(child = newChild)
}
