package graft.streaming

import java.nio.ByteBuffer
import java.util.zip.CRC32C

/** Kafka RecordBatch (magic v2) wire-format codec, from the PUBLIC
  * protocol spec (kafka.apache.org/documentation/#recordbatch).
  *
  * The live `format("kafka")` source is environment-blocked here (the
  * spark-sql-kafka jar is absent — see SourceFactory), but the batch
  * format itself is the same bytes Kafka stores in segment files and
  * ships on the wire. Decoding it from a binary column is the
  * tiered-storage pattern a 100 TB pipeline actually uses: process
  * Kafka segments landed in object storage with plain Spark — no
  * broker round-trips, scan parallelism from file splits, and the
  * connector jar only needed at the true streaming edge.
  *
  * Scope: uncompressed batches (attributes bits 0-2 = 0) — compression
  * codecs are env-blocked the same way image codecs are; the seam
  * fails loudly on compressed input rather than guessing.
  */
object KafkaWire {

  final case class KafkaRecord(offset: Long, timestamp: Long,
      key: Array[Byte], value: Array[Byte])

  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  private def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeVarLong(buf: ByteBuffer, value: Long): Unit = {
    var v = zigzagEncode(value)
    while ((v & ~0x7fL) != 0) {
      buf.put(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    buf.put(v.toByte)
  }

  private def readVarLong(buf: ByteBuffer): Long = {
    var value = 0L; var shift = 0
    var b = buf.get()
    while ((b & 0x80) != 0) {
      value |= (b & 0x7fL) << shift
      shift += 7
      require(shift <= 63, "malformed varint")
      b = buf.get()
    }
    value |= (b & 0x7fL) << shift
    zigzagDecode(value)
  }

  /** Encode records as one RecordBatch — the test/fixture side of the
    * contract (and a correct producer-side serializer for the format).
    */
  def encodeBatch(baseOffset: Long, baseTimestamp: Long,
      records: Seq[(Long, Array[Byte], Array[Byte])]): Array[Byte] = {
    require(records.nonEmpty, "empty batch")
    // size the buffers from the payloads: fixed 64 KiB / 1 MiB caps
    // would throw an unchecked BufferOverflowException on a record well
    // under Kafka's own message.max.bytes. 64 bytes of varint/header
    // slack per record is a generous upper bound for this layout.
    def recCap(key: Array[Byte], value: Array[Byte]): Int =
      64 + (if (key == null) 0 else key.length) +
        (if (value == null) 0 else value.length)
    val body = ByteBuffer.allocate(
      64 + records.map { case (_, k, v) => recCap(k, v) + 10 }.sum)
    // attributes(2) .. recordCount(4) then records
    body.putShort(0) // attributes: no compression, create-time
    body.putInt(records.length - 1) // lastOffsetDelta
    body.putLong(baseTimestamp)
    body.putLong(records.map(_._1).max) // maxTimestamp
    body.putLong(-1L) // producerId (idempotence unused)
    body.putShort(-1) // producerEpoch
    body.putInt(-1) // baseSequence
    body.putInt(records.length)
    records.zipWithIndex.foreach { case ((ts, key, value), i) =>
      val rec = ByteBuffer.allocate(recCap(key, value))
      rec.put(0.toByte) // record attributes
      writeVarLong(rec, ts - baseTimestamp)
      writeVarLong(rec, i.toLong) // offsetDelta
      if (key == null) writeVarLong(rec, -1L)
      else { writeVarLong(rec, key.length.toLong); rec.put(key) }
      if (value == null) writeVarLong(rec, -1L)
      else { writeVarLong(rec, value.length.toLong); rec.put(value) }
      writeVarLong(rec, 0L) // headers count
      rec.flip()
      writeVarLong(body, rec.remaining().toLong) // record length prefix
      body.put(rec)
    }
    body.flip()
    val crc = new CRC32C()
    crc.update(body.duplicate())
    val out = ByteBuffer.allocate(21 + body.remaining())
    out.putLong(baseOffset)
    // batchLength counts everything after this field:
    // leaderEpoch(4) + magic(1) + crc(4) + attributes..records
    out.putInt(9 + body.remaining())
    out.putInt(-1) // partitionLeaderEpoch
    out.put(2.toByte) // magic v2
    out.putInt(crc.getValue.toInt)
    out.put(body)
    out.flip()
    val arr = new Array[Byte](out.remaining())
    out.get(arr)
    arr
  }

  /** Decode one RecordBatch. Validates magic and CRC32C — corrupt bytes
    * fail loudly, they never yield silently-wrong records.
    */
  def decodeBatch(bytes: Array[Byte]): Seq[KafkaRecord] = {
    val buf = ByteBuffer.wrap(bytes)
    val baseOffset = buf.getLong
    val batchLength = buf.getInt
    require(batchLength == buf.remaining(),
      s"batchLength $batchLength != remaining ${buf.remaining()}")
    buf.getInt // partitionLeaderEpoch (not CRC-covered by design)
    val magic = buf.get()
    require(magic == 2, s"unsupported magic $magic (RecordBatch v2 only)")
    val expectedCrc = buf.getInt
    val crc = new CRC32C()
    crc.update(buf.duplicate())
    require(crc.getValue.toInt == expectedCrc,
      f"CRC mismatch: stored 0x$expectedCrc%08x computed 0x${crc.getValue.toInt}%08x")
    val attributes = buf.getShort
    require((attributes & 0x7) == 0,
      s"compressed batch (codec ${attributes & 0x7}) — compression codecs " +
        "are not available in this environment")
    buf.getInt // lastOffsetDelta
    val baseTimestamp = buf.getLong
    buf.getLong // maxTimestamp
    buf.getLong // producerId
    buf.getShort // producerEpoch
    buf.getInt // baseSequence
    val recordCount = buf.getInt
    (0 until recordCount).map { _ =>
      val len = readVarLong(buf).toInt
      val end = buf.position() + len
      buf.get() // record attributes (unused in v2)
      val tsDelta = readVarLong(buf)
      val offDelta = readVarLong(buf)
      def readBytes(): Array[Byte] = readVarLong(buf).toInt match {
        case -1 => null
        case n => val a = new Array[Byte](n); buf.get(a); a
      }
      val key = readBytes()
      val value = readBytes()
      val nHeaders = readVarLong(buf).toInt
      (0 until nHeaders).foreach { _ => readBytes(); readBytes() }
      require(buf.position() == end, "record length mismatch")
      KafkaRecord(baseOffset + offDelta, baseTimestamp + tsDelta, key, value)
    }
  }

  /** Explode a binary column of RecordBatch bytes into records — the
    * segment-file scan stage. mapPartitions is the codec altitude (same
    * seam as Avro container files and the media decoder): parallelism
    * comes from input splits, each task streams its batches.
    */
  def records(batches: org.apache.spark.sql.Dataset[Array[Byte]])
      : org.apache.spark.sql.Dataset[KafkaRecord] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[KafkaRecord]
    batches.mapPartitions(_.flatMap(decodeBatch))
  }
}
