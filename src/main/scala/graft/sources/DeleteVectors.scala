package graft.sources

import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}

/** Deletion-vector codec: a compressed bitmap of deleted row ordinals,
  * one per data file — the Delta DV / Iceberg-v3 shape for position
  * deletes. Replaces the v1 sidecar's one-(path, pos)-row-per-position
  * layout (measured round 9: 910 k positions = 3.7 MB ≈ 4 B/position
  * on disk plus a path string per row) with one row per FILE whose
  * binary column encodes the ordinals roaring-style:
  *
  *  - positions chunk by their high bits (64 Ki ordinals per chunk);
  *  - each chunk picks the smallest of three containers —
  *    ARRAY (2 B per position, sparse), BITMAP (8 KiB flat, dense),
  *    RUN (two varints per run, clustered) — the classic
  *    roaring-bitmap trade-off plus the RLE container;
  *  - chunk keys delta-varint so ordinals are unbounded longs.
  *
  * Scattered deletes land near 2 B/position (≈2× smaller than v1 and
  * no per-row path), range deletes collapse to a few BYTES per run
  * (100-1000×), and a full-file delete is ~6 bytes. The read-side
  * broadcast/driver routing threshold scales its byte estimate
  * accordingly (PositionDeletes.exceedsBroadcast).
  *
  * Pure JVM, no dependencies; encode takes ordinals in any order and
  * dedupes, decode returns them sorted — the invariant every reader
  * (binary-search skip sets, anti-join sides) relies on.
  */
private[graft] object DeleteVectors {

  /** v2 sidecar schema: one row per touched data file. `file_path`
    * keeps the v1 column name so kind-agnostic readers (the
    * referenced-files probe) project it from either layout.
    */
  val CardCol = "card"
  val DvCol = "dv"
  val schema: StructType = new StructType()
    .add(PositionDeletes.FileCol, StringType, nullable = false)
    .add(CardCol, LongType, nullable = false)
    .add(DvCol, BinaryType, nullable = false)

  private val Magic: Byte = 0x47 // 'G'
  private val Version: Byte = 1
  private val TypeArray: Byte = 0
  private val TypeBitmap: Byte = 1
  private val TypeRun: Byte = 2
  private val ChunkBits = 16
  private val ChunkSize = 1 << ChunkBits // 65536 ordinals per chunk
  private val BitmapBytes = ChunkSize / 8 // 8 KiB

  // ---- varint (unsigned LEB128) ----
  private def writeVarLong(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private final class In(val a: Array[Byte]) { var i = 0 }
  private def readVarLong(in: In): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val b = in.a(in.i); in.i += 1
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v // unreachable
  }

  /** Encode `positions` (any order, duplicates tolerated) to the DV
    * binary. Negative ordinals are a caller bug and refuse loudly.
    */
  def encode(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.clone()
    java.util.Arrays.sort(sorted)
    require(sorted.isEmpty || sorted(0) >= 0,
      s"negative row ordinal ${if (sorted.isEmpty) -1 else sorted(0)}")
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(Magic.toInt); out.write(Version.toInt)
    // chunk boundaries over the sorted (deduped on the fly) ordinals
    var i = 0
    val n = sorted.length
    var chunkStarts = List.newBuilder[(Long, Int, Int)] // (key, from, until)
    while (i < n) {
      val key = sorted(i) >>> ChunkBits
      var j = i
      while (j < n && (sorted(j) >>> ChunkBits) == key) j += 1
      chunkStarts += ((key, i, j))
      i = j
    }
    val chunks = chunkStarts.result()
    // count distinct per chunk for container choice
    writeVarLong(out, chunks.length.toLong)
    var prevKey = -1L
    chunks.foreach { case (key, from, until) =>
      // first chunk writes the key itself, later ones the gap - 1
      writeVarLong(out, if (prevKey < 0) key else key - prevKey - 1)
      prevKey = key
      // distinct in-chunk low bits
      val lows = new Array[Int](until - from)
      var c = 0
      var k = from
      var last = -1
      while (k < until) {
        val low = (sorted(k) & (ChunkSize - 1)).toInt
        if (low != last) { lows(c) = low; c += 1; last = low }
        k += 1
      }
      // run count for the RUN container decision
      var runs = 1
      var r = 1
      while (r < c) { if (lows(r) != lows(r - 1) + 1) runs += 1; r += 1 }
      val arrayBytes = 2 * c
      val runBytes = 4 * runs // ~two varints per run, conservative
      if (runBytes < arrayBytes && runBytes < BitmapBytes) {
        out.write(TypeRun.toInt)
        writeVarLong(out, runs.toLong)
        var idx = 0
        var prevEnd = -1
        while (idx < c) {
          val start = lows(idx)
          var end = idx
          while (end + 1 < c && lows(end + 1) == lows(end) + 1) end += 1
          writeVarLong(out, (start - prevEnd - 1).toLong)
          writeVarLong(out, (end - idx).toLong) // runLen - 1
          prevEnd = lows(end)
          idx = end + 1
        }
      } else if (arrayBytes <= BitmapBytes) {
        out.write(TypeArray.toInt)
        writeVarLong(out, c.toLong)
        var idx = 0
        while (idx < c) {
          out.write(lows(idx) & 0xff); out.write((lows(idx) >>> 8) & 0xff)
          idx += 1
        }
      } else {
        out.write(TypeBitmap.toInt)
        val bm = new Array[Byte](BitmapBytes)
        var idx = 0
        while (idx < c) {
          bm(lows(idx) >>> 3) = (bm(lows(idx) >>> 3) | (1 << (lows(idx) & 7))).toByte
          idx += 1
        }
        out.write(bm)
      }
    }
    out.toByteArray
  }

  /** Decode to sorted distinct ordinals. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 2 && bytes(0) == Magic && bytes(1) == Version,
      s"not a graft deletion vector (${bytes.take(2).mkString(",")})")
    val in = new In(bytes); in.i = 2
    val nChunks = readVarLong(in).toInt
    val buf = new scala.collection.mutable.ArrayBuilder.ofLong
    var key = -1L
    var ci = 0
    while (ci < nChunks) {
      val delta = readVarLong(in)
      key = if (key < 0) delta else key + delta + 1
      val base = key << ChunkBits
      val tpe = in.a(in.i); in.i += 1
      tpe match {
        case TypeArray =>
          val c = readVarLong(in).toInt
          var idx = 0
          while (idx < c) {
            val low = (in.a(in.i) & 0xff) | ((in.a(in.i + 1) & 0xff) << 8)
            in.i += 2
            buf += base | low.toLong
            idx += 1
          }
        case TypeBitmap =>
          var b = 0
          while (b < BitmapBytes) {
            val v = in.a(in.i + b) & 0xff
            if (v != 0) {
              var bit = 0
              while (bit < 8) {
                if ((v & (1 << bit)) != 0) buf += base | ((b << 3) | bit).toLong
                bit += 1
              }
            }
            b += 1
          }
          in.i += BitmapBytes
        case TypeRun =>
          val runs = readVarLong(in).toInt
          var prevEnd = -1L
          var rr = 0
          while (rr < runs) {
            val start = prevEnd + 1 + readVarLong(in)
            val len = readVarLong(in) + 1
            var p = start
            while (p < start + len) { buf += base | p; p += 1 }
            prevEnd = start + len - 1
            rr += 1
          }
        case other =>
          throw new IllegalStateException(s"unknown DV container type $other")
      }
      ci += 1
    }
    buf.result()
  }
}
