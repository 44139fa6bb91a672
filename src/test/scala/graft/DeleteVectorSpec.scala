package graft

import graft.sources.DeleteVectors
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deletion-vector codec: roundtrip under every container shape, the
  * size economics the format exists for, and malformed-input refusals.
  */
class DeleteVectorSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  private def rt(a: Array[Long]): Unit = {
    val sorted = a.distinct.sorted
    assert(DeleteVectors.decode(DeleteVectors.encode(a)).toSeq === sorted.toSeq)
  }

  test("roundtrip: empty, singleton, duplicates, unordered") {
    rt(Array.empty[Long])
    rt(Array(0L))
    rt(Array(7L, 7L, 7L))
    rt(Array(9L, 3L, 9L, 1L, 0L))
  }

  test("roundtrip across container types and chunk boundaries") {
    rt(Array.tabulate(100)(i => i * 977L))                 // sparse ARRAY
    rt(Array.tabulate(70000)(_.toLong))                    // dense RUN, 2 chunks
    rt((0 until 20000).map(i => i * 3L).toArray)           // dense-ish BITMAP
    rt(Array(65535L, 65536L, 65537L))                      // chunk seam run
    rt(Array(0L, (1L << 40) + 5, (1L << 40) + 6, (1L << 52)))  // huge keys
    val mixed = (0L until 5000L) ++                        // RUN chunk
      (100000L until 200000L by 7)  ++                     // BITMAP chunk(s)
      Seq(5000000L, 9000001L, 9000003L)                    // ARRAY chunks
    rt(mixed.toArray)
  }

  test("property: encode/decode is identity on sorted distinct sets") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 34)).map(_.toArray)
    samples(gen, 200).foreach(rt)
  }

  test("property: clustered runs roundtrip (the RLE container path)") {
    val runGen = Gen.listOfN(8, for {
      start <- Gen.chooseNum(0L, 1L << 22)
      len <- Gen.chooseNum(1, 3000)
    } yield (start, len)).map(_.flatMap { case (s, l) => s until (s + l) }.toArray)
    samples(runGen, 120).foreach(rt)
  }

  test("size economics: ranges collapse to bytes, scattered stays ~2 B/pos") {
    // a full-file delete of 1 M rows is a handful of bytes
    val full = DeleteVectors.encode(Array.tabulate(1 << 20)(_.toLong))
    assert(full.length < 200, s"run encoding too big: ${full.length}")
    // v1 layout was ≈4 B/position ON DISK plus a path per row; scattered
    // DV positions (every 97th row) must stay at or under ~2.1 B each
    val scattered = (0 until 100000).map(_ * 97L).toArray
    val dv = DeleteVectors.encode(scattered)
    assert(dv.length <= scattered.length * 21 / 10,
      s"scattered encoding ${dv.length} B for ${scattered.length} positions")
    // decode returns sorted — the binary-search contract
    val back = DeleteVectors.decode(dv)
    assert(back.zip(back.tail).forall { case (a, b) => a < b })
  }

  test("refusals: negative ordinals, foreign bytes") {
    intercept[IllegalArgumentException](DeleteVectors.encode(Array(-1L)))
    intercept[IllegalArgumentException](
      DeleteVectors.decode(Array[Byte](1, 2, 3)))
  }
}
