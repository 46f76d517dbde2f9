package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.PostingCodec

class PostingCodecSpec extends AnyFunSuite {

  private def roundtrip(docIds: Array[Long], tfs: Array[Int], norms: Array[Int]): Unit = {
    val enc = PostingCodec.encode(docIds, tfs, norms)
    val dec = PostingCodec.decodeAll(enc.bytes, enc.blockOffset, enc.blockLast)
    assert(dec.docIds.toSeq === docIds.toSeq)
    assert(dec.tfs.toSeq === tfs.toSeq)
    assert(dec.norms.toSeq === norms.toSeq)
    // block metadata invariants
    val nBlocks = enc.blockOffset.length
    assert(nBlocks === (docIds.length + 127) / 128)
    for (b <- 0 until nBlocks) {
      val s = b * 128
      val e = math.min(s + 128, docIds.length)
      assert(enc.blockLast(b) === docIds(e - 1))
      assert(enc.blockMaxTf(b) === (s until e).map(tfs).max)
      assert(enc.blockMinNorm(b) === (s until e).map(norms).min)
    }
  }

  test("fixed boundary cases") {
    for (n <- Seq(1, 2, 127, 128, 129, 255, 256, 257, 1000)) {
      val docIds = Array.tabulate(n)(i => i.toLong * 7 + 3)
      val tfs = Array.tabulate(n)(i => 1 + (i % 13))
      val norms = Array.tabulate(n)(i => (i * 37) % 256)
      roundtrip(docIds, tfs, norms)
    }
  }

  test("single doc, huge gaps, max values") {
    roundtrip(Array(0L), Array(1), Array(0))
    roundtrip(Array(Long.MaxValue / 2), Array(1 << 20), Array(255))
    roundtrip(Array(5L, Long.MaxValue / 2), Array(1, 1), Array(255, 0))
    roundtrip(Array(0L, 1L, 2L), Array(1, 1, 1), Array(0, 0, 0)) // zero-bit deltas
    // MULTIPLE >56-bit deltas in one block: exercises the accumulator
    // spill in BitPack.pack/unpack (a straddled value must carry its
    // high bits over the 64-bit word boundary)
    val wide = Array(5L, Long.MaxValue / 2, Long.MaxValue / 2 + 3, Long.MaxValue - 9)
    roundtrip(wide, Array(1, 2, 3, 4), Array(0, 255, 7, 200))
  }

  test("property: random strictly-increasing lists roundtrip (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(700)
      val gaps = Array.fill(n)(1L + rnd.nextLong(1000000L))
      val docIds = gaps.scanLeft(-1L)(_ + _).tail
      val tfs = Array.fill(n)(1 + rnd.nextInt(100000))
      val norms = Array.fill(n)(rnd.nextInt(256))
      roundtrip(docIds, tfs, norms)
    }
  }

  test("rejects non-increasing docIds") {
    intercept[IllegalArgumentException] {
      PostingCodec.encode(Array(5L, 5L), Array(1, 1), Array(0, 0))
    }
  }

  test("rejects non-increasing docIds ACROSS a block boundary") {
    // the adjacent-pair check skips i=0 of each 128-doc block: an
    // out-of-order first docId of block 1 would varlong-encode a
    // negative delta and decode silently out of order
    val n = 129
    val docIds = Array.tabulate(n)(_.toLong)
    docIds(128) = 100L // <= docIds(127) = 127, first element of block 1
    intercept[IllegalArgumentException] {
      PostingCodec.encode(docIds, Array.fill(n)(1), Array.fill(n)(0))
    }
  }
}
