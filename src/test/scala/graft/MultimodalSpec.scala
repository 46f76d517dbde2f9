package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The media decoder is REAL byte-level parsing (PNG IHDR walk with
  * CRC32 verification, WAV RIFF/fmt fields) — no media libraries, but
  * no fakes either: corrupted bytes must be rejected, not hashed.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PNG roundtrip: generator bytes decode to the embedded dimensions") {
    for ((w, h) <- Seq((1, 1), (17, 513), (512, 64), (65535, 3))) {
      val m = Multimodal.decodeOne(7L, Multimodal.pngBytes(w, h))
      assert((m.format, m.width, m.height, m.bit_depth, m.channels) ===
        (("png"), w.toLong, h.toLong, 8L, 3L))
    }
  }

  test("WAV roundtrip: RIFF fmt fields decode exactly") {
    for ((c, r) <- Seq((1, 8000), (2, 44100), (6, 192000))) {
      val m = Multimodal.decodeOne(9L, Multimodal.wavBytes(c, r))
      assert((m.format, m.channels, m.sample_rate, m.bit_depth) ===
        (("wav"), c.toLong, r.toLong, 16L))
    }
  }

  test("corrupted PNG IHDR fails the CRC check instead of decoding garbage") {
    val good = Multimodal.pngBytes(100, 200)
    val bad = good.clone()
    bad(17) = (bad(17) ^ 0x40).toByte // flip a width bit, CRC now stale
    // strict mode: corruption is loud (ingest validation)
    intercept[IllegalArgumentException](Multimodal.decodeOne(1L, bad, strict = true))
    // default (job-safe) mode: one corrupt row degrades to 'unknown'
    // instead of aborting a corpus-sized decode
    assert(Multimodal.decodeOne(1L, bad).format === "unknown")
  }

  test("unknown payloads classify as unknown, not as a crash") {
    val m = Multimodal.decodeOne(3L, "not a media file at all".getBytes("UTF-8"))
    assert(m.format === "unknown")
  }

  test("distributed decode over a binary column matches the per-row decoder") {
    import spark.implicits._
    val docs = spark.range(0, 64).toDF("doc_id")
    val payloads = Multimodal.syntheticPayload(docs, "doc_id")
    val decoded = Multimodal.decodeMedia(payloads, "doc_id", "payload").collect()
    assert(decoded.length === 64)
    decoded.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getString(1) === "png")
        assert(r.getLong(2) === 1 + id % 512)
        assert(r.getLong(3) === 1 + (id * 7) % 512)
      } else {
        assert(r.getString(1) === "wav")
        assert(r.getLong(5) === 1 + (id % 2))
        assert(r.getLong(6) === 8000 + (id % 8) * 1000)
      }
    }
  }

  test("frame sampling: chunk walk + PCM extraction recover the embedded waveform") {
    import spark.implicits._
    val payloads = Multimodal.syntheticAudioPayload(
      spark.range(0, 40).toDF("doc_id"), "doc_id")
    val rows = Multimodal.sampleFrames(payloads, "doc_id", "payload", nFrames = 8).collect()
    assert(rows.length === 40 * 8)
    rows.foreach { r =>
      val (id, frame, pos, sample) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val n = 64 + id % 64
      assert(pos === frame * n / 8)
      assert(sample === Multimodal.sampleValue(id, pos))
    }
  }

  test("frame sampling walks past unknown chunks and skips non-PCM payloads") {
    import spark.implicits._
    // a LIST chunk (3 bytes, word-aligned to 4) inserted before fmt/data
    val base = Multimodal.wavBytesWithSamples(5L)
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(base, 0, 12)
    extra.write("LIST".getBytes("US-ASCII")); extra.write(Array[Byte](3, 0, 0, 0))
    extra.write(Array[Byte](1, 2, 3, 0)) // body + pad byte
    extra.write(base, 12, base.length - 12)
    // fix the RIFF size field (not strictly checked, but keep it honest)
    val withChunk = extra.toByteArray
    val df = Seq((5L, withChunk), (6L, Multimodal.pngBytes(4, 4)),
      (7L, "garbage".getBytes("US-ASCII"))).toDF("doc_id", "payload")
    val rows = Multimodal.sampleFrames(df, "doc_id", "payload", nFrames = 4).collect()
    // only the WAV row yields frames; PNG and garbage yield none
    assert(rows.map(_.getLong(0)).distinct.toSeq === Seq(5L))
    assert(rows.length === 4)
    rows.foreach(r => assert(r.getLong(3) === Multimodal.sampleValue(5L, r.getLong(2))))
  }

  test("frame sampling handles fmt AFTER data (arbitrary RIFF chunk order)") {
    import spark.implicits._
    // reorder the generator's chunks: [RIFF WAVE][data ...][fmt ...] —
    // spec-valid, and the walk must NOT stop at the data chunk or the
    // payload silently yields zero frames (pcm16 never set)
    val base = Multimodal.wavBytesWithSamples(9L)
    val fmtChunk = java.util.Arrays.copyOfRange(base, 12, 36)
    val dataChunk = java.util.Arrays.copyOfRange(base, 36, base.length)
    val reordered = base.take(12) ++ dataChunk ++ fmtChunk
    val df = Seq((9L, reordered)).toDF("doc_id", "payload")
    val rows = Multimodal.sampleFrames(df, "doc_id", "payload", nFrames = 4).collect()
    assert(rows.length === 4, "fmt-after-data payload must still decode")
    rows.foreach(r => assert(r.getLong(3) === Multimodal.sampleValue(9L, r.getLong(2))))
  }

  test("frame sampling bails on a negative RIFF chunk size instead of spinning") {
    import spark.implicits._
    // chunk size 0xFFFFFFF8 reads back as -8 through the signed le32:
    // off += 8 + sz + (sz & 1) would then advance by ZERO and hang the
    // task forever — the walk must yield no rows and terminate
    val evil = new java.io.ByteArrayOutputStream()
    evil.write("RIFF".getBytes("US-ASCII")); evil.write(Array[Byte](36, 0, 0, 0))
    evil.write("WAVE".getBytes("US-ASCII"))
    evil.write("junk".getBytes("US-ASCII"))
    evil.write(Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)) // sz = -8
    evil.write(Array.fill[Byte](32)(0))
    val df = Seq((1L, evil.toByteArray)).toDF("doc_id", "payload")
    val fut = scala.concurrent.Future(
      Multimodal.sampleFrames(df, "doc_id", "payload", nFrames = 4).collect())(
      scala.concurrent.ExecutionContext.global)
    val rows = scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration("60s"))
    assert(rows.isEmpty)
  }

  test("frame sampling rejects a data-chunk size that overflows the Int bound check") {
    import spark.implicits._
    // sz = 0x7FFFFFFF passes the sz<0 walk guard, and dataOff + dataLen
    // overflows Int to negative — an Int-arithmetic bound check would
    // accept the row and the frame pass would throw AIOOBE from a LAZY
    // iterator consumed after the lenient try/catch returned, aborting
    // the job; the Long-arithmetic check must yield no rows instead
    val evil = new java.io.ByteArrayOutputStream()
    evil.write("RIFF".getBytes("US-ASCII")); evil.write(Array[Byte](36, 0, 0, 0))
    evil.write("WAVE".getBytes("US-ASCII"))
    evil.write("fmt ".getBytes("US-ASCII")); evil.write(Array[Byte](16, 0, 0, 0))
    evil.write(Array[Byte](1, 0, 1, 0)) // PCM, mono
    evil.write(Array[Byte](0x40, 0x1F, 0, 0, (0x80 & 0xFF).toByte, 0x3E, 0, 0, 2, 0))
    evil.write(Array[Byte](16, 0)) // 16-bit
    evil.write("data".getBytes("US-ASCII"))
    evil.write(Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F)) // sz = Int.MaxValue
    evil.write(Array.fill[Byte](8)(0)) // a few real bytes, far fewer than sz
    val df = Seq((1L, evil.toByteArray)).toDF("doc_id", "payload")
    val rows = Multimodal.sampleFrames(df, "doc_id", "payload", nFrames = 4).collect()
    assert(rows.isEmpty)
  }

  test("resize plan: integer aspect-fit matches the oracle arithmetic") {
    import spark.implicits._
    val payloads = Multimodal.syntheticPayload(spark.range(0, 30).toDF("doc_id"), "doc_id")
    val rows = Multimodal.resizePlan(payloads, "doc_id", "payload", box = 64).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      if (w >= h) { assert(ow === 64L); assert(oh === h * 64 / w) }
      else { assert(oh === 64L); assert(ow === w * 64 / h) }
      assert(ow >= 1 && ow <= 64 && oh >= 1 && oh <= 64)
    }
  }

  test("fuzz: lenient decodeOne is total over noise and mutated payloads (seeded)") {
    // the leniency contract: one corrupt row must never abort (or hang)
    // a corpus-sized decode job — ANY input degrades to kind=unknown.
    // Noise probes the signature dispatch; bit-flipped VALID payloads
    // probe the deep paths (length fields, CRC, fmt offsets).
    val rnd = new scala.util.Random(0x11ED1AL)
    def check(id: Long, b: Array[Byte], what: => String): Unit =
      try { Multimodal.decodeOne(id, b); () }
      catch { case e: Throwable =>
        fail(s"$what threw ${e.getClass.getName}: ${e.getMessage}") }
    for (i <- 1 to 3000)
      check(i, Array.fill[Byte](rnd.nextInt(80))(rnd.nextInt().toByte), s"noise $i")
    val png = Multimodal.pngBytes(640, 480)
    val wav = Multimodal.wavBytes(2, 44100)
    for (i <- 1 to 3000) {
      val m = (if (rnd.nextBoolean()) png else wav).clone()
      (0 to rnd.nextInt(4)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt().toByte)
      check(i, m, s"mutation $i")
    }
  }

  test("fuzz: sampleFrames leniency holds under payload mutation (seeded)") {
    // the RIFF chunk walk must neither throw nor spin (the ADVICE-flagged
    // negative-chunk-size hang class) for ANY mutation of a real payload
    import spark.implicits._
    val rnd = new scala.util.Random(0x5A3FL)
    val rows = (0L until 200L).map { id =>
      val m = Multimodal.wavBytesWithSamples(id).clone()
      (0 to rnd.nextInt(6)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt().toByte)
      (id, m)
    }
    val out = Multimodal.sampleFrames(rows.toDF("doc_id", "payload"), "doc_id", "payload")
    assert(out.count() >= 0) // completion IS the assertion (no throw, no hang)
  }

  // ---- real PNG pixel pipeline (from-scratch inflate + unfilter + resize)

  test("from-scratch inflate matches JVM Deflater output at every level") {
    import graft.ops.Inflate
    val rnd = new scala.util.Random(0x1F1A7EL)
    def deflate(data: Array[Byte], level: Int): Array[Byte] = {
      val d = new java.util.zip.Deflater(level)
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!d.finished()) { val n = d.deflate(tmp); out.write(tmp, 0, n) }
      d.end()
      out.toByteArray
    }
    // level 0 = stored blocks, 1 = fast/fixed-leaning, 6/9 = dynamic
    // Huffman; sizes cover empty, tiny, block-boundary, and multi-block
    for (level <- Seq(0, 1, 6, 9); size <- Seq(0, 1, 100, 65535, 200000)) {
      val random = Array.fill[Byte](size)(rnd.nextInt().toByte)
      assert(Inflate.zlib(deflate(random, level)).sameElements(random),
        s"random data level=$level size=$size")
      // repetitive data exercises long back-references (incl. overlap)
      val rep = Array.tabulate[Byte](size)(i => ((i / 7) % 11).toByte)
      assert(Inflate.zlib(deflate(rep, level)).sameElements(rep),
        s"repetitive data level=$level size=$size")
    }
  }

  test("inflate rejects corrupt streams loudly (truncation, bit flips, bad header)") {
    import graft.ops.Inflate
    val rnd = new scala.util.Random(0xC0FFEEL)
    val data = Array.fill[Byte](5000)(rnd.nextInt(8).toByte)
    val d = new java.util.zip.Deflater(6)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) { val n = d.deflate(tmp); out.write(tmp, 0, n) }
    d.end()
    val z = out.toByteArray
    intercept[IllegalArgumentException](Inflate.zlib(java.util.Arrays.copyOf(z, z.length / 2)))
    intercept[IllegalArgumentException](Inflate.zlib(Array[Byte](0x79, 0x9c.toByte, 0, 0, 0, 0)))
    // a bit flip anywhere must yield IAE or a changed-output Adler
    // failure — NEVER a hang or an uncaught array crash
    for (i <- 2 until z.length) {
      val bad = z.clone(); bad(i) = (bad(i) ^ 0x10).toByte
      try { Inflate.zlib(bad); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("fuzz: inflate is total over pure noise (IAE or success, never hang/crash)") {
    import graft.ops.Inflate
    val rnd = new scala.util.Random(0xD1CEL)
    for (i <- 1 to 4000) {
      val noise = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte)
      try { Inflate.zlib(noise); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"noise $i threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("PNG pixel roundtrip: inflate + unfilter recover the exact pixel function") {
    for (id <- Seq(0L, 1L, 7L, 42L, 1997L, 123456L)) {
      val (w, h) = Multimodal.pixelDims(id)
      val (dw, dh, px) = Multimodal.decodePngPixels(Multimodal.pngBytesWithPixels(id))
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert(px(y * w * 3 + x * 3 + c) === Multimodal.pixelValue(id, x, y, c),
          s"id=$id pixel ($x,$y,$c)")
    }
  }

  test("box resize: uniform image stays uniform; 2x2 mean is exact") {
    val uni = Array.fill(10 * 6 * 3)(77)
    assert(Multimodal.boxResize(uni, 10, 6, 5, 3).forall(_ === 77))
    // 2x2 -> 1x1: floor-mean of the four pixels per channel
    val px = Array(
      10, 0, 0, 20, 0, 0,
      31, 0, 0, 40, 0, 0)
    assert(Multimodal.boxResize(px, 2, 2, 1, 1)(0) === (10 + 20 + 31 + 40) / 4)
  }

  test("corrupt deflate payload is rejected strictly and skipped leniently") {
    import spark.implicits._
    val good = Multimodal.pngBytesWithPixels(5L)
    // flip a byte INSIDE the first IDAT body and re-stamp that chunk's
    // CRC32, so the corruption reaches the inflate/Adler layer (a stale
    // chunk CRC would be caught earlier and not exercise the decoder)
    val bad = good.clone()
    val ihdrEnd = 8 + 12 + 13
    val idatLen = ((bad(ihdrEnd) & 0xff) << 24) | ((bad(ihdrEnd + 1) & 0xff) << 16) |
      ((bad(ihdrEnd + 2) & 0xff) << 8) | (bad(ihdrEnd + 3) & 0xff)
    assert(new String(bad, ihdrEnd + 4, 4, "US-ASCII") === "IDAT" && idatLen > 2)
    bad(ihdrEnd + 8 + idatLen / 2) = (bad(ihdrEnd + 8 + idatLen / 2) ^ 0x55).toByte
    val crc = new java.util.zip.CRC32
    crc.update(bad, ihdrEnd + 4, 4 + idatLen)
    val cv = crc.getValue.toInt
    bad(ihdrEnd + 8 + idatLen) = ((cv >> 24) & 0xff).toByte
    bad(ihdrEnd + 9 + idatLen) = ((cv >> 16) & 0xff).toByte
    bad(ihdrEnd + 10 + idatLen) = ((cv >> 8) & 0xff).toByte
    bad(ihdrEnd + 11 + idatLen) = (cv & 0xff).toByte
    intercept[IllegalArgumentException](Multimodal.decodePngPixels(bad))
    // lenient distributed pass: the corrupt row vanishes, good rows stay
    val df = Seq((5L, good), (6L, Multimodal.pngBytesWithPixels(6L)), (7L, bad))
      .toDF("doc_id", "payload")
    val stats = Multimodal.pixelStats(df, "doc_id", "payload").collect()
    assert(stats.map(_.getLong(0)).toSeq === Seq(5L, 6L))
  }

  test("fuzz: pixelStats leniency is total over mutated PNG payloads (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xB0B1E5L)
    val rows = (0L until 150L).map { id =>
      val m = Multimodal.pngBytesWithPixels(id).clone()
      (0 to rnd.nextInt(6)).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt().toByte)
      (id, m)
    }
    val out = Multimodal.pixelStats(rows.toDF("doc_id", "payload"), "doc_id", "payload")
    assert(out.count() >= 0) // completion IS the assertion
  }
}
