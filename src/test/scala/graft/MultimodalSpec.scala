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
}
