package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque binary columns with typed
  * metadata extracted by batched per-partition decoders.
  *
  * Two decoders:
  * - `decodeMedia` — REAL byte-level format parsing (PNG signature +
  *   IHDR walk with CRC32 verification, WAV RIFF/fmt fields), no
  *   media libraries needed; oracle-gated against generator-embedded
  *   metadata (q34).
  * - `decodeMeta` — a deterministic payload FINGERPRINT (md5-derived
  *   pseudo-dimensions, quarter digests): the stand-in shape for
  *   heavyweight codecs (jpeg/h264) absent from this container, with
  *   the batch plumbing identical to the real decoder (q25).
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long, // STUB: 64 + (first md5 byte % 192)
      height: Long, // STUB: 64 + (second md5 byte % 192)
      f1: String, f2: String, f3: String, f4: String) // quarter-frame digests

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** The batched decode stub: one call per partition, rows streamed —
    * the exact shape a real decoder (native lib per task, reused across
    * the batch) plugs into. Replace the body marked STUB with the real
    * codec on a cluster with media libraries installed.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    val ds = src.as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      // per-partition decoder init would go here (native handles etc.)
      rows.map { case (id, bytes) =>
        val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val digest = md5Hex(text)
        // STUB decode: dimensions from digest bytes, frames = quarters
        val b0 = Integer.parseInt(digest.substring(0, 2), 16)
        val b1 = Integer.parseInt(digest.substring(2, 4), 16)
        val n = text.length
        val q = n / 4
        def quarter(i: Int): String = {
          val from = i * q
          val until = if (i == 3) n else (i + 1) * q
          md5Hex(text.substring(from, until)).substring(0, 8)
        }
        MediaMeta(id, bytes.length.toLong, 64L + b0 % 192, 64L + b1 % 192,
          quarter(0), quarter(1), quarter(2), quarter(3))
      }
    }(Encoders.product[MediaMeta]).toDF().orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // REAL media decode (not a stub): byte-level PNG and WAV parsing in
  // pure JVM code — signature check, IHDR chunk walk with CRC32
  // verification, RIFF/fmt header fields. The oracle works because the
  // payload GENERATOR embeds metadata derived from doc_id; the decoder
  // must recover exactly those values from the bytes, so any parsing
  // bug breaks oracle parity.
  // ---------------------------------------------------------------

  final case class MediaDecoded(doc_id: Long, format: String, width: Long, height: Long,
      bit_depth: Long, channels: Long, sample_rate: Long)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** A structurally valid PNG: signature + IHDR (with real CRC32) +
    * empty IDAT + IEND. Deterministic per (width, height).
    */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    out.write(PngSig, 0, 8)
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0)) // 8-bit RGB
    chunk("IDAT", Array.empty[Byte])
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** A valid 16-bit PCM WAV header (no samples) for (channels, rate). */
  def wavBytes(channels: Int, sampleRate: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bits = 16
    val byteRate = sampleRate * channels * bits / 8
    b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(0)
    b.array()
  }

  private def be32At(a: Array[Byte], o: Int): Int =
    ((a(o) & 0xff) << 24) | ((a(o + 1) & 0xff) << 16) | ((a(o + 2) & 0xff) << 8) | (a(o + 3) & 0xff)
  private def le32At(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) | ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
  private def le16At(a: Array[Byte], o: Int): Int = (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)

  /** Decode one payload. PNG: verify signature, walk to IHDR, check its
    * CRC32, map color type to channel count. WAV: verify RIFF/WAVE/fmt,
    * read channels/rate/bits. Unknown bytes → format 'unknown'; a
    * payload that LOOKS like a known format but fails structural
    * validation (truncated IHDR, stale CRC, bad color type) degrades to
    * 'unknown' too — one corrupt row must not abort a corpus-sized
    * decode job. `strict = true` re-raises parse failures instead (for
    * callers that want corruption to be loud, e.g. ingest validation).
    */
  def decodeOne(id: Long, bytes: Array[Byte], strict: Boolean = false): MediaDecoded =
    try decodeOneStrict(id, bytes)
    catch {
      case e @ (_: IllegalArgumentException | _: IndexOutOfBoundsException) =>
        if (strict) throw e else MediaDecoded(id, "unknown", 0L, 0L, 0L, 0L, 0L)
    }

  private def decodeOneStrict(id: Long, bytes: Array[Byte]): MediaDecoded = {
    if (bytes.length >= 33 && PngSig.indices.forall(i => bytes(i) == PngSig(i))) {
      val len = be32At(bytes, 8)
      val tpe = new String(bytes, 12, 4, "US-ASCII")
      require(tpe == "IHDR" && len == 13, s"malformed PNG for doc $id")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, 12, 4 + len)
      require(crc.getValue.toInt == be32At(bytes, 16 + len), s"PNG IHDR CRC mismatch for doc $id")
      val colorType = bytes(25) & 0xff
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case other => throw new IllegalArgumentException(s"bad color type $other")
      }
      MediaDecoded(id, "png", be32At(bytes, 16).toLong, be32At(bytes, 20).toLong,
        (bytes(24) & 0xff).toLong, channels.toLong, 0L)
    } else if (bytes.length >= 44 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE" &&
        new String(bytes, 12, 4, "US-ASCII") == "fmt ") {
      MediaDecoded(id, "wav", 0L, 0L, le16At(bytes, 34).toLong,
        le16At(bytes, 22).toLong, le32At(bytes, 24).toLong)
    } else MediaDecoded(id, "unknown", 0L, 0L, 0L, 0L, 0L)
  }

  /** Batched real decode over a binary column: one decoder pass per
    * partition (the shape a native codec plugs into at scale).
    * Undecodable payloads degrade to format 'unknown' (lenient
    * decodeOne) so one corrupt row can't abort the job.
    */
  def decodeMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    val ds = src.as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows => rows.map { case (id, bytes) => decodeOne(id, bytes) } }(
      Encoders.product[MediaDecoded]).toDF().orderBy("doc_id")
  }

  /** Deterministic media payload per doc: even ids carry a PNG whose
    * dimensions derive from the id, odd ids a WAV whose channel count
    * and sample rate do. The oracle recomputes the embedded values
    * directly from doc_id.
    */
  def syntheticPayload(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("doc_id"))
    val ds = src.as[Long](Encoders.scalaLong)
    ds.mapPartitions { ids =>
      ids.map { id =>
        val payload =
          if (id % 2 == 0) pngBytes((1 + id % 512).toInt, (1 + (id * 7) % 512).toInt)
          else wavBytes((1 + (id % 2)).toInt, (8000 + (id % 8) * 1000).toInt)
        (id, payload)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("doc_id", "payload")
  }

  /** Oracle for decodeMedia over syntheticPayload: the generator's
    * arithmetic, recomputed from doc_id in DuckDB.
    */
  def decodeMediaSqlDuck(idCol: String): String =
    s"""SELECT $idCol AS doc_id,
       |  CASE WHEN $idCol % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
       |  (CASE WHEN $idCol % 2 = 0 THEN 1 + $idCol % 512 ELSE 0 END)::BIGINT AS width,
       |  (CASE WHEN $idCol % 2 = 0 THEN 1 + ($idCol * 7) % 512 ELSE 0 END)::BIGINT AS height,
       |  (CASE WHEN $idCol % 2 = 0 THEN 8 ELSE 16 END)::BIGINT AS bit_depth,
       |  (CASE WHEN $idCol % 2 = 0 THEN 3 ELSE 1 + ($idCol % 2) END)::BIGINT AS channels,
       |  (CASE WHEN $idCol % 2 = 0 THEN 0 ELSE 8000 + ($idCol % 8) * 1000 END)::BIGINT AS sample_rate
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Oracle: the same arithmetic in DuckDB over the text payload
    * (payload = utf-8 bytes of `textCol`; ASCII corpus keeps char and
    * byte offsets aligned for the quarter split).
    */
  def decodeMetaSqlDuck(idCol: String, textCol: String): String =
    s"""WITH t AS (SELECT $idCol AS doc_id, $textCol AS txt,
       |             length($textCol) AS n, length($textCol) // 4 AS q FROM documents)
       |SELECT doc_id,
       |  octet_length(txt::BLOB)::BIGINT AS n_bytes,
       |  (64 + (('0x' || substr(md5(txt), 1, 2))::BIGINT % 192))::BIGINT AS width,
       |  (64 + (('0x' || substr(md5(txt), 3, 2))::BIGINT % 192))::BIGINT AS height,
       |  substr(md5(substr(txt, 1, q)), 1, 8) AS f1,
       |  substr(md5(substr(txt, q + 1, q)), 1, 8) AS f2,
       |  substr(md5(substr(txt, 2 * q + 1, q)), 1, 8) AS f3,
       |  substr(md5(substr(txt, 3 * q + 1, n - 3 * q)), 1, 8) AS f4
       |FROM t ORDER BY doc_id""".stripMargin
}
