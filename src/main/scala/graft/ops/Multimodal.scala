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

  /** Deterministic audio payload WITH samples: mono 16-bit PCM WAV at
    * 8 kHz, 64 + (id % 64) samples, sample i = a fixed mixing function
    * of (id, i) — so a frame-sampling oracle can recompute any sample
    * from doc_id arithmetic alone.
    */
  def sampleValue(id: Long, i: Long): Long =
    // reduce id mod 65536 BEFORE the multiply: (id * c) mod 65536 ==
    // ((id mod 65536) * c) mod 65536, so values are identical — but the
    // unreduced product wraps silently in the JVM above id ~3.47e9
    // while DuckDB BIGINT raises Out of Range, splitting the oracle
    ((id % 65536L) * 2654435761L + i * 40503L) % 65536L - 32768L

  def wavBytesWithSamples(id: Long): Array[Byte] = {
    val n = (64 + id % 64).toInt
    val b = java.nio.ByteBuffer.allocate(44 + 2 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000).putInt(16000)
      .putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { b.putShort(sampleValue(id, i).toShort); i += 1 }
    b.array()
  }

  def syntheticAudioPayload(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("doc_id"))
    val ds = src.as[Long](Encoders.scalaLong)
    ds.mapPartitions(ids => ids.map(id => (id, wavBytesWithSamples(id))))(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("doc_id", "payload")
  }

  final case class FrameSample(doc_id: Long, frame_no: Long, pos: Long, sample: Long)

  /** Frame sampling over an audio binary column: a REAL RIFF chunk walk
    * (arbitrary chunk order, skips unknown chunks) to the `data` chunk,
    * then `nFrames` evenly spaced 16-bit PCM frames — frame j sits at
    * sample floor(j * nSamples / nFrames). The per-partition batched
    * mapPartitions shape is where a native resampler plugs in at scale;
    * payloads that aren't PCM WAV yield no rows (lenient, like
    * decodeMedia) so one bad payload can't abort a corpus-sized job.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      nFrames: Int = 8): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    val ds = src.as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        try {
          if (bytes.length < 44 || new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
              new String(bytes, 8, 4, "US-ASCII") != "WAVE") Iterator.empty
          else {
            // chunk walk: [ckId(4) ckSize(4) body(ckSize)] from offset 12
            var off = 12
            var dataOff = -1
            var dataLen = 0
            var pcm16 = false
            var corrupt = false
            // walk until BOTH fmt and data are seen (chunk order is
            // arbitrary per the RIFF spec — stopping at the data chunk
            // would silently drop payloads whose fmt chunk follows it)
            while (off + 8 <= bytes.length && (dataOff < 0 || !pcm16) && !corrupt) {
              val ck = new String(bytes, off, 4, "US-ASCII")
              val sz = le32At(bytes, off + 4)
              // le32At is SIGNED: a crafted size >= 2^31 comes back
              // negative and would advance `off` by zero or backwards,
              // spinning this task forever — a hang is worse than the
              // abort the lenient contract already forbids, so bail
              if (sz < 0) corrupt = true
              else {
                if (ck == "fmt " && sz >= 16)
                  pcm16 = le16At(bytes, off + 8) == 1 && le16At(bytes, off + 22) == 16 &&
                    le16At(bytes, off + 10) == 1 // PCM, 16-bit, mono
                else if (ck == "data") { dataOff = off + 8; dataLen = sz }
                off += 8 + sz + (sz & 1) // chunks are word-aligned
              }
            } // the loop only runs while fmt or data is still unseen, so a
              // corrupt exit always leaves pcm16 false OR dataOff -1 (possibly
              // not both) and the guard below rejects either way
            val nSamples = dataLen / 2
            // bound check in Long: dataLen near 2^31 overflows the Int
            // sum to negative and would sneak past a signed compare
            if (!pcm16 || dataOff < 0 || nSamples == 0 ||
                dataOff.toLong + dataLen.toLong > bytes.length) Iterator.empty
            else (0 until nFrames).toVector.map { j =>
              // materialized (not a lazy iterator): flatMap consumes the
              // rows AFTER this try/catch returns, so any decode error
              // surfacing lazily would escape the lenient handler and
              // abort the job the contract says one bad row can't
              val pos = j.toLong * nSamples / nFrames
              FrameSample(id, j.toLong, pos, le16At(bytes, dataOff + 2 * pos.toInt).toShort.toLong)
            }.iterator
          }
        } catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => Iterator.empty }
      }
    }(Encoders.product[FrameSample]).toDF().orderBy("doc_id", "frame_no")
  }

  /** Oracle for sampleFrames over syntheticAudioPayload: nSamples and
    * every sample value recomputed from doc_id arithmetic in DuckDB.
    */
  def sampleFramesSqlDuck(idCol: String, nFrames: Int = 8): String =
    s"""WITH f AS (SELECT unnest(range(0, $nFrames)) AS frame_no),
       |d AS (SELECT $idCol AS doc_id, 64 + $idCol % 64 AS n FROM documents),
       |p AS (SELECT doc_id, frame_no, (frame_no * n) // $nFrames AS pos FROM d CROSS JOIN f)
       |SELECT doc_id, frame_no::BIGINT AS frame_no, pos::BIGINT AS pos,
       |  (((doc_id % 65536) * 2654435761 + pos * 40503) % 65536 - 32768)::BIGINT AS sample
       |FROM p ORDER BY doc_id, frame_no""".stripMargin

  /** Resize planning over real decoded PNG headers: aspect-fit into a
    * target box (the arithmetic every image pipeline runs before the
    * pixel pass). The pixel resample itself requires a codec this
    * container does not ship — by design the STUB boundary (builder
    * contract): the plumbing (decode → plan → batched per-partition
    * kernel shape) is real and oracle-gated, the pixel kernel is not.
    */
  def resizePlan(df: DataFrame, idCol: String, payloadCol: String,
      box: Int = 64): DataFrame = {
    val dec = decodeMedia(df, idCol, payloadCol)
      .filter(col("format") === "png")
    // integer aspect-fit: scale the long edge to `box`; `div` (exact
    // integer division, not double `/`) mirrors DuckDB's `//` bit-for-bit
    dec.select(col("doc_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(box.toLong))
          .otherwise(expr(s"width * $box div height")).cast("long").as("out_w"),
        when(col("width") >= col("height"), expr(s"height * $box div width"))
          .otherwise(lit(box.toLong)).cast("long").as("out_h"))
      .orderBy("doc_id")
  }

  def resizePlanSqlDuck(idCol: String, box: Int = 64): String =
    s"""WITH d AS (SELECT $idCol AS doc_id,
       |  (1 + $idCol % 512)::BIGINT AS width,
       |  (1 + ($idCol * 7) % 512)::BIGINT AS height
       |  FROM documents WHERE $idCol % 2 = 0)
       |SELECT doc_id, width, height,
       |  (CASE WHEN width >= height THEN $box ELSE width * $box // height END)::BIGINT AS out_w,
       |  (CASE WHEN width >= height THEN height * $box // width ELSE $box END)::BIGINT AS out_h
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // REAL PNG PIXEL pipeline: from-scratch zlib inflate (Inflate.zlib,
  // RFC 1950/1951) + scanline unfiltering (all 5 RFC 2083 filters) +
  // integer box-filter resize. The generator emits real deflate-
  // compressed, per-row-filtered RGB PNGs whose pixel function is
  // doc_id arithmetic, so the q55 oracle recomputes the pixel sum AND
  // the resized checksum in DuckDB — any inflate/unfilter/resize bug
  // breaks hash parity. This closes the former pixel-kernel stub:
  // resizePlan's arithmetic now has the matching pixel pass.
  // ---------------------------------------------------------------

  final case class PixelStats(doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, px_sum: Long, resized_sum: Long)

  /** RFC 2083 Paeth predictor (shared by the encoder and decoder). */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** The deterministic pixel function: channel c of pixel (x, y) of doc
    * id — pure doc_id arithmetic so DuckDB recomputes it exactly.
    */
  def pixelValue(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 5) % 256).toInt

  def pixelDims(id: Long): (Int, Int) = ((4 + id % 13).toInt, (3 + (id * 5) % 11).toInt)

  private def writeChunk(out: java.io.ByteArrayOutputStream, tpe: String,
      data: Array[Byte]): Unit = {
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    out.write(be32(data.length), 0, 4)
    val body = tpe.getBytes("US-ASCII") ++ data
    out.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32
    crc.update(body)
    out.write(be32(crc.getValue.toInt), 0, 4)
  }

  /** A REAL 8-bit RGB PNG with pixel data: rows filtered with type
    * (id + y) % 5 (all five filters exercised), scanlines
    * deflate-compressed, IDAT split in two chunks (multi-IDAT
    * concatenation is part of the spec). The COMPRESSOR may use the
    * JVM's Deflater — the engine's decode direction is the from-scratch
    * half, and MultimodalSpec cross-checks Inflate against Deflater
    * output at every level.
    */
  def pngBytesWithPixels(id: Long): Array[Byte] = {
    val (w, h) = pixelDims(id)
    val stride = w * 3
    val raw = Array.tabulate(h, stride)((y, i) => pixelValue(id, i / 3, y, i % 3))
    val scan = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = ((id + y) % 5).toInt
      scan(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= 3) raw(y)(i - 3) else 0
        val b = if (y > 0) raw(y - 1)(i) else 0
        val cc = if (y > 0 && i >= 3) raw(y - 1)(i - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, cc)
        }
        scan(y * (stride + 1) + 1 + i) = ((raw(y)(i) - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater(6)
    defl.setInput(scan); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(scan.length / 2 + 32)
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) { val n = defl.deflate(tmp); zout.write(tmp, 0, n) }
    defl.end()
    val idat = zout.toByteArray
    val out = new java.io.ByteArrayOutputStream(idat.length + 128)
    out.write(PngSig, 0, 8)
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    writeChunk(out, "IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    val half = idat.length / 2
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, 0, half))
    writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(idat, half, idat.length))
    writeChunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  def syntheticPixelPayload(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("doc_id"))
    val ds = src.as[Long](Encoders.scalaLong)
    ds.mapPartitions(ids => ids.map(id => (id, pngBytesWithPixels(id))))(
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("doc_id", "payload")
  }

  /** Decode a full 8-bit RGB PNG to raw pixels: chunk walk with per-
    * chunk CRC32 verification, multi-IDAT concatenation, from-scratch
    * zlib inflate, scanline unfiltering. Fails with
    * IllegalArgumentException on any structural or deflate corruption.
    */
  def decodePngPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "not a PNG payload")
    var off = 8
    var w = -1
    var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var end = false
    while (!end) {
      require(off + 8 <= bytes.length, "PNG chunk header truncated")
      val len = be32At(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"PNG chunk length $len overflows payload")
      val tpe = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == be32At(bytes, off + 8 + len), s"PNG $tpe CRC mismatch")
      tpe match {
        case "IHDR" =>
          require(len == 13, "malformed IHDR")
          w = be32At(bytes, off + 8); h = be32At(bytes, off + 12)
          require(w > 0 && h > 0, s"bad PNG dimensions ${w}x$h")
          require((bytes(off + 16) & 0xff) == 8 && (bytes(off + 17) & 0xff) == 2,
            "pixel decode supports 8-bit RGB (depth 8, color type 2)")
          require((bytes(off + 20) & 0xff) == 0, "interlaced PNGs unsupported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => end = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(w > 0, "PNG without IHDR")
    val stride = w * 3
    // IHDR-derived output bound INTO the inflate: without it a corrupt
    // or crafted payload could expand ~1000x into heap before the
    // length check below ever ran (the per-row catch handles IAE, not
    // allocation pressure)
    val expected = (stride + 1).toLong * h
    require(expected <= Int.MaxValue, s"PNG ${w}x$h scanline volume overflows")
    val scan = Inflate.zlib(idat.toByteArray, maxOut = expected.toInt)
    require(scan.length == (stride + 1) * h,
      s"decompressed scanlines ${scan.length}B != expected ${(stride + 1) * h}B")
    val px = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val ft = scan(y * (stride + 1)) & 0xff
      require(ft <= 4, s"unknown PNG filter type $ft")
      var i = 0
      while (i < stride) {
        val f = scan(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= 3) px(y * stride + i - 3) else 0
        val b = if (y > 0) px((y - 1) * stride + i) else 0
        val cc = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ => paeth(a, b, cc)
        }
        px(y * stride + i) = (f + pred) & 0xff
        i += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Integer box-filter resize: out(ox, oy, c) = floor-mean of the
    * source box [ox*w/ow, (ox+1)*w/ow) x [oy*h/oh, (oy+1)*h/oh), with
    * degenerate boxes clamped to one pixel (upscale case) — the pixel
    * kernel resizePlan's aspect-fit arithmetic plans for.
    */
  def boxResize(px: Array[Int], w: Int, h: Int, ow: Int, oh: Int): Array[Int] = {
    val out = new Array[Int](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      val y0 = oy * h / oh
      val y1 = math.max((oy + 1) * h / oh, y0 + 1)
      var ox = 0
      while (ox < ow) {
        val x0 = ox * w / ow
        val x1 = math.max((ox + 1) * w / ow, x0 + 1)
        var c = 0
        while (c < 3) {
          var s = 0L
          var n = 0L
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) { s += px(yy * w * 3 + xx * 3 + c); n += 1; xx += 1 }
            yy += 1
          }
          out((oy * ow + ox) * 3 + c) = (s / n).toInt
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Batched pixel pass over a PNG binary column: decode (inflate +
    * unfilter), aspect-fit box-resize into `box`, and emit integer
    * invariants of BOTH images (pixel sum of the original, value sum of
    * the resized) — hash-exact against the q55 DuckDB oracle. Corrupt
    * payloads yield no rows (lenient, like decodeMedia).
    */
  def pixelStats(df: DataFrame, idCol: String, payloadCol: String,
      box: Int = 8): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    val ds = src.as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        try {
          val (w, h, px) = decodePngPixels(bytes)
          val (ow, oh) =
            if (w >= h) (box, math.max(1, h * box / w)) else (math.max(1, w * box / h), box)
          val r = boxResize(px, w, h, ow, oh)
          var ps = 0L
          px.foreach(ps += _)
          var rs = 0L
          r.foreach(rs += _)
          // materialized single row: errors must surface INSIDE this
          // try (same lazy-iterator trap sampleFrames documents)
          Iterator.single(PixelStats(id, w.toLong, h.toLong, ow.toLong, oh.toLong, ps, rs))
        } catch {
          case _: IllegalArgumentException | _: IndexOutOfBoundsException => Iterator.empty
        }
      }
    }(Encoders.product[PixelStats]).toDF().orderBy("doc_id")
  }

  /** q55 oracle: pixel sum and resized checksum recomputed from doc_id
    * arithmetic alone in DuckDB — mirrors pixelValue/pixelDims, the
    * aspect-fit dims, and boxResize's floor-mean boxes exactly.
    */
  def pixelStatsSqlDuck(idCol: String, box: Int = 8): String =
    s"""WITH d AS (SELECT $idCol AS doc_id,
       |    (4 + $idCol % 13)::BIGINT AS w, (3 + ($idCol * 5) % 11)::BIGINT AS h
       |  FROM documents),
       |dims AS (SELECT doc_id, w, h,
       |    CASE WHEN w >= h THEN $box ELSE greatest(1, w * $box // h) END AS ow,
       |    CASE WHEN w >= h THEN greatest(1, h * $box // w) ELSE $box END AS oh
       |  FROM d),
       |xs AS (SELECT unnest(range(16)) AS x), ys AS (SELECT unnest(range(13)) AS y),
       |cs AS (SELECT unnest(range(3)) AS c),
       |px AS (SELECT d.doc_id,
       |    sum((d.doc_id * 31 + xs.x * 7 + ys.y * 13 + cs.c * 5) % 256) AS px_sum
       |  FROM d JOIN xs ON xs.x < d.w JOIN ys ON ys.y < d.h CROSS JOIN cs
       |  GROUP BY d.doc_id),
       |boxes AS (SELECT dims.doc_id, dims.w, dims.h, ox.x AS ox, oy.y AS oy,
       |    (ox.x * dims.w) // dims.ow AS x0,
       |    greatest(((ox.x + 1) * dims.w) // dims.ow, (ox.x * dims.w) // dims.ow + 1) AS x1,
       |    (oy.y * dims.h) // dims.oh AS y0,
       |    greatest(((oy.y + 1) * dims.h) // dims.oh, (oy.y * dims.h) // dims.oh + 1) AS y1
       |  FROM dims JOIN xs ox ON ox.x < dims.ow JOIN ys oy ON oy.y < dims.oh),
       |bavg AS (SELECT b.doc_id, b.ox, b.oy, cs.c,
       |    sum((b.doc_id * 31 + xs.x * 7 + ys.y * 13 + cs.c * 5) % 256) // count(*) AS v
       |  FROM boxes b
       |  JOIN xs ON xs.x >= b.x0 AND xs.x < b.x1
       |  JOIN ys ON ys.y >= b.y0 AND ys.y < b.y1
       |  CROSS JOIN cs
       |  GROUP BY b.doc_id, b.ox, b.oy, cs.c),
       |rs AS (SELECT doc_id, sum(v) AS resized_sum FROM bavg GROUP BY doc_id)
       |SELECT dims.doc_id, dims.w AS width, dims.h AS height,
       |  dims.ow::BIGINT AS out_w, dims.oh::BIGINT AS out_h,
       |  px.px_sum::BIGINT AS px_sum, rs.resized_sum::BIGINT AS resized_sum
       |FROM dims JOIN px USING (doc_id) JOIN rs USING (doc_id)
       |ORDER BY doc_id""".stripMargin

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
