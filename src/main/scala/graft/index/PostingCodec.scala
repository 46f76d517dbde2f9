package graft.index

import java.io.ByteArrayOutputStream

/** LSB-first bit packing of fixed-width unsigned values, the frame-of-
  * reference layout behind the posting blocks (reference pins
  * `bitpacking 0.9.2` / `tantivy-bitpacker 0.6.0`, Cargo.lock:242,2820;
  * SURVEY.md section 4 O4). Implementation is original.
  */
object BitPack {
  def bitsNeeded(maxVal: Long): Int =
    if (maxVal <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxVal)

  /** Append `values` (each < 2^bits) to `out` as a packed bit stream.
    * Handles the full 1..64-bit range: when a value straddles the
    * 64-bit accumulator (accBits + bits > 64), the low part is flushed
    * as 8 whole bytes and the value's high bits carry over — without
    * this, `values(i) << accBits` silently drops high bits for
    * bits > 56 with a non-empty accumulator.
    */
  def pack(values: Array[Long], bits: Int, out: ByteArrayOutputStream): Unit = {
    if (bits == 0) return
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < values.length) {
      val v = values(i)
      acc |= v << accBits // low (64 - accBits) bits of v
      val total = accBits + bits
      if (total >= 64) {
        var f = 0
        while (f < 8) { out.write((acc & 0xff).toInt); acc >>>= 8; f += 1 }
        acc = if (accBits == 0) 0L else v >>> (64 - accBits)
        accBits = total - 64
      } else {
        accBits = total
      }
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out.write((acc & 0xff).toInt)
  }

  def packedBytes(n: Int, bits: Int): Int = (n * bits + 7) / 8

  /** Read `n` `bits`-wide values starting at byte `off`. Fast word-wise
    * path for bits <= 56 (byte shifts stay below 64); bit-addressed
    * general path for wider values (rare: only huge docId gaps).
    */
  def unpack(bytes: Array[Byte], off: Int, n: Int, bits: Int): Array[Long] = {
    val res = new Array[Long](n)
    if (bits == 0) return res
    if (bits <= 56) {
      var acc = 0L
      var accBits = 0
      var p = off
      val mask = (1L << bits) - 1
      var i = 0
      while (i < n) {
        while (accBits < bits) {
          acc |= (bytes(p) & 0xffL) << accBits
          p += 1
          accBits += 8
        }
        res(i) = acc & mask
        acc >>>= bits
        accBits -= bits
        i += 1
      }
    } else {
      var bitPos = 0L
      var i = 0
      while (i < n) {
        var v = 0L
        var got = 0
        while (got < bits) {
          val byteIdx = off + (bitPos >>> 3).toInt
          val bitOff = (bitPos & 7).toInt
          val take = math.min(8 - bitOff, bits - got)
          val chunk = ((bytes(byteIdx) & 0xff) >>> bitOff) & ((1 << take) - 1)
          v |= chunk.toLong << got
          got += take
          bitPos += take
        }
        res(i) = v
        i += 1
      }
    }
    res
  }
}

/** One decoded posting block. */
final case class DecodedBlock(docIds: Array[Long], tfs: Array[Int], norms: Array[Int])

/** Encoded posting-list payload for one (term, shard) row: docIds
  * delta-encoded and bitpacked in blocks of up to 128 docs, with the
  * doc's term frequency and u8 fieldnorm id packed alongside (norms are
  * denormalized into the postings so query-time scoring needs no join
  * back to a norms table — the Spark-native stand-in for tantivy's
  * columnar fieldnorm file).
  *
  * Block layout at blockOffset(b):
  *   u8 n-1 | u8 bitsDoc | u8 bitsTf | u8 bitsNorm
  *   | varlong firstDocId - prevBlockLastDocId - 1
  *   | packed (n-1) values (delta-1) | packed n values (tf-1) | packed n norms
  *
  * Per-block metadata kept as plain columns for skipping (block-max
  * WAND, SURVEY.md section 2.7 T4): last docId, max tf, min norm id.
  */
object PostingCodec {
  final val BlockSize = 128

  final case class Encoded(
      bytes: Array[Byte],
      blockOffset: Array[Int],
      blockLast: Array[Long],
      blockMaxTf: Array[Int],
      blockMinNorm: Array[Int])

  private def writeVarLong(v0: Long, out: ByteArrayOutputStream): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarLong(bytes: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = off
    var b = 0
    do {
      b = bytes(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  /** docIds must be strictly increasing; tfs >= 1; norms in 0..255. */
  def encode(docIds: Array[Long], tfs: Array[Int], norms: Array[Int]): Encoded = {
    val n = docIds.length
    require(n > 0, "empty posting list")
    val nBlocks = (n + BlockSize - 1) / BlockSize
    val out = new ByteArrayOutputStream(n * 3)
    val blockOffset = new Array[Int](nBlocks)
    val blockLast = new Array[Long](nBlocks)
    val blockMaxTf = new Array[Int](nBlocks)
    val blockMinNorm = new Array[Int](nBlocks)
    var prevLast = -1L
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val len = math.min(BlockSize, n - start)
      blockOffset(b) = out.size()
      val deltas = new Array[Long](len - 1)
      var maxDelta = 0L
      var maxTf = 0
      var minNorm = 255
      var maxNorm = 0
      var i = 0
      while (i < len) {
        val gi = start + i
        if (i > 0) {
          val d = docIds(gi) - docIds(gi - 1) - 1
          require(d >= 0, s"docIds not strictly increasing at $gi")
          deltas(i - 1) = d
          if (d > maxDelta) maxDelta = d
        }
        if (tfs(gi) > maxTf) maxTf = tfs(gi)
        if (norms(gi) < minNorm) minNorm = norms(gi)
        if (norms(gi) > maxNorm) maxNorm = norms(gi)
        i += 1
      }
      val bitsDoc = BitPack.bitsNeeded(maxDelta)
      val bitsTf = BitPack.bitsNeeded((maxTf - 1).toLong)
      val bitsNorm = BitPack.bitsNeeded(maxNorm.toLong)
      out.write(len - 1)
      out.write(bitsDoc)
      out.write(bitsTf)
      out.write(bitsNorm)
      // the adjacent-pair require above never compares ACROSS blocks
      // (i=0 skips it): an out-of-order first docId would varlong-encode
      // a negative delta and silently decode out of order
      require(docIds(start) > prevLast, s"docIds not strictly increasing at $start")
      writeVarLong(docIds(start) - prevLast - 1, out)
      BitPack.pack(deltas, bitsDoc, out)
      BitPack.pack(Array.tabulate(len)(i => (tfs(start + i) - 1).toLong), bitsTf, out)
      BitPack.pack(Array.tabulate(len)(i => norms(start + i).toLong), bitsNorm, out)
      prevLast = docIds(start + len - 1)
      blockLast(b) = prevLast
      blockMaxTf(b) = maxTf
      blockMinNorm(b) = minNorm
      b += 1
    }
    Encoded(out.toByteArray, blockOffset, blockLast, blockMaxTf, blockMinNorm)
  }

  /** Decode block `b`; `prevLast` = blockLast(b-1) or -1 for b == 0. */
  def decodeBlock(bytes: Array[Byte], offset: Int, prevLast: Long): DecodedBlock = {
    val n = (bytes(offset) & 0xff) + 1
    val bitsDoc = bytes(offset + 1) & 0xff
    val bitsTf = bytes(offset + 2) & 0xff
    val bitsNorm = bytes(offset + 3) & 0xff
    val (firstDelta, p0) = readVarLong(bytes, offset + 4)
    val deltas = BitPack.unpack(bytes, p0, n - 1, bitsDoc)
    val p1 = p0 + BitPack.packedBytes(n - 1, bitsDoc)
    val tfsRaw = BitPack.unpack(bytes, p1, n, bitsTf)
    val p2 = p1 + BitPack.packedBytes(n, bitsTf)
    val normsRaw = BitPack.unpack(bytes, p2, n, bitsNorm)
    val docIds = new Array[Long](n)
    docIds(0) = prevLast + 1 + firstDelta
    var i = 1
    while (i < n) { docIds(i) = docIds(i - 1) + 1 + deltas(i - 1); i += 1 }
    DecodedBlock(docIds, tfsRaw.map(v => v.toInt + 1), normsRaw.map(_.toInt))
  }

  /** Fully decode a posting row into parallel arrays. */
  def decodeAll(bytes: Array[Byte], blockOffset: Array[Int], blockLast: Array[Long]): DecodedBlock = {
    val parts = Array.tabulate(blockOffset.length) { b =>
      decodeBlock(bytes, blockOffset(b), if (b == 0) -1L else blockLast(b - 1))
    }
    DecodedBlock(
      parts.flatMap(_.docIds),
      parts.flatMap(_.tfs),
      parts.flatMap(_.norms))
  }
}
