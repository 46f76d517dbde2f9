package graft.ops

/** From-scratch zlib/DEFLATE decoder (public specs RFC 1950 + RFC 1951
  * — no java.util.zip.Inflater), the decompression half of the real PNG
  * pixel pipeline (Multimodal.decodePixels). Supports all three block
  * types (stored, fixed Huffman, dynamic Huffman) and verifies the zlib
  * Adler-32 trailer. Malformed input fails with IllegalArgumentException
  * — never a hang or an array crash escaping to the caller with a
  * misleading trace — so Multimodal's lenient per-row contract can catch
  * it. MultimodalSpec cross-checks this decoder bit-for-bit against
  * java.util.zip.Deflater output at every compression level (level 0 =
  * stored blocks, 1 = fixed-leaning, 6/9 = dynamic Huffman).
  */
object Inflate {

  /** Inflate a full zlib stream (RFC 1950 wrapper around RFC 1951).
    * `maxOut` bounds the DECOMPRESSED size: deflate expands up to
    * ~1000x, so a caller that knows the expected plaintext size (e.g.
    * PNG scanlines from IHDR) must cap it or a crafted payload can
    * balloon into heap before any structural check fires; exceeding the
    * cap fails with IllegalArgumentException like every other
    * malformed-input path.
    */
  def zlib(data: Array[Byte], maxOut: Int = Int.MaxValue): Array[Byte] = {
    require(data.length >= 6, s"zlib stream truncated: ${data.length} bytes")
    val cmf = data(0) & 0xff
    val flg = data(1) & 0xff
    require((cmf & 0x0f) == 8, s"zlib CM ${cmf & 0x0f} is not deflate")
    require((cmf * 256 + flg) % 31 == 0, "zlib header check failed")
    require((flg & 0x20) == 0, "zlib FDICT preset dictionaries unsupported")
    val (out, next) = raw(data, 2, maxOut)
    require(next + 4 <= data.length, "zlib stream truncated before Adler-32")
    val adler = ((data(next) & 0xffL) << 24) | ((data(next + 1) & 0xffL) << 16) |
      ((data(next + 2) & 0xffL) << 8) | (data(next + 3) & 0xffL)
    require(adler == adler32(out), "zlib Adler-32 mismatch (corrupt deflate payload)")
    out
  }

  /** RFC 1950 Adler-32, from the spec (s1/s2 mod 65521). */
  def adler32(data: Array[Byte]): Long = {
    var s1 = 1L
    var s2 = 0L
    var i = 0
    while (i < data.length) {
      s1 += data(i) & 0xff
      if (s1 >= 65521L) s1 -= 65521L
      s2 += s1
      if (s2 >= 65521L) s2 %= 65521L
      i += 1
    }
    (s2 << 16) | s1
  }

  /** LSB-first bit reader over the byte array (RFC 1951 section 3.1.1:
    * bits are packed starting from the least significant bit).
    */
  private final class BitReader(data: Array[Byte], startByte: Int) {
    var bytePos: Int = startByte
    private var bitBuf: Int = 0
    private var bitCnt: Int = 0
    def bits(n: Int): Int = {
      while (bitCnt < n) {
        require(bytePos < data.length, "deflate stream truncated mid-block")
        bitBuf |= (data(bytePos) & 0xff) << bitCnt
        bytePos += 1
        bitCnt += 8
      }
      val v = bitBuf & ((1 << n) - 1)
      bitBuf >>>= n
      bitCnt -= n
      v
    }
    /** Drop to the next byte boundary (stored-block alignment). */
    def alignByte(): Unit = { bitBuf = 0; bitCnt = 0 }
  }

  /** Canonical Huffman decoder from a code-length array (RFC 1951
    * section 3.2.2): per-length symbol counts + first-code offsets,
    * decoded bit-by-bit (codes are at most 15 bits, so the walk is
    * bounded — no crafted input can loop it).
    */
  private final class Huffman(lengths: Array[Int]) {
    private val maxBits = 15
    private val count = new Array[Int](maxBits + 1)
    lengths.foreach { l =>
      require(l >= 0 && l <= maxBits, s"huffman code length $l out of range")
      if (l > 0) count(l) += 1
    }
    // first canonical code of each length, and the symbol table sorted
    // by (length, symbol) — the canonical order
    private val firstCode = new Array[Int](maxBits + 1)
    private val firstSym = new Array[Int](maxBits + 1)
    private val symbols = new Array[Int](lengths.count(_ > 0))
    locally {
      var code = 0
      var sym = 0
      var bitsN = 1
      while (bitsN <= maxBits) {
        code = (code + count(bitsN - 1)) << 1
        firstCode(bitsN) = code
        firstSym(bitsN) = sym
        sym += count(bitsN)
        bitsN += 1
      }
      // over-subscribed trees are malformed input, not a crash site:
      // code space used must not exceed 2^len at any length
      var used = 0
      bitsN = 1
      while (bitsN <= maxBits) {
        used = (used << 1) + count(bitsN)
        require(used <= (1 << bitsN), "over-subscribed huffman code")
        bitsN += 1
      }
      var s = 0
      val byLen = Array.fill(maxBits + 1)(0)
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) { symbols(firstSym(l) + byLen(l)) = s; byLen(l) += 1 }
        s += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < maxBits) {
        code = (code << 1) | br.bits(1)
        len += 1
        if (count(len) > 0 && code - firstCode(len) < count(len))
          return symbols(firstSym(len) + (code - firstCode(len)))
      }
      throw new IllegalArgumentException("invalid huffman code in deflate stream")
    }
  }

  // RFC 1951 section 3.2.5: length codes 257..285 and distance codes
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  private lazy val fixedLit: Huffman = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    new Huffman(l)
  }
  private lazy val fixedDist: Huffman = new Huffman(Array.fill(30)(5))

  /** Growable output buffer; back-references copy byte-by-byte from the
    * already-written output (RFC 1951: a distance may overlap the
    * current position — the run-length idiom).
    */
  private final class Out(hint: Int, maxOut: Int) {
    private var buf = new Array[Byte](math.max(64, math.min(hint, maxOut)))
    var n: Int = 0
    private def ensure(extra: Int): Unit = {
      // the cap check runs BEFORE any allocation: a crafted stream must
      // fail at the declared bound, not after ballooning into heap
      require(extra <= maxOut - n,
        s"decompressed output exceeds the caller's $maxOut-byte bound")
      if (n + extra > buf.length) {
        var cap = buf.length * 2
        while (cap < n + extra) cap *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(cap, maxOut))
      }
    }
    def add(b: Byte): Unit = { ensure(1); buf(n) = b; n += 1 }
    def addAll(src: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(src, off, buf, n, len); n += len
    }
    def copyBack(dist: Int, len: Int): Unit = {
      require(dist >= 1 && dist <= n, s"deflate back-reference distance $dist beyond output $n")
      ensure(len)
      var i = 0
      while (i < len) { buf(n) = buf(n - dist); n += 1; i += 1 }
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  // code-length code order, RFC 1951 section 3.2.7
  private val ClcOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** Inflate a bare deflate stream starting at byte offset `start`;
    * returns (decoded bytes, offset of the first byte after the stream).
    * `maxOut` bounds the decompressed size (see zlib).
    */
  def raw(data: Array[Byte], start: Int, maxOut: Int = Int.MaxValue): (Array[Byte], Int) = {
    val br = new BitReader(data, start)
    val out = new Out(data.length * 4, maxOut)
    var fin = false
    while (!fin) {
      fin = br.bits(1) == 1
      br.bits(2) match {
        case 0 => // stored: align, LEN + ~LEN check, raw copy
          br.alignByte()
          require(br.bytePos + 4 <= data.length, "stored block header truncated")
          val len = (data(br.bytePos) & 0xff) | ((data(br.bytePos + 1) & 0xff) << 8)
          val nlen = (data(br.bytePos + 2) & 0xff) | ((data(br.bytePos + 3) & 0xff) << 8)
          require((len ^ 0xffff) == nlen, "stored block LEN/NLEN mismatch")
          br.bytePos += 4
          require(br.bytePos + len <= data.length, "stored block truncated")
          out.addAll(data, br.bytePos, len)
          br.bytePos += len
        case 1 => inflateBlock(br, out, fixedLit, fixedDist)
        case 2 => // dynamic: decode the two code tables, then the block
          val hlit = br.bits(5) + 257
          val hdist = br.bits(5) + 1
          val hclen = br.bits(4) + 4
          val clcLen = new Array[Int](19)
          var i = 0
          while (i < hclen) { clcLen(ClcOrder(i)) = br.bits(3); i += 1 }
          val clc = new Huffman(clcLen)
          val lens = new Array[Int](hlit + hdist)
          var p = 0
          while (p < lens.length) {
            clc.decode(br) match {
              case 16 =>
                require(p > 0, "repeat code 16 with no previous length")
                val rep = 3 + br.bits(2)
                require(p + rep <= lens.length, "code-length repeat overflows table")
                var r = 0
                while (r < rep) { lens(p) = lens(p - 1); p += 1; r += 1 }
              case 17 => val rep = 3 + br.bits(3)
                require(p + rep <= lens.length, "code-length repeat overflows table")
                p += rep // zeros (array pre-zeroed)
              case 18 => val rep = 11 + br.bits(7)
                require(p + rep <= lens.length, "code-length repeat overflows table")
                p += rep
              case s => lens(p) = s; p += 1
            }
          }
          require(lens(256) > 0, "dynamic block has no end-of-block code")
          inflateBlock(br, out,
            new Huffman(java.util.Arrays.copyOfRange(lens, 0, hlit)),
            new Huffman(java.util.Arrays.copyOfRange(lens, hlit, hlit + hdist)))
        case t => throw new IllegalArgumentException(s"invalid deflate block type $t")
      }
    }
    (out.result(), br.bytePos)
  }

  private def inflateBlock(br: BitReader, out: Out, lit: Huffman, dist: Huffman): Unit = {
    var done = false
    while (!done) {
      val sym = lit.decode(br)
      if (sym < 256) out.add(sym.toByte)
      else if (sym == 256) done = true
      else {
        require(sym <= 285, s"invalid length symbol $sym")
        val li = sym - 257
        val len = LenBase(li) + br.bits(LenExtra(li))
        val ds = dist.decode(br)
        require(ds < 30, s"invalid distance symbol $ds")
        val d = DistBase(ds) + br.bits(DistExtra(ds))
        out.copyBack(d, len)
      }
    }
  }
}
