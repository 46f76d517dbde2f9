package graft.index

/** Fieldnorm (document token-count) quantization to a u8 id.
  *
  * The reference delegates scoring to tantivy 0.22 (reference
  * `Cargo.toml:55`), whose fieldnorm code is the Lucene "SmallFloat
  * byte4" scheme: ids 0..23 are exact token counts, larger ids use a
  * 3-bit-mantissa + shift floating encoding (decoded value <= true
  * value). BM25 uses the *decoded* norm, so quantization is part of the
  * score semantics (SURVEY.md section 2.4) and must be reproduced
  * bit-exactly — including in the DuckDB oracle SQL, hence the SQL
  * fragment generators below which emit the same arithmetic for both
  * Spark SQL and DuckDB dialects.
  */
object Fieldnorm {

  /** 255 - longToInt4(Int.MaxValue) = 255 - 231 = 24 exact small values. */
  final val NumFreeValues = 24

  private def longToInt4(i: Long): Int = {
    require(i >= 0, s"negative fieldnorm $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      ((((i >>> shift) & 0x07L) | ((shift + 1).toLong << 3)).toInt)
    }
  }

  private def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  /** token count -> u8 norm id (0..255). Negative lengths fail loud
    * (the longToInt4 require is unreachable for len < 24); lengths so
    * large the encoding exceeds id 255 (>= ~2^31 tokens) saturate to
    * 255, as Lucene's SmallFloat does — never an id that would index
    * past the 256-entry decode tables.
    */
  def encode(len: Long): Int = {
    require(len >= 0, s"negative fieldnorm $len")
    if (len < NumFreeValues) len.toInt
    else math.min(255, NumFreeValues + longToInt4(len - NumFreeValues))
  }

  /** norm id -> decoded (floor-approximate) token count */
  def decode(id: Int): Long = {
    require(id >= 0 && id < 256, s"norm id $id out of range")
    if (id < NumFreeValues) id.toLong
    else NumFreeValues + int4ToLong(id - NumFreeValues)
  }

  /** id -> decoded token count, for scoring inner loops. */
  val Table: Array[Long] = Array.tabulate(256)(decode)

  /** SQL expression computing `encode(lenExpr)`. The emitted text is
    * valid in both Spark SQL (`shiftleft/shiftright`) and DuckDB when
    * `dialectDuck` selects the `<<`/`>>` operators. `bin()` +
    * `length()` stand in for 64-numberOfLeadingZeros in both engines.
    */
  def encodeSql(len: String, duck: Boolean): String = {
    val v = s"($len - 24)"
    def shr(a: String, b: String) = if (duck) s"(($a) >> ($b))" else s"shiftright($a, $b)"
    def shl(a: String, b: String) = if (duck) s"(($a) << ($b))" else s"shiftleft($a, $b)"
    val nbits = s"length(bin($v))"
    // least(255, ...) mirrors encode()'s saturation — without it the
    // SQL id exceeds 255 for len >= 2^31 + 24 (unreachable for real
    // documents, but the dual-dialect contract is "the same arithmetic")
    s"least(255, (CASE WHEN $len < 24 THEN $len ELSE 24 + (CASE WHEN $nbits < 4 THEN $v " +
      s"ELSE ((${shr(v, s"$nbits - 4")}) & 7) | (${shl(s"$nbits - 3", "3")}) END) END))"
  }

  /** SQL expression computing `decode(idExpr)` (same dual-dialect contract). */
  def decodeSql(id: String, duck: Boolean): String = {
    val i = s"($id - 24)"
    def shr(a: String, b: String) = if (duck) s"(($a) >> ($b))" else s"shiftright($a, $b)"
    def shl(a: String, b: String) = if (duck) s"(($a) << ($b))" else s"shiftleft($a, $b)"
    s"(CASE WHEN $id < 24 THEN $id ELSE 24 + (CASE WHEN ${shr(i, "3")} = 0 THEN ($i) & 7 " +
      s"ELSE ${shl(s"(($i) & 7) | 8", s"(${shr(i, "3")}) - 1")} END) END)"
  }
}
