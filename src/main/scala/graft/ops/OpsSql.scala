package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.analyze.Analyzer

/** Shared primitives implemented twice — as Spark Columns and as DuckDB
  * SQL text — so every training-data operator is oracle-checkable.
  * The 60-bit hash is the first 15 hex chars of md5: both engines parse
  * the same digest, so values agree exactly.
  */
object OpsSql {

  /** 60-bit non-negative hash of a string column — the native digest
    * expression (one MessageDigest pass, no hex/conv string round-trip;
    * bit-identical to `conv(substring(md5(c),1,15),16,10)::LONG`,
    * Hash60Spec + every shingle/simhash oracle).
    */
  def hash60(c: Column): Column = graft.functions.Md5Hash60(c)

  def hash60Duck(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Analyzer tokens — the native Catalyst expression (one scan pass
    * inside whole-stage codegen) rather than the 3-regex built-in
    * pipeline; semantics identical (AnalyzerSpec parity + every ops
    * oracle gates it).
    */
  def tokens(c: Column): Column = graft.functions.CodeTokens(c)
  def tokensDuck(e: String): String = Analyzer.tokensSqlDuck(e)

  /** Word 3-shingles over analyzer tokens (1-based element access in
    * both engines). Empty when fewer than 3 tokens.
    */
  def shingles3(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))

  def shingles3Duck(toks: String): String =
    s"list_transform(range(1, greatest(len($toks) - 1, 1)), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])"

  /** MinHash permutation h_i(x) = (a_i * (x mod P) + b_i) mod P with
    * P = 2^31 - 1, a_i = 2i + 1, b_i = (101 i + 17) mod P: overflow-free
    * int64 arithmetic in both engines.
    */
  final val MinhashP = 2147483647L
  def minhashPerm(h: Column, i: Column): Column =
    (((i * 2 + 1) * (h % MinhashP)) + (i * 101 + 17)) % MinhashP
  def minhashPermDuck(h: String, i: String): String =
    // ($i) parenthesized like ($h): a compound operand (e.g. "perm - 1")
    // must not silently rebind precedence on the DuckDB side of a
    // bit-identical-twin contract
    s"(((($i) * 2 + 1) * (($h) % $MinhashP)) + (($i) * 101 + 17)) % $MinhashP"

  /** Bounded-bucket split hash, salted per band. Every dedup/similarity
    * blocking op splits buckets above its size bound into
    * ceil(size/max) sub-buckets by hashing the row id; when the SAME
    * bucket population recurs across bands (identical docs share every
    * band key), the split decision must be INDEPENDENT per band or a
    * pair lands in the same sub-bucket either in every band or in none
    * and the multi-band OR-construction stops protecting recall. The
    * salt therefore enters the md5 digest itself — an affine shift
    * (hash + band*C) would preserve pairwise collision structure mod
    * nSub and decorrelate nothing.
    */
  def saltedHash60(id: Column, salt: Column): Column =
    hash60(concat(id.cast("string"), lit("#"), salt.cast("string")))
  def saltedHash60Duck(id: String, salt: String): String =
    hash60Duck(s"($id)::VARCHAR || '#' || ($salt)::VARCHAR")

  /** Sub-bucket assignment: splitHash mod ceil(size/maxBucket). The
    * arithmetic lives here ONCE because the DuckDB twin must reproduce
    * it bit-for-bit (integer div, non-negative mod) — `sizeExpr` is a
    * SQL expression for the bucket size (a window count or a joined-in
    * size column) so both engines share the exact formula.
    */
  def subSplit(splitHash: Column, sizeExpr: String, maxBucket: Int): Column = {
    // maxBucket <= 0 would make nSub NULL via div-by-zero (non-ANSI
    // Spark), NULL `sub` keys would silently match NOTHING in the
    // candidate equi-join (zero pairs), while the DuckDB twin's `// 0`
    // errors — fail loud on the Spark side too
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    pmod(splitHash, expr(s"($sizeExpr + ${maxBucket - 1}) div $maxBucket"))
  }
  def subSplitDuck(hashExpr: String, sizeExpr: String, maxBucket: Int): String = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    s"($hashExpr) % ((($sizeExpr) + ${maxBucket - 1}) // $maxBucket)"
  }
}
