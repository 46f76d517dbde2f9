package graft.query

import graft.index.Fieldnorm

/** BM25 scoring, matching the published tantivy 0.22 formula (the
  * reference pins tantivy at Cargo.toml:55; SURVEY.md section 2.4):
  *
  *   idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))          [f32]
  *   weight(t)   = idf(t) * (1 + k1)
  *   cache(norm) = k1 * (1 - b + b * decodedNorm / avgFieldnorm) [f32]
  *   score(t, d) = weight(t) * tf / (tf + cache(norm(d)))        [f32]
  *
  * k1 = 1.2, b = 0.75; fieldnorms are u8-quantized (Fieldnorm);
  * avgFieldnorm = totalTokens / numDocs as f32. A conjunction's score
  * is the sum of its clauses' scores (tantivy BooleanQuery).
  *
  * Two precision modes: F32 is the rank-identity path (tantivy
  * arithmetic); F64 mirrors the DuckDB oracle SQL (pure double) so the
  * driver's hash-compare sees bit-stable values after round(_, 4).
  */
object Bm25 {
  // Doubles are the source of truth (they mirror the DuckDB oracle SQL
  // verbatim); the f32 constants are derived so tuning K1/B can never
  // silently de-couple the two precision paths. 1.2d.toFloat == 1.2f
  // and 0.75d.toFloat == 0.75f exactly, so the derivation is lossless.
  final val K1d: Double = 1.2d
  final val Bd: Double = 0.75d
  final val K1: Float = K1d.toFloat
  final val B: Float = Bd.toFloat

  def idfF32(df: Long, n: Long): Float = {
    val x = ((n - df).toFloat + 0.5f) / (df.toFloat + 0.5f)
    math.log((1.0f + x).toDouble).toFloat
  }

  def idfF64(df: Long, n: Long): Double =
    math.log(1.0d + ((n - df).toDouble + 0.5d) / (df.toDouble + 0.5d))

  def weightF32(df: Long, n: Long): Float = idfF32(df, n) * (1.0f + K1)

  def weightF64(df: Long, n: Long): Double = idfF64(df, n) * (1.0d + K1d)

  /** Precomputed per-normId denominators: cache(id) = k1*(1-b+b*norm/avgdl). */
  def normCacheF32(avgFieldnorm: Float): Array[Float] =
    Array.tabulate(256)(id => K1 * (1.0f - B + B * Fieldnorm.Table(id).toFloat / avgFieldnorm))

  def normCacheF64(avgFieldnorm: Double): Array[Double] =
    Array.tabulate(256)(id => K1d * (1.0d - Bd + Bd * Fieldnorm.Table(id).toDouble / avgFieldnorm))

  @inline def tfScoreF32(weight: Float, tf: Int, cache: Float): Float =
    weight * tf.toFloat / (tf.toFloat + cache)

  @inline def tfScoreF64(weight: Double, tf: Int, cache: Double): Double =
    weight * tf.toDouble / (tf.toDouble + cache)
}
