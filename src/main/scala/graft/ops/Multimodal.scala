package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat media as opaque binary columns
  * with typed metadata extracted by a batched per-partition "decoder".
  * The image/audio codecs are NOT in this container, so the decode step
  * is a clearly-marked deterministic STUB (md5-derived dimensions,
  * quarter-frame digests) — but the Spark plumbing is real: binary
  * column, typed Dataset, mapPartitions batch shape, stable schema.
  * Every stubbed value is pure arithmetic over the payload, so the
  * DuckDB oracle can verify the full pipeline end-to-end.
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
