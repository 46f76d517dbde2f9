package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index.IndexStore

/** Structured Streaming skin over the epoch-based incremental build
  * (SURVEY.md section 2.10): the reference has no streaming operators —
  * its streaming-shaped capability is incremental index maintenance
  * (synchronous REST INSERTs become tablet blobs, README.md:21,
  * writer.rs:244-266). Here each micro-batch is one upsert epoch:
  * `foreachBatch` calls IndexStore.appendEpoch with a snapshot id
  * derived from the STREAM IDENTITY (checkpoint location) plus the
  * batch id, so restart-after-crash replays of a committed batch are
  * no-ops (exactly-once index commits on top of at-least-once delivery
  * — the same idempotent-resume contract as the batch path), while a
  * DIFFERENT stream (fresh checkpoint, batch ids restarting at 0)
  * cannot collide with this one's committed batches and silently drop
  * its data.
  *
  * Writer contract: ONE active writer per index dir — the manifest
  * commit is version-CAS-guarded (IndexStore.commitVersion), so a
  * concurrent deleteByQuery/compact against a live stream fails loudly
  * rather than silently discarding epochs.
  */
object StreamingIndexer {

  /** Stable per-stream namespace: the checkpoint location IS the stream
    * identity (same checkpoint = same replayable batch ids).
    */
  private def streamNs(checkpointDir: String): String = {
    val canon = java.nio.file.Paths.get(checkpointDir).toAbsolutePath.normalize.toString
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(4).map(b => f"${b & 0xFF}%02x").mkString
  }

  /** Start indexing a streaming DataFrame of documents into `indexDir`
    * (which must already exist via IndexStore.create).
    *
    * Within one micro-batch, duplicate primary keys collapse to a
    * single live version (the upsert contract; appendEpoch's tombstone
    * pass only covers PREVIOUS epochs, so an un-deduped batch would
    * leave both copies live forever). The surviving row for an
    * intra-batch duplicate is arbitrary — sources that need a
    * deterministic winner must resolve versions upstream.
    *
    * `compactEvery` > 0 runs tiered compaction after every N committed
    * batches: an unbounded stream of small epochs otherwise grows the
    * manifest and the per-append tombstone pass linearly with batch
    * count (and the query-side segment union with it).
    */
  def start(stream: DataFrame, indexDir: String, checkpointDir: String,
      compactEvery: Int = 0): StreamingQuery = {
    val ns = streamNs(checkpointDir)
    val keyCols = {
      val (_, config, _) = IndexStore.readManifest(stream.sparkSession, indexDir)
      config.keyCols
    }
    // migration: stores written before ids were namespaced hold
    // 'stream-batch-N' checkpoints. A crash-replayed in-flight batch
    // from such a stream must stay a no-op under the new ids too, or
    // the upgrade double-appends it as a redundant epoch. The legacy
    // set is frozen at upgrade time (old-format ids can never grow),
    // so one read at start() suffices. Crucially the no-op applies ONLY
    // when this start() RESUMES a pre-upgrade stream — i.e. the
    // checkpoint dir already holds committed offsets. A NEW stream
    // (fresh checkpoint, batch ids restarting at 0) against a store
    // with legacy ids must commit unconditionally under its namespaced
    // id, or its batches 0..N are silently dropped while the stream
    // checkpoint advances — permanent data loss.
    val resumesExistingCheckpoint: Boolean = {
      val off = new java.io.File(checkpointDir, "offsets")
      off.isDirectory && off.list() != null && off.list().nonEmpty
    }
    val legacyCommitted: Set[String] =
      if (!resumesExistingCheckpoint) Set.empty
      else IndexStore.checkpoints(stream.sparkSession, indexDir).map(_.snapshotId)
        .filter(_.matches("stream-batch-\\d+")).toSet
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // appendEpoch runs several actions over the batch (index build,
        // lineage, tombstone pass) plus the isEmpty probe — without a
        // persist each action re-reads the micro-batch source files
        val deduped = batch.dropDuplicates(keyCols)
        deduped.persist()
        try {
          if (!deduped.isEmpty && !legacyCommitted.contains(s"stream-batch-$batchId")) {
            val committed =
              IndexStore.appendEpoch(deduped, indexDir, s"stream-$ns-batch-$batchId")
            if (committed && compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
              IndexStore.compact(deduped.sparkSession, indexDir)
          }
        } finally { deduped.unpersist(); () }
      }
      .start()
  }

  /** Convenience source: a directory of parquet document files consumed
    * incrementally (new files become new epochs).
    */
  def fromParquetDir(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)
}
