package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index.IndexStore

/** Structured Streaming skin over the epoch-based incremental build
  * (SURVEY.md section 2.10): the reference has no streaming operators —
  * its streaming-shaped capability is incremental index maintenance
  * (synchronous REST INSERTs become tablet blobs, README.md:21,
  * writer.rs:244-266). Here each micro-batch is one upsert epoch:
  * `foreachBatch` calls IndexStore.appendEpoch with the batch id as the
  * snapshot id, so restart-after-crash replays of a committed batch are
  * no-ops (exactly-once index commits on top of at-least-once delivery —
  * the same idempotent-resume contract as the batch path).
  */
object StreamingIndexer {

  /** Start indexing a streaming DataFrame of documents into `indexDir`
    * (which must already exist via IndexStore.create).
    */
  def start(stream: DataFrame, indexDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // appendEpoch runs several actions over the batch (index build,
        // lineage, tombstone pass) plus the isEmpty probe — without a
        // persist each action re-reads the micro-batch source files
        batch.persist()
        try {
          if (!batch.isEmpty) {
            IndexStore.appendEpoch(batch, indexDir, s"stream-batch-$batchId")
            ()
          }
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Convenience source: a directory of parquet document files consumed
    * incrementally (new files become new epochs).
    */
  def fromParquetDir(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)
}
