package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.CodeCorpus
import graft.index.{IndexConfig, IndexStore}
import graft.query.{Fts, QueryEngine}
import graft.streaming.StreamingIndexer

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming micro-batches become upsert epochs with exactly-once commits") {
    val base = java.nio.file.Files.createTempDirectory("graftstream").toString
    val srcDir = s"$base/src"
    val idxDir = s"$base/idx"
    val cpDir = s"$base/cp"
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"), 256, 4)
    val c0 = CodeCorpus.generate(spark, 200, 4)
    IndexStore.create(c0, config, idxDir, "snap-0")
    // stage two waves of new files into the watched directory
    val wave1 = CodeCorpus.generate(spark, 280, 4)
      .filter(col("path").contains("file_2")) // ids 2, 20-29, 200-279...
    wave1.write.parquet(s"$srcDir/wave1.parquet")
    val stream = StreamingIndexer.fromParquetDir(spark, srcDir, c0.schema)
    val q = StreamingIndexer.start(stream, idxDir, cpDir)
    try {
      q.processAllAvailable()
      val wave2 = CodeCorpus.generate(spark, 300, 4).filter(col("path").contains("file_29"))
        .withColumn("content", concat(col("content"), lit(" streamedmarker")))
      wave2.write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    val idx = IndexStore.load(spark, idxDir)
    val e = new QueryEngine(idx)
    // wave2's upserted docs are searchable under the new content
    val hits = e.searchF32(Seq(Fts("content", "streamedmarker")), 1000).count()
    val wave2n = CodeCorpus.generate(spark, 300, 4).filter(col("path").contains("file_29")).count()
    assert(hits === wave2n)
    // one live version per key
    assert(idx.docs.groupBy("repo", "path", "commit").count().filter(col("count") > 1).count() === 0L)
    // epochs recorded with stream snapshot ids
    val snaps = IndexStore.checkpoints(spark, idxDir).map(_.snapshotId)
    assert(snaps.head === "snap-0")
    assert(snaps.tail.forall(_.startsWith("stream-batch-")))

    // restart from the same checkpoint: a fresh query over the same
    // source must not re-commit any processed batch (kill-resume safety
    // = at-least-once delivery + idempotent epoch commits)
    val docsBefore = idx.docs.count()
    val epochsBefore = snaps.size
    val q2 = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, srcDir, c0.schema), idxDir, cpDir)
    try q2.processAllAvailable() finally q2.stop()
    val after = IndexStore.load(spark, idxDir)
    assert(after.docs.count() === docsBefore)
    assert(IndexStore.checkpoints(spark, idxDir).size === epochsBefore)
  }
}
