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
    // ids are namespaced by stream identity (checkpoint dir), so a
    // different stream's batch 0 can never collide with this one's
    assert(snaps.tail.forall(_.startsWith("stream-")))

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

  test("intra-batch duplicate keys collapse to one live version (upsert within a micro-batch)") {
    val base = java.nio.file.Files.createTempDirectory("graftstreamdup").toString
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"), 256, 2)
    val c0 = CodeCorpus.generate(spark, 50, 2)
    IndexStore.create(c0, config, s"$base/idx", "snap-0")
    // one source file carrying the SAME key twice: without the skin's
    // per-batch dedup, appendEpoch's tombstone pass (previous epochs
    // only) leaves both copies live forever
    val dup = CodeCorpus.generate(spark, 10, 1).limit(3)
      .withColumn("content", lit("dupmarker one"))
    dup.unionByName(dup.withColumn("content", lit("dupmarker two")))
      .coalesce(1).write.parquet(s"$base/src")
    val q = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, s"$base/src", c0.schema),
      s"$base/idx", s"$base/cp")
    try q.processAllAvailable() finally q.stop()
    val idx = IndexStore.load(spark, s"$base/idx")
    assert(idx.docs.groupBy("repo", "path", "commit").count()
      .filter(col("count") > 1).count() === 0L)
    val e = new QueryEngine(idx)
    assert(e.searchF32(Seq(Fts("content", "dupmarker")), 100).count() === 3L)
  }

  test("a second stream with a fresh checkpoint does not collide with committed batch ids") {
    val base = java.nio.file.Files.createTempDirectory("graftstream2").toString
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"), 256, 2)
    val c0 = CodeCorpus.generate(spark, 50, 2)
    IndexStore.create(c0, config, s"$base/idx", "snap-0")
    CodeCorpus.generate(spark, 80, 2).filter(col("path").contains("file_6"))
      .withColumn("content", lit("wavealpha marker"))
      .write.parquet(s"$base/srcA")
    val qa = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, s"$base/srcA", c0.schema),
      s"$base/idx", s"$base/cpA")
    try qa.processAllAvailable() finally qa.stop()
    // stream B: DIFFERENT source + checkpoint, batch ids restart at 0.
    // Under un-namespaced 'stream-batch-0' ids, appendEpoch would see
    // an already-committed snapshot and silently drop wave B.
    CodeCorpus.generate(spark, 90, 2).filter(col("path").contains("file_7"))
      .withColumn("content", lit("wavebeta marker"))
      .write.parquet(s"$base/srcB")
    val qb = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, s"$base/srcB", c0.schema),
      s"$base/idx", s"$base/cpB")
    try qb.processAllAvailable() finally qb.stop()
    val e = new QueryEngine(IndexStore.load(spark, s"$base/idx"))
    assert(e.searchF32(Seq(Fts("content", "wavealpha")), 1000).count() > 0L)
    assert(e.searchF32(Seq(Fts("content", "wavebeta")), 1000).count() > 0L)
  }

  test("streaming compactEvery folds small epochs back into a bounded segment count") {
    val base = java.nio.file.Files.createTempDirectory("graftstreamcpt").toString
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"), 256, 2)
    val c0 = CodeCorpus.generate(spark, 40, 2)
    IndexStore.create(c0, config, s"$base/idx", "snap-0")
    // three waves, compactEvery=1: every committed batch compacts, so
    // the live segment count stays bounded instead of growing per batch
    CodeCorpus.generate(spark, 50, 2).filter(col("path").contains("file_1"))
      .write.parquet(s"$base/src")
    val q = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, s"$base/src", c0.schema),
      s"$base/idx", s"$base/cp", compactEvery = 1)
    try {
      q.processAllAvailable()
      for (w <- 2 to 3) {
        CodeCorpus.generate(spark, 40 + w * 10, 2)
          .filter(col("path").contains(s"file_$w"))
          .write.mode("append").parquet(s"$base/src")
        q.processAllAvailable()
      }
    } finally q.stop()
    val (epochs, _, _) = IndexStore.readManifest(spark, s"$base/idx")
    assert(epochs.map(_.path).distinct.size === 1,
      s"expected a single compacted segment, got ${epochs.map(_.path).distinct}")
    // and the data is all there, one live version per key
    val idx = IndexStore.load(spark, s"$base/idx")
    assert(idx.docs.groupBy("repo", "path", "commit").count()
      .filter(col("count") > 1).count() === 0L)
  }

  test("a NEW stream against a store holding legacy 'stream-batch-N' ids still commits batch 0") {
    val base = java.nio.file.Files.createTempDirectory("graftstreamlegacy").toString
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"), 256, 2)
    val c0 = CodeCorpus.generate(spark, 40, 2)
    IndexStore.create(c0, config, s"$base/idx", "snap-0")
    // simulate a pre-upgrade stream's committed batch: legacy
    // un-namespaced snapshot id in the store
    val legacyWave = CodeCorpus.generate(spark, 60, 2).filter(col("path").contains("file_5"))
      .withColumn("content", lit("legacywave marker"))
    assert(IndexStore.appendEpoch(legacyWave, s"$base/idx", "stream-batch-0"))
    // a brand-NEW stream (fresh checkpoint, batch ids restarting at 0)
    // must commit its batch 0 unconditionally — the legacy no-op only
    // applies when RESUMING a pre-upgrade checkpoint, otherwise this
    // wave is silently dropped while the checkpoint advances
    CodeCorpus.generate(spark, 70, 2).filter(col("path").contains("file_6"))
      .withColumn("content", lit("freshwave marker"))
      .write.parquet(s"$base/src")
    val q = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, s"$base/src", c0.schema),
      s"$base/idx", s"$base/cp")
    try q.processAllAvailable() finally q.stop()
    val e = new QueryEngine(IndexStore.load(spark, s"$base/idx"))
    assert(e.searchF32(Seq(Fts("content", "freshwave")), 1000).count() > 0L,
      "new stream's batch 0 was dropped by the legacy-migration guard")
    assert(e.searchF32(Seq(Fts("content", "legacywave")), 1000).count() > 0L)

    // RESUME of that same (now-existing) checkpoint with a legacy id
    // matching an upcoming batch id: the no-op applies — batch 1 with a
    // committed legacy 'stream-batch-1' must not double-append
    assert(IndexStore.appendEpoch(
      CodeCorpus.generate(spark, 80, 2).filter(col("path").contains("file_7")),
      s"$base/idx", "stream-batch-1"))
    val cpsBefore = IndexStore.checkpoints(spark, s"$base/idx").size
    CodeCorpus.generate(spark, 90, 2).filter(col("path").contains("file_8"))
      .write.mode("append").parquet(s"$base/src")
    val q2 = StreamingIndexer.start(
      StreamingIndexer.fromParquetDir(spark, s"$base/src", c0.schema),
      s"$base/idx", s"$base/cp")
    try q2.processAllAvailable() finally q2.stop()
    val snaps = IndexStore.checkpoints(spark, s"$base/idx").map(_.snapshotId)
    assert(snaps.size === cpsBefore,
      s"legacy-committed batch 1 must stay a no-op on resume, got $snaps")
  }
}
