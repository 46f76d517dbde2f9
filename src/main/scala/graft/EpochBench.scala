package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.{IndexConfig, IndexStore}
import graft.query._

/** Incremental-ingest lifecycle at scale: the north rule's "resumable
  * from snapshot checkpoints" path measured, not just spec'd. A base
  * store takes successive source snapshots via IndexStore.appendEpoch
  * (each with its snapshot id as the idempotence key), then:
  *
  *  - per-epoch append wall + exchange bytes (BuildTraffic deltas) —
  *    the claim under test is that an epoch costs O(epoch), with the
  *    only index-sized term a slim columnar (docId, key) scan for
  *    upsert tombstones, never a rebuild;
  *  - a RESUME leg: re-submitting an already-committed snapshot id
  *    must be a manifest-read no-op (the crash-recovery contract);
  *  - an UPSERT epoch: re-ingesting an id range the base already
  *    holds must tombstone every superseded doc and keep the live
  *    count exact;
  *  - serving checks through a fresh scale-mode load (cacheDocs=false)
  *    after the appends and again after compaction absorbs the
  *    upsert tombstones.
  *
  * Usage: runMain graft.EpochBench [baseDocs] [epochDocs] [nEpochs]
  * — prints one JSON line.
  */
object EpochBench {

  def main(args: Array[String]): Unit = {
    val baseDocs = if (args.length > 0) args(0).toLong else 8000000L
    val epochDocs = if (args.length > 1) args(1).toLong else 1000000L
    val nEpochs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val localDir = Bench.benchLocalDir()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixed docs/task (the validated 62.5k), scaled from the BASE: the
    // epochs inherit the config, so their tasks are strictly smaller
    val parts = sys.env.get("SPARK_GRAFT_STORE_PARTS").map(_.toInt)
      .getOrElse(math.max(cpus * 4, (baseDocs / 62500L).toInt))
    val strategy = sys.env.getOrElse("SPARK_GRAFT_STORE_STRATEGY",
      graft.index.DocIdStrategy.KeyRange)
    val config = IndexConfig(Seq("repo", "path", "commit"), Seq("content"),
      shardDocs = 65536, buildPartitions = parts, docIdStrategy = strategy)
    val dir = java.nio.file.Files.createTempDirectory("graftepochbench").toString

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val traffic = new BuildTraffic
    spark.sparkContext.addSparkListener(traffic)

    // markers bracket the run — a shift during the long create/append
    // legs must show as start/end drift (see StoreBench)
    results("calib_sec_start") = Bench.calibrate()
    results("mem_calib_sec_start") = Bench.calibrateMem()

    val (_, tCreate) = Bench.time {
      IndexStore.create(CodeCorpus.generateRange(spark, 0L, baseDocs, parts),
        config, dir).unpersist()
    }
    results("create_base") = tCreate

    var hi = baseDocs
    for (e <- 1 to nEpochs) {
      val t0 = traffic.settle()
      val (_, tApp) = Bench.time {
        IndexStore.appendEpoch(
          CodeCorpus.generateRange(spark, hi, hi + epochDocs, parts), dir, s"snap-$e")
      }
      val t1 = traffic.settle()
      hi += epochDocs
      results(s"append_$e") = tApp
      results(s"append_${e}_shuffle_write_mb") = (t1 - t0).shuffleWriteBytes / 1e6
      results(s"append_${e}_input_mb") = (t1 - t0).inputBytes / 1e6
    }

    // resume: the last snapshot id again — committed, so a no-op
    val (resumed, tNoop) = Bench.time {
      IndexStore.appendEpoch(
        CodeCorpus.generateRange(spark, hi - epochDocs, hi, parts), dir, s"snap-$nEpochs")
    }
    results("resume_noop_sec") = tNoop
    results("resume_noop_committed") = if (resumed) 1.0 else 0.0 // must be 0

    // upsert: the FIRST epochDocs ids again — every one supersedes a
    // base doc, so the live count must stay exactly hi
    val tU0 = traffic.settle()
    val (_, tUpsert) = Bench.time {
      IndexStore.appendEpoch(
        CodeCorpus.generateRange(spark, 0L, epochDocs, parts), dir, "snap-upsert")
    }
    val tU1 = traffic.settle()
    results("upsert_epoch_sec") = tUpsert
    results("upsert_shuffle_write_mb") = (tU1 - tU0).shuffleWriteBytes / 1e6

    def serveCheck(tag: String): Unit = {
      val idx = IndexStore.load(spark, dir, cacheDocs = false)
      val e = new QueryEngine(idx)
      val (live, _) = Bench.time(idx.docs.count())
      val (n, tQ) = Bench.time(
        e.searchF32(Seq(Fts("content", "rareAuditBeacon license fn")), 10).collect().length)
      results(s"${tag}_live_docs") = live.toDouble // must equal baseDocs + nEpochs*epochDocs
      results(s"${tag}_query_sec") = tQ
      results(s"${tag}_query_hits") = n.toDouble
      idx.unpersist()
    }
    serveCheck("post_append")

    val (_, tCompact) = Bench.time(IndexStore.compact(spark, dir))
    results("compact_sec") = tCompact
    serveCheck("post_compact")

    results("calib_sec") = Bench.calibrate()
    results("mem_calib_sec") = Bench.calibrateMem()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"epoch_bench","baseDocs":$baseDocs,"epochDocs":$epochDocs,"nEpochs":$nEpochs,"cpus":$cpus,"queries":$qs}""")
    IndexStore.drop(dir)
    spark.stop()
  }
}
