package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** Block-max WAND win evidence at a corpus size where posting decode
  * dominates the scheduler floor (the driver bench's sf0.1 = 50k files
  * is scheduler-bound, so wand ~ exhaustive there; VERDICT r01 #9).
  * Usage: runMain graft.WandBench [nDocs] — prints one JSON line with
  * best-of-3 latencies per query shape plus skip/decode counters.
  */
object WandBench {

  private def bestOf3(body: => Unit): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val localDir = Bench.benchLocalDir()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = CodeCorpus.generate(spark, nDocs, cpus * 4)
    val idx = IndexBuilder.build(corpus,
      IndexConfig(Seq("repo", "path", "commit"), Seq("content"),
        shardDocs = 65536, buildPartitions = cpus * 4))
    val engine = new QueryEngine(idx)

    val shapes = Seq(
      "hot" -> Seq(Fts("content", "fn return license")),
      "skew" -> Seq(Fts("content", "rareAuditBeacon license fn")),
      "conj" -> Seq(Fts("content", "binary search"), Fts("content", "license")),
      "conj_skew" -> Seq(Fts("content", "rareAuditBeacon"), Fts("content", "license fn")))

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    shapes.foreach { case (name, clauses) =>
      // warm both paths (codegen + posting cache materialization)
      engine.searchF32(clauses, 10, useWand = true).collect()
      engine.searchF32(clauses, 10, useWand = false).collect()
      results(s"${name}_wand") = bestOf3(engine.searchF32(clauses, 10, useWand = true).collect())
      results(s"${name}_exhaustive") =
        bestOf3(engine.searchF32(clauses, 10, useWand = false).collect())
      val stats = Wand.Stats.register(spark)
      engine.searchF32(clauses, 10, useWand = true, wandStats = Some(stats)).collect()
      results(s"${name}_blocks_decoded") = stats.decodedBlocks.value.toDouble
      results(s"${name}_blocks_skipped") = stats.skippedBlocks.value.toDouble
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"wand_ab","nDocs":$nDocs,"cpus":$cpus,"queries":$qs}""")
    spark.stop()
  }
}
