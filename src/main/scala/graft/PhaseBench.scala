package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}

/** One-off phase profiler for the index build (not part of the bench
  * surface): times corpus generation, docId assignment, and the posting
  * build separately at one parallelism level.
  */
object PhaseBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val localDir = Bench.benchLocalDir()
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = cores * 2
    // warm
    IndexBuilder.build(CodeCorpus.generate(spark, 20000, parts),
      IndexConfig(Seq("repo","path","commit"), Seq("content"), 8192, parts)).unpersist()
    val strategy = if (args.length > 2) args(2) else graft.index.DocIdStrategy.KeyRange
    val corpus = CodeCorpus.generate(spark, nDocs, parts)
    val (_, tGen) = Bench.time(corpus.count())
    val (withIds, tAssign) = Bench.time {
      val w = IndexBuilder.assignDocIds(corpus, Seq("repo","path","commit"), parts,
        strategy = strategy)
      w.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      w
    }
    val (_, tBuild) = Bench.time {
      IndexBuilder.build(corpus, IndexConfig(Seq("repo","path","commit"), Seq("content"),
        8192, parts, docIdStrategy = strategy))
    }
    println(s"""{"phase_bench":{"cores":$cores,"nDocs":$nDocs,"strategy":"$strategy","gen_count":$tGen,"assign_persist":$tAssign,"full_build":$tBuild}}""")
    spark.stop()
  }
}
