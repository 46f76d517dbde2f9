package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** Diagnostic companion to Bench (which is FROZEN for measurement):
  * re-runs the same legs with a job/stage listener so each leg reports
  * wall seconds, Spark job count, stage count and task count — the
  * breakdown that tells scheduler floor apart from real compute
  * (optimization guide §1: measure first, know where the time goes).
  * Never sourced by the driver; numbers quoted in OPTIMIZATION_r06.md.
  */
object BenchExtra {

  /** Per-leg job/stage/task counters via listener events. */
  final class LegListener extends SparkListener {
    case class JobRec(id: Int, desc: String, start: Long, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = new scala.collection.mutable.ArrayBuffer[JobRec]()
    private val byId = new scala.collection.mutable.HashMap[Int, JobRec]()
    private val stageJob = new scala.collection.mutable.HashMap[Int, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val rec = JobRec(e.jobId, Option(e.properties.getProperty("spark.job.description")).getOrElse(""),
        e.time)
      rec.stages = e.stageIds.size
      jobs += rec
      byId(e.jobId) = rec
      e.stageIds.foreach(s => stageJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      byId.get(e.jobId).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      for (j <- stageJob.get(e.stageInfo.stageId); r <- byId.get(j))
        r.tasks += e.stageInfo.numTasks
    }
    def snapshot(): Int = synchronized { jobs.size }
    def report(from: Int, label: String, wall: Double): Unit = synchronized {
      val slice = jobs.drop(from)
      val stages = slice.map(_.stages).sum
      val tasks = slice.map(_.tasks).sum
      println(f"LEG $label%-28s wall=$wall%8.3f s jobs=${slice.size}%3d stages=$stages%3d tasks=$tasks%5d")
      slice.foreach { j =>
        println(f"    job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s stages=${j.stages}%3d tasks=${j.tasks}%5d  ${j.desc.take(80)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val legs: Set[String] = if (args.isEmpty) Set("all") else args.toSet
    def on(l: String): Boolean = legs("all") || legs(l)
    val localDir = Bench.benchLocalDir()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knobs for driver-overhead experiments (unset = Spark default)
    sys.env.get("BE_AQE").foreach(v => builder.config("spark.sql.adaptive.enabled", v))
    sys.env.get("BE_MAXPLANSTR").foreach(v => builder.config("spark.sql.maxPlanStringLength", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new LegListener
    spark.sparkContext.addSparkListener(listener)

    val sf = raw"sf(\d+(?:\.\d+)?)".r.findAllMatchIn(sfDir).toSeq.lastOption
      .map(_.group(1).toDouble).getOrElse(0.0)
    val nCorpus = math.max(5000L, (sf * 500000).toLong)

    def leg[T](label: String)(body: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val from = listener.snapshot()
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let listener events drain
      listener.report(from, label, wall)
      spark.sparkContext.setJobDescription(null)
      r
    }

    println(s"calib=${Bench.calibrate()} memCalib=${Bench.calibrateMem()}")

    if (on("query") || on("build")) {
      // --- build: same shape as Bench leg 1 ---
      val corpus = CodeCorpus.generate(spark, nCorpus, cpus * 2)
      val buildConfig = IndexConfig(Seq("repo", "path", "commit"), Seq("content"),
        shardDocs = 8192, buildPartitions = cpus * 2)
      val idx1 = leg("build pass1")(IndexBuilder.build(corpus, buildConfig))
      idx1.unpersist(blocking = true)
      val idx = leg("build pass2")(IndexBuilder.build(corpus, buildConfig))
      val engine = new QueryEngine(idx)

    if (on("query")) {
      // warm-ups identical to Bench
      val queries = Seq(
        "hot" -> "fn return license",
        "mixed" -> "binary search merge segment",
        "rare" -> "needle checkpoint epoch",
        "skew" -> "rareAuditBeacon license fn")
      queries.foreach { case (_, q) =>
        engine.searchF32(Seq(Fts("content", q)), 10, useWand = true).collect()
        engine.searchF32(Seq(Fts("content", q)), 10, useWand = false).collect()
      }
      engine.searchF32(Seq(FuzzyC("content", "serach")), 10).collect()
      engine.searchF32(Seq(FastFuzzy("content", "serach")), 10).collect()

      leg("q_fts_hot_wand x2") {
        engine.searchF32(Seq(Fts("content", "fn return license")), 10, useWand = true).collect()
        engine.searchF32(Seq(Fts("content", "fn return license")), 10, useWand = true).collect()
      }
      val conj = Seq(Fts("content", "binary search"), Fts("content", "license"))
      val conjSkew = Seq(Fts("content", "rareAuditBeacon"), Fts("content", "license fn"))
      Seq(conj, conjSkew).foreach { c =>
        engine.searchF32(c, 10, useWand = true).collect()
        engine.searchF32(c, 10, useWand = false).collect()
      }
      leg("q_conj_wand x2") {
        engine.searchF32(conj, 10, useWand = true).collect()
        engine.searchF32(conj, 10, useWand = true).collect()
      }
      leg("q_conj_exhaustive x2") {
        engine.searchF32(conj, 10, useWand = false).collect()
        engine.searchF32(conj, 10, useWand = false).collect()
      }
      // df profile of the conj terms, for the routing decision
      val termDfs = engine.index.termStats
        .filter(org.apache.spark.sql.functions.col("term").isin(
          "binary", "search", "license", "fn", "return", "rareauditbeacon"))
        .collect()
      termDfs.foreach(r => println(s"DF ${r.getString(1)} = ${r.getLong(2)} (numDocs=${idx.numDocs})"))

      leg("q_fuzzy pair") {
        engine.searchF32(Seq(FuzzyC("content", "serach mrege")), 10).collect()
        engine.searchF32(Seq(FuzzyC("content", "saerch megre")), 10).collect()
      }
      val batch32 = QpsBench.queryPool(32).zipWithIndex.map { case (q, i) => i -> q }
      engine.searchManyF32(batch32, 10).collect() // warm-up
      leg("q_batch32 x2") {
        engine.searchManyF32(batch32, 10).collect()
        engine.searchManyF32(batch32, 10).collect()
      }
    }
    }

    if (on("ops")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // warm-up (JIT + codegen) outside any regime measurement
      graft.ops.Dedup.minhashPairs(docs, "doc_id", "text").count()
      graft.ops.Dedup.simhash(docs, "doc_id", "text").count()
      graft.ops.Similarity.bruteTopK(emb, "vec_id", "embedding").count()
      // palindromic same-session runs: host regimes swing 2-5x between
      // JVMs (CLAUDE.md), so only same-session ratios are trustworthy
      val round = Seq(
        "minhash" -> (() => graft.ops.Dedup.minhashPairs(docs, "doc_id", "text").count()),
        "simhash" -> (() => graft.ops.Dedup.simhash(docs, "doc_id", "text").count()),
        "ann_brute" -> (() => graft.ops.Similarity.bruteTopK(emb, "vec_id", "embedding").count()))
      (round ++ round.reverse).foreach { case (name, f) => leg(s"op_$name")(f()) }
    }

    println(s"calibEnd=${Bench.calibrate()} memCalibEnd=${Bench.calibrateMem()}")
    spark.stop()
  }
}
