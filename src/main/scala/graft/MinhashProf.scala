package graft

import org.apache.spark.sql.SparkSession

/** Driver-thread sampling profiler for the warm minhash pass: runs the
  * op in a loop while a sampler thread histograms the MAIN thread's
  * topmost spark/graft stack frame every few ms — tells planning from
  * execution from cache bookkeeping in the inter-job gaps (BenchExtra
  * shows job time is only ~25% of leg wall). Diagnostic only.
  */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", Bench.benchLocalDir())
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"calib=${Bench.calibrate()}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mode = args.headOption.getOrElse("minhash")
    val sf = raw"sf(\d+(?:\.\d+)?)".r.findAllMatchIn(sfDir).toSeq.lastOption
      .map(_.group(1).toDouble).getOrElse(0.0)
    val nCorpus = math.max(5000L, (sf * 500000).toLong)
    lazy val corpus = graft.corpus.CodeCorpus.generate(spark, nCorpus, cpus * 2)
    lazy val buildConfig = graft.index.IndexConfig(Seq("repo", "path", "commit"),
      Seq("content"), shardDocs = 8192, buildPartitions = cpus * 2)
    def body(): Unit = mode match {
      case "build" =>
        val idx = graft.index.IndexBuilder.build(corpus, buildConfig)
        idx.unpersist(blocking = true)
      case _ => graft.ops.Dedup.minhashPairs(docs, "doc_id", "text").count(); ()
    }

    // warm-up (JIT + codegen)
    body()

    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        val top = st.find { f =>
          val c = f.getClassName
          (c.startsWith("org.apache.spark") || c.startsWith("graft")) &&
            !c.contains("MinhashProf")
        }
        val key = top.map(f => s"${f.getClassName}.${f.getMethodName}").getOrElse(
          st.headOption.map(f => s"[jvm] ${f.getClassName}.${f.getMethodName}").getOrElse("?"))
        hist.merge(key, 1, (a, b) => a + b)
        Thread.sleep(3)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    var i = 0
    while (i < 6) {
      val (_, t) = Bench.time(body())
      println(f"pass $i $t%7.3f s")
      i += 1
    }
    sampling = false
    Thread.sleep(50)

    import scala.jdk.CollectionConverters._
    val total = hist.values().asScala.map(_.intValue).sum.max(1)
    println(s"== driver main-thread samples: $total ==")
    hist.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) =>
      println(f"${v.intValue * 100.0 / total}%6.2f%% $v%6d  $k")
    }
    println(s"calibEnd=${Bench.calibrate()}")
    spark.stop()
  }
}
