package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.OpsSql._

/** Same-session palindromic A/B for a simhash input `spread` (one
  * JVM, interleaved A,B,...,B,A — the only comparison this host's
  * regime swings permit, CLAUDE.md). Variant A = the simhash pipeline
  * WITH a spread repartition replicated inline (the rejected shape);
  * variant B = Dedup.simhash as shipped (no spread — the A/B's result
  * is why). Diagnostic only; never driver-sourced.
  */
object SimhashAB {
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
    println(s"calib=${Bench.calibrate()} memCalib=${Bench.calibrateMem()}")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def withSpread(): Long = {
      // the rejected variant, replicated inline: round-robin the
      // one-split source across defaultParallelism before tokenize
      val spreadDocs = docs.select(col("doc_id").as("id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism)
      val tf = spreadDocs.select(col("id"), explode(tokens(col("text"))).as("term"))
        .groupBy("id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("h", hash60(col("term")))
      val bitSums = (0 until 60).map(j =>
        sum(expr(s"((shiftright(h, $j) & 1) * 2 - 1) * tf")).as(s"b$j"))
      val agg = tf.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      val hashExpr = (0 until 60).map(j =>
        s"(CASE WHEN b$j > 0 THEN shiftleft(cast(1 AS BIGINT), $j) ELSE 0 END)").mkString(" + ")
      agg.select(col("id"), expr(hashExpr).as("simhash")).orderBy("id").count()
    }
    def noSpread(): Long = graft.ops.Dedup.simhash(docs, "doc_id", "text").count()

    // warm-up both shapes (codegen + JIT)
    withSpread(); noSpread()
    val ta = new scala.collection.mutable.ArrayBuffer[Double]()
    val tb = new scala.collection.mutable.ArrayBuffer[Double]()
    val seq = Seq(("A", true), ("B", false), ("B", false), ("A", true),
      ("A", true), ("B", false), ("B", false), ("A", true))
    seq.foreach { case (tag, isA) =>
      val (_, t) = Bench.time(if (isA) withSpread() else noSpread())
      println(f"$tag $t%7.3f s")
      if (isA) ta += t else tb += t
    }
    println(f"A(with spread) avg=${ta.sum / ta.size}%7.3f min=${ta.min}%7.3f")
    println(f"B(no spread)   avg=${tb.sum / tb.size}%7.3f min=${tb.min}%7.3f")
    println(s"calibEnd=${Bench.calibrate()} memCalibEnd=${Bench.calibrateMem()}")
    spark.stop()
  }
}
