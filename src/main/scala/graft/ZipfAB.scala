package graft

import graft.corpus.CodeCorpus

/** Driver-side micro A/B: table-based zipfIdx vs the pow reference,
  * and full genDoc throughput. Diagnostic only.
  */
object ZipfAB {
  def main(args: Array[String]): Unit = {
    val n = 120
    val rnd = new java.util.Random(42)
    val us = Array.fill(4000000)(rnd.nextDouble())
    // warm both paths
    var s = 0L
    us.foreach(u => s += CodeCorpus.zipfIdx(u, n))
    us.foreach(u => s += CodeCorpus.zipfIdxRef(u, n))
    for (round <- 1 to 3) {
      val (r1, t1) = Bench.time { var x = 0L; us.foreach(u => x += CodeCorpus.zipfIdx(u, n)); x }
      val (r2, t2) = Bench.time { var x = 0L; us.foreach(u => x += CodeCorpus.zipfIdxRef(u, n)); x }
      println(f"round $round table=$t1%6.3f s pow=$t2%6.3f s (sums equal: ${r1 == r2})")
    }
    val (_, tg) = Bench.time { var x = 0L; (0L until 200000L).foreach(id => x += CodeCorpus.genDoc(id).content.length); x }
    println(f"genDoc 200k single-thread: $tg%6.3f s")
    if (s == 42) println("")
  }
}
