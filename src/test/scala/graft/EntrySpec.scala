package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the driver contract itself: flagship entry + a sample of the
  * queries map on sf0.001 (the driver smoke).
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship entry returns ranked rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.toSeq === Seq("doc_id", "score"))
    // ranked: scores non-increasing
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("every queries entry runs and every key has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      assert(n >= 0, name)
    }
  }
}
