package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TextStats

/** Edge semantics of the chunking and sequence-packing operators (their
  * value-level contract is the q57/q58 DuckDB oracle; these pin the
  * corners the sampled corpus may not hit).
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("chunk: window/stride arithmetic covers every token, last chunk may be short") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6 with len 4,4,4? no:
    // nChunks = 1 + ceil((10-4)/3) = 3; starts 0,3,6; lens 4,4,4
    val d = docs((1L, (1 to 10).map(i => s"tok$i").mkString(" ")))
    val out = TextStats.chunk(d, "doc_id", "text", window = 4, stride = 3).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))
    // 11 tokens: starts 0,3,6,9 - the last chunk is SHORT (2 tokens)
    val d2 = docs((1L, (1 to 11).map(i => s"tok$i").mkString(" ")))
    val out2 = TextStats.chunk(d2, "doc_id", "text", window = 4, stride = 3).collect()
    assert(out2.map(r => (r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 2L)))
    // every token position is covered by some chunk
    val covered = out2.flatMap(r => r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
    assert(covered === (0L until 11L).toSet)
  }

  test("chunk: a doc shorter than one window is a single chunk; empty docs vanish") {
    val d = docs((1L, "only three tokens"), (2L, ""), (3L, "   "))
    val out = TextStats.chunk(d, "doc_id", "text", window = 64, stride = 48).collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1), out(0).getLong(3)) === ((1L, 0L, 3L)))
  }

  test("chunk: the content fingerprint distinguishes same-shape different-text windows") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma epsilon"))
    val out = TextStats.chunk(d, "doc_id", "text", window = 4, stride = 4).collect()
    assert(out.length === 2)
    assert(out(0).getString(4) !== out(1).getString(4))
  }

  test("packBins: greedy fold, oversized doc gets its own bin, reset at range boundary") {
    // range width 10: ids 0..9 are one range, 10.. the next
    val d = docs(
      (0L, "a b c"), // 3 tokens -> bin 0 (fill 3)
      (1L, "a b"), // +2 = 5 -> bin 0
      (2L, (1 to 7).map(_ => "t").mkString(" ")), // 5+7 > 6 -> bin 1 (fill 7 > budget, own bin)
      (3L, "a"), // 7+1 > 6 -> bin 2
      (10L, "a b c d")) // new range -> bin 0 again
    val out = TextStats.packBins(d, "doc_id", "text", budget = 6, rangeWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L))
  }

  test("packBins: result is independent of input partitioning (range reset contract)") {
    val base = (0L until 250L).map(i => (i, ("w " * (1 + (i % 37)).toInt).trim))
    val a = TextStats.packBins(docs(base: _*).repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    val b = TextStats.packBins(docs(base: _*).repartition(13), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(a === b)
    // bins never exceed the budget unless a single doc does
    val fills = TextStats.packBins(docs(base: _*), "doc_id", "text")
      .groupBy("range_id", "bin").agg(sum("n_tokens").as("fill"), count(lit(1)).as("cnt"))
      .collect()
    fills.foreach { r =>
      assert(r.getLong(2) <= 512L || r.getLong(3) === 1L,
        s"bin over budget with multiple docs: $r")
    }
  }
}
