package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** WAND must be exactly equal to the exhaustive scorer — same docIds,
  * same f32 scores, same tie-breaks — on every query/k (SURVEY.md
  * section 7 hard part 4: per-shard pruning is conservative, so the
  * merged top-k is exact).
  */
class WandSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val corpus = CodeCorpus.generate(spark, 3000, 8).cache()
  lazy val index = IndexBuilder.build(
    corpus, IndexConfig(Seq("repo", "path", "commit"), Seq("content"), shardDocs = 512, buildPartitions = 8))
  lazy val engine = new QueryEngine(index)

  val queries = Seq(
    "fn return license", // ultra-hot terms, heavy lists
    "binary search needle", // rare + medium
    "merge segment posting list block max", // many terms
    "checkpoint", // single term (UB == score: tie boundary)
    "prefab*", // dictionary expansion
    "zzzznotaterm") // no hits

  test("WAND top-k equals exhaustive top-k exactly") {
    for (q <- queries; k <- Seq(1, 7, 10, 100)) {
      val exhaustive = engine.searchF32(Seq(Fts("content", q)), k, useWand = false)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      val wand = engine.searchF32(Seq(Fts("content", q)), k, useWand = true)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      assert(wand === exhaustive, s"query '$q' k=$k")
    }
  }

  test("WAND on the small documents table") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val idx = IndexBuilder.build(docs, IndexConfig(Seq("doc_id"), Seq("text"), shardDocs = 64, buildPartitions = 4))
    val eng = new QueryEngine(idx)
    for (q <- Seq("merge sort", "data table scan", "the"); k <- Seq(3, 10, 25)) {
      val a = eng.searchF32(Seq(Fts("text", q)), k, useWand = false).collect().toSeq
      val b = eng.searchF32(Seq(Fts("text", q)), k, useWand = true).collect().toSeq
      assert(a === b, s"query '$q' k=$k")
    }
  }
}
