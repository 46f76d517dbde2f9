package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

import graft.index.{IndexBuilder, IndexConfig}
import graft.query._

/** Randomized invariants (seeded, deterministic): WAND == exhaustive
  * on arbitrary corpora/queries, and the whole build is
  * parallelism-independent — identical docIds AND bit-identical f32
  * scores no matter how the input is partitioned or how wide the
  * build shuffle is (the north rule's rank-identity under re-planning).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val seed0 = rng.Seed(20260816L)

  /** Deterministic stream of values from a Gen. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = seed0
    (0 until n).map { _ =>
      val r = g.doPureApply(Gen.Parameters.default, seed)
      seed = r.seed
      r.retrieve.get
    }
  }

  private val vocab: Seq[String] =
    Seq("alpha", "beta", "gamma", "delta", "merge", "sort", "scan", "hash",
      "tree", "heap", "q", "xx", "longertoken", "rare1", "rare2", "zzz")

  private val docGen: Gen[String] = for {
    n <- Gen.choose(1, 60)
    toks <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.oneOf(vocab.take(8))), // hot head
      (3, Gen.oneOf(vocab.drop(8))), // tail
      (1, Gen.identifier.map(_.take(12))))) // noise terms
  } yield toks.mkString(" ")

  private val queryGen: Gen[Seq[String]] = for {
    n <- Gen.choose(1, 4)
    toks <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.oneOf(vocab)),
      (1, Gen.const("notinanydocument"))))
  } yield toks

  lazy val corpus = {
    import spark.implicits._
    samples(docGen, 1500).zipWithIndex
      .map { case (text, i) => (i.toLong, text) }
      .toDF("doc_id", "text")
      .repartition(7) // deliberately awkward input partitioning
      .cache()
  }

  test("property: WAND top-k == exhaustive top-k on random corpora and queries") {
    val idx = IndexBuilder.build(corpus,
      IndexConfig(Seq("doc_id"), Seq("text"), shardDocs = 256, buildPartitions = 5))
    val e = new QueryEngine(idx)
    for ((toks, i) <- samples(queryGen, 30).zipWithIndex) {
      val k = 1 + (i * 7) % 40
      val clauses = Seq(Fts("text", toks.mkString(" ")))
      val a = e.searchF32(clauses, k, useWand = false).collect().toSeq
      val b = e.searchF32(clauses, k, useWand = true).collect().toSeq
      assert(a === b, s"query $toks k=$k")
    }
    // random conjunctions through the forced conj-WAND path
    for (toks <- samples(queryGen, 12) if toks.size >= 2) {
      val clauses = toks.map(t => Fts("text", t): SearchClause)
      val cq = e.compile(clauses)
      val a = e.searchF32(clauses, 10, useWand = false).collect().toSeq
      if (cq.terms.nonEmpty) {
        val b = Scorer.topK(Wand.topKConj(idx, cq, 10).toDF("docId", "score"), 10)
          .collect().toSeq
        assert(a === b, s"conj $toks")
      }
    }
  }

  test("property: build is parallelism-independent (docIds + bit-identical f32 scores)") {
    val a = IndexBuilder.build(corpus.repartition(3),
      IndexConfig(Seq("doc_id"), Seq("text"), shardDocs = 128, buildPartitions = 3))
    val b = IndexBuilder.build(corpus.repartition(13),
      IndexConfig(Seq("doc_id"), Seq("text"), shardDocs = 128, buildPartitions = 11))
    val mapA = a.docs.select("doc_id", "docId").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mapB = b.docs.select("doc_id", "docId").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapA === mapB, "docIds must not depend on partitioning or parallelism")
    val ea = new QueryEngine(a)
    val eb = new QueryEngine(b)
    for (toks <- samples(queryGen, 10)) {
      val q = Seq(Fts("text", toks.mkString(" ")))
      val ra = ea.searchF32(q, 20).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      val rb = eb.searchF32(q, 20).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      assert(ra === rb, s"scores must be bit-identical across builds: $toks")
    }
  }

  // random clause shapes for the batched-scoring property: exact fts,
  // prefix, fuzzy, levenshtein, and an fts with a DUPLICATED token —
  // with a conjunction that shares tokens across clause groups this is
  // the hardest replay case (same (field, term) subscribed by several
  // groups; f32 bit-identity needs the exact single-query accumulation
  // order)
  private val clauseGen: Gen[SearchClause] = for {
    toks <- queryGen
    kind <- Gen.choose(0, 4)
  } yield kind match {
    case 0 => Fts("text", toks.mkString(" "))
    case 1 => Fts("text", toks.head.take(3) + "*")
    case 2 => FuzzyC("text", toks.head)
    case 3 => LevC("text", toks.head)
    case _ => Fts("text", (toks ++ toks.headOption).mkString(" "))
  }

  test("property: batched scoring == per-query search on random clause mixes") {
    val idx = IndexBuilder.build(corpus,
      IndexConfig(Seq("doc_id"), Seq("text"), shardDocs = 256, buildPartitions = 5))
    val e = new QueryEngine(idx)
    val batchGen = for {
      n <- Gen.choose(1, 3)
      qs <- Gen.listOfN(4, Gen.listOfN(n, clauseGen).map(_.toSeq))
    } yield qs
    for ((qs, bi) <- samples(batchGen, 5).zipWithIndex) {
      val batch = qs.zipWithIndex.map { case (cs, i) => i -> cs }
      val k = 5 + bi * 7
      val got = e.searchManyF32(batch, k).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getFloat(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq
          .sortBy { case (d, s) => (-s, d) }).toMap
      batch.foreach { case (qid, clauses) =>
        val solo = e.searchF32(clauses, k).collect()
          .map(r => (r.getLong(0), r.getFloat(1))).toSeq
          .sortBy { case (d, s) => (-s, d) }
        assert(got.getOrElse(qid, Nil) === solo,
          s"batch $bi qid=$qid diverged: $clauses")
      }
    }
  }

  test("property: analyzer scanner == regex pipeline on random ASCII") {
    val strGen = Gen.listOfN(40, Gen.frequency(
      (6, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.oneOf('_', '.', '(', ')', '-', '/')),
      (1, Gen.oneOf('A', 'Z', 'q')))).map(_.mkString)
    for (s <- samples(strGen, 300)) {
      assert(graft.analyze.Analyzer.tokenize(s).toSeq ===
        graft.analyze.Analyzer.tokenizeRegex(s).toSeq, s"input: '$s'")
    }
  }

  test("property: driver Levenshtein == Spark builtin on random Unicode (incl. astral)") {
    // the fuzzy stack's agreement contract (Levenshtein.scala doc):
    // the plan filters with Spark's codepoint-based levenshtein, the
    // driver re-verifies with the banded DP — a granularity mismatch
    // silently drops plan-admitted candidates. Alphabet mixes ASCII,
    // BMP non-ASCII, and astral (surrogate-pair) codepoints, hitting
    // both the char fast path and the codepoint path.
    val cpGen = Gen.frequency(
      (5, Gen.oneOf('a'.toInt, 'b'.toInt, 'c'.toInt)),
      (2, Gen.oneOf(0xE9, 0x4E2D)),          // é, 中 (BMP)
      (2, Gen.oneOf(0x1F600, 0x1F680)))      // 😀, 🚀 (astral)
    val strGen = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, cpGen).map(_.flatMap(Character.toChars(_).toSeq).mkString))
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, levenshtein}
    val pairs = samples(Gen.zip(strGen, strGen), 150).distinct
    val sparkDists = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b")))
      .collect().map(_.getInt(0))
    pairs.zip(sparkDists).foreach { case ((a, b), sd) =>
      val want = math.min(sd, 3)
      assert(graft.analyze.Levenshtein.distance(a, b, 2) === want,
        s"a='$a' b='$b' spark=$sd")
    }
  }

  test("property: SymSpell depth-2 delete variants stay complete over astral codepoints") {
    // completeness invariant: d(a, b) <= 2 => deletes2(a) intersects
    // deletes2(b) — the prefilter must not lose candidates when terms
    // carry surrogate pairs (a char-granular delete would split them)
    val cpGen = Gen.frequency(
      (4, Gen.oneOf('x'.toInt, 'y'.toInt)),
      (3, Gen.oneOf(0x1F600, 0x1F680, 0x1F4A9)))
    val strGen = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, cpGen).map(_.flatMap(Character.toChars(_).toSeq).mkString))
    val terms = samples(strGen, 60).distinct
    for (a <- terms; b <- terms) {
      if (graft.analyze.Levenshtein.distance(a, b, 2) <= 2) {
        val ia = graft.analyze.SymSpell.deletes(a)
        val ib = graft.analyze.SymSpell.deletes(b)
        assert((ia & ib).nonEmpty, s"no shared variant for '$a' / '$b'")
      }
    }
  }
}
