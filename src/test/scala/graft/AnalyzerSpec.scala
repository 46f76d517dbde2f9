package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analyze.Analyzer

class AnalyzerSpec extends AnyFunSuite {

  test("code-aware tokenization semantics") {
    assert(Analyzer.tokenize("FooBar baz_qux").toSeq === Seq("foo", "bar", "baz", "qux"))
    assert(Analyzer.tokenize("binarySearch(x_1);").toSeq === Seq("binary", "search", "x", "1"))
    assert(Analyzer.tokenize("").toSeq === Seq.empty)
    assert(Analyzer.tokenize("  ,,;  ").toSeq === Seq.empty)
    assert(Analyzer.tokenize("a" * 41).toSeq === Seq.empty) // >40 chars dropped
    assert(Analyzer.tokenize("a" * 40).toSeq === Seq("a" * 40))
    assert(Analyzer.tokenize("HTTPServer2 ok").toSeq === Seq("httpserver2", "ok"))
  }

  test("tokenizer registry: raw and whitespace semantics") {
    import graft.analyze.Tokenizers
    // raw: whole value, un-analyzed (no lowercase, no split)
    assert(Tokenizers.tokenize("raw", "Binary Search!").toSeq === Seq("Binary Search!"))
    assert(Tokenizers.tokenize("raw", "").toSeq === Seq.empty)
    assert(Tokenizers.tokenize("raw", "x" * 256).toSeq === Seq.empty) // MaxRawLen cap
    assert(Tokenizers.tokenize("raw", "x" * 255).toSeq === Seq("x" * 255))
    // whitespace: split on Unicode White_Space runs only (tantivy's
    // whitespace tokenizer = Rust char::is_whitespace), case preserved,
    // no camelCase split
    assert(Tokenizers.tokenize("whitespace", "FooBar  baz\tQux").toSeq ===
      Seq("FooBar", "baz", "Qux"))
    // NBSP / ideographic space are whitespace in Unicode but not Java \s
    assert(Tokenizers.tokenize("whitespace", "foo bar　baz").toSeq ===
      Seq("foo", "bar", "baz"))
    assert(Tokenizers.tokenize("whitespace", "a bc").toSeq ===
      Seq("a", "b", "c"))
    // length caps count codepoints, matching Spark/DuckDB length():
    // 250 astral codepoints = 500 UTF-16 units but still under MaxRawLen
    val astral = "😀" * 250
    assert(Tokenizers.tokenize("raw", astral).toSeq === Seq(astral))
    assert(Tokenizers.tokenize("raw", "😀" * 256).toSeq === Seq.empty)
    val astralTok = "😀" * 40
    assert(Tokenizers.tokenize("whitespace", s"$astralTok ok").toSeq ===
      Seq(astralTok, "ok"))
    assert(Tokenizers.tokenize("whitespace", ("😀" * 41) + " ok").toSeq ===
      Seq("ok"))
    // default/simple delegate to the code-aware analyzer
    assert(Tokenizers.tokenize("default", "FooBar baz").toSeq ===
      Analyzer.tokenize("FooBar baz").toSeq)
    assert(Tokenizers.tokenize("simple", "FooBar baz").toSeq ===
      Analyzer.tokenize("FooBar baz").toSeq)
    // counts: raw tf is 1 per doc value, len 1
    val (counts, len) = Tokenizers.tokenCounts("raw", "A B")
    assert(counts === Map("A B" -> 1) && len === 1)
    assert(!Tokenizers.isKnown("nope") && Tokenizers.isKnown("raw"))
  }

  test("Scala and Spark Column tokenizers agree") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq(
      "FooBar baz_qux", "binarySearch(x_1);", "", "  ,,;  ", "a" * 41, "a" * 40,
      "let mut x = HashMap::new(); // comment",
      "SELECT * FROM t WHERE a=1", "snake_case camelCase MixedUPPERCase",
      "0 1 22 333 4444", "fn main() { return 0; }\n\tuse std::io;") ++
      (0 until 50).map(i => graft.corpus.CodeCorpus.genDoc(i.toLong).content)
    val df = samples.toDF("text")
    val got = df.select(Analyzer.tokensCol(col("text"))).collect().map(_.getSeq[String](0))
    samples.zip(got).foreach { case (s, colToks) =>
      assert(colToks === Analyzer.tokenize(s).toSeq, s"mismatch on: ${s.take(60)}")
    }
  }

  test("native CodeTokens expression agrees with the Column pipeline and the scanner") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq(
      "FooBar baz_qux", "binarySearch(x_1);", "", "  ,,;  ", "a" * 41,
      "unicode Ünïcøde ästhetik mixed ascii", // non-ASCII falls back to regex
      "fn main() { return 0; }") ++
      (0 until 30).map(i => graft.corpus.CodeCorpus.genDoc(i.toLong).content)
    val df = samples.toDF("text")
    val native = df.select(graft.functions.CodeTokens(col("text")))
      .collect().map(_.getSeq[String](0))
    val viaCol = df.select(Analyzer.tokensCol(col("text")))
      .collect().map(_.getSeq[String](0))
    samples.indices.foreach { i =>
      assert(native(i) === viaCol(i), s"native != Column on: ${samples(i).take(60)}")
      assert(native(i) === Analyzer.tokenize(samples(i)).toSeq)
    }
    // the expression must live inside a WholeStageCodegen span, not
    // break the pipeline the way a UDF would (a parquet scan forces a
    // real codegen stage; a local Seq collapses to LocalTableScan)
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val q = docs.select(size(graft.functions.CodeTokens(col("text"))).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(800))
  }

  test("scanner tokenizer equals the regex reference on fuzzed ASCII") {
    val rnd = new scala.util.Random(11)
    val chars = "abcXYZ019 _-.;(){}\n\tQ"
    for (_ <- 0 until 2000) {
      val s = (0 until rnd.nextInt(80)).map(_ => chars(rnd.nextInt(chars.length))).mkString
      assert(Analyzer.tokenize(s).toSeq === Analyzer.tokenizeRegex(s).toSeq, s"input: '$s'")
    }
    // long-token boundary
    assert(Analyzer.tokenize("x" * 41).toSeq === Analyzer.tokenizeRegex("x" * 41).toSeq)
    // non-ASCII falls back to the regex path
    assert(Analyzer.tokenize("café bar").toSeq === Analyzer.tokenizeRegex("café bar").toSeq)
  }

  test("tokenCounts matches tokenize") {
    val s = graft.corpus.CodeCorpus.genDoc(7L).content
    val (counts, len) = Analyzer.tokenCounts(s)
    val toks = Analyzer.tokenize(s)
    assert(len === toks.length)
    assert(counts === toks.groupBy(identity).view.mapValues(_.length).toMap)
  }

  test("fuzz: every tokenizer and the stemmer are total over random unicode (seeded)") {
    // the tokenizer registry feeds both BUILD and QUERY paths with
    // arbitrary user text: each named tokenizer must be total (no
    // exceptions on any input, surrogates and CJK included) and never
    // emit an empty token (an empty term would pollute the dictionary
    // and can never be matched by a query)
    import graft.analyze.{SnowballStemmer, Tokenizers}
    val rnd = new scala.util.Random(0xA11AL)
    def randString(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(60)).foreach { _ =>
        sb.append(rnd.nextInt(4) match {
          case 0 => (rnd.nextInt(95) + 32).toChar // printable ascii
          case 1 => (rnd.nextInt(0x2000) + 0x80).toChar // extended BMP
          case 2 => (rnd.nextInt(0x800) + 0x4E00).toChar // CJK
          case _ => if (rnd.nextBoolean()) '\uD83D' else '\uDE00' // surrogates, often lone
        })
      }
      sb.toString
    }
    for (i <- 1 to 2000; name <- Tokenizers.known) {
      val s = randString()
      val toks =
        try Tokenizers.tokenize(name, s)
        catch { case e: Throwable =>
          fail(s"$name on case $i <$s> threw ${e.getClass.getName}: ${e.getMessage}") }
      toks.foreach(t => assert(t.nonEmpty, s"$name emitted an empty token on case $i <$s>"))
    }
    for (i <- 1 to 2000) {
      val w = randString()
      try { SnowballStemmer.stem(w); () }
      catch { case e: Throwable =>
        fail(s"stem case $i <$w> threw ${e.getClass.getName}: ${e.getMessage}") }
    }
  }
}
