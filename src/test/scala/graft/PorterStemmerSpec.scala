package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyze.{PorterStemmer, Tokenizers}

/** Porter stemmer vectors from the published algorithm (Porter 1980,
  * "An algorithm for suffix stripping" — the worked examples in the
  * paper), plus the en_stem tokenizer end-to-end through the SQL
  * dialect's per-column tokenizer DDL.
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ cleanup rules)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "operator" -> "oper", "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // multi-step chains (paper's worked derivations)
    "generalizations" -> "gener", "oscillators" -> "oscil",
    // short words pass through
    "a" -> "a", "is" -> "is")

  test("Porter 1980 vectors") {
    vectors.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) === want, s"stem($in)")
    }
  }

  test("stemming is idempotent on its own output") {
    vectors.map(_._2).foreach { s =>
      val once = PorterStemmer.stem(s)
      assert(PorterStemmer.stem(once) === once, s"re-stem($s)")
    }
  }

  test("en_stem tokenizer = default analysis + per-token stemming") {
    val toks = Tokenizers.tokenize("en_stem", "Running Faster, Dogs Agreed!")
    assert(toks.toSeq === Seq("run", "faster", "dog", "agre"))
  }

  test("en_stem end-to-end: query tokens stem to the indexed stems") {
    val sess = new graft.sql.LnxSession(TestSpark.spark)
    sess.execute("CREATE TABLE stem_t (id bigint primary key, body text) " +
      "WITH (tokenizers = (body = 'en_stem'))")
    sess.execute("INSERT INTO stem_t (id, body) VALUES " +
      "(1, 'he runs daily'), (2, 'a running joke'), (3, 'nothing here')")
    // 'running' and 'runs' both stem to 'run': the query matches docs 1+2
    val ids = sess.execute(
      "SELECT id FROM stem_t WHERE fts(body, 'running') ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L, 2L))
  }
}
