package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import OpsSql._

/** Text-analysis operators for training-data curation: language-ID
  * (stopword-profile heuristic), quality scoring, token counting,
  * document fingerprinting. Dual Spark/DuckDB implementations.
  */
object TextStats {

  /** Per-language stopword profiles (n-gram heuristic stand-in). */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  private def ratio(toks: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    when(size(toks) === 0, lit(0.0d))
      .otherwise(size(filter(toks, t => array_contains(arr, t))).cast("double") / size(toks))
  }

  private def ratioDuck(toks: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"(CASE WHEN len($toks) = 0 THEN 0.0 ELSE " +
      s"len(list_filter($toks, t -> list_contains($lst, t)))::DOUBLE / len($toks) END)"
  }

  /** Engine-agnostic SQL fragments for the argmax-by-profile-score
    * decision, shared by BOTH langId variants and BOTH DuckDB twins
    * (the Spark side consumes them via expr(), so the text is common):
    * tournament CASE with fixed precedence at ties (profile order),
    * 'und' when every score is zero, rounded-max confidence. ONE
    * builder for all four call sites — a future edit cannot
    * desynchronize an op from its oracle twin.
    */
  private def argmaxLangSql(langs: Seq[String]): String = {
    val allZero = langs.map(l => s"s_$l = 0.0").mkString(" AND ")
    val cases = langs.zipWithIndex.map { case (l, i) =>
      val cond = (langs.drop(i + 1).map(o => s"s_$l >= s_$o") :+ "true").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString(" ")
    s"CASE WHEN $allZero THEN 'und' $cases ELSE 'und' END"
  }

  private def confLangSql(langs: Seq[String]): String =
    s"round(greatest(${langs.map(l => s"s_$l").mkString(", ")}), 4)"

  /** Language ID: argmax stopword ratio with fixed precedence order at
    * ties (profile order), 'und' when no profile matches.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val withScores = profiles.foldLeft(df.select(col(idCol).as("id"), toks.as("toks"))) {
      case (d, (lang, words)) => d.withColumn(s"s_$lang", ratio(col("toks"), words))
    }
    val langs = profiles.map(_._1)
    withScores
      .withColumn("lang_pred", expr(argmaxLangSql(langs)))
      .withColumn("conf", expr(confLangSql(langs)))
      .select(col("id").as("doc_id"), col("lang_pred"), col("conf"))
      .orderBy("doc_id")
  }

  def langIdSqlDuck(idCol: String, textCol: String): String = {
    val langs = profiles.map(_._1)
    val scoreCols = profiles.map { case (l, ws) => s"${ratioDuck("toks", ws)} AS s_$l" }.mkString(", ")
    s"""WITH t AS (SELECT $idCol AS id, ${tokensDuck(textCol)} AS toks FROM documents),
       |s AS (SELECT id, $scoreCols FROM t)
       |SELECT id AS doc_id,
       |       (${argmaxLangSql(langs)}) AS lang_pred,
       |       ${confLangSql(langs)} AS conf
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Characteristic character trigrams per language (the n-gram
    * language-ID signal proper; spaces participate, as usual).
    */
  val triProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "ent", "he "),
    "de" -> Seq("der", "die", "und", "sch", "ein", "ich"),
    "fr" -> Seq("les", "que", "des", "ait", "ous", "ee "),
    "es" -> Seq("los", "del", "que", "ado", "cio", "ent"))

  /** All overlapping character trigrams of an ALREADY-LOWERCASED text
    * column. Two traps handled: the lowercased text must be
    * materialized in its own projection first (a HOF lambda re-evaluates
    * an inlined lower(text) subtree per element — O(len^2) per doc,
    * the CLAUDE.md element_at trap), and sequence(1, n) is DESCENDING
    * for n < 1 so texts under 3 chars short-circuit to an empty array.
    */
  private def charTrigrams(loweredCol: String): Column =
    expr(s"CASE WHEN length($loweredCol) < 3 THEN array() " +
      s"ELSE transform(sequence(1, length($loweredCol) - 2), " +
      s"i -> substr($loweredCol, i, 3)) END")

  private def charTrigramsDuck(loweredCol: String): String =
    s"(CASE WHEN length($loweredCol) < 3 THEN [] " +
      s"ELSE list_transform(range(1, length($loweredCol) - 1), " +
      s"i -> substr($loweredCol, i, 3)) END)"

  /** Language ID via character n-grams: argmax profile-trigram ratio
    * with fixed precedence at ties, 'und' when nothing matches — the
    * n-gram counterpart to the stopword-profile heuristic.
    */
  def langIdNgram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lowered = df.select(col(idCol).as("id"), lower(col(textCol)).as("lt"))
    val withScores = triProfiles.foldLeft(
      lowered.select(col("id"), charTrigrams("lt").as("toks"))) {
      case (d, (lang, grams)) => d.withColumn(s"s_$lang", ratio(col("toks"), grams))
    }
    val langs = triProfiles.map(_._1)
    withScores
      .withColumn("lang_pred", expr(argmaxLangSql(langs)))
      .withColumn("conf", expr(confLangSql(langs)))
      .select(col("id").as("doc_id"), col("lang_pred"), col("conf"))
      .orderBy("doc_id")
  }

  def langIdNgramSqlDuck(idCol: String, textCol: String): String = {
    val langs = triProfiles.map(_._1)
    val scoreCols = triProfiles
      .map { case (l, ws) => s"${ratioDuck("toks", ws)} AS s_$l" }.mkString(", ")
    s"""WITH lt AS (SELECT $idCol AS id, lower($textCol) AS lt FROM documents),
       |t AS (SELECT id, ${charTrigramsDuck("lt")} AS toks FROM lt),
       |s AS (SELECT id, $scoreCols FROM t)
       |SELECT id AS doc_id,
       |       (${argmaxLangSql(langs)}) AS lang_pred,
       |       ${confLangSql(langs)} AS conf
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Composite quality score in [0,1]: length, alpha ratio, punctuation
    * penalty, stopword presence — the usual cheap pretraining filters.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array in its own projection first (the
    // langId/hashedShingles pattern): ratio() references the array in
    // three places (empty guard + filtered size + total size), and an
    // inlined tokens(t) subtree tokenizes each document up to 3x
    val staged = df.select(col(idCol).as("doc_id"), col(textCol).as("__t"),
      tokens(col(textCol)).as("__toks"))
    val t = col("__t")
    val nChars = length(t).cast("double")
    val alpha = size(expr("regexp_extract_all(__t, '[a-zA-Z]', 0)")).cast("double")
    val punct = size(expr("regexp_extract_all(__t, '[^a-zA-Z0-9 ]', 0)")).cast("double")
    val stopR = ratio(col("__toks"), profiles.head._2)
    staged.select(
        col("doc_id"),
        round(
          (least(lit(1.0), length(t).cast("double") / 200.0) +
            when(nChars === 0, 0.0).otherwise(alpha / nChars) +
            (lit(1.0) - when(nChars === 0, 0.0).otherwise(punct / nChars)) +
            least(lit(1.0), stopR * 5.0)) / 4.0, 4).as("quality"))
      .orderBy("doc_id")
  }

  def qualitySqlDuck(idCol: String, textCol: String): String =
    s"""WITH t AS (SELECT $idCol AS id, $textCol AS txt,
       |             ${tokensDuck(textCol)} AS toks FROM documents),
       |m AS (SELECT id,
       |        length(txt)::DOUBLE AS nc,
       |        len(regexp_extract_all(txt, '[a-zA-Z]'))::DOUBLE AS alpha,
       |        len(regexp_extract_all(txt, '[^a-zA-Z0-9 ]'))::DOUBLE AS punct,
       |        ${ratioDuck("toks", profiles.head._2)} AS stopr
       |      FROM t)
       |SELECT id AS doc_id,
       |  round((least(1.0, nc / 200.0)
       |       + (CASE WHEN nc = 0 THEN 0.0 ELSE alpha / nc END)
       |       + (1.0 - (CASE WHEN nc = 0 THEN 0.0 ELSE punct / nc END))
       |       + least(1.0, stopr * 5.0)) / 4.0, 4) AS quality
       |FROM m ORDER BY doc_id""".stripMargin

  /** Token counting three ways: whitespace split, the code-aware
    * analyzer, and a BPE-ish regex segmentation.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("ws_tokens"),
        size(tokens(col(textCol))).cast("long").as("analyzer_tokens"),
        size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+|[0-9]|[^a-z0-9\\\\s]', 0)"))
          .cast("long").as("bpe_ish_tokens"))
      .orderBy("doc_id")

  def tokenCountsSqlDuck(idCol: String, textCol: String): String =
    s"""SELECT $idCol AS doc_id,
       |  len(list_filter(string_split($textCol, ' '), t -> t <> ''))::BIGINT AS ws_tokens,
       |  len(${tokensDuck(textCol)})::BIGINT AS analyzer_tokens,
       |  len(regexp_extract_all(lower($textCol), '[a-z]+|[0-9]|[^a-z0-9\\s]'))::BIGINT AS bpe_ish_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprint: min/max shingle digests (rolling-hash
    * analogue over md5) + shingle count.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(array_distinct(shingles3(col("toks")))).as("sh"))
      .withColumn("d", md5(col("sh")))
      .groupBy("doc_id")
      .agg(min(col("d")).as("fp_min"), max(col("d")).as("fp_max"),
        count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")

  def fingerprintSqlDuck(idCol: String, textCol: String): String =
    s"""WITH t AS (SELECT $idCol AS id, ${tokensDuck(textCol)} AS toks FROM documents),
       |sh AS (SELECT DISTINCT id, unnest(${shingles3Duck("toks")}) AS sh FROM t)
       |SELECT id AS doc_id, min(md5(sh)) AS fp_min, max(md5(sh)) AS fp_max,
       |       count(*)::BIGINT AS n_shingles
       |FROM sh GROUP BY id ORDER BY doc_id""".stripMargin

  /** Context-window CHUNKING — the training-data primitive that turns
    * documents into model-context-sized token windows (window W tokens,
    * stride S, overlap W-S). Fully declarative: token array once per
    * doc, chunk starts exploded from a sequence, slices verified by a
    * CONTENT fingerprint (md5 over the chunk's tokens) so the oracle
    * gates the actual window text, not just counts. Empty docs yield no
    * chunks. Scales: per-doc arithmetic inside whole-stage codegen, no
    * shuffle at all until the terminal presentation sort.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1, s"window/stride must be >= 1, got $window/$stride")
    // stride > window would make the chunk-count formula emit starts
    // past the end of the doc (negative n_tokens -> runtime error or
    // oracle divergence out of slice()); gapped sampling is not a shape
    // this operator promises — fail loud at the API edge
    require(stride <= window,
      s"stride must be <= window (overlapping or adjacent chunks), got $window/$stride")
    // nChunks = 1 + max(0, ceil((n - W) / S)); greatest(0, ..) also
    // absorbs the trunc-vs-floor division divergence on the negative
    // numerator (Spark `div` truncates, DuckDB `//` floors — both land
    // at 0 after the clamp)
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(lit(0L), expr(s"(n - $window + $stride - 1) div $stride")))))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_tokens", least(lit(window.toLong), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("start_tok") + 1).cast("int"), col("n_tokens").cast("int"))))
          .as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")
  }

  def chunkSqlDuck(idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): String = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"window/stride must satisfy 1 <= stride <= window, got $window/$stride")
    s"""WITH t AS (SELECT $idCol AS id, ${tokensDuck(textCol)} AS toks FROM documents),
       |nz AS (SELECT id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
       |c AS (SELECT id, toks, n,
       |        unnest(range(0, 1 + greatest(0, (n - $window + $stride - 1) // $stride))) AS cid
       |      FROM nz)
       |SELECT id AS doc_id, cid::BIGINT AS chunk_id, (cid * $stride)::BIGINT AS start_tok,
       |  least($window, n - cid * $stride)::BIGINT AS n_tokens,
       |  md5(array_to_string(
       |    toks[cid * $stride + 1 : cid * $stride + least($window, n - cid * $stride)],
       |    ' ')) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Token-budget SEQUENCE PACKING — greedy first-fit in doc_id order:
    * a doc joins the current bin unless that would exceed `budget`
    * tokens (a doc larger than the budget gets a bin of its own).
    * Packing is a sequential fold, so the distributed form resets at
    * fixed doc_id RANGE boundaries (`rangeWidth` ids per range): ranges
    * pack independently and deterministically in parallel — the result
    * is independent of input partitioning, and each task holds at most
    * one range. The genuine-sequential-state case for typed mapGroups
    * (the brief's last-resort tier, used exactly where declarative ops
    * cannot express the running reset).
    */
  def packBins(df: DataFrame, idCol: String, textCol: String,
      budget: Int = 512, rangeWidth: Int = 100): DataFrame = {
    require(budget >= 1 && rangeWidth >= 1,
      s"budget/rangeWidth must be >= 1, got $budget/$rangeWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df.select(col(idCol).cast("long").as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("range_id", expr(s"doc_id div $rangeWidth"))
      .as[(Long, Long, Long)]
    slim.groupByKey(_._3)
      .flatMapGroups { (rangeId, rows) =>
        // group iterator order is not defined: pin doc_id order first
        val sorted = rows.toArray.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        sorted.iterator.map { case (id, n, _) =>
          if (fill > 0L && fill + n > budget) { bin += 1L; fill = n }
          else fill += n
          (id, n, rangeId, bin)
        }
      }
      .toDF("doc_id", "n_tokens", "range_id", "bin")
      .orderBy("doc_id")
  }

  /** Oracle: the same greedy fold as a DuckDB recursive CTE walking
    * each range's docs in doc_id order (all ranges advance in lockstep
    * per recursion depth).
    */
  def packBinsSqlDuck(idCol: String, textCol: String,
      budget: Int = 512, rangeWidth: Int = 100): String =
    s"""WITH RECURSIVE t AS (
       |  SELECT $idCol AS id, len(${tokensDuck(textCol)})::BIGINT AS n,
       |         ($idCol // $rangeWidth)::BIGINT AS range_id,
       |         row_number() OVER (PARTITION BY $idCol // $rangeWidth
       |                            ORDER BY $idCol) AS rn
       |  FROM documents),
       |p AS (
       |  SELECT id, n, range_id, rn, 0::BIGINT AS bin, n AS fill
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.id, t.n, t.range_id, t.rn,
       |    CASE WHEN p.fill > 0 AND p.fill + t.n > $budget THEN p.bin + 1 ELSE p.bin END,
       |    CASE WHEN p.fill > 0 AND p.fill + t.n > $budget THEN t.n ELSE p.fill + t.n END
       |  FROM p JOIN t ON t.range_id = p.range_id AND t.rn = p.rn + 1)
       |SELECT id AS doc_id, n AS n_tokens, range_id, bin
       |FROM p ORDER BY doc_id""".stripMargin
}
