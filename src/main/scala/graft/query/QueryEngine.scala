package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.analyze.{Analyzer, Levenshtein, SymSpell}
import graft.index.BuiltIndex

/** Search clauses: the WHERE-clause surface of the lnx SQL dialect
  * (SURVEY.md section 2.4; lnx-server/src/apis/mod.rs:200-281). Each
  * clause is one clause group; `required = true` composes clauses as a
  * conjunction whose score is the sum of clause scores (P4).
  */
sealed trait SearchClause { def required: Boolean }

/** `fts(col, query)`: BM25; trailing `*` on a term = prefix expansion
  * (apis/mod.rs:208-222). */
final case class Fts(field: String, query: String, required: Boolean = true) extends SearchClause

/** `fuzzy(col, query)`: BM25 x edit-distance multiplier
  * (apis/mod.rs:225-246; worked example pins distance 2 -> 0.6). */
final case class FuzzyC(field: String, query: String, maxDist: Int = 2,
    multipliers: Seq[Double] = Seq(1.0, 0.8, 0.6), required: Boolean = true) extends SearchClause {
  // compile indexes multipliers(min(d, size - 1)): an empty list would
  // surface as a bare IndexOutOfBounds(-1) deep in query compilation
  require(multipliers.nonEmpty, "fuzzy needs at least one distance multiplier")
  // WAND's block-max upper bounds assume non-negative term weights
  // (max-tf x weight is only an UPPER bound for weight >= 0): a
  // negative multiplier would turn them into lower bounds and let the
  // pruned path silently return a different top-k than the exhaustive
  // scorer
  require(multipliers.forall(_ >= 0.0), "distance multipliers must be non-negative")
}

/** `levenshtein(col, query)`: pure fuzzy match, 1.0/0.0, no BM25
  * (apis/mod.rs:249-266). */
final case class LevC(field: String, query: String, maxDist: Int = 2,
    required: Boolean = true) extends SearchClause

/** `regex(col, pattern)`: pattern vs whole terms, 1.0/0.0
  * (apis/mod.rs:269-281). */
final case class RegexC(field: String, pattern: String, required: Boolean = true) extends SearchClause

/** lnx fast-fuzzy: pre-computed spell correction of the query, then
  * plain BM25 (README.md:28; SURVEY.md F5). */
final case class FastFuzzy(field: String, query: String, required: Boolean = true) extends SearchClause

/** more-like-this: top tf-idf terms of a seed doc as a disjunction
  * (README.md:29; SURVEY.md F6). */
final case class MoreLikeThis(field: String, docId: Long, topTerms: Int = 8,
    required: Boolean = true) extends SearchClause

/** Compiles search clauses against an index's term dictionary and runs
  * them through the distributed scorers. Term-dictionary lookups
  * (df, prefix/fuzzy/regex expansion) execute as pushdown filters on
  * the termStats Dataset and collect only the matched entries — the
  * Spark analogue of tantivy consulting its FST term dictionary at
  * plan time.
  */
final class QueryEngine(val index: BuiltIndex) {
  import SearchDefaults._

  /** Upsert tombstones (docIds superseded by later epochs) as a typed
    * Dataset — cogrouped with the posting shards inside the scoring
    * plan (Lucene/tantivy delete-bitset analogue), never collected to
    * the driver: a heavy-churn table between compactions stays a
    * distributed column, not a task-closure Set.
    */
  private lazy val deletesDs: Option[org.apache.spark.sql.Dataset[Long]] =
    index.deletes.map { d =>
      val spark = index.spark
      import spark.implicits._
      d.select(col("docId")).as[Long]
    }

  /** Driver-side term-dictionary snapshot (the tantivy-FST analogue —
    * see LocalTermDict). Probed ONCE per engine with a capped collect
    * (`limit(cap+1)` — bounded at any corpus scale): when the whole
    * dictionary fits under `graft.dict.localMaxTerms`, every dictionary
    * lookup below answers driver-side with zero Spark jobs; otherwise
    * None and the distributed lookup jobs run unchanged (the 100 TB
    * path). Lazy: engines that never consult the dictionary never pay
    * the probe. The conf resolves at first use and is pinned for the
    * engine's lifetime (mutations invalidate by engine replacement,
    * like both LRUs above).
    */
  private lazy val localDict: Option[LocalTermDict] = {
    val cap = index.spark.conf
      .get("graft.dict.localMaxTerms", SearchDefaults.LocalDictMaxTerms.toString).toInt
    if (cap <= 0) None
    else {
      val rows = index.termStats.select(col("field"), col("term"), col("df"))
        .limit(cap + 1).collect()
      if (rows.length > cap) None
      else Some(LocalTermDict.fromRows(
        rows.map(r => (r.getString(0), r.getString(1), r.getLong(2)))))
    }
  }

  /** Observability: whether this engine serves dictionary lookups from
    * the driver-side snapshot (forces the probe). */
  private[graft] def localDictActive: Boolean = localDict.nonEmpty

  /** field -> (term -> df) for an exact term batch. */
  private def dfLookup(keys: Seq[(String, String)]): Map[(String, String), Long] = {
    if (keys.isEmpty) return Map.empty
    localDict match {
      case Some(d) =>
        return keys.distinct.flatMap(k => d.df(k._1, k._2).map(df => k -> df)).toMap
      case None =>
    }
    val fields = keys.map(_._1).distinct
    val terms = keys.map(_._2).distinct
    // Set membership, not Seq.contains: compileMany feeds this the
    // union of a whole batch's terms, and O(|rows| x |keys|) pair
    // comparisons on the driver would sit on the throughput path
    val keySet = keys.toSet
    index.termStats
      .filter(col("field").isin(fields: _*) && col("term").isin(terms: _*))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
      .filter { case (k, _) => keySet(k) }
  }

  /** Batched prefix expansion: ONE job for all prefix tokens of a
    * clause (per-token Spark jobs would pay a scheduler round-trip
    * each). Per-prefix cap + term order run in-plan via a window, so
    * the driver collects at most (#prefixes x MaxExpansions) rows.
    */
  private def prefixExpandAll(field: String,
      prefixes: Seq[String]): Map[String, Seq[(String, Long)]] = {
    if (prefixes.isEmpty) return Map.empty
    localDict match {
      case Some(d) =>
        // same shape as the collected-row path below: capped per prefix
        // in UTF8-binary term order (the in-plan TakeOrdered/window
        // order), empty prefixes absent from the map, final per-prefix
        // sort by Java string order mirroring the sortBy on collect
        return prefixes.distinct
          .map(p => p -> d.prefixCapped(field, p, MaxExpansions).sortBy(_._1))
          .filter(_._2.nonEmpty).toMap
      case None =>
    }
    val rows = prefixCandidates(field, prefixes).collect()
    rows.groupBy(_.getString(0)).map { case (pfx, rs) =>
      pfx -> rs.map(r => (r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    }
  }

  /** Capped (pfx, term, df) candidate frame for prefix expansion —
    * package-visible so PlanSpec can assert the plan shape.
    *
    * Every prefix is a LITERAL, so each `startsWith` pushes to the
    * parquet scan as StringStartsWith and their OR prunes row groups of
    * the term-sorted persisted dictionary — the dataflow analogue of
    * tantivy's per-prefix FST range scan (tantivy-sstable). The
    * multi-prefix shape (`fts(name, 'Tim* Mich*')`, apis/mod.rs:221)
    * previously joined the dictionary on a column-to-column startsWith,
    * which planned as a BroadcastNestedLoopJoin — a full un-pruned
    * dictionary scan per clause; now it is the SAME single pushed-down
    * scan as one prefix, with in-plan tagging instead of a join.
    */
  private[graft] def prefixCandidates(field: String, prefixes: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = prefixes.distinct
    if (ps.size == 1) {
      // single prefix (the common case): no window needed — the term
      // sort + cap collapse into a TakeOrdered over the pruned scan
      val pfx = ps.head
      return index.termStats
        .filter(col("field") === field && col("term").startsWith(pfx))
        .orderBy(col("term"))
        .limit(MaxExpansions)
        .select(lit(pfx).as("pfx"), col("term"), col("df"))
    }
    // a term can extend several prefixes (e.g. 'mer' and 'merge'): tag
    // it with each in-plan (array of matched prefixes -> explode), then
    // cap per prefix via the window — one scan, one job, zero joins
    val anyPfx = ps.map(p => col("term").startsWith(p)).reduce(_ || _)
    val tags = array(ps.map(p => when(col("term").startsWith(p), lit(p))): _*)
    val w = Window.partitionBy(col("pfx")).orderBy(col("term").asc)
    index.termStats
      .filter(col("field") === field && anyPfx)
      .withColumn("pfx", explode(filter(tags, _.isNotNull)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= MaxExpansions)
      .select(col("pfx"), col("term"), col("df"))
  }

  /** Distributed fuzzy expansion. For the standard d <= 2 (the lnx
    * surface), candidates come from the precomputed SymSpell
    * delete-variant dictionary — two terms within distance 2 always
    * share a depth-2 delete variant (completeness asserted in
    * SymSpellSpec), so the expensive levenshtein only runs on the
    * variant-matched sliver instead of the whole dictionary (the
    * dataflow analogue of tantivy's levenshtein automata over the FST).
    * Wider distances fall back to a length-banded dictionary scan. In
    * both paths the (distance, term) sort + MaxExpansions truncation
    * happen INSIDE the plan (TakeOrdered), so the driver collects at
    * most MaxExpansions rows; the banded DP re-verifies driver-side
    * (built-in and DP must agree).
    *
    * Batched fuzzy expansion for ALL tokens of a clause in ONE job.
    * Candidates are tagged with their query token in-plan (a broadcast
    * join against the tiny (tok, variant) frame), the levenshtein
    * verify + per-token (distance, term) cap run in-plan via a window,
    * and the driver re-verifies with the banded DP (built-in and DP
    * must agree). At most (#tokens x MaxExpansions) rows are collected.
    */
  private def fuzzyExpandAll(field: String, toks: Seq[String],
      maxDist: Int): Map[String, Seq[(String, Long, Int)]] = {
    if (toks.isEmpty) return Map.empty
    localDict match {
      case Some(d) =>
        // admitted set, cap and both sort orders mirror the in-plan
        // window + driver re-verify exactly (LocalTermDict.fuzzyCapped);
        // tokens with no candidates absent, like the groupBy below
        return toks.distinct
          .map(t => t -> d.fuzzyCapped(field, t, maxDist, MaxExpansions))
          .filter(_._2.nonEmpty).toMap
      case None =>
    }
    val spark = index.spark
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cand = fuzzyCandidates(field, toks, maxDist)
    val w = Window.partitionBy(col("tok")).orderBy(col("dist").asc, col("term").asc)
    val rows = cand
      .withColumn("dist", levenshtein(col("term"), col("tok")))
      .filter(col("dist") <= maxDist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= MaxExpansions)
      .select(col("tok"), col("term"), col("df"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (tok, rs) =>
      tok -> rs
        .map(r => (r.getString(1), r.getLong(2), Levenshtein.distance(tok, r.getString(1), maxDist)))
        .filter(_._3 <= maxDist)
        .sortBy(t => (t._3, t._1))
        .toSeq
    }
  }

  /** Candidate (tok, term, df) frame for fuzzy expansion — package-
    * visible so PlanSpec can assert both branches' join shapes.
    */
  private[graft] def fuzzyCandidates(field: String, toks: Seq[String],
      maxDist: Int): DataFrame = {
    val spark = index.spark
    import spark.implicits._
    if (maxDist <= SymSpell.MaxDistance && index.symspell.nonEmpty) {
        // SymSpell variant prefilter: complete for distance <= 2, so the
        // levenshtein only runs on the variant-matched sliver (the
        // dataflow analogue of tantivy's levenshtein automata). Only
        // taken when the dictionary is the PERSISTED fast-fuzzy artifact
        // (variant-range-partitioned -> row-group pruning); against the
        // lazily-built in-memory dict this is a 20x-bigger scan than the
        // length-banded term scan below (measured at sf0.1)
        val pairs = toks.distinct.flatMap(t => SymSpell.deletes(t).iterator.map(v => (t, v)))
        val vdf = pairs.toDF("tok", "variant")
        symspellDict
          .filter(col("field") === field)
          .join(broadcast(vdf), "variant")
          .select(col("tok"), col("term"), col("df")).distinct()
      } else {
        // length-banded dictionary scan as an EQUI-join: each token
        // explodes to its admissible term lengths [len-d, len+d], so the
        // join keys on length(term) and plans as a broadcast HASH join —
        // the `length(term) BETWEEN length(tok)±d` non-equi form plans
        // as BroadcastNestedLoopJoin, i.e. a full dictionary re-scan per
        // token (PlanSpec asserts the shape)
        val pairs = toks.distinct.flatMap { t =>
          // CODEPOINT count: Spark's length() counts codepoints, and the
          // band keys on it — t.length (UTF-16 units) would misplace the
          // band for astral-codepoint tokens and drop exact matches
          val n = t.codePointCount(0, t.length)
          (math.max(1, n - maxDist) to (n + maxDist)).map(l => (t, l))
        }
        val tdf = pairs.toDF("tok", "len")
        index.termStats
          .filter(col("field") === field)
          .join(broadcast(tdf), length(col("term")) === col("len"))
          .select(col("tok"), col("term"), col("df"))
      }
  }

  private def regexExpand(field: String, pattern: String): Seq[(String, Long)] =
    localDict match {
      case Some(d) => d.regexCapped(field, pattern, MaxExpansions)
      case None =>
        regexCandidates(field, pattern)
          .orderBy(col("term"))
          .limit(MaxExpansions)
          .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    }

  /** Regex candidate frame — package-visible so PlanSpec can assert
    * the pruned scan shape. `rlike` can never push to parquet, but a
    * pattern with a required literal prefix (e.g. `foo.*`) admits a
    * pushable StringStartsWith alongside it, pruning row groups of the
    * term-sorted dictionary before the regex runs — the dataflow
    * analogue of tantivy evaluating regexes over the FST, where the
    * automaton's required prefix bounds the key range walked.
    */
  private[graft] def regexCandidates(field: String, pattern: String): DataFrame = {
    val base = index.termStats.filter(col("field") === field)
    val pfx = RegexPrefix.literalPrefix(pattern)
    val pruned = if (pfx.isEmpty) base else base.filter(col("term").startsWith(pfx))
    pruned.filter(col("term").rlike("^(?:" + pattern + ")$"))
  }

  /** SymSpell delete-variant dictionary (field, variant, term, df) —
    * the build-time artifact behind fast-fuzzy. Segments written in
    * fast-fuzzy mode carry it persisted (variant-range-partitioned for
    * pushdown, the reference's index-time pre-compute, README.md:28);
    * otherwise it builds lazily on first use.
    */
  private var symspellMaterialized = false
  lazy val symspellDict: DataFrame = {
    symspellMaterialized = true
    index.symspell.getOrElse(
      SymSpellDict.build(index.termStats).persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Release every cached frame this engine pinned: the underlying
    * index, plus the session-built SymSpell dictionary if it was
    * materialized (an index-carried dictionary is unpersisted by
    * index.unpersist() itself). Spark's CacheManager holds persisted
    * datasets strongly — dropping the engine reference alone leaks the
    * MEMORY_AND_DISK blocks until executor storage eviction.
    */
  def release(): Unit = {
    index.unpersist()
    if (symspellMaterialized && index.symspell.isEmpty) symspellDict.unpersist()
  }

  /** Fast-fuzzy correction of ALL query tokens in one lookup job —
    * fast-fuzzy is the reference's *fast* path (README.md:28,41), so a
    * per-token Spark job would invert its 30x property on multi-token
    * queries. All tokens' delete-variants union into a single pushed-
    * down filter; best-per-token (min distance, max df, lexicographic)
    * is picked driver-side from the one collected candidate batch.
    */
  def correctAll(field: String, toks: Seq[String]): Map[String, String] =
    correctAllDf(field, toks).map { case (tok, r) => tok -> r.map(_._1).getOrElse(tok) }

  /** As correctAll, also returning the corrected term's dictionary df
    * (the candidates carry it) — None when the token has no in-dict
    * candidate at all, which implies the token itself is not a
    * dictionary term (a term's own 0-delete variant always matches
    * itself). The single-query fast-fuzzy compile path consumes this
    * directly, skipping the separate df-lookup Spark job it used to
    * run for the corrected terms.
    */
  def correctAllDf(field: String, toks: Seq[String]): Map[String, Option[(String, Long)]] = {
    if (toks.isEmpty) return Map.empty
    localDict match {
      case Some(d) =>
        // the variant prefilter is COMPLETE for d <= MaxDistance and
        // pickBestDf discards everything beyond it (SymSpellSpec), so
        // the verified candidate set is exactly {terms : dist <= 2} —
        // which the local length-banded scan produces directly
        return toks.distinct.map { tok =>
          tok -> graft.analyze.SymSpell.pickBestDf(
            tok, d.fuzzyAll(field, tok, SymSpell.MaxDistance))
        }.toMap
      case None =>
    }
    val variantsByTok: Map[String, Set[String]] =
      toks.distinct.map(t => t -> SymSpell.deletes(t)).toMap
    val allVariants = variantsByTok.values.flatten.toSeq.distinct
    val hits = symspellDict
      .filter(col("field") === field && col("variant").isin(allVariants: _*))
      .select(col("variant"), col("term"), col("df")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byVariant = hits.groupBy(_._1)
    variantsByTok.map { case (tok, vars) =>
      val cands = vars.iterator
        .flatMap(v => byVariant.getOrElse(v, Array.empty[(String, String, Long)]))
        .map(h => (h._2, h._3)).toSeq.distinct
      tok -> SymSpell.pickBestDf(tok, cands)
    }
  }

  /** Single-token convenience over correctAll. */
  def correct(field: String, tok: String): String = correctAll(field, Seq(tok))(tok)

  /** Top tf-idf terms of a seed document (more-like-this). */
  def seedTerms(field: String, docId: Long, topTerms: Int): Seq[String] = {
    // fail with a clear contract error rather than a ClassCastException
    // out of getString below when the seed field is a non-text column
    // (a non-INDEXED text field degrades gracefully to zero terms via
    // dfLookup; only the type case needs the explicit gate)
    val dt = index.docs.schema(field).dataType
    // isInstanceOf, not singleton ==: collated StringType still getStrings fine
    require(dt.isInstanceOf[org.apache.spark.sql.types.StringType],
      s"more_like_this: field '$field' is ${dt.simpleString}, not a text column")
    val rows = index.docs.filter(col("docId") === docId).select(col(field)).collect()
    if (rows.isEmpty) return Nil
    val (counts, _) = graft.analyze.Tokenizers.tokenCounts(
      index.config.tokenizerOf(field), Option(rows(0).getString(0)).getOrElse(""))
    val dfs = dfLookup(counts.keys.map(t => (field, t)).toSeq)
    counts.toSeq
      .flatMap { case (t, tf) =>
        dfs.get((field, t)).map(df => (tf.toDouble * Bm25.idfF64(df, index.numDocs), t))
      }
      .sortBy { case (tfidf, t) => (-tfidf, t) }
      .take(topTerms)
      .map(_._2)
  }

  /** Compiled-query LRU: dictionary expansions (prefix/fuzzy/regex,
    * SymSpell correction) run Spark jobs, so repeated queries must not
    * re-pay them — the engine-side analogue of the reference caching
    * compiled query parts across requests (apis/mod.rs:68-69). Keyed on
    * the clause list (params are already bound into it); the cache dies
    * with the engine, which mutations invalidate.
    */
  private val compileCache =
    new java.util.LinkedHashMap[Seq[SearchClause], CompiledQuery](16, 0.75f, true) {
      // capacity >= MaxBatchWidth so one batch can never evict itself
      // between compile and execution; entries are driver-side term
      // lists (a few KB), so even full this is megabytes, not memory
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[SearchClause], CompiledQuery]): Boolean =
        size() > SearchDefaults.MaxBatchWidth
    }

  /** Observability: compile calls served from the LRU. */
  @volatile var compileCacheHits: Long = 0L

  /** Planned-DataFrame LRU for the f32 serving paths: a repeated query
    * re-pays Catalyst analysis/optimization/physical planning (~40-50 ms
    * per call — measured as the dominant slice of the exchange-free
    * top-k latency) even though the plan is identical. Caching the LAZY
    * frame reuses the planned QueryExecution while every collect()
    * still re-executes it against the cached index — results are
    * recomputed per call, never stored (the frames carry no persist).
    * This extends the compiled-query LRU above one level up, the same
    * reference semantics (compiled query parts cached across requests,
    * apis/mod.rs:68-69); like it, the cache dies with the engine, which
    * mutations invalidate. Only stats-free calls are cacheable: a
    * wandStats accumulator is captured in task closures, so those
    * frames are per-caller.
    */
  private val planCache =
    new java.util.LinkedHashMap[AnyRef, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[AnyRef, DataFrame]): Boolean =
        size() > SearchDefaults.MaxBatchWidth
    }

  /** Observability: searches served a memoized planned frame. */
  @volatile var planCacheHits: Long = 0L

  private def cachedPlan(key: AnyRef)(build: => DataFrame): DataFrame = {
    planCache.synchronized {
      val hit = planCache.get(key)
      if (hit != null) { planCacheHits += 1; return hit }
    }
    // build OUTSIDE the lock: compile() inside may run dictionary jobs
    val df = build
    planCache.synchronized { planCache.put(key, df) }
    df
  }

  def compile(clauses: Seq[SearchClause]): CompiledQuery = {
    compileCache.synchronized {
      val hit = compileCache.get(clauses)
      if (hit != null) { compileCacheHits += 1; return hit }
    }
    // compile OUTSIDE the lock: dictionary expansion runs Spark jobs,
    // and holding the LRU lock across them would serialize concurrent
    // callers behind cluster work
    val cq = compileUncached(clauses, LookupCtx.empty)
    compileCache.synchronized { compileCache.put(clauses, cq) }
    cq
  }

  /** Pre-fetched dictionary lookups shared by a compile BATCH. `None`
    * per kind = fall back to the per-query lookup job (the single-query
    * compile path passes all-None). Keys: dfs (field, term) -> df;
    * prefix (field, prefix-sans-*) -> capped expansion; fuzzy
    * (field, maxDist, token) -> capped expansion; corrections
    * (field, token) -> fast-fuzzy corrected term.
    */
  private final case class LookupCtx(
      dfs: Option[Map[(String, String), Long]],
      prefix: Option[Map[(String, String), Seq[(String, Long)]]],
      fuzzy: Option[Map[(String, Int, String), Seq[(String, Long, Int)]]],
      corrections: Option[Map[(String, String), String]])
  private object LookupCtx { val empty = LookupCtx(None, None, None, None) }

  /** Compile a BATCH of queries with the dictionary jobs coalesced: one
    * df-lookup job, one prefix-expansion job per field, one fuzzy
    * expansion per (field, maxDist), one SymSpell correction batch per
    * field — independent of batch width. Per-query, a batch compile
    * produces the identical CompiledQuery as compile() (same helpers,
    * same caps, same order; BatchSearchSpec gates it), and results land
    * in the same LRU. Regex / more-like-this clauses keep their
    * per-query jobs — they are not the high-QPS shape.
    */
  def compileMany(batch: Seq[Seq[SearchClause]]): Seq[CompiledQuery] = {
    import scala.collection.mutable
    // assemble results OUT OF BAND of the LRU: a batch wider than the
    // cache capacity evicts its own fresh entries, and a final
    // lookup-through-compile() would silently RE-compile the evicted
    // majority via per-query dictionary jobs (measured: ~384 stray
    // compile jobs inside one 512-wide timed batch)
    val compiled = mutable.HashMap.empty[Seq[SearchClause], CompiledQuery]
    compileCache.synchronized {
      batch.distinct.foreach { q =>
        val hit = compileCache.get(q)
        if (hit != null) { compileCacheHits += 1; compiled(q) = hit }
      }
    }
    val misses = batch.distinct.filterNot(compiled.contains)
    if (misses.nonEmpty) {
      val exactNeeds = mutable.LinkedHashSet.empty[(String, String)]
      val prefixNeeds = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
      val fuzzyNeeds = mutable.LinkedHashMap.empty[(String, Int), mutable.LinkedHashSet[String]]
      val ffNeeds = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
      misses.flatten.foreach {
        case Fts(field, query, _) =>
          val (prefixToks, exactToks) = ftsTokenParts(field, query)
          exactToks.foreach(t => exactNeeds += ((field, t)))
          prefixToks.foreach(p =>
            prefixNeeds.getOrElseUpdate(field, mutable.LinkedHashSet.empty) += p.dropRight(1))
        case FuzzyC(field, query, maxDist, _, _) =>
          tokenizeQuery(field, query).foreach(t =>
            fuzzyNeeds.getOrElseUpdate((field, maxDist), mutable.LinkedHashSet.empty) += t)
        case LevC(field, query, maxDist, _) =>
          tokenizeQuery(field, query).foreach(t =>
            fuzzyNeeds.getOrElseUpdate((field, maxDist), mutable.LinkedHashSet.empty) += t)
        case FastFuzzy(field, query, _) =>
          tokenizeQuery(field, query).foreach(t =>
            ffNeeds.getOrElseUpdate(field, mutable.LinkedHashSet.empty) += t)
        case _ => // RegexC / MoreLikeThis: per-query fallback inside compileUncached
      }
      val corrections: Map[(String, String), String] =
        ffNeeds.iterator.flatMap { case (f, toks) =>
          correctAll(f, toks.toSeq).iterator.map { case (t, c) => (f, t) -> c }
        }.toMap
      // corrected terms need df entries too (FastFuzzy scores them as exact terms)
      corrections.foreach { case ((f, _), c) => exactNeeds += ((f, c)) }
      val dfs = dfLookup(exactNeeds.toSeq)
      val prefix: Map[(String, String), Seq[(String, Long)]] =
        prefixNeeds.iterator.flatMap { case (f, ps) =>
          prefixExpandAll(f, ps.toSeq).iterator.map { case (p, ex) => (f, p) -> ex }
        }.toMap
      val fuzzy: Map[(String, Int, String), Seq[(String, Long, Int)]] =
        fuzzyNeeds.iterator.flatMap { case ((f, d), toks) =>
          fuzzyExpandAll(f, toks.toSeq, d).iterator.map { case (tok, ex) => (f, d, tok) -> ex }
        }.toMap
      val ctx = LookupCtx(Some(dfs), Some(prefix), Some(fuzzy), Some(corrections))
      misses.foreach { q =>
        val cq = compileUncached(q, ctx)
        compiled(q) = cq
        compileCache.synchronized { compileCache.put(q, cq) }
      }
    }
    batch.map(compiled)
  }

  /** Fts token split shared by compile and the batch gatherer: raw
    * fields have no prefix-marker semantics (a trailing '*' stays part
    * of the exact value); otherwise tokens ending in '*' are prefix
    * expansion requests.
    */
  private def ftsTokenParts(field: String, query: String): (Seq[String], Seq[String]) = {
    val toks = tokenizeQuery(field, query)
    if (index.config.tokenizerOf(field) == "raw") (Nil, toks)
    else toks.partition(_.endsWith("*"))
  }

  /** Compile clauses to weighted terms. Group ids = clause positions. */
  private def compileUncached(clauses: Seq[SearchClause], ctx: LookupCtx): CompiledQuery = {
    require(clauses.size <= 32, "at most 32 clause groups")
    val n = index.numDocs
    val groups = clauses.zipWithIndex.map { case (c, i) =>
      CompiledGroup(i, c.required, c match {
        case _: LevC | _: RegexC => true
        case _ => false
      })
    }
    val terms = clauses.zipWithIndex.flatMap { case (c, g) =>
      c match {
        case Fts(field, query, _) =>
          val (prefixToks, exactToks) = ftsTokenParts(field, query)
          val exact = ctx.dfs match {
            case Some(m) =>
              exactToks.distinct.flatMap(t => m.get((field, t)).map(df => (field, t, df, 1.0)))
            case None =>
              dfLookup(exactToks.map(t => (field, t)).distinct)
                .map { case ((f, t), df) => (f, t, df, 1.0) }.toSeq
          }
          val expanded = ctx.prefix match {
            case Some(m) =>
              prefixToks.map(p => p.dropRight(1) -> m.getOrElse((field, p.dropRight(1)), Nil)).toMap
            case None => prefixExpandAll(field, prefixToks.map(_.dropRight(1)))
          }
          val pre = prefixToks.flatMap(p => expanded.getOrElse(p.dropRight(1), Nil))
            .map { case (t, df) => (field, t, df, 1.0) }
          (exact ++ pre).map { case (f, t, df, m) => mkTerm(f, t, df, m, g, n) }
        case FuzzyC(field, query, maxDist, mult, _) =>
          val toks = tokenizeQuery(field, query)
          val exp = fuzzyLookups(field, toks, maxDist, ctx)
          toks.flatMap { tok =>
            exp.getOrElse(tok, Nil).map { case (t, df, d) =>
              mkTerm(field, t, df, mult(math.min(d, mult.size - 1)), g, n)
            }
          }
        case LevC(field, query, maxDist, _) =>
          val toks = tokenizeQuery(field, query)
          val exp = fuzzyLookups(field, toks, maxDist, ctx)
          toks.flatMap { tok =>
            exp.getOrElse(tok, Nil).map { case (t, df, _) => mkTerm(field, t, df, 1.0, g, n) }
          }
        case RegexC(field, pattern, _) =>
          regexExpand(field, pattern).map { case (t, df) => mkTerm(field, t, df, 1.0, g, n) }
        case FastFuzzy(field, query, _) =>
          val raw = tokenizeQuery(field, query)
          ctx.corrections match {
            case Some(m) =>
              // batch path: corrections pre-fetched; corrected terms'
              // dfs ride the batch's ONE coalesced df-lookup job
              val toks = raw.map(t => m.getOrElse((field, t), t)).distinct
              val dfs = ctx.dfs.getOrElse(Map.empty)
              toks.flatMap(t => dfs.get((field, t)).map(df => mkTerm(field, t, df, 1.0, g, n)))
            case None =>
              // single-query path: the correction candidates already
              // carry each term's df — one dictionary job total (a
              // second dfLookup job per query was pure overhead). A
              // None result means the token is not a dictionary term
              // (its own 0-delete variant would have matched), i.e.
              // exactly the tokens the old df lookup found nothing for.
              val byTok = correctAllDf(field, raw)
              raw.flatMap(t => byTok.getOrElse(t, None)).distinct
                .map { case (t, df) => mkTerm(field, t, df, 1.0, g, n) }
          }
        case MoreLikeThis(field, docId, topTerms, _) =>
          val toks = seedTerms(field, docId, topTerms)
          dfLookup(toks.map(t => (field, t))).map { case ((f, t), df) => mkTerm(f, t, df, 1.0, g, n) }
      }
    }
    // dedupe (field, term, group); keep first
    val seen = scala.collection.mutable.HashSet.empty[(String, String, Int)]
    val uniq = terms.filter(t => seen.add((t.field, t.term, t.group)))
    CompiledQuery(uniq, groups)
  }

  private def mkTerm(f: String, t: String, df: Long, mult: Double, g: Int, n: Long): CompiledTerm =
    CompiledTerm(f, t, g, Bm25.weightF32(df, n) * mult.toFloat, Bm25.weightF64(df, n) * mult, df)

  /** Fuzzy expansions for a clause's tokens: from the batch ctx when
    * present, else the per-clause batched job.
    */
  private def fuzzyLookups(field: String, toks: Seq[String], maxDist: Int,
      ctx: LookupCtx): Map[String, Seq[(String, Long, Int)]] =
    ctx.fuzzy match {
      case Some(m) => toks.map(t => t -> m.getOrElse((field, maxDist, t), Nil)).toMap
      case None => fuzzyExpandAll(field, toks, maxDist)
    }

  /** Query tokenization: same tokenizer as the indexed column
    * (apis/mod.rs:211-213), except a trailing `*` survives as a prefix
    * marker on its token. A `raw`-tokenized column yields the whole
    * query text as ONE un-analyzed token (exact-value match) — no
    * whitespace splitting and no prefix-marker stripping, so values
    * legitimately ending in '*' stay exact (compile skips the prefix
    * partition for raw fields).
    */
  def tokenizeQuery(field: String, q: String): Seq[String] = {
    val name = index.config.tokenizerOf(field)
    if (name == "raw") graft.analyze.Tokenizers.tokenize(name, q).toSeq
    else q.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { raw =>
      val isPrefix = raw.endsWith("*")
      val toks = graft.analyze.Tokenizers.tokenize(name, if (isPrefix) raw.dropRight(1) else raw)
      if (toks.isEmpty) Nil
      else if (isPrefix) toks.init ++ Seq(toks.last + "*")
      else toks.toSeq
    }
  }

  /** (docId, score float) — rank-identity path. Block-max WAND handles
    * eligible queries by default — single sum-scored groups AND
    * all-required conjunctions (the reference's flagship WHERE shape) —
    * and is exact w.r.t. the exhaustive scorer (WandSpec).
    */
  def searchF32(clauses: Seq[SearchClause], k: Int = DefaultLimit, useWand: Boolean = true,
      wandStats: Option[Wand.Stats] = None): DataFrame = {
    // LIMIT 0 is legal SQL and must return zero rows, not crash the
    // WAND tasks (PriorityQueue rejects initialCapacity < 1)
    if (k <= 0) return emptyResultF32
    def build: DataFrame = {
      val cq = compile(clauses)
      if (cq.terms.isEmpty) return emptyResultF32
      val scored =
        if (useWand && cq.groups.size == 1 && !cq.groups.head.constScore && disjSelective(cq))
          Wand.topK(index, cq, k, deletesDs, wandStats)
        else if (useWand && cq.groups.size > 1 && cq.groups.forall(_.required) && conjSelective(cq))
          Wand.topKConj(index, cq, k, deletesDs, wandStats)
        else Scorer.scoreF32(index, cq, deletesDs)
      Scorer.topK(scored.toDF("docId", "score"), k)
    }
    if (wandStats.isEmpty) cachedPlan((clauses, k, useWand))(build) else build
  }

  /** Cost gate for single-group (disjunction) WAND, mirroring
    * conjSelective: block-max skips happen when at least one term is
    * selective — its high-idf hits push the top-k threshold above the
    * dense terms' block maxima (93% of the hot term's blocks skipped on
    * the rare+hot shape at 2M docs, BENCH.md). A uniformly dense
    * disjunction (every term hot) never lifts the threshold past any
    * block max, skips nothing, and pays pure cursor bookkeeping
    * (measured 0.94x vs exhaustive) — route it to the exhaustive
    * hash scorer instead.
    */
  private def disjSelective(cq: CompiledQuery): Boolean =
    cq.terms.map(_.df).min * 4 <= index.numDocs

  /** Cost gate for conjunction WAND: leapfrog + block-max pays off when
    * at least one required group is selective (the intersection is
    * sparse and the other groups' blocks get skipped between its
    * postings — measured 1.8x at 2M docs). A dense-x-dense conjunction
    * has nothing to skip and the per-candidate bookkeeping just loses
    * to the exhaustive hash scorer (measured +24%), so it stays there.
    */
  private def conjSelective(cq: CompiledQuery): Boolean = {
    val minGroupDf = cq.groups.map(g => cq.terms.filter(_.group == g.id).map(_.df).sum).min
    minGroupDf * 4 <= index.numDocs
  }

  /** (docId, score double) — oracle-parity path. Top-k selection runs
    * under the ORACLE's total order (round(score,4) desc, docId asc),
    * the same order searchManyF64's shard heaps use — selecting under
    * raw-double order disagreed with the batched path (and DuckDB's
    * LIMIT) whenever k cut between docs tied at 4dp.
    */
  def searchF64(clauses: Seq[SearchClause], k: Int = DefaultLimit,
      threshold: Option[Double] = None): DataFrame =
    matchF64(clauses, threshold)
      .orderBy(round(col("score"), 4).desc, col("docId").asc).limit(k)

  /** Batched multi-query top-k — the cluster THROUGHPUT path
    * (qid, docId, score float). The reference's envelope is many small
    * queries per second ("process searches like ... another lookup",
    * README.md); per-query Spark jobs pay a scheduler round-trip each,
    * so a serving layer batches: ALL queries of the batch score in ONE
    * pass over the union of their matched postings — each posting block
    * decodes once per shard and replays per query in the exact
    * single-query accumulation order, making per-query results
    * bit-identical to searchF32 (BatchSearchSpec). Shard-local
    * per-query heaps bound the exchange at (#shards x #queries x k)
    * rows, and compileMany coalesces the dictionary jobs, so total job
    * count is O(1) in batch width. Block-max pruning applies PER QUERY
    * on top of the shared decode (Wand.topKMany): every query runs the
    * algorithm the single-query path would pick for it, all queries of
    * a shard draw blocks from one lazy cache, and a block decodes only
    * if ANY query of the batch actually lands on it.
    */
  def searchManyF32(queries: Seq[(Int, Seq[SearchClause])], k: Int = DefaultLimit,
      wandStats: Option[Wand.Stats] = None): DataFrame = {
    require(queries.map(_._1).distinct.size == queries.size, "qids must be unique")
    // every scoring task carries every query's compiled plan in its
    // closure — bounded here so a runaway batch degrades loudly into
    // "chunk your batch", not into silent multi-MB task binaries
    require(queries.size <= MaxBatchWidth, s"batch wider than $MaxBatchWidth: chunk it")
    if (k <= 0) return emptyResultQF32
    // the split-floor conf resolves BEFORE the plan-cache lookup and
    // rides the key: a conf flip between identical batches must
    // re-plan, not serve the other regime's routing
    val splitMinDocs = index.spark.conf
      .get("graft.batch.splitMinDocs", SearchDefaults.BatchSplitMinDocs.toString).toLong
    def build: DataFrame = searchManyF32Build(queries, k, wandStats, splitMinDocs)
    if (wandStats.isEmpty) cachedPlan((queries, k, splitMinDocs))(build) else build
  }

  private def searchManyF32Build(queries: Seq[(Int, Seq[SearchClause])], k: Int,
      wandStats: Option[Wand.Stats], splitMinDocs: Long): DataFrame = {
    val cqs = queries.map(_._1).zip(compileMany(queries.map(_._2)))
    val nonEmpty = cqs.filter(_._2.terms.nonEmpty)
    if (nonEmpty.isEmpty) return emptyResultQF32
    // partition the batch by WAND routability: sparse queries take the
    // shared-cache pruned pass (Wand.topKMany), dense ones the
    // exhaustive hash replay (Scorer.scoreManyF32) — per-query WAND
    // bookkeeping at batch-width x shard-count scale only pays on
    // sparse match sets (Wand.batchWandRoutable). Terms shared across
    // the two subsets decode once per pass; the split is driver-side
    // and deterministic, and per-query results are bit-identical on
    // either path (BatchSearchSpec).
    //
    // Corpus-size floor on the split: a mixed batch pays a SECOND tiny
    // Spark job (WAND pass unioned with the exhaustive pass), which at
    // small corpora is pure scheduler overhead against near-zero
    // skippable blocks — q_batch32 regressed 125 -> 104 qps at 50k docs
    // when the split landed, while the same split wins 1.38x on the 27M
    // Zipf mix (BENCH.md). Below the floor the whole batch takes the
    // exhaustive replay (the r4-proven single-job path, bit-identical
    // per BatchSearchSpec). Scale-adaptive (derived from the corpus,
    // not local core count) and conf-overridable for tests/tuning.
    val (sparse, dense) =
      if (index.numDocs >= splitMinDocs)
        nonEmpty.partition(q => Wand.batchWandRoutable(q._2, index.numDocs))
      else (Nil, nonEmpty)
    val frames = Seq(
      if (sparse.nonEmpty)
        Some(Wand.topKMany(index, sparse, k, deletesDs, wandStats).toDF("qid", "docId", "score"))
      else None,
      if (dense.nonEmpty)
        Some(Scorer.scoreManyF32(index, dense, k, deletesDs).toDF("qid", "docId", "score"))
      else None).flatten
    Scorer.topKPerQuery(frames.reduce(_ unionByName _), k, col("score"))
  }

  /** f64 batched path (oracle parity): (qid, docId, score double),
    * per-query order (round(score,4) desc, docId asc) — the oracle's
    * presentation order, applied consistently in the shard-local heaps
    * and the global per-qid selection.
    */
  def searchManyF64(queries: Seq[(Int, Seq[SearchClause])], k: Int = DefaultLimit): DataFrame = {
    require(queries.map(_._1).distinct.size == queries.size, "qids must be unique")
    require(queries.size <= MaxBatchWidth, s"batch wider than $MaxBatchWidth: chunk it")
    val cqs = queries.map(_._1).zip(compileMany(queries.map(_._2)))
    val nonEmpty = cqs.filter(_._2.terms.nonEmpty)
    if (nonEmpty.isEmpty) return emptyResultQF64
    val scored = Scorer.scoreManyF64(index, nonEmpty, k, deletesDs).toDF("qid", "docId", "score")
    Scorer.topKPerQuery(scored, k, round(col("score"), 4))
  }

  /** Unlimited (docId, score float) match set on the rank-identity path. */
  def matchF32(clauses: Seq[SearchClause]): DataFrame = {
    val cq = compile(clauses)
    if (cq.terms.isEmpty) return emptyResultF32
    Scorer.scoreF32(index, cq, deletesDs).toDF("docId", "score")
  }

  /** Unlimited (docId, score double) match set (facet counting, custom
    * ordering at the call site).
    */
  def matchF64(clauses: Seq[SearchClause], threshold: Option[Double] = None): DataFrame = {
    val cq = compile(clauses)
    if (cq.terms.isEmpty) return emptyResultF64
    val scored = Scorer.scoreF64(index, cq, deletesDs).toDF("docId", "score")
    threshold.map(t => scored.filter(col("score") > lit(t))).getOrElse(scored)
  }

  /** Join scored docIds back to stored fields (the only docId join the
    * engine needs, SURVEY.md section 2.3). Callers MUST pass a limited
    * scored side (apply Scorer.topK / a threshold + limit first) and
    * its cap: the broadcast hint is only sound while the cap is
    * broadcast-sized (`MaxBroadcastK`) — above it, or for unlimited
    * match sets (see facetCounts), the join runs un-hinted and AQE
    * picks the strategy from runtime sizes.
    */
  def withDocs(scored: DataFrame, docCols: Seq[String],
      cap: Long = SearchDefaults.DefaultLimit): DataFrame = {
    val cols = docCols.map(col) :+ col("score")
    val side = if (cap <= SearchDefaults.MaxBroadcastK) broadcast(scored) else scored
    index.docs.join(side, "docId").select(cols: _*)
  }

  /** Stored-field lookup for an already-collected top-k docId set via a
    * pushed-down IN filter. On a persisted segment (docs NOT cached,
    * IndexStore.load(cacheDocs = false)) the docs parquet is docId-
    * sorted and range-partitioned, so the scan prunes to the row groups
    * holding the k ids instead of probing a corpus-wide scan through a
    * join — the right doc-store access shape when the corpus doesn't
    * fit memory.
    */
  def lookupDocs(ids: Seq[Long], docCols: Seq[String]): DataFrame = {
    require(ids.size <= 10000, "lookupDocs is for top-k result sets, not bulk reads")
    index.docs.filter(col("docId").isin(ids: _*))
      .select((col("docId") +: docCols.map(col)): _*)
  }

  /** Hierarchical facet counting over a match set (the `facet` type's
    * drill-down aggregation, apis/mod.rs:177): count matching docs per
    * facet path prefix. The match set is unlimited (every doc matching
    * the query), so no broadcast hint — AQE decides from runtime sizes.
    */
  def facetCounts(matchedDocIds: DataFrame, facetCol: Column): DataFrame = {
    val matched = index.docs.join(matchedDocIds.select("docId"), "docId")
    matched
      // documents are sparse — a missing facet contributes NOTHING.
      // Without this filter the behavior is ANSI-config-dependent:
      // non-ANSI size(NULL) = -1 makes sequence(1, -1) DESCENDING
      // (the CLAUDE.md trap), exploding each null-facet doc into 3
      // spurious "/" root rows; ANSI mode happens to drop them.
      .filter(facetCol.isNotNull)
      .withColumn("__parts", split(regexp_replace(facetCol, "^/", ""), "/"))
      .withColumn("__lvl", explode(sequence(lit(1), size(col("__parts")))))
      .withColumn("facet", concat(lit("/"), concat_ws("/", slice(col("__parts"), lit(1), col("__lvl")))))
      .groupBy(col("facet")).agg(count(lit(1)).as("cnt"))
  }

  private def emptyResultF32: DataFrame = {
    val spark = index.spark
    import spark.implicits._
    spark.emptyDataset[ScoredDocF32].toDF("docId", "score")
  }

  private def emptyResultF64: DataFrame = {
    val spark = index.spark
    import spark.implicits._
    spark.emptyDataset[ScoredDocF64].toDF("docId", "score")
  }

  private def emptyResultQF32: DataFrame = {
    val spark = index.spark
    import spark.implicits._
    spark.emptyDataset[ScoredQDocF32].toDF("qid", "docId", "score")
  }

  private def emptyResultQF64: DataFrame = {
    val spark = index.spark
    import spark.implicits._
    spark.emptyDataset[ScoredQDocF64].toDF("qid", "docId", "score")
  }
}

/** Builds the SymSpell delete-variant dictionary from a term-stats
  * frame (field, term, df) — shared by the lazy query-time path and
  * the index-time fast-fuzzy persist (IndexStore.writeSegment).
  */
object SymSpellDict {
  def build(termStats: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = termStats.sparkSession
    import spark.implicits._
    termStats
      .as[(String, String, Long)]
      .flatMap { case (f, t, df) => SymSpell.deletes(t).iterator.map(v => (f, v, t, df)) }
      .toDF("field", "variant", "term", "df")
  }
}

/** Extracts the literal prefix a regex REQUIRES of every match when the
  * pattern is anchored at the start (the engine always matches whole
  * terms: `^(?:pattern)$`). Conservative: returns "" whenever the
  * pattern's shape makes the leading literal optional.
  */
private[graft] object RegexPrefix {

  /** Longest required literal prefix of `pattern`, or "" when none can
    * be proven. Rules:
    *  - a top-level `|` makes the leading branch optional -> ""
    *  - scanning stops at the first metacharacter
    *  - `*`, `?`, `{` quantify the PREVIOUS literal (possibly to zero
    *    occurrences), so it is dropped; `+` requires >= 1, so it stays
    */
  def literalPrefix(pattern: String): String = {
    // \Q...\E quoting turns metacharacters into literals, which the
    // scans below would misread ('(' inside \Q...\E is NOT a group
    // opener, so a later top-level '|' would go undetected and the
    // returned prefix would exclude the other branch's matches). Rare
    // construct — bail conservatively instead of modeling quote state.
    if (pattern.contains("\\Q")) return ""
    // top-level alternation scan (chars inside (...) or [...] don't
    // count). Character classes need their own state, not a depth
    // counter: '(' inside a class is a LITERAL, so counting it as a
    // group opener would leave a later top-level '|' at depth > 0 and
    // return a non-conservative prefix (e.g. 'x[(]|y' must yield "",
    // not "x" — "x..." would silently exclude terms matching the 'y'
    // branch from the candidate scan).
    var depth = 0
    var inClass = false
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\') i += 1 // skip escaped char (in or out of a class)
      else if (inClass) {
        if (c == ']') inClass = false
      } else c match {
        case '[' =>
          inClass = true
          // ']' directly after '[' or '[^' is a literal class member,
          // not the class terminator — skip it so we don't exit early
          var k = i + 1
          if (k < pattern.length && pattern.charAt(k) == '^') k += 1
          if (k < pattern.length && pattern.charAt(k) == ']') i = k
        case '(' => depth += 1
        case ')' => depth = math.max(0, depth - 1)
        case '|' if depth == 0 => return ""
        case _ =>
      }
      i += 1
    }
    val meta = ".[]{}()\\*+?|^$"
    val sb = new StringBuilder
    var j = 0
    while (j < pattern.length) {
      val c = pattern.charAt(j)
      if (meta.indexOf(c) >= 0) {
        if ((c == '*' || c == '?' || c == '{') && sb.nonEmpty)
          sb.setLength(sb.length - 1)
        return sb.toString
      }
      sb.append(c)
      j += 1
    }
    sb.toString
  }
}

object SearchDefaults {
  /** lnx injects LIMIT 1000 when absent (lnx-server/src/apis/query.rs:15-17). */
  final val DefaultLimit = 1000
  /** cap on dictionary expansions per prefix/fuzzy/regex token (deterministic order). */
  final val MaxExpansions = 1024
  /** cap on searchMany batch width (every task closure carries every
    * query's compiled plan; wider workloads chunk into several passes). */
  final val MaxBatchWidth = 4096
  /** Corpus-size floor below which searchManyF32 skips the sparse/dense
    * split and routes the WHOLE batch through the exhaustive replay (one
    * Spark job instead of two). Measured (same methodology, local[32]):
    * at 50k docs the split's second job cost ~35% of batch latency for
    * nothing to skip; at 2M x 64-query Zipf the split still LOSES 13%
    * (0.98 s vs 0.86 s, zero blocks skipped — the exhaustive-routed
    * half of the batch subscribes to the same hot blocks, so the shared
    * cache decodes them anyway); at 27M x 512 the split wins 1.38x
    * (BENCH.md r5). 4M sits above the measured-negative regime and well
    * below the measured-positive one. Override with spark conf
    * graft.batch.splitMinDocs. */
  final val BatchSplitMinDocs = 4000000L
  /** Term-count cap for the driver-side dictionary snapshot
    * (LocalTermDict). Dictionaries at or under this size serve every
    * compile-time lookup in memory (the tantivy-FST analogue); larger
    * ones keep the distributed capped-in-plan lookup jobs. 256k terms
    * is tens of MB of driver heap — comfortably inside any driver
    * budget and far below the scale where a dictionary stops fitting.
    * Override with spark conf graft.dict.localMaxTerms (0 disables). */
  final val LocalDictMaxTerms = 262144
  /** Largest scored-side cap the engine FORCE-broadcasts in the
    * docId->stored-fields join. A capped scored side is slim
    * (docId, score) rows (~12 B each), so 1M rows ~ 12 MB — around
    * Spark's default auto-broadcast threshold. LIMIT is user input
    * (`LIMIT 50000000` is legal SQL): above this bound the join runs
    * un-hinted and AQE sizes the strategy at runtime instead of being
    * forced into a driver-sized hash-table build. */
  final val MaxBroadcastK = 1000000
}
