package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.index.{BuiltIndex, PostingCodec, PostingRow}

/** A compiled search term: one dictionary term contributing to one
  * clause group. `weightF32` is the full precomputed BM25 term weight
  * idf * (1 + k1) * userMultiplier (fuzzy distance multipliers bake in
  * here), computed driver-side from the term dictionary — the Spark
  * analogue of tantivy building a Bm25Weight per term.
  */
final case class CompiledTerm(
    field: String,
    term: String,
    group: Int,
    weightF32: Float,
    weightF64: Double,
    df: Long = 0L) // document frequency (drives the conj-WAND cost heuristic)

/** One clause group = one search-function call in the WHERE clause
  * (fts/fuzzy/levenshtein/regex). Terms within a group are a
  * disjunction; groups compose as a conjunction when `required`
  * (tantivy BooleanQuery: conjunction score = sum of clause scores,
  * SURVEY.md section 2.2 P4). `constScore` groups contribute a flat
  * 1.0 on match (levenshtein/regex semantics, apis/mod.rs:249-281).
  */
final case class CompiledGroup(id: Int, required: Boolean, constScore: Boolean)

final case class CompiledQuery(terms: Seq[CompiledTerm], groups: Seq[CompiledGroup]) {
  def requiredMask: Int = groups.filter(_.required).map(g => 1 << g.id).sum
}

final case class ScoredDocF32(docId: Long, score: Float)
final case class ScoredDocF64(docId: Long, score: Double)

/** Distributed scoring over the sharded posting lists.
  *
  * Plan shape (scale rationale): the posting rows matching the query's
  * terms are a *tiny* Dataset (#terms x #shards rows) selected with a
  * pushed-down `term IN (...)` filter against the term-sorted parquet;
  * they are then re-grouped by docId shard so each task merges all
  * clause postings for a disjoint docId range — per-doc aggregation
  * happens in-task with zero per-hit shuffle, and the global top-k is a
  * TakeOrdered over per-shard candidates. No shuffle ever scales with
  * corpus size, only with (matched terms x shards).
  */
object Scorer {

  /** Pushdown-friendly selection of the query's posting rows. The exact
    * (field, term) pair match stays a Column expression (codegen'd, on
    * top of the pushed-down isin scans) instead of a typed filter that
    * would force row deserialization.
    */
  def matchedPostings(index: BuiltIndex, terms: Seq[CompiledTerm]): Dataset[PostingRow] = {
    val termKeys = terms.map(_.term).distinct
    val fieldKeys = terms.map(_.field).distinct
    val base = index.postings
      .filter(col("term").isin(termKeys: _*) && col("field").isin(fieldKeys: _*))
    if (fieldKeys.size <= 1) base
    else {
      val pairKeys = terms.map(t => t.field + "\u0000" + t.term).distinct
      base.filter(concat_ws("\u0000", col("field"), col("term")).isin(pairKeys: _*))
    }
  }

  /** Tombstones keyed by docId shard, for cogrouping with the posting
    * shards — the delete set stays distributed (bounded per shard by the
    * shard width) instead of a driver-collected closure Set.
    */
  def deletesByShard(index: BuiltIndex, deletes: Dataset[Long]) = {
    val spark = index.spark
    import spark.implicits._
    val width = index.config.shardDocs
    deletes.groupByKey(id => (id / width).toInt)
  }

  /** Exhaustive f32 path: tantivy-arithmetic scores, deterministic
    * accumulation order (groups/terms sorted), exact conjunction masks.
    */
  def scoreF32(index: BuiltIndex, cq: CompiledQuery,
      deletes: Option[Dataset[Long]] = None): Dataset[ScoredDocF32] = {
    val spark = index.spark
    import spark.implicits._
    val weights: Map[(String, String, Int), Float] =
      cq.terms.map(t => (t.field, t.term, t.group) -> t.weightF32).toMap
    val groupOf: Map[(String, String), Seq[Int]] =
      cq.terms.groupBy(t => (t.field, t.term)).map { case (k, v) => k -> v.map(_.group).sorted }
    val constMask = cq.groups.filter(_.constScore).map(g => 1 << g.id).sum
    val reqMask = cq.requiredMask
    val caches: Map[String, Array[Float]] =
      cq.terms.map(_.field).distinct.map(f => f -> Bm25.normCacheF32(index.avgFieldnormF32(f))).toMap
    val shardDocs = index.config.shardDocs // capture: closures must not drag BuiltIndex in
    val grouped = matchedPostings(index, cq.terms).groupByKey(_.shard)
    deletes match {
      case Some(d) =>
        grouped.cogroup(deletesByShard(index, d)) { (_, rows, dels) =>
          mergeShardF32(rows, weights, groupOf, caches, constMask, reqMask, dels.toSet, shardDocs)
        }
      case None =>
        grouped.flatMapGroups { (_, rows) =>
          mergeShardF32(rows, weights, groupOf, caches, constMask, reqMask, Set.empty, shardDocs)
        }
    }
  }

  private def mergeShardF32(
      rows: Iterator[PostingRow],
      weights: Map[(String, String, Int), Float],
      groupOf: Map[(String, String), Seq[Int]],
      caches: Map[String, Array[Float]],
      constMask: Int,
      reqMask: Int,
      deleted: Set[Long],
      shardDocs: Int): Iterator[ScoredDocF32] = {
    // deterministic accumulation order: (minGroup, field, term)
    val sorted = rows.toArray.sortBy(p => (groupOf((p.field, p.term)).min, p.field, p.term))
    if (sorted.isEmpty) return Iterator.empty
    // a shard is a contiguous docId range of width shardDocs: dense
    // flat arrays indexed by (docId - base) beat a boxing HashMap by
    // an order of magnitude in the per-hit hot loop
    val base = sorted(0).shard.toLong * shardDocs
    val score = new Array[Float](shardDocs)
    val mask = new Array[Int](shardDocs)
    sorted.foreach { p =>
      val cache = caches(p.field)
      val dec = PostingCodec.decodeAll(p.bytes, p.blockOffset, p.blockLast)
      groupOf((p.field, p.term)).foreach { g =>
        val gBit = 1 << g
        val isConst = (constMask & gBit) != 0
        val w = weights((p.field, p.term, g))
        var i = 0
        while (i < dec.docIds.length) {
          val o = (dec.docIds(i) - base).toInt
          if (isConst) {
            if ((mask(o) & gBit) == 0) score(o) += 1.0f
          } else {
            score(o) += Bm25.tfScoreF32(w, dec.tfs(i), cache(dec.norms(i)))
          }
          mask(o) |= gBit
          i += 1
        }
      }
    }
    (0 until shardDocs).iterator
      .filter(o => (mask(o) & reqMask) == reqMask && mask(o) != 0 && !deleted.contains(base + o))
      .map(o => ScoredDocF32(base + o, score(o)))
  }

  /** Oracle-parity f64 path: identical structure, pure double math
    * (mirrors the DuckDB oracle SQL exactly; see SparkEntry.oracleSql).
    */
  def scoreF64(index: BuiltIndex, cq: CompiledQuery,
      deletes: Option[Dataset[Long]] = None): Dataset[ScoredDocF64] = {
    val spark = index.spark
    import spark.implicits._
    val weights: Map[(String, String, Int), Double] =
      cq.terms.map(t => (t.field, t.term, t.group) -> t.weightF64).toMap
    val groupOf: Map[(String, String), Seq[Int]] =
      cq.terms.groupBy(t => (t.field, t.term)).map { case (k, v) => k -> v.map(_.group).sorted }
    val constMask = cq.groups.filter(_.constScore).map(g => 1 << g.id).sum
    val reqMask = cq.requiredMask
    val caches: Map[String, Array[Double]] =
      cq.terms.map(_.field).distinct.map(f => f -> Bm25.normCacheF64(index.avgFieldnormF64(f))).toMap
    val shardDocs = index.config.shardDocs
    val grouped = matchedPostings(index, cq.terms).groupByKey(_.shard)
    deletes match {
      case Some(d) =>
        grouped.cogroup(deletesByShard(index, d)) { (_, rows, dels) =>
          mergeShardF64(rows, weights, groupOf, caches, constMask, reqMask, dels.toSet, shardDocs)
        }
      case None =>
        grouped.flatMapGroups { (_, rows) =>
          mergeShardF64(rows, weights, groupOf, caches, constMask, reqMask, Set.empty, shardDocs)
        }
    }
  }

  private def mergeShardF64(
      rows: Iterator[PostingRow],
      weights: Map[(String, String, Int), Double],
      groupOf: Map[(String, String), Seq[Int]],
      caches: Map[String, Array[Double]],
      constMask: Int,
      reqMask: Int,
      deleted: Set[Long],
      shardDocs: Int): Iterator[ScoredDocF64] = {
    val sorted = rows.toArray.sortBy(p => (groupOf((p.field, p.term)).min, p.field, p.term))
    if (sorted.isEmpty) return Iterator.empty
    val base = sorted(0).shard.toLong * shardDocs
    val score = new Array[Double](shardDocs)
    val mask = new Array[Int](shardDocs)
    sorted.foreach { p =>
      val cache = caches(p.field)
      val dec = PostingCodec.decodeAll(p.bytes, p.blockOffset, p.blockLast)
      groupOf((p.field, p.term)).foreach { g =>
        val gBit = 1 << g
        val isConst = (constMask & gBit) != 0
        val w = weights((p.field, p.term, g))
        var i = 0
        while (i < dec.docIds.length) {
          val o = (dec.docIds(i) - base).toInt
          if (isConst) {
            if ((mask(o) & gBit) == 0) score(o) += 1.0d
          } else {
            score(o) += Bm25.tfScoreF64(w, dec.tfs(i), cache(dec.norms(i)))
          }
          mask(o) |= gBit
          i += 1
        }
      }
    }
    (0 until shardDocs).iterator
      .filter(o => (mask(o) & reqMask) == reqMask && mask(o) != 0 && !deleted.contains(base + o))
      .map(o => ScoredDocF64(base + o, score(o)))
  }

  /** Global top-k with the engine's total order (score desc, docId asc
    * — tantivy breaks score ties by doc address; we pin docId,
    * SURVEY.md section 2.7 T1). Catalyst plans TakeOrderedAndProject:
    * per-partition heaps + driver merge = distributed top-k.
    */
  def topK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col("docId").asc).limit(k)
}
