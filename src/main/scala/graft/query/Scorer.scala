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
final case class ScoredQDocF32(qid: Int, docId: Long, score: Float)
final case class ScoredQDocF64(qid: Int, docId: Long, score: Double)

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

  /** Run a per-shard scoring function over the query's matched posting
    * rows — the ONE place that decides between the two physical shapes:
    *
    * FAST PATH (exchange-free): when the index's postings cache is
    * co-partitioned by shard (`BuiltIndex.postingsShardLocal`, set by
    * the in-memory single-segment build) and there are no tombstones,
    * every cursor of a shard is already in one cache partition, so the
    * scorers run as a mapPartitions directly over the pruned cache scan
    * — a single-stage Spark job with NO exchange at all (guide §2.4:
    * the bucketing pattern — the build paid one shard-keyed shuffle so
    * that every query afterwards skips its groupByKey exchange; before
    * this, every top-k call paid one 32-partition exchange + an AQE
    * stage boundary to move a handful of slim posting rows).
    *
    * FALLBACK (the r5 shape, bit-identical output): groupByKey(shard)
    * [+ cogrouped tombstones]. Store-loaded indexes keep it — their
    * per-segment parquet unions are not co-located and the multi-epoch
    * replay-order contract is tied to the cogroup path — as does any
    * index carrying deletes (tombstones arrive as a separate frame and
    * must meet their shard's rows in one task).
    *
    * Exactness: `f` receives exactly the matched rows of one shard in
    * both shapes, and every scorer sorts its rows internally before
    * accumulating, so per-query results are bit-identical (gated by
    * the fast-vs-fallback spec in SearchSpec/BatchSearchSpec and by
    * every oracle row, which runs through the in-memory fast path).
    */
  def shardGrouped[T](index: BuiltIndex, terms: Seq[CompiledTerm],
      deletes: Option[Dataset[Long]])(
      f: (Array[PostingRow], Set[Long]) => Iterator[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    val matched = matchedPostings(index, terms)
    if (index.postingsShardLocal && deletes.isEmpty) {
      matched.mapPartitions { it =>
        // TreeMap: deterministic shard iteration order within a task
        // (output ROW order feeds only order-insensitive consumers —
        // topK / aggregates — but determinism costs nothing here)
        val byShard = new java.util.TreeMap[Int, scala.collection.mutable.ArrayBuffer[PostingRow]]()
        it.foreach { p =>
          var b = byShard.get(p.shard)
          if (b == null) {
            b = new scala.collection.mutable.ArrayBuffer[PostingRow]()
            byShard.put(p.shard, b)
          }
          b += p
        }
        import scala.jdk.CollectionConverters._
        byShard.values().iterator().asScala.flatMap(rows => f(rows.toArray, Set.empty))
      }
    } else {
      val grouped = matched.groupByKey(_.shard)(Encoders.scalaInt)
      deletes match {
        case Some(d) =>
          grouped.cogroup(deletesByShard(index, d)) { (_, rows, dels) =>
            f(rows.toArray, dels.toSet)
          }
        case None =>
          grouped.flatMapGroups { (_, rows) => f(rows.toArray, Set.empty) }
      }
    }
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
    shardGrouped(index, cq.terms, deletes) { (rows, dels) =>
      mergeShardF32(rows, weights, groupOf, caches, constMask, reqMask, dels, shardDocs)
    }
  }

  private def mergeShardF32(
      rows: Array[PostingRow],
      weights: Map[(String, String, Int), Float],
      groupOf: Map[(String, String), Seq[Int]],
      caches: Map[String, Array[Float]],
      constMask: Int,
      reqMask: Int,
      deleted: Set[Long],
      shardDocs: Int): Iterator[ScoredDocF32] = {
    // deterministic accumulation order: (minGroup, field, term)
    val sorted = rows.sortBy(p => (groupOf((p.field, p.term)).min, p.field, p.term))
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
    shardGrouped(index, cq.terms, deletes) { (rows, dels) =>
      mergeShardF64(rows, weights, groupOf, caches, constMask, reqMask, dels, shardDocs)
    }
  }

  private def mergeShardF64(
      rows: Array[PostingRow],
      weights: Map[(String, String, Int), Double],
      groupOf: Map[(String, String), Seq[Int]],
      caches: Map[String, Array[Double]],
      constMask: Int,
      reqMask: Int,
      deleted: Set[Long],
      shardDocs: Int): Iterator[ScoredDocF64] = {
    val sorted = rows.sortBy(p => (groupOf((p.field, p.term)).min, p.field, p.term))
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

  // ------------------------------------------------------- batched path

  /** Driver-side replay plan for ONE query of a batch: its distinct
    * (field, term) pairs in the exact order the single-query merge
    * accumulates them — (min group, field, term) — so per-query f32
    * sums are bit-identical to scoreF32 (accumulation order is an
    * engine invariant; see mergeShardF32).
    */
  private final case class QueryPlan[@specialized(Float, Double) W](
      qid: Int,
      order: Array[(String, String)],
      groupsOf: Map[(String, String), Array[Int]],
      weights: Map[(String, String, Int), W],
      constMask: Int,
      reqMask: Int)

  private def mkPlan[W](qid: Int, cq: CompiledQuery,
      weightOf: CompiledTerm => W): QueryPlan[W] = {
    val groupsOf = cq.terms.groupBy(t => (t.field, t.term))
      .map { case (key, ts) => key -> ts.map(_.group).distinct.sorted.toArray }
    val order = groupsOf.keys.toArray.sortBy(key => (groupsOf(key)(0), key._1, key._2))
    QueryPlan(qid, order, groupsOf,
      cq.terms.map(t => (t.field, t.term, t.group) -> weightOf(t)).toMap,
      cq.groups.filter(_.constScore).map(g => 1 << g.id).sum,
      cq.requiredMask)
  }

  /** Bounded per-(query, shard) top-k selection under the engine total
    * order (sort key desc, docId asc): a min-heap rooted at the worst
    * kept candidate. `raw` carries the unrounded score when the sort
    * key is a rounded form of it (f64 oracle order).
    */
  private[query] final class TopKHeap(k: Int) {
    private val ks = new Array[Double](k)
    private val ds = new Array[Long](k)
    private val raw = new Array[Double](k)
    private var n = 0
    @inline private def worse(k1: Double, d1: Long, k2: Double, d2: Long): Boolean =
      k1 < k2 || (k1 == k2 && d1 > d2)
    def offer(key: Double, docId: Long, r: Double): Unit = {
      if (n < k) {
        var i = n; ks(i) = key; ds(i) = docId; raw(i) = r; n += 1
        while (i > 0) {
          val p = (i - 1) >> 1
          if (worse(ks(i), ds(i), ks(p), ds(p))) { swap(i, p); i = p } else i = 0
        }
      } else if (worse(ks(0), ds(0), key, docId)) {
        ks(0) = key; ds(0) = docId; raw(0) = r
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val rr = l + 1; var m = i
          if (l < n && worse(ks(l), ds(l), ks(m), ds(m))) m = l
          if (rr < n && worse(ks(rr), ds(rr), ks(m), ds(m))) m = rr
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }
    private def swap(i: Int, j: Int): Unit = {
      val tk = ks(i); ks(i) = ks(j); ks(j) = tk
      val td = ds(i); ds(i) = ds(j); ds(j) = td
      val tr = raw(i); raw(i) = raw(j); raw(j) = tr
    }
    def foreachKept(f: (Long, Double) => Unit): Unit = {
      var i = 0; while (i < n) { f(ds(i), raw(i)); i += 1 }
    }
  }

  /** Mirrors Spark's `round(col, 4)` on DoubleType (BigDecimal.valueOf
    * + HALF_UP) — the f64 batch path selects shard candidates under the
    * SAME rounded total order the oracle presentation uses, so
    * shard-local then global selection compose exactly.
    */
  @inline private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Batched multi-query scoring — the cluster THROUGHPUT path: ONE
    * pass over the union of all queries' matched postings, each posting
    * block decoded once per shard and replayed per query; shard-local
    * per-query heaps bound the output at (#shards x #queries x k) rows,
    * so no stage ever carries a corpus-sized per-query match set.
    */
  def scoreManyF32(index: BuiltIndex, queries: Seq[(Int, CompiledQuery)], k: Int,
      deletes: Option[Dataset[Long]] = None): Dataset[ScoredQDocF32] = {
    val spark = index.spark
    import spark.implicits._
    val plans = queries.map { case (qid, cq) => mkPlan(qid, cq, (t: CompiledTerm) => t.weightF32) }.toArray
    val allTerms = queries.flatMap(_._2.terms)
    val caches: Map[String, Array[Float]] =
      allTerms.map(_.field).distinct.map(f => f -> Bm25.normCacheF32(index.avgFieldnormF32(f))).toMap
    val shardDocs = index.config.shardDocs
    shardGrouped(index, allTerms, deletes) { (rows, dels) =>
      mergeShardManyF32(rows, plans, caches, dels, shardDocs, k)
    }
  }

  private def mergeShardManyF32(
      rows: Array[PostingRow],
      plans: Array[QueryPlan[Float]],
      caches: Map[String, Array[Float]],
      deleted: Set[Long],
      shardDocs: Int,
      k: Int): Iterator[ScoredQDocF32] = {
    // decode each matched posting ONCE; every subscribing query replays
    // from this map. A (field, term) key can hold several rows (one per
    // epoch segment) — kept in arrival order, matching the stable sort
    // of the single-query merge.
    val decoded = new scala.collection.mutable.LinkedHashMap[
      (String, String), scala.collection.mutable.ArrayBuffer[graft.index.DecodedBlock]]
    var base = -1L
    rows.foreach { p =>
      if (base < 0) base = p.shard.toLong * shardDocs
      decoded.getOrElseUpdate((p.field, p.term), scala.collection.mutable.ArrayBuffer.empty) +=
        PostingCodec.decodeAll(p.bytes, p.blockOffset, p.blockLast)
    }
    if (decoded.isEmpty) return Iterator.empty
    val score = new Array[Float](shardDocs)
    val mask = new Array[Int](shardDocs)
    val out = Seq.newBuilder[ScoredQDocF32]
    plans.foreach { q =>
      if (q.order.exists(decoded.contains)) {
        java.util.Arrays.fill(score, 0.0f)
        java.util.Arrays.fill(mask, 0)
        q.order.foreach { key =>
          decoded.get(key).foreach { blocks =>
            val cache = caches(key._1)
            blocks.foreach { dec =>
              q.groupsOf(key).foreach { g =>
                val gBit = 1 << g
                val isConst = (q.constMask & gBit) != 0
                val w = q.weights((key._1, key._2, g))
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
          }
        }
        val heap = new TopKHeap(math.max(1, math.min(k, shardDocs)))
        var o = 0
        while (o < shardDocs) {
          if ((mask(o) & q.reqMask) == q.reqMask && mask(o) != 0 && !deleted.contains(base + o))
            heap.offer(score(o).toDouble, base + o, score(o).toDouble)
          o += 1
        }
        heap.foreachKept((d, s) => out += ScoredQDocF32(q.qid, d, s.toFloat))
      }
    }
    out.result().iterator
  }

  /** f64 batched path (oracle parity): identical replay structure, pure
    * double math, shard candidates selected under the ROUNDED total
    * order (round(score,4) desc, docId asc) the oracle presentation
    * uses.
    */
  def scoreManyF64(index: BuiltIndex, queries: Seq[(Int, CompiledQuery)], k: Int,
      deletes: Option[Dataset[Long]] = None): Dataset[ScoredQDocF64] = {
    val spark = index.spark
    import spark.implicits._
    val plans = queries.map { case (qid, cq) => mkPlan(qid, cq, (t: CompiledTerm) => t.weightF64) }.toArray
    val allTerms = queries.flatMap(_._2.terms)
    val caches: Map[String, Array[Double]] =
      allTerms.map(_.field).distinct.map(f => f -> Bm25.normCacheF64(index.avgFieldnormF64(f))).toMap
    val shardDocs = index.config.shardDocs
    shardGrouped(index, allTerms, deletes) { (rows, dels) =>
      mergeShardManyF64(rows, plans, caches, dels, shardDocs, k)
    }
  }

  private def mergeShardManyF64(
      rows: Array[PostingRow],
      plans: Array[QueryPlan[Double]],
      caches: Map[String, Array[Double]],
      deleted: Set[Long],
      shardDocs: Int,
      k: Int): Iterator[ScoredQDocF64] = {
    val decoded = new scala.collection.mutable.LinkedHashMap[
      (String, String), scala.collection.mutable.ArrayBuffer[graft.index.DecodedBlock]]
    var base = -1L
    rows.foreach { p =>
      if (base < 0) base = p.shard.toLong * shardDocs
      decoded.getOrElseUpdate((p.field, p.term), scala.collection.mutable.ArrayBuffer.empty) +=
        PostingCodec.decodeAll(p.bytes, p.blockOffset, p.blockLast)
    }
    if (decoded.isEmpty) return Iterator.empty
    val score = new Array[Double](shardDocs)
    val mask = new Array[Int](shardDocs)
    val out = Seq.newBuilder[ScoredQDocF64]
    plans.foreach { q =>
      if (q.order.exists(decoded.contains)) {
        java.util.Arrays.fill(score, 0.0d)
        java.util.Arrays.fill(mask, 0)
        q.order.foreach { key =>
          decoded.get(key).foreach { blocks =>
            val cache = caches(key._1)
            blocks.foreach { dec =>
              q.groupsOf(key).foreach { g =>
                val gBit = 1 << g
                val isConst = (q.constMask & gBit) != 0
                val w = q.weights((key._1, key._2, g))
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
          }
        }
        val heap = new TopKHeap(math.max(1, math.min(k, shardDocs)))
        var o = 0
        while (o < shardDocs) {
          if ((mask(o) & q.reqMask) == q.reqMask && mask(o) != 0 && !deleted.contains(base + o))
            heap.offer(round4(score(o)), base + o, score(o))
          o += 1
        }
        heap.foreachKept((d, s) => out += ScoredQDocF64(q.qid, d, s))
      }
    }
    out.result().iterator
  }

  /** Per-query global top-k over the batched shard candidates: the same
    * total order as topK, partitioned by qid. The window input is
    * bounded by (#shards x #queries x k) thanks to the shard-local
    * heaps, and each qid partition holds at most (#shards x k) rows —
    * no reducer ever sees a corpus-sized set.
    */
  def topKPerQuery(scored: DataFrame, k: Int,
      orderKey: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(orderKey.desc, col("docId").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
