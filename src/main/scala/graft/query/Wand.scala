package graft.query

import org.apache.spark.sql.Dataset

import graft.index.{BuiltIndex, DecodedBlock, PostingCodec, PostingRow}

/** Block-max WAND top-k pruning (SURVEY.md section 2.7 T4): the
  * performance semantics of tantivy 0.22's top-k execution, re-expressed
  * for a dataflow engine. Each docId shard runs an independent WAND with
  * its own heap (threshold starts at -inf); per-shard pruning is
  * conservative, so merging the per-shard top-k candidates by the global
  * total order (score desc, docId asc) is exact — asserted equal to the
  * exhaustive scorer in WandSpec.
  *
  * Applies to single-group sum-scored disjunctions (the hot top-k fts
  * path) and — via `topKConj` — to multi-group all-required
  * conjunctions (the reference's flagship WHERE shape, fuzzy.sql:10-12)
  * including const-score groups. Anything else uses the exhaustive
  * scorer.
  */
object Wand {

  /** Skip/decode counters (Spark accumulators, aggregated across
    * tasks) — the lineage-style evidence that block-max pruning
    * actually skips work at a given corpus size.
    */
  final case class Stats(
      decodedBlocks: org.apache.spark.util.LongAccumulator,
      skippedBlocks: org.apache.spark.util.LongAccumulator) extends Serializable

  object Stats {
    def register(spark: org.apache.spark.sql.SparkSession): Stats = Stats(
      spark.sparkContext.longAccumulator("wandDecodedBlocks"),
      spark.sparkContext.longAccumulator("wandSkippedBlocks"))
  }

  /** Shard-scoped lazy block store shared by every query of a batch:
    * each posting block decodes AT MOST once per shard, and only when
    * some query's execution actually lands on it — the batched analogue
    * of single-query block-max skipping (a block is decoded only if ANY
    * query of the batch could admit it). Blocks no query ever touched
    * are the batch's skip count.
    */
  private final class BlockCache(stats: Option[Stats]) {
    private val map = new java.util.IdentityHashMap[PostingRow, Array[DecodedBlock]]()
    private var decoded = 0L
    private var total = 0L
    def register(p: PostingRow): Unit =
      if (!map.containsKey(p)) {
        map.put(p, new Array[DecodedBlock](p.blockOffset.length))
        total += p.blockOffset.length
      }
    def block(p: PostingRow, b: Int): DecodedBlock = {
      val arr = map.get(p)
      var d = arr(b)
      if (d == null) {
        d = PostingCodec.decodeBlock(p.bytes, p.blockOffset(b),
          if (b == 0) -1L else p.blockLast(b - 1))
        arr(b) = d
        decoded += 1
        stats.foreach(_.decodedBlocks.add(1L))
      }
      d
    }
    /** Whole-row decode for the exhaustive-replay route. */
    def decodeRow(p: PostingRow): Array[DecodedBlock] =
      Array.tabulate(p.blockOffset.length)(b => block(p, b))
    /** Account the blocks NO query of the batch ever decoded. */
    def finish(): Unit = stats.foreach(_.skippedBlocks.add(total - decoded))
  }

  /** Streaming block-decoding cursor over one term's posting row. When
    * `shared` is set (batched path), decodes go through the batch's
    * BlockCache — a block another query already pulled is free, and the
    * cache owns decode/skip accounting (per-cursor stats stay None).
    */
  private final class Cursor(
      val p: PostingRow,
      val weight: Float,
      val cache: Array[Float],
      val ord: Int,
      val stats: Option[Stats] = None,
      val shared: BlockCache = null) {
    private var blockIdx = 0
    private var dec: DecodedBlock = _
    private var pos = 0
    private var exhausted = false
    decodeCurrent()

    // ULP safety margin on every BOUND (never on exact scores): the
    // driver loop sums per-cursor UBs in byDoc order while the exact
    // score sums in the original cursors order — each f32 addend
    // dominates its exact counterpart, but f32 addition is not
    // order-monotone, so the "upper" bound sum can land a few ULPs
    // below the true score and wrongly prune a threshold-tying doc
    // (same hazard wandShardConj documents for its weight sums).
    // ~8 ULPs of slack dominates the rounding hazard and only makes
    // pruning infinitesimally more conservative.
    private final val UbMargin = 1.000001f

    // suffix max of block UBs, precomputed once: remainingUB is O(1)
    private val ubSuffix: Array[Float] = {
      val n = p.blockOffset.length
      val a = new Array[Float](n)
      var b = n - 1
      var m = 0.0f
      while (b >= 0) {
        val ub = Bm25.tfScoreF32(weight, p.blockMaxTf(b), cache(p.blockMinNorm(b))) * UbMargin
        if (ub > m) m = ub
        a(b) = m
        b -= 1
      }
      a
    }

    /** UB of any doc still reachable from this cursor. */
    def remainingUB: Float = if (exhausted) 0.0f else ubSuffix(blockIdx)

    def currentBlockUB: Float =
      Bm25.tfScoreF32(weight, p.blockMaxTf(blockIdx), cache(p.blockMinNorm(blockIdx))) * UbMargin

    def currentBlockLast: Long = p.blockLast(blockIdx)

    private def decodeCurrent(): Unit = {
      dec =
        if (shared != null) shared.block(p, blockIdx)
        else PostingCodec.decodeBlock(
          p.bytes, p.blockOffset(blockIdx),
          if (blockIdx == 0) -1L else p.blockLast(blockIdx - 1))
      pos = 0
      if (shared == null) stats.foreach(_.decodedBlocks.add(1L))
    }

    def done: Boolean = exhausted
    def curDoc: Long = if (exhausted) Long.MaxValue else dec.docIds(pos)
    def curScore: Float = Bm25.tfScoreF32(weight, dec.tfs(pos), cache(dec.norms(pos)))
    def curTf: Int = dec.tfs(pos)
    def curNorm: Int = dec.norms(pos)

    /** Account the never-decoded tail when pruning ends this cursor. */
    def skipRemaining(): Unit = {
      if (!exhausted)
        stats.foreach(_.skippedBlocks.add((p.blockOffset.length - blockIdx - 1).toLong))
      exhausted = true
    }

    def next(): Unit = {
      pos += 1
      if (pos >= dec.docIds.length) {
        blockIdx += 1
        if (blockIdx >= p.blockOffset.length) exhausted = true
        else decodeCurrent()
      }
    }

    /** Skip to the first doc >= target, decoding only the landing block. */
    def advanceTo(target: Long): Unit = {
      if (exhausted || curDoc >= target) return
      if (p.blockLast(blockIdx) < target) {
        var b = blockIdx
        while (b < p.blockLast.length && p.blockLast(b) < target) b += 1
        stats.foreach(_.skippedBlocks.add(
          (math.min(b, p.blockLast.length) - blockIdx - 1).toLong.max(0L)))
        if (b >= p.blockLast.length) { exhausted = true; return }
        blockIdx = b
        decodeCurrent()
      }
      while (pos < dec.docIds.length && dec.docIds(pos) < target) pos += 1
      if (pos >= dec.docIds.length) { // target falls between blocks
        blockIdx += 1
        if (blockIdx >= p.blockOffset.length) exhausted = true
        else decodeCurrent()
      }
    }
  }

  private final case class Hit(docId: Long, score: Float)

  /** Heap entry comparison: keep the k best under (score desc, docId
    * asc); the heap root is the *worst* kept entry.
    */
  private def worseThan(aScore: Float, aDoc: Long, bScore: Float, bDoc: Long): Boolean =
    aScore < bScore || (aScore == bScore && aDoc > bDoc)

  /** Exact per-shard top-k via WAND with block-max skipping. */
  private def wandShard(rows: Array[PostingRow], weights: Map[(String, String), Float],
      caches: Map[String, Array[Float]], k: Int, deleted: Set[Long],
      stats: Option[Stats] = None, shared: BlockCache = null): Iterator[ScoredDocF32] = {
    // scoring order must match the exhaustive scorer: (field, term) sorted
    val sortedRows = rows.sortBy(p => (p.field, p.term))
    val cursors = sortedRows.zipWithIndex.map { case (p, i) =>
      new Cursor(p, weights((p.field, p.term)), caches(p.field), i,
        if (shared == null) stats else None, shared)
    }
    val heap = new java.util.PriorityQueue[Hit](k, (a: Hit, b: Hit) =>
      if (worseThan(a.score, a.docId, b.score, b.docId)) -1
      else if (worseThan(b.score, b.docId, a.score, a.docId)) 1
      else 0)

    def thresholdScore: Float = if (heap.size() < k) Float.NegativeInfinity else heap.peek().score

    def offer(docId: Long, score: Float): Unit = {
      if (heap.size() < k) heap.add(Hit(docId, score))
      else if (worseThan(heap.peek().score, heap.peek().docId, score, docId)) {
        heap.poll(); heap.add(Hit(docId, score))
      }
    }

    // working order: kept nearly-sorted by curDoc across iterations, so
    // the per-iteration insertion sort is ~O(n) and the driver loop is
    // allocation-free (a fresh sortBy+filter per pivot dominated WAND's
    // cost on dense queries where little can be skipped)
    val byDoc = cursors.clone()
    var nLive = byDoc.length
    var running = nLive > 0
    while (running) {
      var i = 1
      while (i < nLive) { // insertion sort by curDoc (exhausted = MaxValue)
        val c = byDoc(i)
        val d = c.curDoc
        var j = i - 1
        while (j >= 0 && byDoc(j).curDoc > d) { byDoc(j + 1) = byDoc(j); j -= 1 }
        byDoc(j + 1) = c
        i += 1
      }
      while (nLive > 0 && byDoc(nLive - 1).done) nLive -= 1
      if (nLive == 0) {
        running = false
      } else {
        // pivot: shortest prefix whose UB sum could still beat the heap
        // (>= not >: an equal score with a smaller docId still wins)
        var ubSum = 0.0f
        var p = -1
        i = 0
        while (i < nLive && p < 0) {
          ubSum += byDoc(i).remainingUB
          if (ubSum >= thresholdScore) p = i
          i += 1
        }
        if (p < 0) {
          i = 0
          while (i < nLive) { byDoc(i).skipRemaining(); i += 1 } // count the tails
          running = false // no doc can enter the heap anymore
        } else {
          val pivotDoc = byDoc(p).curDoc
          // include every cursor already sitting on the pivot doc, so the
          // block-max skip target is strictly beyond pivotDoc (progress)
          while (p + 1 < nLive && byDoc(p + 1).curDoc == pivotDoc) p += 1
          if (byDoc(0).curDoc == pivotDoc) {
            // shallow block-max refinement over cursors at/before pivot
            var bmSum = 0.0f
            var j = 0
            while (j <= p) { bmSum += byDoc(j).currentBlockUB; j += 1 }
            if (bmSum < thresholdScore) {
              // no doc up to the nearest block boundary can win: skip
              var boundary = Long.MaxValue
              j = 0
              while (j <= p) { boundary = math.min(boundary, byDoc(j).currentBlockLast); j += 1 }
              var nextDoc = boundary + 1
              j = p + 1
              while (j < nLive) { nextDoc = math.min(nextDoc, byDoc(j).curDoc); j += 1 }
              j = 0
              while (j <= p) { byDoc(j).advanceTo(nextDoc); j += 1 }
            } else {
              // full score of pivotDoc: f32 sum in (field, term) order —
              // the ORIGINAL cursors array preserves that order
              if (!deleted.contains(pivotDoc)) {
                var s = 0.0f
                var ci = 0
                while (ci < cursors.length) {
                  val c = cursors(ci)
                  if (!c.done && c.curDoc == pivotDoc) s += c.curScore
                  ci += 1
                }
                offer(pivotDoc, s)
              }
              // all cursors at pivotDoc are the sorted prefix 0..p
              j = 0
              while (j <= p) { if (byDoc(j).curDoc == pivotDoc) byDoc(j).next(); j += 1 }
            }
          } else {
            var j = 0
            while (j < p && byDoc(j).curDoc < pivotDoc) { byDoc(j).advanceTo(pivotDoc); j += 1 }
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    heap.iterator().asScala.map(h => ScoredDocF32(h.docId, h.score)).toArray.iterator
  }

  /** Exact per-shard top-k for multi-group ALL-REQUIRED conjunctions:
    * leapfrog intersection over per-group cursor sets (candidate = max
    * over groups of the group's min docId; blocks between candidates
    * are skipped via advanceTo), with two conservative prunes — a
    * global remaining-UB early exit and a per-candidate block-max
    * refinement before exact scoring. Exact vs the exhaustive scorer:
    * the intersection enumerates every doc matching all groups, the
    * prunes only drop docs whose UPPER bound is strictly below the
    * heap threshold, and exact scores accumulate in the exhaustive
    * f32 order (rows sorted (minGroup, field, term); groups ascending
    * within a row; const groups contribute 1.0 once).
    */
  private def wandShardConj(rows: Array[PostingRow],
      weights: Map[(String, String, Int), Float],
      groupOf: Map[(String, String), Seq[Int]],
      caches: Map[String, Array[Float]],
      constMask: Int,
      nGroups: Int,
      k: Int,
      deleted: Set[Long],
      stats: Option[Stats],
      shared: BlockCache = null): Iterator[ScoredDocF32] = {
    val sortedRows = rows.sortBy(p => (groupOf((p.field, p.term)).min, p.field, p.term))
    if (sortedRows.isEmpty) return Iterator.empty
    val rowGroups: Array[Array[Int]] =
      sortedRows.map(p => groupOf((p.field, p.term)).sorted.toArray)
    val cursors = sortedRows.zipWithIndex.map { case (p, i) =>
      // cursor UB weight = the row's total non-const BM25 weight (its
      // whole contribution to any one doc); const groups add flat 1.0s.
      // Inflate by 1e-6 relative: the exact score sums per-group f32
      // products while the UB multiplies the f32 SUM of weights — each
      // rounds independently, so without margin the "upper" bound can
      // land a few ULPs BELOW the true score and a tie-threshold doc
      // could be wrongly pruned (exactness contract). ~8 ULPs of slack
      // dominates the <=3 ULPs of rounding hazard and only makes
      // pruning infinitesimally more conservative.
      val wSum = groupOf((p.field, p.term)).iterator
        .filter(g => (constMask & (1 << g)) == 0)
        .map(g => weights((p.field, p.term, g)).toDouble).sum
      new Cursor(p, (wSum * (1.0 + 1e-6)).toFloat, caches(p.field), i,
        if (shared == null) stats else None, shared)
    }
    val cursorsOfGroup: Array[Array[Int]] =
      Array.tabulate(nGroups)(g => cursors.indices.filter(i => rowGroups(i).contains(g)).toArray)
    if (cursorsOfGroup.exists(_.isEmpty)) {
      cursors.foreach(_.skipRemaining()) // a required group has no terms here
      return Iterator.empty
    }
    val heap = new java.util.PriorityQueue[Hit](k, (a: Hit, b: Hit) =>
      if (worseThan(a.score, a.docId, b.score, b.docId)) -1
      else if (worseThan(b.score, b.docId, a.score, a.docId)) 1
      else 0)
    def thresholdScore: Float = if (heap.size() < k) Float.NegativeInfinity else heap.peek().score
    def offer(docId: Long, score: Float): Unit = {
      if (heap.size() < k) heap.add(Hit(docId, score))
      else if (worseThan(heap.peek().score, heap.peek().docId, score, docId)) {
        heap.poll(); heap.add(Hit(docId, score))
      }
    }
    val constSeen = new Array[Boolean](nGroups)

    var done = false
    while (!done) {
      // intersection candidate = max over groups of the group min
      var cand = 0L
      var g = 0
      while (g < nGroups && !done) {
        var m = Long.MaxValue
        val cg = cursorsOfGroup(g)
        var j = 0
        while (j < cg.length) { val d = cursors(cg(j)).curDoc; if (d < m) m = d; j += 1 }
        if (m == Long.MaxValue) done = true // group exhausted: no more intersections
        else if (m > cand) cand = m
        g += 1
      }
      if (!done) {
        // global remaining-UB prune (equal UB can still win on docId, so <)
        var ub = 0.0f
        var ci = 0
        while (ci < cursors.length) { ub += cursors(ci).remainingUB; ci += 1 }
        g = 0
        while (g < nGroups) {
          if ((constMask & (1 << g)) != 0) ub += 1.0f
          g += 1
        }
        if (ub < thresholdScore) {
          cursors.foreach(_.skipRemaining())
          done = true
        } else {
          ci = 0
          while (ci < cursors.length) {
            val c = cursors(ci); if (c.curDoc < cand) c.advanceTo(cand); ci += 1
          }
          var all = true
          g = 0
          while (g < nGroups && all) {
            val cg = cursorsOfGroup(g)
            var has = false
            var j = 0
            while (j < cg.length && !has) { if (cursors(cg(j)).curDoc == cand) has = true; j += 1 }
            if (!has) all = false
            g += 1
          }
          if (all) {
            if (!deleted.contains(cand)) {
              // block-max refinement: UB of cand from block metadata
              var bub = 0.0f
              java.util.Arrays.fill(constSeen, false)
              ci = 0
              while (ci < cursors.length) {
                val c = cursors(ci)
                if (!c.done && c.curDoc == cand) {
                  bub += c.currentBlockUB
                  val gs = rowGroups(ci)
                  var gi = 0
                  while (gi < gs.length) {
                    val gg = gs(gi)
                    if ((constMask & (1 << gg)) != 0 && !constSeen(gg)) {
                      bub += 1.0f; constSeen(gg) = true
                    }
                    gi += 1
                  }
                }
                ci += 1
              }
              if (bub >= thresholdScore) {
                // exact f32 score, exhaustive accumulation order
                var s = 0.0f
                java.util.Arrays.fill(constSeen, false)
                ci = 0
                while (ci < cursors.length) {
                  val c = cursors(ci)
                  if (!c.done && c.curDoc == cand) {
                    val p = sortedRows(ci)
                    val gs = rowGroups(ci)
                    var gi = 0
                    while (gi < gs.length) {
                      val gg = gs(gi)
                      if ((constMask & (1 << gg)) != 0) {
                        if (!constSeen(gg)) { s += 1.0f; constSeen(gg) = true }
                      } else {
                        s += Bm25.tfScoreF32(
                          weights((p.field, p.term, gg)), c.curTf, c.cache(c.curNorm))
                      }
                      gi += 1
                    }
                  }
                  ci += 1
                }
                offer(cand, s)
              }
            }
            ci = 0
            while (ci < cursors.length) {
              val c = cursors(ci); if (!c.done && c.curDoc == cand) c.next(); ci += 1
            }
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    heap.iterator().asScala.map(h => ScoredDocF32(h.docId, h.score)).toArray.iterator
  }

  /** Top-k for a multi-group all-required conjunction; exact w.r.t. the
    * exhaustive scorer under the (score desc, docId asc) total order.
    */
  def topKConj(index: BuiltIndex, cq: CompiledQuery, k: Int,
      deletes: Option[Dataset[Long]] = None,
      stats: Option[Stats] = None): Dataset[ScoredDocF32] = {
    require(cq.groups.nonEmpty && cq.groups.forall(_.required),
      "conjunction WAND covers all-required multi-group queries")
    val spark = index.spark
    import spark.implicits._
    val weights: Map[(String, String, Int), Float] =
      cq.terms.map(t => (t.field, t.term, t.group) -> t.weightF32).toMap
    val groupOf: Map[(String, String), Seq[Int]] =
      cq.terms.groupBy(t => (t.field, t.term)).map { case (kk, v) => kk -> v.map(_.group).sorted }
    val constMask = cq.groups.filter(_.constScore).map(g => 1 << g.id).sum
    val nGroups = cq.groups.size
    val caches: Map[String, Array[Float]] =
      cq.terms.map(_.field).distinct.map(f => f -> Bm25.normCacheF32(index.avgFieldnormF32(f))).toMap
    val kk = k
    // a group with no dictionary matches anywhere → empty intersection
    val groupsWithTerms = cq.terms.map(_.group).toSet
    if ((0 until nGroups).exists(g => !groupsWithTerms.contains(g)))
      return spark.emptyDataset[ScoredDocF32]
    Scorer.shardGrouped(index, cq.terms, deletes) { (rows, dels) =>
      wandShardConj(rows, weights, groupOf, caches, constMask, nGroups, kk, dels, stats)
    }
  }

  /** Driver-compiled routing + replay data for ONE query of a batch.
    * Route mirrors searchF32's cost gates exactly, so a query runs the
    * same algorithm batched as it would alone: 0 = single-group
    * sum-scored WAND, 1 = all-required conjunction WAND, 2 = exhaustive
    * replay (dense or irregular shapes, where block skipping loses to
    * the hash scorer).
    */
  private final case class BatchPlan(
      qid: Int,
      route: Int,
      order: Array[(String, String)], // (minGroup, field, term) replay order
      weightsFT: Map[(String, String), Float], // route 0
      weights: Map[(String, String, Int), Float],
      groupOf: Map[(String, String), Seq[Int]],
      constMask: Int,
      reqMask: Int,
      nGroups: Int)

  /** Is `cq` a shape the batched WAND path should take? The single-
    * query gates (selective disjunction / all-required selective
    * conjunction) PLUS the batch density bound on disjunctions (see
    * topKMany). The batch caller (searchManyF32) partitions on this:
    * routable queries run here with shared-cache pruning, everything
    * else runs the exhaustive Scorer batch pass — per-query
    * WAND bookkeeping at batch-width x shard-count scale only pays on
    * sparse match sets (27M skew leg: dense queries through per-query
    * walks ran 3x slower than the hash replay).
    */
  def batchWandRoutable(cq: CompiledQuery, numDocs: Long): Boolean = {
    val groupsWithTerms = cq.terms.map(_.group).toSet
    val disjOk = cq.groups.size == 1 && !cq.groups.head.constScore &&
      cq.terms.map(_.df).min * 4 <= numDocs &&
      cq.terms.map(_.df).sum * 2 <= numDocs
    val conjOk = cq.groups.size > 1 && cq.groups.forall(_.required) &&
      cq.groups.forall(g => groupsWithTerms.contains(g.id)) && {
        val minGroupDf =
          cq.groups.map(g => cq.terms.filter(_.group == g.id).map(_.df).sum).min
        minGroupDf * 4 <= numDocs
      }
    disjOk || conjOk
  }

  /** Batched multi-query top-k with SHARED lazy block decoding — the
    * serving-throughput path with single-query WAND's pruning grafted
    * on. Each query replays via the exact algorithm the single-query
    * path would pick for it (same cost gates), but all queries of a
    * shard draw decoded blocks from one BlockCache: a block decodes at
    * most once per shard, and ONLY if some query's WAND walk (or an
    * exhaustive-shape query subscribed to its term) actually needs it —
    * blocks beyond every subscribing query's threshold horizon are
    * never touched. Per-query results stay bit-identical to searchF32
    * (BatchSearchSpec): WAND routes are exact by the WandSpec
    * invariant, and the exhaustive route accumulates in the
    * single-query order. Reference semantics: tantivy BlockWAND
    * (Cargo.lock:242) applied per query of lnx's concurrent search
    * load.
    */
  def topKMany(index: BuiltIndex, queries: Seq[(Int, CompiledQuery)], k: Int,
      deletes: Option[Dataset[Long]] = None,
      stats: Option[Stats] = None): Dataset[ScoredQDocF32] = {
    val spark = index.spark
    import spark.implicits._
    val numDocs = index.numDocs
    val plans = queries.map { case (qid, cq) =>
      val groupOf: Map[(String, String), Seq[Int]] = cq.terms
        .groupBy(t => (t.field, t.term)).map { case (kk, v) => kk -> v.map(_.group).distinct.sorted }
      val order = groupOf.keys.toArray.sortBy(kk => (groupOf(kk).min, kk._1, kk._2))
      val constMask = cq.groups.filter(_.constScore).map(g => 1 << g.id).sum
      val groupsWithTerms = cq.terms.map(_.group).toSet
      // the same selectivity gates as searchF32, PLUS a batch-specific
      // density bound on the total match set: per-(query, shard) WAND
      // setup + per-doc bookkeeping is paid once in the single-query
      // path but multiplied by batch width x shard count here, while
      // the exhaustive replay's extra cost is one shardDocs array scan
      // per (query, shard). A query whose terms match a large fraction
      // of the corpus walks nearly every posting WITH bookkeeping and
      // skips almost nothing (27M skew leg: WAND 3.1x SLOWER than
      // exhaustive at sum-df ~ 0.6N, while sparse mixes run 1.8x
      // FASTER) — route dense queries to the replay.
      val disjOk = cq.groups.size == 1 && !cq.groups.head.constScore &&
        cq.terms.map(_.df).min * 4 <= numDocs &&
        cq.terms.map(_.df).sum * 2 <= numDocs
      val conjOk = cq.groups.size > 1 && cq.groups.forall(_.required) &&
        cq.groups.forall(g => groupsWithTerms.contains(g.id)) && {
          val minGroupDf =
            cq.groups.map(g => cq.terms.filter(_.group == g.id).map(_.df).sum).min
          minGroupDf * 4 <= numDocs
        }
      BatchPlan(qid, if (disjOk) 0 else if (conjOk) 1 else 2, order,
        cq.terms.map(t => (t.field, t.term) -> t.weightF32).toMap,
        cq.terms.map(t => (t.field, t.term, t.group) -> t.weightF32).toMap,
        groupOf, constMask, cq.requiredMask, cq.groups.size)
    }.toArray
    val allTerms = queries.flatMap(_._2.terms)
    val caches: Map[String, Array[Float]] =
      allTerms.map(_.field).distinct.map(f => f -> Bm25.normCacheF32(index.avgFieldnormF32(f))).toMap
    val shardDocs = index.config.shardDocs
    val kk = k
    Scorer.shardGrouped(index, allTerms, deletes) { (rows, dels) =>
      batchShard(rows, plans, caches, shardDocs, kk, dels, stats)
    }
  }

  private def batchShard(rows: Array[PostingRow], plans: Array[BatchPlan],
      caches: Map[String, Array[Float]], shardDocs: Int, k: Int,
      deleted: Set[Long], stats: Option[Stats]): Iterator[ScoredQDocF32] = {
    if (rows.isEmpty || k <= 0) return Iterator.empty
    val cache = new BlockCache(stats)
    rows.foreach(cache.register)
    // arrival-order rows per key (one row per epoch segment): replay
    // order within a key is arrival order, matching the single-query
    // merge's STABLE sort over equal keys
    val rowsOfKey = new scala.collection.mutable.LinkedHashMap[(String, String),
      scala.collection.mutable.ArrayBuffer[PostingRow]]
    rows.foreach(p => rowsOfKey.getOrElseUpdate((p.field, p.term),
      scala.collection.mutable.ArrayBuffer.empty) += p)
    val base = rows(0).shard.toLong * shardDocs
    // scratch arrays shared by every exhaustive-replay query of the shard
    var score: Array[Float] = null
    var mask: Array[Int] = null
    val out = Seq.newBuilder[ScoredQDocF32]
    plans.foreach { q =>
      val qRows = q.order.iterator.flatMap(rowsOfKey.getOrElse(_, Nil)).toArray
      if (qRows.nonEmpty) q.route match {
        case 0 =>
          wandShard(qRows, q.weightsFT, caches, k, deleted, stats, cache)
            .foreach(h => out += ScoredQDocF32(q.qid, h.docId, h.score))
        case 1 =>
          wandShardConj(qRows, q.weights, q.groupOf, caches, q.constMask, q.nGroups,
            k, deleted, stats, cache)
            .foreach(h => out += ScoredQDocF32(q.qid, h.docId, h.score))
        case _ =>
          // exhaustive replay, bit-identical accumulation order to
          // Scorer.mergeShardF32: keys (minGroup, field, term) sorted,
          // rows within a key in arrival order, groups ascending,
          // docIds ascending — every decode through the shared cache
          if (score == null) {
            score = new Array[Float](shardDocs); mask = new Array[Int](shardDocs)
          } else {
            java.util.Arrays.fill(score, 0.0f); java.util.Arrays.fill(mask, 0)
          }
          q.order.foreach { key =>
            rowsOfKey.get(key).foreach { prs =>
              val fcache = caches(key._1)
              prs.foreach { p =>
                val blocks = cache.decodeRow(p)
                q.groupOf(key).foreach { g =>
                  val gBit = 1 << g
                  val isConst = (q.constMask & gBit) != 0
                  val w = q.weights((key._1, key._2, g))
                  var bi = 0
                  while (bi < blocks.length) {
                    val dec = blocks(bi)
                    var i = 0
                    while (i < dec.docIds.length) {
                      val o = (dec.docIds(i) - base).toInt
                      if (isConst) {
                        if ((mask(o) & gBit) == 0) score(o) += 1.0f
                      } else {
                        score(o) += Bm25.tfScoreF32(w, dec.tfs(i), fcache(dec.norms(i)))
                      }
                      mask(o) |= gBit
                      i += 1
                    }
                    bi += 1
                  }
                }
              }
            }
          }
          val heap = new Scorer.TopKHeap(math.max(1, math.min(k, shardDocs)))
          var o = 0
          while (o < shardDocs) {
            if ((mask(o) & q.reqMask) == q.reqMask && mask(o) != 0 &&
                !deleted.contains(base + o))
              heap.offer(score(o).toDouble, base + o, score(o).toDouble)
            o += 1
          }
          heap.foreachKept((d, s) => out += ScoredQDocF32(q.qid, d, s.toFloat))
      }
    }
    cache.finish()
    out.result().iterator
  }

  /** Top-k for a single-group disjunction; exact w.r.t. the exhaustive
    * scorer under the (score desc, docId asc) total order.
    */
  def topK(index: BuiltIndex, cq: CompiledQuery, k: Int,
      deletes: Option[Dataset[Long]] = None,
      stats: Option[Stats] = None): Dataset[ScoredDocF32] = {
    require(cq.groups.size == 1 && !cq.groups.head.constScore,
      "WAND path covers single-group sum-scored queries; use Scorer for the rest")
    val spark = index.spark
    import spark.implicits._
    val weights: Map[(String, String), Float] =
      cq.terms.map(t => (t.field, t.term) -> t.weightF32).toMap
    val caches: Map[String, Array[Float]] =
      cq.terms.map(_.field).distinct.map(f => f -> Bm25.normCacheF32(index.avgFieldnormF32(f))).toMap
    val kk = k
    // tombstones (when present) stay cogrouped per shard inside
    // shardGrouped's fallback: WAND must exclude them DURING scoring so
    // the heap fills with live docs — a post-hoc anti-join would
    // under-fill the top-k
    Scorer.shardGrouped(index, cq.terms, deletes) { (rows, dels) =>
      wandShard(rows, weights, caches, kk, dels, stats)
    }
  }
}
