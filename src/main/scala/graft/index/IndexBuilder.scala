package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.analyze.Analyzer

/** Engine configuration (the Spark-native analogue of lnx's per-table
  * DDL + bucket config, SURVEY.md sections 1.4, 2.1 S1/S9).
  *
  * @param keyCols    primary-key columns; doc identity + deterministic
  *                   docId order (INSERT-as-upsert keys, apis/mod.rs:81-82)
  * @param fields     text columns to index (per-column tokenizers in lnx
  *                   DDL, sql.rs:110; we apply the code-aware analyzer)
  * @param shardDocs  posting lists are split by docId range into shards
  *                   of this many docs: bounds any single task/group even
  *                   for ultra-hot terms (skew: SURVEY.md section 4 O11)
  *                   and gives WAND its unit of parallelism. At 100 TB
  *                   raise to ~1M docs/shard.
  * @param buildPartitions shuffle parallelism of the posting build
  */
final case class IndexConfig(
    keyCols: Seq[String],
    fields: Seq[String],
    shardDocs: Int = 8192,
    buildPartitions: Int = 32,
    /** lnx fast-fuzzy mode: pre-compute the SymSpell delete-variant
      * dictionary at INDEX time and persist it with the segment
      * (README.md:28 — "sacrifices indexing performance" for the 30x
      * query path). Off: the dictionary builds lazily at first query.
      */
    fastFuzzy: Boolean = false,
    /** Per-field tokenizer names (the DDL's `WITH (tokenizers = ...)`,
      * sql.rs:110; registry semantics in analyze.Tokenizers). Fields
      * absent from the map use the default code-aware analyzer. Query
      * text is tokenized with the SAME tokenizer as the queried column
      * (apis/mod.rs:211-213) — QueryEngine.tokenizeQuery reads this map.
      */
    tokenizers: Map[String, String] = Map.empty,
    /** docId assignment strategy (see IndexBuilder.assignDocIdsCounted):
      * KeyRange (default) = ids follow the global primary-key order —
      * parallelism-independent for any source, mirrors the oracle's
      * (score, key) tie-break, costs one corpus-wide range shuffle.
      * Scan = ids follow arrival (scan) order — tantivy's own docId
      * semantics (segment ordinals in ingest order) — ZERO shuffle, the
      * bulk-build fast path; deterministic only for a fixed input
      * partitioning (true for spark.range-derived frames at any
      * parallelism, and for parquet under pinned split configs).
      */
    docIdStrategy: String = DocIdStrategy.KeyRange) {
  def tokenizerOf(field: String): String =
    tokenizers.getOrElse(field, graft.analyze.Tokenizers.Default)
}

object DocIdStrategy {
  final val KeyRange = "keyRange"
  final val Scan = "scan"
}

/** Encoded posting list for one (field, term, shard). */
final case class PostingRow(
    field: String,
    term: String,
    shard: Int,
    numDocs: Int,
    sumTf: Long,
    bytes: Array[Byte],
    blockOffset: Array[Int],
    blockLast: Array[Long],
    blockMaxTf: Array[Int],
    blockMinNorm: Array[Int])

/** Per-field corpus statistics needed by BM25. */
final case class FieldStats(field: String, totalTokens: Long)

/** A partial posting list covering one input partition's slice of one
  * (field, term, shard): already delta+bitpack encoded at the map side.
  * Because docIds are assigned contiguously per range partition, the
  * partials of a shard have disjoint, ordered docId ranges — the merge
  * is a concatenation, never an interleave (firstDoc orders them).
  */
final case class PartialRow(
    field: String,
    term: String,
    shard: Int,
    firstDoc: Long,
    numDocs: Int,
    sumTf: Long,
    bytes: Array[Byte],
    blockOffset: Array[Int],
    blockLast: Array[Long])

/** An immutable index segment: the Spark-native analogue of a tantivy
  * segment (posting lists + term dictionary + fieldnorms + doc store,
  * SURVEY.md section 1.3/1.4). All members are lazy Spark datasets;
  * `persist()` pins them for repeated queries (plays the role of lnx's
  * mmap'd searcher + reader cache, bucket.rs:24-25).
  */
final class BuiltIndex(
    val docs: DataFrame, // source columns + docId
    val postings: Dataset[PostingRow],
    val termStats: DataFrame, // field, term, df
    val numDocs: Long,
    val fieldTokens: Map[String, Long],
    val config: IndexConfig,
    val deletes: Option[DataFrame] = None, // upsert tombstones (docId)
    /** build-time SymSpell dictionary (field, variant, term, df) when
      * the segment was written in fast-fuzzy mode. */
    val symspell: Option[DataFrame] = None,
    /** True iff `postings` is physically co-partitioned by docId shard
      * with EXACTLY ONE PostingRow per (field, term, shard) — the
      * in-memory single-segment build guarantees both by hashing the
      * merged postings on `shard` before the persist. Scorers then take
      * the exchange-free mapPartitions path (every cursor of a shard is
      * already in one task). Store-loaded indexes stay `false`: their
      * per-epoch segment reads are unioned with no co-location, and the
      * multi-epoch replay-order contract lives on the cogroup path. */
    val postingsShardLocal: Boolean = false) {

  def spark: SparkSession = docs.sparkSession

  def avgFieldnormF32(field: String): Float =
    fieldTokens.getOrElse(field, 0L).toFloat / numDocs.toFloat

  def avgFieldnormF64(field: String): Double =
    fieldTokens.getOrElse(field, 0L).toDouble / numDocs.toDouble

  /** @param cacheDocs pin the stored-fields frame too. True is right
    *   for the in-memory session analogue; the persisted-segment path
    *   (IndexStore.load) passes FALSE at scale so stored fields stream
    *   from the docId-sorted segment parquet (pruned reads) and only
    *   postings/termstats — the rough analogue of tantivy's mmap'd
    *   searcher state — occupy executor memory. At 100 TB the doc store
    *   does not fit; the index working set does.
    */
  def persist(cacheDocs: Boolean = true): this.type = {
    if (cacheDocs) docs.persist(StorageLevel.MEMORY_AND_DISK)
    postings.persist(StorageLevel.MEMORY_AND_DISK)
    termStats.persist(StorageLevel.MEMORY_AND_DISK)
    symspell.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    this
  }

  def unpersist(): Unit = unpersist(blocking = false)

  /** blocking = true waits for the blocks to actually drop — required
    * when the caller immediately starts competing work (e.g. Bench's
    * second build pass) and async eviction would contaminate its
    * storage-memory budget.
    */
  def unpersist(blocking: Boolean): Unit = {
    docs.unpersist(blocking); postings.unpersist(blocking); termStats.unpersist(blocking)
    symspell.foreach(_.unpersist(blocking))
  }
}

object IndexBuilder {

  /** Deterministic dense docIds: global sort order over the (unique) key
    * columns, realized scalably as range-repartition + in-partition sort
    * + per-partition offsets (no single-partition window, no
    * monotonically_increasing_id). The id sequence depends only on the
    * key order, not on parallelism or input partitioning — required for
    * rank-identity and resume (SURVEY.md section 7 hard part 2).
    */
  def assignDocIds(df: DataFrame, keyCols: Seq[String], parts: Int, base: Long = 0L,
      strategy: String = DocIdStrategy.KeyRange): DataFrame =
    assignDocIdsCounted(df, keyCols, parts, base, strategy)._1

  /** As assignDocIds, additionally returning the sorted intermediate
    * (for callers that want to re-derive lineage) and the total row
    * count — known driver-side from the per-partition counts, so
    * callers need no extra count() job over the corpus.
    *
    * The sorted intermediate is NOT cached: `toRdd` freezes ONE physical
    * plan (and thus one partitioning — two separate Dataset jobs could
    * be re-planned differently by AQE, desynchronizing the count and
    * assignment passes), the per-partition count job and the
    * id-assignment job then share the range shuffle's map output
    * (Spark reuses completed shuffle stages), and the only extra cost
    * of the second pass is the in-partition sort — pure parallel CPU —
    * where caching would add a corpus-sized cache write + read, which
    * is what bounds the build at high thread counts (memory bandwidth,
    * not cores). This is the one sanctioned RDD drop: genuinely
    * per-partition imperative id assignment.
    */
  def assignDocIdsCounted(df: DataFrame, keyCols: Seq[String], parts: Int,
      base: Long = 0L, strategy: String = DocIdStrategy.KeyRange): (DataFrame, DataFrame, Long) = {
    // fail loud on typos ("Scan", "key-range"): a silent fallback to
    // keyRange would measure/build the wrong strategy with no error
    require(strategy == DocIdStrategy.KeyRange || strategy == DocIdStrategy.Scan,
      s"unknown docIdStrategy '$strategy' (expected '${DocIdStrategy.KeyRange}' or '${DocIdStrategy.Scan}')")
    val keys = keyCols.map(col)
    // Scan strategy: ids in arrival order over the input's own
    // partitioning — no shuffle, no sort (tantivy's docId semantics:
    // segment ordinals in ingest order). The key-range shuffle is the
    // build's single largest cost at high thread counts (BENCH.md), so
    // bulk one-shot builds that don't need key-ordered ids skip it.
    val sorted =
      if (strategy == DocIdStrategy.Scan) df
      else df.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
    // InternalRow path: no external-Row materialization in the build's
    // hottest phase — the count pass touches no fields at all and the
    // id-append pass is one UnsafeProjection over a JoinedRow (a byte
    // copy), instead of per-field decode + Row allocation + re-encode
    val sortedRdd = sorted.queryExecution.toRdd // freeze plan + partitioning for both passes
    val counts = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; it.foreach(_ => n += 1); Iterator.single((pid, n))
      }
      .collect().toMap
    val nParts = sortedRdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = base
    for (p <- 0 until nParts) { offsets(p) = acc; acc += counts.getOrElse(p, 0L) }
    val outSchema = StructType(df.schema.fields :+ StructField("docId", LongType, nullable = false))
    val withIdsRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
      val proj = UnsafeProjection.create(outSchema)
      val idRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var next = offsets(pid)
      it.map { r =>
        idRow.update(0, next); next += 1
        // copy: the projection reuses its output buffer, and downstream
        // consumers (cache builder, shuffle) may hold references
        proj(joined(r, idRow)).copy(): InternalRow
      }
    }
    val withIds = org.apache.spark.sql.GraftExpressionBridge
      .internalCreateDataFrame(df.sparkSession, withIdsRdd, outSchema)
    (withIds, sorted, acc - base)
  }

  /** In-memory posting accumulator per map partition — the Spark-native
    * analogue of tantivy's indexing-time term hashmap (tantivy-stacker,
    * Cargo.lock:2890). Docs arrive in docId order (range partition +
    * in-partition sort), so per-term buffers are born sorted; buffers
    * flush at every shard boundary, bounding memory to one shard's
    * activity. Output rows carry already-encoded posting bytes, so the
    * one shuffle moves ~2-4 bytes per (term, doc) occurrence instead of
    * a ~70-byte row — the difference between a DRAM/shuffle-bound build
    * and a CPU-bound one (measured 4x task-CPU inflation at high
    * parallelism with the naive hit shuffle).
    */
  private def partialPostings(docs: DataFrame, config: IndexConfig): Dataset[PartialRow] = {
    val fields = config.fields
    // per-field tokenizer names resolved here (plain strings: the task
    // closure captures names, not the registry objects)
    val fieldTokenizers: Array[String] = fields.map(config.tokenizerOf).toArray
    val shardDocs = config.shardDocs
    val cols = col("docId") +: fields.map(col)
    val projected = docs.select(cols: _*)
    // InternalRow scan: the tokenize+encode pass reads (docId, texts)
    // straight off the columnar cache without per-doc external-Row
    // materialization; only the few output PartialRows pay an encoder
    val rdd = projected.queryExecution.toRdd.mapPartitions { rows =>
      // streaming iterator, NOT a partition-wide buffer: each shard's
      // flushed PartialRows are emitted (and consumed by the shuffle
      // writer) before the next shard accumulates, so task memory holds
      // one shard's activity — not the whole partition's encoded output
      new Iterator[PartialRow] {
        // primitive growable buffers + ONE term map per field: the loop
        // body runs once per (term, doc) occurrence across the whole
        // corpus, where an ArrayBuffer[Long] append (boxed Long) and a
        // Tuple2 key per HashMap probe were pure per-occurrence garbage
        final class Buf {
          private[this] var docIds = new Array[Long](8)
          private[this] var tfs = new Array[Int](8)
          private[this] var norms = new Array[Int](8)
          private[this] var n = 0
          def add(d: Long, tf: Int, norm: Int): Unit = {
            if (n == docIds.length) {
              docIds = java.util.Arrays.copyOf(docIds, n * 2)
              tfs = java.util.Arrays.copyOf(tfs, n * 2)
              norms = java.util.Arrays.copyOf(norms, n * 2)
            }
            docIds(n) = d; tfs(n) = tf; norms(n) = norm; n += 1
          }
          def docIdArr: Array[Long] = java.util.Arrays.copyOf(docIds, n)
          def tfArr: Array[Int] = java.util.Arrays.copyOf(tfs, n)
          def normArr: Array[Int] = java.util.Arrays.copyOf(norms, n)
        }
        private val accByField: Array[java.util.HashMap[String, Buf]] =
          Array.fill(fields.length)(new java.util.HashMap[String, Buf]())
        private val pending = new java.util.ArrayDeque[PartialRow]()
        private var curShard = -1
        private var done = false
        private def flush(): Unit = {
          var fi = 0
          while (fi < accByField.length) {
            val acc = accByField(fi)
            if (!acc.isEmpty) {
              val field = fields(fi)
              val it = acc.entrySet().iterator()
              while (it.hasNext) {
                val e = it.next()
                val term = e.getKey
                val b = e.getValue
                val docIds = b.docIdArr
                val tfArr = b.tfArr
                var sumTf = 0L
                var i = 0
                while (i < tfArr.length) { sumTf += tfArr(i); i += 1 }
                val enc = PostingCodec.encode(docIds, tfArr, b.normArr)
                pending.addLast(PartialRow(field, term, curShard, docIds(0), docIds.length,
                  sumTf, enc.bytes, enc.blockOffset, enc.blockLast))
              }
              acc.clear()
            }
            fi += 1
          }
        }
        private def advance(): Unit = {
          while (pending.isEmpty && !done) {
            if (!rows.hasNext) { done = true; flush() }
            else {
              val r = rows.next()
              val docId = r.getLong(0)
              val shard = (docId / shardDocs).toInt
              if (shard != curShard) { flush(); curShard = shard }
              var fi = 0
              while (fi < fields.length) {
                val text = if (r.isNullAt(fi + 1)) "" else r.getUTF8String(fi + 1).toString
                val (counts, len) =
                  graft.analyze.Tokenizers.tokenCountsJava(fieldTokenizers(fi), text)
                val norm = Fieldnorm.encode(len.toLong)
                val acc = accByField(fi)
                val eit = counts.entrySet().iterator()
                while (eit.hasNext) {
                  val e = eit.next()
                  val t = e.getKey
                  var b = acc.get(t)
                  if (b == null) { b = new Buf; acc.put(t, b) }
                  b.add(docId, e.getValue, norm)
                }
                fi += 1
              }
            }
          }
        }
        override def hasNext: Boolean = { advance(); !pending.isEmpty }
        override def next(): PartialRow = { advance(); pending.removeFirst() }
      }
    }
    docs.sparkSession.createDataset(rdd)(Encoders.product[PartialRow])
  }

  /** Merge the (few, docId-range-disjoint) partials of one
    * (field, term, shard) into the final PostingRow.
    */
  private def mergePartials(key: (String, String, Int), parts: Iterator[PartialRow]): PostingRow = {
    val sorted = parts.toArray.sortBy(_.firstDoc)
    val n = sorted.map(_.numDocs).sum
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    val norms = new Array[Int](n)
    var off = 0
    var sumTf = 0L
    sorted.foreach { p =>
      val dec = PostingCodec.decodeAll(p.bytes, p.blockOffset, p.blockLast)
      System.arraycopy(dec.docIds, 0, docIds, off, p.numDocs)
      System.arraycopy(dec.tfs, 0, tfs, off, p.numDocs)
      System.arraycopy(dec.norms, 0, norms, off, p.numDocs)
      off += p.numDocs
      sumTf += p.sumTf
    }
    val enc = PostingCodec.encode(docIds, tfs, norms)
    PostingRow(key._1, key._2, key._3, n, sumTf,
      enc.bytes, enc.blockOffset, enc.blockLast, enc.blockMaxTf, enc.blockMinNorm)
  }

  /** Full build: docs -> map-side encoded partials -> one compact
    * shuffle on (field, term, shard) -> concat-merge -> postings +
    * term dictionary + stats.
    */
  def build(df: DataFrame, config: IndexConfig, docIdBase: Long = 0L): BuiltIndex =
    // eager persist-heavy span (see EagerPlanConfs): the postings
    // merge + caches compile statically under the persist, where AQE
    // only adds per-stage jobs and plan-description events
    graft.EagerPlanConfs.scoped(df.sparkSession)(buildBody(df, config, docIdBase))

  private def buildBody(df: DataFrame, config: IndexConfig, docIdBase: Long): BuiltIndex = {
    val spark = df.sparkSession
    // fail loud HERE, naming the column: partialPostings reads fields
    // via getUTF8String, which on a non-string column misreads the
    // value's bytes as an offset word — garbage tokens or an
    // out-of-bounds crash deep inside a task, far from the cause
    config.fields.foreach { f =>
      val sf = df.schema.fields.find(_.name == f)
        .getOrElse(throw new IllegalArgumentException(s"indexed field $f not in schema"))
      // pattern match, not singleton ==: Spark 4 collated strings fail
      // singleton equality but getUTF8String handles them fine
      require(sf.dataType.isInstanceOf[org.apache.spark.sql.types.StringType],
        s"indexed field $f must be a string column, got ${sf.dataType.simpleString}")
    }
    val (withIds, _, numDocs) =
      assignDocIdsCounted(df, config.keyCols, config.buildPartitions, docIdBase,
        config.docIdStrategy)
    // numDocs is already known from the assignment counts — no extra
    // corpus pass; the docs cache materializes as a side effect of the
    // postings pass scanning it (one build = two passes total: the
    // count pass over the shared shuffle output, then postings+cache)
    val docs = withIds.persist(StorageLevel.MEMORY_AND_DISK)
    val postings = partialPostings(docs, config)
      .groupByKey(p => (p.field, p.term, p.shard))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaInt))
      .mapGroups { (key, parts) => mergePartials(key, parts) }(Encoders.product[PostingRow])
      // co-partition the FINAL compact postings by shard before the
      // persist: one extra exchange of the encoded index per build (the
      // §2.4 bucketing trade — pay the shuffle once at write time) buys
      // every subsequent query an exchange-free shard-local scoring
      // pass (Scorer.shardGrouped fast path). The merge shuffle above
      // stays keyed on (field, term, shard) so merge parallelism never
      // collapses to the shard count (7 shards at sf0.1).
      //
      // Partition count = min(buildPartitions, shard count), derived
      // from the corpus (numDocs is already known driver-side): a
      // 7-shard corpus in 32+ partitions would leave every query's
      // scan stage launching mostly-empty tasks. Rows sort by
      // (field, term) within each partition so the columnar cache's
      // per-batch min/max stats can prune term-filtered scans once
      // partitions span many batches (order within a (field, term,
      // shard) key is irrelevant: single segment = one row per key,
      // and every scorer re-sorts its shard's rows).
      .repartition(
        math.min(config.buildPartitions.toLong,
          math.max(1L, (numDocs + config.shardDocs - 1) / config.shardDocs)).toInt,
        col("shard"))
      .sortWithinPartitions(col("field"), col("term"))
    val pPersisted = postings.persist(StorageLevel.MEMORY_AND_DISK)
    val termStats = pPersisted.groupBy(col("field"), col("term"))
      .agg(sum(col("numDocs")).as("df"))
    // exact per-field token totals (tantivy: total_num_tokens) from the
    // per-row sumTf column: a map-side partial agg, no decode
    val fieldTokens = pPersisted
      .groupBy(col("field")).agg(sum(col("sumTf")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    new BuiltIndex(docs, pPersisted, termStats, numDocs, fieldTokens, config,
      postingsShardLocal = true).persist()
  }
}
