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
    buildPartitions: Int = 32)

/** One (field, term, doc) occurrence with its tf and the doc's u8 norm. */
final case class TermHit(field: String, term: String, shard: Int, docId: Long, tf: Int, norm: Int)

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
    val deletes: Option[DataFrame] = None) { // upsert tombstones (docId)

  def spark: SparkSession = docs.sparkSession

  def avgFieldnormF32(field: String): Float =
    fieldTokens.getOrElse(field, 0L).toFloat / numDocs.toFloat

  def avgFieldnormF64(field: String): Double =
    fieldTokens.getOrElse(field, 0L).toDouble / numDocs.toDouble

  def persist(): this.type = {
    docs.persist(StorageLevel.MEMORY_AND_DISK)
    postings.persist(StorageLevel.MEMORY_AND_DISK)
    termStats.persist(StorageLevel.MEMORY_AND_DISK)
    this
  }

  def unpersist(): Unit = {
    docs.unpersist(); postings.unpersist(); termStats.unpersist()
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
  def assignDocIds(df: DataFrame, keyCols: Seq[String], parts: Int, base: Long = 0L): DataFrame = {
    val keys = keyCols.map(col)
    val sorted = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = base
    for (p <- 0 until nParts) { offsets(p) = acc; acc += counts.getOrElse(p, 0L) }
    val outSchema = StructType(df.schema.fields :+ StructField("docId", LongType, nullable = false))
    val enc = Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var next = offsets(pid)
      it.map { r => val id = next; next += 1; Row.fromSeq(r.toSeq :+ id) }
    }(enc)
  }

  /** Tokenize every indexed field of every doc; one pass, no shuffle:
    * tf aggregation happens within the row (a doc's tokens are local).
    */
  private def termHits(docs: DataFrame, config: IndexConfig): Dataset[TermHit] = {
    val fields = config.fields
    val shardDocs = config.shardDocs
    val cols = col("docId") +: fields.map(col)
    val projected = docs.select(cols: _*)
    projected.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        val shard = (docId / shardDocs).toInt
        fields.indices.iterator.flatMap { fi =>
          val text = if (r.isNullAt(fi + 1)) "" else r.getString(fi + 1)
          val (counts, len) = Analyzer.tokenCounts(text)
          val norm = Fieldnorm.encode(len.toLong)
          counts.iterator.map { case (t, tf) => TermHit(fields(fi), t, shard, docId, tf, norm) }
        }
      }
    }(Encoders.product[TermHit])
  }

  /** Streaming sorted-run encoder: consecutive hits with the same
    * (field, term, shard) — guaranteed by sortWithinPartitions — fold
    * into one encoded PostingRow. Memory is bounded by shardDocs.
    */
  private def encodeRuns(it: Iterator[TermHit]): Iterator[PostingRow] = new Iterator[PostingRow] {
    private val buf = it.buffered
    override def hasNext: Boolean = buf.hasNext
    override def next(): PostingRow = {
      val head = buf.next()
      val docIds = Array.newBuilder[Long]
      val tfs = Array.newBuilder[Int]
      val norms = Array.newBuilder[Int]
      docIds += head.docId; tfs += head.tf; norms += head.norm
      var n = 1
      while (buf.hasNext && buf.head.field == head.field &&
        buf.head.term == head.term && buf.head.shard == head.shard) {
        val h = buf.next()
        docIds += h.docId; tfs += h.tf; norms += h.norm
        n += 1
      }
      val tfArr = tfs.result()
      var sumTf = 0L
      var i = 0
      while (i < tfArr.length) { sumTf += tfArr(i); i += 1 }
      val enc = PostingCodec.encode(docIds.result(), tfArr, norms.result())
      PostingRow(head.field, head.term, head.shard, n, sumTf,
        enc.bytes, enc.blockOffset, enc.blockLast, enc.blockMaxTf, enc.blockMinNorm)
    }
  }

  /** Full build: docs -> hits -> one shuffle on (field, term, shard) ->
    * sorted streaming encode -> postings + term dictionary + stats.
    */
  def build(df: DataFrame, config: IndexConfig, docIdBase: Long = 0L): BuiltIndex = {
    val spark = df.sparkSession
    val docs = assignDocIds(df, config.keyCols, config.buildPartitions, docIdBase)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hits = termHits(docs, config)
    val postings = hits
      .repartition(config.buildPartitions, col("field"), col("term"), col("shard"))
      .sortWithinPartitions("field", "term", "shard", "docId")
      .mapPartitions(encodeRuns)(Encoders.product[PostingRow])
    val pPersisted = postings.persist(StorageLevel.MEMORY_AND_DISK)
    val termStats = pPersisted.groupBy(col("field"), col("term"))
      .agg(sum(col("numDocs")).as("df"))
    // exact per-field token totals (tantivy: total_num_tokens) from the
    // per-row sumTf column: a map-side partial agg, no decode
    val fieldTokens = pPersisted
      .groupBy(col("field")).agg(sum(col("sumTf")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val numDocs = docs.count()
    new BuiltIndex(docs, pPersisted, termStats, numDocs, fieldTokens, config).persist()
  }
}
