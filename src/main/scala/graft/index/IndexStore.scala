package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persistent multi-segment index layout — the Spark-native analogue of
  * lnx's tablet store + SQLite metastore (SURVEY.md sections 1.3, 3.2):
  *
  *   dir/seg-NNNNN/{postings,docs,termstats}.parquet   segment data
  *   dir/_deletes/epoch=N/                              upsert tombstones
  *   dir/_lineage/epoch=N/                              per-partition metrics
  *   dir/_manifest/vNNNNN/{epochs,config,checkpoints}.parquet
  *   dir/_manifest/LATEST                               atomic pointer
  *
  * Commit ordering mirrors the reference's write path (data durable
  * first, then the metastore record, bucket.rs:223-237): segment files
  * are written before the new manifest version; the LATEST pointer is
  * swapped last via atomic rename. Data without a manifest entry is
  * invisible garbage awaiting GC — the same crash-consistency contract
  * as dead tablets (bucket.rs:72-74). On a real cluster the manifest
  * role is played by Iceberg snapshot commits (no Iceberg jars in this
  * sandbox; the seam is this object).
  */
object IndexStore {

  /** docIdEnd = exclusive upper bound of docIds in this epoch; after
    * compaction numDocs < docIdEnd (ids are never renumbered).
    */
  final case class EpochMeta(epoch: Int, path: String, numDocs: Long, docIdBase: Long,
      docIdEnd: Long, field: String, fieldTokens: Long)
  final case class CheckpointRow(epoch: Int, snapshotId: String, committedAtEpochMs: Long)
  final case class LineageRow(epoch: Int, partitionId: Int, postingRows: Long,
      postingDocs: Long, tokens: Long)
  final case class ConfigRow(keyCols: Seq[String], fields: Seq[String], shardDocs: Int,
      buildPartitions: Int, fastFuzzy: Boolean = false,
      tokenizers: Map[String, String] = Map.empty,
      analyzerVersion: Int = graft.analyze.Tokenizers.AnalyzerVersion,
      docIdStrategy: String = DocIdStrategy.KeyRange)

  private def latestPath(dir: String) = Paths.get(dir, "_manifest", "LATEST")

  def currentVersion(dir: String): Int = {
    val p = latestPath(dir)
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  private def manifestDir(dir: String, v: Int) = f"$dir/_manifest/v$v%05d"

  /** Atomically advance the LATEST pointer (tmp file + rename). */
  private[index] def commitVersion(dir: String, v: Int): Unit = {
    Files.createDirectories(Paths.get(dir, "_manifest"))
    // best-effort version CAS: every mutator reads LATEST=v-1 and
    // commits v. If another writer advanced LATEST in between (e.g. a
    // deleteByQuery racing a streaming appendEpoch), a silent
    // last-writer-wins here would DISCARD the other writer's committed
    // epochs from the manifest view. The store's contract is single
    // writer; this turns a contract violation into a loud error
    // instead of silent data loss (a true CAS needs a locking FS
    // primitive — the remaining window is the move below).
    val cur = currentVersion(dir)
    if (cur != v - 1)
      throw new IllegalStateException(
        s"concurrent manifest writer at $dir: committing v$v but LATEST is v$cur " +
        s"(expected v${v - 1}); the store supports one writer at a time")
    val tmp = Paths.get(dir, "_manifest", s".LATEST.tmp$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeManifest(spark: SparkSession, dir: String, v: Int,
      epochs: Seq[EpochMeta], config: IndexConfig, checkpoints: Seq[CheckpointRow],
      tombstoneEpochs: Seq[Int], kv: Map[String, String] = Map.empty): Unit = {
    // CAS BEFORE the content writes, not only at commit: version v may
    // already be COMMITTED by a concurrent writer, and the Overwrite
    // writes below would clobber its manifest content before
    // commitVersion's check ever fires — the losing writer must fail
    // without touching the winner's committed dir (commitVersion keeps
    // its own check for the residual window)
    val cur = currentVersion(dir)
    if (cur != v - 1)
      throw new IllegalStateException(
        s"concurrent manifest writer at $dir: writing v$v but LATEST is v$cur " +
        s"(expected v${v - 1}); the store supports one writer at a time")
    val md = manifestDir(dir, v)
    spark.createDataset(epochs)(Encoders.product[EpochMeta])
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$md/epochs.parquet")
    spark.createDataset(Seq(ConfigRow(config.keyCols, config.fields, config.shardDocs,
      config.buildPartitions, config.fastFuzzy, config.tokenizers,
      docIdStrategy = config.docIdStrategy)))(Encoders.product[ConfigRow])
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$md/config.parquet")
    spark.createDataset(checkpoints)(Encoders.product[CheckpointRow])
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$md/checkpoints.parquet")
    // the manifest OWNS its tombstone-dir set (Iceberg-manifest
    // analogue): readers of THIS version apply exactly these
    // _deletes/epoch=K dirs, so physical dir deletion can be deferred
    // to retention-aware gc() without post-compact readers re-reading
    // absorbed tombstones. Plain text like the LATEST pointer, NOT
    // parquet: the list is a handful of ints, and a coalesce(1)
    // parquet write + read added TWO Spark jobs to every mutator
    // (measured ~1.5 s per append at 200k in EpochBench)
    Files.createDirectories(Paths.get(md))
    Files.write(Paths.get(md, "tombstones.txt"),
      tombstoneEpochs.distinct.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    // kv is written even when EMPTY: a crashed updateConfig may have
    // left a stale kv.parquet at this version number, and skipping the
    // write would adopt those never-committed overrides verbatim when
    // this version commits (ghost config resurrection)
    spark.createDataset(kv.toSeq)(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .toDF("key", "value")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$md/kv.parquet")
    commitVersion(dir, v)
  }

  /** Bucket-config KV of the committed manifest (the reference's
    * tri-state config store, lnx-fs/src/config.rs:44-148): explicit
    * overrides live here; an absent key reads as its default.
    */
  def configKv(spark: SparkSession, dir: String, atVersion: Int = 0): Map[String, String] = {
    val v = if (atVersion > 0) atVersion else currentVersion(dir)
    require(v > 0, s"no committed manifest at $dir")
    val p = Paths.get(manifestDir(dir, v), "kv.parquet")
    if (!Files.exists(p)) Map.empty
    else spark.read.parquet(p.toString).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Tri-state read: Some(override) if set, else the supplied default
    * (config.rs: `get` falls back to the bucket default when unset).
    */
  def configValue(spark: SparkSession, dir: String, key: String,
      default: Option[String] = None): Option[String] =
    configKv(spark, dir).get(key).orElse(default)

  /** Update the config KV: apply `set` overrides, remove `unset` keys
    * (reads of unset keys fall back to defaults), and commit a new
    * manifest version carrying the unchanged epochs/checkpoints — the
    * update path the reference exposes as config set/unset
    * (config.rs:44-148). Versioned like every other manifest change:
    * a crash before the LATEST swap leaves the old config visible.
    */
  def updateConfig(spark: SparkSession, dir: String,
      set: Map[String, String] = Map.empty, unset: Seq[String] = Nil): Map[String, String] = {
    val (basis, epochs, config, cps) = readManifestV(spark, dir)
    val kv = (configKv(spark, dir) ++ set) -- unset
    writeManifest(spark, dir, basis + 1, epochs, config, cps,
      manifestTombstones(spark, dir, basis, epochs, cps).toSeq.sorted, kv)
    kv
  }

  def readManifest(spark: SparkSession, dir: String): (Seq[EpochMeta], IndexConfig, Seq[CheckpointRow]) = {
    val (_, epochs, config, cps) = readManifestV(spark, dir)
    (epochs, config, cps)
  }

  /** readManifest plus the manifest VERSION the content was read at —
    * mutators must commit at basis+1 (commitVersion CAS-checks it) so
    * a concurrent writer's manifest can never be silently overwritten
    * by content derived from a stale read.
    */
  private[index] def readManifestV(spark: SparkSession,
      dir: String): (Int, Seq[EpochMeta], IndexConfig, Seq[CheckpointRow]) = {
    val v = currentVersion(dir)
    require(v > 0, s"no committed manifest at $dir")
    val (epochs, config, cps) = readManifestAt(spark, dir, v)
    (v, epochs, config, cps)
  }

  /** Manifest content at a PINNED version — the reader half of snapshot
    * retention (the Iceberg time-travel analogue of the reference's
    * versioned metastore, lnx-fs/src/metastore/mod.rs): a long-running
    * reader loads at a version and `gc(retention >= R)` keeps every
    * segment and tombstone dir the last R versions reference, so the
    * pinned plan keeps collecting correctly across compactions.
    */
  def readManifestAt(spark: SparkSession, dir: String,
      v: Int): (Seq[EpochMeta], IndexConfig, Seq[CheckpointRow]) = {
    require(v > 0, s"manifest versions start at 1, got v$v")
    require(Files.isDirectory(Paths.get(manifestDir(dir, v))),
      s"manifest v$v at $dir does not exist (never committed, or expired by gc retention)")
    val md = manifestDir(dir, v)
    val epochs = spark.read.parquet(s"$md/epochs.parquet")
      .as(Encoders.product[EpochMeta]).collect().toSeq.sortBy(e => (e.epoch, e.field))
    // manifests written before the tokenizers column existed read as
    // default-analyzer-everywhere (the old behavior); manifests written
    // before analysis semantics were versioned read as analyzer v1;
    // manifests written before the strategy was persisted read keyRange
    // (the only strategy that existed then)
    val rawConf = spark.read.parquet(s"$md/config.parquet")
    val withToks =
      if (rawConf.columns.contains("tokenizers")) rawConf
      else rawConf.withColumn("tokenizers", typedLit(Map.empty[String, String]))
    val withVer =
      if (withToks.columns.contains("analyzerVersion")) withToks
      else withToks.withColumn("analyzerVersion", lit(1))
    val confDf =
      if (withVer.columns.contains("docIdStrategy")) withVer
      else withVer.withColumn("docIdStrategy", lit(DocIdStrategy.KeyRange))
    val c = confDf.as(Encoders.product[ConfigRow]).collect().head
    // Query-time tokenization must match the persisted terms exactly:
    // if any of this store's tokenizers changed semantics since the
    // store was written (e.g. en_stem's Porter1980 -> Snowball switch),
    // queries would silently miss the dictionary — fail loudly instead.
    // Indexed fields ABSENT from the map use the default analyzer, so
    // the default participates in the check too (a future default-
    // analyzer change must not slip past a store with an empty map).
    val changed = graft.analyze.Tokenizers.changedSince(c.analyzerVersion)
    val usedTokenizers = (c.fields.map(f =>
      c.tokenizers.getOrElse(f, graft.analyze.Tokenizers.Default)) ++
      c.tokenizers.values).distinct
    val affected = usedTokenizers.filter(changed)
    if (affected.nonEmpty)
      throw new IllegalStateException(
        s"store at $dir was built with analyzer v${c.analyzerVersion} and uses " +
        s"tokenizer(s) ${affected.mkString(", ")} whose output changed in " +
        s"v${graft.analyze.Tokenizers.AnalyzerVersion}; rebuild the index " +
        "(query-time terms would no longer match the persisted dictionary)")
    val config = IndexConfig(c.keyCols, c.fields, c.shardDocs, c.buildPartitions, c.fastFuzzy,
      c.tokenizers, c.docIdStrategy)
    val cps = spark.read.parquet(s"$md/checkpoints.parquet")
      .as(Encoders.product[CheckpointRow]).collect().toSeq.sortBy(_.epoch)
    (epochs, config, cps)
  }

  /** Write one epoch's segment data (no manifest commit yet):
    * postings range-partitioned + sorted by (field, term) so term
    * lookups prune parquet row groups (the FST/sstable term-dictionary
    * analogue, SURVEY.md section 4 O3); docs sorted by docId.
    */
  // ---- segment-layout writers, shared by writeSegment AND compact:
  // the layout IS the read-path contract (8 MB doc-store row groups for
  // top-k point lookups, range-partitioned dictionary), so exactly one
  // implementation exists — a second copy in compact drifted in r4
  // (default 128 MB doc groups + a coalesce(1) dictionary), silently
  // degrading every post-compaction store.

  private def writePostingsParquet(postings: DataFrame, parts: Int, path: String): Unit =
    postings
      .repartitionByRange(parts, col("field"), col("term"))
      .sortWithinPartitions("field", "term", "shard")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Doc store: small row groups (8 MB vs the 128 MB default) — the
    * access pattern is top-k point lookups by docId (lookupDocs), and
    * row-group stats are the pruning unit, so a k-id fetch reads ~k
    * small groups instead of k 128 MB ones. Scan-heavy consumers read
    * postings, not docs, so the small-group overhead lands nowhere hot.
    */
  private def writeDocsParquet(docs: DataFrame, parts: Int, path: String): Unit =
    docs
      .repartitionByRange(parts, col("docId"))
      .sortWithinPartitions("docId")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", (8 * 1024 * 1024).toString)
      .parquet(path)

  /** Term dictionary: range-partitioned like the postings so prefix /
    * exact lookups prune row groups (tiny at test scale, but a single
    * file would bottleneck a 10^12-doc dictionary).
    */
  private def writeTermstatsParquet(termStats: DataFrame, parts: Int, path: String): Unit =
    termStats
      .repartitionByRange(math.max(1, parts / 4), col("field"), col("term"))
      .sortWithinPartitions("field", "term")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Fast-fuzzy mode: the SymSpell delete-variant dictionary is an
    * INDEX-time artifact (README.md:28), variant-range-partitioned so
    * query-time correction lookups prune row groups.
    */
  private def writeSymspellParquet(termStats: DataFrame, parts: Int, path: String): Unit =
    graft.query.SymSpellDict.build(termStats)
      .repartitionByRange(math.max(1, parts / 4), col("field"), col("variant"))
      .sortWithinPartitions("field", "variant")
      .write.mode(SaveMode.Overwrite).parquet(path)

  private def writeSegment(idx: BuiltIndex, segDir: String): Unit = {
    val parts = math.max(1, idx.config.buildPartitions / 4)
    writePostingsParquet(idx.postings.toDF(), parts, s"$segDir/postings.parquet")
    writeDocsParquet(idx.docs, parts, s"$segDir/docs.parquet")
    writeTermstatsParquet(idx.termStats, parts, s"$segDir/termstats.parquet")
    if (idx.config.fastFuzzy)
      writeSymspellParquet(idx.termStats, parts, s"$segDir/symspell.parquet")
  }

  private def writeLineage(idx: BuiltIndex, dir: String, epoch: Int): Unit = {
    val spark = idx.spark
    import spark.implicits._
    idx.postings
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var (nRows, nDocs, nToks) = (0L, 0L, 0L)
        rows.foreach { p => nRows += 1; nDocs += p.numDocs; nToks += p.sumTf }
        Iterator.single(LineageRow(epoch, pid, nRows, nDocs, nToks))
      }(Encoders.product[LineageRow])
      .filter(col("postingRows") > 0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_lineage/epoch=$epoch")
  }

  /** Create a new index directory with epoch 0. */
  def create(df: DataFrame, config: IndexConfig, dir: String,
      snapshotId: String = "epoch-0"): BuiltIndex = {
    // create() means a NEW store: state from a previous store at this
    // dir would otherwise look live — LATEST resets to 1 but the old
    // _manifest/vNNNNN dirs remain as version numbers the new store
    // will advance THROUGH (adopting e.g. a stale kv.parquet when it
    // commits that version), _lineage keeps the dead store's epochs in
    // lineage() output, and orphan _deletes/seg-* dirs linger.
    //
    // Ordering is data-then-wipe-then-manifest: the new index is built
    // and fully WRITTEN to a staging dir BEFORE any old state is
    // touched, so a failed build (type gate, OOM, any job failure)
    // leaves the previously committed store intact — wipe-first turned
    // a transient build failure into permanent loss of the old store.
    // The staging name deliberately does not match "seg-*" so the wipe
    // below can't eat it.
    val root = Paths.get(dir)
    val staging = root.resolve("_staging-seg-00000")
    if (Files.exists(staging)) deleteTree(staging)
    val idx = IndexBuilder.build(df, config)
    writeSegment(idx, staging.toString)
    if (Files.exists(root)) {
      Seq("_manifest", "_lineage", "_deletes").foreach(d => deleteTree(root.resolve(d)))
      val listing = Files.list(root)
      try {
        val it = listing.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.startsWith("seg-")) deleteTree(p)
        }
      } finally listing.close()
    }
    Files.move(staging, root.resolve("seg-00000"))
    writeLineage(idx, dir, 0)
    val epochs = config.fields.map(f =>
      EpochMeta(0, "seg-00000", idx.numDocs, 0L, idx.numDocs, f, idx.fieldTokens.getOrElse(f, 0L)))
    writeManifest(idx.spark, dir, 1, epochs, config, Seq(CheckpointRow(0, snapshotId, 0L)), Nil)
    idx.unpersist()
    load(df.sparkSession, dir)
  }

  /** Load the committed view: union of all segments, with upsert
    * tombstones applied. df/avgdl statistics include not-yet-compacted
    * deleted docs — the same semantics as Lucene/tantivy segment
    * deletes before a merge.
    *
    * @param cacheDocs false = the SCALE default: stored fields stream
    *   from the docId-sorted segment parquet (top-k lookups prune to k
    *   row groups, QueryEngine.lookupDocs) and only postings/termstats
    *   pin memory. True pins the doc store too — only sane when the
    *   corpus fits executor memory (interactive small-table sessions).
    * @param atVersion 0 = the committed LATEST; a positive version pins
    *   the load to that manifest snapshot — combine with
    *   `gc(retention >= R)` so the pinned version's files survive
    *   later compactions (snapshot-retention reader contract).
    */
  def load(spark: SparkSession, dir: String, cacheDocs: Boolean = true,
      atVersion: Int = 0): BuiltIndex = {
    val v = if (atVersion > 0) atVersion else currentVersion(dir)
    require(v > 0, s"no committed manifest at $dir")
    val (epochs, config, cps) = readManifestAt(spark, dir, v)
    val segPaths = epochs.map(_.path).distinct
    val postings = segPaths.map(p => spark.read.parquet(s"$dir/$p/postings.parquet"))
      .reduce(_ unionByName _).as(Encoders.product[PostingRow])
    val docsAll = segPaths.map(p => spark.read.parquet(s"$dir/$p/docs.parquet"))
      .reduce(_ unionByName _)
    val deletes = loadDeletes(spark, dir, manifestTombstones(spark, dir, v, epochs, cps))
    val docs = deletes match {
      case Some(d) =>
        // the anti-join sits INSIDE the frame persist() may freeze, and
        // a cached plan never gets AQE's runtime broadcast conversion
        // (CLAUDE.md): make the broadcast decision explicitly, gated —
        // tombstones are slim docId longs, so 4M rows ≈ 32 MB. The
        // gate collects ONCE (limit gate+1): a count() + broadcast
        // would execute the tombstone union+distinct plan twice per
        // load (the broadcast build re-scans the parquet). Under the
        // gate the collected ids become a driver-local frame; above it
        // fall back to a plain shuffle join rather than sort-merging
        // the whole doc store against the delete set.
        val gate = 4000000
        val ids = d.limit(gate + 1).collect().map(_.getLong(0))
        val rhs =
          if (ids.length <= gate)
            broadcast(spark.createDataset(ids.toSeq)(Encoders.scalaLong).toDF("docId"))
          else d
        docsAll.join(rhs, Seq("docId"), "left_anti")
      case None => docsAll
    }
    val termStats = segPaths.map(p => spark.read.parquet(s"$dir/$p/termstats.parquet"))
      .reduce(_ unionByName _)
      .groupBy("field", "term").agg(sum("df").as("df"))
    val byField = epochs.groupBy(_.field)
    val fieldTokens = byField.map { case (f, es) => f -> es.map(_.fieldTokens).sum }
    val numDocs = epochs.groupBy(_.epoch).map(_._2.head.numDocs).sum
    // fast-fuzzy segments carry the precomputed correction dictionary;
    // per-(field, variant, term) df re-aggregates across segments just
    // like the term dictionary
    val symspell =
      if (!config.fastFuzzy) None
      else Some(segPaths.map(p => spark.read.parquet(s"$dir/$p/symspell.parquet"))
        .reduce(_ unionByName _)
        .groupBy("field", "variant", "term").agg(sum("df").as("df")))
    new BuiltIndex(docs, postings, termStats, numDocs, fieldTokens, config,
      deletes, symspell).persist(cacheDocs)
  }

  /** Epochs whose tombstones are committed: manifest segment epochs
    * PLUS checkpoint-row epochs — a delete-only epoch
    * (deleteByQuery) commits a tombstone dir and a checkpoint row
    * with no segment at all.
    */
  private def committedEpochs(epochs: Seq[EpochMeta], cps: Seq[CheckpointRow]): Set[Int] =
    epochs.map(_.epoch).toSet ++ cps.map(_.epoch)

  /** Epochs whose _deletes/epoch=K dirs manifest version v READS —
    * authoritative from the version's tombstones.txt. Manifests
    * written before the list existed fall back to the legacy inference
    * (every committed epoch): a superset, safe because re-applying a
    * tombstone is idempotent and loadDeletes skips absent dirs.
    */
  private def manifestTombstones(spark: SparkSession, dir: String, v: Int,
      epochs: Seq[EpochMeta], cps: Seq[CheckpointRow]): Set[Int] = {
    val p = Paths.get(manifestDir(dir, v), "tombstones.txt")
    if (!Files.exists(p)) committedEpochs(epochs, cps)
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).map(_.trim.toInt).toSet
  }

  /** Next epoch number, clearing BOTH sets: delete-only epochs exist
    * only as checkpoint rows, so numbering off EpochMeta alone would
    * collide a later append/compact with a pending delete epoch's
    * tombstone dir.
    */
  private def nextEpoch(epochs: Seq[EpochMeta], cps: Seq[CheckpointRow]): Int =
    (epochs.map(_.epoch) ++ cps.map(_.epoch)).max + 1

  /** Tombstones of committed epochs only: appendEpoch writes
    * _deletes/epoch=N before the manifest commit, so a crash in between
    * leaves an orphan tombstone dir. Applying it against the old
    * committed view would vanish upserted docs with no replacement —
    * the same 'data without a manifest entry is invisible' contract as
    * segment files.
    */
  def loadDeletes(spark: SparkSession, dir: String,
      committedEpochs: Set[Int]): Option[DataFrame] = {
    val p = Paths.get(dir, "_deletes")
    if (!Files.exists(p)) None
    else {
      val listing = Files.list(p)
      var dirs = List.empty[String]
      try {
        val sub = listing.iterator()
        while (sub.hasNext) {
          val d = sub.next()
          val name = d.getFileName.toString
          val committed = name.startsWith("epoch=") &&
            scala.util.Try(name.stripPrefix("epoch=").toInt).toOption.exists(committedEpochs)
          if (Files.isDirectory(d) && committed) dirs ::= d.toString
        }
      } finally listing.close()
      if (dirs.isEmpty) None
      else Some(dirs.map(spark.read.parquet(_)).reduce(_ unionByName _).select("docId").distinct())
    }
  }

  /** Recursively delete a directory tree, closing the walk stream (it
    * holds open directory handles — leaking one per call).
    */
  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder()).forEach(x => Files.delete(x))
      finally walk.close()
    }
  }

  /** Drop the index: delete the directory tree — the analogue of the
    * reference's bucket deletion (service.rs:78-112).
    */
  def drop(dir: String): Unit = deleteTree(Paths.get(dir))

  def lineage(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_lineage")

  def checkpoints(spark: SparkSession, dir: String): Seq[CheckpointRow] =
    readManifest(spark, dir)._3

  /** One-row health/info summary of the committed view — the engine's
    * analogue of the reference's health/info endpoints (SURVEY.md
    * section 2.11): manifest version, epoch/segment counts, live docs,
    * pending tombstones, checkpoint count.
    */
  def info(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (v, epochs, _, cps) = readManifestV(spark, dir)
    val pendingDeletes =
      loadDeletes(spark, dir, manifestTombstones(spark, dir, v, epochs, cps))
        .map(_.count()).getOrElse(0L)
    val liveDocs = epochs.groupBy(_.epoch).map(_._2.head.numDocs).sum - pendingDeletes
    Seq((v, epochs.map(_.epoch).distinct.size,
      epochs.map(_.path).distinct.size, liveDocs, pendingDeletes, cps.size))
      .toDF("manifestVersion", "epochs", "segments", "liveDocs", "pendingDeletes", "checkpoints")
  }

  /** Append one ingest epoch (INSERT-as-UPSERT by primary key,
    * apis/mod.rs:81-82): new docs get docIds above all existing ones;
    * rows whose key already exists tombstone the old docId. Idempotent
    * per snapshotId — re-running a committed snapshot is a no-op, which
    * is the resume contract (north rule: resumable from snapshot
    * checkpoints; SURVEY.md section 2.10).
    */
  def appendEpoch(newDocs: DataFrame, dir: String, snapshotId: String): Boolean = {
    val spark = newDocs.sparkSession
    // "delete:" is deleteByQuery's checkpoint namespace — an ingest id
    // inside it would collide with (or be shadowed by) a delete
    // checkpoint and silently no-op one of the two operations
    require(!snapshotId.startsWith("delete:"),
      s"snapshotId '$snapshotId' uses the reserved 'delete:' checkpoint namespace")
    val (basis, epochs, config, cps) = readManifestV(spark, dir)
    if (cps.exists(_.snapshotId == snapshotId)) return false // already committed: resume no-op
    // schema gate BEFORE any write: a mismatched batch would otherwise
    // COMMIT a segment the per-segment docs union can never read again
    // (unionByName AnalysisException on every later load — the store
    // is bricked until manual surgery). Nullability is not compared;
    // unionByName doesn't care.
    val storedDocs = spark.read.parquet(s"$dir/${epochs.map(_.path).head}/docs.parquet").schema
    val expected = storedDocs.fields.filter(_.name != "docId")
      .map(f => f.name -> f.dataType).toSet
    val got = newDocs.schema.fields.map(f => f.name -> f.dataType).toSet
    if (got != expected)
      throw new IllegalArgumentException(
        s"appendEpoch($dir): batch schema ${got.toSeq.sortBy(_._1).mkString(", ")} does not " +
        s"match the store's ${expected.toSeq.sortBy(_._1).mkString(", ")}")
    val epoch = nextEpoch(epochs, cps)
    val base = epochs.map(_.docIdEnd).max
    val idx = IndexBuilder.build(newDocs, config, base)
    val segName = f"seg-$epoch%05d"
    writeSegment(idx, s"$dir/$segName")
    writeLineage(idx, dir, epoch)
    // upsert tombstones: previous docIds whose key reappears in this
    // epoch. cacheDocs = false: this pass only streams (docId, key)
    // columns out of the committed doc store — the cacheDocs default
    // would pin the ENTIRE corpus's stored fields in executor memory on
    // every incremental append, which cannot hold at store scale
    val old = load(spark, dir, cacheDocs = false)
    val keyCols = config.keyCols
    // the epoch's key set, SLIM and materialized exactly once: Catalyst
    // pushes the left-semi join below through the store's per-segment
    // union (one join per segment branch), so an unmaterialized right
    // side is re-derived from the FULL-WIDTH epoch docs cache once per
    // segment — measured O(segments) extra full passes per append
    // (AQE doesn't reuse the exchange across the pushed-down branches)
    val newKeys = idx.docs.select(keyCols.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // explicit count-gated broadcast (a persisted plan never gets AQE's
    // runtime join conversion — CLAUDE.md): broadcasting the epoch keys
    // makes upsert detection EXCHANGE-FREE on the store side — its slim
    // (docId, key) columns stream through the pruned parquet scan and
    // never shuffle, so the per-append exchange is O(epoch), not
    // O(corpus). Above the gate (~200 MB of keys) fall back to the
    // shuffle join rather than risk the driver. The gate cardinality is
    // idx.numDocs (keys are one-per-doc by construction), so no extra
    // full-width counting pass over the epoch cache is needed.
    val rhs = if (idx.numDocs <= 2000000L) broadcast(newKeys) else newKeys
    val tombstones = old.docs.select((col("docId") +: keyCols.map(col)): _*)
      .join(rhs, keyCols, "left_semi")
      .select("docId")
    val delDir = s"$dir/_deletes/epoch=$epoch"
    tombstones.write.mode(SaveMode.Overwrite).parquet(delDir)
    // pure-insert appends (no key overlap) must not commit an EMPTY
    // tombstone dir: every later load would pay the tombstone
    // union+distinct job and install the anti-join for tombstones that
    // do not exist (deleteByQuery has the same removed==0 guard)
    val hasTombstones = spark.read.parquet(delDir).count() != 0L
    if (!hasTombstones) deleteTree(Paths.get(delDir))
    newKeys.unpersist()
    old.unpersist()
    val newEpochs = epochs ++ config.fields.map(f =>
      EpochMeta(epoch, segName, idx.numDocs, base, base + idx.numDocs, f,
        idx.fieldTokens.getOrElse(f, 0L)))
    val newCps = cps :+ CheckpointRow(epoch, snapshotId, 0L)
    val tombs = manifestTombstones(spark, dir, basis, epochs, cps).toSeq.sorted ++
      (if (hasTombstones) Seq(epoch) else Nil)
    writeManifest(spark, dir, basis + 1, newEpochs, config, newCps, tombs,
      configKv(spark, dir))
    idx.unpersist()
    true
  }

  /** Durable delete-by-query: tombstone the FULL match set of `clauses`
    * against the live store view (prior tombstones already applied by
    * load) — the session dialect's `DELETE ... WHERE fts(...)` made
    * persistent. Committed as a TOMBSTONE-ONLY epoch: the tombstone
    * file plus a checkpoint row, no segment (committedEpochs counts
    * checkpoint epochs, so loadDeletes applies it) — same
    * data-then-manifest crash ordering as appendEpoch, idempotent per
    * deleteId (re-running a committed delete is a no-op, returning -1).
    * A zero-match query commits NOTHING and does not consume the
    * deleteId, so a corrected retry under the same id still runs.
    * Matched postings are physically dropped at the next compact();
    * until then the scorer skips tombstoned docIds (P7
    * tombstones-until-merge). The match is computed distributed and
    * only slim docId longs are written — documents never cross the
    * shuffle.
    *
    * @return number of docs tombstoned, or -1 if deleteId was already
    *         committed
    */
  /** deleteByQuery checkpoint ids live in their own namespace: a bare
    * deleteId equal to an ingest snapshotId (or vice versa) must never
    * make the OTHER operation a silent resume no-op.
    */
  private def deleteCheckpointId(deleteId: String) = s"delete:$deleteId"

  def deleteByQuery(spark: SparkSession, dir: String,
      clauses: Seq[graft.query.SearchClause], deleteId: String): Long = {
    val (basis, epochs, config, cps) = readManifestV(spark, dir)
    if (cps.exists(_.snapshotId == deleteCheckpointId(deleteId))) return -1L
    val epoch = nextEpoch(epochs, cps)
    val delDir = s"$dir/_deletes/epoch=$epoch"
    val engine = new graft.query.QueryEngine(load(spark, dir, cacheDocs = false))
    try
      engine.matchF32(clauses).select("docId")
        .write.mode(SaveMode.Overwrite).parquet(delDir)
    finally engine.release()
    val removed = spark.read.parquet(delDir).count()
    if (removed == 0L) { deleteTree(Paths.get(delDir)); return 0L }
    writeManifest(spark, dir, basis + 1, epochs, config,
      cps :+ CheckpointRow(epoch, deleteCheckpointId(deleteId), 0L),
      manifestTombstones(spark, dir, basis, epochs, cps).toSeq.sorted :+ epoch,
      configKv(spark, dir))
    removed
  }

  /** Segment merge / compaction (the reference's tablet compaction+GC,
    * bucket.rs:72-74): merge all segments' posting rows per
    * (field, term, shard), drop tombstoned docIds, rewrite as one
    * segment — postings-level, no re-tokenization.
    */
  /** One posting row joined with its shard's tombstones (the dels array
    * is bounded by the shard width, never corpus-sized).
    */
  final case class CompactRow(field: String, term: String, shard: Int,
      bytes: Array[Byte], blockOffset: Array[Int], blockLast: Array[Long],
      dels: Option[Seq[Long]])

  /** @param maxSegments bounds one pass (the reference's LSM tiered
    *   framing, bucket.rs:72-74): the N smallest segments by doc count
    *   merge, the rest stay untouched, so a single compaction's
    *   footprint is set by the tier size, not the index size. Tombstones
    *   targeting docs still physically present in unmerged segments are
    *   RETAINED (rewritten under the merged epoch); tombstones absorbed
    *   by the merge disappear. Default = full compaction.
    */
  def compact(spark: SparkSession, dir: String, maxSegments: Int = Int.MaxValue): Unit = {
    // a merge needs >= 2 inputs: silently widening a smaller budget
    // (the old math.max(2, _) in the selection) would rewrite more
    // data than the caller's documented per-pass footprint bound
    require(maxSegments >= 2,
      s"compact merges at least 2 segments per pass, got maxSegments=$maxSegments")
    val (basis, epochs, config, cps) = readManifestV(spark, dir)
    val kv = configKv(spark, dir)
    val segs = epochs.groupBy(_.epoch).toSeq
      .map { case (ep, es) => (ep, es.head.path, es.head.numDocs) }
      .sortBy(_._1)
    // size-ranked selection: merging the smallest segments first retires
    // the most per-query segment overhead per byte rewritten
    val selected =
      if (maxSegments >= segs.size) segs
      else segs.sortBy(s => (s._3, s._1)).take(math.max(2, maxSegments))
    val selectedEpochs = selected.map(_._1).toSet
    val unselected = segs.filterNot(s => selectedEpochs(s._1))

    val deletes = loadDeletes(spark, dir, manifestTombstones(spark, dir, basis, epochs, cps))
    val postingsSel = selected.map(s => spark.read.parquet(s"$dir/${s._2}/postings.parquet"))
      .reduce(_ unionByName _)
    val docsSelAll = selected.map(s => spark.read.parquet(s"$dir/${s._2}/docs.parquet"))
      .reduce(_ unionByName _)
    val docsSel = deletes match {
      case Some(d) => docsSelAll.join(d, Seq("docId"), "left_anti")
      case None => docsSelAll
    }
    import org.apache.spark.sql.Encoders
    // tombstones join the merge as a per-shard sorted array column — a
    // plain shuffle join keyed on shard, so the delete set stays
    // distributed (a heavy-churn table between compactions would blow
    // a driver-collected Set / task closure)
    val delByShard = deletes match {
      case Some(d) => d
        // DIV = integral division, the one shard definition everything
        // shares ((docId / shardDocs).toInt — IndexBuilder, Scorer
        // .deletesByShard); `/` on longs is DOUBLE division, which can
        // land on the wrong shard once docIds pass double precision
        .select(expr(s"CAST(docId DIV ${config.shardDocs} AS INT)").as("shard"), col("docId"))
        .groupBy("shard").agg(sort_array(collect_list("docId")).as("dels"))
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("shard",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("dels",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))))
    }
    val merged = postingsSel
      .select("field", "term", "shard", "bytes", "blockOffset", "blockLast")
      .join(delByShard, Seq("shard"), "left")
      .as(Encoders.product[CompactRow])
      .groupByKey(p => (p.field, p.term, p.shard))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaInt))
      .flatMapGroups { (key, rows) =>
        val (field, term, shard) = key
        var deleted: Set[Long] = Set.empty
        val all = rows.flatMap { p =>
          if (deleted.isEmpty) deleted = p.dels.map(_.toSet).getOrElse(Set.empty)
          val dec = PostingCodec.decodeAll(p.bytes, p.blockOffset, p.blockLast)
          dec.docIds.indices.map(i => (dec.docIds(i), dec.tfs(i), dec.norms(i)))
        }.toArray.sortBy(_._1).filter(t => !deleted.contains(t._1))
        if (all.isEmpty) Iterator.empty
        else {
          var sumTf = 0L
          all.foreach(t => sumTf += t._2)
          val enc = PostingCodec.encode(all.map(_._1), all.map(_._2), all.map(_._3))
          Iterator.single(PostingRow(field, term, shard, all.length, sumTf,
            enc.bytes, enc.blockOffset, enc.blockLast, enc.blockMaxTf, enc.blockMinNorm))
        }
      }(Encoders.product[PostingRow])
    val mergedEpoch = nextEpoch(epochs, cps)
    val segName = f"seg-$mergedEpoch%05d"
    val parts = math.max(1, config.buildPartitions / 4)
    writePostingsParquet(merged.toDF(), parts, s"$dir/$segName/postings.parquet")
    writeDocsParquet(docsSel, parts, s"$dir/$segName/docs.parquet")
    // dictionary + stats derive from the WRITTEN postings: one merge
    // computation total instead of re-merging per aggregate
    val mergedOnDisk = spark.read.parquet(s"$dir/$segName/postings.parquet")
    writeTermstatsParquet(
      mergedOnDisk.groupBy("field", "term").agg(sum("numDocs").as("df")),
      parts, s"$dir/$segName/termstats.parquet")
    if (config.fastFuzzy)
      writeSymspellParquet(spark.read.parquet(s"$dir/$segName/termstats.parquet"),
        parts, s"$dir/$segName/symspell.parquet")
    val newFieldTokens = mergedOnDisk.groupBy("field").agg(sum("sumTf").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val liveDocs = spark.read.parquet(s"$dir/$segName/docs.parquet").count()
    // partial pass: tombstones targeting docs still physically present
    // in unmerged segments survive, rewritten under the merged epoch
    // (data before manifest — the dir is orphan until the commit below;
    // absorbed tombstones simply don't make the cut)
    val retainedTombstones = unselected.nonEmpty && deletes.nonEmpty && {
      val docsUnsel = unselected.map(s => spark.read.parquet(s"$dir/${s._2}/docs.parquet"))
        .reduce(_ unionByName _)
      val retained = deletes.get.join(docsUnsel.select("docId"), Seq("docId"), "left_semi")
        .persist()
      // only write the dir / list the epoch when rows actually survive:
      // an empty _deletes/epoch=N would make every later load pay the
      // tombstone union + anti-join for ZERO rows — the exact cost
      // appendEpoch/deleteByQuery guard against with removed == 0 checks
      val nRetained =
        try retained.count()
        catch { case t: Throwable => retained.unpersist(blocking = false); throw t }
      if (nRetained > 0)
        retained.write.mode(SaveMode.Overwrite).parquet(s"$dir/_deletes/epoch=$mergedEpoch")
      retained.unpersist(blocking = false)
      nRetained > 0
    }
    // the merged epoch keeps the id-space window of what it merged
    // (ids are never renumbered); unmerged epochs keep their rows — a
    // base of 0 would claim an id range overlapping epochs that were
    // NOT selected by a partial compaction
    val mergedDocIdEnd = epochs.filter(e => selectedEpochs(e.epoch)).map(_.docIdEnd).max
    val mergedDocIdBase = epochs.filter(e => selectedEpochs(e.epoch)).map(_.docIdBase).min
    val newEpochs = epochs.filterNot(e => selectedEpochs(e.epoch)) ++
      config.fields.map(f =>
        EpochMeta(mergedEpoch, segName, liveDocs, mergedDocIdBase, mergedDocIdEnd, f,
          newFieldTokens.getOrElse(f, 0L)))
    // the new manifest's tombstone list: pre-merge dirs are absorbed
    // (full pass) or rewritten under the merged epoch (partial pass), so
    // readers of THIS version read at most {mergedEpoch}. The physical
    // dirs are NOT deleted here — a reader pinned at an older manifest
    // version still needs them; retention-aware gc() owns deletion,
    // exactly like superseded segment dirs.
    writeManifest(spark, dir, basis + 1, newEpochs, config, cps,
      if (retainedTombstones) Seq(mergedEpoch) else Nil, kv)
  }

  /** Explicit storage GC with SNAPSHOT RETENTION: delete segment dirs,
    * tombstone dirs, and manifest-version dirs referenced by NONE of
    * the last `retention` committed manifest versions (superseded by
    * compaction, or orphaned by a crashed append before its commit).
    * Deliberately NOT part of compact(): the store is single-writer /
    * multi-reader, and a reader holding a lazy plan over pre-compaction
    * segments would lose its files mid-query — the operator picks a
    * retention covering the oldest version any live reader is pinned to
    * (`load(atVersion = vN)`), the Iceberg-snapshot-retention analogue
    * of the reference's "dead data ... reclaimed by periodic compaction
    * and GC" (lnx-fs/src/bucket.rs:72-74). retention = 1 keeps only the
    * LATEST version's files — safe exactly when no pinned reader is
    * live. _lineage dirs are retained: they are the provenance record,
    * numbered by nextEpoch over BOTH manifests and checkpoints so
    * numbers are never reused. Idempotent; returns the number of
    * directories removed.
    */
  def gc(spark: SparkSession, dir: String, retention: Int = 1): Int = {
    require(retention >= 1, s"gc retention must be >= 1, got $retention")
    val cur = currentVersion(dir)
    require(cur > 0, s"no committed manifest at $dir")
    val floor = math.max(1, cur - retention + 1)
    // union liveness over the retained manifest window: a file is live
    // if ANY version in [floor, cur] references it
    val retained = (floor to cur)
      .filter(v => Files.isDirectory(Paths.get(manifestDir(dir, v))))
      .map { v =>
        val (epochs, _, cps) = readManifestAt(spark, dir, v)
        (epochs.map(_.path).toSet, manifestTombstones(spark, dir, v, epochs, cps))
      }
    val livePaths = retained.flatMap(_._1).toSet
    val liveTombstones = retained.flatMap(_._2).toSet
    var removed = 0
    val root = Paths.get(dir)
    val listing = Files.list(root)
    try {
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if (name.startsWith("seg-") && !livePaths.contains(name) && Files.isDirectory(p)) {
          deleteTree(p); removed += 1
        }
      }
    } finally listing.close()
    val delRoot2 = root.resolve("_deletes")
    if (Files.isDirectory(delRoot2)) {
      val l2 = Files.list(delRoot2)
      try {
        val it = l2.iterator()
        while (it.hasNext) {
          val p = it.next()
          val ep = scala.util.Try(
            p.getFileName.toString.stripPrefix("epoch=").toInt).toOption
          if (Files.isDirectory(p) && ep.exists(e => !liveTombstones.contains(e))) {
            deleteTree(p); removed += 1
          }
        }
      } finally l2.close()
    }
    // expire manifest versions below the retention window (the
    // expire-snapshots half): a later load(atVersion) of an expired
    // version fails loudly in readManifestAt
    val mroot = root.resolve("_manifest")
    if (Files.isDirectory(mroot)) {
      val l3 = Files.list(mroot)
      try {
        val it = l3.iterator()
        while (it.hasNext) {
          val p = it.next()
          val v = scala.util.Try(p.getFileName.toString.stripPrefix("v").toInt).toOption
          if (Files.isDirectory(p) && p.getFileName.toString.startsWith("v") &&
              v.exists(_ < floor)) {
            deleteTree(p); removed += 1
          }
        }
      } finally l3.close()
    }
    removed
  }
}
