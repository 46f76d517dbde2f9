package graft.corpus

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Deterministic synthetic source-code corpus matching the BASELINE.json
  * input hint: (repo, path, commit, lang, content). Seeded per docId —
  * the generated table is identical at any parallelism, which the
  * docId-determinism and scaling benches rely on. Vocabulary is
  * Zipf-skewed with deliberately ultra-hot code tokens (`fn`, `return`,
  * `license`, `0`) to exercise posting-list skew/sharding, plus planted
  * rare needles and typo pairs for fuzzy/fast-fuzzy tests
  * (FIXTURES.md section 1).
  */
object CodeCorpus {

  final case class SourceFile(repo: String, path: String, commit: String, lang: String, content: String)

  private val langs = Array("rust", "scala", "python", "java", "c", "go")
  private val exts = Array("rs", "scala", "py", "java", "c", "go")

  // ~120-word vocabulary: hot keywords first (Zipf rank 0..), then
  // camelCase/snake_case identifiers, then rare tail terms.
  private val vocab: Array[String] = Array(
    "fn", "return", "license", "0", "if", "else", "let", "for", "while", "use",
    "pub", "struct", "impl", "match", "mut", "self", "new", "val", "def", "var",
    "class", "import", "public", "static", "void", "int", "string", "true", "false", "null",
    "hashMap", "binarySearch", "parseConfig", "readBuffer", "writeIndex", "mergeSegment",
    "tokenStream", "queryPlan", "scoreDoc", "postingList", "fieldNorm", "termFreq",
    "blockMax", "deltaPack", "shardKey", "checkpointEpoch", "snake_case_util", "camelCaseHelper",
    "openFile", "closeHandle", "allocBuffer", "freeMemory", "lockMutex", "spawnThread",
    "asyncAwait", "futurePoll", "errorKind", "resultOk", "optionSome", "vectorPush",
    "iteratorNext", "sliceIndex", "stringConcat", "formatPrint", "debugAssert", "testCase",
    "benchLoop", "profileScope", "traceSpan", "logWarn", "metricCount", "gaugeValue",
    "histogramBucket", "timerStart", "configLoad", "envParse", "argMatch", "cliRun",
    "serverBind", "clientConnect", "socketRead", "packetWrite", "frameDecode", "headerParse",
    "bodyStream", "chunkSplit", "compressZstd", "checksumCrc", "hashMurmur", "encodeBase",
    "decodeJson", "serializeRow", "deserializeDoc", "schemaField", "columnType", "rowGroup",
    "pageIndex", "statsMin", "statsMax", "bloomFilter", "dictEncode", "rleRun",
    "search", "sort", "merge", "filter", "reduce", "collect", "partition", "shuffle",
    "broadcast", "aggregate", "window", "join", "union", "distinct", "sample", "cache")

  /** Approximate Zipf(s=1) via inverse-power sampling; heavy head.
    *
    * A threshold-table variant (bisected against this formula,
    * bit-identical, spec-armored) was implemented this round and
    * REVERTED: once its A/B actually exercised the table (a review
    * caught the harness testing the pow fallback against itself), the
    * binary search measured ~1.8x SLOWER per draw than the JIT'd pow
    * (0.15 vs 0.08 s per 4M draws) — the generator's real cost is the
    * seeded Random stream and StringBuilder work, not the pow.
    */
  private def zipfIdx(u: Double, n: Int): Int = {
    val idx = (math.pow(n.toDouble + 1.0, u) - 1.0).toInt
    math.min(idx, n - 1)
  }

  private def hex40(id: Long): String = {
    val h1 = java.lang.Long.toHexString(id * 0x9e3779b97f4a7c15L | 1L)
    val h2 = java.lang.Long.toHexString((id + 1) * 0xc2b2ae3d27d4eb4fL | 1L)
    val h3 = java.lang.Long.toHexString((id + 2) * 0x165667b19e3779f9L | 1L)
    (h1 + h2 + h3 + "0000000000").substring(0, 40)
  }

  def genDoc(id: Long): SourceFile = {
    val rnd = new scala.util.Random(id * 2654435761L + 42L)
    val li = (id % langs.length).toInt
    val repo = f"org${id % 97}%03d/lib${(id / 97) % 50}%02d"
    val path = s"src/mod${rnd.nextInt(20)}/file_$id.${exts(li)}"
    val nTokens = 10 + rnd.nextInt(290)
    val sb = new StringBuilder(nTokens * 8)
    var i = 0
    while (i < nTokens) {
      val w = vocab(zipfIdx(rnd.nextDouble(), vocab.length))
      sb.append(w)
      sb.append(if (i % 12 == 11) ";\n" else if (i % 5 == 4) "(x_1) " else " ")
      i += 1
    }
    // planted needles: rare exact terms, typo pairs, prefix family
    if (id % 37 == 0) sb.append("binarySearchNeedle ")
    if (id % 11 == 0) sb.append("serach ") else if (id % 7 == 0) sb.append("search ")
    if (id % 13 == 0) sb.append(s"prefab${(id % 5)} ")
    // sparse beacon (gap ~2000 docs > one 128-doc posting block): a
    // rare+hot query's threshold comes from beacon docs, so block-max
    // WAND can skip the hot cursors' blocks between them
    if (id % 1997 == 0) sb.append("rareAuditBeacon ")
    SourceFile(repo, path, hex40(id), langs(li), sb.toString)
  }

  /** Distributed, deterministic generation of nDocs files. */
  def generate(spark: SparkSession, nDocs: Long, parts: Int = 32): DataFrame =
    generateRange(spark, 0L, nDocs, parts)

  /** The id-range slice [from, until) of the same corpus: genDoc is
    * keyed on the absolute id, so slices never collide on the
    * (repo, path, commit) PK — incremental-epoch benches feed
    * successive ranges as successive source snapshots.
    */
  def generateRange(spark: SparkSession, from: Long, until: Long, parts: Int = 32): DataFrame = {
    spark.range(from, until, 1L, parts)
      .map(id => genDoc(id))(Encoders.product[SourceFile])
      .toDF()
  }
}
