package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  * Cosine is computed in double with strict left-to-right summation in
  * both engines (Spark `aggregate` fold vs DuckDB list_dot_product), so
  * the oracle values agree bit-for-bit before round(4).
  */
object Similarity {

  /** Strict sequential-fold cosine over two array<double> columns —
    * a native one-pass codegen'd expression (`functions.CosineSim`);
    * the HOF formulation below is retained only as the parity
    * reference (VectorOpsSpec asserts bit-identical results).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineSim(a, b)

  /** The original higher-order-function cosine: allocates a zipped
    * array and interprets two lambdas per element, which dominated the
    * N x K IVF assignment leg at 200k vectors. Kept as the spec's
    * independent reference implementation.
    */
  private[graft] def hofCosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force exact cosine top-k for a small query set — the ANN
    * baseline. Scale shape: queries broadcast against the corpus, one
    * shuffle keyed by query for the per-query top-k window.
    */
  def bruteTopK(emb: DataFrame, idCol: String, vecCol: String,
      nQueries: Int = 5, k: Int = 5): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val q = e.filter(col("vid") < nQueries)
      .select(col("vid").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("c", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("vid").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  def bruteTopKSqlDuck(idCol: String, vecCol: String, nQueries: Int = 5, k: Int = 5): String =
    s"""WITH e AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vid AS qid, v AS qv FROM e WHERE vid < $nQueries),
       |s AS (SELECT q.qid, e.vid,
       |        list_dot_product(q.qv, e.v) /
       |        (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS c
       |      FROM q JOIN e ON e.vid <> q.qid),
       |r AS (SELECT qid, vid, c,
       |        row_number() OVER (PARTITION BY qid ORDER BY c DESC, vid ASC) AS rank FROM s)
       |SELECT qid AS query_id, rank::BIGINT AS rank, vid AS neighbor_id,
       |       round(c, 4) AS cosine
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Deterministic fixed-size centroid sample: rank every vector by a
    * Lehmer-style multiplicative hash of its id and keep the first
    * `numCentroids` — a pseudo-random sample whose SIZE is independent
    * of N (the previous every-Nth-vector scheme grew linearly with the
    * corpus, making assignment O(N^2 / stride) at 100 TB). Exact
    * integer arithmetic, so the DuckDB oracle computes the identical
    * sample. vid * 48271 stays below 2^63 for vid < 1.9e14.
    */
  private def centroidHash(vid: Column): Column =
    pmod(vid * lit(48271L), lit(2147483647L))

  // mirror Spark's pmod, not plain %: they agree only for non-negative
  // ids (DuckDB % keeps the dividend's sign), and vid is caller data
  private def centroidHashDuck(vid: String): String =
    s"((($vid * 48271) % 2147483647 + 2147483647) % 2147483647)"

  /** Auto centroid count K = max(8, ceil(sqrt(N))): the r03-flagged
    * fixed K=8 made per-query candidate sets O(N/8) — linear in the
    * corpus; K ~ sqrt(N) keeps them O(nProbe x sqrt(N)). Deterministic
    * from the corpus count alone, so the DuckDB oracle derives the
    * identical K with a scalar subquery.
    */
  private def autoCentroids(n: Long): Int =
    math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Deterministic hash-ranked centroid frame (cid, cv). */
  private def centroidFrame(e: DataFrame, kCent: Int): DataFrame =
    e.withColumn("hk", centroidHash(col("vid")))
      .orderBy(col("hk").asc, col("vid").asc).limit(kCent)
      .select(col("vid").as("cid"), col("v").as("cv"))

  /** Nearest-centroid assignment (vid, v, cluster) as a map-side
    * max_by aggregate: the broadcast join still evaluates the required
    * N x K cosines, but the per-vid argmax collapses in the PARTIAL
    * aggregate (rows for one vid are generated inside one partition),
    * so no N x K exchange ever materializes. The previous window-based
    * argmax (partitionBy(vid) + row_number) shuffled all N x K rows
    * with BOTH vectors attached (~1 KB each) — with K = sqrt(N) that
    * is a terabyte-class exchange at 1M x dim64, dead on arrival.
    * Tie-break (max cc, then min cid, via the (cc, -cid) struct order)
    * equals the oracle's ORDER BY cc DESC, cid ASC exactly.
    */
  private def assignClusters(e: DataFrame, cents: DataFrame): DataFrame = {
    // SLIM N x K argmax: the vector is projected AWAY before the
    // aggregate. Any vector-carrying argmax has a var-length agg
    // buffer, which disqualifies the UnsafeRow hash aggregate —
    // max_by/any_value are ObjectHashAggregate (sort fallback after
    // 128 keys per task) and max(struct(.., v)) plans SortAggregate —
    // so all N x K VECTOR-WIDE rows get sorted (measured 37-78 GB
    // spill on the 200k x 448 assignment). The slim (vid, cid, cc)
    // argmax is a codegen'd HashAggregate whose partial collapses
    // map-side (fixed-width (double, long) buffer, ~24 B rows), and
    // the vector joins back ONCE — a linear vid-keyed exchange of N
    // rows, nothing scaling with K. Tie-break (max cc, then min cid
    // via negCid) equals the oracle's ORDER BY cc DESC, cid ASC.
    val best = e.join(broadcast(cents), lit(true))
      .select(col("vid"), col("cid"), cosine(col("cv"), col("v")).as("cc"))
      .groupBy("vid")
      .agg(max(struct(col("cc"), (col("cid") * lit(-1L)).as("negCid"))).as("m"))
      .select(col("vid"), (col("m.negCid") * lit(-1L)).as("cluster"))
    e.join(best, "vid").select(col("vid"), col("v"), col("cluster"))
  }

  /** (qid, qv, vid, v, cluster) candidate frame shared by ivfTopK and
    * the candidate-count observability leg: deterministic hash-ranked
    * centroids, map-side argmax assignment, queries probing their
    * nProbe nearest clusters (the query-side ranking IS a window, but
    * over nQueries x K rows — constant-sized).
    */
  private def ivfCandidates(e: DataFrame, kCent: Int, nProbe: Int, nQueries: Int): DataFrame = {
    val cents = centroidFrame(e, kCent)
    val assigned = assignClusters(e, cents)
    val qScored = e.filter(col("vid") < nQueries)
      .join(broadcast(cents), lit(true))
      .withColumn("cc", cosine(col("cv"), col("v")))
    val wq = Window.partitionBy(col("vid")).orderBy(col("cc").desc, col("cid").asc)
    // vectors stay single-assigned, so probe sets never duplicate a candidate
    val qProbe = qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("vid").as("qid"), col("v").as("qv"), col("cid").as("cluster"))
    assigned.join(broadcast(qProbe), Seq("cluster"))
      .filter(col("vid") =!= col("qid"))
  }

  /** IVF-bucketed ANN (the scale path): deterministic hash-ranked
    * centroids (K = sqrt(N) by default, see autoCentroids), each vector
    * assigned to its nearest centroid via a broadcast argmax (K rows),
    * queries probe their `nProbe` nearest clusters. Recall < 1 by
    * construction; the exactness contract is vs. the identically-
    * bucketed oracle. numCentroids <= 0 selects the auto-K.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 0, nProbe: Int = 2, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val kCent = if (numCentroids > 0) numCentroids else autoCentroids(e.count())
    val cand = ivfCandidates(e, kCent, nProbe, nQueries)
      .withColumn("c", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("vid").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Build-time IVF index artifact (the fast-fuzzy persisted-dictionary
    * pattern applied to ANN): centroids + nearest-centroid assignments
    * written once, assignments RANGE-PARTITIONED AND SORTED BY CLUSTER
    * so a query-time probe is a pushed-down parquet read of the probed
    * clusters' row groups only. ivfTopK recomputes centroids and
    * re-runs the N x K assignment on EVERY call — a serving workload
    * paid a corpus scan per query batch (r04 verdict); against this
    * artifact the repeated-query cost is probe-sized. Returns the
    * centroid count K (auto = max(8, ceil(sqrt(N))) when
    * numCentroids <= 0).
    */
  def buildIvfIndex(emb: DataFrame, idCol: String, vecCol: String, dir: String,
      numCentroids: Int = 0, parts: Int = 8): Int = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val kCent = if (numCentroids > 0) numCentroids else autoCentroids(e.count())
    centroidFrame(e, kCent).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    // assignment runs against the WRITTEN centroids (one source of
    // truth; doubles roundtrip parquet exactly, so assignment equals
    // the in-memory path bit-for-bit)
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
    assignClusters(e, cents)
      .repartitionByRange(math.max(1, parts), col("cluster"))
      .sortWithinPartitions("cluster")
      .write.mode("overwrite").parquet(s"$dir/assignments.parquet")
    kCent
  }

  /** Query the persisted IVF index with an arbitrary (qid, qv) frame:
    * probe selection against the tiny broadcast centroid file, then a
    * LITERAL pushed-down cluster filter on the assignment store — the
    * probed cluster ids are collected driver-side (<= queries x nProbe
    * longs) precisely so the filter reaches the parquet scan and prunes
    * to the probed clusters' row groups; a join alone would scan the
    * full corpus-sized assignment store per call.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, nProbe: Int = 2, k: Int = 3): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids.parquet")
    val qScored = queries.select(col("qid"), col("qv"))
      .join(broadcast(cents), lit(true))
      .withColumn("cc", cosine(col("cv"), col("qv")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cc").desc, col("cid").asc)
    val qProbe = qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cid").as("cluster"))
    val probed = qProbe.select("cluster").distinct().collect().map(_.getLong(0))
    if (probed.isEmpty) return spark.emptyDataFrame
      .withColumn("query_id", lit(0L)).withColumn("rank", lit(0L))
      .withColumn("neighbor_id", lit(0L)).withColumn("cosine", lit(0.0d)).limit(0)
    val cand = spark.read.parquet(s"$dir/assignments.parquet")
      .filter(col("cluster").isin(probed: _*))
      .join(broadcast(qProbe), Seq("cluster"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("c", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("vid").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** ivfTopK's exact query set (stored vectors with vid < nQueries) run
    * against the PERSISTED index — output identical to ivfTopK over the
    * same corpus, so the q19 oracle gates this path too (q56).
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      nProbe: Int = 2, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val q = spark.read.parquet(s"$dir/assignments.parquet")
      .filter(col("vid") < nQueries)
      .select(col("vid").as("qid"), col("v").as("qv"))
    ivfTopKFromIndex(spark, dir, q, nProbe, k)
  }

  /** Per-query candidate-set sizes for the IVF path — the scale
    * observability leg (candidates must grow ~sqrt(N), not N).
    */
  def ivfCandidateCounts(emb: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 0, nProbe: Int = 2, nQueries: Int = 5): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val kCent = if (numCentroids > 0) numCentroids else autoCentroids(e.count())
    // left-join against the full query-id set: a query whose probed
    // clusters hold only itself has ZERO candidates, and dropping it
    // (groupBy emits no row) would overstate the avg/max growth this
    // leg exists to measure
    val qids = e.select(col("vid").as("qid")).filter(col("qid") < nQueries)
    val counts = ivfCandidates(e, kCent, nProbe, nQueries)
      .groupBy("qid").agg(count(lit(1)).as("candidates"))
    qids.join(counts, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("candidates"), lit(0L)).as("candidates"))
      .withColumn("num_centroids", lit(kCent.toLong))
      .orderBy("qid")
  }

  def ivfTopKSqlDuck(idCol: String, vecCol: String,
      numCentroids: Int = 0, nProbe: Int = 2, nQueries: Int = 5, k: Int = 3): String = {
    val kExpr =
      if (numCentroids > 0) numCentroids.toString
      else "(SELECT greatest(8, ceil(sqrt(count(*)))::BIGINT) FROM e)"
    s"""WITH e AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vid AS cid, v AS cv FROM
       |            (SELECT vid, v, row_number() OVER
       |               (ORDER BY ${centroidHashDuck("vid")} ASC, vid ASC) AS crn FROM e)
       |          WHERE crn <= $kExpr),
       |sc AS (SELECT e.vid, e.v, c.cid,
       |         list_dot_product(c.cv, e.v) /
       |         (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(e.v, e.v))) AS cc
       |       FROM e CROSS JOIN cents c),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cc DESC, cid ASC) AS rn
       |           FROM sc),
       |assigned AS (SELECT vid, v, cid AS cluster FROM ranked WHERE rn = 1),
       |q AS (SELECT vid AS qid, v AS qv, cid AS cluster FROM ranked
       |      WHERE vid < $nQueries AND rn <= $nProbe),
       |cand AS (SELECT q.qid, a.vid,
       |           list_dot_product(q.qv, a.v) /
       |           (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))) AS c
       |         FROM q JOIN assigned a USING (cluster) WHERE a.vid <> q.qid),
       |r AS (SELECT qid, vid, c,
       |        row_number() OVER (PARTITION BY qid ORDER BY c DESC, vid ASC) AS rank FROM cand)
       |SELECT qid AS query_id, rank::BIGINT AS rank, vid AS neighbor_id,
       |       round(c, 4) AS cosine
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs, IVF-bucketed with fixed-K
    * centroids, quadratic blow-up BOUNDED: clusters larger than
    * `maxBlock` are deterministically hash-split into ceil(size/maxBlock)
    * sub-blocks and pairs are compared only within one (cluster, block) —
    * so the per-task pair count is <= maxBlock^2 regardless of corpus
    * size (the previous within-whole-cluster join was quadratic in N/K).
    * Pairs straddling sub-blocks are missed — the standard recall cost of
    * bounded blocking; `lshCosineDupPairs` is the recall-tuned 100 TB
    * alternative. maxBlock=64 splits every sf0.01 cluster (sizes 48-70)
    * into 2 blocks, so the oracle genuinely exercises the split path.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 8, threshold: Double = 0.45, maxBlock: Int = 64): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val assigned = assignClusters(e, centroidFrame(e, numCentroids))
    // cluster sizes via a map-side partial count + broadcast join back,
    // NOT count().over(Window.partitionBy(cluster)): the window would
    // shuffle every row WITH its full embedding vector into at most
    // numCentroids partitions — a parallelism collapse at corpus scale.
    // The size frame is <= numCentroids rows (statically known), so the
    // broadcast decision needs no runtime count gate.
    val csizes = assigned.groupBy("cluster").agg(count(lit(1)).as("csize"))
    val sized = assigned.join(
      if (numCentroids <= 4000000) broadcast(csizes) else csizes, "cluster")
    // exact integer arithmetic end-to-end (div, pmod) so the DuckDB
    // oracle derives the identical block assignment
    val blocked = sized
      .withColumn("sub", OpsSql.subSplit(centroidHash(col("vid")), "csize", maxBlock))
    val a = blocked.select(col("cluster"), col("sub"), col("vid").as("a"), col("v").as("va"))
    val b = blocked.select(col("cluster"), col("sub"), col("vid").as("b"), col("v").as("vb"))
    a.join(b, Seq("cluster", "sub")).filter(col("a") < col("b"))
      .withColumn("c", cosine(col("va"), col("vb")))
      .filter(col("c") >= threshold)
      .select(col("a"), col("b"), round(col("c"), 4).as("cosine"))
      .orderBy("a", "b")
  }

  def cosineDupPairsSqlDuck(idCol: String, vecCol: String,
      numCentroids: Int = 8, threshold: Double = 0.45, maxBlock: Int = 64): String =
    s"""WITH e AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vid AS cid, v AS cv FROM e
       |          ORDER BY ${centroidHashDuck("vid")} ASC, vid ASC LIMIT $numCentroids),
       |sc AS (SELECT e.vid, e.v, c.cid,
       |         list_dot_product(c.cv, e.v) /
       |         (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(e.v, e.v))) AS cc
       |       FROM e CROSS JOIN cents c),
       |assigned AS (SELECT vid, v, cid AS cluster FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cc DESC, cid ASC) AS rn FROM sc)
       |  WHERE rn = 1),
       |sized AS (SELECT *, count(*) OVER (PARTITION BY cluster) AS csize FROM assigned),
       |blk AS (SELECT vid, v, cluster,
       |          ${OpsSql.subSplitDuck(centroidHashDuck("vid"), "csize", maxBlock)} AS sub
       |        FROM sized),
       |p AS (SELECT x.vid AS a, y.vid AS b,
       |        list_dot_product(x.v, y.v) /
       |        (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS c
       |      FROM blk x JOIN blk y USING (cluster, sub) WHERE x.vid < y.vid)
       |SELECT a, b, round(c, 4) AS cosine FROM p WHERE c >= $threshold ORDER BY a, b""".stripMargin

  /** Deterministic pseudo-random hyperplane sign for (plane, dim):
    * +1/-1 from exact integer arithmetic so Spark and DuckDB draw the
    * identical hyperplanes. Wang-style 32-bit mix of p*1000003 + i —
    * see VectorOps.hyperplaneSig for why a real mix is load-bearing
    * (the single-LCG `% 2` draw it replaces made all planes collinear
    * and collapsed the signature space to 2 values).
    */
  private def hyperplaneSign(p: Int, i: Column): Column = {
    val h0 = pmod((lit(p.toLong * 1000003L) + i) * lit(2654435761L), lit(4294967296L))
    val h1 = h0.bitwiseXOR(shiftright(h0, 16))
    val h2 = pmod(h1 * lit(40503L), lit(4294967296L))
    val h3 = h2.bitwiseXOR(shiftright(h2, 13))
    when(h3 % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))
  }

  /** Random-hyperplane LSH signature (SimHash over embeddings): bit p =
    * sign of the dot product with pseudo-random +-1 hyperplane p. Strict
    * left-to-right fold in both engines, so near-zero dots resolve the
    * same bit. Native one-pass expression (`functions.HyperplaneSig`);
    * the HOF form below is the spec's parity reference.
    */
  def lshSignature(v: Column, nBits: Int): Column =
    graft.functions.VectorOps.hyperplaneSigCol(v, nBits)

  /** Original HOF signature: nBits separate zip_with/aggregate passes
    * per row. Kept for VectorOpsSpec parity assertions only.
    */
  private[graft] def hofLshSignature(v: Column, nBits: Int): Column = {
    val idx = sequence(lit(0L), size(v).cast("long") - 1L)
    val bits = (0 until nBits).map { p =>
      val dot = aggregate(
        zip_with(v, idx, (x, i) => x * hyperplaneSign(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0.0d, lit(1L << p)).otherwise(lit(0L))
    }
    // empty-vector guard: sequence(0, -1) is DESCENDING, not empty, and
    // the DuckDB mirror's list_reduce errors on empty lists — both
    // engines pin the signature to 0 instead
    when(size(v) === 0, lit(0L)).otherwise(bits.reduce(_ + _))
  }

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH —
    * the 100 TB path. Defaults: 56-bit signatures in 7 bands of 8 bits
    * (56 keeps the sig strictly positive — bit 63 would flip the sign
    * in BOTH engines' shift arithmetic), maxBucket 256 (<= 32k verify
    * pairs per task). Band math at the corpus's ~0.89 intra-cluster
    * cosine (per-bit agreement p ~ 1 - angle/pi = 0.85): one 8-bit band
    * collides at p^8 = 27%, seven bands give 1-(1-0.27)^7 = 89% banding
    * recall; two bands (the old nBits=16) gave 47%. Measured on the
    * OpsBench corpus at 20k: bounded/unbounded pair recall 99%+ with
    * these defaults vs 59% at nBits=16/maxBucket=64.
    *
    * Two properties make it scale:
    *
    *  1. **Bounded buckets.** 2^bandBits buckets per band only bounds
    *     bucket size for uniformly-distributed signatures; clustered
    *     corpora (the realistic case) pile a whole cluster into one
    *     bucket, and bucket size — hence the quadratic verify term —
    *     grows linearly with the corpus (measured: 50k clustered
    *     vectors → ~10M candidate pairs at bandBits=8). Buckets larger
    *     than `maxBucket` are therefore deterministically hash-split so
    *     per-task pair count is <= maxBucket^2; total candidates are
    *     O(N x maxBucket x nBands), linear in N. Pairs straddling
    *     sub-splits of one band can still match in another band — the
    *     multi-band OR-construction is what keeps recall — which is
    *     only true because the split hash is salted per band
    *     (OpsSql.saltedHash60); unsalted splits correlate across bands
    *     for identical vectors and fail all-or-nothing.
    *  2. **Slim candidates.** Pairs dedup as bare (a, b) ids BEFORE the
    *     vectors join back; carrying two full embedding vectors per
    *     candidate through the exchange+dedup multiplies the shuffle by
    *     the vector width (~16x at dim=64) for no information.
    */
  /** Shared LSH banding pipeline: (vid, band, key, sub) with bounded,
    * per-band-salted sub-buckets. `e` must be (vid, v: array<double>).
    */
  private def lshBanded(e: DataFrame, nBits: Int, bandBits: Int, maxBucket: Int,
      carryV: Boolean = false): DataFrame = {
    val nBands = nBits / bandBits
    // fail loud on nBands = 0: sequence(0, -1) is DESCENDING in Spark
    // (CLAUDE.md trap), so band -1 would shiftright by a negative
    // amount (Java masks it to shift-by-48) and emit garbage keys,
    // while the DuckDB twin's range(0, 0) is empty — silent divergence
    require(bandBits >= 1 && bandBits <= nBits,
      s"bandBits must be in [1, nBits=$nBits], got $bandBits (nBands would be $nBands)")
    // carryV: the vector rides through the banding (nBands copies, a
    // LINEAR blow-up) so in-bucket verifiers need no wide join-back
    val sigs = e.withColumn("sig", lshSignature(col("v"), nBits))
      .select(Seq(col("vid"), col("sig")) ++ (if (carryV) Seq(col("v")) else Nil): _*)
    val mask = (1L << bandBits) - 1
    val keyed = sigs.withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("key", expr(s"shiftright(sig, band * $bandBits) & $mask"))
    // bucket sizes via map-side partial count + broadcast join back,
    // NOT a (band, key) window: the window shuffles the whole banded
    // corpus into <= nBands * 2^bandBits partitions, and a clustered
    // corpus piles into a handful of them (straggler tasks). The size
    // frame is bounded by nBands * 2^bandBits rows — statically known,
    // so the broadcast gate needs no runtime count job.
    val bsizes = keyed.groupBy("band", "key").agg(count(lit(1)).as("bsize"))
    // split hash salted per band (OpsSql.saltedHash60): identical
    // vectors share every band key, so an unsalted split correlates
    // across bands and voids the multi-band recall protection
    keyed.join(
      if ((nBands.toLong << bandBits) <= 4000000L) broadcast(bsizes) else bsizes,
      Seq("band", "key"))
      .withColumn("sub",
        OpsSql.subSplit(OpsSql.saltedHash60(col("vid"), col("band")), "bsize", maxBucket))
      .select((Seq("vid", "band", "key", "sub") ++
        (if (carryV) Seq("v") else Nil)).map(col): _*)
  }

  def lshCosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 56, bandBits: Int = 8, threshold: Double = 0.45,
      maxBucket: Int = 256): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    // vectors ride INTO the bucket join (carryV: a LINEAR nBands x N
    // wide exchange) so the cosine verify runs inside the bucket task
    // and only slim verified (a, b, cosine) rows ever exchange again.
    // The previous shape deduped slim candidate ids FIRST and joined
    // both vectors back per candidate — the candidate set is
    // O(N x maxBucket x nBands), so that join-back exchanged
    // candidate x vector-width WIDE rows and spilled 153 GB at 200k
    // vectors (BENCH.md r4). Cosine is a deterministic function of the
    // two vectors, so evaluating it per band-collision BEFORE the
    // global distinct is bit-identical output; the extra per-collision
    // cosine CPU is orders of magnitude cheaper than the wide exchange.
    // (Deliberately NOT persisted: the a/b sides canonicalize to the
    // same exchange, which Spark reuses — CLAUDE.md persist/AQE trap.)
    val banded = lshBanded(e, nBits, bandBits, maxBucket, carryV = true)
    val a = banded.select(col("vid").as("a"), col("v").as("va"),
      col("band"), col("key"), col("sub"))
    val b = banded.select(col("vid").as("b"), col("v").as("vb"),
      col("band"), col("key"), col("sub"))
    a.join(b, Seq("band", "key", "sub")).filter(col("a") < col("b"))
      .withColumn("c", cosine(col("va"), col("vb")))
      .filter(col("c") >= threshold)
      .select(col("a"), col("b"), round(col("c"), 4).as("cosine"))
      .distinct()
      .orderBy("a", "b")
  }

  /** Scalable near-duplicate REPRESENTATIVE assignment — the output-
    * bounded 100 TB dedup primitive. `lshCosineDupPairs` enumerates all
    * near-dup PAIRS, which is inherently quadratic in group size (a
    * 195-member near-identical cluster emits ~19k pairs; measured 7.65M
    * pairs over the 200k OpsBench corpus — the OUTPUT is the quadratic
    * term, no blocking can fix that). A curation pipeline doesn't need
    * the pairs: it needs one canonical representative per group. Here
    * every sub-bucket elects rep = min(vid); each member is cosine-
    * verified against its <= nBands bucket reps (O(N x nBands) verify
    * work, zero quadratic term anywhere) and assigned the smallest
    * verified rep, or itself if none. rep <= id always (the rep IS the
    * bucket minimum), so `keep rows where rep = id` is the dedup
    * filter. One LSH pass — rep chains (a rep that is itself a dup of
    * a smaller rep) resolve by iterating the operator; groups whose
    * members share buckets (the common case) collapse in one pass.
    */
  def lshCosineDedup(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 56, bandBits: Int = 8, threshold: Double = 0.45,
      maxBucket: Int = 256): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val banded = lshBanded(e, nBits, bandBits, maxBucket)
    val reps = banded.groupBy("band", "key", "sub").agg(min(col("vid")).as("rep"))
    // slim (vid, rep) edges dedup BEFORE the vector join-back, exactly
    // like the pairs op's candidate dedup
    val edges = banded.join(reps, Seq("band", "key", "sub"))
      .filter(col("vid") =!= col("rep"))
      .select("vid", "rep").distinct()
    val verified = edges
      .join(e.select(col("vid"), col("v").as("va")), "vid")
      .join(e.select(col("vid").as("rep"), col("v").as("vb")), "rep")
      .withColumn("c", cosine(col("va"), col("vb")))
      .filter(col("c") >= threshold)
      .groupBy("vid").agg(min(col("rep")).as("rep"))
    // output is UNORDERED (one row per input vector): composing callers
    // (resolveReps) re-shuffle by rep immediately, so a global sort here
    // would be a wasted corpus-wide range exchange; terminal / oracle-
    // facing consumers order explicitly.
    e.select("vid").join(verified, Seq("vid"), "left_outer")
      .select(col("vid").as("id"), coalesce(col("rep"), col("vid")).as("rep"))
  }

  /** CTE chain (banded ... assign) shared by the dedup twin and its
    * transitive-closure variant: `assign` is the one-pass (id, rep)
    * representative assignment.
    */
  private def lshDedupAssignDuck(idCol: String, vecCol: String,
      nBits: Int, bandBits: Int, threshold: Double, maxBucket: Int): String =
    s"""${lshBandedDuck(idCol, vecCol, nBits, bandBits, maxBucket)},
       |reps AS (SELECT band, key, sub, min(vid) AS rep FROM banded GROUP BY 1, 2, 3),
       |edges AS (SELECT DISTINCT b.vid, r.rep
       |          FROM banded b JOIN reps r USING (band, key, sub) WHERE b.vid <> r.rep),
       |ver AS (SELECT g.vid, min(g.rep) AS rep
       |        FROM edges g JOIN e x ON g.vid = x.vid JOIN e y ON g.rep = y.vid
       |        WHERE list_dot_product(x.v, y.v) /
       |              (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
       |              >= $threshold
       |        GROUP BY 1),
       |assign AS (SELECT e.vid AS id, coalesce(ver.rep, e.vid) AS rep
       |           FROM e LEFT JOIN ver ON e.vid = ver.vid)""".stripMargin

  def lshCosineDedupSqlDuck(idCol: String, vecCol: String,
      nBits: Int = 56, bandBits: Int = 8, threshold: Double = 0.45,
      maxBucket: Int = 256): String =
    s"""WITH ${lshDedupAssignDuck(idCol, vecCol, nBits, bandBits, threshold, maxBucket)}
       |SELECT id, rep FROM assign ORDER BY id""".stripMargin

  /** Oracle twin of Dedup.resolveReps ∘ lshCosineDedup: follow rep
    * pointers with a recursive CTE until they stop moving. rep strictly
    * decreases along a chain (each rep is a bucket MINIMUM), so the walk
    * terminates and the chain root is min(rep) over the walk.
    */
  def lshCosineDedupResolvedSqlDuck(idCol: String, vecCol: String,
      nBits: Int = 56, bandBits: Int = 8, threshold: Double = 0.45,
      maxBucket: Int = 256): String =
    s"""WITH RECURSIVE ${lshDedupAssignDuck(idCol, vecCol, nBits, bandBits, threshold, maxBucket)},
       |walk(id, rep) AS (
       |  SELECT id, rep FROM assign
       |  UNION ALL
       |  SELECT w.id, a.rep FROM walk w JOIN assign a ON w.rep = a.id
       |  WHERE a.rep <> w.rep)
       |SELECT id, min(rep) AS rep FROM walk GROUP BY id ORDER BY id""".stripMargin

  /** Shared CTE prefix (e, sig, banded0, banded) of the two LSH twins —
    * the DuckDB mirror of `lshBanded`.
    */
  private def lshBandedDuck(idCol: String, vecCol: String,
      nBits: Int, bandBits: Int, maxBucket: Int): String = {
    val nBands = nBits / bandBits
    val mask = (1L << bandBits) - 1
    // the Wang-mix draw (see hyperplaneSign): xor() has no SQL-lambda
    // let-binding, so the mixed-state subexpressions repeat textually —
    // oracle-side cost only
    def mixDuck(p: Int): String = {
      val h0 = s"((($p*1000003 + (i-1)) * 2654435761) % 4294967296)"
      val h1 = s"xor($h0, $h0 >> 16)"
      val h2 = s"(($h1 * 40503) % 4294967296)"
      s"xor($h2, $h2 >> 13)"
    }
    val bitTerms = (0 until nBits).map { p =>
      s"""(CASE WHEN list_reduce(list_transform(range(1, len(v)+1), i -> v[i] *
         |  (CASE WHEN (${mixDuck(p)}) % 2 = 0
         |   THEN 1.0 ELSE -1.0 END)), (acc, x) -> acc + x) > 0
         | THEN (1::BIGINT << $p) ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""e AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM embeddings),
       |sig AS (SELECT vid, v,
       |          (CASE WHEN len(v) = 0 THEN 0 ELSE ($bitTerms) END)::BIGINT AS sig FROM e),
       |banded0 AS (SELECT vid, sig, i AS band, (sig >> (i * $bandBits)) & $mask AS key
       |            FROM sig, range(0, $nBands) r(i)),
       |banded AS (SELECT vid, band, key,
       |             ${OpsSql.subSplitDuck(OpsSql.saltedHash60Duck("vid", "band"),
                       s"count(*) OVER (PARTITION BY band, key)", maxBucket)} AS sub
       |           FROM banded0)""".stripMargin
  }

  def lshCosineDupPairsSqlDuck(idCol: String, vecCol: String,
      nBits: Int = 56, bandBits: Int = 8, threshold: Double = 0.45,
      maxBucket: Int = 256): String =
    s"""WITH ${lshBandedDuck(idCol, vecCol, nBits, bandBits, maxBucket)},
       |cand AS (SELECT DISTINCT a.vid AS a, b.vid AS b
       |         FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
       |              AND a.sub = b.sub AND a.vid < b.vid),
       |p AS (SELECT a, b,
       |        list_dot_product(x.v, y.v) /
       |        (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS c
       |      FROM cand JOIN e x ON cand.a = x.vid JOIN e y ON cand.b = y.vid)
       |SELECT a, b, round(c, 4) AS cosine FROM p WHERE c >= $threshold ORDER BY a, b""".stripMargin
}
