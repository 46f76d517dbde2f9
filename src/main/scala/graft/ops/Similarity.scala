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

  /** Strict sequential-fold cosine over two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
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

  /** IVF-style bucketed ANN (the scale path): deterministic centroids
    * (every `centroidStride`-th vector), assign each vector to its
    * nearest centroid via a broadcast argmax, probe only the query's
    * own cluster. Recall < 1 by construction; the exactness contract is
    * vs. the identically-bucketed oracle.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int = 50, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val cents = e.filter(col("vid") % centroidStride === 0)
      .select(col("vid").as("cid"), col("v").as("cv"))
    val scoredC = e.join(broadcast(cents), lit(true))
      .withColumn("cc", cosine(col("cv"), col("v")))
    val wAssign = Window.partitionBy(col("vid")).orderBy(col("cc").desc, col("cid").asc)
    val assigned = scoredC.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1).select(col("vid"), col("v"), col("cid").as("cluster"))
    val q = assigned.filter(col("vid") < nQueries)
      .select(col("vid").as("qid"), col("v").as("qv"), col("cluster"))
    val cand = assigned.join(broadcast(q), Seq("cluster"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("c", cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vid").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("vid").as("neighbor_id"), round(col("c"), 4).as("cosine"))
      .orderBy("query_id", "rank")
  }

  def ivfTopKSqlDuck(idCol: String, vecCol: String,
      centroidStride: Int = 50, nQueries: Int = 5, k: Int = 3): String =
    s"""WITH e AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vid AS cid, v AS cv FROM e WHERE vid % $centroidStride = 0),
       |sc AS (SELECT e.vid, e.v, c.cid,
       |         list_dot_product(c.cv, e.v) /
       |         (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(e.v, e.v))) AS cc
       |       FROM e CROSS JOIN cents c),
       |assigned AS (SELECT vid, v, cid AS cluster FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cc DESC, cid ASC) AS rn FROM sc)
       |  WHERE rn = 1),
       |q AS (SELECT vid AS qid, v AS qv, cluster FROM assigned WHERE vid < $nQueries),
       |cand AS (SELECT q.qid, a.vid,
       |           list_dot_product(q.qv, a.v) /
       |           (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))) AS c
       |         FROM q JOIN assigned a USING (cluster) WHERE a.vid <> q.qid),
       |r AS (SELECT qid, vid, c,
       |        row_number() OVER (PARTITION BY qid ORDER BY c DESC, vid ASC) AS rank FROM cand)
       |SELECT qid AS query_id, rank::BIGINT AS rank, vid AS neighbor_id,
       |       round(c, 4) AS cosine
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs, IVF-bucketed: only pairs
    * inside one cluster are compared (the quadratic step is bounded per
    * cluster), threshold on cosine.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int = 50, threshold: Double = 0.45): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
    val cents = e.filter(col("vid") % centroidStride === 0)
      .select(col("vid").as("cid"), col("v").as("cv"))
    val scoredC = e.join(broadcast(cents), lit(true))
      .withColumn("cc", cosine(col("cv"), col("v")))
    val wAssign = Window.partitionBy(col("vid")).orderBy(col("cc").desc, col("cid").asc)
    val assigned = scoredC.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1).select(col("vid"), col("v"), col("cid").as("cluster"))
    val a = assigned.select(col("cluster"), col("vid").as("a"), col("v").as("va"))
    val b = assigned.select(col("cluster"), col("vid").as("b"), col("v").as("vb"))
    a.join(b, "cluster").filter(col("a") < col("b"))
      .withColumn("c", cosine(col("va"), col("vb")))
      .filter(col("c") >= threshold)
      .select(col("a"), col("b"), round(col("c"), 4).as("cosine"))
      .orderBy("a", "b")
  }

  def cosineDupPairsSqlDuck(idCol: String, vecCol: String,
      centroidStride: Int = 50, threshold: Double = 0.45): String =
    s"""WITH e AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM embeddings),
       |cents AS (SELECT vid AS cid, v AS cv FROM e WHERE vid % $centroidStride = 0),
       |sc AS (SELECT e.vid, e.v, c.cid,
       |         list_dot_product(c.cv, e.v) /
       |         (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(e.v, e.v))) AS cc
       |       FROM e CROSS JOIN cents c),
       |assigned AS (SELECT vid, v, cid AS cluster FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cc DESC, cid ASC) AS rn FROM sc)
       |  WHERE rn = 1),
       |p AS (SELECT x.vid AS a, y.vid AS b,
       |        list_dot_product(x.v, y.v) /
       |        (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS c
       |      FROM assigned x JOIN assigned y USING (cluster) WHERE x.vid < y.vid)
       |SELECT a, b, round(c, 4) AS cosine FROM p WHERE c >= $threshold ORDER BY a, b""".stripMargin
}
