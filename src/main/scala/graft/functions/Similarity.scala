package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`):
  * brute-force cosine top-k as the exact baseline, and an IVF-bucketed
  * variant as the scale path (cost ∝ nProbe/nCentroids of brute force).
  * The inner product is the codegen'd [[VectorDot]] expression (double
  * accumulation in index order — bit-identical to a sequential fold); norms
  * are computed once per vector, never per pair.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column = VectorDot(a, b)

  def norm(a: Column): Column = sqrt(VectorDot(a, a))

  def cosine(a: Column, b: Column): Column = VectorDot(a, b) / (norm(a) * norm(b))

  /** id, vec, nrm — precomputed once before any pairwise stage. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      norm(col(vecCol)).as(s"${vecAs}_nrm"))

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, rank per query. Deterministic tiebreak on corpus id.
    * `excludeSelf` (default true) is for the self-search case where queries
    * share the corpus id space — set false when the two tables are unrelated
    * (a coincidental id match would silently drop a true neighbor).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "query_id", "qv")
    val c = withNorm(corpus, idCol, vecCol, "corpus_id", "cv")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    val joinCond = if (excludeSelf) col("query_id") =!= col("corpus_id") else lit(true)
    c.join(broadcast(q), joinCond)
      .select(col("query_id"), col("corpus_id"),
        (VectorDot(col("qv"), col("cv")) / (col("qv_nrm") * col("cv_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold (used by [[Dedup.embeddingCosinePairs]]).
    * Self nested-loop join over unit-normalized rows; at cluster scale,
    * pre-bucket with [[ivfAssign]] and join within cells instead.
    */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = withNorm(vectors, idCol, vecCol, "id_a", "va")
    val b = withNorm(vectors, idCol, vecCol, "id_b", "vb")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (VectorDot(col("va"), col("vb")) / (col("va_nrm") * col("vb_nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Assign each vector to its nearest centroid (IVF cell). Centroids must be
    * broadcastable (they are by construction: nCentroids ≪ corpus). Norms on
    * both sides are computed once per row, not per (vector, centroid) pair.
    */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(desc("sim"), asc("centroid_id"))
    vectors.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__vn"))
      .join(broadcast(centroids.select(col("centroid_id"), col("centroid_vec"),
        norm(col("centroid_vec")).as("__cn"))))
      .withColumn("sim",
        VectorDot(col(vecCol), col("centroid_vec")) / (col("__vn") * col("__cn")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** Deterministic stand-in for trained IVF centroids: the first nCentroids
    * vectors by id. (A k-means refinement would slot in here; the index
    * structure and query path are what matter for the engine.)
    */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(monotonically_increasing_id().as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** IVF top-k: probe the nProbe nearest cells per query, exact cosine within
    * probed cells only. Approximate (recall < 1 when the true neighbor lives
    * in an unprobed cell) — the 1000×-scale path where brute force is
    * size-of-corpus per query.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = seedCentroids(corpus, idCol, vecCol, nCentroids).cache()
    val assigned = ivfAssign(corpus, idCol, vecCol, centroids)
      .withColumnRenamed(idCol, "corpus_id").withColumnRenamed(vecCol, "cv")
    val probes = {
      val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("centroid_id"))
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          norm(col(vecCol)).as("qv_nrm"))
        .join(broadcast(centroids.withColumn("__cn", norm(col("centroid_vec")))))
        .withColumn("sim",
          VectorDot(col("qv"), col("centroid_vec")) / (col("qv_nrm") * col("__cn")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= nProbe)
        .select(col("query_id"), col("qv"), col("qv_nrm"), col("centroid_id"))
    }
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    probes.join(assigned.withColumn("cv_nrm", norm(col("cv"))), "centroid_id")
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (VectorDot(col("qv"), col("cv")) / (col("qv_nrm") * col("cv_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
