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
    val c = withNorm(Partitioning.spread(corpus), idCol, vecCol, "corpus_id", "cv")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    val joinCond = if (excludeSelf) col("query_id") =!= col("corpus_id") else lit(true)
    c.join(broadcast(q), joinCond)
      .select(col("query_id"), col("corpus_id"),
        (VectorDot(col("qv"), col("cv")) / (col("qv_nrm") * col("cv_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold, EXACT (used by
    * [[Dedup.embeddingCosinePairs]]). Grid-partitioned theta-join (the
    * 1-Bucket-Theta scheme of Okcan & Riedewald, SIGMOD '11): vectors hash
    * into `numBlocks` groups; block (i, j), i ≤ j, owns all pairs between
    * groups i and j, and the join is an EQUI-join on the block key — a
    * shuffled hash/sort-merge join over numBlocks·(numBlocks+1)/2 evenly
    * sized tasks, never a broadcast nested loop. Each side replicates a row
    * (numBlocks−g) resp. (g+1) times, so total join input is (numBlocks+1)·n
    * rows and total comparisons ≈ n²/2·(1+1/numBlocks) — the unavoidable
    * exact-join work, spread uniformly across the cluster with per-task
    * memory bounded by 2n/numBlocks rows (raise numBlocks as n grows).
    *
    * Exact all-pairs at a low threshold is inherently Θ(n²) compute; when the
    * threshold is high (≳0.8) prefer the sub-quadratic approximate
    * [[cosinePairsLSH]], whose false negatives vanish as cosine → 1.
    */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBlocks: Int = 32): DataFrame = {
    val base = Partitioning.spread(vectors).select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"),
      pmod(xxhash64(col(idCol)), lit(numBlocks)).cast("int").as("grp"))
    val left = base
      .select(col("grp").as("bi"),
        explode(sequence(col("grp"), lit(numBlocks - 1))).as("bj"),
        col("id").as("id_l"), col("v").as("vl"), col("nrm").as("nrm_l"))
    val right = base
      .select(explode(sequence(lit(0), col("grp"))).as("bi"),
        col("grp").as("bj"),
        col("id").as("id_r"), col("v").as("vr"), col("nrm").as("nrm_r"))
    left.join(right, Seq("bi", "bj"))
      // diagonal blocks see both orders of an in-group pair (and self-pairs):
      // keep one; off-diagonal blocks see each cross-group pair exactly once,
      // in arbitrary id order — normalize to id_a < id_b on output.
      .where(col("bi") < col("bj") || col("id_l") < col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        (VectorDot(col("vl"), col("vr")) / (col("nrm_l") * col("nrm_r"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Approximate cosine pairs for the high-threshold regime: sign-random-
    * hyperplane LSH. [[SignBandKeys]] sketches each vector with
    * numBits Rademacher projections in one pass, packs them into
    * `bands` band keys, and the band equi-join yields candidates verified
    * with exact cosine (false positives never escape). Per-band collision
    * probability for a pair at angle θ is (1−θ/π)^(numBits/bands), so the
    * miss rate at cosine 0.95 with 128×16 banding is ~1e-4 and falls
    * super-exponentially toward cosine 1; below ~0.7 recall degrades — use
    * the exact [[cosinePairs]] grid join there.
    */
  def cosinePairsLSH(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBits: Int = 128, bands: Int = 16): DataFrame = {
    val bandKeys = vectors.select(col(idCol).as("doc_id"),
        posexplode(SignBandKeys(col(vecCol), numBits, bands)))
      .toDF("doc_id", "band", "band_key")
      .cache()
    val candidates = bandKeys.as("x").join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val v = withNorm(vectors, idCol, vecCol, "vid", "vv")
    candidates
      .join(v.as("pa"), col("id_a") === col("pa.vid"))
      .join(v.as("pb"), col("id_b") === col("pb.vid"))
      .select(col("id_a"), col("id_b"),
        (VectorDot(col("pa.vv"), col("pb.vv")) / (col("pa.vv_nrm") * col("pb.vv_nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Assign each vector to its nearest centroid (IVF cell). Centroids must be
    * broadcastable (they are by construction: nCentroids ≪ corpus). Norms on
    * both sides are computed once per row, not per (vector, centroid) pair,
    * and the vector norm is CARRIED THROUGH as `vec_nrm` so downstream
    * scoring never recomputes it.
    */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignNormed(normedBase(vectors, idCol, vecCol), idCol, vecCol, centroids)

  /** id, vec, vec_nrm — spread + normed once; callers that assign repeatedly
    * (k-means rounds, train-then-assign) cache this instead of re-scanning.
    */
  private def normedBase(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    Partitioning.spread(vectors)
      .select(col(idCol), col(vecCol), norm(col(vecCol)).as("vec_nrm"))

  private def assignNormed(base: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    // argmax as a hash-aggregation (max of a (sim, -centroid_id, payload)
    // struct — field-order comparison gives best-sim with the smaller
    // centroid id as tiebreak), NOT a row_number window: no sort of the
    // (vectors × centroids) join output, map-side partial max instead.
    base
      .join(broadcast(centroids.select(col("centroid_id"), col("centroid_vec"),
        norm(col("centroid_vec")).as("__cn"))))
      .withColumn("sim",
        VectorDot(col(vecCol), col("centroid_vec")) / (col("vec_nrm") * col("__cn")))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), (-col("centroid_id")).as("neg_cid"),
        col(vecCol).as("v"), col("vec_nrm").as("n"))).as("best"))
      .select(col(idCol), col("best.v").as(vecCol), col("best.n").as("vec_nrm"),
        (-col("best.neg_cid")).cast("long").as("centroid_id"))
  }

  /** Deterministic k-means init: the first nCentroids vectors by id. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(monotonically_increasing_id().as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Lloyd-refined IVF centroids: seed with [[seedCentroids]], then
    * `iters` rounds of assign → per-cell mean. The mean is computed
    * relationally (posexplode → groupBy (cell, dim) avg → rebuild array), so
    * each round is one broadcast-assign plus one keyed aggregation — no
    * driver-side vectors beyond the k centroids themselves. A cell that goes
    * empty keeps its previous centroid (k never silently shrinks — the
    * nProbe/nCentroids cost model depends on all k cells existing). To train
    * on a corpus sample at scale, pre-filter `corpus` with a deterministic
    * hash predicate before calling — centroid quality needs k ≪ n rows, not
    * all of them.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 3): DataFrame = {
    val base = normedBase(corpus, idCol, vecCol).cache() // scanned once, assigned per round
    var centroids = seedCentroids(corpus, idCol, vecCol, nCentroids)
    for (_ <- 0 until iters) {
      val means = assignNormed(base, idCol, vecCol, centroids)
        .select(col("centroid_id"), posexplode(col(vecCol)))
        .groupBy("centroid_id", "pos").agg(avg("col").as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("mean_vec"))
      centroids = centroids.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("mean_vec"), col("centroid_vec")).as("centroid_vec"))
        // materialize each round (k tiny rows): without this, round i's plan
        // re-executes rounds 1..i-1 — quadratic work in `iters`
        .localCheckpoint(true)
    }
    centroids
  }

  /** IVF top-k: probe the nProbe nearest cells per query, exact cosine within
    * probed cells only. Approximate (recall < 1 when the true neighbor lives
    * in an unprobed cell) — the 1000×-scale path where brute force is
    * size-of-corpus per query. Centroids are k-means-trained
    * (`kmeansIters` Lloyd rounds; 0 = raw seed centroids).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 3): DataFrame = {
    // one normed scan of the corpus serves training rounds AND the final
    // assignment (kmeansCentroids caches the same base lineage)
    val base = normedBase(corpus, idCol, vecCol).cache()
    val centroids = kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters).cache()
    val assigned = assignNormed(base, idCol, vecCol, centroids)
      .withColumnRenamed(idCol, "corpus_id").withColumnRenamed(vecCol, "cv")
      .withColumnRenamed("vec_nrm", "cv_nrm")
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
    probes.join(assigned, "centroid_id")
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (VectorDot(col("qv"), col("cv")) / (col("qv_nrm") * col("cv_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
