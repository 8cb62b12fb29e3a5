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

  /** Guarded cosine: −2 (below every real cosine ∈ [−1,1]) for zero-norm
    * or NaN-poisoned vectors. The guard matters twice under Spark 4
    * defaults: ANSI division by zero THROWS (it does not yield the NaN the
    * old comments assumed), and NaN compares ABOVE every double, so an
    * unguarded NaN cosine passes every ≥-threshold filter and outranks
    * every true neighbor.
    */
  def cosine(a: Column, b: Column): Column =
    safeCosine(VectorDot(a, b), norm(a) * norm(b))

  private def safeCosine(num: Column, den: Column): Column =
    coalesce(nanvl(num / nullif(den, lit(0d)), lit(-2d)), lit(-2d))

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
        // zero-norm / NaN vectors rank below all true neighbors (see
        // safeCosine — ANSI division would otherwise throw on zero norms)
        safeCosine(VectorDot(col("qv"), col("cv")),
          col("qv_nrm") * col("cv_nrm")).as("cosine"))
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
        safeCosine(VectorDot(col("vl"), col("vr")),
          col("nrm_l") * col("nrm_r")).as("cosine"))
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
    *
    * Cache contract as [[Dedup.minhashPairs]]: the band-key table persists
    * for the self-join; long-lived callers clear it after materializing, or
    * use [[cosinePairsLSHScoped]] to release it eagerly by handle.
    */
  def cosinePairsLSH(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBits: Int = 128, bands: Int = 16): DataFrame =
    cosinePairsLSHScoped(vectors, idCol, vecCol, threshold, numBits, bands)._1

  /** [[cosinePairsLSH]] plus handles to its persisted intermediates (same
    * scoped-release pattern as [[Dedup.minhashPairsScoped]]): eager consumers
    * unpersist them the moment the pair set is materialized instead of
    * waiting for a session-wide clearCache.
    */
  private[graft] def cosinePairsLSHScoped(vectors: DataFrame, idCol: String,
      vecCol: String, threshold: Double, numBits: Int = 128,
      bands: Int = 16): (DataFrame, Seq[DataFrame]) = {
    // spread like every sibling pair generator: the numBits-projection
    // sketch is the arithmetic-heavy stage and must not run on one split
    val bandKeys = Partitioning.spread(vectors).select(col(idCol).as("doc_id"),
        posexplode(SignBandKeys(col(vecCol), numBits, bands)))
      .toDF("doc_id", "band", "band_key")
      .cache()
    val candidates = bandKeys.as("x").join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    // cached + spread like verifyJaccardScoped's sets: joined once per
    // pair side, so without the cache the norm projection re-scans the
    // full corpus twice; the handle joins the scoped release list
    val v = withNorm(Partitioning.spread(vectors), idCol, vecCol, "vid", "vv").cache()
    val pairs = candidates
      .join(v.as("pa"), col("id_a") === col("pa.vid"))
      .join(v.as("pb"), col("id_b") === col("pb.vid"))
      .select(col("id_a"), col("id_b"),
        safeCosine(VectorDot(col("pa.vv"), col("pb.vv")),
          col("pa.vv_nrm") * col("pb.vv_nrm")).as("cosine"))
      .where(col("cosine") >= threshold)
    (pairs, Seq(bandKeys, v))
  }

  /** Exact cosine pairs WITHIN nearest-centroid cells — the SemDeDup
    * candidate bound (Abbas et al. 2023: cluster the embeddings, then look
    * for semantic duplicates only inside each cluster). One broadcast
    * assignment pass, then a shuffle EQUI-join keyed by `centroid_id` —
    * never a corpus-wide Θ(n²): the pair work is Σ|cell|², and at 100 TB
    * the centroid count is sized ∝ corpus (n / target-cell-size, the
    * paper's regime) so |cell| — and with it both the join fan-out and a
    * reducer's working set — stays bounded as the corpus grows. Pairs the
    * clustering misses are CROSS-cell by construction; that is SemDeDup's
    * documented trade, and the recall gate measures what it costs on real
    * geometry.
    *
    * Cache contract as [[cosinePairsLSH]]: the assignment persists for the
    * self-join (it carries a broadcast join + aggregation that would
    * otherwise run twice); long-lived callers clear it after materializing,
    * or use the scoped variant to release it eagerly by handle.
    */
  def cosinePairsWithinCells(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxCellRows: Long = 4000000L): DataFrame =
    cosinePairsWithinCellsScoped(vectors, idCol, vecCol, centroids, threshold,
      maxCellRows)._1

  private[graft] def cosinePairsWithinCellsScoped(vectors: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame,
      threshold: Double, maxCellRows: Long = 4000000L): (DataFrame, Seq[DataFrame]) = {
    require(maxCellRows > 0,
      s"cosinePairsWithinCells: maxCellRows must be positive, got $maxCellRows")
    // centroids are broadcastable by contract (k ≪ corpus), so assignment
    // is a PER-ROW expression against the driver-collected model
    // ([[NearestCentroid]]) — one narrow projection over the corpus, zero
    // shuffle and no k-fold row blow-up, vs ivfAssign's join + argmax
    // aggregation (kept for index build, where it runs once)
    // loud failure beats an unbounded driver collect: the contract is a
    // broadcastable centroid set (k ≪ corpus); 1M centroids of any real
    // dimension is already GBs and means the caller sized k wrong
    // array<double> cast: int/decimal/float centroid columns all coerce
    // (the oracle does the same), instead of MatchError-ing on the boxed type
    val model = centroids
      .select(col("centroid_id").cast("long"), col("centroid_vec").cast("array<double>"))
      .limit(1000001)
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1): Seq[Double]))
      .toSeq
    require(model.size <= 1000000,
      "cosinePairsWithinCells: centroid set exceeds 1M — not broadcastable; " +
        "size k as corpus / target-cell-rows, not larger")
    val assigned = Partitioning.spread(vectors).select(
        col(idCol), col(vecCol), norm(col(vecCol)).as("vec_nrm"),
        NearestCentroid(col(vecCol), model).as("centroid_id"))
      .cache()
    // ——— cell-skew defense ———
    // k is sized for |cell| ≈ corpus/k, but real k-means on web embeddings
    // skews: one hot cell holding 10% of the corpus puts Θ((n/10)²) join
    // input on ONE reducer key. Count rows per cell (an agg over the cached
    // assignment → ≤k rows; only the oversized ones are collected) and
    // re-split oversized cells with the in-cell GRID scheme of
    // [[cosinePairs]] (1-Bucket-Theta): rows hash by id into `blocks`
    // sub-groups and block (bi,bj) owns the pairs between groups bi and bj,
    // so per-task join input is ~2·|cell|/blocks rows. NOT a sign-LSH
    // sub-bucket: the worst skew case — a mega-cell of near-identical
    // directions — hashes every row to the SAME sign bucket, while the
    // id-hash grid bounds per-task input unconditionally AND keeps the
    // output exactly identical (every within-cell pair still compared once;
    // nothing new to a recall gate). Total compute stays Σ|cell|² — that is
    // the true pair work when the duplicates genuinely exist — but no
    // single task ever owns a whole mega-cell.
    val oversized = assigned.groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .where(col("n") > maxCellRows)
      // the null-centroid group (null/invalid embeddings) can exceed the
      // cap too — getLong(0) on its key would NPE the driver. Null keys
      // drop out of the equi-join below anyway, so skip, don't crash.
      .collect().filter(!_.isNullAt(0)).map(r => (r.getLong(0), r.getLong(1)))
    // shuffle_hash (both branches): the SMJ alternative sorts the full
    // vector payloads on both sides just to merge ~k distinct keys
    val pairs = if (oversized.isEmpty) {
      assigned.as("a").join(assigned.as("b").hint("shuffle_hash"),
          col("a.centroid_id") === col("b.centroid_id") &&
            col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
          safeCosine(VectorDot(col(s"a.$vecCol"), col(s"b.$vecCol")),
            col("a.vec_nrm") * col("b.vec_nrm")).as("cosine"))
        .where(col("cosine") >= threshold)
    } else {
      val spark = vectors.sparkSession
      import spark.implicits._
      // blocks per oversized cell: ceil(n / maxCellRows), capped so a
      // pathological single-cell corpus can't explode the (blocks+1)-fold
      // row replication — past the cap per-task input degrades gracefully
      // instead of the replication itself becoming the new blow-up
      val cellBlocks = oversized.toSeq
        .map { case (cid, n) =>
          (cid, math.min((n + maxCellRows - 1) / maxCellRows, 4096L).toInt) }
        .toDF("centroid_id", "blocks")
      val based = assigned.join(broadcast(cellBlocks), Seq("centroid_id"), "left")
        .withColumn("blocks", coalesce(col("blocks"), lit(1)))
        .withColumn("g", pmod(xxhash64(col(idCol)), col("blocks")).cast("int"))
      val left = based.select(col("centroid_id"), col("g").as("bi"),
        explode(sequence(col("g"), col("blocks") - 1)).as("bj"),
        col(idCol).as("id_l"), col(vecCol).as("vl"), col("vec_nrm").as("nrm_l"))
      val right = based.select(col("centroid_id"),
        explode(sequence(lit(0), col("g"))).as("bi"), col("g").as("bj"),
        col(idCol).as("id_r"), col(vecCol).as("vr"), col("vec_nrm").as("nrm_r"))
      left.join(right.hint("shuffle_hash"), Seq("centroid_id", "bi", "bj"))
        // diagonal sub-blocks see both orders of an in-group pair (and
        // self-pairs): keep one; off-diagonal sub-blocks see each pair once
        // in arbitrary order — normalize to id_a < id_b on output
        .where(col("bi") < col("bj") || col("id_l") < col("id_r"))
        .select(least(col("id_l"), col("id_r")).as("id_a"),
          greatest(col("id_l"), col("id_r")).as("id_b"),
          safeCosine(VectorDot(col("vl"), col("vr")),
            col("nrm_l") * col("nrm_r")).as("cosine"))
        .where(col("cosine") >= threshold)
    }
    (pairs, Seq(assigned))
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
      // safeCosine: ANSI zero-division would throw, and Spark's max-struct
      // ranks NaN above every double — −2 ranks below every real cosine and
      // keeps the smaller-id tiebreak deterministic
      .withColumn("sim", safeCosine(
        VectorDot(col(vecCol), col("centroid_vec")), col("vec_nrm") * col("__cn")))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), (-col("centroid_id")).as("neg_cid"),
        col(vecCol).as("v"), col("vec_nrm").as("n"))).as("best"))
      .select(col(idCol), col("best.v").as(vecCol), col("best.n").as("vec_nrm"),
        (-col("best.neg_cid")).cast("long").as("centroid_id"))
  }

  /** Lloyd-refined IVF centroids, trained on a bounded deterministic
    * hash-sample of the corpus: `pmod(xxhash64(id), m) = 0` with m sized so
    * the sample is ≈ samplePerCentroid·k rows — centroid quality needs
    * k ≪ sample, not all n rows. The sample is collected and refined
    * driver-side: at the default 256·k rows the training set is a few MB,
    * and running the k·|sample|·iters flops locally replaces 3-4 Spark jobs
    * PER Lloyd round (broadcast-assign, re-mean aggregation, reseed join,
    * lineage checkpoint) with zero — the full corpus is touched exactly
    * twice, one column-pruned count to size m and the caller's single
    * distributed assignment. Deterministic across partition layouts: the
    * sample is a content-hash filter, seeded with its first k vectors by id,
    * and the fold runs in id order with double accumulation. A cell that
    * goes empty keeps its previous centroid (k never silently shrinks — the
    * nProbe/nCentroids cost model depends on all k cells existing).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 3, samplePerCentroid: Int = 256): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    kmeansCentroidsLocal(corpus, idCol, vecCol, nCentroids, iters, samplePerCentroid)
      .toDF("centroid_id", "centroid_vec")
  }

  /** [[kmeansCentroids]] as driver-local rows. Callers that reuse one
    * training across several queries (e.g. an IVF search and its recall
    * gate) cache THIS — plain data outlives any one SparkSession, and
    * re-wrapping it in a DataFrame is a free local relation.
    */
  def kmeansCentroidsLocal(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 3,
      samplePerCentroid: Int = 256): Seq[(Long, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(nCentroids.toLong * samplePerCentroid <= (1L << 22),
      "training sample must stay driver-collectable; lower samplePerCentroid")
    val target = nCentroids.toLong * samplePerCentroid
    val m = math.max(1L, corpus.count() / target)
    // id goes through string (not long): ids are only needed for a
    // DETERMINISTIC driver-side order, and string-keyed corpora (UUIDs) are
    // as valid here as numeric ones. Zero vectors are excluded — they have
    // no direction, and a zero-norm seed's NaN similarities would diverge
    // between this loop (never chosen) and assignNormed's max-struct (always
    // chosen).
    val raw = corpus
      .where(pmod(xxhash64(col(idCol)), lit(m)) === 0)
      .select(col(idCol).cast("string"), col(vecCol).cast("array<double>"))
      .as[(String, Array[Double])].collect()
    // null vectors would NPE the driver fold; ragged lengths (corrupt
    // corpus) would AIOOBE at the dim loop; NaN/Infinity components would
    // silently poison a centroid (NaN != 0.0 passes the zero filter, NaN
    // sim never wins `> bestSim`, so the row lands on default cell 0 and
    // `sums(0)(i) += NaN` kills that centroid after one iteration — a
    // permanently dead cell with no error anywhere). All are directionless
    // noise here, like zero vectors.
    val nonNull = raw.filter(r => r._2 != null && r._2.exists(_ != 0.0) &&
      r._2.forall(java.lang.Double.isFinite))
    val sorted = nonNull
      // (length, value) sorts non-negative numeric ids NUMERICALLY (the
      // seed order the recall gates are tuned against) and is still a total
      // deterministic order for UUID-style ids
      .sortBy(r => (r._1.length, r._1))
    // reference dim from the SORTED order — off the raw collect() it would
    // be partition-layout-dependent exactly where the ragged-dim filter
    // needs it stable (the documented determinism contract)
    val headDim = sorted.headOption.map(_._2.length).getOrElse(0)
    val sample = sorted.filter(_._2.length == headDim)
    // loud failure beats k = 0 centroids silently emptying every IVF result
    require(sample.nonEmpty || raw.isEmpty,
      "k-means training sample contains only zero/non-finite vectors — IVF needs directional data")
    val k = math.min(nCentroids, sample.length)
    val dim = if (sample.isEmpty) 0 else sample(0)._2.length
    def norm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val vecNorms = sample.map(r => norm(r._2))
    val centroids = Array.tabulate(k)(i => sample(i)._2.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      val cNorms = centroids.map(norm)
      for (si <- sample.indices) {
        val v = sample(si)._2
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += v(i) * centroids(c)(i); i += 1 }
          // strict > keeps the smaller centroid id on ties, matching
          // assignNormed's (sim, -centroid_id) argmax tiebreak
          val sim = dot / (vecNorms(si) * cNorms(c))
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      for (c <- 0 until k if counts(c) > 0; i <- 0 until dim)
        centroids(c)(i) = sums(c)(i) / counts(c)
    }
    centroids.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
  }

  /** IVF top-k: probe the nProbe nearest cells per query, exact cosine within
    * probed cells only. Approximate (recall < 1 when the true neighbor lives
    * in an unprobed cell) — the 1000×-scale path where brute force is
    * size-of-corpus per query. Centroids are k-means-trained
    * (`kmeansIters` Lloyd rounds; 0 = raw seed centroids) unless the caller
    * passes a pre-trained `centroids` relation (centroid_id, centroid_vec) —
    * an IVF index is train-once/search-many, and a search plus its recall
    * gate must score against the SAME cells (nCentroids/kmeansIters are
    * ignored then).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 3,
      excludeSelf: Boolean = true, centroids: Option[DataFrame] = None): DataFrame = {
    // no caches: training reads only its driver-collected hash-sample, the
    // corpus is scanned once for the single assignment pass, and the
    // centroids are a driver-local k-row relation (broadcasts are free)
    val base = normedBase(corpus, idCol, vecCol)
    val cents = centroids.getOrElse(
      kmeansCentroids(corpus, idCol, vecCol, nCentroids, kmeansIters))
    val assigned = assignNormed(base, idCol, vecCol, cents)
      .withColumnRenamed(idCol, "corpus_id").withColumnRenamed(vecCol, "cv")
      .withColumnRenamed("vec_nrm", "cv_nrm")
    probeAssigned(queries, idCol, vecCol, cents, assigned, k, nProbe, excludeSelf)
  }

  /** Persist the IVF index: the corpus assigned to nearest centroids,
    * written as parquet PARTITIONED BY cell — the on-disk shape a serving
    * deployment keeps, where probing nProbe cells is a partition-pruned
    * scan instead of a full-corpus pass. The assignment pass (corpus ×
    * centroids scoring) runs exactly once here instead of inside every
    * query; [[ivfTopKFromIndex]] reads it back. Store the TRAINING
    * centroids next to the index yourself if they are not deterministic —
    * probing with different centroids than the assignment used breaks the
    * recall contract.
    */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, path: String): Unit =
    ivfIndexRows(corpus, idCol, vecCol, centroids)
      .write.partitionBy("centroid_id").mode("overwrite").parquet(path)

  /** One index row per corpus vector: fp32 vector + norm, int8 codes +
    * scale (the quantized probe path scans codes + scale only — ¼ the
    * vector bytes, parquet column pruning keeps cv unread — and fetches cv
    * for its rescore candidates alone), keyed by nearest-centroid cell.
    */
  private def ivfIndexRows(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignNormed(normedBase(corpus, idCol, vecCol), idCol, vecCol, centroids)
      .withColumnRenamed(idCol, "corpus_id").withColumnRenamed(vecCol, "cv")
      .withColumnRenamed("vec_nrm", "cv_nrm")
      .withColumn("__q", Int8Quantize(col("cv")))
      .select(col("corpus_id"), col("cv"), col("cv_nrm"),
        col("__q.codes").as("codes"), col("__q.scale").as("code_scale"),
        col("centroid_id"))

  /** Incremental index maintenance: assign a DELTA of new embeddings with
    * the SAME centroids the index was built with (probing with different
    * centroids than the assignment used breaks the recall contract — at
    * 100 TB the geometry is train-once, append-many) and append into the
    * cell directories. Index rows are immutable, so an uncompacted index
    * serves correctly — the only cost of accumulated appends is small
    * files per cell, which [[compactIvfIndex]] rewrites.
    */
  def appendIvfIndex(delta: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, path: String): Unit =
    ivfIndexRows(delta, idCol, vecCol, centroids)
      .write.partitionBy("centroid_id").mode("append").parquet(path)

  /** Rewrite each cell's accumulated append files to one (corpus_id)-sorted
    * file under the set-store generation-commit machinery
    * ([[graft.store.StoreLayout.compactPartitionDirs]]): per-cell leases,
    * staged rewrite, atomic generation flip — an append landing mid-
    * compaction stays a served loose file, so probes never lose rows.
    * Cells rewrite independently on the bounded pool, the 100 TB shape
    * (one maintenance pass = k small concurrent jobs, not one giant one).
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    val cells = fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("centroid_id="))
      .map(_.getPath.getName).toSeq
    graft.store.StoreLayout.compactPartitionDirs(spark, path, cells)(df =>
      df.coalesce(1).sortWithinPartitions("corpus_id"))
  }

  /** Top-k over a persisted [[writeIvfIndex]] index. The probed cell set
    * (≤ queries × nProbe ids, driver-tiny) is collected and the scan is
    * given ONLY those cells' partition directories (`basePath` read) — the
    * file index never lists the unprobed cells, so the bound is structural
    * rather than a planner-dependent partition filter and survives any
    * partition-type-inference quirk. Cells that hold no vectors have no
    * directory and are skipped. Per-query cell routing still happens in
    * the equi-join; the directory list is the coarse scan bound.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, idCol: String, vecCol: String, indexPath: String,
      centroids: DataFrame, k: Int, nProbe: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    val probes = probeCells(queries, idCol, vecCol, centroids, nProbe)
    probedCellScan(spark, probes, indexPath) match {
      case None => emptyTopK(spark, probes, indexPath)
      case Some(assigned) => rankProbed(probes, assigned, k, excludeSelf)
    }
  }

  /** Top-k over the persisted index scoring with the int8 codes: the probe
    * scan reads codes + scale + norm ONLY (~¼ of the fp32 vector bytes —
    * parquet column pruning keeps `cv` unread), ranks every probed row by
    * the dequantized dot ([[Int8DotScaled]], codegen), keeps `k × rescore`
    * candidates per query, and joins ONLY those back to the index for the
    * exact fp32 pass — the serving shape of a quantized ANN deployment,
    * where full-precision reads are bounded by candidates, never by probed
    * rows. Ranking quality is corpus-dependent (quantization error × the
    * rescore bound), so the operating point ships gated by
    * q_ann_ivf_int8_recall, exactly like the fp32 path's recall gate.
    */
  def ivfTopKInt8FromIndex(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, idCol: String, vecCol: String, indexPath: String,
      centroids: DataFrame, k: Int, nProbe: Int = 4, rescore: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    val probes = probeCells(queries, idCol, vecCol, centroids, nProbe)
    probedCellScan(spark, probes, indexPath) match {
      case None => emptyTopK(spark, probes, indexPath)
      case Some(assigned) =>
        val wA = Window.partitionBy("query_id").orderBy(desc("approx"), asc("corpus_id"))
        val cands = probes.join(
            assigned.select("centroid_id", "corpus_id", "codes", "code_scale", "cv_nrm"),
            "centroid_id")
          .where(if (excludeSelf) col("query_id") =!= col("corpus_id") else lit(true))
          .select(col("query_id"), col("corpus_id"), col("qv"), col("qv_nrm"),
            safeCosine(Int8DotScaled(col("codes"), col("code_scale"), col("qv")),
              col("qv_nrm") * col("cv_nrm")).as("approx"))
          .withColumn("rn", row_number().over(wA))
          .where(col("rn") <= k * rescore)
          .drop("rn", "approx")
        val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
        // candidate-bounded fp32 fetch: the tiny candidate set broadcasts,
        // the cell-pruned scan streams past it reading cv only for matches
        assigned.select(col("corpus_id"), col("cv"), col("cv_nrm"))
          .join(broadcast(cands), "corpus_id")
          .select(col("query_id"), col("corpus_id"),
            safeCosine(VectorDot(col("qv"), col("cv")),
              col("qv_nrm") * col("cv_nrm")).as("cosine"))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= k)
    }
  }

  /** Zero-row result for an empty / all-empty-cell index. `corpus_id` takes
    * the INDEX's id type when any index file exists to read it from (an
    * unprobed cell still states the schema) and only falls back to the
    * query-id type on a truly fileless index — otherwise a cross-table
    * search with differently-typed ids would flip schema between empty and
    * non-empty runs, failing fixed-schema writers only on the empty ones.
    */
  private def emptyTopK(spark: org.apache.spark.sql.SparkSession,
      probes: DataFrame, indexPath: String): DataFrame = {
    val corpusIdType = indexSchemaProbe(spark, indexPath)
      .flatMap(s => s.fields.find(_.name == "corpus_id").map(_.dataType))
      .getOrElse(probes.schema("query_id").dataType)
    probes.limit(0).select(col("query_id"),
      col("query_id").cast(corpusIdType).as("corpus_id"), lit(0.0).as("cosine"),
      lit(1).as("rank"))
  }

  /** Schema of ANY live index file (first cell dir with inputs), None on a
    * fileless index — the readPartitioned empty-husk probe, cell-shaped.
    */
  private def indexSchemaProbe(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[org.apache.spark.sql.types.StructType] = {
    val base = new org.apache.hadoop.fs.Path(indexPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else fs.listStatus(base).iterator.filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("centroid_id="))
      .map(d => graft.store.StoreLayout.livePartitionInputs(spark, d.getPath))
      .collectFirst { case inputs if inputs.nonEmpty =>
        spark.read.parquet(inputs.map(_.toString): _*).schema
      }
  }

  /** The probed cells' partition directories as one pruned scan (None when
    * no probed cell has a directory — empty index or all-empty cells). The
    * ≤ queries × nProbe cell ids are driver-tiny; handing the reader only
    * their directories makes the read bound structural (the file index
    * never lists unprobed cells) instead of planner-dependent.
    */
  private def probedCellScan(spark: org.apache.spark.sql.SparkSession,
      probes: DataFrame, indexPath: String): Option[DataFrame] = {
    val cellIds = probes.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val base = new org.apache.hadoop.fs.Path(indexPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-cell GENERATION resolution (not plain dir listing): a compacted
    // cell serves its current `.gen-N` dir + unabsorbed appends, and a
    // dot-prefixed generation dir is invisible to a plain parquet listing —
    // reading the cell dir directly would silently drop every compacted row
    val inputs = cellIds.map(id => new org.apache.hadoop.fs.Path(base, s"centroid_id=$id"))
      .filter(fs.exists)
      .flatMap(dir => graft.store.StoreLayout.livePartitionInputs(spark, dir))
    if (inputs.isEmpty) None
    // cell id recovered from the file path (the readPartitioned technique —
    // greedy .* anchors the LAST `centroid_id=` segment): explicit-input
    // reads skip partition discovery, and gen-dir files sit one level below
    // the partition dir where discovery's trailing-segment parse can't see
    // the value anyway
    else Some(spark.read.parquet(inputs.map(_.toString): _*)
      .withColumn("centroid_id", regexp_extract(col("_metadata.file_path"),
        ".*/centroid_id=([0-9]+)/", 1).cast("long")))
  }

  /** The nProbe nearest cells per query (by centroid cosine). */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, nProbe: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("centroid_id"))
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        norm(col(vecCol)).as("qv_nrm"))
      .join(broadcast(cents.withColumn("__cn", norm(col("centroid_vec")))))
      .withColumn("sim", safeCosine( // NaN/zero-norm: see safeCosine
        VectorDot(col("qv"), col("centroid_vec")), col("qv_nrm") * col("__cn")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qv_nrm"),
        col("centroid_id").cast("long").as("centroid_id"))
  }

  private def probeAssigned(queries: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, assigned: DataFrame, k: Int, nProbe: Int,
      excludeSelf: Boolean): DataFrame =
    rankProbed(probeCells(queries, idCol, vecCol, cents, nProbe), assigned,
      k, excludeSelf)

  private def rankProbed(probes: DataFrame, assigned: DataFrame, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    // same excludeSelf contract as bruteForceTopK: set false when query and
    // corpus tables are unrelated, or a coincidental id match drops a
    // true neighbor
    probes.join(assigned, "centroid_id")
      .where(if (excludeSelf) col("query_id") =!= col("corpus_id") else lit(true))
      .select(col("query_id"), col("corpus_id"),
        safeCosine(VectorDot(col("qv"), col("cv")),
          col("qv_nrm") * col("cv_nrm")).as("cosine")) // NaN/zero: safeCosine
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
