package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: one hash-groupBy shuffle, map-side partial agg;
  *  - n-gram Jaccard: shingle-inverted-index self-join (shuffle keyed by
  *    shingle — never a cross join), with an optional document-frequency cap
  *    to cut stop-shingle skew;
  *  - MinHash+LSH: signatures via map-side element-wise min, band-bucket
  *    join, exact verification only on candidates;
  *  - SimHash: 32-bit signatures, byte-banded join (pigeonhole-exact for
  *    hamming ≤ 3), verification on candidates only.
  */
object Dedup {

  /** Exact dedup: representative id + multiplicity per distinct key. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Streaming exact dedup over an unbounded ingest: the first arrival per
    * key survives, duplicates landing within the watermark horizon are
    * dropped, and — the property that makes this viable at 100 TB/day —
    * the dedup state is EVICTED as the watermark advances, so live state is
    * ∝ keys-per-horizon, never keys-ever-seen. (A streaming
    * `dropDuplicates` without the watermark bound keeps every key forever
    * and exhausts executor state by construction at ingest scale.) The
    * trade is explicit: a duplicate separated from its original by more
    * than the horizon re-emits, and the periodic batch `exact` pass over
    * the accumulated store collapses those stragglers — the same
    * bounded-state + late-data contract as the reference's windowed stores
    * (KafkaStorageBuilder.java:225 retention ↔ watermark horizon).
    */
  def exactStream(docs: DataFrame, keyCols: Seq[String], eventTimeCol: String,
      watermarkDelay: String): DataFrame =
    docs.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** doc → exploded distinct word n-gram shingles, CACHED (every caller
    * reads it at least twice — self-join sides, size table, hot-shingle
    * aggregate; Dataset.cache is MEMORY_AND_DISK, so it spills rather than
    * OOMs at scale). With a document-frequency cap, the ultra-common
    * shingles (stopword runs — the keys whose df² terms make the
    * inverted-index self-join quadratic at scale) are removed via a
    * broadcast anti-join against the hot-shingle list: the hot set is tiny
    * by construction (df > cap), so the filter is a map-side hash probe over
    * the one cached index — no global sort, no second tokenization pass, no
    * second persisted copy.
    */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int,
      maxDocFreq: Option[Long]): DataFrame =
    shingleIndexWithDf(docs, idCol, textCol, n, maxDocFreq)._1

  /** [[shingleIndex]] plus the matching document-frequency table (df per
    * surviving shingle, i.e. post-cap), computed ONCE and cached: the cap's
    * hot-list, the strategy dispatch's collision-mass aggregate, and the
    * prefix path's rarest-first order all read it — without the shared
    * cache each action would redo the groupBy from the raw index. The df
    * table is one row per distinct shingle (≪ the index) and linear to
    * build, so the cache is cheap at any scale.
    */
  private def shingleIndexWithDf(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDocFreq: Option[Long]): (DataFrame, DataFrame) = {
    val sh = Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      explode(TextAnalysis.distinctShingles(col(textCol), n)).as("shingle"))
      .cache()
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df")).cache()
    maxDocFreq match {
      case None => (sh, df)
      case Some(cap) =>
        val hot = df.where(col("df") > cap).select("shingle")
        (sh.join(broadcast(hot), Seq("shingle"), "left_anti"),
          df.where(col("df") <= cap))
    }
  }

  /** Input-proportional shuffle width for the pair-finding joins. The
    * session's `spark.sql.shuffle.partitions` is sized for the CORPUS scan,
    * but the pair stages' working set is the COLLISION MASS — at ×30
    * amplification the r16 scale leg spilled 15.5 GB through the static
    * 32-partition width (BENCH_scale_x30.json). Per-stage attribution
    * (ProfileNgramScale, 2026-08-15) put the spill in the pair-count
    * AGGREGATION hash maps, not the join sort: collision pairs are mostly
    * unique, so partial agg reduces nothing and each agg task buffered
    * sigma/32 ≈ 1.19 M entries — ~139 MB of hash-map fallback per task,
    * in both the partial and final agg. 500 k weight rows per partition
    * keeps each agg map ~50 MB, comfortably inside a task's execution-
    * memory share at 32 concurrent tasks; the session width stays the
    * floor (at sf0.1 sigma ≈ 1.3 M → width 32, so the official bench plan
    * is byte-identical), and 4096 caps runaway widths (per-task input is
    * bounded there and more tasks only add scheduler overhead). AQE cannot
    * do this for us: it coalesces small shuffle partitions and splits
    * SKEWED ones, but a uniformly-oversized shuffle keeps its static width.
    */
  private def shuffleWidth(df: DataFrame, weightRows: Double): Int = {
    val session = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(session, math.min(4096, math.ceil(weightRows / 5e5).toInt))
  }

  /** Explicit exchange on `keys` at `parts`, ONLY above the session width —
    * at or below it the downstream shuffle runs there anyway, so small
    * inputs keep their exact plans (the single guard both dedup strategies
    * share; [[shuffleWidth]] never returns below the session width, so
    * `parts == session` IS the small-input case, and `parts = 0` callers
    * inherit the session plan untouched).
    */
  private def widenIfNeeded(df: DataFrame, parts: Int, keys: Column*): DataFrame = {
    val session = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (parts > session) df.repartition(parts, keys: _*) else df
  }

  /** Whether the planner will broadcast `df` as a join side: its Catalyst
    * size estimate (the SAME statistic JoinSelection reads — the actual
    * in-memory stats once the plan is cached and materialized) against the
    * session's autoBroadcastJoinThreshold. Used to gate explicit probe-side
    * exchanges that only pay off under a SHUFFLED join: a broadcast join
    * streams the probe side unexchanged, so pre-keying it is a wasted
    * full shuffle. Conservative by construction — AQE may still convert a
    * shuffled join to broadcast at runtime (we then keep a redundant but
    * harmless exchange); the reverse (skipping an exchange a shuffled join
    * needed) can't happen, because we only skip when the estimate is under
    * the threshold the planner itself uses.
    */
  private def broadcastable(df: DataFrame): Boolean = {
    val thresholdBytes = broadcastThresholdBytes(df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB"))
    thresholdBytes > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thresholdBytes)
  }

  /** autoBroadcastJoinThreshold string → bytes. JavaUtils.byteStringAsBytes
    * cannot parse a leading '-' (Spark's own ConfigHelpers.byteFromString
    * strips it first), so "-1" — the STANDARD broadcast-disable value —
    * must be handled here, and any other non-fatal parse failure must
    * default to NOT broadcastable (0): the safe error is keeping a
    * redundant exchange, never skipping one a shuffled join needed.
    * Fatal VM errors (OOM, stack overflow) propagate — mapping those to
    * 0 would silently continue a dying JVM. Spec-pinned in FunctionsSpec.
    */
  private[graft] def broadcastThresholdBytes(conf: String): Long =
    try {
      val raw = conf.trim
      val neg = raw.startsWith("-")
      val mag = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        if (neg) raw.substring(1) else raw)
      if (neg) -mag else mag
    } catch { case scala.util.control.NonFatal(_) => 0L }

  /** Corpus-relative document-frequency cap for [[ngramJaccardPairs]]:
    * 0.5% of the corpus, floored at 5 so tiny corpora keep their legitimate
    * repeats. Integer arithmetic (`nDocs / 200`) so the DuckDB oracle mirrors
    * it exactly (`greatest(5, count(*) // 200)`).
    */
  def docFreqCap(nDocs: Long): Long = math.max(5L, nDocs / 200L)

  /** Exact n-gram Jaccard near-dup pairs. Two physical strategies produce
    * the identical pair set, and the choice between them is COST-BASED on
    * the collision mass Σ df·(df−1)/2 of the (capped) shingle index — the
    * exact row count of the inverted-index self-join:
    *
    *  - **full inverted index** ([[ngramJaccardPairsNaive]]'s body): count
    *    |A∩B| from the shingle self-join. Cheapest while collision rows
    *    stay within a small factor of the index itself (count-aggregation
    *    is a few ns/row; no arrays materialize). Measured at sf0.1
    *    (Σ/index ≈ 4.9 under the 0.5% df cap): 56 cpu-s vs the prefix
    *    path's 123 cpu-s.
    *  - **prefix-filtered** ([[ngramJaccardPairsPrefix]]): PPJoin-style —
    *    only each doc's rarest |S|−⌈t·|S|⌉+1 shingles enter the candidate
    *    join, candidates verify on full shingle arrays. Linear-ish in
    *    corpus + candidates, so it wins exactly where the collision mass
    *    detaches from the index size: duplicate-heavy corpora, uncapped
    *    runs, and the billion-doc regime where even the 0.5% cap allows
    *    df in the millions (one df=5M shingle alone is 1.25e13 collision
    *    rows — no cluster aggregates that).
    *
    * The one-row stats job deciding this reads the already-cached index —
    * linear, fully parallel, ~0.1 s at sf0.1. Crossover factor 16 is
    * calibrated from the sf0.1 pair above (break-even ≈ 11, rounded up so
    * the cheap-count path keeps the slot when in doubt).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Option[Long] = None): DataFrame = {
    val (sh, docFreq) = shingleIndexWithDf(docs, idCol, textCol, n, maxDocFreq)
    val stats = docFreq
      .agg(coalesce(sum(col("df")), lit(0L)).cast("long").as("rows"),
        coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0L))
          .cast("double").as("sigma"))
      .first()
    val rows = stats.getLong(0); val sigma = stats.getDouble(1)
    if (sigma <= 16.0 * math.max(1L, rows))
      // the self-join materializes exactly sigma collision rows — width the
      // shuffle to THAT, not the corpus (sigma detaches from rows with scale)
      fullIndexPairs(sh, threshold, shuffleWidth(sh, math.max(rows.toDouble, sigma)))
    else prefixFilteredPairs(sh, docFreq, threshold, shuffleWidth(sh, rows.toDouble))
  }

  /** The prefix-filtered strategy, directly (no cost dispatch) — the
    * equivalence property in FunctionsSpec pins it against the naive path
    * on randomized corpora. J(A,B) ≥ t forces the two shingle sets to
    * share an element among each side's first |S|−⌈t·|S|⌉+1 shingles under
    * one global canonical order (the prefix-filtering principle of the
    * all-pairs literature — Bayardo et al., WWW'07; Xiao et al.'s PPJoin,
    * WWW'08), so ONLY those prefixes enter the candidate self-join;
    * candidates then verify exactly on the full shingle arrays (cost ∝
    * candidate pairs). The canonical order is rarest-first (ascending
    * document frequency, ties lexicographic), which makes prefix
    * collisions the RAREST shingles' df² instead of the commonest. A size
    * filter (t·max(|A|,|B|) ≤ min(|A|,|B|), another J ≥ t consequence)
    * prunes candidates before the distinct.
    */
  private[graft] def ngramJaccardPairsPrefix(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val (sh, docFreq) = shingleIndexWithDf(docs, idCol, textCol, n, maxDocFreq)
    val rows = docFreq.agg(coalesce(sum(col("df")), lit(0L)).cast("long")).first().getLong(0)
    prefixFilteredPairs(sh, docFreq, threshold, shuffleWidth(sh, rows.toDouble))
  }

  /** `parts`: shuffle width for the index-sized stages (the docsets build
    * and the prefix candidate self-join) — input-proportional, see
    * [[shuffleWidth]]. The prefix path's join output is the PREFIX collision
    * mass (rarest shingles only, ≪ the full sigma), so the index row count
    * is the right weight here, not sigma.
    */
  private def prefixFilteredPairs(sh: DataFrame, docFreq: DataFrame,
      threshold: Double, parts: Int): DataFrame = {
    // one row per doc: shingles as an array in global rarest-first order
    // (struct sort = df asc, then shingle asc — a total order, so every doc
    // agrees on it). Built from the already-capped index, not a second
    // tokenization pass; cached because the prefix explode and both verify
    // joins read it.
    // both index-sized shuffles run at the proportional width: the df join
    // keyed by shingle (repartitioning one side makes EnsureRequirements
    // match the other to it), and the per-doc collect_list — whose partial
    // agg buffers whole shingle arrays, the worst place to be 30× over-full.
    // At or below the session width the explicit exchanges are pure waste
    // (the df join may broadcast its small side; the groupBy shuffles at
    // the session width anyway) — widenIfNeeded keeps small inputs on
    // their exact plans, same as fullIndexPairs.
    // The shingle-keyed widen of the join INPUT only pays off when the df
    // join actually shuffles: a broadcast join streams the probe side
    // unexchanged (the widen's full extra exchange buys nothing — the
    // groupBy re-keys by doc_id right after). Gate it on the same estimate
    // the planner's broadcast decision reads, so the widen appears exactly
    // when a shuffled join (both sides keyed by shingle) will consume it.
    val shJoinSide =
      if (broadcastable(docFreq)) sh else widenIfNeeded(sh, parts, col("shingle"))
    val docsets = widenIfNeeded(
        shJoinSide.join(docFreq, Seq("shingle")),
        parts, col("doc_id"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), e => e.getField("shingle")).as("shs"),
        size(col("ord")).as("n_sh"))
      .cache()
    // ⌈t·n⌉ via ceil(x − 1e-9): double rounding can land t·n a hair ABOVE
    // the exact integer (0.7×10 = 7.000…1), and an unguarded ceil would
    // shorten the prefix / tighten the size filter — silently dropping
    // true pairs
    def ceilT(c: Column): Column = ceil(c * threshold - 1e-9)
    // pre-partition the candidate self-join's key at the same width: both
    // sides then carry HashPartitioning(shingle, parts) and the join adds
    // no further exchange (the second side is a ReusedExchange). At the
    // session width the join's own exchanges are identical — skip
    val prefix = widenIfNeeded(
      docsets.select(col("doc_id"), col("n_sh"),
        explode(slice(col("shs"), lit(1),
          (col("n_sh") - ceilT(col("n_sh")) + 1).cast("int"))).as("shingle")),
      parts, col("shingle"))
    val candidates = prefix.as("x").join(prefix.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.doc_id") < col("y.doc_id") &&
          least(col("x.n_sh"), col("y.n_sh")) >=
            ceilT(greatest(col("x.n_sh"), col("y.n_sh"))))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    candidates
      .join(docsets.select(col("doc_id").as("doc_a"), col("shs").as("shs_a"),
        col("n_sh").as("na")), Seq("doc_a"))
      .join(docsets.select(col("doc_id").as("doc_b"), col("shs").as("shs_b"),
        col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** The full inverted-index strategy, directly (no cost dispatch) — also
    * the reference side of the FunctionsSpec equivalence property.
    */
  private[graft] def ngramJaccardPairsNaive(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Long] = None): DataFrame =
    // shingleIndex caches the raw exploded index once; the capped view is a
    // cheap broadcast-anti probe over it per use (join sides + size table).
    // parts = 0 (inherit the session width): this direct path is the spec
    // equivalence reference, exercised on tiny corpora only
    fullIndexPairs(shingleIndex(docs, idCol, textCol, n, maxDocFreq), threshold, 0)

  /** |A∩B| counted from the shingle self-join; |A∪B| = |A|+|B|−|A∩B|.
    * `parts`: collision-mass-proportional width for the self-join and its
    * pair-count partial agg ([[shuffleWidth]]); at or below the session
    * width the plan is untouched.
    */
  private def fullIndexPairs(sh: DataFrame, threshold: Double, parts: Int): DataFrame = {
    val wide = widenIfNeeded(sh, parts, col("shingle"))
    // CACHED (r21): the two size joins below are aliased consumers, and
    // alias-renamed broadcast subtrees defeat exchange reuse — the plan ran
    // the whole index-wide aggregation (cache scan + hot-shingle anti-probe
    // + two-level hash agg + exchange) TWICE, measured as two identical
    // 5000-row-output stage pairs in the r21 stage profile and the query's
    // worst JIT-band surface. The cached table is one row per doc (≪ index
    // at every scale), so this is the cheapest intermediate the query pins;
    // same cache contract as shingleIndexWithDf (callers clear per run).
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh")).cache()
    // r22 (guide §3.1 — pick the join strategy deliberately): while the
    // capped index fits the broadcast threshold the planner broadcasts the
    // build side (the official sf0.1 plan — the gate below cannot strip
    // that, it uses the SAME estimate the planner's own broadcast decision
    // reads). Past the threshold the planner's default is SORT-merge over
    // STRING shingle keys; the SHUFFLE_HASH hint flips that to a
    // per-partition hash build (bounded: ≈ index_rows/parts rows per task
    // under shuffleWidth's σ-proportional width — zero spill measured at
    // ×30). Measured honestly at ×40 (plans/r22/
    // q_dedup_ngram_scale_{before,after}.txt + OPTIMIZATION_r22.md §4):
    // CONVERGED cpu is a wash (sorted runs C2-compile into cheap
    // prefix-comparison loops), but the FIRST execution — the only
    // execution a one-shot batch job at scale ever runs — pays the SMJ
    // sort+deopt churn: join stage 233 → 86 cpu-s, stage GC 38 → 5 s,
    // query 463 → 301 cpu-s, and the ×30 leg's warm min-of-2 wall drops
    // 22.0 → 19.0 s. Same 50,631,160 pair rows out either way.
    val buildSide = if (broadcastable(sh)) wide else wide.hint("SHUFFLE_HASH")
    val joined = wide.as("a").join(buildSide.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // re-key the pair-count agg at the proportional width too — THIS is
    // where the ×30 leg measurably spilled (see [[shuffleWidth]]): without
    // it the final agg exchanges back to the session width and buffers
    // sigma/session entries per task. Collision pairs are mostly unique, so
    // trading the (non-reducing) map-side partial for a raw re-key costs
    // nothing; the groupBy then satisfies its distribution and adds no
    // further exchange. Guarded so small inputs keep their exact plans.
    val keyed = widenIfNeeded(joined, parts, col("doc_a"), col("doc_b"))
    val inter = keyed.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("sa.n_sh") + col("sb.n_sh") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signatures as one narrow projection — no explode, no shuffle:
    * the custom [[MinHashSig]] expression folds each doc's shingle set into a
    * long[numHashes] element-wise minimum in a single pass.
    * Output: doc_id, sig ARRAY<LONG>.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128): DataFrame =
    // spread like every sibling sketch projection: the numHashes-way fold
    // is the arithmetic-heavy stage and must not run on one split
    Partitioning.spread(docs).select(col(idCol).as("doc_id"),
        TextAnalysis.distinctShingles(col(textCol), n).as("shs"))
      .where(size(col("shs")) > 0)
      .select(col("doc_id"), MinHashSig(col("shs"), numHashes).as("sig"))

  /** MinHash+LSH near-dup pairs: band the signature, bucket-join, then verify
    * candidates with exact Jaccard (so false positives never escape; false
    * negatives require every one of `bands` band-collisions to miss).
    *
    * Cache contract (shared by [[ngramJaccardPairs]] / [[cosinePairsLSH]]):
    * heavy intermediates read twice within one execution (band keys, shingle
    * sets) are persisted and stay so until the caller clears them — a
    * long-lived session should `spark.catalog.clearCache()` after
    * materializing the pairs, or compose through [[clustersFromMinhash]],
    * which releases them as soon as the components are built.
    */
  // default threshold matches what the 32-band/4-row banding is DESIGNED
  // for: at 0.5 the all-band miss probability is high enough to measurably
  // drop boundary pairs (callers lowering the threshold should widen bands)
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      numHashes: Int = 128, bands: Int = 32, threshold: Double = 0.8): DataFrame =
    minhashPairsScoped(docs, idCol, textCol, n, numHashes, bands, threshold)._1

  /** [[minhashPairs]] plus handles to its persisted intermediates, so eager
    * consumers can unpersist them the moment the pair set is materialized.
    */
  private[functions] def minhashPairsScoped(docs: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, bands: Int,
      threshold: Double): (DataFrame, Seq[DataFrame]) = {
    // ONE tokenization pass feeds both the banding and the verification:
    // the shingle-array table is cached and shared (and its plan is
    // identical to what a sibling verifyJaccard over the same corpus
    // builds, so Spark's cache manager serves THAT from the same copy —
    // q_minhash_recall's truth set rides it too). Band keys cache
    // separately because the bucket self-join reads them twice and the
    // 128-hash fold must not re-run per side.
    val sets = shingleSets(docs, idCol, textCol, n)
    // Shingle-less docs (shorter than n words) produce zero band keys
    // inside MinHashBandKeys, so posexplode drops them — no filter pass.
    val bandKeys = sets.select(col("doc_id"),
        posexplode(MinHashBandKeys(col("sh"), numHashes, bands)))
      .toDF("doc_id", "band", "band_key")
      .cache()
    val candidates = bandKeys.as("x").join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    (verifyOnSets(candidates, sets, threshold), Seq(bandKeys, sets))
  }

  /** Exact-Jaccard verification of candidate pairs (array intersect over the
    * two docs' shingle sets — joins keyed by doc id, cost ∝ candidates).
    * Same cache contract as [[minhashPairs]].
    */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): DataFrame =
    verifyJaccardScoped(candidates, docs, idCol, textCol, n, threshold)._1

  private def verifyJaccardScoped(candidates: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double): (DataFrame, DataFrame) = {
    val sets = shingleSets(docs, idCol, textCol, n)
    (verifyOnSets(candidates, sets, threshold), sets)
  }

  /** Per-doc shingle arrays, cached: joined once per pair side — without
    * the cache the shingle expression (regex tokenization) re-evaluates
    * over the full corpus per consumer. Built identically everywhere so
    * the cache manager canonicalizes sibling calls over the same corpus
    * onto one copy.
    */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      TextAnalysis.distinctShingles(col(textCol), n).as("sh")).cache()

  private def verifyOnSets(candidates: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        // nullif: two shingle-less docs give |A∪B| = 0, and ANSI division
        // by zero THROWS (Spark 4 default) — undefined Jaccard becomes
        // null and fails the ≥-threshold filter instead of killing the job
        (size(array_intersect(col("sa.sh"), col("sb.sh"))) /
          nullif(size(array_union(col("sa.sh"), col("sb.sh"))), lit(0))).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** 32-bit SimHash signature per doc, via the single-pass [[SimHashSig]]
    * expression — a narrow projection inside the scan, no row inflation, no
    * aggregation shuffle. Uses the oracle-portable md5-prefix hash so DuckDB
    * can mirror the exact signatures.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Partitioning.spread(docs).select(col(idCol).as("doc_id"),
        SimHashSig(TextAnalysis.tokens(col(textCol))).as("simhash"))
      .where(col("simhash").isNotNull)

  /** SimHash near-dup pairs with hamming distance ≤ maxDist (≤ 3 for exact
    * recall under 4-byte banding: 3 flipped bits cannot hit all 4 bands).
    * Convenience form of [[simhashPairsScoped]] that drops the cache
    * handles — for callers whose session hygiene already clears caches per
    * execution (Bench/Verify); long-lived sessions should use the scoped
    * variant and unpersist after materializing the pairs.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    simhashPairsScoped(docs, idCol, textCol, maxDist)._1

  /** [[simhashPairs]] plus the cached intermediates it pins (the
    * minhashPairsScoped/cosinePairsLSHScoped contract): both join sides read
    * the banded signature table and the per-token MD5 signature is the
    * expensive stage, so it is cached — the caller unpersists the returned
    * handles once the pair set is materialized instead of pinning executor
    * storage for the session lifetime.
    */
  def simhashPairsScoped(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): (DataFrame, Seq[DataFrame]) = {
    require(maxDist <= 3, "4-byte banding guarantees recall only for maxDist <= 3")
    val sig = simhashSignatures(docs, idCol, textCol)
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("shiftright(simhash, band * 8) & 255"))
      .cache()
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      // filter BEFORE distinct: hamming is a pure function of the pair, so
      // the result is identical — but the other order carried every
      // false-positive band collision (hamming 4..32, the common case)
      // through the distinct's full shuffle just to drop it afterwards
      .where(col("hamming") <= maxDist)
      .distinct()
    (pairs, Seq(banded))
  }

  /** Near-dup clusters from the sub-quadratic pair source: MinHash band
    * join → exact-Jaccard verify → [[connectedComponents]]. Candidate
    * generation is O(n·bands) index rows instead of the exact inverted-index
    * self-join's Σdf² worst case (≈ n·cap even with the df cap), so this is
    * the 100 TB default; the exact [[ngramJaccardPairs]]-fed composition
    * remains the small-corpus/oracle mode. Verification is exact, so at the
    * 0.8 design threshold the result equals the exact uncapped closure up to
    * an all-band miss probability ≈ 5e-8 per qualifying pair.
    */
  def clustersFromMinhash(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val (pairs, caches) = minhashPairsScoped(docs, idCol, textCol, n, numHashes,
      bands, threshold)
    // connectedComponents materializes the pair set (driver collect or
    // label-propagation fixpoint) before returning, so the pair-stage caches
    // can be released here instead of pinning executor storage for the
    // session lifetime
    try connectedComponents(pairs)
    finally caches.foreach(_.unpersist(false))
  }

  /** Near-dup pairs → clusters: connected components over the pair graph,
    * labeling every member with the minimum doc id of its component (the
    * canonical survivor; everything else is droppable).
    * Output: doc_id, canonical_id (only docs that appear in some pair).
    *
    * The pair set is by construction the near-duplicate FRACTION of the
    * corpus — even at 100 TB it is typically small enough for a driver-side
    * union-find. Edges arrive via `limit(cap+1).collect()` — the limit
    * bounds the driver transfer globally (incremental partition fetch), at
    * the price of transiently boxed rows (~100 MB at the default 2 M-edge
    * cap); the retained state is primitive arrays only (~40 B per edge:
    * 2 × 8 B edge ends + sorted node table + int parents). Above the cap:
    * distributed large-star/small-star contraction
    * ([[connectedComponentsDistributed]]).
    */
  def connectedComponents(pairs: DataFrame,
      driverSideEdgeLimit: Int = 2_000_000): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // the primitive union-find below is an INTEGRAL-id fast path (sorted
    // long arrays, binary-search indices); string-keyed corpora (UUIDs) and
    // fractional numerics (a DOUBLE/DECIMAL id would TRUNCATE under
    // cast(long), conflating distinct docs like 7.2 and 7.9 into node 7)
    // route to the type-agnostic distributed propagation instead
    val integral = pairs.schema("doc_a").dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (!integral) return connectedComponentsDistributed(pairs)
    // limit(cap+1) bounds the driver transfer GLOBALLY (CollectLimit fetches
    // partitions incrementally), so a runaway pair explosion falls back to
    // the distributed path instead of shipping partitions × cap edges; the
    // boxed rows are transient, the retained state is two primitive arrays.
    val rows = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .limit(driverSideEdgeLimit + 1)
      .as[(Long, Long)].collect()
    if (rows.length > driverSideEdgeLimit) return connectedComponentsDistributed(pairs)
    val n = rows.length
    val ea = new Array[Long](n); val eb = new Array[Long](n)
    for (i <- 0 until n) { ea(i) = rows(i)._1; eb(i) = rows(i)._2 }
    // sorted distinct node table; union-find runs over int indices into it
    val nodes = {
      val all = new Array[Long](2 * n)
      System.arraycopy(ea, 0, all, 0, n); System.arraycopy(eb, 0, all, n, n)
      java.util.Arrays.sort(all)
      var w = 0
      for (i <- all.indices)
        if (i == 0 || all(i) != all(i - 1)) { all(w) = all(i); w += 1 }
      java.util.Arrays.copyOf(all, w)
    }
    def idx(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    val parent = Array.tabulate(nodes.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for (i <- 0 until n) {
      val (ra, rb) = (find(idx(ea(i))), find(idx(eb(i))))
      // nodes is id-sorted, so the smaller index IS the smaller doc id:
      // rooting at min(ra, rb) makes every root the component's minimum
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels = nodes.indices.map(i => (nodes(i), nodes(find(i))))
    spark.createDataset(labels).toDF("doc_id", "canonical_id")
  }

  /** Distributed fallback: alternating large-star/small-star edge rewriting
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — two keyed shuffles per round, no driver-side graph state,
    * and convergence in O(log n) rounds INDEPENDENT of component diameter.
    * Plain min-label propagation (the previous implementation) is
    * O(diameter): fine for near-dup cliques, but an adversarially-chained
    * corpus — a long run of pairwise-similar documents forming one path —
    * made it exceed any fixed round cap and return partial labels. The
    * star rounds contract such a path logarithmically instead.
    *
    * Each round rewrites the edge set; the fixpoint is per-component stars
    * rooted at the component minimum, from which labels read off directly.
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(Γ(u) ∪ {u});
    *  - small-star(u): every neighbor v < u, and u itself, re-attach to
    *    m = min of those neighbors.
    * Both preserve connectivity and never raise a node's minimum reachable
    * label; edges are kept (lo, hi)-normalized and distinct so the set
    * shrinks toward the star form, detected via an xor-of-hashes checksum.
    */
  def connectedComponentsDistributed(pairs: DataFrame, maxIterations: Int = 30): DataFrame = {
    val allNodes = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct().cache()
    def checksum(df: DataFrame): Long =
      df.agg(coalesce(expr("bit_xor(xxhash64(lo, hi))"), lit(0L)))
        .first().getLong(0) // coalesce: bit_xor over zero rows is NULL
    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = nb.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      nb.join(mins, "u").where(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi")) // m ≤ u < v: normalized
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val byMax = e.select(col("hi").as("u"), col("lo").as("v")) // v < u
      val mins = byMax.groupBy("u").agg(min("v").as("m")) // m < u
      byMax.join(mins, "u")
        .select(col("m").as("lo"), col("v").as("hi")) // m ≤ v
        .union(mins.select(col("m").as("lo"), col("u").as("hi"))) // m < u
        .where(col("lo") =!= col("hi"))
        .distinct()
    }
    // each round MUST truncate lineage, not just cache: largeStar references
    // its input twice and smallStar three times, so the logical plan grows
    // exponentially in round count — by round ~10 analysis itself OOMs the
    // driver. A session with a checkpoint dir configured gets RELIABLE round
    // snapshots (parquet write + read-back under that dir) — localCheckpoint
    // pins round state to executor local storage, where one lost executor on
    // a big cluster kills the whole iteration; reliable is the right default
    // at 1000-executor scale, local the right default for a single-JVM
    // session. Parquet snapshots rather than RDD .checkpoint() because the
    // files are then OURS to reclaim: the context cleaner only deletes RDD
    // checkpoint files when spark.cleaner.referenceTracking.cleanCheckpoints
    // is on (default OFF), so .checkpoint() would leak ~maxIterations full
    // edge-set snapshots per call. Each superseded round is deleted as soon
    // as its successor is materialized (≤2 snapshots live at any moment);
    // only the final labels snapshot outlives the call — the returned
    // DataFrame reads from it — under `<checkpointDir>/graft-cc-<uuid>`,
    // safe to delete once consumers have materialized.
    val sc = pairs.sparkSession.sparkContext
    val session = pairs.sparkSession
    val reliableDir = sc.getCheckpointDir.map(d =>
      new org.apache.hadoop.fs.Path(d, "graft-cc-" + java.util.UUID.randomUUID))
    val ckptFs = reliableDir.map(_.getFileSystem(sc.hadoopConfiguration))
    var lastSnap: Option[org.apache.hadoop.fs.Path] = None
    var snapCount = 0
    def snapshot(df: DataFrame, name: String): DataFrame = {
      val snap = new org.apache.hadoop.fs.Path(reliableDir.get, name)
      df.write.parquet(snap.toString)
      val out = session.read.parquet(snap.toString)
      lastSnap.foreach(ckptFs.get.delete(_, true)) // superseded: reclaim now
      lastSnap = Some(snap)
      out
    }
    def truncate(df: DataFrame): DataFrame =
      if (reliableDir.isDefined) {
        val out = snapshot(df, f"round-$snapCount%03d")
        snapCount += 1
        out
      } else df.localCheckpoint()
    var edges = truncate(pairs
      .select(least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct())
    var chk = checksum(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val next = truncate(smallStar(largeStar(edges)))
      val nextChk = checksum(next)
      edges = next
      converged = nextChk == chk
      chk = nextChk
      i += 1
    }
    if (!converged)
      // silent partial labels would split one real cluster into several and
      // quietly keep extra duplicates downstream — make the cap audible
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connected components did NOT converge after $maxIterations rounds; " +
          "labels are partial — rerun with a higher maxIterations")
    // at the star fixpoint every non-minimum node has exactly one edge, to
    // its component minimum; the groupBy-min also makes a NON-converged
    // edge set read off deterministically (partial but single-labeled)
    val roots = edges.groupBy(col("hi").as("doc_id")).agg(min("lo").as("root"))
    val labelsRaw = allNodes.join(roots, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("canonical_id"))
    val labels =
      if (reliableDir.isDefined)
        // the labels snapshot also retires the last edge round — after this
        // the call dir holds ONLY the (node-sized) labels the caller reads
        snapshot(labelsRaw, "labels")
      else {
        val l = labelsRaw.cache()
        l.count() // materialize before releasing the caches labels read from
        l
      }
    allNodes.unpersist(false)
    labels
  }

  /** Apply near-dup clusters to the corpus: keep every canonical survivor
    * and every unclustered doc, drop the rest — the end-to-end "dedup the
    * training set" operator. The drop list (non-canonical cluster members)
    * is the duplicate fraction, so the anti-join broadcasts it.
    */
  def dropNearDuplicates(docs: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    docs.join(
      broadcast(clusters.where(col("doc_id") =!= col("canonical_id"))
        .select(col("doc_id").as(idCol))),
      Seq(idCol), "left_anti")

  /** Embedding near-dup pairs: cosine ≥ threshold, exact via the
    * grid-partitioned equi-join ([[Similarity.cosinePairs]] — evenly
    * shuffled Θ(n²) compute, no broadcast nested loop). For high thresholds
    * the sub-quadratic [[Similarity.cosinePairsLSH]] is the 100 TB path.
    */
  def embeddingCosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    Similarity.cosinePairs(vectors, idCol, vecCol, threshold)

  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs, with the
    * candidate set bounded to nearest-centroid cells
    * ([[Similarity.cosinePairsWithinCells]]) — the embedding-space analog
    * of [[minhashPairs]]' band bucketing, and the 100 TB path for semantic
    * dedup (the exact [[embeddingCosinePairs]] grid join is the
    * small-corpus/oracle mode). Verification is exact cosine, so false
    * positives never escape; misses are cross-cell only.
    */
  def semanticDedupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double,
      maxCellRows: Long = 4000000L): DataFrame =
    Similarity.cosinePairsWithinCells(vectors, idCol, vecCol, centroids,
      threshold, maxCellRows)

  /** [[semanticDedupPairs]] → connected components → (doc, canonical)
    * cluster labels, ready for [[dropNearDuplicates]]. Same scoped-release
    * pattern as [[clustersFromMinhash]]: components materialize the pair
    * set, so the assignment cache is freed before return.
    */
  def semanticDedupClusters(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double): DataFrame = {
    val (pairs, caches) = Similarity.cosinePairsWithinCellsScoped(
      vectors, idCol, vecCol, centroids, threshold)
    try connectedComponents(
      pairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
    finally caches.foreach(_.unpersist(false))
  }

  /** Benchmark decontamination report: for every corpus doc sharing at
    * least one distinct word n-gram with the benchmark set, the count of
    * distinct shared n-grams (|S_doc ∩ S_bench| — S_bench is the UNION of
    * the benchmark docs' shingles, the standard eval-leak test: GPT-3's
    * 13-gram / PaLM's 8-gram overlap checks are this shape).
    *
    * Scale posture: the asymmetry is the whole design. A benchmark suite is
    * MBs against a 100 TB corpus, so its distinct-shingle set broadcasts —
    * the corpus side is ONE narrow tokenize+explode feeding a map-side hash
    * probe (the broadcast join), and only MATCHING rows (≈ the leaked
    * fraction) reach the per-doc count, whose partial aggregation shrinks
    * them map-side again. No corpus-sized shuffle exists in the plan; use
    * n ≥ 5 so chance collisions stay near zero and the matched fraction
    * stays tiny.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 5): DataFrame = {
    val sh = Partitioning.spread(docs).select(col(idCol).as("doc_id"),
      explode(TextAnalysis.distinctShingles(col(textCol), n)).as("shingle"))
    val benchSh = benchmark
      .select(explode(TextAnalysis.distinctShingles(col(benchTextCol), n)).as("shingle"))
      .distinct()
    sh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
  }

  /** Drop corpus docs whose benchmark overlap reaches `minOverlap` distinct
    * n-grams — the apply step over [[contaminationReport]]. The flagged set
    * is the leaked fraction of the corpus (tiny by the same argument that
    * lets the benchmark broadcast), so the anti-join broadcasts it, exactly
    * like [[dropNearDuplicates]]'s drop list.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 5,
      minOverlap: Long = 2L): DataFrame = {
    val flagged = contaminationReport(docs, idCol, textCol, benchmark, benchTextCol, n)
      .where(col("n_overlap") >= minOverlap).select(col("doc_id").as(idCol))
    docs.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
