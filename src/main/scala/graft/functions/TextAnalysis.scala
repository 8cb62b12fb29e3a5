package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are pure
  * column expressions (whole-stage-codegen friendly, no UDFs), so they run
  * inside the parquet scan's generated loop and distribute trivially.
  */
object TextAnalysis {

  /** Whitespace tokens of a trimmed document — any whitespace run is one
    * separator (single-space split would keep newline-joined pseudo-tokens
    * and emit empty tokens on double spaces). The [[WhitespaceTokens]]
    * expression, not `split(trim(text), "\\s+")`: identical semantics
    * (generative spec pins them), but Spark's split re-compiles its regex
    * per row — a per-row tax under every text operator — and routing the
    * DataFrame-level tokenization through [[Tokenize]]'s scanner makes it
    * literally the same code path the custom expressions use.
    */
  def tokens(text: Column): Column = WhitespaceTokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Contiguous word n-grams ("shingles"), the dedup unit. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // one shingle per window position; empty array when the doc is shorter than n
    when(size(toks) < n, array()).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Distinct shingles via the custom [[WordShingles]] expression (the HOF
    * pipeline above runs interpreted — spec-checked identical semantics).
    */
  def distinctShingles(text: Column, n: Int): Column = WordShingles(text, n)

  /** Crude BPE-ish subword count: whitespace tokens plus an extra unit per 4
    * characters of long tokens (a deterministic proxy for subword splits).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(4.0)).cast("long")))

  // word lists live in TextProfile and are SHARED here: the profile-based
  // variants are documented as arithmetic-identical to these column
  // versions, and a list edited in one place but not the other would break
  // that parity with no compile error
  private val Stopwords = TextProfile.Stopwords.toSeq.sorted

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*)))

  /** Quality features + a composite score in [0,1]: length band, mean token
    * length band, stopword presence. Deterministic arithmetic only.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val meanLen = (length(trim(text)) - (nTok - 1)) / nTok // mean token length
    val stopRatio = stopwordCount(text).cast("double") / nTok
    val lengthBand = when(nTok.between(8, 512), 1.0).otherwise(0.0)
    val tokenBand = when(meanLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    val stopBand = when(stopRatio.between(0.01, 0.6), 1.0).otherwise(0.0)
    round((lengthBand + tokenBand + stopBand) / 3.0, 4)
  }

  /** N-gram-heuristic language ID: score English/Spanish/German stopword
    * hits over whitespace tokens; the max-scoring language wins, `und`
    * (undetermined) on zero hits. Tie order: en > es > de.
    */
  def languageId(text: Column): Column = {
    val en = TextProfile.En.toSeq.sorted
    val es = TextProfile.Es.toSeq.sorted
    val de = TextProfile.De.toSeq.sorted
    def score(ws: Seq[String]) = size(filter(tokens(lower(text)), t => t.isin(ws: _*)))
    val (se, ss, sd) = (score(en), score(es), score(de))
    when(se === 0 && ss === 0 && sd === 0, "und")
      .when(se >= ss && se >= sd, "en")
      .when(ss >= sd, "es")
      .otherwise("de")
  }

  /** Rolling-hash fingerprint via the codegen'd [[PolyHash]] expression. */
  def fingerprint(text: Column): Column = PolyHash(text)

  /** Corpus vocabulary: the `topK` most frequent whitespace tokens with
    * their occurrence counts — the input a tokenizer-training step (BPE
    * merges, vocab selection) consumes. One explode feeding a two-level
    * hash aggregation (map-side partials collapse each partition's token
    * stream to its local vocab before the shuffle, so the exchange carries
    * ~vocab × partitions rows, not the corpus token stream), then a top-K
    * sort over the distinct vocab — ≪ corpus by Heaps' law, so the final
    * ordering is a small-data step at any corpus size. Ties break on the
    * token so the result is deterministic and oracle-comparable.
    */
  def tokenFrequencies(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    Partitioning.spread(docs)
      // empty tokens (whitespace-only doc → [""]) are dropped AFTER the
      // explode: a row-level length predicate stays in whole-stage codegen,
      // whereas an ArrayFilter HOF on the generator input is a
      // CodegenFallback that drags split+explode to interpreted eval
      // (plan-verified: the Filter now sits above Generate inside the
      // codegen span instead of forcing interpreted projection)
      .select(explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(topK)

  /** Out-of-vocabulary rate per document — rare-token density, the
    * vocabulary-relative quality signal (a doc whose tokens mostly fall
    * outside the corpus top-K is boilerplate, another language, or
    * noise). The top-K vocabulary ([[tokenFrequencies]], deterministic
    * (count desc, token) order) is DATA, not a literal — so it is
    * collected (bounded by topK, the centroid-collect pattern) and
    * compiled into one in-scan membership filter: scoring itself is
    * zero-shuffle, and the only corpus-wide work is the vocabulary
    * aggregation the pipeline already ran for tokenizer training.
    */
  def oovRate(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0 && topK <= 1000000,
      s"oovRate: topK must be in [1, 1e6] (the vocab is driver-collected), got $topK")
    val vocab = tokenFrequencies(docs, textCol, topK)
      .collect().map(_.getString(0)).toSeq
    val n = tokenCount(col(textCol)).cast("long")
    docs.withColumn("n_tokens", n)
      .withColumn("n_oov", OovCount(col(textCol), vocab))
      .withColumn("oov_rate", round(col("n_oov") * 1.0 / col("n_tokens"), 4))
  }

  /** Email addresses — deliberately restricted to syntax whose semantics
    * agree between Java regex (Spark) and RE2 (DuckDB, Go tooling): no
    * lookaround, no backreferences, '-' last in every class. Pattern
    * breadth follows the common training-pipeline scrubbers, not RFC 5322.
    */
  private[functions] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-like digit runs: optional +, then ≥8 chars of digits with
    * (), space, - separators, ending in a digit.
    */
  private[functions] val PhoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** PII scrubbing for training corpora: replace emails and phone-like
    * digit runs with stable placeholder tokens — the standard
    * pre-training redaction pass. Pure `regexp_replace` (codegen'd,
    * replace-all), so it runs inside the scan projection with zero
    * shuffle; emails first, so a phone-looking digit run inside an
    * address is consumed by the email placeholder rather than split.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  // ——— model-based quality classification ([[HashedBagLinear]]) ———

  /** Logit of a fastText-style hashed-bag linear quality classifier: mean
    * of the tokens' bucket weights plus `bias`, one in-scan pass, zero
    * shuffle ([[HashedBagLinear]]). `weights` is the trained model — one
    * double per hash bucket.
    */
  def classifierLogit(text: Column, weights: Array[Double], bias: Double): Column =
    HashedBagLinear(text, weights, bias)

  /** Probability from a classifier logit (sigmoid). Kept separate from
    * the logit so oracle-gated flows can stay in exactly-replayable
    * linear space and threshold there instead.
    */
  def classifierScore(logit: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-logit))

  /** Keep-decision at probability `threshold`, evaluated in logit space
    * (sigmoid is monotone, so `score ≥ t  ⇔  logit ≥ ln(t/(1−t))`) — no
    * `exp` in the decision path.
    */
  def classifierKeep(logit: Column, threshold: Double = 0.5): Column = {
    require(threshold > 0.0 && threshold < 1.0,
      s"classifierKeep: threshold must be in (0,1), got $threshold")
    logit >= math.log(threshold / (1.0 - threshold))
  }

  /** WordPiece-style greedy longest-match subword segmentation against a
    * broadcast vocabulary ([[GreedySubwords]]) — tokenizer INFERENCE, the
    * apply side of the lifecycle [[tokenFrequencies]] trains for.
    */
  def subwordTokenize(text: Column, vocab: Seq[String]): Column =
    GreedySubwords(text, vocab)

  // ——— single-pass profile path (the hot-loop variant of the above) ———

  /** All token statistics in one tokenization pass ([[TextProfile]]): the
    * HOF functions above re-split the text per statistic and run
    * interpreted; batch scoring queries should select `profile` once and
    * derive from its fields.
    */
  def profile(text: Column): Column = TextProfile(text)

  /** [[qualityScore]] over a profile struct — identical arithmetic, shared
    * tokenization.
    */
  def qualityFromProfile(p: Column): Column = {
    val nTok = p.getField("n_tokens").cast("double")
    val meanLen = (p.getField("n_chars") - (nTok - 1)) / nTok
    val stopRatio = p.getField("n_stopwords").cast("double") / nTok
    val lengthBand = when(nTok.between(8, 512), 1.0).otherwise(0.0)
    val tokenBand = when(meanLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    val stopBand = when(stopRatio.between(0.01, 0.6), 1.0).otherwise(0.0)
    round((lengthBand + tokenBand + stopBand) / 3.0, 4)
  }

  /** All within-doc repetition statistics in one tokenization pass
    * ([[RepetitionProfile]]): n_tokens, top-2-gram multiplicity, distinct
    * 3-grams — the Gopher-style repetition quality signals.
    */
  def repetitionProfile(text: Column): Column = RepetitionProfile(text)

  /** Fraction of 2-gram positions occupied by the doc's most frequent
    * 2-gram — high values mean a phrase loop ("click here click here …").
    * NULL when the doc has no 2-gram — an explicit n>1 guard, not nullif:
    * a one-token doc makes the denominator 0 but an (impossible-today)
    * zero-token doc would make it NEGATIVE, and a negative denominator
    * yields a nonsense in-range fraction instead of a division error.
    */
  def topBigramFrac(p: Column): Column = {
    val nb = p.getField("n_tokens") - 1
    when(nb > 0, p.getField("top_bigram_count") / nb)
  }

  /** Fraction of 3-gram positions whose 3-gram occurs more than once in
    * the doc (1 − distinct/total) — boilerplate and template repetition.
    * NULL when the doc has no 3-gram (n ≤ 2 makes the denominator zero OR
    * negative — a plain nullif would turn a one-token doc into frac 1.0
    * via 1 − 0/(−1) and silently drop it under the keep rule).
    */
  def dupTrigramFrac(p: Column): Column = {
    val n3 = p.getField("n_tokens") - 2
    when(n3 > 0, lit(1.0) - p.getField("distinct_trigrams") / n3)
  }

  /** Gopher-style repetition keep rule over a [[repetitionProfile]] struct:
    * both fractions at or under their thresholds. Docs too short to define
    * a fraction (NULL) are kept — shortness is [[qualityScore]]'s signal,
    * not repetition's.
    */
  def repetitionKeep(p: Column, maxTopBigramFrac: Double = 0.08,
      maxDupTrigramFrac: Double = 0.05): Column =
    coalesce(topBigramFrac(p) <= maxTopBigramFrac, lit(true)) &&
      coalesce(dupTrigramFrac(p) <= maxDupTrigramFrac, lit(true))

  /** [[languageId]] over a profile struct — identical decision chain. */
  def languageIdFromProfile(p: Column): Column = {
    val (se, ss, sd) = (p.getField("en_hits"), p.getField("es_hits"), p.getField("de_hits"))
    when(se === 0 && ss === 0 && sd === 0, "und")
      .when(se >= ss && se >= sd, "en")
      .when(ss >= sd, "es")
      .otherwise("de")
  }
}
