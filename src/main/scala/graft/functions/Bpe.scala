package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge training (Sennrich et al. 2016): iteratively merge the most
  * frequent adjacent symbol pair, starting from single codepoints — the
  * MERGE-learning step the tokenizer lifecycle was missing
  * ([[TextAnalysis.tokenFrequencies]] selects whole tokens; this learns
  * subword units). Distribution shape: the only corpus-scale work is the
  * word-frequency aggregation (one explode + hash agg, the
  * tokenFrequencies plan — map-side partials collapse each partition's
  * token stream pre-shuffle); the merge loop runs driver-side over the
  * BOUNDED lexicon (Heaps' law: distinct words ≪ corpus; the
  * kmeansCentroidsLocal pattern), so each round's pair count touches each
  * distinct word once, never each occurrence. [[GreedySubwords]] consumes
  * the merge outputs as its piece vocabulary (WordPiece-style greedy
  * longest-match apply over a BPE-learned vocab — the rank-ordered BPE
  * apply and greedy longest-match can differ on nested pieces; greedy is
  * this engine's documented apply semantics, shared with q_subword).
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairN: Long)

  /** UTF-8 binary order (DuckDB's default collation, Spark's UTF8String
    * sort order) so driver-side tiebreaks replay identically in the
    * oracle's ORDER BY — Java String.compareTo is UTF-16 order, which
    * diverges on supplementary-plane codepoints.
    */
  private def u8Lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** Bounded training lexicon: the `maxWords` most frequent tokens with
    * counts (the [[TextAnalysis.tokenFrequencies]] plan), excluding any
    * token containing U+0001 — the symbol delimiter the oracle's
    * string-state replay reserves; a control char that never appears in
    * real text, and the exclusion runs BEFORE the top-K so both sides
    * train on the same lexicon.
    */
  def lexicon(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    Partitioning.spread(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0 && !col("token").contains("\u0001"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(maxWords)

  /** Train: one distributed lexicon aggregation, then the driver-side
    * merge loop. `maxWords ≤ 1e6` keeps the collect bounded (the OOV-vocab
    * pattern).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1000): Seq[Merge] = {
    require(numMerges > 0, s"bpeTrain: numMerges must be positive, got $numMerges")
    require(maxWords > 0 && maxWords <= 1000000,
      s"bpeTrain: maxWords must be in [1, 1e6] (the lexicon is driver-collected), got $maxWords")
    val lex = lexicon(docs, textCol, maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learnMerges(lex, numMerges)
  }

  /** The learned piece vocabulary for [[GreedySubwords]]: each merge's
    * output symbol (always ≥ 2 codepoints; two merge paths can produce the
    * same string — deduped).
    */
  def vocab(merges: Seq[Merge]): Seq[String] =
    merges.map(m => m.left + m.right).distinct

  /** Rank-ordered BPE ENCODING — the standard BPE apply, vs
    * [[GreedySubwords]]' WordPiece-style longest match (the two diverge on
    * nested pieces: merges {(b,c),(a,b)} encode "abc" as [a, bc], greedy
    * over the same piece set takes [ab, c]; both ship, both oracle-gated).
    * One left-to-right pass per merge suffices: merging (a,b) can only
    * create pairs CONTAINING the new symbol ab, and any merge involving ab
    * was necessarily learned AFTER (a,b) — so sequential rank order is
    * exactly the priority order, and exactly the chained-replace() replay
    * the oracle runs. Skips a merge in O(1) when its pair is absent (the
    * adjacent-pair set), so cost is O(merges + applied·|word|), not
    * O(merges·|word|) — the shape a real 32k-merge model needs.
    */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    if (syms.length < 2) return syms
    var present = adjacentPairs(syms)
    for ((a, b) <- merges if syms.length > 1 && present.contains((a, b))) {
      syms = applyMerge(syms, a, b)
      present = adjacentPairs(syms)
    }
    syms
  }

  private def adjacentPairs(syms: Array[String]): scala.collection.Set[(String, String)] = {
    val s = scala.collection.mutable.HashSet.empty[(String, String)]
    var i = 0
    while (i < syms.length - 1) { s += ((syms(i), syms(i + 1))); i += 1 }
    s
  }

  /** Merge every (a, b) occurrence leftmost-first, non-overlapping,
    * resuming after each substitution — the one application semantics the
    * trainer, the encoder, and the SQL replace() replay all share.
    */
  private[functions] def applyMerge(syms: Array[String], a: String,
      b: String): Array[String] = {
    val m = a + b
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        buf += m; j += 2
      } else { buf += syms(j); j += 1 }
    }
    buf.toArray
  }

  /** The classic BPE loop over a weighted lexicon. Symbols start as single
    * codepoints; each round counts adjacent pairs weighted by word
    * frequency, picks the most frequent — ties on the smaller
    * (left, right) in UTF-8 binary order — and merges its occurrences
    * LEFTMOST-FIRST, NON-OVERLAPPING, resuming after each merge: exactly
    * the semantics of one SQL `replace()` over a delimiter-wrapped symbol
    * string, which is how the oracle replays the recurrence round by
    * round (a chain of plain CTEs, one pair-count + argmax + replace per
    * rank — no recursive aggregation needed because numMerges is a
    * compile-time constant). Stops early when no adjacent pair remains.
    */
  def learnMerges(lexicon: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] = lexicon.iterator.map { case (w, n) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), n)
    }.toArray
    val out = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        for (e <- counts) {
          val better = best == null || e._2 > best._2 ||
            (e._2 == best._2 && (u8Lt(e._1._1, best._1._1) ||
              (e._1._1 == best._1._1 && u8Lt(e._1._2, best._1._2))))
          if (better) best = e
        }
        val ((a, b), n) = best
        out += Merge(r, a, b, n)
        words = words.map { case (syms, f) =>
          var hit = false
          var i = 0
          while (!hit && i < syms.length - 1) {
            hit = syms(i) == a && syms(i + 1) == b; i += 1
          }
          if (hit) (applyMerge(syms, a, b), f) else (syms, f)
        }
        r += 1
      }
    }
    out.result()
  }
}
