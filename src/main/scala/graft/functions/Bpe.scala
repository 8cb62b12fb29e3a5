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

  /** Pre-indexed merge model: pair → rank as two-level string hash probes
    * (no per-lookup tuple allocation). Built once per expression instance
    * and shipped into generated code as the reference object, so the
    * per-word encode never scans the merge list — the shape a real
    * 32k-merge model needs. The index is injective both ways (rank ↦ one
    * pair), which is what lets the encoder validate stale heap entries by
    * a single rank comparison.
    */
  final class RankIndex(val merges: Array[(String, String)]) extends Serializable {
    require(merges.forall(m => m._1.nonEmpty && m._2.nonEmpty),
      "bpe merges must be pairs of non-empty symbols")
    // duplicates are REJECTED, not first-occurrence-resolved: with a
    // duplicated pair the sequential replay can apply the LATER copy (the
    // pair may be absent at its first rank and reform by then via other
    // merges of identical symbols), which a rank-unique index cannot
    // express — and training can never emit duplicates (a merged-out pair
    // cannot reform, see encode's floor note), so rejecting loudly beats
    // silently encoding differently from the oracle's replace() chain.
    require(merges.distinct.length == merges.length,
      "bpe merges must not contain duplicate pairs")
    // rebuilt lazily after plan serialization; the array is the payload
    @transient private lazy val byLeft: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
      val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
      var r = 0
      while (r < merges.length) {
        val (a, b) = merges(r)
        var inner = m.get(a)
        if (inner == null) { inner = new java.util.HashMap[String, Integer](); m.put(a, inner) }
        inner.put(b, Integer.valueOf(r))
        r += 1
      }
      m
    }
    def size: Int = merges.length
    /** Rank of (a, b), or -1 when the pair is not a merge. */
    def rank(a: String, b: String): Int = {
      val inner = byLeft.get(a)
      if (inner == null) -1
      else {
        val r = inner.get(b)
        if (r == null) -1 else r.intValue()
      }
    }
  }

  /** Rank-ordered BPE ENCODING — the standard BPE apply, vs
    * [[GreedySubwords]]' WordPiece-style longest match (the two diverge on
    * nested pieces: merges {(b,c),(a,b)} encode "abc" as [a, bc], greedy
    * over the same piece set takes [ab, c]; both ship, both oracle-gated).
    *
    * Semantics are the sequential rank scan (exactly the chained
    * `replace()` replay the oracle runs): ranks apply in increasing order,
    * each as one leftmost-first non-overlapping pass. The implementation
    * is a min-heap over the PRESENT pairs of the word — (rank, position)
    * entries over a doubly-linked symbol list, lazily invalidated — so
    * cost is O(|word| · log |word|) regardless of merge count, not
    * O(merges) per word. The monotone `floor` pins heap order to the
    * sequential scan: a pair whose rank is below the last applied rank is
    * one the scan has already passed, so it is discarded — for any
    * training-produced merge list the floor never fires (a merge's output
    * symbol only appears in LATER merges), making this also the standard
    * min-rank-first BPE; the floor only matters for hand-built adversarial
    * lists, where the documented sequential semantics win.
    */
  def encode(word: String, index: RankIndex): Array[String] = {
    val syms: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val n = syms.length
    if (n < 2 || index.size == 0) return syms
    // doubly-linked list over positions; merged-away slots go dead
    val next = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    val prev = Array.tabulate(n)(i => i - 1)
    val alive = Array.fill(n)(true)
    // (rank, leftPos) packed into one long: heap order = rank, then
    // position — same-rank occurrences pop leftmost-first
    val pq = new java.util.PriorityQueue[java.lang.Long]()
    def push(p: Int): Unit = {
      val q = next(p)
      if (q != -1) {
        val r = index.rank(syms(p), syms(q))
        if (r >= 0) pq.add(java.lang.Long.valueOf((r.toLong << 32) | p.toLong))
      }
    }
    var i = 0
    while (i < n - 1) { push(i); i += 1 }
    var floor = 0
    while (!pq.isEmpty) {
      val e = pq.poll().longValue()
      val r = (e >>> 32).toInt
      val p = (e & 0xffffffffL).toInt
      // valid iff the slot is live and STILL holds the rank-r pair (ranks
      // are injective per pair, so one comparison re-verifies the pair)
      if (r >= floor && alive(p)) {
        val q = next(p)
        if (q != -1 && index.rank(syms(p), syms(q)) == r) {
          floor = r
          syms(p) = syms(p) + syms(q)
          alive(q) = false
          val nq = next(q)
          next(p) = nq
          if (nq != -1) prev(nq) = p
          val pp = prev(p)
          if (pp != -1) push(pp)
          push(p)
        }
      }
    }
    val out = Array.newBuilder[String]
    var h = 0
    while (h != -1) { out += syms(h); h = next(h) }
    out.result()
  }

  /** Convenience overload building a transient [[RankIndex]] — fine for
    * tests and one-off calls; [[BpeEncode]] caches the index per
    * expression instance so the corpus scan pays it once.
    */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] =
    encode(word, new RankIndex(merges.toArray))

  /** The literal sequential rank scan — O(merges) per word — kept as the
    * semantic reference for the heap encoder's equivalence spec.
    */
  private[functions] def encodeRankScan(word: String,
      merges: Seq[(String, String)]): Array[String] = {
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
