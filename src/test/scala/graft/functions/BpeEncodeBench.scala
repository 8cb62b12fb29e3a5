package graft.functions

/** Ad-hoc A/B timer for the BPE encoders (test scope only, the
  * [[graft.TimeQueries]] pattern): heap encoder vs the literal sequential
  * rank scan across merge-model sizes, on the SHARED [[BpeFixture]] corpus
  * — the same corpus whose 1k-merge prefix the equivalence spec pins, so
  * the model the bench prices is the model the specs verified. This is
  * the evidence for the merge-count-scalability claim — the scan prices
  * O(merges) per word, the heap O(|word| log |word|).
  *
  * `sbt "Test/runMain graft.functions.BpeEncodeBench"`
  */
object BpeEncodeBench {
  def main(args: Array[String]): Unit = {
    val lexArr = BpeFixture.lexicon.toArray
    val rnd = new scala.util.Random(7L)
    // indexed picks over an Array — List apply/size are O(n) traversals
    // and 200k picks over a ~4k List would cost ~1e9 node hops of setup
    val words = Array.fill(200000)(lexArr(rnd.nextInt(lexArr.length))._1)
    // learnMerges is prefix-deterministic: one deep training run serves
    // every size via take(n) (the old per-size retrain wasted ~4x the
    // setup and — worse — priced models no spec had ever pinned)
    val sizes = Seq(100, 1000, 4000, 16000)
    val all = Bpe.learnMerges(BpeFixture.lexicon, sizes.max)
      .map(m => (m.left, m.right))
    if (all.size < sizes.max)
      println(s"lexicon exhausted at ${all.size} merges (asked ${sizes.max})")
    for (n <- sizes) {
      val merges = all.take(n)
      val index = new Bpe.RankIndex(merges.toArray)
      def time(tag: String)(f: String => Array[String]): Unit = {
        var sink = 0L
        val t0 = System.nanoTime()
        words.foreach(w => sink += f(w).length)
        println(f"merges=${merges.size}%6d $tag%-5s ${(System.nanoTime() - t0) / 1e9}%7.2f s (pieces=$sink)")
      }
      time("heap")(w => Bpe.encode(w, index))
      time("scan")(w => Bpe.encodeRankScan(w, merges))
    }
  }
}
