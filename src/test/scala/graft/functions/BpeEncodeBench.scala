package graft.functions

/** Ad-hoc A/B timer for the BPE encoders (test scope only, the
  * [[graft.TimeQueries]] pattern): heap encoder vs the literal sequential
  * rank scan across merge-model sizes, on a synthetic trained model. This
  * is the evidence for the merge-count-scalability claim — the scan
  * prices O(merges) per word, the heap O(|word| log |word|).
  *
  * `sbt "Test/runMain graft.functions.BpeEncodeBench"`
  */
object BpeEncodeBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7L)
    val alphabet = "abcdefghij"
    val lex = (0 until 30000).map { _ =>
      val len = 3 + rnd.nextInt(12)
      ((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString,
        (1 + rnd.nextInt(50)).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    // indexed picks over an Array — List apply/size are O(n) traversals
    // and 200k picks over a ~29k List would cost ~1e10 node hops of setup
    val lexArr = lex.toArray
    val words = Array.fill(200000)(lexArr(rnd.nextInt(lexArr.length))._1)
    for (n <- Seq(100, 1000, 4000, 16000)) {
      val merges = Bpe.learnMerges(lex, numMerges = n).map(m => (m.left, m.right))
      if (merges.size < n)
        println(s"n=$n: lexicon exhausted at ${merges.size} merges")
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
