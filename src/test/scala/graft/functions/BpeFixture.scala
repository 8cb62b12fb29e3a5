package graft.functions

/** THE shared BPE test fixture — one seeded corpus and one trained merge
  * list, consumed by both FunctionsSpec's heap≡scan equivalence spec and
  * the [[BpeEncodeBench]] A/B timer. The two previously trained separate
  * throwaway models from different corpora, so the model the bench priced
  * and the model the specs pinned were never the same object; now the
  * 1k-merge prefix is COMMITTED at
  * `src/test/resources/graft/bpe_merges_1k.tsv` and FunctionsSpec
  * re-trains it from the seeded corpus and asserts bitwise equality —
  * pinning trainer determinism itself, not just encoder agreement.
  *
  * [[Bpe.learnMerges]] is prefix-deterministic (round r depends only on
  * rounds < r), so a single deep training run serves every shorter model:
  * consumers needing several sizes train the deepest once and
  * `.take(n)` — exactly what BpeEncodeBench does.
  */
object BpeFixture {

  val Seed = 20260814L
  val Alphabet = "abcdef"

  /** Seeded pseudo-random weighted lexicon: 4000 draws of length 3–12
    * over the 6-letter alphabet, duplicate draws' frequencies summed.
    * Total symbol mass ≈ 30k over ~3.9k distinct words — rich enough to
    * learn ≥16k merges (each round retires ≥1 symbol occurrence), which
    * covers the bench's deepest model. Word ORDER never matters to
    * training (pair counts are order-free sums; ties break on count then
    * UTF-8 pair order), so the groupBy's hash iteration order is
    * harmless; String.hashCode is spec-fixed, making even that stable.
    */
  lazy val lexicon: Seq[(String, Long)] = {
    val rnd = new scala.util.Random(Seed)
    (0 until 4000).map { _ =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => Alphabet(rnd.nextInt(Alphabet.length))).mkString
      (w, (1 + rnd.nextInt(50)).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
  }

  /** Train the first `n` merges from the fixture corpus (fresh run — for
    * multiple sizes, train the deepest and `.take`).
    */
  def merges(n: Int): Seq[(String, String)] =
    Bpe.learnMerges(lexicon, n).map(m => (m.left, m.right))

  private val resourcePath = "/graft/bpe_merges_1k.tsv"

  /** The committed 1k-merge model (rank\tleft\tright; symbols are [a-f]+
    * so no escaping is needed). Loading it is O(file) — consumers that
    * only need the canonical 1k model skip the ~2 s training run.
    */
  lazy val committed1k: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(resourcePath)
    require(in != null, s"committed BPE fixture $resourcePath missing — " +
      """regenerate with sbt "Test/runMain graft.functions.BpeFixture"""")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\t", -1)).map { case Array(_, a, b) => (a, b) }.toList
    finally src.close()
  }

  /** Regenerates the committed resource from the seeded corpus — run ONLY
    * after an INTENTIONAL trainer semantics change (the determinism spec
    * in FunctionsSpec fails until the file matches the trainer again):
    * `sbt "Test/runMain graft.functions.BpeFixture"`.
    */
  def main(args: Array[String]): Unit = {
    val out = new java.io.File("src/test/resources" + resourcePath)
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out, "UTF-8")
    try {
      w.println("# BPE fixture: first 1000 merges trained from BpeFixture.lexicon")
      w.println(s"# (seed=$Seed alphabet=$Alphabet; regen via Test/runMain graft.functions.BpeFixture)")
      Bpe.learnMerges(lexicon, 1000).foreach(m =>
        w.println(s"${m.rank}\t${m.left}\t${m.right}"))
    } finally w.close()
    println(s"wrote ${out.getPath}")
  }
}
