package graft

import org.apache.spark.sql.functions._

/** Pins BenchScale's planted-nothing amplification properties — the
  * validity of BENCH_scale.json rests on the amplified corpus measuring
  * SCALE, not fixture pathology:
  *   - doc replicas have pairwise-DISJOINT token universes (cross-replica
  *     Jaccard exactly 0 ⇒ no quadratic near-dup pair planting) while
  *     replica 0 keeps the original bytes and every replica keeps the
  *     token-count/length shape;
  *   - embedding rotation is orthogonal: intra-replica pairwise cosines
  *     equal the base corpus' exactly;
  *   - id remaps are bijections (×rep row counts, all ids distinct).
  */
final class BenchScaleSpec extends SparkSpec {

  private val Rep = 3

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.lazyZip(b).map(_ * _).sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("amplifyDocs: xN rows, bijective ids, replica 0 verbatim, disjoint " +
      "cross-replica token universes, per-replica token-count shape kept") {
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "pack my box with five dozen jugs"),
      (2L, "the quick brown fox jumps"), // an intra-corpus exact dup — must replicate xN
      (3L, "single"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val amp = BenchScale.amplifyDocs(base, Rep).cache()
    try {
      assert(amp.count() == base.count() * Rep)
      assert(amp.select("doc_id").distinct().count() == base.count() * Rep)
      // replica 0 (doc_id % Rep == 0) is the original corpus byte-for-byte
      val rep0 = amp.filter(col("doc_id") % Rep === 0)
        .select((col("doc_id") / Rep).cast("long").as("doc_id"), col("text"))
      assert(rep0.except(base.select("doc_id", "text")).isEmpty &&
        base.select("doc_id", "text").except(rep0).isEmpty)
      // token universes of distinct replicas are pairwise disjoint
      val toks = amp.select((col("doc_id") % Rep).as("k"),
          explode(split(col("text"), "\\s+")).as("tok"))
        .distinct().cache()
      val overlap = toks.as("x").join(toks.as("y"),
        col("x.tok") === col("y.tok") && col("x.k") =!= col("y.k")).count()
      assert(overlap == 0L, "cross-replica token collision — amplification planted shared shingles")
      // shape: every replica has the base corpus' total token count
      val perK = amp.select((col("doc_id") % Rep).as("k"),
          size(split(col("text"), "\\s+")).as("n"))
        .groupBy("k").agg(sum("n").as("total")).collect()
        .map(r => r.getLong(1)).toSet
      assert(perK.size == 1, s"replica token totals diverge: $perK")
      // n_chars recomputed to match the salted text
      assert(amp.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    } finally { amp.unpersist(); () }
  }

  test("amplifyEmbeddings: xN rows, bijective ids, replica 0 verbatim, " +
      "intra-replica pairwise cosines match the base corpus' to fp rounding") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val dim = 8
    val base = (0L until 5L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val amp = BenchScale.amplifyEmbeddings(base, Rep).cache()
    try {
      assert(amp.count() == 5L * Rep)
      assert(amp.select("vec_id").distinct().count() == 5L * Rep)
      def collectById(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
        df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
      val byId = collectById(amp)
      val baseById = collectById(base)
      // replica 0 is the original vector; replica k a cyclic rotation of it
      for ((id, v) <- baseById) {
        assert(byId(id * Rep) == v)
        for (k <- 1 until Rep) {
          val rot = byId(id * Rep + k)
          val s = k % dim
          assert(rot == v.drop(s) ++ v.take(s), s"replica $k of $id is not rot($s)")
        }
      }
      // orthogonality: intra-replica cosines match the base to fp-rounding
      // (rotation reorders the identical products inside the dot sum, so
      // only summation-order rounding can differ)
      for {
        k <- 0 until Rep
        a <- baseById.keys; b <- baseById.keys if a < b
      } {
        val c0 = cosine(baseById(a), baseById(b))
        val ck = cosine(byId(a * Rep + k), byId(b * Rep + k))
        assert(math.abs(ck - c0) < 1e-12, s"replica $k cosine($a,$b): $ck vs $c0")
      }
    } finally { amp.unpersist(); () }
  }

  test("embeddingDim: empty fixture gets a descriptive refusal, not " +
      "head's opaque NoSuchElementException") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](BenchScale.embeddingDim(empty))
    assert(e.getMessage.contains("empty"))
    // a NULL embedding in the first row is the other opaque-failure shape
    // (NPE from primitive unboxing of size()'s null)
    val nullRow = Seq((0L, null: Seq[Double])).toDF("vec_id", "embedding")
    val n = intercept[IllegalArgumentException](BenchScale.embeddingDim(nullRow))
    assert(n.getMessage.contains("NULL"))
  }

  test("guards: rep > embedding dim is refused (rotation would wrap to " +
      "identity), and salt-colliding base tokens are detected") {
    import spark.implicits._
    val emb = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding")
    // rep == dim is the last safe factor; dim+1 would give replica dim
    // offset pmod(dim,dim)=0 — a verbatim base copy
    BenchScale.amplifyEmbeddings(emb, 4).count()
    val e = intercept[IllegalArgumentException] {
      BenchScale.amplifyEmbeddings(emb, 5).count()
    }
    assert(e.getMessage.contains("embedding dim"))

    val docs = Seq((0L, "clean tokens only"), (1L, "price_2 is fine at rep 2"))
      .toDF("doc_id", "text")
    // "price_2" collides only when replica 2 exists (k ranges 1..rep-1)
    assert(BenchScale.saltCollisions(docs, 2).isEmpty)
    assert(BenchScale.saltCollisions(docs, 3) == Seq("price_2"))

    // NON-collisions the r16 probe wrongly handled: a leading-zero suffix
    // can never equal a salted form ('x'+'_1' = 'x_1' ≠ 'x_01'), and a
    // digit run beyond Long range must yield a verdict, not an
    // ArithmeticException from the ANSI cast
    val tricky = Seq((0L, "x_01 ok"), (1L, "y_123456789012345678901234567890 ok"))
      .toDF("doc_id", "text")
    assert(BenchScale.saltCollisions(tricky, 30).isEmpty)
  }
}
