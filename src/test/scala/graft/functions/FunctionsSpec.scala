package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words appear here now always"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "el la de que y los en un")
  ).toDF("doc_id", "text")

  test("PolyHash matches the reference scala fold and is codegen-consistent") {
    assert(PolyHash.eval("ab") == 97L * 31 + 98) // (0·31+97)·31+98
    val got = docs.select(col("doc_id"), PolyHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == PolyHash.eval("the quick brown fox jumps over the lazy dog"))
    assert(got(0L) == got(3L)) // identical text, identical fingerprint
    assert(got(0L) != got(1L))
  }

  test("tokenCount / shingles / subwordCount") {
    val r = docs.where($"doc_id" === 0)
      .select(
        TextAnalysis.tokenCount($"text"),
        TextAnalysis.distinctShingles($"text", 3),
        TextAnalysis.subwordCount($"text"))
      .head()
    assert(r.getInt(0) == 9)
    assert(r.getSeq[String](1).head == "the quick brown")
    assert(r.getSeq[String](1).length == 7) // 9 tokens → 7 trigrams, all distinct
    assert(r.getLong(2) == 12L) // quick/brown/jumps have 5 chars → 2 units each
  }

  test("WordShingles expression ≡ the HOF shingle pipeline") {
    val texts = Seq((0L, "a b c d e a b c"), (1L, "  x   y\nz  "), (2L, "one two"),
      (3L, "the quick brown fox the quick brown fox"),
      // edge whitespace: space-only trim keeps the trailing \n/\t separator,
      // so a trailing empty token (and its shingle) must survive both paths
      (4L, "a b c\n"), (5L, "x y z\t"), (6L, "\np q r"))
      .toDF("doc_id", "text")
    val viaExpr = texts.select($"doc_id", TextAnalysis.distinctShingles($"text", 3))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaHof = texts.select($"doc_id",
        array_distinct(TextAnalysis.shingles($"text", 3)))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaExpr == viaHof)
  }

  test("shorter-than-n docs produce no shingles") {
    val r = Seq((9L, "one two")).toDF("doc_id", "text")
      .select(TextAnalysis.distinctShingles($"text", 3)).head()
    assert(r.getSeq[String](0).isEmpty)
  }

  test("TextProfile ≡ the HOF statistics on tricky fixtures and real docs") {
    val tricky = Seq((0L, ""), (1L, "   "), (2L, "\tfoo  bar\nbaz "), (3L, "one"),
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "el la de que y los en un"), (6L, "Der große Überblick"))
      .toDF("doc_id", "text")
    val docsets = Seq(tricky, spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    for (d <- docsets) {
      val viaProfile = d.select($"doc_id", TextAnalysis.profile($"text").as("p"))
        .select($"doc_id", $"p.n_tokens", $"p.n_subwords", $"p.n_stopwords",
          TextAnalysis.qualityFromProfile($"p").as("q"),
          TextAnalysis.languageIdFromProfile($"p").as("lang"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val viaHof = d.select($"doc_id",
          TextAnalysis.tokenCount($"text").cast("long"),
          TextAnalysis.subwordCount($"text"),
          TextAnalysis.stopwordCount($"text").cast("long"),
          TextAnalysis.qualityScore($"text").as("q"),
          TextAnalysis.languageId($"text").as("lang"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(viaProfile == viaHof)
    }
  }

  test("languageId picks the max-scoring stopword set") {
    val got = docs.select($"doc_id", TextAnalysis.languageId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en" && got(4L) == "es" && got(2L) == "und")
  }

  test("exact dedup groups identical texts") {
    val got = Dedup.exact(docs, "doc_id", Seq($"text")).collect()
    assert(got.length == 4)
    val dupRow = got.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupRow.getAs[Long]("doc_id") == 0L) // min id representative
  }

  test("ngram jaccard finds the near-dup and exact-dup pairs only") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("ngram jaccard maxDocFreq cap drops stop-shingles from the join") {
    // "the quick brown" etc. appear in 3 docs; a cap of 2 excludes them, so
    // the 0-1 near-dup pair (which shares ONLY high-frequency shingles with
    // doc 3 variants) loses intersection mass but identical docs still match
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.9, maxDocFreq = Some(2L))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.9, maxDocFreq = None)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(capped.subsetOf(uncapped))
    assert(uncapped.contains((0L, 3L))) // exact dups survive without cap
  }

  test("prefix-filtered ngram jaccard property: ≡ the full inverted-index " +
      "path on randomized corpora across thresholds and caps") {
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        math.round(r.getAs[Double]("jaccard") * 1e6))).toSet
    // vocabulary small enough to force heavy shingle sharing (the regime
    // where a broken prefix bound actually drops pairs) and doc lengths
    // straddling the n=3 shingle minimum; mutated copies sit at every
    // similarity level, so threshold boundaries get real traffic
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(24)(i => s"w$i")
    val base = Seq.tabulate(40) { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val mutated = base.take(20).map { case (id, text) =>
      val toks = text.split(" ").toBuffer
      val edits = 1 + rnd.nextInt(3)
      for (_ <- 1 to edits if toks.nonEmpty)
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      (id + 1000L, toks.mkString(" "))
    }
    val corpus = (base ++ mutated).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); cap <- Seq(None, Some(6L))) {
      val fast = run(Dedup.ngramJaccardPairsPrefix(corpus, "doc_id", "text",
        n = 3, threshold = t, maxDocFreq = cap))
      val naive = run(Dedup.ngramJaccardPairsNaive(corpus, "doc_id", "text",
        n = 3, threshold = t, maxDocFreq = cap))
      assert(fast == naive, s"threshold=$t cap=$cap")
      spark.catalog.clearCache() // per-combo caches must not cross-pollinate
    }
    // 0.7×10-token shapes: the ceil(t·n) double-rounding hazard the
    // epsilon guard exists for — exact-dup pairs must survive at t=0.7
    val tenTok = Seq.tabulate(6)(i =>
      (i.toLong, (0 until 12).map(j => vocab((i * 5 + j) % 12)).mkString(" ")))
    val dup = tenTok.map { case (id, s) => (id + 100L, s) }
    val exactDups = (tenTok ++ dup).toDF("doc_id", "text")
    val got = run(Dedup.ngramJaccardPairsPrefix(exactDups, "doc_id", "text",
      n = 3, threshold = 0.7))
    assert(run(Dedup.ngramJaccardPairsNaive(exactDups, "doc_id", "text",
      n = 3, threshold = 0.7)) == got)
    assert(tenTok.forall { case (id, _) => got.exists(p => p._1 == id && p._2 == id + 100L) })
  }

  test("broadcast-threshold parse: -1 disables, units parse, garbage " +
      "defaults to not-broadcastable") {
    // the r18 review bug this pins: byteStringAsBytes cannot parse "-1"
    // (the standard broadcast-disable value), and the old catch-all mapped
    // the failure to 10MB — reading "broadcast disabled" as "broadcastable"
    // and skipping the widen exactly when the shuffled join needed it
    assert(Dedup.broadcastThresholdBytes("-1") == -1L)
    assert(Dedup.broadcastThresholdBytes("10MB") == 10L * 1024 * 1024)
    assert(Dedup.broadcastThresholdBytes("1048576") == 1048576L)
    assert(Dedup.broadcastThresholdBytes(" 5m ") == 5L * 1024 * 1024)
    // unparseable → 0 → not broadcastable → the widen is KEPT (safe side)
    assert(Dedup.broadcastThresholdBytes("banana") == 0L)
    assert(Dedup.broadcastThresholdBytes("") == 0L)
  }

  test("ngram jaccard cost dispatch: low collision mass takes the count " +
      "path, duplicate floods take the prefix path") {
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    // the 5-doc fixture: Σ df(df−1)/2 ≪ 16×index → full-index strategy
    // (its plan has no array_intersect; the prefix plan always does)
    assert(!planOf(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5)).contains("array_intersect"))
    // 60 identical docs, uncapped: every shingle has df=60, so collision
    // mass is 29.5×index → prefix strategy. Result must still be every
    // pair at jaccard 1.0 — the dispatch is physical only.
    val flood = Seq.tabulate(60)(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val dispatched = Dedup.ngramJaccardPairs(flood, "doc_id", "text",
      n = 3, threshold = 0.9)
    assert(planOf(dispatched).contains("array_intersect"))
    assert(dispatched.count() == 60L * 59 / 2)
    spark.catalog.clearCache()
  }

  test("minhash+LSH verified pairs equal the exact jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", n = 3, numHashes = 128,
      bands = 32, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh == exact)
  }

  test("saltedJoin ≡ plain equi-join on a skewed key") {
    // 90% of probe rows share one hot key
    val probe = (0 until 200).map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong))
      .toDF("k", "v")
    val build = Seq(("hot", 1L), ("k0", 2L), ("k10", 3L), ("miss", 4L)).toDF("k", "w")
    // MULTISET compare: a regression joining without the salt produces
    // saltFactor× duplicate rows, which a Set comparison would hide
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString).toSeq
    val plain = rows(probe.join(build, Seq("k")))
    val salted = rows(Salting.saltedJoin(probe, build, Seq("k"), $"v", saltFactor = 8))
    assert(salted == plain)
    assert(plain.nonEmpty)
    intercept[IllegalArgumentException](Salting.saltedBuild(build, 0))
    // the hot key's probe rows really do spread across salt values
    val salts = Salting.saltedProbe(probe.where($"k" === "hot"), $"v", 8)
      .select("__salt").distinct().count()
    assert(salts > 4)
  }

  test("dropNearDuplicates keeps canonicals and unclustered docs only") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "canonical_id")
    val surviving = Dedup.dropNearDuplicates(docs, "doc_id", clusters)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(surviving == Set(0L, 1L, 4L)) // 2,3 dropped; 1 canonical; 0,4 unclustered
  }

  test("RepetitionProfile: hand-computed repetition stats, fracs, and keep rule") {
    val d = Seq(
      (0L, "a b a b a b"), // "a b"×3 of 5 bigrams; trigrams {aba, bab} of 4
      (1L, "v w x y z"),   // all distinct
      (2L, "solo"),        // no bigram/trigram → fracs NULL → kept
      (3L, "")             // "" splits to one empty token (TextProfile parity)
    ).toDF("doc_id", "text")
    val rows = d.select(col("doc_id"), RepetitionProfile(col("text")).as("p"))
      .select(col("doc_id"), col("p").getField("n_tokens").as("n"),
        col("p").getField("top_bigram_count").as("tb"),
        col("p").getField("distinct_trigrams").as("d3"),
        TextAnalysis.topBigramFrac(col("p")).as("tbf"),
        TextAnalysis.dupTrigramFrac(col("p")).as("dtf"),
        TextAnalysis.repetitionKeep(col("p")).as("keep"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[Long]("n") == 6 && rows(0L).getAs[Long]("tb") == 3 &&
      rows(0L).getAs[Long]("d3") == 2)
    assert(rows(0L).getAs[Double]("tbf") == 0.6 && rows(0L).getAs[Double]("dtf") == 0.5)
    assert(!rows(0L).getAs[Boolean]("keep")) // phrase loop: both fracs over threshold
    assert(rows(1L).getAs[Long]("tb") == 1 && rows(1L).getAs[Long]("d3") == 3)
    assert(rows(1L).getAs[Double]("dtf") == 0.0)
    assert(rows(2L).getAs[Long]("n") == 1 && rows(2L).getAs[Long]("tb") == 0 &&
      rows(2L).getAs[Long]("d3") == 0)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("tbf")) &&
      rows(2L).getAs[Boolean]("keep")) // undefined fraction never drops a doc
    assert(rows(3L).getAs[Long]("n") == 1)
  }

  test("HashedBagLinear: hand-computed logit, empty-string bucket 0, null, " +
      "and sigmoid/keep consistency") {
    // B=2: 'a'(97) → bucket 1, 'b'(98) → bucket 0
    val w = Array(0.25, -0.75)
    val d = Seq((0L, "a b"), (1L, ""), (2L, null: String)).toDF("doc_id", "text")
    val logit = TextAnalysis.classifierLogit(col("text"), w, bias = 0.1)
    val rows = d.select(col("doc_id"), logit.as("l"),
        TextAnalysis.classifierScore(logit).as("s"),
        TextAnalysis.classifierKeep(logit, 0.5).as("k"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[Double]("l") == 0.1 + (-0.75 + 0.25) / 2)
    // "" tokenizes to one empty token; PolyHash("") = 0 → bucket 0
    assert(rows(1L).getAs[Double]("l") == 0.1 + 0.25)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("l")) &&
      rows(2L).isNullAt(rows(2L).fieldIndex("k")))
    // sigmoid of the logit, and keep ⇔ score ≥ threshold
    for (id <- Seq(0L, 1L)) {
      val l = rows(id).getAs[Double]("l")
      assert(math.abs(rows(id).getAs[Double]("s") - 1.0 / (1.0 + math.exp(-l))) < 1e-12)
      assert(rows(id).getAs[Boolean]("k") == (1.0 / (1.0 + math.exp(-l)) >= 0.5))
    }
    // interpreted eval agrees with codegen (nullSafeEval is the fallback path)
    assert(HashedBagLinear.compute("a b", w, 0.1) == rows(0L).getAs[Double]("l"))
    intercept[IllegalArgumentException](
      TextAnalysis.classifierKeep(logit, 1.0))
  }

  test("hashed_bag_logit: SQL path agrees with the Column API") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT hashed_bag_logit('a b c', array(0.25D, -0.75D), 0.1D)").head().getDouble(0)
    val viaCol = Seq("a b c").toDF("t")
      .select(TextAnalysis.classifierLogit(col("t"), Array(0.25, -0.75), 0.1))
      .head().getDouble(0)
    assert(viaSql == viaCol)
    // non-foldable weights are a build-time error, not a wrong answer
    intercept[Exception](
      spark.sql("SELECT hashed_bag_logit('a', array(rand()), 0.1D)").head())
  }

  test("RepetitionProfile ≡ relational 2-gram mode / distinct-3-gram aggregation") {
    val rnd = new scala.util.Random(7)
    val d = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(5)).mkString(" "))
    }.toDF("doc_id", "text")
    val viaExpr = d.select(col("doc_id"), RepetitionProfile(col("text")).as("p"))
      .select(col("doc_id"), col("p").getField("top_bigram_count").as("tb"),
        col("p").getField("distinct_trigrams").as("d3"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val top = d.select(col("doc_id"),
        explode(TextAnalysis.shingles(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("tb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tri = d.select(col("doc_id"),
        size(array_distinct(TextAnalysis.shingles(col("text"), 3))).as("d3"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    viaExpr.foreach { case (id, (tb, d3)) =>
      assert(tb == top.getOrElse(id, 0L), s"top bigram mismatch for doc $id")
      assert(d3 == tri(id), s"distinct trigrams mismatch for doc $id")
    }
  }

  test("tokenFrequencies: counts, deterministic tie order, top-K cut") {
    val d = Seq((0L, "b a a"), (1L, "c b  a"), (2L, " c ")).toDF("doc_id", "text")
    val top = TextAnalysis.tokenFrequencies(d, "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a×3, b×2, c×2 — the b/c tie breaks on the token, K cuts c
    assert(top == Seq(("a", 3L), ("b", 2L)))
  }

  test("weightedSample keeps per-stratum rates deterministically") {
    val d = (0 until 400).map(i => (i.toLong, if (i % 2 == 0) "keepy" else "droppy"))
      .toDF("doc_id", "source")
    val w = Map("keepy" -> 100, "droppy" -> 0)
    val out = Sampling.weightedSample(d, "doc_id", "source", w, defaultPct = 50)
    val kept = out.collect().map(_.getAs[String]("source"))
    assert(kept.forall(_ == "keepy") && kept.length == 200)
    // unlisted strata ride the default pct; same inputs → same sample
    val dflt = Sampling.weightedSample(d, "doc_id", "source", Map.empty, 50)
    val a = dflt.collect().map(_.getAs[Long]("doc_id")).toSet
    val b = dflt.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b && a.size > 120 && a.size < 280) // ~50% of 400, hash-spread
    intercept[IllegalArgumentException](
      Sampling.weightedSample(d, "doc_id", "source", Map("x" -> 101), 50))
  }

  test("redactPii scrubs emails and phone-like runs; short digit runs survive") {
    val d = Seq(
      (0L, "mail alice.smith+x@sub.example.org now"),
      (1L, "call +1 (415) 555-0123 today"),
      (2L, "digits 1234567 stay"), // 7 chars — under the 8-char phone minimum
      (3L, "both bob@x.co and 020 7946 0958"),
      (4L, "clean text")
    ).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "mail <EMAIL> now")
    assert(got(1L) == "call <PHONE> today")
    assert(got(2L) == "digits 1234567 stay")
    assert(got(3L) == "both <EMAIL> and <PHONE>")
    assert(got(4L) == "clean text")
  }

  test("packGreedy: hand-computed single-stream first-fit, oversized docs isolated") {
    val docs = Seq((0L, 5L), (1L, 5L), (2L, 10L), (3L, 3L), (4L, 12L), (5L, 1L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packGreedy(docs, "doc_id", "n_tokens", budget = 10L, streams = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bin"), r.getAs[Long]("bin_fill"))).toMap
    // greedy in id order at budget 10: (5,5)|bin0, 10 overflows|bin1,
    // 3|bin2, the 12-token doc exceeds the budget alone|bin3, 1|bin4
    assert(out == Map(0L -> (0L, 5L), 1L -> (0L, 10L), 2L -> (1L, 10L),
      3L -> (2L, 3L), 4L -> (3L, 12L), 5L -> (4L, 1L)))
  }

  test("materialize: bins assemble into EOD-joined sequences in placement " +
      "order, independent of shuffle arrival") {
    val counts = Seq((0L, 5L), (1L, 5L), (2L, 10L), (3L, 3L))
      .toDF("doc_id", "n_tokens")
    val texts = Seq((3L, "dd"), (1L, "bb"), (0L, "aa"), (2L, "cc"))
      .toDF("doc_id", "text").repartition(3) // adversarial arrival order
    val packed = Packing.packGreedy(counts, "doc_id", "n_tokens",
      budget = 10L, streams = 1)
    val out = Packing.materialize(packed, texts, "doc_id", "text", eod = "<E>")
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
        r.getAs[String]("seq"))).toSet
    // bins from the hand-computed leg above: {0,1}|bin0, {2}|bin1, {3}|bin2
    assert(out == Set((0L, 2L, "aa<E>bb"), (1L, 1L, "cc"), (2L, 1L, "dd")))
  }

  test("packGreedy drops null/negative token counts instead of NPEing mid-job") {
    val docs = Seq((Some(0L), Some(5L)), (Some(1L), None),
      (Some(2L), Some(-3L)), (None, Some(4L)), (Some(3L), Some(2L)))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packGreedy(docs, "doc_id", "n_tokens", budget = 10L, streams = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out == Set(0L, 3L))
  }

  test("packGreedy ≡ driver-side greedy per stream; fills stay within budget") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 300).map(i => (i.toLong, 1L + rnd.nextInt(40)))
      .toDF("doc_id", "n_tokens")
    val rows = Packing.packGreedy(docs, "doc_id", "n_tokens", budget = 64L, streams = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("stream"), r.getAs[Long]("bin"), r.getAs[Long]("bin_fill")))
    // re-run the greedy rule on the driver per stream, in id order
    rows.groupBy(_._3).foreach { case (_, sr) =>
      var bin = 0L; var fill = 0L
      sr.sortBy(_._1).foreach { case (id, n, _, b, bf) =>
        if (fill > 0 && fill + n > 64) { bin += 1; fill = 0 }
        fill += n
        assert(b == bin && bf == fill, s"doc $id expected bin $bin fill $fill")
      }
    }
    // no multi-doc bin exceeds the budget (only a lone oversized doc may)
    rows.groupBy(r => (r._3, r._4)).foreach { case (_, binRows) =>
      val total = binRows.map(_._2).sum
      assert(total <= 64 || binRows.length == 1)
    }
    // every doc placed exactly once
    assert(rows.map(_._1).distinct.length == 300)
  }

  test("contaminationReport counts distinct shared n-grams; decontaminate drops at the threshold") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // shares 2 distinct 3-grams with bench
      (1L, "alpha beta gamma other words here entirely"), // shares 1
      (2L, "nothing in common with that suite at all"), // shares 0
      // repeated leaked passage: distinct-shingle semantics count it ONCE
      (3L, "alpha beta gamma delta alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("bench_text")
    val report = Dedup.contaminationReport(corpus, "doc_id", "text",
        bench, "bench_text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap")).toMap
    // bench 3-grams: {alpha beta gamma, beta gamma delta, gamma delta epsilon};
    // doc 0 shares the first three, doc 1 only the first, doc 3 the first two
    // (its leaked passage repeats, but distinct shingles count it once),
    // doc 2 none — and zero-overlap docs are absent, not 0-rows
    assert(report == Map(0L -> 3L, 1L -> 1L, 3L -> 2L))
    val kept = Dedup.decontaminate(corpus, "doc_id", "text", bench, "bench_text",
        n = 3, minOverlap = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 2L)) // 0 and 3 reach the threshold; 1 stays under it
  }

  test("clustersFromMinhash ≡ connected components over exact uncapped pairs") {
    def labels(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val viaLsh = labels(Dedup.clustersFromMinhash(docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.5))
    val viaExact = labels(Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)))
    assert(viaLsh == viaExact)
    assert(viaLsh.nonEmpty)
  }

  test("spread: stats-small frames repartition; unknown-size single-split frames spread via the probe") {
    val par = spark.sparkContext.defaultParallelism
    // small by optimizer stats → repartitioned without touching the RDD path
    assert(Partitioning.spread(spark.range(100).toDF("id")).rdd.getNumPartitions == par)
    // RDD-backed frame reports defaultSizeInBytes (huge) → falls back to the
    // partition probe, which still catches the single-split input
    val rddBacked = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)), numSlices = 1),
      new org.apache.spark.sql.types.StructType().add("v", "long"))
    assert(rddBacked.rdd.getNumPartitions == 1)
    assert(Partitioning.spread(rddBacked).rdd.getNumPartitions == par)
  }

  test("clustersFromMinhash releases its pair-stage caches once components are built") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val clusters = Dedup.clustersFromMinhash(docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 32, threshold = 0.5)
    assert(clusters.count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"pair-stage caches still persisted: $leaked")
  }

  test("cosinePairsLSHScoped hands back its band-key cache for eager release") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.1f, 0.0f)),
      (1L, Seq(1.0f, 0.01f, 0.1f, 0.0f)), // near-parallel to 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (pairs, caches) = Similarity.cosinePairsLSHScoped(vecs, "vec_id", "embedding", 0.9)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).contains((0L, 1L)))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "the band-key table should be persisted for the self-join")
    caches.foreach(_.unpersist(blocking = true))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"band-key cache still persisted after scoped release: $leaked")
  }

  test("connectedComponents labels chains with the component minimum (both paths)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (3L, 9L))
      .toDF("doc_a", "doc_b") // {1,2,3,8,9} and {5,6}
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L)
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(run(Dedup.connectedComponents(pairs)) == expected)
    assert(run(Dedup.connectedComponentsDistributed(pairs)) == expected)
    // union-find path and distributed path agree when forced over the cap
    assert(run(Dedup.connectedComponents(pairs, driverSideEdgeLimit = 2)) == expected)
  }

  test("connectedComponents property: star contraction ≡ union-find on random " +
      "and adversarially-deep graphs") {
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    def check(edges: Seq[(Long, Long)], what: String): Unit = {
      val pairs = edges.toDF("doc_a", "doc_b")
      // ground truth: the exhaustively-spec'd driver union-find
      val truth = run(Dedup.connectedComponents(pairs, driverSideEdgeLimit = 10_000_000))
      assert(run(Dedup.connectedComponentsDistributed(pairs)) == truth, what)
    }
    // a 220-deep PATH: min-label propagation converged in O(diameter) and
    // returned PARTIAL labels past its round cap; star contraction must
    // finish in O(log n) rounds and label all 221 nodes with node 0
    check((0L until 220L).map(i => (i, i + 1)), "path graph depth 220")
    // path written in descending order + shuffled edge directions
    check((0L until 150L).map(i => (150L - i, 149L - i)), "reversed path")
    // random graphs across densities: isolated pairs, sparse forests, and
    // dense near-cliques, with self-loops and duplicate edges mixed in
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 40
      val m = n * (trial match { case 1 => 1; case 2 => 2; case _ => 4 })
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b || rnd.nextBoolean() } // keep some loops
      check(edges, s"random graph n=$n m=${edges.size} trial=$trial")
    }
    // long chains of small cliques — the realistic adversarial corpus shape:
    // pairwise-similar runs chained end to end
    val chained = (0L until 40L).flatMap { c =>
      val base = c * 3
      Seq((base, base + 1), (base + 1, base + 2), (base + 2, base + 3))
    }.filter(_._2 <= 120L)
    check(chained, "chained cliques")
    // with a checkpoint dir configured the rounds take RELIABLE checkpoints
    // (the 1000-executor posture — local round state dies with one executor)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    check((0L until 100L).map(i => (i, i + 1)), "path under reliable checkpointing")
    // setCheckpointDir nests a session-unique subdir — resolve through the
    // context, where the call dirs actually land
    val callDirs = new java.io.File(
      new java.net.URI(spark.sparkContext.getCheckpointDir.get).getPath)
      .listFiles().filter(_.getName.startsWith("graft-cc-"))
    assert(callDirs.nonEmpty,
      "reliable round snapshots must actually land in the configured dir")
    // every superseded edge-round snapshot is reclaimed eagerly — a ~30-round
    // run leaving ~30 full edge sets per call would grow checkpoint storage
    // without bound on a long-lived session; only the node-sized labels
    // snapshot (what the returned DataFrame reads) may outlive the call
    callDirs.foreach { d =>
      assert(d.listFiles().map(_.getName).toSeq == Seq("labels"),
        s"call dir ${d.getName} must hold only the labels snapshot")
    }
  }

  test("SimHashSig expression ≡ the exploded vote pipeline") {
    val texts = Seq((0L, "a b c d e a b c"), (1L, "  x   y\nz  "), (2L, "one"),
      (3L, "the quick brown fox the quick brown fox"), (4L, ""))
      .toDF("doc_id", "text")
    val viaExpr = Dedup.simhashSignatures(texts, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExplode = texts
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
      .select($"doc_id", HashFunctions.portableHash64($"tok").as("h"))
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(31))).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(when(expr("(shiftright(h, bit) & 1)") === 1, 1).otherwise(-1)).as("vote"))
      .groupBy("doc_id")
      .agg(sum(when($"vote" > 0, expr("shiftleft(1L, bit)")).otherwise(0L)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaExplode)
    assert(viaExpr.contains(4L)) // empty text still tokenizes to [""] and signs
  }

  test("simhash: identical docs at distance 0, near-dups close, distinct docs far") {
    val sig = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig(0L) == sig(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(1L)) <= 8)
    assert(ham(sig(0L), sig(2L)) > 3)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  private lazy val vectors = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("SQL registration: poly_hash / vector_dot / minhash_sig usable from spark.sql") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT poly_hash('ab')").head().getLong(0) == 97L * 31 + 98)
    val d = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0)
    assert(d == 11.0)
    val sig = spark.sql("SELECT minhash_sig(array('a b c', 'b c d'), 16)")
      .head().getSeq[Long](0)
    assert(sig.length == 16)
    assert(spark.sql("SELECT simhash_sig(array('foo', 'bar'))").head().get(0) != null)
    assert(spark.sql("SELECT text_profile('a b c').n_tokens").head().getLong(0) == 3L)
    assert(spark.sql("SELECT whitespace_tokens(' a  b ')")
      .head().getSeq[String](0) == Seq("a", "b"))
    assert(spark.sql("SELECT word_shingles('a b c d', 3)").head().getSeq[String](0).length == 2)
    assert(spark.sql("SELECT sign_band_keys(array(1.0D, -1.0D), 16, 4)")
      .head().getSeq[Long](0).length == 4)
  }

  test("GraftExtensions: spark.sql.extensions conf injects the full SQL surface at session build") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val prev = spark
    // Build a FRESH session wired only through the extensions injector — the
    // SQL-only deployment path, no register() call. (`spark.sql.extensions`
    // is a STATIC conf, unreadable after the shared test SparkContext
    // exists, so the spec drives the same injection via `withExtensions`;
    // the conf path additionally needs a public zero-arg constructor, which
    // this instantiation is.)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne prev)
      // every name in the shared builder table resolves in the new session
      GraftFunctions.builders.foreach { case (name, _, _) =>
        assert(s2.sessionState.functionRegistry.functionExists(FunctionIdentifier(name)),
          s"extension-injected function missing: $name")
      }
      // value parity with the Column API on the temp-function session
      assert(s2.sql("SELECT poly_hash('ab')").head().getLong(0) == 97L * 31 + 98)
      val viaSql = s2.sql(
        "SELECT minhash_band_keys(array('a b c', 'b c d'), 16, 4) AS k").head().getSeq[Long](0)
      val viaCol = {
        import prev.implicits._
        Seq(Seq("a b c", "b c d")).toDF("s")
          .select(MinHashBandKeys($"s", 16, 4).as("k"))
          .head().getSeq[Long](0)
      }
      assert(viaSql == viaCol)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("oovRate: hand-computed rare-token density against the learned top-K") {
    // counts: a×4, b×3, c×2, d×1 → top-2 vocab = {a, b}
    val d = Seq((0L, "a a b c"), (1L, "a b d"), (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(d, "text", topK = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    assert(out(0L) == (4L, 1L, 0.25) && out(1L) == (3L, 1L, 0.3333))
    assert(out(2L) == (3L, 1L, 0.3333))
    // "" tokenizes to one empty token, which is never in the vocab
    assert(out(3L) == (1L, 1L, 1.0))
    intercept[IllegalArgumentException](TextAnalysis.oovRate(d, "text", 0))
  }

  test("Sampling.exactN: deterministic, NESTED across n, and planned as a " +
      "top-n heap, not a full sort") {
    val d = (0 until 300).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    def ids(n: Int) = Sampling.exactN(d, "doc_id", n)
      .collect().map(_.getLong(0)).toSeq
    assert(ids(50) == ids(50), "re-run must pick identical rows")
    assert(ids(50).toSet.subsetOf(ids(120).toSet),
      "growing the budget must extend the sample, never re-deal it")
    assert(ids(120).length == 120 && ids(120).distinct.length == 120)
    val plan = Sampling.exactN(d, "doc_id", 50).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "global sort-limit must stay a per-partition heap")
    intercept[IllegalArgumentException](Sampling.exactN(d, "doc_id", -1))
  }

  test("GreedySubwords: longest-match wins over nested prefixes, char " +
      "fallback, empty/null handling, SQL parity") {
    val vocab = Seq("ther", "the", "th", "ing", "in", "wea")
    val d = Seq((0L, "the weather thing"), (1L, "xyz"), (2L, ""),
      (3L, null: String)).toDF("doc_id", "text")
    val rows = d.select(col("doc_id"),
        TextAnalysis.subwordTokenize(col("text"), vocab).as("p"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    // "the" beats "th"; "weather" → wea+ther; "thing" → th+ing ("in" loses)
    assert(rows(0L) == Seq("the", "wea", "ther", "th", "ing"))
    assert(rows(1L) == Seq("x", "y", "z"), "no vocab hit → single-char fallback")
    assert(rows(2L) == Seq(), "empty text → zero pieces")
    assert(rows(3L) == null)
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT greedy_subwords('thing', array('th', 'ing', 'in'))")
      .head().getSeq[String](0)
    assert(viaSql == Seq("th", "ing"))
    intercept[Exception](
      spark.sql("SELECT greedy_subwords('a', array(CAST(NULL AS STRING)))").head())
  }

  test("GreedySubwords: segmentation is lossless — pieces concatenate back " +
      "to the text's words (randomized vocab and corpus)") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcde"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val vocab = (0 until 40).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val d = (0 until 60).map(i =>
      (i.toLong, (0 until 1 + rnd.nextInt(6)).map(_ => randStr(1 + rnd.nextInt(12)))
        .mkString(" "))).toDF("doc_id", "text")
    d.select(col("text"),
        TextAnalysis.subwordTokenize(col("text"), vocab).as("p"))
      .collect().foreach { r =>
        val expected = r.getString(0).trim.split("\\s+", -1).mkString
        assert(r.getSeq[String](1).mkString == expected,
          s"lossy segmentation for '${r.getString(0)}'")
      }
  }

  test("NearestCentroid expression assigns identically to ivfAssign's " +
      "relational argmax (randomized, incl. zero vectors and ties)") {
    val rnd = new scala.util.Random(31)
    val dim = 8
    val vecs = ((0 until 80).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextInt(7) - 3).toFloat))) :+
      (80L, Array.fill(dim)(0.0f))) // zero vector: all sims -2, tie → cid 0
      .toDF("vec_id", "embedding")
    val cents = (0 until 5).map(c =>
      (c.toLong, Seq.fill(dim)((rnd.nextInt(7) - 3).toDouble)))
    val centDf = cents.toDF("centroid_id", "centroid_vec")
    val viaJoin = Similarity.ivfAssign(vecs, "vec_id", "embedding", centDf)
      .select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = vecs.select(col("vec_id"),
        NearestCentroid(col("embedding"), cents).as("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaJoin)
  }

  test("ZOrderKey: hand-computed interleave, masking, null element, SQL parity") {
    val d = Seq(
      (0L, Some(5L), Some(3L)),  // 101 ⋈ 011 → 011011 = 27
      (1L, Some(0L), Some(0L)),
      (2L, Some(13L), Some(3L)), // 13 & 0b111 = 5 under bits=3 → same as row 0
      (3L, None: Option[Long], Some(1L))
    ).toDF("id", "x", "y")
    val rows = d.select(col("id"), ZOrderKey(Seq(col("x"), col("y")), bits = 3).as("z"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(rows(0L) == 27L && rows(1L) == 0L)
    assert(rows(2L) == 27L, "out-of-range dims must wrap via the bits mask")
    assert(rows(3L) == null, "a null dimension nulls the key")
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder_key(array(5L, 3L), 3)").head().getLong(0) == 27L)
    intercept[IllegalArgumentException](ZOrderKey(Seq(col("x")), bits = 0))
    // dims*bits > 63 is a runtime guard (array length is data-dependent)
    intercept[Exception](
      spark.sql("SELECT zorder_key(array(1L, 2L, 3L), 22)").head()) // 66 bits
  }

  test("ZOrderKey: interleave is invertible — alternate-bit extraction " +
      "recovers every dimension (randomized)") {
    val rnd = new scala.util.Random(11)
    def deinterleave(z: Long, dims: Int, bits: Int, d: Int): Long =
      (0 until bits).map(i => ((z >> (i * dims + d)) & 1L) << i).sum
    val cases = (0 until 200).map { _ =>
      val dims = 2 + rnd.nextInt(2) // 2 or 3
      val bits = 1 + rnd.nextInt(63 / dims)
      (dims, bits, Array.fill(dims)(rnd.nextLong().abs & ((1L << bits) - 1)))
    }
    cases.foreach { case (dims, bits, vals) =>
      val z = ZOrderKey.interleave(vals, bits)
      (0 until dims).foreach { d =>
        assert(deinterleave(z, dims, bits, d) == vals(d),
          s"dims=$dims bits=$bits d=$d vals=${vals.mkString(",")} z=$z")
      }
    }
  }

  test("ZOrder.layout: z-ranged files bound file count for a predicate on " +
      "ANY interleaved dimension; a single-column sort only for its own") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val d = grid.toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("zlay").toString
    val xdir = java.nio.file.Files.createTempDirectory("xlay").toString
    ZOrder.layout(d, Seq("x", "y"), bits = 6, numFiles = 16)
      .write.mode("overwrite").parquet(zdir)
    d.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xdir)
    // files a min/max-stats reader could NOT skip for y ∈ [8, 16)
    def filesWithMatches(dir: String): Int =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .count(f => spark.read.parquet(f.toString)
          .where(col("y") >= 8 && col("y") < 16).head(1).nonEmpty)
    assert(filesWithMatches(xdir) == 16,
      "x-sorted layout spreads every y-slice across ALL files")
    // y∈[8,16) under 2-D z-order is 8 aligned 8×8 quadtree cells → 8
    // contiguous z-runs → at most 8 (+boundary) of the 16 z-range files
    assert(filesWithMatches(zdir) <= 9,
      "z-ranged files must carry a usable y envelope")
  }

  test("SemDeDup: within-cell pairs found, cross-cell near-pair missed " +
      "(the documented trade), clusters label min-id canonicals") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f)),  // cell 0
      (1L, Array(1.0f, 0.12f)), // cell 0 — near-dup of 0
      (2L, Array(0.1f, 1.0f)),  // cell 1
      (3L, Array(0.12f, 1.0f)), // cell 1 — near-dup of 2
      (4L, Array(1.0f, 0.95f)), // cell 0
      (5L, Array(0.95f, 1.0f))  // cell 1 — cosine(4,5) ≈ 1 but CROSS-cell
    ).toDF("vec_id", "embedding")
    val axes = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "centroid_vec")
    val pairs = Dedup.semanticDedupPairs(vecs, "vec_id", "embedding", axes, 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // (0,1) and (2,3) are in-cell near-dups; (4,5) is the cross-cell miss
    assert(pairs == Set((0L, 1L), (2L, 3L)))
    val clusters = Dedup.semanticDedupClusters(vecs, "vec_id", "embedding", axes, 0.9)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
    // apply: canonicals and unclustered docs survive
    val surviving = Dedup.dropNearDuplicates(
      vecs.select(col("vec_id").as("doc_id")), "doc_id",
      Dedup.semanticDedupClusters(vecs, "vec_id", "embedding", axes, 0.9))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(surviving == Set(0L, 2L, 4L, 5L))
  }

  test("SemDeDup cell-skew bound: a mega-cell of near-identical directions " +
      "is re-split by the in-cell grid with IDENTICAL output") {
    // the worst skew case: every vector lands in ONE cell with (near-)equal
    // direction — a sign-LSH sub-bucket would hash all of them to the same
    // bucket and split nothing; the id-hash grid splits unconditionally
    val n = 200
    val vecs = (0 until n).map(i => (i.toLong, Array(1.0f, (i * 1e-4).toFloat)))
      .toDF("vec_id", "embedding")
    val axes = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "centroid_vec")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        BigDecimal(r.getAs[Double]("cosine")).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    val unbounded = Dedup.semanticDedupPairs(vecs, "vec_id", "embedding", axes, 0.9)
      .collect().map(key).toSet
    assert(unbounded.size == n * (n - 1) / 2, "all within-cell pairs qualify")
    val bounded = Dedup.semanticDedupPairs(vecs, "vec_id", "embedding", axes, 0.9,
      maxCellRows = 50)
    // the grid branch engaged: the join runs on (centroid_id, bi, bj)
    assert(bounded.queryExecution.analyzed.toString.contains("bi"),
      "oversized cell must take the grid sub-split path")
    assert(bounded.collect().map(key).toSet == unbounded,
      "grid sub-split must not change the pair set (exact semantics)")
    // per-key boundedness: blocks = ceil(200/50) = 4, so no (bi,bj) key's
    // join input ever holds the whole cell — the largest id-hash sub-group
    // is ~n/4, far under the n-row single-key hash table the unbounded
    // join would build for this cell
    val groups = vecs.select(pmod(xxhash64(col("vec_id")), lit(4)).as("g"))
      .groupBy("g").count().collect().map(_.getAs[Long]("count"))
    assert(groups.length == 4 && groups.max <= 80,
      s"id-hash must spread the mega-cell across sub-groups, got ${groups.toSeq}")
    spark.catalog.clearCache()
  }

  test("IVF incremental maintenance: appends + generation compaction + " +
      "post-compaction append serve the same results as a one-shot build") {
    val vecs = (0L until 40L).map(i =>
      (i, Array(math.cos(i * 0.157).toFloat, math.sin(i * 0.157).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.0, -1.0)))
      .toDF("centroid_id", "centroid_vec")
    val oneShot = java.nio.file.Files.createTempDirectory("ivf1").toString
    val incr = java.nio.file.Files.createTempDirectory("ivf2").toString + "/idx"
    Similarity.writeIvfIndex(vecs, "vec_id", "embedding", cents, oneShot)
    Similarity.appendIvfIndex(vecs.where($"vec_id" % 2 === 0),
      "vec_id", "embedding", cents, incr)
    Similarity.appendIvfIndex(vecs.where($"vec_id" % 4 === 1),
      "vec_id", "embedding", cents, incr)
    Similarity.compactIvfIndex(spark, incr)
    Similarity.appendIvfIndex(vecs.where($"vec_id" % 4 === 3),
      "vec_id", "embedding", cents, incr)
    val q = vecs.where($"vec_id" < 3)
    def topk(path: String) = Similarity.ivfTopKFromIndex(spark, q,
        "vec_id", "embedding", path, cents, k = 3, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("corpus_id"), r.getAs[Int]("rank"))).toSet
    // serving equivalence across the whole lifecycle: generation dirs and
    // the post-compaction loose appends must both be visible to the probe
    assert(topk(incr) == topk(oneShot))
    // the compaction actually committed generations (the probe is reading
    // through the resolver, not a plain listing that can't see dot-dirs)
    val cells = new java.io.File(incr).listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(cells.nonEmpty)
    assert(cells.exists(_.listFiles().exists(_.getName.startsWith(".gen-"))),
      "compaction must commit a generation per rewritten cell")
  }

  test("WhitespaceTokens: the hand-rolled scanner is identical to " +
      "split(trim(s), \\s+, -1) on adversarial whitespace") {
    val rnd = new scala.util.Random(13)
    val alphabet = "ab \t\n\u000B\f\r  é."
    val cases = Seq("", " ", "a", " a ", "\ta\t", "a  b", "\n\n", "x\u000By",
      "\r\na b\tc ") ++
      (1 to 500).map(_ => (0 until rnd.nextInt(30))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    cases.foreach { s =>
      // the regex form the scanner replaces: space-trim then Java \s+ split
      val expect = {
        var from = 0; var to = s.length
        while (from < to && s.charAt(from) == ' ') from += 1
        while (to > from && s.charAt(to - 1) == ' ') to -= 1
        s.substring(from, to).split("\\s+", -1).toSeq
      }
      assert(Tokenize.tokens(s).toSeq == expect,
        s"input codepoints=${s.map(_.toInt).mkString(",")}")
    }
    // and the COLUMN twin agrees with the old split(trim(…)) form through
    // the engine (codegen path)
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    df.select(TextAnalysis.tokens(col("text")).as("nw"),
        split(trim(col("text")), "\\s+").as("old")).collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("Bpe.learnMerges: weighted argmax, leftmost non-overlapping merge, " +
      "UTF-8 tiebreak, early stop") {
    // (a,b) = 2·2 + 3 = 7 beats (b,a) = 2 and (b,c) = 3; then (ab,c) = 3
    // beats (ab,ab) = 2; then (ab,ab); then no pairs remain → early stop
    val m = Bpe.learnMerges(Seq(("abab", 2L), ("abc", 3L)), numMerges = 10)
    assert(m == Seq(Bpe.Merge(1, "a", "b", 7L), Bpe.Merge(2, "ab", "c", 3L),
      Bpe.Merge(3, "ab", "ab", 2L)))
    assert(Bpe.vocab(m) == Seq("ab", "abc", "abab"))
    // leftmost-first, non-overlapping, resume AFTER the merge: "aaa" is
    // [aa, a], never [a, aa] — and round 2 then merges (aa, a), so the
    // recurrence never sees the overlapping middle pair
    assert(Bpe.learnMerges(Seq(("aaa", 1L)), 5) ==
      Seq(Bpe.Merge(1, "a", "a", 2L), Bpe.Merge(2, "aa", "a", 1L)))
    // count tie → smaller (left, right) in binary order wins
    assert(Bpe.learnMerges(Seq(("ba", 1L), ("ab", 1L)), 1).head ==
      Bpe.Merge(1, "a", "b", 1L))
  }

  test("Bpe.encode: rank-ordered apply, exhaustive leftmost pass per rank, " +
      "and the documented divergence from greedy longest-match") {
    // rank 1 (b,c) consumes the b before rank 2 (a,b) ever sees it
    assert(Bpe.encode("abc", Seq(("b", "c"), ("a", "b"))).toSeq == Seq("a", "bc"))
    // greedy over the same piece set takes the leftmost longest piece
    assert(GreedySubwords.compute("abc", GreedySubwords.Model(Seq("bc", "ab")))
      .array.map(_.toString).toSeq == Seq("ab", "c"))
    // later ranks compose earlier merge outputs
    assert(Bpe.encode("abcab", Seq(("a", "b"), ("ab", "c"))).toSeq == Seq("abc", "ab"))
    // one pass per rank is leftmost-first non-overlapping
    assert(Bpe.encode("aaa", Seq(("a", "a"))).toSeq == Seq("aa", "a"))
    assert(Bpe.encode("", Seq(("a", "b"))).toSeq == Seq())
    // empty merge lists are legal and degenerate to per-codepoint symbols
    assert(Bpe.encode("abc", Nil).toSeq == Seq("a", "b", "c"))
    // duplicated pairs are rejected loudly: the sequential replay can
    // apply the LATER copy (the pair reforms by rank 2 via the identical-
    // symbol merge below), which a rank-unique index cannot express —
    // and training can never emit duplicates, so this is a caller bug
    val dup = intercept[IllegalArgumentException] {
      Bpe.encode("xyz", Seq(("xy", "z"), ("x", "y"), ("xy", "z")))
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    assert(Bpe.encodeRankScan("xyz",
      Seq(("xy", "z"), ("x", "y"), ("xy", "z"))).toSeq == Seq("xyz"))
    // the heap encoder's monotone floor pins SEQUENTIAL semantics on
    // adversarial (non-training-producible) lists: rank 1 (a,bc) only
    // becomes present after rank 2 (b,c) applies, and the scan has already
    // passed it — standard min-rank-first BPE would give [abc]
    assert(Bpe.encode("abc", Seq(("a", "bc"), ("b", "c"))).toSeq == Seq("a", "bc"))
    assert(Bpe.encodeRankScan("abc", Seq(("a", "bc"), ("b", "c"))).toSeq == Seq("a", "bc"))
  }

  test("Bpe.encode heap ≡ sequential rank scan on the SHARED 1k-merge " +
      "fixture model (merge-count-scalable path, bitwise-equal output), " +
      "and the trainer reproduces the committed fixture bit-for-bit") {
    val merges = BpeFixture.merges(1000)
    assert(merges.size == 1000, s"fixture must actually learn 1k merges, got ${merges.size}")
    // determinism pin: the committed resource is what BpeEncodeBench (and
    // any future consumer) loads — a trainer change that shifts ANY merge
    // fails here, and an INTENTIONAL change regens the file via
    // `Test/runMain graft.functions.BpeFixture`
    assert(merges == BpeFixture.committed1k,
      "trained merges diverge from src/test/resources/graft/bpe_merges_1k.tsv — " +
        "trainer determinism broke, or an intentional trainer change needs the fixture regenerated")
    val rnd = new scala.util.Random(BpeFixture.Seed)
    val alphabet = BpeFixture.Alphabet
    val index = new Bpe.RankIndex(merges.toArray)
    val words = BpeFixture.lexicon.map(_._1).take(300) ++
      (0 until 100).map(_ => (0 until 2 + rnd.nextInt(24))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", "a", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "zzz", "abcdefabcdef")
    words.foreach { w =>
      val heap = Bpe.encode(w, index).toSeq
      val scan = Bpe.encodeRankScan(w, merges).toSeq
      assert(heap == scan, s"word=$w heap=$heap scan=$scan")
      assert(heap.mkString == w) // concatenation-preserving
    }
  }

  test("BpeEncode: generated code COMPILES (the model reference object " +
      "must carry a Java-source-valid type name), matches interpreted eval, " +
      "accepts empty merges, and reserves U+0001 words to bare codepoints") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    val merges = Seq(("a", "b"), ("ab", "c"))
    val expr = BpeEncode(BoundReference(0, StringType, nullable = true), merges)
    // GenerateUnsafeProjection compiles via janino with NO interpreted
    // fallback at this layer — a codegen-invalid reference-object type
    // name (e.g. the '[Lscala.Tuple2;' binary name) throws right here
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val out = proj(InternalRow(UTF8String.fromString("abc xy ab")))
      .getArray(0)
    val pieces = (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
    assert(pieces == Seq("abc", "x", "y", "ab"))
    // codegen ≡ interpreted
    val interp = expr.eval(InternalRow(UTF8String.fromString("abc xy ab")))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until interp.numElements()).map(i => interp.getUTF8String(i).toString) == pieces)

    // empty merge list: legal, per-codepoint degeneration (oracle identity)
    val empty = Seq((7L, "ab c")).toDF("doc_id", "text")
      .select(BpeEncode(col("text"), Nil).as("p")).head().getSeq[String](0)
    assert(empty == Seq("a", "b", "c"))

    // U+0001 (the trainer's reserved delimiter) in content: the word takes
    // no merges on the engine side, mirroring the oracle's bypass branch
    val raw = Seq((8L, "ab a\u0001b \u0001")).toDF("doc_id", "text")
      .select(BpeEncode(col("text"), merges).as("p")).head().getSeq[String](0)
    assert(raw == Seq("ab", "a", "\u0001", "b", "\u0001"))
  }

  test("Bpe.encode heap ≡ rank scan on RANDOM duplicate-free merge lists " +
      "(generative — includes non-trained adversarial orders where the " +
      "monotone floor is what preserves the sequential semantics)") {
    // tiny alphabet + short symbols maximizes pair collisions and
    // later-rank-creates-earlier-pair constellations — the cases where a
    // plain min-rank heap WOULD diverge from the sequential replay
    val rnd = new scala.util.Random(99L)
    val alphabet = "abcd"
    def randSym(maxLen: Int): String =
      (0 to rnd.nextInt(maxLen)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    var floorMattered = 0
    for (_ <- 1 to 400) {
      val merges = Seq.fill(1 + rnd.nextInt(12))((randSym(2), randSym(2))).distinct
      val index = new Bpe.RankIndex(merges.toArray)
      (0 until 20).foreach { _ =>
        val w = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        val heap = Bpe.encode(w, index).toSeq
        val scan = Bpe.encodeRankScan(w, merges).toSeq
        assert(heap == scan, s"merges=$merges word=$w heap=$heap scan=$scan")
        assert(heap.mkString == w)
        // count cases where an UNFLOORED min-rank heap would have had a
        // lower-rank pair become present late — i.e. the floor decided
        if (heap.size > 1) {
          val lastSyms = heap
          val lateLow = lastSyms.indices.dropRight(1).exists { i =>
            val r = index.rank(lastSyms(i), lastSyms(i + 1)); r >= 0
          }
          if (lateLow) floorMattered += 1
        }
      }
    }
    // the fixture must actually exercise the adversarial region, not just
    // vacuously pass on trained-shaped lists
    assert(floorMattered > 0,
      "generator never produced a floor-deciding case — strengthen it")
  }

  test("codegen sweep: every custom expression with a real doGenCode " +
      "COMPILES under GenerateUnsafeProjection and matches interpreted eval") {
    // BpeEncode's '[Lscala.Tuple2;' reference-type bug shipped for a round
    // because nothing forced the generated source through janino — Spark's
    // production path silently falls back to interpreted eval on compile
    // failure. This sweep pins the whole family; expressions that are
    // CodegenFallback BY DESIGN (TextProfile, RepetitionProfile,
    // Int8Quantize — cold-path, documented at each site) are out of scope
    // here. SimHashSig moved INTO scope in r17 when its fallback dispatch
    // was identified as the q_dedup_simhash task-cpu bimodality; the
    // other hot-path array kernels (MinHashSig, MinHashBandKeys,
    // SignBandKeys, WordShingles) followed with the same static-kernel
    // doGenCode pattern.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String

    def s(v: String) = UTF8String.fromString(v)
    def arr(xs: Any*) = new GenericArrayData(xs.toArray)
    val str0 = BoundReference(0, StringType, nullable = true)
    val sArr0 = BoundReference(0, ArrayType(StringType, containsNull = false), nullable = true)
    val fArr0 = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = true)
    val dArr0 = BoundReference(0, ArrayType(DoubleType, containsNull = false), nullable = true)
    val dArr1 = BoundReference(1, ArrayType(DoubleType, containsNull = false), nullable = true)
    val lArr0 = BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)

    val cases: Seq[(String, Expression, InternalRow)] = Seq(
      ("PolyHash", PolyHash(str0), InternalRow(s("abc"))),
      ("SimHashSig", SimHashSig(sArr0), InternalRow(arr(s("a"), s("b"), s("a")))),
      ("SimHashSig/empty→null", SimHashSig(sArr0), InternalRow(arr())),
      ("MinHashSig", MinHashSig(sArr0, 8), InternalRow(arr(s("a b c"), s("b c d")))),
      ("MinHashBandKeys", MinHashBandKeys(sArr0, 8, 4),
        InternalRow(arr(s("a b c"), s("b c d")))),
      ("MinHashBandKeys/empty", MinHashBandKeys(sArr0, 8, 4), InternalRow(arr())),
      ("SignBandKeys/float", SignBandKeys(fArr0, 16, 4),
        InternalRow(arr(1.0f, -2.0f, 0.5f))),
      ("SignBandKeys/double", SignBandKeys(dArr0, 16, 4), InternalRow(arr(0.9, -0.1))),
      ("SignBandKeys/empty", SignBandKeys(fArr0, 16, 4), InternalRow(arr())),
      ("WordShingles", WordShingles(str0, 2), InternalRow(s(" a  b\tc a b "))),
      ("WordShingles/short→empty", WordShingles(str0, 2), InternalRow(s("solo"))),
      ("WhitespaceTokens", WhitespaceTokens(str0), InternalRow(s(" a  b\tc "))),
      ("ZOrderKey", ZOrderKey(lArr0, 16), InternalRow(arr(3L, 5L))),
      ("VectorDot", VectorDot(dArr0, dArr1),
        InternalRow(arr(1.0, 2.0), arr(3.0, 4.0))),
      ("BpeEncode", BpeEncode(str0, Seq(("a", "b"))), InternalRow(s("abc ab"))),
      ("GreedySubwords", GreedySubwords(str0, Seq("ab", "c")),
        InternalRow(s("abc xy"))),
      ("HashedBagLinear", HashedBagLinear(str0, Seq.tabulate(16)(_ * 0.1), 0.05),
        InternalRow(s("the quick fox"))),
      ("OovCount", OovCount(str0, Seq("a", "b")), InternalRow(s("a b z"))),
      ("NearestCentroid",
        NearestCentroid(dArr0, Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))),
        InternalRow(arr(0.9, 0.1))),
      ("Int8DotScaled",
        Int8DotScaled(BoundReference(0, BinaryType, nullable = true),
          BoundReference(1, FloatType, nullable = true),
          BoundReference(2, ArrayType(FloatType, containsNull = false), nullable = true)),
        InternalRow(Array[Byte](10, -5), 0.5f, arr(1.0f, 2.0f)))
    )
    def show(dt: DataType, v: Any): String = (dt, v) match {
      case (ArrayType(et, _), a: ArrayData) => a.toObjectArray(et).mkString("[", ",", "]")
      case _ => String.valueOf(v)
    }
    cases.foreach { case (name, expr, row) =>
      // a fallback mixin would make GenerateUnsafeProjection "pass" by
      // routing through interpreted eval — the exact regression this sweep
      // exists to catch, so pin the mixin's absence explicitly
      assert(!expr.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback],
        s"$name: must not regress to CodegenFallback (see the r17 " +
          "megamorphic-dispatch diagnosis in tools/bench_cpu_floor.tsv)")
      val proj =
        try GenerateUnsafeProjection.generate(Seq(expr))
        catch { case e: Throwable =>
          fail(s"$name: generated code failed to COMPILE (would silently " +
            s"run interpreted in production): $e")
        }
      val gen = show(expr.dataType, proj(row).get(0, expr.dataType))
      val interp = show(expr.dataType, expr.eval(row))
      assert(gen == interp, s"$name: codegen=$gen interpreted=$interp")
    }
  }

  test("generative codegen↔interpreted parity for the r17-converted kernels " +
      "over random multi-byte inputs") {
    // the fixed sweep cases above prove the generated code compiles; this
    // property drives the SAME projection over seeded-random inputs —
    // multi-byte unicode, empty strings, whitespace runs, empty arrays —
    // to catch byte-level kernel bugs (UTF8String offset/copy handling)
    // that hand-picked rows can miss. Seeded, so failures reproduce.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String

    val rnd = new scala.util.Random(0xbadc0de)
    val alphabet = "ab cd\tε中é \n9_" // multi-byte chars, separators, digits
    def randString(): String =
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
    def randStringArray(): GenericArrayData =
      new GenericArrayData(Array.fill[Any](rnd.nextInt(8))(
        UTF8String.fromString(randString())))
    def randFloats(): GenericArrayData =
      new GenericArrayData(Array.fill[Any](rnd.nextInt(6))(
        rnd.nextFloat() * 4f - 2f))
    def randDoubles(): GenericArrayData =
      new GenericArrayData(Array.fill[Any](rnd.nextInt(6))(
        rnd.nextDouble() * 4d - 2d))

    val sArr = BoundReference(0, ArrayType(StringType, containsNull = false), nullable = true)
    val fArr = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = true)
    val dArr = BoundReference(0, ArrayType(DoubleType, containsNull = false), nullable = true)
    val str = BoundReference(0, StringType, nullable = true)

    val subjects = Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression, () => Any)](
      ("SimHashSig", SimHashSig(sArr), randStringArray _),
      ("MinHashSig", MinHashSig(sArr, 16), randStringArray _),
      ("MinHashBandKeys", MinHashBandKeys(sArr, 16, 4), randStringArray _),
      ("SignBandKeys/f", SignBandKeys(fArr, 16, 4), randFloats _),
      ("SignBandKeys/d", SignBandKeys(dArr, 16, 4), randDoubles _),
      ("WordShingles", WordShingles(str, 2),
        () => UTF8String.fromString(randString()))
    )
    def show(dt: DataType, v: Any): String = (dt, v) match {
      case (ArrayType(et, _), a: ArrayData) => a.toObjectArray(et).mkString("[", ",", "]")
      case _ => String.valueOf(v)
    }
    subjects.foreach { case (name, expr, gen) =>
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      (1 to 200).foreach { i =>
        val row = InternalRow(gen())
        val g = show(expr.dataType, proj(row).get(0, expr.dataType))
        val e = show(expr.dataType, expr.eval(row))
        assert(g == e, s"$name iter $i: codegen=$g interpreted=$e row=$row")
      }
    }
  }

  test("Bpe.lexicon: frequency-ranked, empty and delimiter tokens excluded " +
      "before the top-K") {
    val docs = Seq((1L, "x y x"), (2L, "  "), (3L, "x \u0001bad\u0001 z"))
      .toDF("doc_id", "text")
    val lex = Bpe.lexicon(docs, "text", maxWords = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(lex == Seq(("x", 3L), ("y", 1L)), s"got $lex")
  }

  test("cosine / brute-force top-k") {
    val top = Similarity.bruteForceTopK(
      vectors.where($"vec_id" === 0), vectors, "vec_id", "embedding", 2).collect()
    assert(top.map(_.getAs[Long]("corpus_id")).toSeq == Seq(1L, 2L))
    assert(math.abs(top.head.getAs[Double]("cosine") - 0.9 / math.sqrt(0.82)) < 1e-9)
  }

  test("int8 quantize/dot: codes round-trip the dot within the quantization " +
      "error bound; zero vector quantizes to scale 0 and dot 0") {
    val df = Seq(
      (1L, Array(1.27f, -0.63f, 0.0f), Array(2.0f, 1.0f, 3.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(5.0f, 5.0f, 5.0f))
    ).toDF("id", "v", "q")
      .select($"id", $"q", $"v", Int8Quantize($"v").as("qz"))
      .select($"id",
        Int8DotScaled($"qz.codes", $"qz.scale", $"q").as("i8"),
        Similarity.dot($"v", $"q").as("fp"),
        $"qz.scale".as("scale"))
    val rows = df.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[Double]("i8"), r.getAs[Double]("fp"), r.getAs[Float]("scale"))).toMap
    val (i8, fp, scale) = rows(1L)
    // per-element quantization error ≤ scale/2 ⇒ |Δdot| ≤ scale/2 · Σ|qᵢ|
    assert(math.abs(i8 - fp) <= scale / 2.0 * 6.0 + 1e-9)
    assert(i8 != 0.0)
    assert(rows(2L) == ((0.0, 0.0, 0.0f)))
  }

  test("int8 IVF probe over the persisted index recovers the fp32 neighbors " +
      "with exact rescored cosines") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf8").toString
    val cents = Similarity.kmeansCentroids(vectors, "vec_id", "embedding", 2, 3)
    Similarity.writeIvfIndex(vectors, "vec_id", "embedding", cents, tmp)
    val got = Similarity.ivfTopKInt8FromIndex(spark,
      vectors.where($"vec_id" === 0), "vec_id", "embedding", tmp, cents,
      k = 2, nProbe = 2).orderBy("rank").collect()
    assert(got.nonEmpty && got.head.getAs[Long]("corpus_id") == 1L)
    // the fp32 rescore must surface the EXACT cosine, not the dequantized one
    assert(math.abs(got.head.getAs[Double]("cosine") - 0.9 / math.sqrt(0.82)) < 1e-9)
  }

  test("IVF top-k returns ranked neighbors from probed cells") {
    val got = Similarity.ivfTopK(vectors.where($"vec_id" === 0), vectors,
      "vec_id", "embedding", k = 2, nCentroids = 2, nProbe = 2).collect()
    assert(got.nonEmpty && got.head.getAs[Long]("corpus_id") == 1L)
  }

  test("kmeansCentroids never loses cells — empty cells keep their previous centroid") {
    // degenerate corpus: every vector identical → all rows assign to ONE
    // cell each round; the other cells must survive via the reseed join
    val same = (0L until 10L).map(i => (i, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Similarity.kmeansCentroids(same, "vec_id", "embedding", nCentroids = 4, iters = 2)
    assert(c.count() == 4)
  }

  test("persisted IVF index probe ≡ inline ivfTopK, scanning only probed " +
      "cell directories") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 3 queries × nProbe 2 probe ≤ 6 distinct cells of 8 — the strict-subset
    // scan assertion below can never be defeated by the probe union
    val queries = emb.where($"vec_id" < 3)
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    try {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", cents, tmp)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"),
          r.getAs[Int]("rank"), math.round(r.getAs[Double]("cosine") * 1e9)))
        .toSet
      val inline = rows(Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, nProbe = 2, centroids = Some(cents)))
      val fromIndex = Similarity.ivfTopKFromIndex(spark, queries, "vec_id",
        "embedding", tmp, cents, k = 5, nProbe = 2)
      assert(rows(fromIndex) == inline && inline.nonEmpty)
      // the scan bound is STRUCTURAL: the file index lists only the probed
      // cells' directories, never the full index
      val explained = fromIndex.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      val paths = "InMemoryFileIndex\\((\\d+) paths\\)".r
        .findFirstMatchIn(explained).map(_.group(1).toInt)
      assert(paths.exists(n => n >= 1 && n <= 6),
        s"probe must list a strict subset of cell dirs, saw $paths\n$explained")
      // an index whose probed cells have no directories (here: an empty
      // index) answers empty with the normal schema, not an error
      val emptyIdx = java.nio.file.Files.createTempDirectory("graft-ivfempty").toString
      try {
        val none = Similarity.ivfTopKFromIndex(spark, queries, "vec_id",
          "embedding", emptyIdx, cents, k = 5, nProbe = 2)
        assert(none.columns.toSeq ==
          Seq("query_id", "corpus_id", "cosine", "rank"))
        assert(none.count() == 0)
      } finally graft.SparkEntry.deleteDir(emptyIdx)
    } finally graft.SparkEntry.deleteDir(tmp)
  }

  test("IVF recall against brute force on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 20)
    def topSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val exact = topSet(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    val ivf = topSet(Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
      k = 5, nCentroids = 8, nProbe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 too low: $recall") // probing half the cells
  }

  test("stratifiedSample is deterministic and ~pct-sized per stratum") {
    val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(rows, "doc_id", 10)
    val again = Sampling.stratifiedSample(rows, "doc_id", 10)
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq, "content hash ⇒ reproducible")
    val frac = kept.count().toDouble / 2000
    assert(frac > 0.05 && frac < 0.15, s"~10% expected, got $frac")
  }

  test("minhashSignatures: fixed width, deterministic, drops shingle-less docs") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, numHashes = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length == 64))
    assert(sigs(0L) == sigs(3L), "exact duplicate docs share the signature")
    assert(sigs(0L) != sigs(2L))
    val tiny = Seq((9L, "one two")).toDF("doc_id", "text") // < n tokens → no shingles
    assert(Dedup.minhashSignatures(tiny, "doc_id", "text", n = 3).count() == 0)
  }

  test("chunkByTokens: window layout, overlap stitching, and edge docs") {
    val toks = (1 to 100).map(i => s"t$i")
    val input = Seq(
      (0L, toks.mkString(" ")),          // 100 tokens → 2 windows at 64/16
      (1L, "exactly ten tokens here to  check the\tshort-doc path ok"), // ≤ chunk → 1 window
      (2L, "   \t  "),                   // whitespace-only → no chunks
      (3L, (1 to 112).map(i => s"u$i").mkString(" ")) // 112 = 64+48 → exactly 2 windows
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(input, "doc_id", "text", chunkSize = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(c => (c._1, c._2))

    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(2L), "whitespace-only doc must produce no chunks")
    assert(byDoc(1L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0L, 0L, 10L)))
    assert(byDoc(1L).head._5 == "exactly ten tokens here to check the short-doc path ok",
      "runs of whitespace collapse to single spaces in chunk text")
    assert(byDoc(3L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 64L), (1L, 48L, 64L)), "112 tokens end exactly at window 2")
    assert(byDoc(0L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 64L), (1L, 48L, 52L)),
      "100 tokens → window 2 reaches the end (no window fully inside window 1)")
    // overlap stitching: window 0 ++ later windows minus their 16-token
    // overlap reconstructs the document's token stream exactly
    val chunks0 = byDoc(0L).sortBy(_._2).map(_._5.split(" ").toSeq)
    val stitched = chunks0.head ++ chunks0.tail.flatMap(_.drop(16))
    assert(stitched == toks)
  }

  test("zero-norm and NaN vectors neither crash (ANSI ÷0) nor emit pairs") {
    // Spark 4 default ANSI mode THROWS on 0.0/0.0, and NaN compares above
    // every double — an unguarded corpus with one zero or NaN vector used
    // to either kill the job or pass every ≥-threshold filter
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(1.0, 1e-9, 0.0)),            // near-dup of 1
      (3L, Seq(0.0, 0.0, 0.0)),             // zero norm
      (4L, Seq(Double.NaN, 1.0, 0.0)),      // poisoned embedding
      (5L, Seq(0.0, 1.0, 0.0))              // orthogonal to 1
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.8, numBlocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((1L, 2L)), s"only the true near-dup pair: ${pairs.toSeq}")
    val lsh = Similarity.cosinePairsLSH(vecs, "vec_id", "embedding", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!lsh.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      s"zero/NaN vectors must not pair: ${lsh.toSeq}")
    val topk = Similarity.bruteForceTopK(vecs.where($"vec_id" === 1L), vecs,
      "vec_id", "embedding", k = 2).collect()
    assert(topk.map(_.getAs[Long]("corpus_id")).toSeq == Seq(2L, 5L),
      "zero/NaN corpus vectors rank below every real neighbor")
  }

  test("embedding cosine near-dup pairs") {
    val pairs = Dedup.embeddingCosinePairs(vectors, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("grid cosinePairs ≡ brute all-pairs on real embeddings (sf0.001)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def toMapped(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        BigDecimal(r.getAs[Double]("cosine")).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .toMap
    val grid = toMapped(Similarity.cosinePairs(emb, "vec_id", "embedding", 0.4, numBlocks = 8))
    // brute reference: the non-equi self-join the grid path replaced
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val brute = toMapped(a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b", (VectorDot($"va", $"vb") /
        (sqrt(VectorDot($"va", $"va")) * sqrt(VectorDot($"vb", $"vb")))).as("cosine"))
      .where($"cosine" >= 0.4))
    assert(grid == brute)
    assert(grid.nonEmpty)
  }

  test("sign-LSH cosine pairs: exact precision, near-total recall on planted near-dups") {
    // planted pairs at cosine ≥ 0.95 (tiny perturbations of base vectors)
    val rnd = new scala.util.Random(7)
    def unit(dim: Int) = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
    val bases = (0 until 40).map(_ => unit(64))
    val rows = bases.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, perturb(v)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosinePairs(df, "vec_id", "embedding", 0.95, numBlocks = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = Similarity.cosinePairsLSH(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(lsh.subsetOf(exact), "exact verification must kill every false positive")
    assert(exact.size >= 40, "fixture should plant at least the 40 base/perturbed pairs")
    assert(lsh.size >= exact.size * 9 / 10, s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  private def causeMessages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(c => Option(c.getMessage).getOrElse("")).toSeq

  test("vector_dot / int8_dot: ragged dimensions fail loudly, never truncate") {
    // truncating to the shorter array while callers divide by full-length
    // norms yields deflated, plausible-but-wrong cosines — the guard turns
    // a silent ranking corruption into an error with the dims in it
    val ragged = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val e1 = intercept[Exception](
      ragged.select(VectorDot($"a", $"b").as("d")).collect())
    assert(causeMessages(e1).exists(_.contains("dimension mismatch")),
      s"expected loud mismatch, got: ${causeMessages(e1)}")
    val i8 = Seq((Array[Byte](1, 2), 0.5f, Array(1.0, 2.0, 3.0)))
      .toDF("codes", "scale", "q")
    val e2 = intercept[Exception](
      i8.select(Int8DotScaled($"codes", $"scale", $"q").as("d")).collect())
    assert(causeMessages(e2).exists(_.contains("dimension mismatch")),
      s"expected loud mismatch, got: ${causeMessages(e2)}")
    // equal dims still compute — the guard must not fire on the happy path
    val ok = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(VectorDot($"a", $"b").as("d")).head().getDouble(0)
    assert(ok == 11.0)
  }

  test("kmeansCentroidsLocal: NaN/Infinity vectors drop out of training " +
      "exactly like zero vectors") {
    // a NaN component would silently poison one centroid (lands on default
    // cell 0, sums += NaN) — the pin: training with poison rows present is
    // bit-identical to training on the clean subset alone
    val clean = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toDouble + 0.5)))
    val poison = Seq(
      (100L, Array(Double.NaN, 1.0, 1.0, 1.0)),
      (101L, Array(1.0, Double.PositiveInfinity, 1.0, 1.0)),
      (102L, null.asInstanceOf[Array[Double]]),
      (103L, Array(0.0, 0.0, 0.0, 0.0)))
    val withPoison = Similarity.kmeansCentroidsLocal(
      (clean ++ poison).toDF("vec_id", "embedding"), "vec_id", "embedding",
      nCentroids = 2, iters = 3)
    val cleanOnly = Similarity.kmeansCentroidsLocal(
      clean.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nCentroids = 2, iters = 3)
    assert(withPoison == cleanOnly)
    assert(withPoison.flatMap(_._2).forall(java.lang.Double.isFinite))
    // all-poison corpus fails loudly instead of emitting k = 0 centroids
    val e = intercept[IllegalArgumentException](Similarity.kmeansCentroidsLocal(
      poison.toDF("vec_id", "embedding"), "vec_id", "embedding", nCentroids = 2))
    assert(e.getMessage.contains("zero/non-finite"))
  }

  test("empty IVF answer keeps the INDEX's corpus_id type; only a fileless " +
      "index falls back to the query-id type") {
    // cross-table search (string query ids over a long-id index): the empty
    // result's schema must match the non-empty one or fixed-schema writers
    // fail only on the empty runs
    val emb = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "centroid_vec")
    val queries = Seq(("qa", Array(1.0, 0.0))).toDF("qid", "qvec")
    // probe centroids that map every query to a cell with no directory
    val farCents = Seq((100L, Seq(-1.0, -1.0))).toDF("centroid_id", "centroid_vec")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivftyped").toString
    try {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", cents, tmp)
      val empty = Similarity.ivfTopKFromIndex(spark, queries, "qid", "qvec",
        tmp, farCents, k = 3, nProbe = 1)
      assert(empty.count() == 0)
      assert(empty.schema("query_id").dataType ==
        org.apache.spark.sql.types.StringType)
      assert(empty.schema("corpus_id").dataType ==
        org.apache.spark.sql.types.LongType,
        "corpus_id must take the index's id type, not the query's")
    } finally graft.SparkEntry.deleteDir(tmp)
    val fileless = java.nio.file.Files.createTempDirectory("graft-ivfnofile").toString
    try {
      val empty = Similarity.ivfTopKFromIndex(spark, queries, "qid", "qvec",
        fileless, farCents, k = 3, nProbe = 1)
      assert(empty.count() == 0)
      assert(empty.schema("corpus_id").dataType ==
        org.apache.spark.sql.types.StringType,
        "with no index file to read, the query-id type is the only schema source")
    } finally graft.SparkEntry.deleteDir(fileless)
  }

  test("ZOrder.layout rejects an input that already carries __zkey") {
    val d = Seq((1L, 2L, 3L)).toDF("x", "y", "__zkey")
    val e = intercept[IllegalArgumentException](
      ZOrder.layout(d, Seq("x", "y"), bits = 4, numFiles = 2))
    assert(e.getMessage.contains("__zkey"))
  }
}
