package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget bins ("pack the context window"), greedy first-fit
  * in deterministic order — the step between chunking/tokenization and
  * batch assembly.
  *
  * Packing is inherently sequential (each placement depends on the
  * previous bin's fill), so the scale design is the one production
  * packers use: split the corpus into `streams` INDEPENDENT streams by
  * content-stable hash of the id ([[HashFunctions.portableHash64]] — the
  * [[Sampling]] hash; never `rand()`, so re-runs, retries, and other
  * engines place every doc identically), pack
  * each stream greedily in id order, and emit (stream, bin) pairs. Bins
  * from different streams are distinct bins; with streams ≫ executors the
  * sequential work parallelizes to the cluster width while each stream's
  * packing stays exactly greedy. The per-stream scan is the only
  * imperative step — one `mapPartitions` over rows sorted
  * (stream, id) within stream-hash partitions, O(1) state per stream —
  * which is the documented last-resort shape, used here because a window
  * function cannot express "reset the running sum when it crosses the
  * budget" (that running state is the operator).
  *
  * Greedy rule per stream, docs in ascending id order: a doc goes into
  * the current bin when it fits (`fill + n ≤ budget`), else opens a new
  * bin. A doc longer than the whole budget gets a bin of its own (it
  * lands in a fresh bin and the next doc necessarily overflows it) — it
  * is the caller's job to chunk oversized docs first
  * ([[Chunking.chunkByTokens]]).
  */
object Packing {

  /** @param budget  max tokens per bin (the training context length)
    * @param streams independent packing streams (parallelism unit)
    * @return (idCol, n_tokens, stream, bin, bin_fill) — `bin` numbered
    *         from 0 within its stream; `bin_fill` the bin's running fill
    *         AFTER placing this doc (the last row of a bin carries its
    *         final fill)
    */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, streams: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(streams > 0, "streams must be positive")
    // integral ids only, checked loudly: cast("long") maps a string/decimal
    // id to null, and the null-guard below would then silently drop the
    // ENTIRE corpus (ANSI mode instead kills the job mid-cast) — the worst
    // possible failure shape for a packing operator
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"packGreedy requires an integral id column, got $idCol: $t")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.select(col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      // a null id/count would NPE inside the primitive-Long encoder below —
      // an unpackable doc (null text upstream makes size(null) null) is
      // dropped here, not mid-job; token counts come from the caller, so
      // negatives are refused the same way rather than corrupting fills
      .where(col("id").isNotNull && col("n_tokens").isNotNull &&
        col("n_tokens") >= 0)
      .withColumn("stream", Sampling.bucket(col("id"), streams))
      // RANGE-partition the stream value: hash-repartition on N streams
      // into N partitions leaves ~1/3 of tasks empty to hash collisions
      // and stacks 2-3 streams on one task — range boundaries give ~one
      // stream per partition. Several streams may still share a partition
      // (sampling is approximate), so the scan below resets its state on
      // every stream change — correctness never depends on the partition
      // layout, only parallelism does
      .repartitionByRange(math.min(streams, spark.sparkContext.defaultParallelism),
        col("stream"))
      .sortWithinPartitions("stream", "id")
      .as[(Long, Long, Long)]
    in.mapPartitions { rows =>
      var stream = -1L
      var bin = -1L
      var fill = 0L
      rows.map { case (id, n, s) =>
        if (s != stream) { stream = s; bin = 0L; fill = 0L }
        if (fill > 0 && fill + n > budget) { bin += 1; fill = 0L }
        fill += n
        (id, n, s, bin, fill)
      }
    }.toDF(idCol, "n_tokens", "stream", "bin", "bin_fill")
  }

  /** Assemble each packed bin into its training SEQUENCE — the artifact a
    * trainer actually consumes: the bin's documents joined back to their
    * text and concatenated in placement order (ascending id, the greedy
    * order) with an end-of-document separator. One equi-join on the id
    * plus one (stream, bin)-keyed aggregation; within-bin order comes
    * from sorting the collected (id, text) structs, not from shuffle
    * arrival order, so the bytes are deterministic.
    *
    * @return (stream, bin, n_docs, seq)
    */
  def materialize(packed: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, eod: String = "<|eod|>"): DataFrame =
    packed.select(col(idCol), col("stream"), col("bin"))
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("stream"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol).as("i"), col(textCol).as("t")))),
          x => x.getField("t")), eod).as("seq"))
}
