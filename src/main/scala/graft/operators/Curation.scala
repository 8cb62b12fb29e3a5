package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Sampling, TextAnalysis}

/** The end-to-end corpus curation flow a pretraining pipeline runs, as one
  * composition of this library's operators — cheap narrow filters first,
  * the join-bearing stages over the already-shrunk survivors:
  *
  *  1. quality gate — [[TextAnalysis.qualityFromProfile]] ≥ `minQuality`
  *     AND [[TextAnalysis.repetitionKeep]], both single-pass expressions
  *     inside the scan (zero shuffle, maximal early pruning);
  *  2. exact dedup — keep the representative (min-id) doc per distinct
  *     text, as a min-over-window filter: one shuffle keyed by the text,
  *     no second scan ([[Dedup.exact]]'s groupBy + a semi-join back would
  *     re-scan and re-filter the corpus for the join's left side — the
  *     scan with two tokenizing expressions is the expensive stage here);
  *  3. benchmark decontamination — [[Dedup.decontaminate]] drops eval
  *     leaks from the deduped survivors (broadcast benchmark set).
  *
  * Stage order is the cost order at 100 TB: the expression filters are
  * free at scan time, dedup's one hash shuffle runs over quality
  * survivors only, and the decontamination probe sees the smallest
  * corpus of all. Each stage is individually oracle-gated by its own
  * query (`q_text_stats`/`q_repetition`, `q_dedup_exact`,
  * `q_decontaminate`); `q_curate` gates the composition itself.
  */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      minQuality: Double = 0.6, decontamN: Int = 5,
      minOverlap: Long = 2L): DataFrame = {
    val filtered = docs
      .withColumn("__p", TextAnalysis.profile(col(textCol)))
      .withColumn("__rp", TextAnalysis.repetitionProfile(col(textCol)))
      .where(TextAnalysis.qualityFromProfile(col("__p")) >= minQuality &&
        TextAnalysis.repetitionKeep(col("__rp")))
      .drop("__p", "__rp")
    // row_number, not `id === min(id) over (partition by text)`: with a
    // fully duplicated row (same id AND text — at-least-once re-ingestion)
    // both copies equal the min and both survive a min-filter; rank-1
    // keeps exactly one representative per distinct text, matching
    // [[Dedup.exact]]'s one-row-per-key semantics. Same single shuffle.
    val deduped = filtered
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(textCol)).orderBy(col(idCol))))
      .where(col("__rn") === 1)
      .drop("__rn")
    Dedup.decontaminate(deduped, idCol, textCol, benchmark, benchTextCol,
      decontamN, minOverlap)
  }

  /** The curation flow on an UNBOUNDED ingest — the streaming form of
    * [[curate]]'s first stages, composed for the micro-batch engine:
    *
    *  1. quality + repetition gate — the same single-pass expressions,
    *     stateless, evaluated inside each micro-batch's scan;
    *  2. PII redaction — stateless in-scan scrub, BEFORE dedup, so two
    *     deliveries of one document that differ only in scrubbed spans
    *     (tracking tokens, per-copy contact lines) still collapse;
    *  3. exact dedup on the REDACTED text — [[Dedup.exactStream]],
    *     watermark-bounded state (keys-per-horizon, never keys-ever).
    *
    * Benchmark decontamination is equally stateless (broadcast probe) and
    * composes the same way; it stays out of this signature because the
    * benchmark set is a batch-side input ([[curate]] gates it).
    */
  def curateStream(docs: DataFrame, textCol: String, eventTimeCol: String,
      horizon: String, minQuality: Double = 0.6): DataFrame = {
    val filtered = docs
      .withColumn("__p", TextAnalysis.profile(col(textCol)))
      .withColumn("__rp", TextAnalysis.repetitionProfile(col(textCol)))
      .where(TextAnalysis.qualityFromProfile(col("__p")) >= minQuality &&
        TextAnalysis.repetitionKeep(col("__rp")))
      .drop("__p", "__rp")
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
    Dedup.exactStream(filtered, Seq(textCol), eventTimeCol, horizon)
  }

  /** Terminal stage: export the curated corpus as `nShards` deterministic
    * training shards. Shard assignment is CONTENT-addressed
    * ([[Sampling.bucket]] over the text — the portable md5 hash, never
    * `rand()` or `spark_partition_id`), so a retry, a backfill, or a
    * different cluster width lands every document in the same shard; and
    * within a shard rows are written in (shard, id) order, so the bytes
    * are reproducible too — shard-diffing two pipeline runs shows real
    * changes, not shuffle noise.
    *
    * Physical shape: one hash repartition keyed by the shard id (the only
    * shuffle — `partitionBy` then splits directories without moving rows
    * again), one file per shard per task. At 100 TB, `nShards` is sized so
    * a shard is a few GB (tens of thousands of shards): each write task
    * owns whole shards, stays memory-bounded via the sort, and downstream
    * trainers stream shard files independently.
    */
  def writeTrainingShards(docs: DataFrame, outDir: String, idCol: String,
      textCol: String, nShards: Int): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs
      .withColumn("shard", Sampling.bucket(col(textCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
