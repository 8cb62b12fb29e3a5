package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. All
  * assignments derive from a portable content hash (md5), so they are
  * reproducible across runs, engines and cluster sizes — never `rand()`,
  * which would re-deal on every retry/backfill and leak val into train.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id column. */
  def bucket(id: Column, buckets: Int): Column =
    pmod(HashFunctions.portableHash64(id.cast("string")), lit(buckets.toLong))

  /** Deterministic train/val/test split: fractions in buckets of 1/denom. */
  def split(df: DataFrame, idCol: String, trainPct: Int = 90, valPct: Int = 5,
      denom: Int = 100): DataFrame = {
    // loud failure beats a silently shrunken val/test split — a
    // misconfigured overlap is a train/val leak in a module whose whole
    // point is deterministic leak-free splits
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= denom,
      s"train ($trainPct) + val ($valPct) must fit in denom ($denom)")
    val b = bucket(col(idCol), denom)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Keep `pct`% of rows per stratum (e.g. per language/source), chosen by
    * content hash — deterministic stratified downsampling.
    */
  def stratifiedSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.where(bucket(col(idCol), 100) < pct)

  /** Deterministic EXACT-N sample: the n rows with the smallest content
    * hash (id tiebreak) — the fixed-budget subset primitive (eval slices,
    * labeling batches) where a percentage is the wrong contract. Same
    * hash as [[bucket]], so the choice is stable across runs, engines,
    * and cluster widths, and samples of growing n are NESTED (n=100 ⊂
    * n=1000 — growing a labeling budget extends the batch instead of
    * re-dealing it). Physical shape: a global sort-limit plans as
    * TakeOrderedAndProject — a per-partition top-n heap merged at the
    * driver, never a full sort of the corpus.
    */
  def exactN(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 0, s"sample size must be non-negative, got $n")
    df.orderBy(HashFunctions.portableHash64(col(idCol).cast("string")),
      col(idCol)).limit(n)
  }

  /** Domain-mix rebalancing: keep a PER-STRATUM percentage (e.g. upweight
    * curated sources, downweight crawl) chosen by the same content hash —
    * the deterministic version of the source-weighted sampling every
    * pretraining mix applies. `weights` maps stratum value → keep-%, with
    * `defaultPct` for unlisted strata; the weight table compiles into one
    * CASE expression evaluated in the scan (broadcast-free, shuffle-free —
    * a join against a weights table would shuffle or broadcast for what is
    * a literal lookup).
    */
  def weightedSample(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Int], defaultPct: Int): DataFrame = {
    (weights.values ++ Seq(defaultPct)).foreach(p =>
      require(p >= 0 && p <= 100, s"keep-% must be in [0,100], got $p"))
    val pct = weights.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, p).otherwise(acc)
    }
    df.where(bucket(col(idCol), 100) < pct)
  }
}
