package graft.functions

import org.apache.spark.sql.DataFrame

private[functions] object Partitioning {

  /** Spread an under-split input across the cluster before explode-amplified
    * or arithmetic-heavy per-row work (shingling, minhash signatures, vector
    * scoring). A source with fewer splits than cores — a single small
    * parquet file, a bucketed-to-one store — would otherwise run the whole
    * expensive projection on one task; a source with enough native splits
    * passes through untouched, so no shuffle is added at real scale.
    */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // logical stats need a batch plan
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    // decide from the optimizer's leaf stats first: a source under
    // cores × maxPartitionBytes cannot yield `par` native splits, and
    // repartitioning it is cheap by the same bound — no physical plan or RDD
    // DAG materialized (the old probe paid that on every call). Only a
    // big-or-unknown-size source (stats ≥ threshold, incl. RDD-backed frames
    // reporting defaultSizeInBytes = Long.Max) falls back to the partition
    // probe, which protects unsplittable big single-split inputs (one gzip
    // file) from running the downstream projection on one task.
    val maxSplitBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val smallByStats =
      df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(par) * maxSplitBytes
    if (smallByStats || df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
