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
    // size the decision from the optimizer's leaf stats instead of
    // df.rdd.getNumPartitions: the old probe materialized the physical plan
    // and its RDD DAG on every call, this is one logical-optimization pass.
    // A source under cores × maxPartitionBytes cannot yield `par` native
    // splits, and repartitioning it is cheap by the same bound; anything
    // bigger splits natively and passes through untouched.
    val maxSplitBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < BigInt(par) * maxSplitBytes)
      df.repartition(par)
    else df
  }
}
