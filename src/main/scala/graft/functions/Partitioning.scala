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
    if (df.isStreaming) return df // partition probing needs an executed plan
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
