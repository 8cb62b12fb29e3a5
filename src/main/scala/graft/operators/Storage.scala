package graft.operators

import graft.core.QueryRequest
import graft.model.{Span, Trace}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** F4: enable-flag gating for pipeline assembly and the query surface.
  * Mirrors the reference's storage toggles (KafkaStorage.java:55-90 —
  * aggregation / trace-by-id / trace-search / dependency flags plus the
  * autocomplete key allowlist, KafkaStorageBuilder.java:328-366): disabled
  * stages are never assembled (KafkaStorage.java:133-140) and disabled query
  * surfaces return empty results rather than failing
  * (KafkaSpanStore.java:64-69 `Call.emptyList()`).
  */
final case class StorageConfig(
    aggregationEnabled: Boolean = true,
    traceByIdQueryEnabled: Boolean = true,
    traceSearchEnabled: Boolean = true,
    dependencyQueryEnabled: Boolean = true,
    autocompleteKeys: Seq[String] = Nil)

/** The stores the enabled stages produce; `None` = stage switched off. */
final case class AssembledStores(
    traces: Option[Dataset[Trace]],
    spanNames: Option[DataFrame],
    remoteServiceNames: Option[DataFrame],
    autocompleteTags: Option[DataFrame],
    dependencyWindows: Option[DataFrame])

final class GraftStorage(val config: StorageConfig) {

  /** Assemble the batch stores the flags allow. Search stores hang off the
    * trace-search flag, dependency windows off aggregation + dependency
    * flags (no aggregated traces → nothing to link, like the reference's
    * topology wiring), autocomplete off a non-empty key allowlist.
    */
  def assemble(spans: Dataset[Span]): AssembledStores = {
    val traces =
      if (config.aggregationEnabled) Some(SpanPipeline.aggregateTraces(spans)) else None
    AssembledStores(
      traces = traces,
      spanNames =
        if (config.traceSearchEnabled) Some(SpanPipeline.spanNames(spans)) else None,
      remoteServiceNames =
        if (config.traceSearchEnabled) Some(SpanPipeline.remoteServiceNames(spans)) else None,
      autocompleteTags =
        if (config.autocompleteKeys.nonEmpty)
          Some(SpanPipeline.autocompleteTags(spans, config.autocompleteKeys))
        else None,
      dependencyWindows =
        traces.filter(_ => config.dependencyQueryEnabled)
          .map(t => SpanPipeline.dependencyWindows(SpanPipeline.dependencyLinks(t))))
  }

  def getTraces(stores: AssembledStores, spark: SparkSession,
      request: QueryRequest): Dataset[Trace] =
    stores.traces.filter(_ => config.traceSearchEnabled)
      .map(TraceQueries.getTraces(_, request)).getOrElse(emptyTraces(spark))

  def getTrace(stores: AssembledStores, spark: SparkSession, traceId: String): Dataset[Trace] =
    stores.traces.filter(_ => config.traceByIdQueryEnabled)
      .map(TraceQueries.getTrace(_, traceId)).getOrElse(emptyTraces(spark))

  def getTraceMany(stores: AssembledStores, spark: SparkSession,
      traceIds: Seq[String]): Dataset[Trace] =
    stores.traces.filter(_ => config.traceByIdQueryEnabled)
      .map(TraceQueries.getTraceMany(_, traceIds)).getOrElse(emptyTraces(spark))

  def serviceNames(stores: AssembledStores, spark: SparkSession): DataFrame =
    stores.spanNames.map(TraceQueries.serviceNames)
      .getOrElse(emptyStrings(spark, "service"))

  def spanNames(stores: AssembledStores, spark: SparkSession, service: String): DataFrame =
    stores.spanNames.map(TraceQueries.spanNames(_, service))
      .getOrElse(emptyStrings(spark, "span_name"))

  def remoteServiceNames(stores: AssembledStores, spark: SparkSession,
      service: String): DataFrame =
    stores.remoteServiceNames.map(TraceQueries.remoteServiceNames(_, service))
      .getOrElse(emptyStrings(spark, "remote_service_name"))

  def autocompleteKeys(stores: AssembledStores, spark: SparkSession): DataFrame =
    stores.autocompleteTags.map(TraceQueries.autocompleteKeys)
      .getOrElse(emptyStrings(spark, "tag_key"))

  def autocompleteValues(stores: AssembledStores, spark: SparkSession,
      key: String): DataFrame =
    stores.autocompleteTags.filter(_ => config.autocompleteKeys.contains(key))
      .map(TraceQueries.autocompleteValues(_, key))
      .getOrElse(emptyStrings(spark, "value"))

  def dependencies(stores: AssembledStores, spark: SparkSession, endTs: Long,
      lookback: Long): DataFrame =
    stores.dependencyWindows.filter(_ => config.dependencyQueryEnabled)
      .map(TraceQueries.dependencies(_, endTs, lookback))
      // full result schema: a disabled surface must stay a benign no-op for
      // callers that select counts or union with an enabled store's output
      // (schema shared with the live path so the two can never drift)
      .getOrElse(spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        TraceQueries.dependenciesSchema))

  private def emptyTraces(spark: SparkSession): Dataset[Trace] = {
    import spark.implicits._
    spark.emptyDataset[Trace]
  }

  private def emptyStrings(spark: SparkSession, name: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField(name, StringType))))
}
