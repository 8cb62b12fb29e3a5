package graft.operators

import graft.core.{DependencyLinker, TraceMerge}
import graft.model.{DependencyLink, Span, Trace}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch pipeline: the reference's three Kafka Streams topologies
  * (SpanAggregationTopology, TraceStorageTopology, DependencyStorageTopology —
  * /root/reference storage/.../streams/) re-expressed as DataFrame/Dataset
  * transforms over a static span collection. The streaming variants live in
  * [[graft.streaming.StreamingPipeline]]; both share these semantics.
  *
  * Scale posture (SURVEY §7.4-7): every aggregation is keyed by trace_id or
  * (key, window) — one shuffle per store, no global or driver-side state;
  * per-group work is bounded by trace size.
  */
object SpanPipeline {

  /** Spans → canonical traces: groupBy trace id + TraceMerge dedup
    * (SURVEY §2.4 A1/A6 batch analog; P1 = the only shuffle here).
    * root_ts = root-span timestamp, the ordering key of the trace store (W1).
    */
  def aggregateTraces(spans: Dataset[Span]): Dataset[Trace] = {
    val spark = spans.sparkSession
    import spark.implicits._
    spans.groupByKey(_.trace_id).mapGroups { (id, it) =>
      val merged = TraceMerge.merge(it.toSeq)
      Trace(id, merged, rootTimestamp(merged))
    }
  }

  def rootTimestamp(spans: Seq[Span]): Long = graft.core.Traces.rootTimestamp(spans)

  /** Traces → per-trace dependency edges (SURVEY §2.4 A3, P3).
    * Narrow (no shuffle): runs on the already-grouped trace rows.
    */
  def dependencyLinks(traces: Dataset[Trace]): Dataset[(Long, DependencyLink)] = {
    val spark = traces.sparkSession
    import spark.implicits._
    traces.flatMap(t => DependencyLinker.link(t.spans).map(l => (t.root_ts / 1000, l)))
      .toDF("ts_ms", "link").as[(Long, DependencyLink)]
  }

  /** Per-minute windowed call/error counts per parent:child edge
    * (SURVEY §2.4 A4; reference DependencyStorageTopology.java:70-105).
    * Output: window_start_ms, parent, child, call_count, error_count.
    */
  def dependencyWindows(links: Dataset[(Long, DependencyLink)]): DataFrame =
    links.toDF("ts_ms", "link")
      .select(
        (col("ts_ms") - (col("ts_ms") % 60000)).as("window_start_ms"), // 1-min tumble
        col("link.parent").as("parent"), col("link.child").as("child"),
        col("link.call_count").as("call_count"), col("link.error_count").as("error_count"))
      .groupBy("window_start_ms", "parent", "child")
      .agg(sum("call_count").as("call_count"), sum("error_count").as("error_count"))

  /** Span-projection schema the name stores aggregate over: `service`,
    * `name`, `remote_service`, `tags MAP<STRING,STRING>`. The typed builders
    * below project `Dataset[Span]` onto it; sources whose span fields are
    * derivable as pure columns (e.g. [[graft.sources.EventSpans.spanFields]])
    * feed the `...Relational` variants directly, so the stores build inside
    * the scan's codegen loop with no Span object construction.
    */
  private def projected(spans: Dataset[Span]): DataFrame =
    spans.toDF().select(
      col("local_endpoint.service_name").as("service"), col("name"),
      col("remote_endpoint.service_name").as("remote_service"), col("tags"))

  /** Span names per service over the span projection (SURVEY §2.4 A7 —
    * implementing the evident intent, `collect_set`, not the reference's
    * drop-on-existing-window bug at TraceStorageTopology.java:175-179).
    */
  def spanNamesRelational(spanFields: DataFrame): DataFrame =
    spanFields
      .select(col("service"), col("name"))
      .where(col("service").isNotNull && col("name").isNotNull)
      .groupBy("service").agg(sort_array(collect_set("name")).as("span_names"))

  def spanNames(spans: Dataset[Span]): DataFrame =
    spanNamesRelational(projected(spans))

  /** Remote service names per service (SURVEY §2.4 A8;
    * TraceStorageTopology.java:187-205).
    */
  def remoteServiceNamesRelational(spanFields: DataFrame): DataFrame =
    spanFields
      .select(col("service"), col("remote_service"))
      .where(col("service").isNotNull && col("remote_service").isNotNull)
      .groupBy("service").agg(sort_array(collect_set("remote_service")).as("remote_service_names"))

  def remoteServiceNames(spans: Dataset[Span]): DataFrame =
    remoteServiceNamesRelational(projected(spans))

  /** Autocomplete tag values for the configured keys (SURVEY §2.4 A8;
    * TraceStorageTopology.java:207-228, keys config KafkaStorage.java:61).
    *
    * `extraGroups` are (name, expression-over-spanFields) pairs carried
    * through the explode and ADDED to the grouping key — the incremental
    * delta sink groups by its `seen_date` partition column through this same
    * expression, so the Update-mode store, the batch query surface, and the
    * delta-append write side can never drift apart.
    */
  def autocompleteTagsRelational(spanFields: DataFrame, keys: Seq[String],
      extraGroups: Seq[(String, org.apache.spark.sql.Column)] = Nil): DataFrame =
    spanFields
      .select(explode(map_entries(col("tags"))).as("kv") +:
        extraGroups.map { case (n, c) => c.as(n) }: _*)
      .select(col("kv.key").as("tag_key") +: col("kv.value").as("tag_value") +:
        extraGroups.map(g => col(g._1)): _*)
      .where(col("tag_key").isin(keys: _*) && col("tag_value").isNotNull)
      .groupBy((extraGroups.map(_._1) :+ "tag_key").map(col): _*)
      .agg(sort_array(collect_set("tag_value")).as("values"))

  def autocompleteTags(spans: Dataset[Span], keys: Seq[String]): DataFrame =
    autocompleteTagsRelational(projected(spans), keys)
}
