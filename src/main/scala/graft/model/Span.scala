package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zipkin V2 span data model (see /root/reference
  * storage/src/main/java/zipkin2/storage/kafka — the span fields consumed are
  * inventoried in SURVEY.md §1.2). Field names follow JSON_V2 snake_case so
  * JSON fixtures load directly into `Dataset[Span]`.
  */
final case class Endpoint(
    service_name: Option[String] = None,
    ipv4: Option[String] = None,
    ipv6: Option[String] = None,
    port: Option[Int] = None)

final case class Annotation(timestamp: Long, value: String)

final case class Span(
    trace_id: String,
    parent_id: Option[String] = None,
    id: String = "",
    kind: Option[String] = None,
    name: Option[String] = None,
    timestamp: Option[Long] = None, // epoch µs
    duration: Option[Long] = None,  // µs
    local_endpoint: Option[Endpoint] = None,
    remote_endpoint: Option[Endpoint] = None,
    annotations: Seq[Annotation] = Nil,
    tags: Map[String, String] = Map.empty,
    shared: Option[Boolean] = None,
    debug: Option[Boolean] = None) {

  def localServiceName: Option[String] = local_endpoint.flatMap(_.service_name)
  def remoteServiceName: Option[String] = remote_endpoint.flatMap(_.service_name)
  def isShared: Boolean = shared.contains(true)
  def timestampAsLong: Long = timestamp.getOrElse(0L)
}

final case class DependencyLink(
    parent: String,
    child: String,
    call_count: Long,
    error_count: Long)

/** One row per aggregated trace: the unit the reference emits to its
  * `zipkin-trace` topic and stores in the traces window store
  * (streams/SpanAggregationTopology.java:88-92,
  * streams/TraceStorageTopology.java:96-126).
  */
final case class Trace(
    trace_id: String,
    spans: Seq[Span],
    root_ts: Long // µs; root-span timestamp used for query-time ordering (W1)
)

object Spans {

  val endpointSchema: StructType = StructType(Seq(
    StructField("service_name", StringType),
    StructField("ipv4", StringType),
    StructField("ipv6", StringType),
    StructField("port", IntegerType)))

  val schema: StructType = StructType(Seq(
    StructField("trace_id", StringType, nullable = false),
    StructField("parent_id", StringType),
    StructField("id", StringType, nullable = false),
    StructField("kind", StringType),
    StructField("name", StringType),
    StructField("timestamp", LongType),
    StructField("duration", LongType),
    StructField("local_endpoint", endpointSchema),
    StructField("remote_endpoint", endpointSchema),
    StructField("annotations", ArrayType(StructType(Seq(
      StructField("timestamp", LongType, nullable = false),
      StructField("value", StringType, nullable = false))))),
    StructField("tags", MapType(StringType, StringType)),
    StructField("shared", BooleanType),
    StructField("debug", BooleanType)))

  /** Normalize a trace-ID column to canonical 16/32 lowercase hex
    * (SURVEY §2.2 P5; reference relies on zipkin-core `Span.normalizeTraceId`).
    */
  def normalizeTraceId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lowered = lower(c)
    when(length(lowered) > 16, lpad(lowered, 32, "0")).otherwise(lpad(lowered, 16, "0"))
  }

  /** String twin of the Column normalization — MUST match it exactly (lpad
    * pads left and truncates over-long input to the target length).
    */
  def normalizeTraceId(id: String): String = {
    val lowered = id.toLowerCase(java.util.Locale.ROOT) // parity with Column lower()
    val target = if (lowered.length > 16) 32 else 16
    if (lowered.length >= target) lowered.take(target)
    else ("0" * (target - lowered.length)) + lowered
  }

  /** Read Zipkin JSON_V2 span lines into a typed Dataset, with null
    * containers replaced so downstream Scala never sees null Seq/Map.
    */
  def readJson(spark: SparkSession, path: String): Dataset[Span] = {
    import spark.implicits._
    normalize(spark.read.schema(schema).json(path)).as[Span]
  }

  /** Canonicalize a span DataFrame: normalized trace id, non-null
    * annotations/tags containers.
    */
  def normalize(df: DataFrame): DataFrame =
    df.withColumn("trace_id", normalizeTraceId(col("trace_id")))
      .withColumn("annotations", coalesce(col("annotations"), array()))
      .withColumn("tags", coalesce(col("tags"), map()))
}
