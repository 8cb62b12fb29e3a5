package graft.sources

import graft.model.{Span, Spans}
import graft.streaming.SpanEnvelope
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.ArrayType

/** Span sources/sinks (SURVEY §2.1 S1-S5).
  *
  * The reference moves proto3-encoded span lists over Kafka topics keyed by
  * trace ID (KafkaSpanConsumer.java:37-49, streams/serdes/SpansSerde.java).
  * Here the wire format is Zipkin JSON_V2 span lists; the Kafka record
  * timestamp becomes the session event time (ST1). The kafka format needs the
  * spark-sql-kafka connector on the classpath (not present in this container
  * — wiring compiles and is exercised in integration environments; the
  * file-based source below runs everywhere and drives the same pipeline).
  */
object SpanSources {

  /** S2: Kafka spans topic → SpanEnvelope stream (value = JSON_V2 span list,
    * one envelope per span; record timestamp drives sessionization).
    */
  def fromKafka(spark: SparkSession, bootstrapServers: String,
      topic: String = "zipkin-spans"): Dataset[SpanEnvelope] = {
    import spark.implicits._
    val flat = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load()
      .select(col("timestamp").as("ingest_ts"),
        explode(from_json(col("value").cast("string"), ArrayType(Spans.schema))).as("span"))
      .select(col("ingest_ts"), col("span.*"))
    // normalize exactly like the file/batch paths: canonical trace ids (a
    // 64- vs 128-bit report of one trace must session to ONE key) and
    // non-null containers (TraceMerge/DependencyLinker dereference them)
    Spans.normalize(flat)
      .select(col("ingest_ts"),
        struct(Spans.schema.fieldNames.map(col): _*).as("span"))
      .as[SpanEnvelope]
  }

  /** S1 batch ingest analog: write a span Dataset to the spans topic keyed by
    * (normalized) trace ID — the reference's span-partitioning step.
    */
  def toKafkaSpans(spans: Dataset[Span], bootstrapServers: String,
      topic: String = "zipkin-spans"): Unit =
    spans.toDF()
      .select(Spans.normalizeTraceId(col("trace_id")).as("key"),
        to_json(array(struct(col("*")))).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** S4/S5: stream sink to a Kafka topic, keyed (trace ID / "parent:child"). */
  def toKafkaStream(df: DataFrame, keyCol: String, bootstrapServers: String,
      topic: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(col(keyCol).cast("string").as("key"), to_json(struct(col("*"))).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)

  /** File-based streaming source: JSON_V2 span lines landing in a directory
    * (runs in any environment; same downstream pipeline as Kafka). The span's
    * own timestamp (µs→ms) is the event time; spans without one take the
    * arrival (batch) time — epoch 0 would be dropped as late by the
    * watermark, silently losing the span from its trace.
    */
  def fromJsonFiles(spark: SparkSession, path: String): Dataset[SpanEnvelope] = {
    import spark.implicits._
    Spans.normalize(spark.readStream.schema(Spans.schema).json(path))
      .select(coalesce(timestamp_micros(col("timestamp")), current_timestamp())
        .as("ingest_ts"),
        struct(col("*")).as("span"))
      .as[SpanEnvelope]
  }

  /** Batch JSON_V2 span lines (fixtures, backfills). */
  def fromJson(spark: SparkSession, path: String): Dataset[Span] =
    Spans.readJson(spark, path)
}
