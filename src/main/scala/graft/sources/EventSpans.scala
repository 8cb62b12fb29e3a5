package graft.sources

import graft.model.{Endpoint, Span}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adapter from a generic event log (the driver's `events` table:
  * event_id, ts, user_id, event_type, value, props) to the span/trace data
  * model, so the trace engine's operators run — and are oracle-checked —
  * against the driver harness data.
  *
  * Mapping: each user's activity is sessionized with a 30-minute inactivity
  * gap (the batch analog of the reference's session-window trace aggregation,
  * SpanAggregationTopology.java:74-86); each session becomes one trace whose
  * spans form a chain in event order (parent = previous event). Every span is
  * a SERVER span of service `event_type`, so DependencyLinker derives one
  * edge per consecutive event-type transition. `error` events carry an
  * "error" tag, feeding errorCount.
  *
  * Scale: one window shuffle on user_id (sessionization + chaining share the
  * same partitioning — single Exchange), then the trace groupBy; per-group
  * state is bounded by session size.
  */
object EventSpans {

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** events → one row per event with session_id and parent event id. */
  def sessionized(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      // `>=` matches Spark session_window semantics: an event exactly one gap
      // after the previous one starts a new session (event ranges are
      // half-open [ts, ts+gap)).
      .withColumn("new_session",
        (col("prev_us").isNull || col("ts_us") - col("prev_us") >= SessionGapMs * 1000L)
          .cast("int"))
      .withColumn("session_id",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      // previous event in the same user is the chain parent unless this event
      // starts a new session (sessions are contiguous in the sort order).
      .withColumn("parent_event",
        when(col("new_session") === 1, lit(null)).otherwise(lag("event_id", 1).over(byUser)))
      .withColumn("parent_type",
        when(col("new_session") === 1, lit(null)).otherwise(lag("event_type", 1).over(byUser)))
  }

  /** Fused events → traces path: ONE shuffle (repartition by user + in-
    * partition sort), then sessions, chains, TraceMerge and root timestamps
    * are built in a single `mapPartitions` pass over the sorted run — no
    * window operator, no second groupBy-trace shuffle. Produces exactly the
    * traces of `SpanPipeline.aggregateTraces(spans(events))` (spec-checked);
    * this is the 100 TB shape for pre-sorted/sessionizable event logs.
    */
  def sessionTraces(spark: SparkSession, events: DataFrame): Dataset[graft.model.Trace] = {
    import spark.implicits._
    val gapUs = SessionGapMs * 1000L
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("props"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .as[(Long, Long, String, Long, Double, String)]
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[graft.model.Trace] {
          private var lastUser = Long.MinValue
          private var sessionCounter = 0
          override def hasNext: Boolean = b.hasNext
          override def next(): graft.model.Trace = {
            val user = b.head._1
            if (user != lastUser) { lastUser = user; sessionCounter = 1 }
            else sessionCounter += 1
            val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
            var prev: Option[(Long, Long, String, Long, Double, String)] = None
            var open = true
            while (open && b.hasNext && b.head._1 == user) {
              val e = b.head
              if (prev.exists(p => e._4 - p._4 >= gapUs)) open = false
              else {
                b.next()
                spans += toSpan(user, sessionCounter, e, prev.map(_._2), prev.map(_._3))
                prev = Some(e)
              }
            }
            val merged = graft.core.TraceMerge.merge(spans.toSeq)
            graft.model.Trace(s"$user:$sessionCounter", merged,
              graft.operators.SpanPipeline.rootTimestamp(merged))
          }
        }
      }
  }

  private val PropsK = """"k"\s*:\s*(\d+)""".r

  /** remote endpoint = the calling (previous) event's service: the linker
    * derives the same parent it would via the ancestor walk, and the
    * remote-service-names store (A8) gets real data.
    */
  private def toSpan(userId: Long, sessionId: Long,
      e: (Long, Long, String, Long, Double, String), parentEvent: Option[Long],
      callerType: Option[String]): Span = {
    val kTag = Option(e._6).flatMap(p => PropsK.findFirstMatchIn(p).map("k" -> _.group(1)))
    Span(
      trace_id = s"$userId:$sessionId",
      parent_id = parentEvent.map(_.toString),
      id = e._2.toString,
      kind = Some("SERVER"),
      name = Some(e._3),
      timestamp = Some(e._4),
      duration = Some((e._5 * 1000).toLong),
      local_endpoint = Some(Endpoint(service_name = Some(e._3))),
      remote_endpoint = callerType.map(c => Endpoint(service_name = Some(c))),
      tags = (if (e._3 == "error") Map("error" -> "") else Map.empty[String, String]) ++ kTag)
  }

  /** Relational span projection of the events adapter — the [[toSpan]] field
    * mapping (service/name = event_type, remote service = previous event's
    * type, "error"/"k" tags) as pure columns over [[sessionized]], feeding
    * the `...Relational` store builders in
    * [[graft.operators.SpanPipeline]]. No Span construction, no typed
    * encode/decode; stores that don't read `remote_service` never pay the
    * sessionization windows either (Catalyst prunes the unreferenced window
    * expressions out of the plan).
    */
  def spanFields(events: DataFrame): DataFrame = {
    // the SAME regex OBJECT as toSpan's PropsK — not get_json_object, and
    // not a re-typed string literal (which could silently drift from the
    // typed path's pattern) — so the relational and typed paths agree on
    // every input, not just well-formed flat props (a quoted or nested "k"
    // would otherwise diverge)
    val kTag = regexp_extract(col("props"), PropsK.regex, 1)
    sessionized(events).select(
      col("event_type").as("service"),
      col("event_type").as("name"),
      col("parent_type").as("remote_service"),
      col("ts_us").as("event_us"),
      map_concat(
        when(col("event_type") === "error", map(lit("error"), lit("")))
          .otherwise(map()),
        when(col("props").isNotNull && kTag =!= "", map(lit("k"), kTag))
          .otherwise(map())).as("tags"))
  }

  /** events → Dataset[Span] chains per (user, session). */
  def spans(spark: SparkSession, events: DataFrame): Dataset[Span] = {
    import spark.implicits._
    sessionized(events)
      .select("user_id", "session_id", "event_id", "parent_event", "event_type",
        "ts_us", "value", "props", "parent_type")
      .as[(Long, Long, Long, Option[Long], String, Long, Double, String, Option[String])]
      .map { case (userId, sessionId, eventId, parentEvent, eventType, tsUs, value, props, parentType) =>
        toSpan(userId, sessionId, (userId, eventId, eventType, tsUs, value, props),
          parentEvent, parentType)
      }
  }
}
