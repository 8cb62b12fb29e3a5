package graft.sources

import graft.SparkSpec
import graft.operators.SpanPipeline
import org.apache.spark.sql.functions._

/** The fused one-shuffle sessionization must produce exactly the traces of
  * the generic path (window-lag spans → groupBy-trace aggregation).
  */
class EventSpansSpec extends SparkSpec {

  import spark.implicits._

  // ONE copy of the ts-dialect handling (ns-as-long vs TIMESTAMP_NTZ):
  // the entry point's reader, not a spec-local re-implementation that
  // drifts when the testdata generator changes precision
  private lazy val events =
    graft.SparkEntry.events(spark, "/root/testdata/sf0.001")

  test("events reader still decodes the legacy ns-as-int64 ts dialect") {
    // the 2026-08-13 testdata regeneration switched ts to zoneless µs, so
    // nothing in /root/testdata exercises the LongType branch anymore —
    // this fixture keeps the pre-regeneration dialect from silently rotting
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-nsdialect").toString
    try {
      val nanos = 1705312800123456789L // µs-truncation must drop the 789
      Seq((1L, nanos, 7L, "purchase", 1.0, """{"k": 1}"""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$tmp/events.parquet")
      val got = graft.SparkEntry.events(spark, tmp)
      assert(got.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      val micros = got.select(unix_micros($"ts")).head().getLong(0)
      assert(micros == nanos / 1000)
    } finally graft.SparkEntry.deleteDir(tmp)
  }

  test("fused sessionTraces equals aggregateTraces over EventSpans.spans") {
    val generic = SpanPipeline.aggregateTraces(EventSpans.spans(spark, events))
      .collect().map(t => t.trace_id -> t).toMap
    val fused = EventSpans.sessionTraces(spark, events)
      .collect().map(t => t.trace_id -> t).toMap
    assert(fused.keySet == generic.keySet)
    for ((id, f) <- fused) {
      val g = generic(id)
      assert(f.root_ts == g.root_ts, s"root_ts mismatch for $id")
      assert(f.spans.map(_.id).sorted == g.spans.map(_.id).sorted, s"span set mismatch for $id")
      assert(f.spans.map(s => s.id -> s.parent_id).toMap ==
        g.spans.map(s => s.id -> s.parent_id).toMap, s"chain mismatch for $id")
    }
  }

  test("fused sessions agree with Spark's session_window operator") {
    import org.apache.spark.sql.functions._
    val sessionWindowSessions = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getStruct(1).getTimestamp(0).getTime, r.getLong(2)))
      .toSet
    val fusedSessions = EventSpans.sessionTraces(spark, events).collect()
      .map(t => (t.trace_id.split(":")(0).toLong, t.root_ts / 1000, t.spans.size.toLong))
      .toSet
    assert(fusedSessions == sessionWindowSessions)
  }

  test("relational spanFields stores ≡ typed Span-path stores") {
    val typedSpans = EventSpans.spans(spark, events)
    val fields = EventSpans.spanFields(events)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSet
    assert(rows(SpanPipeline.spanNamesRelational(fields)) ==
      rows(SpanPipeline.spanNames(typedSpans)))
    assert(rows(SpanPipeline.remoteServiceNamesRelational(fields)) ==
      rows(SpanPipeline.remoteServiceNames(typedSpans)))
    assert(rows(SpanPipeline.autocompleteTagsRelational(fields, Seq("k"))) ==
      rows(SpanPipeline.autocompleteTags(typedSpans, Seq("k"))))
  }

  test("stores that skip remote_service never pay the sessionization windows") {
    val plan = SpanPipeline.spanNamesRelational(EventSpans.spanFields(events))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"window survived pruning:\n$plan")
  }

  test("sessions split at the 30-minute gap and chain within") {
    val traces = EventSpans.sessionTraces(spark, events).collect()
    assert(traces.nonEmpty)
    for (t <- traces) {
      val ts = t.spans.flatMap(_.timestamp).sorted
      // no intra-session gap at/above 30 min
      assert(ts.zip(ts.tail).forall { case (a, b) => b - a < 30L * 60 * 1000 * 1000 })
      // exactly one root, every parent_id resolves in-trace
      assert(t.spans.count(_.parent_id.isEmpty) == 1)
      val ids = t.spans.map(_.id).toSet
      assert(t.spans.flatMap(_.parent_id).forall(ids.contains))
    }
  }
}
