package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.streaming.OutputMode

/** JSON_V2 span codec + file-based streaming ingest (FIXTURES.md §1). */
class SpanSourcesSpec extends SparkSpec {

  import spark.implicits._

  private val fixtureLines = Seq(
    """{"trace_id":"000000000000000A","id":"000000000000000a","name":"op_a","kind":"CLIENT","local_endpoint":{"service_name":"svc_a"},"timestamp":61000000,"duration":11,"tags":{"environment":"dev"}}""",
    """{"trace_id":"000000000000000a","id":"000000000000000b","parent_id":"000000000000000a","name":"op_b","kind":"SERVER","local_endpoint":{"service_name":"svc_b"},"timestamp":61000000,"duration":10}""",
    """{"trace_id":"c","id":"000000000000000c","name":"op_c","kind":"SERVER","local_endpoint":{"service_name":"svc_c"},"timestamp":121500000,"duration":8}""")

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-spans")
    Files.writeString(dir.resolve("spans.json"), fixtureLines.mkString("\n"))
    dir.toString
  }

  test("batch codec round-trip: normalized ids, null containers replaced") {
    val spans = SpanSources.fromJson(spark, writeFixture()).collect()
    assert(spans.length == 3)
    val byId = spans.map(s => s.id -> s).toMap
    // uppercase id lowercased, short id left-padded to 16 hex
    assert(byId("000000000000000a").trace_id == "000000000000000a")
    assert(byId("000000000000000c").trace_id == "000000000000000c")
    assert(byId("000000000000000b").tags == Map.empty) // null map → empty
    assert(byId("000000000000000a").tags == Map("environment" -> "dev"))
    assert(byId("000000000000000b").annotations == Nil)
  }

  test("parquet span source round-trips the JSON-decoded spans") {
    val fromJson = SpanSources.fromJson(spark, writeFixture())
    val dir = Files.createTempDirectory("graft-spans-pq").toString
    fromJson.write.mode("overwrite").parquet(dir)
    val fromPq = SpanSources.fromParquet(spark, dir).collect().toSet
    assert(fromPq == fromJson.collect().toSet)
    assert(fromPq.size == 3)
  }

  test("malformed lines drop at the streaming boundary instead of " +
      "crash-looping the checkpoint-pinned query") {
    // span path: a garbage line PERMISSIVE-parses to an all-null row whose
    // null trace_id would NPE TraceMerge (or store a null-keyed trace)
    val spanDir = Files.createTempDirectory("graft-badspans")
    Files.writeString(spanDir.resolve("spans.json"),
      (fixtureLines :+ "%%% not json at all %%%").mkString("\n"))
    val sq = SpanSources.fromJsonFiles(spark, spanDir.toString)
      .writeStream.format("memory").queryName("bad_span_lines")
      .outputMode(OutputMode.Append).start()
    try {
      sq.processAllAvailable()
      assert(spark.table("bad_span_lines").count() == 3, "3 good spans, garbage dropped")
    } finally sq.stop()
    // link path: null counts would NPE LinkEvent's primitive Long fields
    val linkDir = Files.createTempDirectory("graft-badlinks")
    Files.writeString(linkDir.resolve("links.json"),
      Seq(
        """{"event_ts":"2024-01-05T10:00:00.000Z","parent":"a","child":"b","callCount":2,"errorCount":0}""",
        """truncated garbag""",
        """{"event_ts":"2024-01-05T10:00:01.000Z","parent":"b","child":"c","callCount":1}"""
      ).mkString("\n"))
    val lq = SpanSources.linksFromJsonFiles(spark, linkDir.toString)
      .writeStream.format("memory").queryName("bad_link_lines")
      .outputMode(OutputMode.Append).start()
    try {
      lq.processAllAvailable()
      // the garbage line AND the null-count line drop; the full row survives
      val rows = spark.table("bad_link_lines").collect()
      assert(rows.map(r => (r.getAs[String]("parent"), r.getAs[Long]("call_count"))).toSeq
        == Seq(("a", 2L)))
    } finally lq.stop()
  }

  test("file-based streaming ingest drives the session pipeline end-to-end") {
    val traces = StreamingPipeline.sessionTraces(
      SpanSources.fromJsonFiles(spark, writeFixture()), "1 minute")
    val q = traces.writeStream.format("memory").queryName("file_traces")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // spans at 61 s (traces a) and 121.5 s (trace c): watermark reaches
      // 121.5 s, closing trace a's session [61 s, 121 s)
      val emitted = spark.table("file_traces").collect()
      assert(emitted.map(_.getString(0)).toSeq == Seq("000000000000000a"))
    } finally q.stop()
  }
}
