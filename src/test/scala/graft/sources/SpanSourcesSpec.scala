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
