package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.{Annotation, Endpoint, Span, Spans}

class ProtoSpansSpec extends SparkSpec {

  import spark.implicits._

  private val fixture = Seq(
    Span(
      trace_id = "000000000000004d00000000000001bc",
      parent_id = Some("00000000000001bc"),
      id = "00000000000001bd",
      kind = Some("SERVER"),
      name = Some("get /api"),
      timestamp = Some(1472470996199000L),
      duration = Some(207000L),
      local_endpoint = Some(Endpoint(Some("backend"), Some("192.168.99.101"), None, Some(9000))),
      remote_endpoint = Some(Endpoint(None, Some("172.19.0.2"), None, Some(58648))),
      annotations = Seq(Annotation(1472470996238000L, "foo"), Annotation(1472470996403000L, "bar")),
      tags = Map("http.path" -> "/api", "clnt/finagle.version" -> "6.45.0"),
      shared = Some(true)),
    Span(
      trace_id = "00000000000004d2",
      id = "00000000000004d3",
      kind = Some("CLIENT"),
      name = Some("query"),
      timestamp = Some(1472470996100000L),
      duration = Some(9000L),
      local_endpoint = Some(Endpoint(Some("frontend"), None, None, None)),
      debug = Some(true)),
    // minimal span: ids only
    Span(trace_id = "00000000000004d2", id = "00000000000004d4"))

  test("proto3 round-trip: encode → decode is the identity on canonical spans") {
    val bytes = ProtoSpans.encodeList(fixture)
    assert(ProtoSpans.decodeList(bytes) == fixture)
  }

  test("proto3 decode matches the JSON_V2 decode path on the same spans") {
    val json = Seq(
      """{"trace_id":"000000000000004d00000000000001bc","parent_id":"00000000000001bc","id":"00000000000001bd","kind":"SERVER","name":"get /api","timestamp":1472470996199000,"duration":207000,"local_endpoint":{"service_name":"backend","ipv4":"192.168.99.101","port":9000},"remote_endpoint":{"ipv4":"172.19.0.2","port":58648},"annotations":[{"timestamp":1472470996238000,"value":"foo"},{"timestamp":1472470996403000,"value":"bar"}],"tags":{"http.path":"/api","clnt/finagle.version":"6.45.0"},"shared":true}""",
      """{"trace_id":"00000000000004d2","id":"00000000000004d3","kind":"CLIENT","name":"query","timestamp":1472470996100000,"duration":9000,"local_endpoint":{"service_name":"frontend"},"debug":true}""",
      """{"trace_id":"00000000000004d2","id":"00000000000004d4"}""")
    val dir = Files.createTempDirectory("proto-json").toFile
    Files.write(new java.io.File(dir, "spans.json").toPath,
      json.mkString("\n").getBytes("UTF-8"))
    val viaJson = Spans.readJson(spark, dir.getAbsolutePath).collect().toSet
    val viaProto = ProtoSpans.decodeList(ProtoSpans.encodeList(fixture)).toSet
    assert(viaProto == viaJson)
  }

  test("unknown fields are skipped by wire type") {
    // span body: trace_id=0x01, then unknown fields a newer writer might add
    val span = Array[Byte](
      0x0a, 8, 0, 0, 0, 0, 0, 0, 0, 1,    // field 1, wire 2, len 8
      0x98.toByte, 0x06, 0x07,             // field 99, wire 0 (tag 792 = [0x98 0x06]), value 7
      0x72, 3, 'x', 'y', 'z',              // field 14, wire 2, len 3
      0x79, 1, 2, 3, 4, 5, 6, 7, 8)       // field 15, wire 1 (fixed64)
    val list = Array[Byte](0x0a, span.length.toByte) ++ span
    assert(ProtoSpans.decodeList(list) == Seq(Span(trace_id = "0000000000000001")))
  }

  test("property: encode → decode is the identity on generated canonical spans") {
    (1 to 300).foreach { seed =>
      val spans = graft.SpanGen.spanList(seed)
      val decoded = ProtoSpans.decodeList(ProtoSpans.encodeList(spans))
      assert(decoded == spans, s"round-trip mismatch for seed=$seed")
    }
  }

  test("truncated payloads are rejected, not zero-padded into fake spans") {
    val good = ProtoSpans.encodeList(fixture)
    for (cut <- Seq(good.length / 3, good.length / 2, good.length - 1)) {
      val truncated = java.util.Arrays.copyOf(good, cut)
      intercept[Exception](ProtoSpans.decodeList(truncated))
    }
  }

  test("malicious lengths and over-long varints are rejected, never looped on") {
    // negative length from varint 0xFFFFFFFA (.toInt == -6): would rewind
    // pos and loop forever fabricating empty spans
    val negativeLen = Array(0x0a, 0xfa, 0xff, 0xff, 0xff, 0x0f).map(_.toByte)
    intercept[IllegalArgumentException](ProtoSpans.decodeList(negativeLen))
    // varint longer than 10 bytes: must throw, not wrap shift mod 64
    val longVarint = Array(0x08) ++ Array.fill(11)(0x80) :+ 0x01
    intercept[IllegalArgumentException](ProtoSpans.decodeList(longVarint.map(_.toByte)))
  }

  test("streaming: proto envelopes drive the session pipeline end-to-end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Array[Byte])]
    val envelopes = ProtoSpans.envelopes(
      input.toDF().toDF("timestamp", "value"))
    val q = graft.streaming.StreamingPipeline.sessionTraces(envelopes, "1 minute")
      .writeStream.format("memory").queryName("proto_traces_out")
      .outputMode(OutputMode.Append).start()
    try {
      val two = fixture.filter(_.trace_id == "00000000000004d2")
      input.addData((new java.sql.Timestamp(1000L), ProtoSpans.encodeList(two)))
      // a later record on another trace closes the session
      input.addData((new java.sql.Timestamp(61001L),
        ProtoSpans.encodeList(Seq(Span(trace_id = "00000000000000ff", id = "ff")))))
      q.processAllAvailable()
      val got = spark.table("proto_traces_out")
        .as[graft.streaming.ClosedTrace].collect()
      assert(got.length == 1 && got.head.trace_id == "00000000000004d2")
      assert(got.head.spans.map(_.id).sorted ==
        Seq("00000000000004d3", "00000000000004d4"))
    } finally q.stop()
  }

  test("envelopes: (timestamp, value) rows decode to one envelope per span") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val df = Seq((ts, ProtoSpans.encodeList(fixture))).toDF("timestamp", "value")
    val got = ProtoSpans.envelopes(df).collect()
    assert(got.length == fixture.length)
    assert(got.map(_.span).toSet == fixture.toSet)
    assert(got.forall(_.ingest_ts == ts))
  }

  test("envelopes: a corrupt record is skipped, not a streaming poison pill") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val corrupt = Array[Byte](0x0a, 0x7f, 1, 2) // claims 127 bytes, has 2
    val df = Seq((ts, corrupt), (ts, ProtoSpans.encodeList(fixture)))
      .toDF("timestamp", "value")
    val got = ProtoSpans.envelopes(df).collect()
    assert(got.length == fixture.length, "good record decoded, corrupt one dropped")
    // the strict batch contract still rejects the same bytes
    intercept[IllegalArgumentException](ProtoSpans.decodeList(corrupt))
  }

  test("64-bit varint lengths and field numbers are rejected, not truncated to Int") {
    // length 0x1_0000_0005 truncates to 5 via .toInt — a decoder doing that
    // would silently parse a sibling field's bytes as this field's value
    val hugeLen = Array(0x0a, 0x85, 0x80, 0x80, 0x80, 0x10, 1, 2, 3, 4, 5).map(_.toByte)
    intercept[IllegalArgumentException](ProtoSpans.decodeList(hugeLen))
    // field number 2^29+1 encodes in >32 bits of tag varint
    val hugeField = Array(0x88, 0x80, 0x80, 0x80, 0x10, 0x01).map(_.toByte)
    intercept[IllegalArgumentException](ProtoSpans.decodeList(hugeField))
  }

  test("envelopes boundary: tombstones skip, bad ip lengths skip, missing " +
      "trace ids drop, short ids normalize — none of them wedge the stream") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    def list(spanBody: Array[Byte]): Array[Byte] =
      Array(0x0a.toByte, spanBody.length.toByte) ++ spanBody
    // span with a 3-byte ipv4 inside local_endpoint (field 8):
    // trace_id=0x01, endpoint body = ipv4 field 2 len 3
    val badIpEndpoint = Array(0x12, 0x03, 10, 0, 1).map(_.toByte)
    val badIpSpan = Array[Byte](0x0a, 0x01, 0x01,
      0x42.toByte, badIpEndpoint.length.toByte) ++ badIpEndpoint
    // span missing required field 1 (trace_id): only id (field 3)
    val noTraceId = Array(0x1a, 0x01, 0x05).map(_.toByte)
    // 7-byte trace id — a nonconforming writer stripped a leading zero byte
    val shortId = Array[Byte](0x0a, 0x07, 1, 2, 3, 4, 5, 6, 7)
    val df = Seq(
      (ts, null.asInstanceOf[Array[Byte]]), // compacted-topic tombstone
      (ts, list(badIpSpan)),
      (ts, list(noTraceId)),
      (ts, list(shortId))).toDF("timestamp", "value")
    val got = ProtoSpans.envelopes(df).collect()
    // only the short-id span survives, NORMALIZED to the lpad-16 canonical
    // form the JSON path produces — one trace, one session key across codecs
    assert(got.map(_.span.trace_id).toSeq == Seq("0001020304050607"))
    // strict batch contract: the bad ip rejects as IAE (not an escaping
    // UnknownHostException), the trace-id-less span decodes leniently
    intercept[IllegalArgumentException](ProtoSpans.decodeList(list(badIpSpan)))
    assert(ProtoSpans.decodeList(list(noTraceId)).head.trace_id == "")
  }

  test("encode boundary: non-hex ids fail with the value named; hostname " +
      "'ips' are omitted like zipkin's parseIp, never DNS-resolved") {
    val e = intercept[IllegalArgumentException](
      ProtoSpans.encodeList(Seq(Span(trace_id = "42:1", id = "01"))))
    assert(e.getMessage.contains("42:1"))
    // a hostname in the ipv4 field: the encoder must not block on DNS or
    // write resolver-dependent bytes — the field is simply left unset
    val span = Span(trace_id = "00000000000000aa", id = "01",
      local_endpoint = Some(Endpoint(service_name = Some("svc"),
        ipv4 = Some("gateway.internal"), ipv6 = Some("not-an-ip"))))
    val decoded = ProtoSpans.decodeList(ProtoSpans.encodeList(Seq(span))).head
    assert(decoded.local_endpoint.exists(ep =>
      ep.service_name.contains("svc") && ep.ipv4.isEmpty && ep.ipv6.isEmpty))
    // real literals still round-trip (the fixture also covers this)
    val lit = Span(trace_id = "00000000000000ab", id = "02",
      local_endpoint = Some(Endpoint(ipv4 = Some("192.168.99.101"),
        ipv6 = Some("2001:db8::1"))))
    val back = ProtoSpans.decodeList(ProtoSpans.encodeList(Seq(lit))).head
    assert(back.local_endpoint.exists(ep =>
      ep.ipv4.contains("192.168.99.101") && ep.ipv6.contains("2001:db8:0:0:0:0:0:1")))
  }
}
