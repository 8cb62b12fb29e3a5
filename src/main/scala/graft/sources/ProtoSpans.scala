package graft.sources

import java.io.ByteArrayOutputStream

import graft.model.{Annotation, Endpoint, Span}
import graft.streaming.SpanEnvelope
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Zipkin proto3 wire codec for span lists — the reference's actual Kafka
  * value format (storage/.../streams/serdes/SpansSerde.java:28-35 decodes
  * `SpanBytesDecoder.PROTO3`). Field numbers and types follow the PUBLIC
  * zipkin-api schema (zipkin.proto3: `ListOfSpans { repeated Span spans=1 }`;
  * `Span { trace_id=1 parent_id=2 id=3 kind=4 name=5 timestamp=6(fixed64)
  * duration=7 local_endpoint=8 remote_endpoint=9 annotations=10 tags=11(map)
  * debug=12 shared=13 }`; `Endpoint { service_name=1 ipv4=2 ipv6=3 port=4 }`;
  * `Annotation { timestamp=1(fixed64) value=2 }`).
  *
  * Hand-rolled varint/fixed64/len-delimited framing — no protobuf runtime
  * dependency. Unknown fields are skipped by wire type, so spans produced by
  * newer writers still decode. proto3 cannot represent an explicit `false`
  * (absent == default), so `Some(false)` flags round-trip to `None` — the
  * same collapse every proto3 zipkin consumer applies.
  */
object ProtoSpans {

  // ——— decoding ———

  /** Decode a `ListOfSpans` payload (one Kafka record value). Ids arrive as
    * big-endian bytes and surface as canonical lowercase hex — already in
    * [[graft.model.Spans.normalizeTraceId]] form for 8/16-byte ids.
    */
  def decodeList(bytes: Array[Byte]): Seq[Span] = {
    val in = new Reader(bytes, 0, bytes.length)
    val spans = Seq.newBuilder[Span]
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      if (field == 1 && wire == 2) spans += decodeSpan(in.readSlice())
      else in.skip(wire)
    }
    spans.result()
  }

  private def decodeSpan(in: Reader): Span = {
    var span = Span(trace_id = "")
    val anns = Seq.newBuilder[Annotation]
    val tags = Map.newBuilder[String, String]
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      (field, wire) match {
        case (1, 2) => span = span.copy(trace_id = hex(in.readBytes()))
        case (2, 2) => span = span.copy(parent_id = Some(hex(in.readBytes())))
        case (3, 2) => span = span.copy(id = hex(in.readBytes()))
        case (4, 0) => span = span.copy(kind = kindName(in.readVarint()))
        case (5, 2) => span = span.copy(name = Some(in.readString()))
        case (6, 1) => span = span.copy(timestamp = Some(in.readFixed64()))
        case (7, 0) => span = span.copy(duration = Some(in.readVarint()))
        case (8, 2) => span = span.copy(local_endpoint = Some(decodeEndpoint(in.readSlice())))
        case (9, 2) => span = span.copy(remote_endpoint = Some(decodeEndpoint(in.readSlice())))
        case (10, 2) => anns += decodeAnnotation(in.readSlice())
        case (11, 2) => tags += decodeMapEntry(in.readSlice())
        case (12, 0) => span = span.copy(debug = boolOpt(in.readVarint()))
        case (13, 0) => span = span.copy(shared = boolOpt(in.readVarint()))
        case (_, w) => in.skip(w)
      }
    }
    span.copy(annotations = anns.result(), tags = tags.result())
  }

  private def decodeEndpoint(in: Reader): Endpoint = {
    var ep = Endpoint()
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      (field, wire) match {
        case (1, 2) => ep = ep.copy(service_name = Some(in.readString()))
        case (2, 2) => ep = ep.copy(ipv4 = Some(ipString(in.readBytes())))
        case (3, 2) => ep = ep.copy(ipv6 = Some(ipString(in.readBytes())))
        case (4, 0) => ep = ep.copy(port = Some(in.readVarint().toInt))
        case (_, w) => in.skip(w)
      }
    }
    ep
  }

  private def decodeAnnotation(in: Reader): Annotation = {
    var (ts, value) = (0L, "")
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      (field, wire) match {
        case (1, 1) => ts = in.readFixed64()
        case (2, 2) => value = in.readString()
        case (_, w) => in.skip(w)
      }
    }
    Annotation(ts, value)
  }

  private def decodeMapEntry(in: Reader): (String, String) = {
    var (k, v) = ("", "")
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      (field, wire) match {
        case (1, 2) => k = in.readString()
        case (2, 2) => v = in.readString()
        case (_, w) => in.skip(w)
      }
    }
    k -> v
  }

  private def kindName(v: Long): Option[String] = v match {
    case 1 => Some("CLIENT")
    case 2 => Some("SERVER")
    case 3 => Some("PRODUCER")
    case 4 => Some("CONSUMER")
    case _ => None // 0 = SPAN_KIND_UNSPECIFIED; forward-compat for unknowns
  }

  private def boolOpt(v: Long): Option[Boolean] = if (v != 0) Some(true) else None

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): String = {
    // nibble table, not per-byte String.format: hex() runs 2-3× per decoded
    // span (trace_id, id, parent_id) on the ingest hot path, and the
    // f-interpolator costs a full Formatter pass per byte
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private def ipString(b: Array[Byte]): String = {
    // length-check FIRST: getByAddress throws UnknownHostException (an
    // IOException) on a 3-byte "ipv4", which would escape the streaming
    // boundary's malformed-record handling as a non-IAE — the proto field
    // is malformed, so reject it in the same class the Reader hardening
    // uses
    require(b.length == 4 || b.length == 16,
      s"ip field must be 4 or 16 bytes, got ${b.length}")
    java.net.InetAddress.getByAddress(b).getHostAddress
  }

  /** Cursor over one (possibly nested) message. Every read is bounded by
    * `end` — a truncated or corrupt payload throws instead of zero-padding
    * or reading into sibling fields' bytes, so malformed records are
    * rejected, never ingested as fabricated span data.
    */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    // n < 0 guards a negative length from a malicious varint (rewinding pos
    // loops the decoder forever); `end - pos` comparison can't overflow int
    private def need(n: Int): Unit =
      if (n < 0 || n > end - pos) throw new IllegalArgumentException(
        s"malformed protobuf: need $n bytes at $pos, message ends at $end")
    // field numbers are bounded (proto3: 1..2^29−1) and lengths must fit a
    // non-negative Int BEFORE .toInt — a 64-bit varint that truncates to a
    // small value would otherwise pass need() and decode a sibling field's
    // bytes as fabricated data instead of rejecting the payload
    def readTag(): (Int, Int) = {
      val t = readVarint()
      val field = t >>> 3
      if (field == 0 || field > 536870911L) throw new IllegalArgumentException(
        s"malformed protobuf: field number $field out of range at $pos")
      (field.toInt, (t & 7).toInt)
    }
    private def readLen(): Int = {
      val v = readVarint()
      if (v < 0 || v > Int.MaxValue) throw new IllegalArgumentException(
        s"malformed protobuf: length $v out of range at $pos")
      v.toInt
    }
    def readVarint(): Long = {
      var (shift, v) = (0, 0L)
      var b = 0
      do {
        if (shift >= 64) throw new IllegalArgumentException(
          s"malformed protobuf: varint longer than 10 bytes at $pos")
        need(1)
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def readFixed64(): Long = {
      need(8)
      var v = 0L
      for (i <- 0 until 8) v |= (buf(pos + i) & 0xffL) << (8 * i)
      pos += 8
      v
    }
    def readBytes(): Array[Byte] = {
      val len = readLen()
      need(len)
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    def readSlice(): Reader = {
      val len = readLen()
      need(len)
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => need(8); pos += 8
      case 2 => val len = readLen(); need(len); pos += len
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ——— encoding (fixtures, sinks, round-trip tests) ———

  def encodeList(spans: Seq[Span]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    for (s <- spans) writeLenDelimited(out, 1, encodeSpan(s))
    out.toByteArray
  }

  private def encodeSpan(s: Span): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLenDelimited(out, 1, hexBytes(s.trace_id))
    s.parent_id.foreach(p => writeLenDelimited(out, 2, hexBytes(p)))
    if (s.id.nonEmpty) writeLenDelimited(out, 3, hexBytes(s.id))
    s.kind.flatMap(kindNum).foreach(k => writeVarintField(out, 4, k))
    s.name.foreach(n => writeLenDelimited(out, 5, n.getBytes("UTF-8")))
    s.timestamp.foreach(t => writeFixed64Field(out, 6, t))
    s.duration.foreach(d => writeVarintField(out, 7, d))
    s.local_endpoint.foreach(e => writeLenDelimited(out, 8, encodeEndpoint(e)))
    s.remote_endpoint.foreach(e => writeLenDelimited(out, 9, encodeEndpoint(e)))
    for (a <- s.annotations) {
      val ab = new ByteArrayOutputStream()
      writeFixed64Field(ab, 1, a.timestamp)
      writeLenDelimited(ab, 2, a.value.getBytes("UTF-8"))
      writeLenDelimited(out, 10, ab.toByteArray)
    }
    for ((k, v) <- s.tags) {
      val kb = new ByteArrayOutputStream()
      writeLenDelimited(kb, 1, k.getBytes("UTF-8"))
      writeLenDelimited(kb, 2, v.getBytes("UTF-8"))
      writeLenDelimited(out, 11, kb.toByteArray)
    }
    if (s.debug.contains(true)) writeVarintField(out, 12, 1L)
    if (s.isShared) writeVarintField(out, 13, 1L)
    out.toByteArray
  }

  private def encodeEndpoint(e: Endpoint): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    e.service_name.foreach(n => writeLenDelimited(out, 1, n.getBytes("UTF-8")))
    e.ipv4.flatMap(ipBytes).foreach(writeLenDelimited(out, 2, _))
    e.ipv6.flatMap(ipBytes).foreach(writeLenDelimited(out, 3, _))
    e.port.foreach(p => writeVarintField(out, 4, p.toLong))
    out.toByteArray
  }

  private def kindNum(k: String): Option[Long] = k match {
    case "CLIENT" => Some(1L)
    case "SERVER" => Some(2L)
    case "PRODUCER" => Some(3L)
    case "CONSUMER" => Some(4L)
    case _ => None
  }

  private def hexBytes(hex: String): Array[Byte] = {
    // validated up front so a non-hex id (e.g. an EventSpans "<user>:<sess>"
    // synthetic key) fails with the offending VALUE named, not a bare
    // NumberFormatException from deep inside the encoder
    require(hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F')),
      s"not a hex id, cannot proto-encode: '$hex'")
    val padded = if (hex.length % 2 == 0) hex else "0" + hex
    val out = new Array[Byte](padded.length / 2)
    for (i <- out.indices)
      out(i) = Integer.parseInt(padded.substring(2 * i, 2 * i + 2), 16).toByte
    out
  }

  private val Ipv4Literal = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}""".r

  /** Address-LITERAL bytes only, None otherwise — zipkin's own
    * `Endpoint.Builder.parseIp` behavior (non-literal input leaves the
    * field unset). A bare `getByName` on a hostname does a BLOCKING DNS
    * lookup per span inside the encode task: seconds of stall per record
    * and nondeterministic bytes from whatever the resolver answers. A
    * hostname cannot contain ':' and an IPv6 literal always does, so the
    * gate never resolves.
    */
  private def ipBytes(ip: String): Option[Array[Byte]] =
    if (Ipv4Literal.matches(ip) || ip.contains(':'))
      try Some(java.net.InetAddress.getByName(ip).getAddress)
      catch { case _: java.net.UnknownHostException => None } // e.g. "999.0.0.1"
    else None

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field.toLong << 3) | 0)
    writeVarint(out, v)
  }

  private def writeFixed64Field(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field.toLong << 3) | 1)
    for (i <- 0 until 8) out.write(((v >>> (8 * i)) & 0xff).toInt)
  }

  private def writeLenDelimited(out: ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    writeVarint(out, (field.toLong << 3) | 2)
    writeVarint(out, body.length.toLong)
    out.write(body)
  }

  // ——— Spark plumbing ———

  /** (timestamp, value BINARY) rows → span envelopes, works on any batch or
    * streaming DataFrame with those columns (Kafka's exact shape). The
    * row-at-a-time flatMap is fine here: decode is the ingest boundary and
    * the payload is opaque bytes — there is no columnar shortcut to skip.
    *
    * Malformed records are LOGGED AND SKIPPED, not thrown: in a streaming
    * query the checkpoint pins the offset, so a single corrupt record that
    * threw would crash-loop the whole topic forever (the JSON path drops
    * malformed values the same way). The catch is NonFatal, not
    * IAE-only — the contract is "the topic never wedges on one record", and
    * an unforeseen throw class (an early revision let a 3-byte ip's
    * UnknownHostException through) must not void it. Null values
    * (compacted-topic tombstones — routine, not corrupt) skip without the
    * warn. [[decodeList]] itself still throws — batch callers validating a
    * payload keep the strict contract.
    *
    * Streaming-surface canonicalization, mirroring the JSON path's
    * `Spans.normalize`: trace ids take the lpad-16/32 form (a nonconforming
    * writer stripping a leading zero byte must not split a trace across two
    * session keys), and a span MISSING its required trace id (proto field 1
    * absent — decodeList's forward-compat keeps it as "") is dropped here
    * rather than letting every such span across the topic merge into one
    * fabricated ""-keyed trace.
    */
  def envelopes(df: DataFrame): Dataset[SpanEnvelope] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("timestamp"), col("value"))
      .as[(java.sql.Timestamp, Array[Byte])]
      .flatMap { case (ts, bytes) =>
        if (bytes == null) Nil
        else try decodeList(bytes).collect {
          case s if s.trace_id.nonEmpty =>
            SpanEnvelope(ts, s.copy(
              trace_id = graft.model.Spans.normalizeTraceId(s.trace_id)))
        }
        catch { case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(ProtoSpans.getClass)
            .warn(s"skipping undecodable proto record (${bytes.length} bytes): " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          Nil
        }
      }
  }

  /** S2 variant: Kafka spans topic carrying proto3 `ListOfSpans` values —
    * the reference's native wire format (SpansSerde.java:28-35).
    */
  def fromKafkaProto(spark: SparkSession, bootstrapServers: String,
      topic: String = "zipkin-spans"): Dataset[SpanEnvelope] =
    envelopes(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load())
}
