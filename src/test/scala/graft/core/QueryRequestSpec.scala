package graft.core

import graft.model.{Annotation, Endpoint, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Truth table for the find-traces predicate (SURVEY §2.3 F1; reference
  * applies zipkin-core QueryRequest.test at KafkaStorageHttpService.java:228).
  */
class QueryRequestSpec extends AnyFunSuite {

  private val baseTs = 1_000_000_000_000L // µs
  private def ep(s: String) = Some(Endpoint(service_name = Some(s)))
  private val trace = Seq(
    Span(trace_id = "000000000000000a", id = "000000000000000a", name = Some("get"),
      kind = Some("SERVER"), timestamp = Some(baseTs), duration = Some(200L),
      local_endpoint = ep("front"), remote_endpoint = ep("edge"),
      tags = Map("http.method" -> "GET", "env" -> "prod"),
      annotations = Seq(Annotation(baseTs, "wr"))),
    Span(trace_id = "000000000000000a", id = "000000000000000b",
      parent_id = Some("000000000000000a"), name = Some("query"), kind = Some("CLIENT"),
      timestamp = Some(baseTs + 50), duration = Some(100L),
      local_endpoint = ep("front"), remote_endpoint = ep("db"),
      tags = Map("sql" -> "select")))

  private val endTsMs = baseTs / 1000 + 1000 // request window covers the trace
  private def req = QueryRequest(endTs = endTsMs, lookback = 100_000L)

  test("timestamp window: in-range passes, out-of-range fails") {
    assert(req.test(trace))
    assert(!req.copy(endTs = baseTs / 1000 - 10, lookback = 5).test(trace))
    assert(!req.copy(endTs = baseTs / 1000 + 200_000, lookback = 10).test(trace))
  }

  test("root-span timestamp drives the range check") {
    assert(req.traceTimestamp(trace) == baseTs) // span a has null parent_id
    val orphans = trace.map(_.copy(parent_id = Some("00000000000000ff")))
    assert(req.traceTimestamp(orphans) == baseTs) // falls back to min non-zero
  }

  test("serviceName must match some span's local service") {
    assert(req.copy(serviceName = Some("front")).test(trace))
    assert(!req.copy(serviceName = Some("nope")).test(trace))
  }

  test("remoteServiceName must match some span's remote service") {
    assert(req.copy(remoteServiceName = Some("db")).test(trace))
    assert(!req.copy(remoteServiceName = Some("cache")).test(trace))
  }

  test("spanName must match some span") {
    assert(req.copy(spanName = Some("query")).test(trace))
    assert(!req.copy(spanName = Some("missing")).test(trace))
  }

  test("annotationQuery: bare key hits tag keys and annotation values; k=v exact") {
    assert(req.copy(annotationQuery = Map("env" -> "")).test(trace))      // tag key
    assert(req.copy(annotationQuery = Map("wr" -> "")).test(trace))       // annotation value
    assert(req.copy(annotationQuery = Map("env" -> "prod")).test(trace))  // exact tag
    assert(!req.copy(annotationQuery = Map("env" -> "dev")).test(trace))
    assert(!req.copy(annotationQuery = Map("absent" -> "")).test(trace))
    // conjunction: all terms required
    assert(req.copy(annotationQuery = Map("env" -> "prod", "sql" -> "")).test(trace))
    assert(!req.copy(annotationQuery = Map("env" -> "prod", "absent" -> "")).test(trace))
  }

  test("annotationQuery restricted to the queried service's spans") {
    // tag "sql" lives on the front-service client span; query svc=front passes
    assert(req.copy(serviceName = Some("front"), annotationQuery = Map("sql" -> "")).test(trace))
    // but a trace whose only matching tag is on another service fails
    val other = trace.map(s =>
      if (s.tags.contains("sql")) s.copy(local_endpoint = ep("other")) else s)
    assert(!req.copy(serviceName = Some("front"), annotationQuery = Map("sql" -> "")).test(other))
  }

  test("duration bounds") {
    assert(req.copy(minDuration = Some(150L)).test(trace))            // span a: 200
    assert(!req.copy(minDuration = Some(500L)).test(trace))
    assert(req.copy(minDuration = Some(50L), maxDuration = Some(120L)).test(trace)) // span b: 100
    assert(!req.copy(minDuration = Some(150L), maxDuration = Some(180L)).test(trace))
  }

  test("parseAnnotationQuery") {
    assert(QueryRequest.parseAnnotationQuery(null) == Map.empty)
    assert(QueryRequest.parseAnnotationQuery("") == Map.empty)
    assert(QueryRequest.parseAnnotationQuery("k1") == Map("k1" -> ""))
    assert(QueryRequest.parseAnnotationQuery("k1 and k2=v2 and k3") ==
      Map("k1" -> "", "k2" -> "v2", "k3" -> ""))
  }

  test("empty trace never matches") {
    assert(!req.test(Nil))
  }
}
