package graft.core

import graft.model.{Annotation, Span}

/** Re-implementation (from published behavior, not code) of the trace
  * canonicalization the reference delegates to zipkin-core
  * `zipkin2.internal.Trace.merge`, invoked at
  * /root/reference storage/.../streams/SpanAggregationTopology.java:104,111.
  *
  * Semantics (SURVEY.md §1.4):
  *  - normalize mixed 64/128-bit trace IDs to the longest seen;
  *  - order spans by (id, shared, timestamp-presence);
  *  - collapse duplicates (same id + same shared flag — Kafka redelivery or
  *    reporter retry) by field-wise union: first non-null wins, annotations
  *    and tags unioned.
  *
  * The function is idempotent, associative and order-insensitive (property
  * tested), so applying it once after a full `collect_list` equals the
  * reference's incremental aggregator+session-merger application.
  */
object TraceMerge {

  def merge(spans: Seq[Span]): Seq[Span] = {
    if (spans.sizeIs <= 1) return spans
    // 1. trace-ID normalization: longest (128-bit) id wins for the whole trace.
    val traceId = spans.map(_.trace_id).maxBy(_.length)
    val renamed = spans.map(s => if (s.trace_id == traceId) s else s.copy(trace_id = traceId))
    // 2. canonical order: id, then non-shared before shared (client side of an
    //    RPC precedes its shared server twin), then local service (stabilizes
    //    the collapse when same-id reports disagree), then timestamp-bearing.
    val sorted = renamed.sortBy(s =>
      (s.id, s.isShared, s.localServiceName.getOrElse(""), s.timestamp.isEmpty,
        s.timestamp.getOrElse(Long.MaxValue), s.kind.getOrElse(""), s.name.getOrElse("")))
    // 3. collapse adjacent duplicates (same id + shared flag) — but only when
    //    their endpoints are compatible: zipkin's Trace.merge keeps same-id
    //    spans from DIFFERENT services apart (single-host instrumentation
    //    that reuses the span id without setting shared).
    val out = scala.collection.mutable.ArrayBuffer.empty[Span]
    for (s <- sorted) {
      if (out.nonEmpty && out.last.id == s.id && out.last.isShared == s.isShared &&
          compatibleEndpoints(out.last, s))
        out(out.length - 1) = union(out.last, s)
      else out += s
    }
    out.toSeq
  }

  /** Two reports describe the same span only if neither names a different
    * local service (null is compatible with anything).
    */
  private def compatibleEndpoints(a: Span, b: Span): Boolean =
    (a.localServiceName, b.localServiceName) match {
      case (Some(x), Some(y)) => x == y
      case _ => true
    }

  /** Field-wise union of two duplicate reports of the same span. */
  private def union(a: Span, b: Span): Span = Span(
    trace_id = a.trace_id,
    parent_id = a.parent_id.orElse(b.parent_id),
    id = a.id,
    kind = a.kind.orElse(b.kind),
    name = a.name.orElse(b.name),
    timestamp = a.timestamp.orElse(b.timestamp),
    duration = a.duration.orElse(b.duration),
    local_endpoint = mergeEndpoint(a.local_endpoint, b.local_endpoint),
    remote_endpoint = mergeEndpoint(a.remote_endpoint, b.remote_endpoint),
    annotations = distinctAnnotations(a.annotations ++ b.annotations),
    tags = b.tags ++ a.tags, // first report wins on key conflict
    shared = a.shared.orElse(b.shared),
    debug = a.debug.orElse(b.debug))

  private def mergeEndpoint(a: Option[graft.model.Endpoint], b: Option[graft.model.Endpoint]) =
    (a, b) match {
      case (Some(x), Some(y)) => Some(graft.model.Endpoint(
        x.service_name.orElse(y.service_name), x.ipv4.orElse(y.ipv4),
        x.ipv6.orElse(y.ipv6), x.port.orElse(y.port)))
      case _ => a.orElse(b)
    }

  private def distinctAnnotations(as: Seq[Annotation]): Seq[Annotation] =
    as.distinct.sortBy(a => (a.timestamp, a.value))
}
