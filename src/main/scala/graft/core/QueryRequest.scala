package graft.core

import graft.model.Span

/** The find-traces request + predicate, re-expressing zipkin-core
  * `zipkin2.storage.QueryRequest` as built by the reference at
  * /root/reference storage/.../KafkaStorageHttpService.java:203-214 and
  * applied per candidate trace at :228.
  *
  * Truth table (SURVEY.md §2.3 F1): a trace matches iff ALL of
  *  1. root-span timestamp ∈ [(endTs−lookback)·1000, endTs·1000] µs;
  *  2. some span has local service == serviceName (when set);
  *  3. some span has remote service == remoteServiceName (when set);
  *  4. some span has name == spanName (when set);
  *  5. every annotationQuery term is satisfied by a span of the queried
  *     service (any span when serviceName unset): bare key k ⇒ an annotation
  *     value == k or a tag key k exists; k=v ⇒ tags(k) == v;
  *  6. some span has duration ≥ minDuration (and ≤ maxDuration when set).
  */
final case class QueryRequest(
    serviceName: Option[String] = None,
    remoteServiceName: Option[String] = None,
    spanName: Option[String] = None,
    annotationQuery: Map[String, String] = Map.empty,
    minDuration: Option[Long] = None,
    maxDuration: Option[Long] = None,
    endTs: Long,
    lookback: Long = 86400000L, // default 1 d (KafkaStorageHttpService.java:198)
    limit: Int = 10) {          // default 10  (KafkaStorageHttpService.java:199)

  /** Timestamp the trace is indexed/ordered by: the root span's (null
    * parent), else the minimum non-zero timestamp (SURVEY §2.3 F1.1).
    */
  def traceTimestamp(spans: Seq[Span]): Long = Traces.rootTimestamp(spans)

  def test(spans: Seq[Span]): Boolean =
    testWithTimestamp(traceTimestamp(spans), spans)

  /** Full predicate with the range check against an externally-indexed trace
    * timestamp (the store's root_ts — which may carry a session-close
    * fallback for timestamp-less traces, keeping them findable).
    */
  def testWithTimestamp(traceTs: Long, spans: Seq[Span]): Boolean = {
    if (spans.isEmpty) return false
    val startTsMicros = (endTs - lookback) * 1000
    val endTsMicros = endTs * 1000
    if (traceTs < startTsMicros || traceTs > endTsMicros) return false

    if (serviceName.exists(sn => !spans.exists(_.localServiceName.contains(sn)))) return false
    if (remoteServiceName.exists(rn => !spans.exists(_.remoteServiceName.contains(rn)))) return false
    if (spanName.exists(n => !spans.exists(_.name.contains(n)))) return false

    if (annotationQuery.nonEmpty) {
      val candidates = serviceName match {
        case Some(sn) => spans.filter(_.localServiceName.contains(sn))
        case None => spans
      }
      val allTermsMatch = annotationQuery.forall { case (k, v) =>
        if (v.isEmpty)
          candidates.exists(s => s.annotations.exists(_.value == k) || s.tags.contains(k))
        else candidates.exists(_.tags.get(k).contains(v))
      }
      if (!allTermsMatch) return false
    }

    minDuration match {
      case Some(min) =>
        val maxOk: Span => Boolean = s => maxDuration.forall(max => s.duration.exists(_ <= max))
        spans.exists(s => s.duration.exists(_ >= min) && maxOk(s))
      case None => true
    }
  }
}

object QueryRequest {

  /** Parse the `annotationQuery` URL parameter: a conjunction
    * `k1 and k2=v2 and ...` (reference: zipkin-core `parseAnnotationQuery`,
    * invoked at KafkaStorageHttpService.java:208; SURVEY §2.8 SC7).
    */
  def parseAnnotationQuery(q: String): Map[String, String] =
    if (q == null || q.trim.isEmpty) Map.empty
    else q.split("\\s+and\\s+").iterator.filter(_.nonEmpty).map { term =>
      term.split("=", 2) match {
        case Array(k) => k.trim -> ""
        case Array(k, v) => k.trim -> v.trim
      }
    }.toMap

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Relational twin of [[QueryRequest.testWithTimestamp]]: the same truth
    * table as a Column predicate over the store's (root_ts, spans) columns.
    * Evaluates on the serialized span structs directly — no per-row Trace
    * deserialization like a typed `filter`, so the scan stays columnar and
    * the time-range conjunct can push into partition pruning. Spec-pinned
    * equivalent to the typed predicate.
    */
  def toPredicate(request: QueryRequest, rootTs: Column, spans: Column): Column = {
    val startUs = (request.endTs - request.lookback) * 1000
    val endUs = request.endTs * 1000
    def localSvc(s: Column) = s.getField("local_endpoint").getField("service_name")

    val conjuncts = Seq(
      Some(size(spans) > 0 && rootTs.between(startUs, endUs)),
      request.serviceName.map(sn => exists(spans, s => localSvc(s) === sn)),
      request.remoteServiceName.map(rn => exists(spans,
        s => s.getField("remote_endpoint").getField("service_name") === rn)),
      request.spanName.map(n => exists(spans, s => s.getField("name") === n))) ++
      request.annotationQuery.map { case (k, v) =>
        val candidates = request.serviceName match {
          case Some(sn) => filter(spans, s => localSvc(s) === sn)
          case None => spans
        }
        Some(
          if (v.isEmpty)
            exists(candidates, s =>
              exists(s.getField("annotations"), a => a.getField("value") === k) ||
                map_contains_key(s.getField("tags"), k))
          else exists(candidates, s => element_at(s.getField("tags"), k) === v))
      } ++ Seq(
      request.minDuration.map { min =>
        exists(spans, s => {
          val d = s.getField("duration")
          request.maxDuration.foldLeft(d >= min)((acc, max) => acc && d <= max)
        })
      })

    conjuncts.flatten.reduce(_ && _)
  }
}
