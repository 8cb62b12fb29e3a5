package graft.core

import graft.SparkSpec
import graft.model.{Annotation, Endpoint, Span, Trace}
import org.apache.spark.sql.functions.col

/** The relational find-traces predicate must agree with the typed truth
  * table on every clause — [[QueryRequest.toPredicate]] is what getTraces
  * executes, [[QueryRequest.testWithTimestamp]] is the spec.
  */
class QueryPredicateSpec extends SparkSpec {

  import spark.implicits._

  private val baseTs = 1_000_000_000_000L // µs
  private def ep(s: String) = Some(Endpoint(service_name = Some(s)))

  private def trace(id: String, spans: Seq[Span]) =
    Trace(id, spans, Traces.rootTimestamp(spans))

  private lazy val traces = Seq(
    trace("t1", Seq(
      Span(trace_id = "t1", id = "a", name = Some("get"), kind = Some("SERVER"),
        timestamp = Some(baseTs), duration = Some(200L),
        local_endpoint = ep("front"), remote_endpoint = ep("edge"),
        tags = Map("http.method" -> "GET", "env" -> "prod"),
        annotations = Seq(Annotation(baseTs, "wr"))),
      Span(trace_id = "t1", id = "b", parent_id = Some("a"), name = Some("query"),
        kind = Some("CLIENT"), timestamp = Some(baseTs + 50), duration = Some(100L),
        local_endpoint = ep("front"), remote_endpoint = ep("db"),
        tags = Map("sql" -> "select")))),
    trace("t2", Seq( // different service, no tags/annotations/durations/endpoints
      Span(trace_id = "t2", id = "c", name = Some("get"), timestamp = Some(baseTs + 100)))),
    trace("t3", Seq( // out of the request window
      Span(trace_id = "t3", id = "d", name = Some("get"), timestamp = Some(baseTs * 2),
        duration = Some(500L), local_endpoint = ep("front")))),
    trace("t4", Seq( // matching tag on a non-queried service
      Span(trace_id = "t4", id = "e", name = Some("query"), timestamp = Some(baseTs + 10),
        duration = Some(150L), local_endpoint = ep("other"),
        tags = Map("sql" -> "select")))))

  private val endTsMs = baseTs / 1000 + 1000
  private def req = QueryRequest(endTs = endTsMs, lookback = 100_000L, limit = 100)

  private val requests: Seq[QueryRequest] = Seq(
    req,
    req.copy(endTs = baseTs / 1000 - 10, lookback = 5),
    req.copy(serviceName = Some("front")),
    req.copy(serviceName = Some("nope")),
    req.copy(remoteServiceName = Some("db")),
    req.copy(remoteServiceName = Some("cache")),
    req.copy(spanName = Some("query")),
    req.copy(spanName = Some("missing")),
    req.copy(annotationQuery = Map("env" -> "")),
    req.copy(annotationQuery = Map("wr" -> "")),
    req.copy(annotationQuery = Map("env" -> "prod", "sql" -> "")),
    req.copy(annotationQuery = Map("env" -> "prod", "absent" -> "")),
    req.copy(serviceName = Some("front"), annotationQuery = Map("sql" -> "")),
    req.copy(serviceName = Some("other"), annotationQuery = Map("sql" -> "")),
    req.copy(minDuration = Some(150L)),
    req.copy(minDuration = Some(500L)),
    req.copy(minDuration = Some(50L), maxDuration = Some(120L)),
    req.copy(minDuration = Some(150L), maxDuration = Some(180L)))

  test("toPredicate ≡ testWithTimestamp over every clause") {
    val ds = spark.createDataset(traces)
    for (r <- requests) {
      val typed = traces.filter(t => r.testWithTimestamp(t.root_ts, t.spans))
        .map(_.trace_id).toSet
      val relational = ds.where(QueryRequest.toPredicate(r, col("root_ts"), col("spans")))
        .collect().map(_.trace_id).toSet
      assert(relational == typed, s"mismatch for $r")
    }
  }

  test("property: toPredicate ≡ testWithTimestamp on generated traces × requests") {
    import org.scalacheck.Gen
    val genSvc = Gen.option(Gen.oneOf("front", "back", "edge"))
    val genSpanG = for {
      svc <- genSvc
      remote <- genSvc
      name <- Gen.option(Gen.oneOf("get", "put", "query"))
      ts <- Gen.option(Gen.choose(baseTs - 50, baseTs + 50))
      dur <- Gen.option(Gen.choose(0L, 300L))
      tags <- Gen.mapOfN(2, Gen.zip(Gen.oneOf("env", "sql", "k"), Gen.oneOf("", "prod", "x")))
      ann <- Gen.option(Gen.oneOf("wr", "ws"))
    } yield Span(trace_id = "g", id = "s", name = name, timestamp = ts, duration = dur,
      local_endpoint = svc.map(s => Endpoint(service_name = Some(s))),
      remote_endpoint = remote.map(s => Endpoint(service_name = Some(s))),
      tags = tags, annotations = ann.map(Annotation(baseTs, _)).toSeq)
    val genTrace = for {
      n <- Gen.choose(1, 3)
      spans <- Gen.listOfN(n, genSpanG)
      i <- Gen.choose(0, 1 << 20)
    } yield trace(s"t$i", spans.zipWithIndex.map { case (s, j) =>
      s.copy(trace_id = s"t$i", id = s"s$j")
    })
    val genReq = for {
      svc <- genSvc
      remote <- genSvc
      name <- Gen.option(Gen.oneOf("get", "missing"))
      aq <- Gen.mapOfN(2, Gen.zip(Gen.oneOf("env", "sql", "wr", "absent"),
        Gen.oneOf("", "prod")))
      minD <- Gen.option(Gen.choose(0L, 250L))
      maxD <- Gen.option(Gen.choose(100L, 400L))
    } yield req.copy(serviceName = svc, remoteServiceName = remote, spanName = name,
      annotationQuery = aq, minDuration = minD,
      maxDuration = if (minD.isDefined) maxD else None)
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
    val genTraces = (1 to 60).map(i => sample(genTrace, i.toLong))
      .groupBy(_.trace_id).values.map(_.head).toSeq // unique ids
    val ds = spark.createDataset(genTraces).cache()
    for (seed <- 1 to 40) {
      val r = sample(genReq, 1000L + seed)
      val typed = genTraces.filter(t => r.testWithTimestamp(t.root_ts, t.spans))
        .map(_.trace_id).toSet
      val relational = ds.where(QueryRequest.toPredicate(r, col("root_ts"), col("spans")))
        .collect().map(_.trace_id).toSet
      assert(relational == typed, s"mismatch for seed=$seed request=$r")
    }
  }

  test("getTraces returns the same traces through the relational path") {
    val ds = spark.createDataset(traces)
    val got = graft.operators.TraceQueries.getTraces(ds, req.copy(serviceName = Some("front")))
      .collect().map(_.trace_id).toSeq
    assert(got == Seq("t1"))
  }
}
