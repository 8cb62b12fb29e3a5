package graft.core

import graft.model.{Annotation, Endpoint, Span}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class TraceMergeSpec extends AnyFunSuite {

  /** Hand-rolled property loop (scalatest-plus bridge not in the offline cache). */
  private def forAllSamples[A](gen: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (1 to n).foreach(i => gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong))
      .foreach(check))

  private def span(id: String, kind: String = null, svc: String = null,
      ts: Option[Long] = None, shared: Option[Boolean] = None,
      tags: Map[String, String] = Map.empty): Span =
    Span(trace_id = "000000000000000a", id = id, kind = Option(kind),
      timestamp = ts, shared = shared,
      local_endpoint = Option(svc).map(s => Endpoint(service_name = Some(s))),
      tags = tags)

  test("duplicate reports of one span collapse field-wise (redelivery dedup)") {
    val first = span("000000000000000b", kind = "CLIENT", ts = Some(10L))
    val retry = span("000000000000000b", svc = "svc_a", tags = Map("k" -> "v"))
    val merged = TraceMerge.merge(Seq(first, retry))
    assert(merged.size == 1)
    assert(merged.head.kind.contains("CLIENT"))
    assert(merged.head.timestamp.contains(10L))
    assert(merged.head.localServiceName.contains("svc_a"))
    assert(merged.head.tags == Map("k" -> "v"))
  }

  test("client span and shared server twin stay separate") {
    val client = span("000000000000000b", kind = "CLIENT", svc = "svc_a")
    val server = span("000000000000000b", kind = "SERVER", svc = "svc_b", shared = Some(true))
    val merged = TraceMerge.merge(Seq(server, client))
    assert(merged.size == 2)
    assert(!merged.head.isShared && merged.last.isShared) // client ordered first
  }

  test("mixed 64/128-bit trace ids normalize to the longest") {
    val short = span("000000000000000b").copy(trace_id = "000000000000000a")
    val long = span("000000000000000c").copy(trace_id = "0000000000000000000000000000000a")
    val merged = TraceMerge.merge(Seq(short, long))
    assert(merged.forall(_.trace_id == "0000000000000000000000000000000a"))
  }

  test("annotations union distinctly") {
    val a = span("000000000000000b").copy(annotations = Seq(Annotation(1, "x")))
    val b = span("000000000000000b").copy(annotations = Seq(Annotation(1, "x"), Annotation(2, "y")))
    val merged = TraceMerge.merge(Seq(a, b))
    assert(merged.head.annotations == Seq(Annotation(1, "x"), Annotation(2, "y")))
  }

  private val genSpan: Gen[Span] = for {
    id <- Gen.oneOf("a", "b", "c", "d").map(c => c * 16)
    kind <- Gen.option(Gen.oneOf("CLIENT", "SERVER"))
    ts <- Gen.option(Gen.choose(1L, 1000L))
    shared <- Gen.option(Gen.oneOf(true, false))
    svc <- Gen.option(Gen.oneOf("s1", "s2"))
  } yield Span(trace_id = "000000000000000a", id = id, kind = kind, timestamp = ts,
    shared = shared, local_endpoint = svc.map(s => Endpoint(service_name = Some(s))))

  test("rootTimestamp treats explicit-0 and negative timestamps as absent") {
    // a root reporting zipkin's explicit-0 "absent" must not pin the trace
    // to epoch 0 (the 1970-01-01 partition no range query reaches) — fall
    // through to the minimum positive child timestamp
    val root = span("0000000000000001", ts = Some(0L))
    val child = span("0000000000000002", ts = Some(5000L)).copy(
      parent_id = Some("0000000000000001"))
    assert(Traces.rootTimestamp(Seq(root, child)) == 5000L)
    // garbage negatives are absent too, in both branches
    assert(Traces.rootTimestamp(Seq(root.copy(timestamp = Some(-7L)), child)) == 5000L)
    assert(Traces.rootTimestamp(Seq(span("03", ts = Some(-7L)))) == 0L)
    // a genuine positive root timestamp still wins over a smaller child's
    assert(Traces.rootTimestamp(Seq(root.copy(timestamp = Some(9000L)), child)) == 9000L)
  }

  test("merge is idempotent") {
    forAllSamples(Gen.listOfN(6, genSpan)) { spans =>
      val once = TraceMerge.merge(spans)
      assert(TraceMerge.merge(once) == once)
    }
  }

  test("merge is order-insensitive and same-service duplicates collapse") {
    forAllSamples(Gen.listOfN(6, genSpan)) { spans =>
      val m1 = TraceMerge.merge(spans)
      val m2 = TraceMerge.merge(scala.util.Random.shuffle(spans))
      assert(m1 == m2)
      // within one (id, shared) group, the named local services are distinct
      // (null-service reports were absorbed; incompatible services stay apart)
      for ((_, group) <- m1.groupBy(s => (s.id, s.isShared))) {
        val named = group.flatMap(_.localServiceName)
        assert(named.distinct.size == named.size)
      }
    }
  }

  test("same-id reports from DIFFERENT services stay separate (endpoint guard)") {
    val client = span("000000000000000b", kind = "CLIENT", svc = "frontend")
    val server = span("000000000000000b", kind = "SERVER", svc = "backend") // no shared flag
    val merged = TraceMerge.merge(Seq(client, server))
    assert(merged.size == 2)
    assert(merged.map(_.localServiceName.get).toSet == Set("frontend", "backend"))
  }
}
