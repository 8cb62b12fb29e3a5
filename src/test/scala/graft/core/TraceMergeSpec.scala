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
