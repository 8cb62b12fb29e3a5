package graft.core

import graft.model.{DependencyLink, Endpoint, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's observable linking behavior
  * (SpanAggregationTopologyTest.java:94-103 and zipkin-core DependencyLinker
  * published semantics, SURVEY §1.4).
  */
class DependencyLinkerSpec extends AnyFunSuite {

  private def ep(s: String) = Some(Endpoint(service_name = Some(s)))

  test("reference aggregation fixture: CLIENT svc_a + SERVER svc_b → one svc_a:svc_b link") {
    // SpanAggregationTopologyTest.java:76-81: span b has no parent_id; zipkin
    // attaches parentless nodes under the root, so the edge is svc_a → svc_b.
    val a = Span(trace_id = "000000000000000a", id = "000000000000000a",
      kind = Some("CLIENT"), name = Some("op_a"), local_endpoint = ep("svc_a"))
    val b = Span(trace_id = "000000000000000a", id = "000000000000000b",
      kind = Some("SERVER"), name = Some("op_b"), local_endpoint = ep("svc_b"))
    assert(DependencyLinker.link(Seq(a, b)) ==
      Seq(DependencyLink("svc_a", "svc_b", 1, 0)))
  }

  test("client span with remote endpoint produces edge when no shared server twin") {
    val c = Span(trace_id = "000000000000000a", id = "000000000000000a",
      kind = Some("CLIENT"), local_endpoint = ep("front"), remote_endpoint = ep("back"))
    assert(DependencyLinker.link(Seq(c)) == Seq(DependencyLink("front", "back", 1, 0)))
  }

  test("a child's shared server twin must not suppress the grandparent's edge") {
    // G (client A→Z, callee Z uninstrumented) has child C (client A→B) whose
    // RPC is recorded by shared server twin S (same id as C, parent = G's id).
    // S's parent pointer names G only because shared twins copy the client's
    // parent — it is the server half of C's RPC, not of G's, so A→Z must
    // still be emitted (and A→B exactly once, from S's side).
    val g = Span(trace_id = "000000000000000a", id = "00000000000000aa",
      kind = Some("CLIENT"), local_endpoint = ep("svc_a"), remote_endpoint = ep("svc_z"))
    val c = Span(trace_id = "000000000000000a", id = "00000000000000bb",
      parent_id = Some("00000000000000aa"), kind = Some("CLIENT"),
      local_endpoint = ep("svc_a"), remote_endpoint = ep("svc_b"))
    val s = Span(trace_id = "000000000000000a", id = "00000000000000bb",
      parent_id = Some("00000000000000aa"), kind = Some("SERVER"),
      local_endpoint = ep("svc_b"), shared = Some(true))
    val links = DependencyLinker.link(Seq(g, c, s)).sortBy(l => (l.parent, l.child))
    assert(links == Seq(
      DependencyLink("svc_a", "svc_b", 1, 0),
      DependencyLink("svc_a", "svc_z", 1, 0)))
  }

  test("deep service-less chains resolve ancestors without quadratic re-walks") {
    // 2k-span chain where only the root names a service: every SERVER span's
    // parent edge resolves through the memoized ancestor walk — this spec is
    // a liveness pin (completes fast) plus a correctness check on the edge
    val root = Span(trace_id = "000000000000000a", id = "r",
      kind = Some("CLIENT"), local_endpoint = ep("origin"))
    val chain = (1 to 2000).map { i =>
      Span(trace_id = "000000000000000a", id = s"s$i",
        parent_id = Some(if (i == 1) "r" else s"s${i - 1}"), kind = Some("SERVER"),
        local_endpoint = None, remote_endpoint = None)
    }
    val leaf = Span(trace_id = "000000000000000a", id = "leaf",
      parent_id = Some("s2000"), kind = Some("SERVER"), local_endpoint = ep("deep"))
    val t0 = System.nanoTime()
    val links = DependencyLinker.link(root +: chain :+ leaf)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(links == Seq(DependencyLink("origin", "deep", 1, 0)))
    assert(ms < 2000, s"ancestor resolution took ${ms}ms — quadratic re-walk suspected")
  }

  test("shared server twin suppresses the client half (no double count)") {
    val client = Span(trace_id = "000000000000000a", id = "000000000000000b",
      parent_id = Some("000000000000000a"), kind = Some("CLIENT"),
      local_endpoint = ep("front"), remote_endpoint = ep("back"))
    val server = Span(trace_id = "000000000000000a", id = "000000000000000b",
      parent_id = Some("000000000000000a"), kind = Some("SERVER"),
      local_endpoint = ep("back"), shared = Some(true))
    val links = DependencyLinker.link(Seq(client, server))
    assert(links == Seq(DependencyLink("front", "back", 1, 0)))
  }

  test("server-side error tag increments errorCount") {
    val server = Span(trace_id = "000000000000000a", id = "000000000000000a",
      kind = Some("SERVER"), local_endpoint = ep("back"), remote_endpoint = ep("front"),
      tags = Map("error" -> "500"))
    assert(DependencyLinker.link(Seq(server)) == Seq(DependencyLink("front", "back", 1, 1)))
  }

  test("SERVER without remote endpoint walks to nearest instrumented ancestor") {
    val root = Span(trace_id = "000000000000000a", id = "000000000000000a",
      kind = Some("SERVER"), local_endpoint = ep("gateway"), remote_endpoint = ep("edge"))
    val mid = Span(trace_id = "000000000000000a", id = "000000000000000b",
      parent_id = Some("000000000000000a"), local_endpoint = None) // uninstrumented local op
    val leaf = Span(trace_id = "000000000000000a", id = "000000000000000c",
      parent_id = Some("000000000000000b"), kind = Some("SERVER"), local_endpoint = ep("db"))
    val links = DependencyLinker.link(Seq(root, mid, leaf))
    assert(links.contains(DependencyLink("gateway", "db", 1, 0)))
    assert(links.contains(DependencyLink("edge", "gateway", 1, 0)))
  }

  test("messaging spans emit BOTH broker hops (producer→broker, broker→consumer)") {
    val p = Span(trace_id = "000000000000000a", id = "000000000000000a",
      kind = Some("PRODUCER"), local_endpoint = ep("svc_a"), remote_endpoint = ep("kafka"))
    val c = Span(trace_id = "000000000000000a", id = "000000000000000b",
      parent_id = Some("000000000000000a"), kind = Some("CONSUMER"),
      local_endpoint = ep("svc_b"), remote_endpoint = ep("kafka"))
    // the consumer child must NOT suppress the producer edge (only a SERVER
    // child suppresses its CLIENT half — that is the same RPC; these are two
    // distinct hops through the broker)
    assert(DependencyLinker.link(Seq(p, c)).toSet ==
      Set(DependencyLink("svc_a", "kafka", 1, 0), DependencyLink("kafka", "svc_b", 1, 0)))
  }

  test("PRODUCER/CONSUMER map like CLIENT/SERVER") {
    val p = Span(trace_id = "000000000000000a", id = "000000000000000a",
      kind = Some("PRODUCER"), local_endpoint = ep("app"), remote_endpoint = ep("kafka"))
    val c = Span(trace_id = "000000000000000b", id = "000000000000000b",
      kind = Some("CONSUMER"), local_endpoint = ep("worker"), remote_endpoint = ep("kafka"))
    assert(DependencyLinker.link(Seq(p)) == Seq(DependencyLink("app", "kafka", 1, 0)))
    assert(DependencyLinker.link(Seq(c)) == Seq(DependencyLink("kafka", "worker", 1, 0)))
  }

  test("merge sums counts per edge") {
    val merged = DependencyLinker.merge(Seq(
      DependencyLink("a", "b", 1, 0), DependencyLink("a", "b", 2, 1),
      DependencyLink("b", "c", 1, 1)))
    assert(merged.toSet == Set(DependencyLink("a", "b", 3, 1), DependencyLink("b", "c", 1, 1)))
  }

  test("span order does not change the linked edges") {
    val spans = Seq(
      Span(trace_id = "000000000000000a", id = "000000000000000a", kind = Some("SERVER"),
        local_endpoint = ep("front"), remote_endpoint = ep("lb")),
      Span(trace_id = "000000000000000a", id = "000000000000000b",
        parent_id = Some("000000000000000a"), kind = Some("CLIENT"),
        local_endpoint = ep("front"), remote_endpoint = ep("back")),
      Span(trace_id = "000000000000000a", id = "000000000000000b",
        parent_id = Some("000000000000000a"), kind = Some("SERVER"),
        local_endpoint = ep("back"), shared = Some(true), tags = Map("error" -> "")))
    val expected = DependencyLinker.link(spans).toSet
    assert(expected == Set(DependencyLink("lb", "front", 1, 0), DependencyLink("front", "back", 1, 1)))
    for (perm <- spans.permutations)
      assert(DependencyLinker.link(perm).toSet == expected)
  }

  test("two parentless SERVER spans yield ONE root→orphan edge, never a " +
      "mutual phantom cycle, in every span order") {
    // two session partials that each lost their parent link: zipkin elects
    // one tree root and attaches the other parentless node under it — the
    // r16 review found the old per-span fallback made each root adopt the
    // OTHER, emitting both directions
    val spans = Seq(
      Span(trace_id = "000000000000000a", id = "000000000000000a", kind = Some("SERVER"),
        local_endpoint = ep("svcX"), timestamp = Some(1000L)),
      Span(trace_id = "000000000000000a", id = "000000000000000b", kind = Some("SERVER"),
        local_endpoint = ep("svcY"), timestamp = Some(2000L)))
    // earliest (timestamp, id) is the root: svcX → svcY only
    val expected = Set(DependencyLink("svcX", "svcY", 1, 0))
    for (perm <- spans.permutations)
      assert(DependencyLinker.link(perm).toSet == expected,
        s"order ${perm.map(_.id)} must not change the elected root")
    // a lone parentless SERVER (THE root itself) emits no inbound edge
    assert(DependencyLinker.link(spans.take(1)).isEmpty)
  }
}
