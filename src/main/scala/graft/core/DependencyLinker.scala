package graft.core

import graft.model.{DependencyLink, Span}
import scala.collection.mutable

/** Re-implementation (from published behavior, not code) of zipkin-core's
  * `zipkin2.internal.DependencyLinker`, invoked per completed trace at
  * /root/reference storage/.../streams/SpanAggregationTopology.java:115-121
  * and merged across windows at KafkaStorageHttpService.java:86.
  *
  * Per trace (SURVEY.md §1.4 A3):
  *  - build the span tree on parentId→id (orphans attach under the root);
  *  - walk it breadth-first; for each RPC span derive one edge:
  *      CLIENT/PRODUCER → parent = local service, child = remote service;
  *      SERVER/CONSUMER → child = local service, parent = remote service or
  *        the nearest instrumented ancestor's service;
  *  - skip the client half when a shared server span with the same span ID
  *    describes the same RPC (no double count);
  *  - errorCount++ when the child-side span carries a tag key "error";
  *    callCount++ per RPC.
  *
  * `merge` across traces/windows = groupBy (parent, child) summing counts —
  * in Spark that is a plain `groupBy(...).agg(sum, sum)` (SURVEY §2.4 A5).
  */
object DependencyLinker {

  private val ClientKinds = Set("CLIENT", "PRODUCER")
  private val ServerKinds = Set("SERVER", "CONSUMER")

  def link(spans: Seq[Span]): Seq[DependencyLink] = {
    if (spans.isEmpty) return Nil
    val counts = mutable.LinkedHashMap.empty[(String, String), (Long, Long)]

    val byId: Map[String, Seq[Span]] = spans.groupBy(_.id)
    // Shared server spans reuse the client's span ID; their structural parent
    // is the client twin, not the client's parent.
    def parentOf(s: Span): Option[Span] =
      if (s.isShared && ServerKinds.contains(s.kind.getOrElse("")))
        byId.get(s.id).flatMap(_.find(t => !t.isShared && t != s))
          .orElse(structuralParent(s))
      else structuralParent(s)

    def structuralParent(s: Span): Option[Span] =
      s.parent_id.filter(_ != s.id).flatMap(pid =>
        byId.get(pid).map(cands => cands.find(!_.isShared).getOrElse(cands.head)))

    // Nearest ancestor (walking parent links) with a local service name.
    // Memoized per span id: a degenerate deep chain of service-less spans
    // would otherwise re-walk to the root for every span — O(n²) in the
    // per-trace hot loop.
    val ancestorMemo = mutable.HashMap.empty[String, Option[String]]
    def ancestorService(s: Span): Option[String] = {
      var cur = parentOf(s)
      var hops = 0
      val visited = mutable.ArrayBuffer.empty[String]
      var result: Option[String] = None
      while (result.isEmpty && cur.isDefined && hops < spans.size + 1) {
        val c = cur.get
        ancestorMemo.get(c.id) match {
          case Some(cached) => result = cached; cur = None
          case None =>
            val svc = if (ClientKinds.contains(c.kind.getOrElse("")) || c.kind.isEmpty ||
              ServerKinds.contains(c.kind.getOrElse(""))) c.localServiceName else None
            if (svc.isDefined) { result = svc; cur = None }
            else { visited += c.id; cur = parentOf(c); hops += 1 }
        }
      }
      // every service-less span on the walked path resolves to the same
      // answer — record it so the next sibling's walk is O(1)
      visited.foreach(id => ancestorMemo(id) = result)
      result
    }

    def bump(parent: String, child: String, error: Boolean): Unit = {
      val key = (parent, child)
      val (c, e) = counts.getOrElse(key, (0L, 0L))
      counts(key) = (c + 1, if (error) e + 1 else e)
    }

    // One pass of index-building so the per-span checks below are O(1) —
    // a scan-per-span would make link() quadratic in trace size, the one
    // thing the "per-group work bounded by trace size" posture forbids.
    val sharedServerIds = spans.iterator
      .filter(t => t.kind.contains("SERVER") && t.isShared).map(_.id).toSet
    // A shared server span WITH a same-id non-shared twin is that twin's
    // other half: its parent_id names the twin's parent, so counting it as
    // "my child's server half" would suppress the GRANDPARENT client's own
    // (different) edge — such twins suppress via sharedServerIds only. A
    // shared server whose id has NO twin (single-host instrumentation that
    // sets shared on a child span) still acts as its parent's direct server
    // half, like any non-shared SERVER child.
    val nonSharedIds = spans.iterator.filterNot(_.isShared).map(_.id).toSet
    val serverParentIds = spans.iterator
      .filter(t => t.kind.contains("SERVER") &&
        (!t.isShared || !nonSharedIds.contains(t.id)))
      .flatMap(_.parent_id).toSet
    // THE root, not "any other parentless span": zipkin's tree builder
    // elects one root and attaches every other parentless node UNDER it
    // (zipkin2.internal.SpanNode.Builder logs "attributing span missing
    // parent to root"), so a two-root trace yields ONE directed edge
    // root→orphan. A per-span `find(_.id != s.id)` fallback made each
    // parentless SERVER adopt the OTHER root — emitting BOTH directions, a
    // phantom dependency cycle. Election is earliest (timestamp, id) for
    // permutation invariance (zipkin's is list order; ours must not depend
    // on shuffle arrival — documented deviation like W2).
    val theRoot = spans.filter(_.parent_id.isEmpty)
      .sortBy(s => (s.timestamp.getOrElse(Long.MaxValue), s.id)).headOption

    for (s <- spans) {
      // Unknown-kind spans with both endpoints known act as client spans
      // (zipkin-core DependencyLinker published behavior).
      val kind = s.kind.getOrElse(
        if (s.localServiceName.isDefined && s.remoteServiceName.isDefined) "CLIENT" else "")
      if (ClientKinds.contains(kind)) {
        // The server half of an RPC — a shared twin (same span ID) or a
        // direct child SERVER span — produces this link with its own error
        // tags; count it there, not here (no double count). Messaging spans
        // are NOT suppressed: a PRODUCER with a CONSUMER child represents
        // two hops through the broker (svcA→broker and broker→svcB), and
        // zipkin emits both edges. (s itself is CLIENT-kind here, so the
        // SERVER-only index sets can never match s against itself.)
        val serverHalf = kind == "CLIENT" &&
          (sharedServerIds.contains(s.id) || serverParentIds.contains(s.id))
        if (!serverHalf) {
          val parent = s.localServiceName.orElse(ancestorService(s))
          val child = s.remoteServiceName
          for (p <- parent; c <- child) bump(p, c, s.tags.contains("error"))
        }
      } else if (ServerKinds.contains(kind)) {
        val child = s.localServiceName
        val parent = s.remoteServiceName.orElse(ancestorService(s)).orElse {
          // Orphan server span: attach under THE elected root's service —
          // unless s is itself that root (or its shared twin, same id): the
          // tree root has no parent and emits no inbound edge.
          theRoot.filter(_.id != s.id).flatMap(_.localServiceName)
        }
        for (p <- parent; c <- child) bump(p, c, s.tags.contains("error"))
      }
    }
    counts.iterator.map { case ((p, c), (calls, errs)) => DependencyLink(p, c, calls, errs) }.toSeq
  }

  /** Query-time merge across windows (SURVEY §2.4 A5). */
  def merge(links: Seq[DependencyLink]): Seq[DependencyLink] =
    links.groupBy(l => (l.parent, l.child)).map { case ((p, c), ls) =>
      DependencyLink(p, c, ls.map(_.call_count).sum, ls.map(_.error_count).sum)
    }.toSeq
}
