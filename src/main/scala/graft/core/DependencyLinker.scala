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
    def ancestorService(s: Span): Option[String] = {
      var cur = parentOf(s)
      var hops = 0
      while (cur.isDefined && hops < spans.size + 1) {
        val c = cur.get
        val svc = if (ClientKinds.contains(c.kind.getOrElse("")) || c.kind.isEmpty ||
          ServerKinds.contains(c.kind.getOrElse(""))) c.localServiceName else None
        if (svc.isDefined) return svc
        cur = parentOf(c)
        hops += 1
      }
      None
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
    val serverParentIds = spans.iterator
      .filter(_.kind.contains("SERVER")).flatMap(_.parent_id).toSet
    val roots = spans.filter(_.parent_id.isEmpty)

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
          // Orphan server span in a trace with a distinct root: attach under
          // the root's service (zipkin places parentless nodes under the root).
          roots.find(_.id != s.id).flatMap(_.localServiceName)
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
