package graft.core

import graft.model.{Span, Trace}

object Traces {

  /** The single definition of a trace's index/order timestamp: the root
    * span's (null parent) timestamp, else the minimum positive timestamp
    * (SURVEY §2.3 F1.1 / W1 — KafkaStorageHttpService.java:232 sorts by the
    * first span's timestamp). Shared by the pipeline, the store and the
    * query predicate so the rules cannot drift.
    *
    * Timestamps ≤ 0 are "absent" EVERYWHERE, including on the root span: a
    * root reporting the explicit-0 zipkin encoding (or garbage negatives)
    * must not pin the trace to epoch 0 — that lands it in the 1970-01-01
    * partition where no realistic range query can ever find it. The
    * returned value is therefore always > 0 or exactly 0 ("no timestamp",
    * rescued by the close-time placement at the store sink).
    */
  def rootTimestamp(spans: Seq[Span]): Long =
    spans.find(s => s.parent_id.isEmpty && s.timestamp.exists(_ > 0))
      .flatMap(_.timestamp)
      .getOrElse {
        val ts = spans.flatMap(_.timestamp).filter(_ > 0)
        if (ts.isEmpty) 0L else ts.min
      }

  /** Collapse several stored rows of one trace (at-least-once re-appends,
    * multi-session partials) into the canonical row: span-level
    * [[TraceMerge]], root_ts recomputed, falling back to the smallest
    * stored root_ts when no span carries a timestamp — preserving the
    * store's close-time placement so timestamp-less traces stay findable
    * by range queries. THE single definition of row collapse, shared by
    * query-time merge-on-read (TraceQueries) and store compaction
    * (StoreLayout.compactTraces) so the two can never disagree.
    */
  def mergeRows(id: String, rows: Seq[Trace]): Trace = {
    val merged = TraceMerge.merge(rows.flatMap(_.spans))
    val recomputed = rootTimestamp(merged)
    val stored = rows.map(_.root_ts).filter(_ > 0)
    Trace(id, merged, if (recomputed > 0 || stored.isEmpty) recomputed else stored.min)
  }
}
