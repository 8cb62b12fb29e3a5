package graft.core

import graft.model.Span

object Traces {

  /** The single definition of a trace's index/order timestamp: the root
    * span's (null parent) timestamp, else the minimum non-zero timestamp
    * (SURVEY §2.3 F1.1 / W1 — KafkaStorageHttpService.java:232 sorts by the
    * first span's timestamp). Shared by the pipeline, the store and the
    * query predicate so the rules cannot drift.
    */
  def rootTimestamp(spans: Seq[Span]): Long =
    spans.find(s => s.parent_id.isEmpty && s.timestamp.isDefined)
      .flatMap(_.timestamp)
      .getOrElse {
        val ts = spans.flatMap(_.timestamp).filter(_ != 0)
        if (ts.isEmpty) 0L else ts.min
      }
}
