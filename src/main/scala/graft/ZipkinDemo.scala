package graft

import graft.core.QueryRequest
import graft.operators.{SpanPipeline, TraceQueries}
import graft.sources.SpanSources
import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the Zipkin surface: ingest JSON_V2 spans,
  * build every store, answer every query route a zipkin-storage-kafka user
  * has today (reference HTTP surface: KafkaStorageHttpService.java:69-326).
  *
  *   sbt "runMain graft.ZipkinDemo [spans.json dir]"
  */
object ZipkinDemo {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-zipkin-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = args.headOption.getOrElse {
      // self-contained: write the FIXTURES.md §1c scenario to a temp dir
      val dir = java.nio.file.Files.createTempDirectory("zipkin-demo")
      val todayUs = System.currentTimeMillis() * 1000
      java.nio.file.Files.writeString(dir.resolve("spans.json"), Seq(
        s"""{"trace_id":"000000000000000a","id":"000000000000000a","name":"op_a","kind":"CLIENT","local_endpoint":{"service_name":"svc_a"},"remote_endpoint":{"service_name":"svc_b"},"timestamp":$todayUs,"duration":10,"tags":{"environment":"dev"}}""",
        s"""{"trace_id":"000000000000000a","id":"000000000000000b","parent_id":"000000000000000a","name":"op_b","kind":"SERVER","shared":true,"local_endpoint":{"service_name":"svc_b"},"timestamp":$todayUs,"duration":2}""",
        s"""{"trace_id":"000000000000000c","id":"000000000000000c","name":"op_c","kind":"SERVER","local_endpoint":{"service_name":"svc_c"},"timestamp":${todayUs + 10},"duration":8}""").mkString("\n"))
      dir.toString
    }

    // ingest + stores (the three reference topologies, batch form)
    val spans = SpanSources.fromJson(spark, path).cache()
    val traces = SpanPipeline.aggregateTraces(spans).cache()
    val links = SpanPipeline.dependencyLinks(traces)
    val depWindows = SpanPipeline.dependencyWindows(links)
    val spanNames = SpanPipeline.spanNames(spans)
    val remoteNames = SpanPipeline.remoteServiceNames(spans)
    val autocomplete = SpanPipeline.autocompleteTags(spans, Seq("environment"))

    val endTs = System.currentTimeMillis() + 1000
    def show(title: String)(rows: Seq[String]): Unit =
      println(s"== $title\n   ${rows.mkString("\n   ")}")

    show("GET /traces?serviceName=svc_a") {
      TraceQueries.getTraces(traces, QueryRequest(serviceName = Some("svc_a"), endTs = endTs))
        .collect().map(t => s"${t.trace_id} (${t.spans.size} spans)").toSeq
    }
    show("GET /traces (newest first, limit 1)") {
      TraceQueries.getTraces(traces, QueryRequest(endTs = endTs, limit = 1))
        .collect().map(_.trace_id).toSeq
    }
    show("GET /trace/{a}") {
      TraceQueries.getTrace(traces, "a").collect()
        .map(t => t.spans.map(_.name.getOrElse("?")).mkString(",")).toSeq
    }
    show("GET /traceMany?traceIds=a,c") {
      TraceQueries.getTraceMany(traces, Seq("a", "c")).collect().map(_.trace_id).toSeq
    }
    show("GET /serviceNames") {
      TraceQueries.serviceNames(spanNames).collect().map(_.getString(0)).toSeq
    }
    show("GET /serviceNames/svc_a/spanNames") {
      TraceQueries.spanNames(spanNames, "svc_a").collect().map(_.getString(0)).toSeq
    }
    show("GET /serviceNames/svc_a/remoteServiceNames") {
      TraceQueries.remoteServiceNames(remoteNames, "svc_a").collect().map(_.getString(0)).toSeq
    }
    show("GET /dependencies") {
      TraceQueries.dependencies(depWindows, endTs, 86400000L).collect()
        .map(r => s"${r.getString(0)}->${r.getString(1)} calls=${r.getLong(2)} errors=${r.getLong(3)}").toSeq
    }
    show("GET /autocompleteKeys") {
      TraceQueries.autocompleteKeys(autocomplete).collect().map(_.getString(0)).toSeq
    }
    show("GET /autocompleteValues?key=environment") {
      TraceQueries.autocompleteValues(autocomplete, "environment").collect()
        .map(_.getString(0)).toSeq
    }

    // streaming variant: same spans through the session-window pipeline into
    // the date-partitioned store, queried back through the same surface
    val tmp = java.nio.file.Files.createTempDirectory("zipkin-demo-stream")
    val q = graft.streaming.StreamingPipeline.tracesToStore(
      graft.streaming.StreamingPipeline.sessionTraces(
        graft.sources.SpanSources.fromJsonFiles(spark, path), "1 minute"),
      s"$tmp/traces", s"$tmp/chk")
    q.processAllAvailable()
    // a later span advances the watermark one gap past the fixture sessions,
    // closing them (the reference's smoke test waits 61 s for the same reason)
    val laterUs = (System.currentTimeMillis() + 180000) * 1000
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path, "clock.json"),
      s"""{"trace_id":"00000000000000ff","id":"00000000000000ff","timestamp":$laterUs}""")
    q.processAllAvailable()
    q.stop()
    show("streaming → store → GET /traces (closed sessions only)") {
      TraceQueries.getTraces(
        TraceQueries.fromStore(spark.read.parquet(s"$tmp/traces")),
        QueryRequest(endTs = endTs)).collect()
        .map(t => s"${t.trace_id} (${t.spans.size} spans)").toSeq
    }
    spark.stop()
  }
}
