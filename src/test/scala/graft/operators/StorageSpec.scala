package graft.operators

import graft.SparkSpec
import graft.core.QueryRequest
import graft.model.{Endpoint, Span}

/** F4: enable flags assemble only the allowed stages, and disabled query
  * surfaces return empty (reference KafkaSpanStore.java:64-69).
  */
class StorageSpec extends SparkSpec {

  import spark.implicits._

  private def ep(s: String) = Some(Endpoint(service_name = Some(s)))
  private lazy val spans = Seq(
    Span(trace_id = "000000000000000a", id = "000000000000000a", kind = Some("CLIENT"),
      name = Some("op_a"), timestamp = Some(2000000L), local_endpoint = ep("svc_a"),
      remote_endpoint = ep("svc_b"), tags = Map("env" -> "prod")),
    Span(trace_id = "000000000000000a", id = "000000000000000b",
      parent_id = Some("000000000000000a"), kind = Some("SERVER"), name = Some("op_b"),
      timestamp = Some(2500000L), local_endpoint = ep("svc_b"))).toDS()

  private val req = QueryRequest(endTs = 10000L, lookback = 10000L, limit = 10)

  test("all flags on: every surface answers") {
    val st = new GraftStorage(StorageConfig(autocompleteKeys = Seq("env")))
    val stores = st.assemble(spans)
    assert(st.getTraces(stores, spark, req).count() == 1)
    assert(st.getTraceMany(stores, spark, Seq("a")).count() == 1) // normalized id
    assert(st.serviceNames(stores, spark).as[String].collect().toSeq == Seq("svc_a", "svc_b"))
    assert(st.autocompleteKeys(stores, spark).as[String].collect().toSeq == Seq("env"))
    assert(st.autocompleteValues(stores, spark, "env").as[String].collect().toSeq == Seq("prod"))
    assert(st.dependencies(stores, spark, 10000L, 10000L).count() == 1)
  }

  test("traceSearchEnabled=false: search surfaces empty, by-id still works") {
    val st = new GraftStorage(StorageConfig(traceSearchEnabled = false))
    val stores = st.assemble(spans)
    assert(stores.spanNames.isEmpty && stores.remoteServiceNames.isEmpty)
    assert(st.getTraces(stores, spark, req).count() == 0)
    assert(st.serviceNames(stores, spark).count() == 0)
    assert(st.getTraceMany(stores, spark, Seq("a")).count() == 1)
  }

  test("traceByIdQueryEnabled=false: lookups empty, search still works") {
    val st = new GraftStorage(StorageConfig(traceByIdQueryEnabled = false))
    val stores = st.assemble(spans)
    assert(st.getTrace(stores, spark, "a").count() == 0)
    assert(st.getTraceMany(stores, spark, Seq("a")).count() == 0)
    assert(st.getTraces(stores, spark, req).count() == 1)
  }

  test("aggregationEnabled=false: no trace store, downstream surfaces empty") {
    val st = new GraftStorage(StorageConfig(aggregationEnabled = false))
    val stores = st.assemble(spans)
    assert(stores.traces.isEmpty && stores.dependencyWindows.isEmpty)
    assert(st.getTraces(stores, spark, req).count() == 0)
    assert(st.dependencies(stores, spark, 10000L, 10000L).count() == 0)
  }

  test("dependencyQueryEnabled=false: dependencies empty") {
    val st = new GraftStorage(StorageConfig(dependencyQueryEnabled = false))
    val stores = st.assemble(spans)
    assert(stores.dependencyWindows.isEmpty)
    assert(st.dependencies(stores, spark, 10000L, 10000L).count() == 0)
  }

  test("autocomplete keys not in the allowlist answer empty") {
    val st = new GraftStorage(StorageConfig(autocompleteKeys = Seq("env")))
    val stores = st.assemble(spans)
    assert(st.autocompleteValues(stores, spark, "other").count() == 0)
  }
}
