package graft

import graft.core.QueryRequest
import graft.model.Span
import graft.operators.{SpanPipeline, TraceQueries}
import graft.sources.EventSpans
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or one of the
  * LLM-data-pipeline extensions), expressed over the driver's parquet tables
  * at `sfDir`. The zipkin-engine operators run on traces synthesized from the
  * `events` table via [[graft.sources.EventSpans]] (one trace per user
  * session), so the real pipeline — session windows, TraceMerge,
  * DependencyLinker, store tables, query surface — is what the DuckDB oracle
  * checks. [[oracleSql]] holds the equivalent SQL; column names and types are
  * aliased identically on both sides (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table ships with TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses by default; read nanos as long and surface a µs-truncated
    * TimestampType `ts` (the same truncation DuckDB's epoch_us applies).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  private def eventSpans(s: SparkSession, dir: String): Dataset[Span] =
    EventSpans.spans(s, events(s, dir))

  private def eventTraces(s: SparkSession, dir: String) =
    SpanPipeline.aggregateTraces(eventSpans(s, dir))

  // Fixed query window for deterministic oracles: endTs 2024-01-20T00:00Z,
  // lookback 10 d — a proper subset of the events range (2024-01-01..01-30),
  // so the range predicate filters non-trivially at every scale factor.
  private val EndTsMs = 1705708800000L
  private val LookbackMs = 864000000L

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a3_dependency_links")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ——— relational / aggregation shapes (SURVEY §2.4, §2.6) ———
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ——— A1/A2: session-window trace aggregation (Spark session_window) ———
    "q_a1_sessionize" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          unix_millis(col("session_window.end")).as("session_end_ms"),
          col("n_events"))
    }),

    // ——— A3 (+P1/P3/A6 + TraceMerge): per-trace dependency linking, merged ———
    "q_a3_dependency_links" -> ((s, dir) => {
      SpanPipeline.dependencyLinks(eventTraces(s, dir))
        .toDF().select(col("link.*"))
        .groupBy("parent", "child")
        .agg(sum("call_count").as("call_count"), sum("error_count").as("error_count"))
    }),

    // ——— A4: 1-minute windowed count-sum per edge ———
    "q_a4_dependency_windows" -> ((s, dir) =>
      SpanPipeline.dependencyWindows(SpanPipeline.dependencyLinks(eventTraces(s, dir)))),

    // ——— A5/F2: query-time dependency merge over [endTs−lookback, endTs] ———
    "q_a5_dependencies" -> ((s, dir) =>
      TraceQueries.dependencies(
        SpanPipeline.dependencyWindows(SpanPipeline.dependencyLinks(eventTraces(s, dir))),
        EndTsMs, LookbackMs)),

    // ——— F1/W1/W2: find-traces with service filter, newest-first, limit ———
    "q_f1_find_traces" -> ((s, dir) => {
      val req = QueryRequest(serviceName = Some("purchase"),
        endTs = EndTsMs, lookback = LookbackMs, limit = 10)
      TraceQueries.getTraces(eventTraces(s, dir), req)
        .select(col("trace_id"),
          expr("root_ts DIV 1000").as("root_ts_ms"),
          size(col("spans")).cast("long").as("n_spans"))
    }),

    // ——— F3/W5: latest entry per key (backwardFetch + first) ———
    "q_f3_latest_event" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
    }),

    // ——— A7/W4: span-name store → service-name enumeration ———
    "q_w4_service_names" -> ((s, dir) =>
      TraceQueries.serviceNames(SpanPipeline.spanNames(eventSpans(s, dir))))
  )

  /** Shared DuckDB CTEs replicating the sessionization/chaining semantics. */
  private val SessionCtes =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events
      |), s AS (
      |  SELECT *, CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM e
      |), tr AS (
      |  SELECT *, lag(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS parent
      |  FROM s
      |), sess AS (
      |  SELECT user_id, session_id, min(ts_us) AS root_us, min(ts_us)//1000 AS root_ms
      |  FROM s GROUP BY user_id, session_id
      |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_a1_sessionize" -> (SessionCtes +
      """
        |SELECT user_id, min(ts_us)//1000 AS session_start_ms,
        |       max(ts_us)//1000 + 1800000 AS session_end_ms,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin),

    "q_a3_dependency_links" -> (SessionCtes +
      """
        |SELECT parent, event_type AS child, count(*) AS call_count,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
        |FROM tr WHERE parent IS NOT NULL GROUP BY 1, 2""".stripMargin),

    "q_a4_dependency_windows" -> (SessionCtes +
      """
        |SELECT root_ms - root_ms % 60000 AS window_start_ms, parent, event_type AS child,
        |       count(*) AS call_count,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
        |FROM tr JOIN sess USING (user_id, session_id)
        |WHERE parent IS NOT NULL GROUP BY 1, 2, 3""".stripMargin),

    "q_a5_dependencies" -> (SessionCtes +
      s"""
         |SELECT parent, event_type AS child, count(*) AS call_count,
         |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
         |FROM tr JOIN sess USING (user_id, session_id)
         |WHERE parent IS NOT NULL
         |  AND root_ms - root_ms % 60000 BETWEEN ${EndTsMs - LookbackMs} AND $EndTsMs
         |GROUP BY 1, 2""".stripMargin),

    "q_f1_find_traces" -> (SessionCtes +
      s"""
         |, agg AS (
         |  SELECT concat(user_id, ':', session_id) AS trace_id, min(ts_us) AS root_us,
         |         count(*) AS n_spans, bool_or(event_type = 'purchase') AS has_purchase
         |  FROM s GROUP BY user_id, session_id)
         |SELECT trace_id, root_us//1000 AS root_ts_ms, n_spans FROM agg
         |WHERE has_purchase
         |  AND root_us BETWEEN ${(EndTsMs - LookbackMs) * 1000} AND ${EndTsMs * 1000}
         |ORDER BY root_us DESC, trace_id LIMIT 10""".stripMargin),

    "q_f3_latest_event" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "q_w4_service_names" ->
      "SELECT DISTINCT event_type AS service FROM events ORDER BY service LIMIT 1000"
  )
}
