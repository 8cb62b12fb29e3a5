package graft.store

import graft.model.Trace
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the serving tables (SURVEY §4, §1.5): the reference's
  * time-segmented RocksDB window stores become date-partitioned parquet
  * tables, so
  *  - range queries prune partitions at file-listing time (the analog of
  *    "range scans only touch live segments"),
  *  - retention is a partition drop (the analog of segment expiry — traces
  *    1 d, names 7 d, dependencies 7 d by default), and
  *  - point lookups on key prune via min/max row-group stats.
  */
object StoreLayout {

  /** Traces store: one row per (trace, session) append, partitioned by the
    * root-span date. Expects columns (trace_id, spans, root_ts µs). Appends
    * are at-least-once under streaming retries; duplicates and multi-session
    * partials collapse at read time via `TraceQueries.fromStore`'s merge.
    *
    * `filesPerDate` bounds the small-files blowup of partitionBy (every
    * writing task otherwise opens one file per date it touches — tasks ×
    * dates files per append): rows are pre-shuffled onto (date, id-bucket)
    * keys so each date lands in ≈ filesPerDate files. The default 1 suits
    * micro-batch appends; a bulk backfill of ~1 TB/day raises it so a day is
    * written (and later scanned) by many tasks.
    */
  def writeTraces(traces: DataFrame, path: String, filesPerDate: Int = 1): Unit =
    traces.select(col("trace_id"), col("spans"), col("root_ts"))
      // UTC epoch-day arithmetic, NOT to_date(): partition assignment must
      // not depend on the writer session's timezone or readers in another
      // zone silently prune the wrong partitions. FLOOR division (SQL DIV
      // truncates toward zero): a negative timestamp must land on the same
      // 1969-12-31 date the read side's Math.floorDiv prunes by, or the row
      // becomes unreachable
      .withColumn("trace_date", expr(epochDayExpr("root_ts", 86400000000L)))
      .repartition(col("trace_date"), pmod(xxhash64(col("trace_id")), lit(filesPerDate)))
      .write.partitionBy("trace_date").mode(SaveMode.Append).parquet(path)

  /** Range read with partition pruning: only `trace_date` partitions
    * intersecting [endTs−lookback, endTs] (ms) are listed.
    *
    * Callers that MERGE partial rows afterwards (fromStore) must over-read
    * by their partial-spread bound (session length + allowed lateness) and
    * re-apply the exact window on the post-merge root_ts: a partial whose
    * own root_ts falls just outside the window still contributes spans to
    * a trace whose merged root is inside it.
    */
  def readTraces(spark: SparkSession, path: String, endTs: Long, lookback: Long): DataFrame =
    spark.read.parquet(path)
      .where(col("trace_date").between(utcDate(endTs - lookback), utcDate(endTs)))
      .where(col("root_ts").between((endTs - lookback) * 1000, endTs * 1000))

  /** Epoch-ms → UTC date literal (reader-timezone independent). */
  private def utcDate(epochMs: Long) =
    lit(java.time.LocalDate.ofEpochDay(Math.floorDiv(epochMs, 86400000L)).toString).cast("date")

  /** SQL text for the UTC date of an epoch column with `unitPerDay` ticks
    * per day, using FLOOR division so negatives agree with [[utcDate]]'s
    * Math.floorDiv on the read side (SQL DIV truncates toward zero).
    */
  private def epochDayExpr(colName: String, unitPerDay: Long): String =
    s"date_add(DATE'1970-01-01', CAST(CASE WHEN $colName < 0 " +
      s"THEN ($colName - ${unitPerDay - 1}) DIV $unitPerDay " +
      s"ELSE $colName DIV $unitPerDay END AS INT))"

  /** Compact the merge-on-read trace store: collapse at-least-once
    * re-appends and multi-session partials into one canonical row per
    * trace, so read amplification stops growing with redelivery count (the
    * analog of the reference's RocksDB/changelog compaction — its store is
    * compacted continuously by Kafka Streams,
    * streams/TraceStorageTopology.java:108-115 upserts into a compacted
    * changelog; our append-only parquet needs an explicit pass).
    *
    * Rows merge within (trace_date, trace_id) — never across dates — so:
    *  - no row changes partition (a group's recomputed root_ts is the min
    *    over roots that all fall inside that date), which makes the pass
    *    safe to run per closed date partition incrementally at scale, and
    *  - cross-date partials of one trace (a session that moved the root
    *    earlier) remain split — harmless, because query-time merge-on-read
    *    (`TraceQueries.fromStore`, built on the same [[graft.core.Traces]]
    *    mergeRows) stays in place as the correctness backstop; compaction
    *    is an optimization, not a correctness requirement.
    *
    * The rewrite stages to `path + ".compact"`, moves the live store aside
    * to `path + ".old"`, promotes the staging dir, then drops the old copy —
    * every rename result is checked, and a crash mid-swap leaves the data
    * recoverable in one of the two side dirs instead of deleted (a table
    * format with atomic commit replaces the swap on a real deployment).
    * No counts are computed — that would cost two extra full-store scans;
    * callers who want them can count the parquet dirs themselves.
    */
  def compactTraces(spark: SparkSession, path: String, filesPerDate: Int = 1): Unit = {
    import spark.implicits._
    val merged = spark.read.parquet(path)
      .select(col("trace_date").cast("string").as("_1"),
        struct(col("trace_id"), col("spans"), col("root_ts")).as("_2"))
      .as[(String, Trace)]
      .groupByKey(r => (r._1, r._2.trace_id))
      .mapGroups((key: (String, String), it: Iterator[(String, Trace)]) =>
        graft.core.Traces.mergeRows(key._2, it.map(_._2).toSeq))
    swapRewrite(spark, path)(staging => writeTraces(merged.toDF(), staging, filesPerDate))
  }

  /** Compact the dependency-window store: drop replayed finals (full-row
    * duplicates under one batch_id) then merge genuine partial sums into one
    * row per (window, edge) — after which a range read carries no redundant
    * rows to dedup. Compacted rows take batch_id −1 (a generation marker no
    * real foreachBatch epoch uses); run over closed dates only in
    * production, like [[compactTraces]].
    */
  def compactDependencyWindows(spark: SparkSession, path: String): Unit = {
    val merged = spark.read.parquet(path)
      .dropDuplicates()
      .groupBy("window_start_ms", "parent", "child")
      .agg(sum("call_count").as("call_count"), sum("error_count").as("error_count"))
    swapRewrite(spark, path)(staging =>
      writeDependencyWindows(merged, staging, batchId = -1L))
  }

  /** Collapse (key, set) delta rows to one sorted-set row per key — the
    * read-side merge of the incremental name/autocomplete stores AND their
    * compaction rewrite share this one expression, so the two can never
    * disagree.
    */
  def collapseSetDeltas(df: DataFrame, keyCol: String, setCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(sort_array(array_distinct(flatten(collect_list(col(setCol))))).as(setCol))

  /** Compact a (key, set) delta store (e.g. the incremental autocomplete
    * sink's appends) to one row per key — set union is idempotent, so
    * unlike the counter store no batch-id bookkeeping is needed.
    */
  def compactSetStore(spark: SparkSession, path: String, keyCol: String,
      setCol: String): Unit = {
    val collapsed = collapseSetDeltas(spark.read.parquet(path), keyCol, setCol)
    swapRewrite(spark, path)(staging => collapsed.write.parquet(staging))
  }

  /** Stage-and-swap rewrite of a store directory: write to `path.compact`,
    * move the live store aside to `path.old`, promote staging, drop the old
    * copy. Every rename result is checked and a crash mid-swap leaves the
    * data recoverable in one of the side dirs instead of deleted.
    *
    * SINGLE-WRITER CONTRACT: the caller must own the store exclusively for
    * the duration — the directory swap is not safe against concurrent
    * appends. A streaming sink committing a micro-batch between the two
    * renames lands its files in the retired copy and they are silently
    * dropped, even though the sink's checkpoint records the batch as
    * written. Quiesce the store's writers first; on a real deployment a
    * table format with atomic commit (and partition-scoped rewrite for
    * closed dates) replaces this directory swap.
    */
  private def swapRewrite(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(path + ".compact")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(staging, true)
    fs.delete(old, true)
    write(staging.toString)
    require(fs.rename(live, old), s"compaction: could not move $live aside to $old")
    require(fs.rename(staging, live),
      s"compaction: could not promote $staging — previous store preserved at $old")
    fs.delete(old, true)
  }

  /** Dependency-window store partitioned by window date. Unlike
    * [[writeTraces]] there is no `filesPerDate` knob: window rows are tiny
    * pre-aggregates (one per edge per minute), so one file per date is the
    * right shape even for a bulk backfill.
    *
    * `batchId` is the idempotence key for [[readDependencyWindows]]'s
    * retry collapse: a RETRIED write (streaming micro-batch replay after a
    * crash) must reuse the id of the attempt it repeats — foreachBatch's
    * epoch id has exactly this property — while a genuine incremental
    * backfill over different data passes a fresh id so its rows count even
    * when the partial sums happen to be value-identical.
    */
  def writeDependencyWindows(windows: DataFrame, path: String, batchId: Long = 0L): Unit =
    windows
      .withColumn("batch_id", lit(batchId))
      .withColumn("window_date", expr(epochDayExpr("window_start_ms", 86400000L)))
      .repartition(col("window_date"))
      .write.partitionBy("window_date").mode(SaveMode.Append).parquet(path)

  /** Range read with window_date pruning, then FULL-ROW dedup: the
    * reference's window store is keyed (a redelivered final overwrites,
    * RocksDB upsert), but parquet appends duplicate it — and the query
    * surface SUMS window rows per edge, so without the dedup a retried
    * micro-batch would double-count its whole window range. The stored
    * `batch_id` (see [[writeDependencyWindows]]) makes the collapse exact:
    * a replayed attempt repeats its id and dedups away, while genuine
    * partial sums from different appends differ in batch_id and both count
    * even when their values coincide. The dedup shuffle runs after
    * pruning — only the queried date range, not the store; `batch_id` is
    * dropped afterwards so the query surface sees the window schema.
    */
  def readDependencyWindows(spark: SparkSession, path: String, endTs: Long,
      lookback: Long): DataFrame =
    spark.read.parquet(path)
      .where(col("window_date").between(utcDate(endTs - lookback), utcDate(endTs)))
      .where(col("window_start_ms").between(endTs - lookback, endTs))
      .dropDuplicates()
      .drop("batch_id")

  /** Point-lookup store: traces bucketed by trace_id, so getTrace/getTraceMany
    * and co-located joins on trace_id skip the shuffle entirely (the analog of
    * the reference's key-hash partition routing,
    * internal/KafkaStoreSingleKeyListCall.java:36-45 — SURVEY §4).
    */
  def writeTracesBucketed(traces: Dataset[Trace], tableName: String, path: String,
      buckets: Int = 32): Unit =
    traces.toDF()
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, "trace_id")
      .sortBy("trace_id")
      .mode(SaveMode.Overwrite)
      .saveAsTable(tableName)

  /** Read the bucketed point-lookup table, (re-)declaring the external table
    * when the session catalog doesn't know it yet: bucketing metadata lives
    * in the catalog, not in the parquet files, so a fresh session must
    * re-register the layout before the scan can prune buckets and skip the
    * merge shuffle. `buckets` must match what [[writeTracesBucketed]] wrote.
    */
  def readTracesBucketed(spark: SparkSession, tableName: String, path: String,
      buckets: Int = 32): DataFrame = {
    // identifier + string-literal escaping: this is a public method over
    // arbitrary names/paths, and an unquoted interpolation would break
    // (or inject into) the DDL on the first quote character
    val tbl = "`" + tableName.replace("`", "``") + "`"
    if (!spark.catalog.tableExists(tableName)) {
      val ddl = org.apache.spark.sql.Encoders.product[Trace].schema.toDDL
      val loc = new java.io.File(path).getAbsolutePath
        .replace("\\", "\\\\").replace("'", "\\'")
      spark.sql(
        s"""CREATE TABLE $tbl ($ddl) USING PARQUET
           |CLUSTERED BY (trace_id) SORTED BY (trace_id) INTO $buckets BUCKETS
           |LOCATION '$loc'""".stripMargin)
    }
    spark.table(tbl)
  }

  /** Retention = drop expired date partitions (cheap metadata+delete op, the
    * reference's store-retention analog, ST6). Returns dropped partition names.
    */
  def dropExpired(spark: SparkSession, path: String, partitionCol: String,
      olderThan: java.time.LocalDate): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$partitionCol="
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith(prefix))
    val expired = dirs.filter { d =>
      val v = d.getPath.getName.stripPrefix(prefix)
      try java.time.LocalDate.parse(v).isBefore(olderThan)
      catch { case _: Exception => false }
    }
    expired.foreach(d => fs.delete(d.getPath, true))
    expired.map(_.getPath.getName)
  }
}
