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
  def writeTraces(traces: DataFrame, path: String, filesPerDate: Int = 1): Unit = {
    val withDate = traces.select(col("trace_id"), col("spans"), col("root_ts"))
      // UTC epoch-day arithmetic, NOT to_date(): partition assignment must
      // not depend on the writer session's timezone or readers in another
      // zone silently prune the wrong partitions. FLOOR division (SQL DIV
      // truncates toward zero): a negative timestamp must land on the same
      // 1969-12-31 date the read side's Math.floorDiv prunes by, or the row
      // becomes unreachable
      .withColumn("trace_date", expr(epochDayExpr("root_ts", 86400000000L)))
    assertDatesUnleased(withDate, "trace_date", path)
    withDate
      .repartition(col("trace_date"), pmod(xxhash64(col("trace_id")), lit(filesPerDate)))
      .write.partitionBy("trace_date").mode(SaveMode.Append).parquet(path)
  }

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
    * Delegates to [[compactTracePartitions]] over every present date — each
    * partition is staged and swapped independently (checked renames,
    * dot-prefixed side dirs invisible to readers), so this whole-store form
    * is just "all dates at once"; production runs [[compactTracesBefore]] so
    * only closed dates are rewritten. No counts are computed — that would
    * cost two extra full-store scans; callers who want them can count the
    * parquet dirs themselves.
    */
  def compactTraces(spark: SparkSession, path: String, filesPerDate: Int = 1): Unit =
    compactTracePartitions(spark, path, listPartitionDates(spark, path, "trace_date"),
      filesPerDate)

  /** Closed-date watermark variant: compact only `trace_date` partitions
    * strictly before `before` (the maintenance cadence at scale — open dates
    * still receiving appends are left alone, so the single-writer contract
    * only has to quiesce writers of already-closed dates).
    */
  def compactTracesBefore(spark: SparkSession, path: String,
      before: java.time.LocalDate, filesPerDate: Int = 1): Unit =
    compactTracePartitions(spark, path,
      listPartitionDates(spark, path, "trace_date").filter(_.isBefore(before)), filesPerDate)

  /** Partition-scoped compaction: rewrite ONLY the listed `trace_date=`
    * partitions, one checked stage-and-swap per partition — every other
    * partition's files are physically untouched (StoreLayoutSpec pins this
    * by file name + length). Rows merge within (date, trace_id) — see the
    * class doc above — so a per-date rewrite is exactly the whole-store pass
    * restricted, and a 100 TB store compacts incrementally, date by closed
    * date, instead of rewriting everything per maintenance cycle (the analog
    * of the reference's continuous incremental RocksDB compaction,
    * streams/TraceStorageTopology.java:108-115). Dates with no partition
    * directory are skipped.
    */
  def compactTracePartitions(spark: SparkSession, path: String,
      dates: Seq[java.time.LocalDate], filesPerDate: Int = 1): Unit = {
    import spark.implicits._
    forEachPartitionDir(spark, path, "trace_date", dates) { (partDir, staging) =>
      val merged = spark.read.parquet(partDir)
        .select(col("trace_id"), col("spans"), col("root_ts")).as[Trace]
        .groupByKey(_.trace_id)
        .mapGroups((id: String, it: Iterator[Trace]) =>
          graft.core.Traces.mergeRows(id, it.toSeq))
      // same per-date file shape as writeTraces: ≈ filesPerDate files,
      // id-hash-clustered (the partition value lives in the dir name, not
      // the files, so the partition column is not re-written)
      merged.toDF().repartition(filesPerDate, col("trace_id")).write.parquet(staging)
    }
  }

  /** Compact the dependency-window store: drop replayed finals (full-row
    * duplicates under one batch_id) then merge genuine partial sums into one
    * row per (window, edge) — after which a range read carries no redundant
    * rows to dedup. Compacted rows take batch_id −1 (a generation marker no
    * real foreachBatch epoch uses). Delegates to the partition-scoped pass
    * over every date; production runs [[compactDependencyWindowsBefore]] on
    * closed dates only.
    */
  def compactDependencyWindows(spark: SparkSession, path: String): Unit =
    compactDependencyPartitions(spark, path,
      listPartitionDates(spark, path, "window_date"))

  /** Closed-date watermark variant of [[compactDependencyWindows]]. */
  def compactDependencyWindowsBefore(spark: SparkSession, path: String,
      before: java.time.LocalDate): Unit =
    compactDependencyPartitions(spark, path,
      listPartitionDates(spark, path, "window_date").filter(_.isBefore(before)))

  /** Partition-scoped window compaction ([[compactTracePartitions]]'s twin):
    * a window's date is a function of window_start_ms, so dedup + re-sum
    * never cross partitions and the per-date rewrite equals the whole-store
    * pass restricted. Untouched partitions' files stay physically identical.
    */
  def compactDependencyPartitions(spark: SparkSession, path: String,
      dates: Seq[java.time.LocalDate]): Unit =
    forEachPartitionDir(spark, path, "window_date", dates) { (partDir, staging) =>
      spark.read.parquet(partDir)
        .dropDuplicates()
        .groupBy("window_start_ms", "parent", "child")
        .agg(sum("call_count").as("call_count"), sum("error_count").as("error_count"))
        .withColumn("batch_id", lit(-1L))
        .coalesce(1).write.parquet(staging)
    }

  /** Dates of the `col=` partition directories present under `path`
    * (non-date values are ignored rather than thrown on — foreign dirs are
    * not this store's partitions). Dates surviving only as `.old-` aside
    * dirs — a compaction run that crashed between its renames — are listed
    * too, so the whole-store/watermark passes feed them to the recovery in
    * [[forEachPartitionDir]] instead of skipping the date forever.
    */
  private def listPartitionDates(spark: SparkSession, path: String,
      partitionCol: String): Seq[java.time.LocalDate] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .map(n => if (n.startsWith(s".old-$partitionCol=")) n.stripPrefix(".old-") else n)
      .filter(_.startsWith(s"$partitionCol="))
      .flatMap { name =>
        try Some(java.time.LocalDate.parse(name.stripPrefix(s"$partitionCol=")))
        catch { case _: Exception => None }
      }
      .distinct
  }

  /** Compaction-lease TTL: a lease older than this is treated as abandoned
    * by a crashed compactor and reclaimed by the next compaction pass (after
    * the usual `.old-` crash recovery). Writers never reclaim — a stale
    * lease means the partition may be mid-swap on disk, so appends stay
    * refused (fail-fast) until a compaction pass heals and releases it.
    */
  private val LeaseTtlMs: Long = 30L * 60 * 1000

  private def leasePath(path: String, partName: String) =
    new org.apache.hadoop.fs.Path(path, s".compacting-$partName")

  /** Atomically acquire a compaction lease (a dot-prefixed marker file,
    * invisible to Spark's listing). A FRESH existing lease means another
    * compactor owns the partition → fail fast; a STALE one (crashed run,
    * see [[LeaseTtlMs]]) is reclaimed. `create(overwrite = false)` makes the
    * final claim atomic — a concurrent acquirer loses with an exception.
    */
  private def acquireLease(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(lease)) {
      val ageMs = System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime
      if (ageMs <= LeaseTtlMs)
        throw new IllegalStateException(
          s"compaction refused: $lease is held by a concurrent compactor (age ${ageMs}ms)")
      fs.delete(lease, false) // stale — crashed owner; reclaim
    }
    try fs.create(lease, false).close()
    catch { case e: java.io.IOException =>
      throw new IllegalStateException(
        s"compaction refused: lost the race to acquire $lease", e)
    }
  }

  /** Dates (as `yyyy-MM-dd` strings) currently under a compaction lease in
    * `path` — one cheap directory listing, so the no-compaction-running
    * common case costs writers nothing beyond it.
    */
  private def leasedDates(fs: org.apache.hadoop.fs.FileSystem, path: String,
      partitionCol: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val prefix = s".compacting-$partitionCol="
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).iterator
      .map(_.getPath.getName).filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix)).toSet
  }

  /** Fail-fast half of the single-writer contract: refuse an append whose
    * rows touch a partition currently under a compaction lease — without the
    * check the append's files land in the retired `.old-` copy after the
    * swap's rename and are silently dropped. Only when leases exist at all
    * does this cost a (micro-batch-sized) distinct scan of the append's
    * partition column; untouched dates append freely.
    *
    * Honest residual: this is check-then-write, so a compactor acquiring
    * the lease INSIDE the gap between this check and the append's commit
    * can still orphan it — the lease shrinks the loss window from "the
    * whole compaction" to that gap and makes every steady-state overlap
    * fail fast, which is what a marker file on a filesystem can give;
    * closing the gap entirely takes an atomic-commit table format.
    */
  private def assertDatesUnleased(withDate: DataFrame, partitionCol: String,
      path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      withDate.sparkSession.sparkContext.hadoopConfiguration)
    val leased = leasedDates(fs, path, partitionCol)
    if (leased.nonEmpty) {
      val hit = withDate.select(partitionCol).distinct().collect()
        .map(_.get(0).toString).toSet.intersect(leased)
      if (hit.nonEmpty) throw new IllegalStateException(
        s"append refused: $partitionCol partitions under compaction in $path: " +
          s"${hit.toSeq.sorted.mkString(", ")} — retry after the lease is released")
    }
  }

  /** Fail-fast check for UNpartitioned (whole-dir) stores: refuse an append
    * while `<path>.compacting` (the lease [[compactSetStore]] holds over its
    * stage-and-swap) exists.
    */
  def assertNotCompacting(spark: SparkSession, path: String): Unit = {
    val lease = new org.apache.hadoop.fs.Path(path + ".compacting")
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lease)) throw new IllegalStateException(
      s"append refused: $path is under compaction ($lease present) — " +
        "retry after the lease is released")
  }

  /** Per-partition stage-and-swap: `write(liveDir, stagingDir)` stages the
    * rewrite of one partition, then the swap promotes it with checked
    * renames. Staging/aside dirs are DOT-prefixED siblings inside the store
    * (`.compact-…`, `.old-…`): Spark's file listing ignores dot-prefixed
    * names, so a reader never sees a half-written rewrite as a partition.
    * A crash mid-swap leaves the data recoverable in one of the side dirs,
    * invisible to queries, instead of deleted.
    *
    * Single-writer contract — now CHECKED, not trust-me: each selected
    * partition is leased (`.compacting-<part>` marker) for the duration;
    * [[writeTraces]]/[[writeDependencyWindows]] appends touching a leased
    * date fail fast instead of silently landing in the retired copy, and a
    * second compactor of the same date fails fast in [[acquireLease]].
    * Untouched dates append freely.
    *
    * READER caveat (unchanged by the lease): between the swap's two renames
    * a partition is briefly ABSENT — a query listing files in that window
    * silently serves an answer without that date, and concurrent
    * per-partition swaps widen the exposure to several dates. Acceptable for
    * a maintenance pass over CLOSED dates on mostly-historical queries; a
    * deployment that cannot tolerate it quiesces readers too, or replaces
    * the directory swap with a table format whose commit is atomic
    * (Iceberg/Delta-style metadata pointer flip).
    */
  private def forEachPartitionDir(spark: SparkSession, path: String,
      partitionCol: String, dates: Seq[java.time.LocalDate])
      (write: (String, String) => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val selected = dates.distinct.map(d => s"$partitionCol=$d")
    // stale-staging sweep: a crash before any rename leaves `.compact-<part>`
    // behind; re-selecting the date cleans it, but a date never re-selected
    // (e.g. dropped by retention) would leak the staging dir forever. Sweep
    // this store's unselected, UNleased `.compact-` orphans here — a leased
    // one belongs to a live concurrent compactor (or to a crash the lease
    // TTL will hand back to a later pass, which then re-stages over it).
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(s".compact-$partitionCol=")) {
        val part = n.stripPrefix(".compact-")
        if (!selected.contains(part) && !fs.exists(leasePath(path, part)))
          fs.delete(st.getPath, true)
      }
    }
    // lease every date that has data (live or crashed-aside) BEFORE any
    // work: a concurrent compactor of any selected date aborts the whole
    // pass here, with nothing staged and the already-acquired leases
    // released (store untouched)
    val acquired = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    val present = try {
      dates.distinct.filter { d =>
        val partName = s"$partitionCol=$d"
        val live = new org.apache.hadoop.fs.Path(path, partName)
        val old = new org.apache.hadoop.fs.Path(path, s".old-$partName")
        val hasData = fs.exists(live) || fs.exists(old)
        if (hasData) {
          val lp = leasePath(path, partName)
          acquireLease(fs, lp)
          acquired += lp
          // crash recovery: a run that died between its two renames left the
          // partition's ONLY copy in the aside dir (invisible to readers) —
          // restore it (under the fresh lease) so the pass self-heals instead
          // of skipping the date forever; a stale staged copy is re-staged
          // over below
          if (!fs.exists(live) && fs.exists(old))
            require(fs.rename(old, live),
              s"compaction recovery: could not restore $old to $live")
        }
        hasData
      }
    } catch { case e: Throwable =>
      acquired.foreach(fs.delete(_, false))
      throw e
    }
    if (present.isEmpty) return
    // partitions rewrite independently (disjoint dirs, disjoint rows), so a
    // maintenance cycle over many closed dates runs them CONCURRENTLY — a
    // bounded pool of Spark jobs per store, not one serial job per date
    // (30 closed dates would otherwise pay 30 sequential job latencies; job
    // submission is thread-safe and each job is small by construction)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, present.size))
    try {
      val futures = present.map { d =>
        val partName = s"$partitionCol=$d"
        val live = new org.apache.hadoop.fs.Path(path, partName)
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = leasedSwap(fs, live,
            staging = new org.apache.hadoop.fs.Path(path, s".compact-$partName"),
            old = new org.apache.hadoop.fs.Path(path, s".old-$partName"),
            lease = leasePath(path, partName))(
            staging => write(live.toString, staging))
        })
      }
      // surface the FIRST failure with its own cause; cancel the queued
      // rest — and (finally, below) WAIT for in-flight swaps to finish
      // before propagating, so no orphaned thread keeps renaming inside a
      // store whose caller already observed failure (and may delete and
      // rebuild it). Cancelled-before-start dates still hold their leases:
      // release them, their partitions were never touched.
      var firstFailure: Throwable = null
      (present zip futures).foreach { case (d, f) =>
        if (firstFailure != null) {
          if (f.cancel(false))
            fs.delete(leasePath(path, s"$partitionCol=$d"), false)
        } else try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException => firstFailure = e.getCause
          case e: Throwable => firstFailure = e
        }
      }
      if (firstFailure != null) throw firstFailure
    } finally {
      pool.shutdown()
      // never proceed with a swap thread still live (ADVICE r8): loop the
      // wait — the caller observing a failure may delete and rebuild the
      // store, and an orphaned thread mid-rename would corrupt it
      while (!pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS))
        System.err.println(s"[compaction] still waiting on in-flight partition swaps in $path")
    }
  }

  /** [[swapDirs]] plus lease lifecycle: release the lease on success AND on
    * a clean abort (failure before any rename — the live partition is
    * untouched, so writers may resume); KEEP it after a destructive failure
    * (live already moved aside) so appends stay refused until the next
    * compaction pass recovers the partition and reclaims the stale lease.
    */
  private def leasedSwap(fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path, staging: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path, lease: org.apache.hadoop.fs.Path)
      (write: String => Unit): Unit = {
    var destructive = false
    try {
      fs.delete(staging, true)
      fs.delete(old, true)
      write(staging.toString)
      if (!fs.rename(live, old))
        throw new IllegalStateException(s"compaction: could not move $live aside to $old")
      destructive = true
      require(fs.rename(staging, live),
        s"compaction: could not promote $staging — previous store preserved at $old")
      fs.delete(old, true)
      fs.delete(lease, false)
    } catch { case e: Throwable =>
      if (!destructive) { fs.delete(staging, true); fs.delete(lease, false) }
      throw e
    }
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

  /** Stage-and-swap rewrite of a whole store directory: write to
    * `path.compact`, move the live store aside to `path.old`, promote
    * staging, drop the old copy. Every rename result is checked and a crash
    * mid-swap leaves the data recoverable in one of the side dirs instead of
    * deleted.
    *
    * Single-writer contract — CHECKED via the `<path>.compacting` lease held
    * for the duration: a delta append between the two renames would land its
    * files in the retired copy and be silently dropped even though the
    * sink's checkpoint records the batch as written, so
    * [[assertNotCompacting]] (called by the append paths, e.g.
    * `StreamingPipeline.appendAutocompleteDelta`) refuses it while the lease
    * exists, and a second concurrent compactor fails fast in
    * [[acquireLease]]. Readers see the same brief-absence window as the
    * per-partition swap (see [[forEachPartitionDir]]); a table format with
    * atomic commit replaces this directory swap on a deployment that cannot
    * tolerate it.
    */
  private def swapRewrite(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(path + ".compacting")
    acquireLease(fs, lease)
    leasedSwap(fs, live, new org.apache.hadoop.fs.Path(path + ".compact"),
      new org.apache.hadoop.fs.Path(path + ".old"), lease)(write)
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
  def writeDependencyWindows(windows: DataFrame, path: String, batchId: Long = 0L): Unit = {
    val withDate = windows
      .withColumn("batch_id", lit(batchId))
      .withColumn("window_date", expr(epochDayExpr("window_start_ms", 86400000L)))
    assertDatesUnleased(withDate, "window_date", path)
    withDate
      .repartition(col("window_date"))
      .write.partitionBy("window_date").mode(SaveMode.Append).parquet(path)
  }

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
    // the SAME quoted identifier everywhere: tableExists parses its argument
    // too, and feeding it the raw name while DDL gets the escaped one would
    // miss the table (→ CREATE collision) exactly when escaping matters
    if (!spark.catalog.tableExists(tbl)) {
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
