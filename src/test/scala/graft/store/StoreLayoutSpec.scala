package graft.store

import java.nio.file.Files

import graft.SparkSpec
import graft.model.{Span, Trace}
import org.apache.spark.sql.execution.FileSourceScanExec

class StoreLayoutSpec extends SparkSpec {

  import spark.implicits._

  // two traces a day apart: 2024-01-10 and 2024-01-11 (µs timestamps)
  private val day1Us = 1704844800000000L // 2024-01-10T00:00Z
  private val day2Us = day1Us + 86400L * 1000000L + 41400L * 1000000L // day 2, 11:30
  private def trace(id: String, ts: Long) =
    Trace(id, Seq(Span(trace_id = id, id = id, timestamp = Some(ts))), ts)

  private def freshStore(): String = {
    val dir = Files.createTempDirectory("graft-store").toString + "/traces"
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("000000000000000b", day2Us))).toDF(), dir)
    dir
  }

  test("traces land in date partitions and range reads prune them") {
    val dir = freshStore()
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("trace_date=2024-01-10", "trace_date=2024-01-11"))

    // range fully inside day 2 (trace b at 11:30, window 11:00-12:00)
    val endTs = day2Us / 1000 + 1800_000L
    val read = StoreLayout.readTraces(spark, dir, endTs, 3600_000L)
    // collect through THIS DataFrame's queryExecution so its metrics populate
    assert(read.collect().map(_.getAs[String]("trace_id")).toSeq == Seq("000000000000000b"))
    // partition pruning: the executed scan touched exactly one partition/file
    val scan = read.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty, "expected partition filters on trace_date")
    assert(scan.metrics("numFiles").value == 1, "expected only the day-2 file to be read")
    assert(scan.metrics("numPartitions").value == 1)
  }

  test("bucketed trace store: groupBy/join on trace_id plans without a shuffle") {
    val dir = Files.createTempDirectory("graft-bucket").toString + "/traces_bucketed"
    StoreLayout.writeTracesBucketed(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("000000000000000b", day2Us))),
      "traces_bucketed_test", dir, buckets = 4)
    try {
      val stored = spark.table("traces_bucketed_test")
      // an aggregation keyed by the bucket column needs no Exchange
      val agg = stored.groupBy("trace_id").count()
      agg.collect()
      val exchanges = agg.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 0, "bucketed scan should satisfy the hash requirement")
    } finally spark.sql("DROP TABLE IF EXISTS traces_bucketed_test")
  }

  test("fromStore re-merges at-least-once appends and multi-session partials") {
    val dir = freshStore()
    // simulate a retried micro-batch (duplicate append) and a second partial
    // session of trace a with one extra span
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us),
      graft.model.Trace("000000000000000a",
        Seq(graft.model.Span(trace_id = "000000000000000a", id = "000000000000000b",
          parent_id = Some("000000000000000a"), timestamp = Some(day1Us + 5))),
        day1Us + 5))).toDF(), dir)
    val merged = graft.operators.TraceQueries.fromStore(spark.read.parquet(dir))
      .collect().map(t => t.trace_id -> t).toMap
    assert(merged.size == 2)
    // duplicate span 'a' collapsed, partial span 'b' merged in
    assert(merged("000000000000000a").spans.map(_.id).sorted ==
      Seq("000000000000000a", "000000000000000b"))
    assert(merged("000000000000000a").root_ts == day1Us)
  }

  test("negative timestamps partition with floor semantics and stay readable") {
    // write-side DIV truncation would store a -1µs trace under 1970-01-01
    // while the read side's floorDiv prunes by 1969-12-31 — the row would
    // exist but be unreachable by exactly the range that should find it
    val dir = Files.createTempDirectory("graft-negts").toString + "/traces"
    StoreLayout.writeTraces(spark.createDataset(Seq(
      Trace("000000000000000c",
        Seq(Span(trace_id = "000000000000000c", id = "000000000000000c")), -1L))).toDF(), dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSeq == Seq("trace_date=1969-12-31"))
    val read = StoreLayout.readTraces(spark, dir, endTs = 0L, lookback = 3600000L)
    assert(read.collect().map(_.getAs[String]("trace_id")).toSeq == Seq("000000000000000c"))
  }

  test("compaction collapses re-appends and partials; query answer unchanged") {
    val dir = freshStore()
    // redelivered duplicate of trace a, plus a second-session partial with
    // one extra span — the two row shapes merge-on-read exists for
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us),
      graft.model.Trace("000000000000000a",
        Seq(graft.model.Span(trace_id = "000000000000000a", id = "000000000000000b",
          parent_id = Some("000000000000000a"), timestamp = Some(day1Us + 5))),
        day1Us + 5))).toDF(), dir)
    val beforeAnswer = graft.operators.TraceQueries.fromStore(spark.read.parquet(dir))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts)).sortBy(_._1)

    assert(spark.read.parquet(dir).count() == 4, "seeded with dupes+partials")
    StoreLayout.compactTraces(spark, dir)
    // physically one row per trace now, already canonical — and the
    // production read path (merge-on-read) still returns the same answer
    val afterRaw = spark.read.parquet(dir)
    assert(afterRaw.count() == 2, "one canonical row per (date, trace)")
    val afterAnswer = graft.operators.TraceQueries.fromStore(afterRaw)
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts)).sortBy(_._1)
    assert(afterAnswer.toSeq == beforeAnswer.toSeq)
    // partition layout preserved (rows never cross dates), side dirs gone
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("trace_date=2024-01-10", "trace_date=2024-01-11"))
    assert(!new java.io.File(dir + ".compact").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("window store: re-appended finals don't double dependency counts") {
    val dir = Files.createTempDirectory("graft-depstore").toString + "/deps"
    val day1Ms = day1Us / 1000
    val windows = Seq(
      (day1Ms, "api", "db", 3L, 1L),
      (day1Ms + 60000L, "api", "db", 2L, 0L)
    ).toDF("window_start_ms", "parent", "child", "call_count", "error_count")
    StoreLayout.writeDependencyWindows(windows, dir, batchId = 7L)
    StoreLayout.writeDependencyWindows(windows, dir, batchId = 7L) // retried micro-batch
    assert(spark.read.parquet(dir).count() == 4, "appends really duplicated rows")
    def served() = graft.operators.TraceQueries.dependencies(
      StoreLayout.readDependencyWindows(spark, dir, day1Ms + 120000L, 3600000L),
      endTs = day1Ms + 120000L, lookback = 3600000L).collect()
      .map(r => (r.getAs[String]("parent"), r.getAs[String]("child"),
        r.getAs[Long]("call_count"), r.getAs[Long]("error_count"))).toSeq
    assert(served() == Seq(("api", "db", 5L, 1L)))
    // a genuine backfill with value-identical partial sums carries a fresh
    // batch id — it must COUNT, not collapse as a retry
    StoreLayout.writeDependencyWindows(windows, dir, batchId = 8L)
    assert(served() == Seq(("api", "db", 10L, 2L)))
    // compaction: replayed finals collapse physically, partial sums merge —
    // 6 stored rows (2 windows × 3 appends) → 2, same served answer
    StoreLayout.compactDependencyWindows(spark, dir)
    assert(spark.read.parquet(dir).count() == 2)
    assert(served() == Seq(("api", "db", 10L, 2L)))
    assert(!new java.io.File(dir + ".compact").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("compaction property: random partials+replays never change the served answer") {
    val rnd = new scala.util.Random(42)
    val dir = Files.createTempDirectory("graft-compact-prop").toString + "/traces"
    // 25 traces over a 3-day window; span gaps up to 30h so some traces
    // CROSS MIDNIGHT — their partials land in different date partitions,
    // the one shape compaction deliberately leaves split for merge-on-read
    val traces = (1 to 25).map { i =>
      val id = f"$i%016x"
      val t0 = day1Us + rnd.nextInt(3 * 86400) * 1000000L
      val spans = (0 until 1 + rnd.nextInt(4)).map { j =>
        Span(trace_id = id, id = f"$j%016x",
          parent_id = if (j == 0) None else Some(f"${j - 1}%016x"),
          name = Some(s"op$j"),
          timestamp = Some(t0 + j * rnd.nextInt(30 * 3600) * 1000000L))
      }
      Trace(id, spans, graft.core.Traces.rootTimestamp(spans))
    }
    // store rows: each trace split into 1-3 partial sessions (every partial
    // re-derives ITS OWN root_ts, like the pipeline does), some rows
    // written twice (micro-batch replay)
    val rows = traces.flatMap { t =>
      val parts = t.spans.grouped(1 + rnd.nextInt(3)).toSeq
        .map(ss => Trace(t.trace_id, ss, graft.core.Traces.rootTimestamp(ss)))
      parts ++ parts.filter(_ => rnd.nextBoolean())
    }
    StoreLayout.writeTraces(spark.createDataset(rows).toDF(), dir)

    def fingerprint() = graft.operators.TraceQueries.fromStore(spark.read.parquet(dir))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts))
      .sortBy(_._1).toSeq
    val before = fingerprint()
    StoreLayout.compactTraces(spark, dir)
    assert(fingerprint() == before)
    // physically exactly one row per (date, trace) now
    val expected = rows.map(r => (r.root_ts / 86400000000L, r.trace_id)).distinct.size
    assert(spark.read.parquet(dir).count() == expected)
  }

  private def partFiles(dir: String, part: String): Seq[(String, Long)] =
    new java.io.File(dir, part).listFiles().filter(_.isFile)
      .map(f => (f.getName, f.length)).sortBy(_._1).toSeq

  private def noSideDirs(dir: String): Boolean =
    !new java.io.File(dir).listFiles().exists(f =>
      f.getName.startsWith(".compact-") || f.getName.startsWith(".old-"))

  test("partition-scoped compaction leaves unselected partitions physically untouched") {
    val dir = freshStore()
    // redelivery duplicates in BOTH dates
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("000000000000000b", day2Us))).toDF(), dir)
    val day2Before = partFiles(dir, "trace_date=2024-01-11")
    def answer() = graft.operators.TraceQueries.fromStore(spark.read.parquet(dir))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts)).sortBy(_._1).toSeq
    val before = answer()

    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-10")))
    // the unselected date's files: identical names AND lengths — not rewritten
    assert(partFiles(dir, "trace_date=2024-01-11") == day2Before)
    // the selected date collapsed to one canonical row; day 2 keeps its dupes
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 1)
    assert(spark.read.parquet(dir + "/trace_date=2024-01-11").count() == 2)
    assert(answer() == before)
    assert(noSideDirs(dir), "staging/aside dirs must not survive the swap")
  }

  test("watermark compaction rewrites only closed window dates; answer unchanged") {
    val dir = Files.createTempDirectory("graft-depscoped").toString + "/deps"
    val day1Ms = day1Us / 1000
    val day2Ms = day2Us / 1000
    val windows = Seq(
      (day1Ms, "api", "db", 3L, 1L),
      (day2Ms, "api", "cache", 2L, 0L)
    ).toDF("window_start_ms", "parent", "child", "call_count", "error_count")
    StoreLayout.writeDependencyWindows(windows, dir, batchId = 7L)
    StoreLayout.writeDependencyWindows(windows, dir, batchId = 7L) // retried micro-batch
    val day2Before = partFiles(dir, "window_date=2024-01-11")
    def served() = graft.operators.TraceQueries.dependencies(
      StoreLayout.readDependencyWindows(spark, dir, day2Ms + 3600000L, 3 * 86400000L),
      endTs = day2Ms + 3600000L, lookback = 3 * 86400000L).collect()
      .map(r => (r.getAs[String]("parent"), r.getAs[String]("child"),
        r.getAs[Long]("call_count"), r.getAs[Long]("error_count"))).toSeq
    val before = served()

    StoreLayout.compactDependencyWindowsBefore(spark, dir,
      java.time.LocalDate.parse("2024-01-11"))
    assert(partFiles(dir, "window_date=2024-01-11") == day2Before)
    assert(spark.read.parquet(dir + "/window_date=2024-01-10").count() == 1)
    assert(served() == before)
    assert(noSideDirs(dir))
  }

  test("retention + scoped compaction: expired dates gone, served answer unchanged") {
    val dir = freshStore()
    // duplicate appends on the live dates, plus an EXPIRED distinct-id trace
    // nine days earlier — outside any query window, so dropping it must not
    // change what the store serves
    val expiredUs = day1Us - 9L * 86400L * 1000000L
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("00000000000000ee", expiredUs))).toDF(), dir)
    val endTs = day2Us / 1000 + 3600000L
    def answer() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readTraces(spark, dir, endTs, 3 * 86400000L))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted)).sortBy(_._1).toSeq
    val before = answer()
    assert(before.map(_._1) == Seq("000000000000000a", "000000000000000b"))

    val dropped = StoreLayout.dropExpired(spark, dir, "trace_date",
      java.time.LocalDate.parse("2024-01-10"))
    assert(dropped == Seq("trace_date=2024-01-01"))
    StoreLayout.compactTracesBefore(spark, dir, java.time.LocalDate.parse("2024-01-11"))
    assert(!new java.io.File(dir, "trace_date=2024-01-01").exists())
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 1)
    assert(answer() == before)
    assert(noSideDirs(dir))
  }

  test("scoped compaction property: any date subset preserves answers and untouched files") {
    val rnd = new scala.util.Random(7)
    val dir = Files.createTempDirectory("graft-subset-prop").toString + "/traces"
    // 20 traces across 4 dates, partials + replays like the main property test
    val rows = (1 to 20).flatMap { i =>
      val id = f"$i%016x"
      val t0 = day1Us + rnd.nextInt(4 * 86400) * 1000000L
      val spans = (0 until 1 + rnd.nextInt(3)).map(j =>
        Span(trace_id = id, id = f"$j%016x", timestamp = Some(t0 + j * 1000000L)))
      val parts = spans.grouped(1 + rnd.nextInt(2)).toSeq
        .map(ss => Trace(id, ss, graft.core.Traces.rootTimestamp(ss)))
      parts ++ parts.filter(_ => rnd.nextBoolean())
    }
    StoreLayout.writeTraces(spark.createDataset(rows).toDF(), dir)
    def fingerprint() = graft.operators.TraceQueries.fromStore(spark.read.parquet(dir))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts))
      .sortBy(_._1).toSeq
    val before = fingerprint()
    val allDates = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(f => java.time.LocalDate.parse(f.getName.stripPrefix("trace_date="))).sorted
    // three successive randomly-chosen subsets (some dates compacted twice,
    // some never): the answer must be invariant at every intermediate state,
    // and every unselected date's files must stay physically identical
    (1 to 3).foreach { _ =>
      val subset = allDates.filter(_ => rnd.nextBoolean()).toSeq
      val untouchedBefore = allDates.filterNot(subset.contains)
        .map(d => d -> partFiles(dir, s"trace_date=$d")).toMap
      StoreLayout.compactTracePartitions(spark, dir, subset)
      untouchedBefore.foreach { case (d, files) =>
        assert(partFiles(dir, s"trace_date=$d") == files, s"$d was rewritten unselected")
      }
      assert(fingerprint() == before)
      assert(noSideDirs(dir))
    }
  }

  test("scoped compaction self-heals a crash that left the partition in its aside dir") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe so compaction has work
    // simulate a run that died between its two renames: the live partition
    // moved aside, nothing promoted — readers see no 2024-01-10 data at all
    val live = new java.io.File(dir, "trace_date=2024-01-10")
    val aside = new java.io.File(dir, ".old-trace_date=2024-01-10")
    assert(live.renameTo(aside))
    assert(spark.read.parquet(dir).where("trace_date = DATE'2024-01-10'").count() == 0)

    // the WHOLE-STORE form must find the crashed date (listed only via its
    // aside dir), restore it, and compact it like any other partition
    StoreLayout.compactTraces(spark, dir)
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 1)
    val served = graft.operators.TraceQueries.fromStore(spark.read.parquet(dir))
      .collect().map(_.trace_id).sorted
    assert(served.toSeq == Seq("000000000000000a", "000000000000000b"))
    assert(noSideDirs(dir))
  }

  test("append into a leased date fails fast; untouched dates append freely") {
    val dir = freshStore()
    // what a compactor holds while staging/swapping 2024-01-10
    val lease = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
    assert(lease.createNewFile())
    val e = intercept[IllegalStateException] {
      StoreLayout.writeTraces(spark.createDataset(Seq(
        trace("00000000000000aa", day1Us))).toDF(), dir)
    }
    assert(e.getMessage.contains("2024-01-10"))
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 1,
      "refused append must not have landed anything")
    // a batch touching only the UNleased date goes through
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("00000000000000bb", day2Us))).toDF(), dir)
    assert(spark.read.parquet(dir + "/trace_date=2024-01-11").count() == 2)
    assert(lease.delete())
    // window-store twin of the same contract
    val wdir = Files.createTempDirectory("graft-deplease").toString + "/deps"
    val day1Ms = day1Us / 1000
    val w = Seq((day1Ms, "api", "db", 1L, 0L))
      .toDF("window_start_ms", "parent", "child", "call_count", "error_count")
    StoreLayout.writeDependencyWindows(w, wdir)
    assert(new java.io.File(wdir, ".compacting-window_date=2024-01-10").createNewFile())
    intercept[IllegalStateException] { StoreLayout.writeDependencyWindows(w, wdir, 1L) }
  }

  test("second concurrent compactor of a leased date fails fast, store untouched") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe = work to do
    val lease = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
    assert(lease.createNewFile()) // fresh → owned by a live compactor
    intercept[IllegalStateException] {
      StoreLayout.compactTracePartitions(spark, dir,
        Seq(java.time.LocalDate.parse("2024-01-10")))
    }
    // nothing staged or swapped: the dupes are still there, lease still held
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 2)
    assert(lease.exists())
    assert(!new java.io.File(dir, ".compact-trace_date=2024-01-10").exists())
    assert(lease.delete())
  }

  test("stale lease from a crashed compactor is reclaimed and released") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir)
    val lease = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
    assert(lease.createNewFile())
    // older than the 30-min TTL → abandoned by a crashed run
    assert(lease.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000))
    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-10")))
    assert(!lease.exists(), "reclaimed lease must be released after the swap")
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 1)
  }

  test("set-store delta append fails fast under the compaction lease") {
    val dir = Files.createTempDirectory("graft-setlease").toString + "/auto"
    val fields = Seq(("svc", "get", null: String, Map("k" -> "v1")))
      .toDF("service", "name", "remote_service", "tags")
    graft.streaming.StreamingPipeline.appendAutocompleteDelta(fields, Seq("k"), dir)
    val lease = new java.io.File(dir + ".compacting")
    assert(lease.createNewFile())
    intercept[IllegalStateException] {
      graft.streaming.StreamingPipeline.appendAutocompleteDelta(fields, Seq("k"), dir)
    }
    assert(lease.delete())
    // with the lease gone both the append and the compactor run; the
    // compactor acquires and RELEASES its own lease
    graft.streaming.StreamingPipeline.appendAutocompleteDelta(fields, Seq("k"), dir)
    StoreLayout.compactSetStore(spark, dir, "tag_key", "values")
    assert(!lease.exists())
    val served = graft.streaming.StreamingPipeline.readAutocompleteStore(spark, dir)
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(served.toSeq == Seq(("k", Seq("v1"))))
  }

  test("unleased .compact- staging orphan of an unselected date is swept") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000b", day2Us))).toDF(), dir) // day-2 dupe = work
    // a run that crashed on 2024-01-10 BEFORE any rename: live intact,
    // partial staging left behind, lease long gone (released or pre-lease)
    val orphan = new java.io.File(dir, ".compact-trace_date=2024-01-10")
    assert(orphan.mkdir())
    assert(new java.io.File(orphan, "part-junk.parquet").createNewFile())
    val day1Before = partFiles(dir, "trace_date=2024-01-10")
    // a pass that does NOT select 2024-01-10 still sweeps the orphan
    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-11")))
    assert(!orphan.exists(), "stale staging dir must not linger")
    assert(partFiles(dir, "trace_date=2024-01-10") == day1Before)
    assert(spark.read.parquet(dir + "/trace_date=2024-01-11").count() == 1)
    assert(noSideDirs(dir))
  }

  test("a failed partition rewrite aborts cleanly: store intact, lease released") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("000000000000000b", day2Us))).toDF(), dir)
    // a corrupt parquet file (e.g. a torn upload) lands in day 1: the
    // rewrite's read job fails BEFORE any rename — the clean-abort path
    val corrupt = new java.io.File(dir, "trace_date=2024-01-10/part-corrupt.parquet")
    val out = new java.io.FileOutputStream(corrupt)
    try out.write("this is not parquet".getBytes("UTF-8")) finally out.close()
    val day1Before = partFiles(dir, "trace_date=2024-01-10")
    intercept[Throwable] {
      StoreLayout.compactTracePartitions(spark, dir, Seq(
        java.time.LocalDate.parse("2024-01-10"), java.time.LocalDate.parse("2024-01-11")))
    }
    // the failed date is byte-identical (nothing renamed), its staging is
    // deleted, and NO lease survives — writers may resume immediately
    assert(partFiles(dir, "trace_date=2024-01-10") == day1Before)
    assert(noSideDirs(dir), "clean abort must sweep its staging dir")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".compacting-")),
      "no lease may survive a clean abort (or a sibling date's success)")
    // the healthy sibling date is still a valid readable partition
    assert(spark.read.parquet(dir + "/trace_date=2024-01-11").count() >= 1)
  }

  test("destructive crash state (aside dir + stale lease) heals in one pass") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe = work
    // a run that died BETWEEN its two renames keeps its lease by design —
    // so the realistic crash state is aside dir AND lease together
    val live = new java.io.File(dir, "trace_date=2024-01-10")
    assert(live.renameTo(new java.io.File(dir, ".old-trace_date=2024-01-10")))
    val lease = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
    assert(lease.createNewFile())
    assert(lease.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000))
    StoreLayout.compactTraces(spark, dir)
    // fully healed: restored, compacted, lease released, side dirs gone
    assert(spark.read.parquet(dir + "/trace_date=2024-01-10").count() == 1)
    assert(!lease.exists())
    assert(noSideDirs(dir))
  }

  test("a FRESH lease protects an in-flight swap's aside state from recovery") {
    val dir = freshStore()
    // mid-swap observable state of a LIVE concurrent compactor: live moved
    // aside, lease fresh — a second pass must not "recover" under it
    val live = new java.io.File(dir, "trace_date=2024-01-10")
    val aside = new java.io.File(dir, ".old-trace_date=2024-01-10")
    assert(live.renameTo(aside))
    val lease = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
    assert(lease.createNewFile())
    intercept[IllegalStateException] { StoreLayout.compactTraces(spark, dir) }
    assert(aside.exists() && !live.exists(), "in-flight swap state must be untouched")
    assert(lease.exists())
    assert(lease.delete())
  }

  test("retention drops expired partitions only") {
    val dir = freshStore()
    val dropped = StoreLayout.dropExpired(spark, dir, "trace_date",
      java.time.LocalDate.parse("2024-01-11"))
    assert(dropped == Seq("trace_date=2024-01-10"))
    val left = spark.read.parquet(dir).select("trace_id").as[String].collect()
    assert(left.toSeq == Seq("000000000000000b"))
  }
}
