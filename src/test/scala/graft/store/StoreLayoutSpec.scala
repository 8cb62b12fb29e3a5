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

  /** The store's physical row view through the production resolver (what a
    * full scan serves — compacted generations + unabsorbed loose files).
    */
  private def physicalRows(dir: String): Long =
    StoreLayout.readAll(spark, dir, "trace_date").count()

  private def partFiles(dir: String, part: String): Seq[(String, Long)] =
    new java.io.File(dir, part).listFiles().filter(_.isFile)
      .map(f => (f.getName, f.length)).sortBy(_._1).toSeq

  /** Loose (visible) data files of a partition — what a plain listing sees. */
  private def looseFiles(dir: String, part: String): Seq[String] =
    new java.io.File(dir, part).listFiles().filter(_.isFile).map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).sorted.toSeq

  private def genDirs(dir: String, part: String): Seq[String] =
    new java.io.File(dir, part).listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith(".gen-")).sorted.toSeq

  private def pointers(dir: String, part: String): Seq[String] =
    new java.io.File(dir, part).listFiles().filter(_.isFile).map(_.getName)
      .filter(_.startsWith("_current-")).sorted.toSeq

  private def noStageOrphans(dir: String): Boolean =
    !new java.io.File(dir).listFiles().filter(_.isDirectory).exists(p =>
      Option(p.listFiles()).exists(_.exists(_.getName.startsWith(".genstage-"))))

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
    def read() = StoreLayout.readTraces(spark, dir, endTs = 0L, lookback = 3600000L)
      .collect().map(_.getAs[String]("trace_id")).toSeq
    assert(read() == Seq("000000000000000c"))
    // the generation resolver recovers the pre-epoch date from the file
    // path too: compact (write a dupe first so there is work) and re-read
    StoreLayout.writeTraces(spark.createDataset(Seq(
      Trace("000000000000000c",
        Seq(Span(trace_id = "000000000000000c", id = "000000000000000c")), -1L))).toDF(), dir)
    StoreLayout.compactTraces(spark, dir)
    assert(genDirs(dir, "trace_date=1969-12-31").size == 1)
    assert(read() == Seq("000000000000000c"))
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
    def answer() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts)).sortBy(_._1)
    val beforeAnswer = answer()

    assert(physicalRows(dir) == 4, "seeded with dupes+partials")
    StoreLayout.compactTraces(spark, dir)
    // the committed generation serves one canonical row per (date, trace);
    // the absorbed loose files stay on disk for one cycle of grace but are
    // manifest-excluded from every read
    assert(physicalRows(dir) == 2, "one canonical row per (date, trace)")
    assert(genDirs(dir, "trace_date=2024-01-10").size == 1)
    assert(pointers(dir, "trace_date=2024-01-10") == Seq("_current-000001"))
    assert(looseFiles(dir, "trace_date=2024-01-10").nonEmpty,
      "absorbed loose files keep their one-cycle grace")
    assert(answer().toSeq == beforeAnswer.toSeq)
    // the NEXT pass runs the deferred cleanup and converges: absorbed loose
    // deleted, single generation + pointer remain, nothing new staged
    StoreLayout.compactTraces(spark, dir)
    assert(looseFiles(dir, "trace_date=2024-01-10").isEmpty, "grace expired: loose absorbed files cleaned")
    assert(genDirs(dir, "trace_date=2024-01-10") == Seq(".gen-000001"))
    assert(pointers(dir, "trace_date=2024-01-10") == Seq("_current-000001"))
    assert(physicalRows(dir) == 2)
    assert(answer().toSeq == beforeAnswer.toSeq)
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
    assert(StoreLayout.readAll(spark, dir, "window_date").count() == 4,
      "appends really duplicated rows")
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
    // compaction: replayed finals collapse physically but BATCH GRANULARITY
    // is kept — 6 stored rows (2 windows × 3 appends) → 4 (2 windows ×
    // batches {7, 8}); cross-batch pre-summing would destroy the
    // idempotence key a crash-replayed batch needs (see the replay test
    // below). This also pins that the absorbed loose files — still on disk
    // in their grace cycle — are manifest-excluded from the read
    StoreLayout.compactDependencyWindows(spark, dir)
    assert(looseFiles(dir, "window_date=2024-01-10").nonEmpty, "grace: absorbed files still on disk")
    assert(StoreLayout.readAll(spark, dir, "window_date").count() == 4)
    assert(served() == Seq(("api", "db", 10L, 2L)))
    // THE crash-replay regression (the r16 review finding): batch 7 was
    // absorbed into the generation above; a checkpoint that never committed
    // now replays batch 7 after restart as a fresh loose file. Its rows are
    // bit-identical to the generation's batch-7 rows, so the read-side
    // full-row dedup collapses them — under the old summed batch_id=-1
    // rewrite there was nothing identical left and every edge in the batch
    // double-counted permanently
    StoreLayout.writeDependencyWindows(windows, dir, batchId = 7L)
    assert(served() == Seq(("api", "db", 10L, 2L)),
      "a micro-batch replayed AFTER its rows were compacted must not double count")
    // and the next compaction keeps the collapse (nothing baked in)
    StoreLayout.compactDependencyWindows(spark, dir)
    assert(served() == Seq(("api", "db", 10L, 2L)))
    assert(StoreLayout.readAll(spark, dir, "window_date").count() == 4)
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

    def fingerprint() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts))
      .sortBy(_._1).toSeq
    val before = fingerprint()
    StoreLayout.compactTraces(spark, dir)
    assert(fingerprint() == before)
    // physically exactly one row per (date, trace) now
    val expected = rows.map(r => (r.root_ts / 86400000000L, r.trace_id)).distinct.size
    assert(physicalRows(dir) == expected)
  }

  test("partition-scoped compaction leaves unselected partitions physically untouched") {
    val dir = freshStore()
    // redelivery duplicates in BOTH dates
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("000000000000000b", day2Us))).toDF(), dir)
    val day2Before = partFiles(dir, "trace_date=2024-01-11")
    def answer() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts)).sortBy(_._1).toSeq
    val before = answer()

    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-10")))
    // the unselected date's files: identical names AND lengths — not rewritten
    assert(partFiles(dir, "trace_date=2024-01-11") == day2Before)
    assert(genDirs(dir, "trace_date=2024-01-11").isEmpty)
    // the selected date serves one canonical row; day 2 keeps its dupes
    val perDate = StoreLayout.readAll(spark, dir, "trace_date")
      .groupBy("trace_date").count().collect()
      .map(r => (r.get(0).toString, r.getLong(1))).toMap
    assert(perDate == Map("2024-01-10" -> 1L, "2024-01-11" -> 2L))
    assert(answer() == before)
    assert(noStageOrphans(dir), "staging dirs must not survive the commit")
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
    assert(StoreLayout.readAll(spark, dir, "window_date")
      .where("window_date = DATE'2024-01-10'").count() == 1)
    assert(served() == before)
    assert(noStageOrphans(dir))
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
    assert(StoreLayout.readAll(spark, dir, "trace_date")
      .where("trace_date = DATE'2024-01-10'").count() == 1)
    assert(answer() == before)
    assert(noStageOrphans(dir))
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
    def fingerprint() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted, t.root_ts))
      .sortBy(_._1).toSeq
    val before = fingerprint()
    val allDates = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(f => java.time.LocalDate.parse(f.getName.stripPrefix("trace_date="))).sorted
    // three successive randomly-chosen subsets (some dates compacted twice,
    // some never): the answer must be invariant at every intermediate state
    // — including re-compaction of an already-committed generation and the
    // deferred cleanup it triggers — and every unselected date's files must
    // stay physically identical
    (1 to 3).foreach { _ =>
      val subset = allDates.filter(_ => rnd.nextBoolean()).toSeq
      val untouchedBefore = allDates.filterNot(subset.contains)
        .map(d => d -> partFiles(dir, s"trace_date=$d")).toMap
      StoreLayout.compactTracePartitions(spark, dir, subset)
      untouchedBefore.foreach { case (d, files) =>
        assert(partFiles(dir, s"trace_date=$d") == files, s"$d was rewritten unselected")
      }
      assert(fingerprint() == before)
      assert(noStageOrphans(dir))
    }
  }

  test("generation commit: readers see a complete partition at every crash point") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe = work to do
    val part = new java.io.File(dir, "trace_date=2024-01-10")
    def answer() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(t => (t.trace_id, t.spans.map(_.id).sorted)).sortBy(_._1).toSeq
    val expected = answer()

    // crash state A — staging orphan (died before the gen rename): invisible
    val orphan = new java.io.File(part, ".genstage-dead-run")
    assert(orphan.mkdir())
    assert(new java.io.File(orphan, "part-junk.parquet").createNewFile())
    assert(answer() == expected)

    // crash state B — generation renamed but pointer never landed: a gen dir
    // with no pointer is not served; readers still see the loose files
    val loose = part.listFiles().filter(_.isFile).map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
    val gen7 = new java.io.File(part, ".gen-000007")
    spark.createDataset(Seq(trace("000000000000000a", day1Us))).toDF()
      .select("trace_id", "spans", "root_ts").coalesce(1).write.parquet(gen7.toString)
    val mf = new java.io.FileOutputStream(new java.io.File(gen7, "_absorbed"))
    try mf.write(loose.sorted.mkString("\n").getBytes("UTF-8")) finally mf.close()
    assert(answer() == expected)
    assert(physicalRows(dir) == 3, "gen without pointer must not be served")

    // crash state C — pointer landed, cleanup never ran (THE committed
    // state): the generation + manifest-exclusion serve the new view even
    // though every absorbed loose file is still on disk
    assert(new java.io.File(part, "_current-000007").createNewFile())
    assert(answer() == expected)
    assert(physicalRows(dir) == 2, "absorbed loose files must be excluded")

    // a dangling pointer (gen dir lost to a cleanup race) is skipped, never
    // served as an empty partition
    assert(new java.io.File(part, "_current-000008").createNewFile())
    assert(answer() == expected)
    assert(physicalRows(dir) == 2)

    // the next pass heals everything: orphan stage swept, dangling pointer
    // dropped, absorbed loose deleted — and the answer never moved
    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-10")))
    assert(!orphan.exists())
    assert(pointers(dir, "trace_date=2024-01-10") == Seq("_current-000007"))
    assert(genDirs(dir, "trace_date=2024-01-10") == Seq(".gen-000007"))
    assert(looseFiles(dir, "trace_date=2024-01-10").isEmpty)
    assert(answer() == expected)
  }

  test("an append racing a compaction is never silently dropped") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe = work to do
    val before = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(_.trace_id).sorted.toSeq
    // the merge hook runs AFTER the pass snapshots its input files — an
    // append landing here is exactly the race: its file exists while the
    // rewrite stages, commits, and records its manifest
    StoreLayout.compactPartitions(spark, dir, "trace_date",
      Seq(java.time.LocalDate.parse("2024-01-10"))) { df =>
      StoreLayout.writeTraces(spark.createDataset(Seq(
        trace("00000000000000aa", day1Us))).toDF(), dir)
      df
    }
    val after = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(_.trace_id).sorted.toSeq
    assert(after == (before :+ "00000000000000aa").sorted,
      "the racing append must be served alongside the committed generation")
    // and it survives the NEXT pass too (absorbed into the next generation)
    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-10")))
    val healed = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(_.trace_id).sorted.toSeq
    assert(healed == after)
  }

  test("a slow rewrite under heartbeat never looks stale; a dead one still ages out") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe = work to do
    val day1 = java.time.LocalDate.parse("2024-01-10")
    val prevTtl = StoreLayout.LeaseTtlMs
    // heartbeat period = TTL/3 ≈ 667 ms; the TTL−period ≈ 1.3 s margin
    // absorbs a GC pause or loaded-host starvation of the daemon tick
    // without making the lease look stale mid-test
    StoreLayout.LeaseTtlMs = 2000L
    try {
      val entered = new java.util.concurrent.CountDownLatch(1)
      val proceed = new java.util.concurrent.CountDownLatch(1)
      var slowFailure: Throwable = null
      val slow = new Thread(() =>
        try StoreLayout.compactPartitions(spark, dir, "trace_date", Seq(day1)) { df =>
          entered.countDown()
          // the rewrite now outlives the TTL several times over — exactly
          // the multi-hour-partition shape at 100 TB scale
          proceed.await(60, java.util.concurrent.TimeUnit.SECONDS)
          StoreLayout.traceMergeFn(spark, 1)(df)
        } catch { case t: Throwable => slowFailure = t })
      slow.start()
      assert(entered.await(60, java.util.concurrent.TimeUnit.SECONDS))
      Thread.sleep(3 * StoreLayout.LeaseTtlMs) // 3× TTL: stale without heartbeat
      // a second compactor must still refuse — the live pass's heartbeat
      // kept the lease fresh, so it is NOT reclaimed as abandoned
      val e = intercept[IllegalStateException](
        StoreLayout.compactTracePartitions(spark, dir, Seq(day1)))
      assert(e.getMessage.contains("held by a concurrent compactor"))
      proceed.countDown()
      slow.join(120000)
      assert(!slow.isAlive && slowFailure == null,
        s"slow pass must commit normally after the hold: $slowFailure")
      assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".compacting-")),
        "the slow pass must release its lease after committing")
      assert(physicalRows(dir) == 2, "the slow pass's merge must have committed")
      // and a lease that genuinely STOPPED heartbeating (crashed compactor)
      // is still reclaimed: the existing stale-reclaim contract is unchanged
      val dead = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
      assert(dead.createNewFile())
      assert(dead.setLastModified(System.currentTimeMillis() - 10 * StoreLayout.LeaseTtlMs))
      StoreLayout.compactTracePartitions(spark, dir, Seq(day1))
      assert(!dead.exists(), "a non-heartbeating stale lease must be reclaimed")
    } finally StoreLayout.LeaseTtlMs = prevTtl
  }

  test("filesPerDate > 1: a bulk-backfilled multi-file date compacts under an " +
      "append race, stays multi-file, and serves in ≤2 scan legs") {
    val dir = Files.createTempDirectory("graft-store").toString + "/traces"
    val day1 = java.time.LocalDate.parse("2024-01-10")
    // bulk backfill: 32 traces on one date, clustered into ≈4 files
    val bulk = (0 until 32).map(i => trace(f"0000000000000$i%03d", day1Us + i * 60000000L))
    StoreLayout.writeTraces(spark.createDataset(bulk).toDF(), dir, filesPerDate = 4)
    val files0 = looseFiles(dir, "trace_date=2024-01-10")
    assert(files0.size > 1 && files0.size <= 4,
      s"filesPerDate=4 must yield a multi-file date, got ${files0.size}")
    // a redelivered dupe gives the rewrite real merge work
    StoreLayout.writeTraces(spark.createDataset(Seq(bulk.head)).toDF(), dir,
      filesPerDate = 4)
    def served() = graft.operators.TraceQueries.fromStore(
      StoreLayout.readAll(spark, dir, "trace_date"))
      .collect().map(_.trace_id).sorted.toSeq
    assert(served() == bulk.map(_.trace_id).sorted)
    // compact with the REAL multi-file merge, racing a multi-file append
    // landing after the pass snapshots its inputs
    StoreLayout.compactPartitions(spark, dir, "trace_date", Seq(day1)) { df =>
      StoreLayout.writeTraces(spark.createDataset(Seq(
        trace("00000000000000aa", day1Us))).toDF(), dir, filesPerDate = 4)
      StoreLayout.traceMergeFn(spark, 4)(df)
    }
    assert(served() == (bulk.map(_.trace_id) :+ "00000000000000aa").sorted,
      "the racing append must be served alongside the committed generation")
    // the committed generation keeps the multi-file shape (dupe collapsed)
    assert(genDirs(dir, "trace_date=2024-01-10") == Seq(".gen-000001"))
    val genData = new java.io.File(dir, "trace_date=2024-01-10/.gen-000001")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSeq
    assert(genData.size > 1 && genData.size <= 4,
      s"compaction must preserve the filesPerDate=4 shape, got ${genData.size}")
    assert(physicalRows(dir) == 33, "32 merged rows + the racing append's row")
    // the multi-file generation + straggler still plan as ≤2 scan legs
    val read = StoreLayout.readAll(spark, dir, "trace_date")
    read.collect()
    val scans = collectScans(read.queryExecution.executedPlan)
    assert(scans.size <= 2,
      s"multi-file generation must not add scan legs, got ${scans.size}")
    // the next pass absorbs the straggler into generation 2, same shape
    StoreLayout.compactTracePartitions(spark, dir, Seq(day1), filesPerDate = 4)
    assert(served() == (bulk.map(_.trace_id) :+ "00000000000000aa").sorted)
    assert(physicalRows(dir) == 33)
  }

  private def collectScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case s: FileSourceScanExec => Seq(s)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectScans(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => collectScans(r.child)
    case other => other.children.flatMap(collectScans)
  }

  test("generation-commit race: the loser aborts without touching live state") {
    val dir = freshStore()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = new org.apache.hadoop.fs.Path(dir, "trace_date=2024-01-10")
    // the winner's generation is already committed
    val won = new java.io.File(dir, "trace_date=2024-01-10/.gen-000002")
    assert(won.mkdir())
    assert(new java.io.File(won, "part-winner.parquet").createNewFile())
    assert(new java.io.File(dir, "trace_date=2024-01-10/_current-000002").createNewFile())
    // the loser staged concurrently and tries to commit the same number
    val stage = new org.apache.hadoop.fs.Path(part, ".genstage-loser")
    fs.mkdirs(stage)
    val e = intercept[IllegalStateException] {
      StoreLayout.commitGeneration(fs, part, stage, 2L)
    }
    assert(e.getMessage.contains("generation-commit race"))
    assert(won.exists() && new java.io.File(won, "part-winner.parquet").exists(),
      "the winner's committed generation must be untouched")
    // Hadoop rename onto an existing dir MOVES the source inside it rather
    // than failing — the loser must back out exactly the subtree it injected
    assert(!new java.io.File(won, ".genstage-loser").exists(),
      "the loser's stage must not linger inside the winner's generation")
    // pointer race: the rename wins (gen 3 free) but the pointer is taken —
    // the loser must discard its own generation, never the winner's pointer
    fs.mkdirs(stage) // the first attempt consumed (moved) the staging dir
    assert(new java.io.File(dir, "trace_date=2024-01-10/_current-000003").createNewFile())
    val e2 = intercept[IllegalStateException] {
      StoreLayout.commitGeneration(fs, part, stage, 3L)
    }
    assert(e2.getMessage.contains("pointer race"))
    assert(!new java.io.File(dir, "trace_date=2024-01-10/.gen-000003").exists(),
      "the loser's renamed generation must be discarded")
  }

  test("a loser's staging subtree trapped inside the current generation is swept") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir) // dupe = work to do
    val date = Seq(java.time.LocalDate.parse("2024-01-10"))
    StoreLayout.compactTracePartitions(spark, dir, date)
    val gen = new java.io.File(dir, "trace_date=2024-01-10")
      .listFiles().filter(_.isDirectory).find(_.getName.startsWith(".gen-")).get
    // simulate a commit loser that crashed between its rename-into-this-gen
    // and its back-out delete (trapped subtree), plus one that crashed
    // between the token check and the token delete (stray owner token)
    val trapped = new java.io.File(gen, ".genstage-crashed-loser")
    assert(trapped.mkdir())
    assert(new java.io.File(trapped, "part-dup.parquet").createNewFile())
    assert(new java.io.File(gen, "_writer-stray-token").createNewFile())
    val before = physicalRows(dir)
    // neither is served (hidden from parquet listings)…
    assert(physicalRows(dir) == before)
    // …and the next pass reclaims both, even though this partition is
    // CONVERGED (no new loose files → no rewrite, so without the in-gen
    // sweep the trapped rewrite would never be retired with its gen)
    StoreLayout.compactTracePartitions(spark, dir, date)
    assert(!trapped.exists(), "trapped staging subtree must be swept")
    assert(!new java.io.File(gen, "_writer-stray-token").exists(),
      "stray owner token must be swept")
    assert(gen.exists(), "the current generation itself must survive the sweep")
    assert(physicalRows(dir) == before)
  }

  test("empty-range read resolves schema past an empty-husk first partition") {
    val dir = freshStore()
    StoreLayout.compactTraces(spark, dir) // data now only in hidden gen dirs
    StoreLayout.compactTraces(spark, dir) // second pass: absorbed loose deleted
    // first partition (lexicographically) becomes a husk: only a dangling
    // pointer survives a simulated cleanup race
    val husk = new java.io.File(dir, "trace_date=2024-01-10")
    husk.listFiles().foreach { f =>
      if (f.isDirectory) { f.listFiles().foreach(_.delete()); f.delete() }
      else if (!f.getName.startsWith("_current-")) f.delete()
    }
    // a range matching no partition must return empty, not crash on schema
    // inference — the probe has to skip the husk and take the schema from a
    // partition that still has inputs
    val none = StoreLayout.readPartitioned(spark, dir, "trace_date",
      Some(java.time.LocalDate.parse("2030-01-01")),
      Some(java.time.LocalDate.parse("2030-01-02")))
    assert(none.count() == 0)
    assert(none.columns.contains("trace_id") && none.columns.contains("trace_date"))
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
    // nothing staged or committed: the dupes are still there, lease still held
    assert(physicalRows(dir) == 3)
    assert(genDirs(dir, "trace_date=2024-01-10").isEmpty)
    assert(lease.exists())
    assert(lease.delete())
  }

  test("stale lease from a crashed compactor is reclaimed atomically and released") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us))).toDF(), dir)
    val lease = new java.io.File(dir, ".compacting-trace_date=2024-01-10")
    assert(lease.createNewFile())
    // older than the 30-min TTL → abandoned by a crashed run. The reclaim
    // path renames it to a per-claimant tombstone before creating the fresh
    // lease (rename is atomic: of N racing claimants exactly one wins)
    assert(lease.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000))
    StoreLayout.compactTracePartitions(spark, dir,
      Seq(java.time.LocalDate.parse("2024-01-10")))
    assert(!lease.exists(), "reclaimed lease must be released after the commit")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains(".reclaim-")),
      "reclaim tombstone must not linger")
    assert(StoreLayout.readAll(spark, dir, "trace_date")
      .where("trace_date = DATE'2024-01-10'").count() == 1)
  }

  test("lease restore races: transient rename failure retries instead of " +
      "deleting the tombstone; only a verified fresh lease supersedes it") {
    import org.apache.hadoop.fs.{FileStatus, FilterFileSystem, Path => HPath}
    val hconf = spark.sparkContext.hadoopConfiguration
    // a wrapper FS whose rename(tomb → lease) behavior is scripted per
    // case, and whose getFileStatus reports the LEASE as stale (so the
    // reclaim path runs) while the tombstone keeps its real fresh mtime
    // (so the fresh-tombstone restore branch runs — the slow-claimant race)
    def scriptedFs(raw: org.apache.hadoop.fs.FileSystem, leaseName: String)(
        restoreRename: (HPath, HPath, (HPath, HPath) => Boolean) => Boolean) =
      new FilterFileSystem(raw) {
        override def getFileStatus(p: HPath): FileStatus = {
          val st = super.getFileStatus(p)
          if (p.getName == leaseName)
            new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
              System.currentTimeMillis() - 10 * StoreLayout.LeaseTtlMs, p)
          else st
        }
        override def rename(src: HPath, dst: HPath): Boolean =
          if (src.getName.contains(".reclaim-"))
            restoreRename(src, dst, super.rename(_, _))
          else super.rename(src, dst)
      }
    def freshLease(): (HPath, java.io.File) = {
      val dir = Files.createTempDirectory("graft-leaserace").toFile
      val f = new java.io.File(dir, ".compacting-p=1")
      assert(f.createNewFile())
      (new HPath(f.getAbsolutePath), f)
    }
    val raw = new HPath(Files.createTempDirectory("graft-leaseraw").toString)
      .getFileSystem(hconf)

    // case 1 (the r17 ADVICE bug): the restore rename fails TRANSIENTLY —
    // no fresh third-party lease exists. The old code deleted the tombstone
    // (destroying the only copy of the lease); now it retries and restores.
    val (lease1, f1) = freshLease()
    var failuresLeft = 1
    val fs1 = scriptedFs(raw, f1.getName) { (src, dst, delegate) =>
      if (failuresLeft > 0) { failuresLeft -= 1; false } else delegate(src, dst)
    }
    val e1 = intercept[IllegalStateException] { StoreLayout.acquireLease(fs1, lease1) }
    assert(e1.getMessage.contains("restored"), e1.getMessage)
    assert(f1.exists(), "the transiently-failed restore must put the lease back")
    assert(!f1.getParentFile.listFiles().exists(_.getName.contains(".reclaim-")),
      "no tombstone may linger after a successful retry")

    // case 2: the restore rename fails because a faster third claimant's
    // FRESH lease exists (verified on disk) — only then is the tombstone
    // superseded and deleted
    val (lease2, f2) = freshLease()
    val fs2 = scriptedFs(raw, f2.getName) { (_, _, _) =>
      // the third claimant slips into the absence window, then our rename
      // fails (HDFS semantics: rename to an existing destination fails)
      if (!f2.exists()) assert(f2.createNewFile())
      false
    }
    val e2 = intercept[IllegalStateException] { StoreLayout.acquireLease(fs2, lease2) }
    assert(e2.getMessage.contains("superseded tombstone deleted"), e2.getMessage)
    assert(f2.exists(), "the faster claimant's lease must be untouched")
    assert(!f2.getParentFile.listFiles().exists(_.getName.contains(".reclaim-")),
      "a verified-superseded tombstone is deleted")

    // case 3: the restore keeps failing and NO fresh lease exists — the
    // tombstone is the only surviving copy and must be left on disk
    val (lease3, f3) = freshLease()
    val fs3 = scriptedFs(raw, f3.getName) { (_, _, _) => false }
    val e3 = intercept[IllegalStateException] { StoreLayout.acquireLease(fs3, lease3) }
    assert(e3.getMessage.contains("remove it manually"), e3.getMessage)
    assert(f3.getParentFile.listFiles().exists(_.getName.contains(".reclaim-")),
      "the only copy of the lease must not be destroyed")
  }

  test("set store: date-partitioned deltas with retention, replay, and compaction") {
    val dir = Files.createTempDirectory("graft-setstore").toString + "/auto"
    val fields = Seq(
      ("svc", "get", null: String, Map("k" -> "v1"), Some(day1Us): Option[Long]),
      ("svc", "get", null: String, Map("k" -> "v2"), Some(day2Us)),
      // a NULL ingest time cannot be date-partitioned: without the guard it
      // would land in seen_date=__HIVE_DEFAULT_PARTITION__, served only
      // until the first compaction and never expired — the guard drops it
      ("svc", "get", null: String, Map("k" -> "limbo"), None)
    ).toDF("service", "name", "remote_service", "tags", "event_us")
    val expired = Seq(
      ("svc", "get", null: String, Map("k" -> "old"), day1Us - 300L * 86400 * 1000000L)
    ).toDF("service", "name", "remote_service", "tags", "event_us")
    graft.streaming.StreamingPipeline.appendAutocompleteDelta(expired, Seq("k"), dir)
    graft.streaming.StreamingPipeline.appendAutocompleteDelta(fields, Seq("k"), dir)
    graft.streaming.StreamingPipeline.appendAutocompleteDelta(fields, Seq("k"), dir) // replay
    // deltas land in per-date partitions (the reference's windowed
    // autocomplete store lifecycle, TraceStorageTopology.java:143-149)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(parts == Seq("seen_date=2023-03-16", "seen_date=2024-01-10", "seen_date=2024-01-11"),
      "no default-partition dir: the null-ingest-time row must be dropped, not parked")
    def served() = graft.streaming.StreamingPipeline.readAutocompleteStore(spark, dir)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(served() == Seq(("k", Seq("old", "v1", "v2"))))
    // ST6 retention is now a partition drop for the set-store family too
    val dropped = StoreLayout.dropExpired(spark, dir, "seen_date",
      java.time.LocalDate.parse("2024-01-01"))
    assert(dropped == Seq("seen_date=2023-03-16"))
    assert(served() == Seq(("k", Seq("v1", "v2"))))
    // generation-commit compaction collapses the replayed deltas per date;
    // the serving answer never moves, and a second pass converges
    StoreLayout.compactSetStore(spark, dir, "tag_key", "values")
    assert(served() == Seq(("k", Seq("v1", "v2"))))
    assert(StoreLayout.readAll(spark, dir, "seen_date").count() == 2,
      "one collapsed row per (seen_date, key)")
    StoreLayout.compactSetStore(spark, dir, "tag_key", "values")
    assert(served() == Seq(("k", Seq("v1", "v2"))))
    assert(looseFiles(dir, "seen_date=2024-01-10").isEmpty, "converged after grace")
  }

  test("a failed partition rewrite aborts cleanly: store intact, lease released") {
    val dir = freshStore()
    StoreLayout.writeTraces(spark.createDataset(Seq(
      trace("000000000000000a", day1Us), trace("000000000000000b", day2Us))).toDF(), dir)
    // a corrupt parquet file (e.g. a torn upload) lands in day 1: the
    // rewrite's read job fails BEFORE any commit — the clean-abort path
    val corrupt = new java.io.File(dir, "trace_date=2024-01-10/part-corrupt.parquet")
    val out = new java.io.FileOutputStream(corrupt)
    try out.write("this is not parquet".getBytes("UTF-8")) finally out.close()
    val day1Before = partFiles(dir, "trace_date=2024-01-10")
    intercept[Throwable] {
      StoreLayout.compactTracePartitions(spark, dir, Seq(
        java.time.LocalDate.parse("2024-01-10"), java.time.LocalDate.parse("2024-01-11")))
    }
    // the failed date is byte-identical (nothing committed), its staging is
    // deleted, and NO lease survives — writers were never blocked anyway
    assert(partFiles(dir, "trace_date=2024-01-10") == day1Before)
    assert(genDirs(dir, "trace_date=2024-01-10").isEmpty)
    assert(noStageOrphans(dir), "clean abort must sweep its staging dir")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".compacting-")),
      "no lease may survive a clean abort (or a sibling date's success)")
    // the healthy sibling date is still a valid readable partition
    assert(StoreLayout.readAll(spark, dir, "trace_date")
      .where("trace_date = DATE'2024-01-11'").count() >= 1)
  }

  test("concurrent readers during live compaction passes always see a complete answer") {
    // the enumerated crash-state test pins each commit point statically;
    // this one races REAL readers against real generation commits: a reader
    // thread resolves and merges the store in a tight loop while the main
    // thread appends dupes and compacts, repeatedly. Under the old
    // two-rename swap this flaked with missing-partition answers; under the
    // pointer commit every read must see all traces exactly once
    val dir = freshStore()
    val expected = Seq("000000000000000a", "000000000000000b")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        val got = graft.operators.TraceQueries.fromStore(
          StoreLayout.readAll(spark, dir, "trace_date"))
          .collect().map(_.trace_id).sorted.toSeq
        if (got != expected) bad.compareAndSet(null, s"read saw $got")
        reads.incrementAndGet()
      }
    })
    reader.start()
    try {
      // several full lifecycle turns while the reader spins: re-append a
      // duplicate (work for the pass), compact (commit a new generation +
      // retire the old), repeat — cleanup of pass N's retirees runs inside
      // pass N+1, so readers cross staging, commit, AND deferred deletion
      for (_ <- 1 to 4) {
        StoreLayout.writeTraces(spark.createDataset(Seq(
          trace("000000000000000a", day1Us))).toDF(), dir)
        StoreLayout.compactTraces(spark, dir)
        if (bad.get() != null) throw new AssertionError(bad.get())
      }
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(bad.get() == null, s"incomplete read observed: ${bad.get()}")
    assert(reads.get() > 0, "the reader thread must have actually raced the passes")
  }

  test("retention drops expired partitions only") {
    val dir = freshStore()
    val dropped = StoreLayout.dropExpired(spark, dir, "trace_date",
      java.time.LocalDate.parse("2024-01-11"))
    assert(dropped == Seq("trace_date=2024-01-10"))
    val left = spark.read.parquet(dir).select("trace_id").as[String].collect()
    assert(left.toSeq == Seq("000000000000000b"))
  }

  test("never-written stores serve typed empty and retention no-ops " +
      "(query surface probing before the first write must not crash)") {
    val missing = Files.createTempDirectory("graft-missing").toString + "/nothing-here"
    // trace store: empty with the full schema (callers filter on these cols)
    val traces = StoreLayout.readTraces(spark, missing, endTs = day1Us / 1000,
      lookback = 86400000L)
    assert(traces.count() == 0)
    assert(traces.columns.toSet == Set("trace_id", "spans", "root_ts", "trace_date"))
    // window store: empty, and the full read-side pipeline (dedup + sum)
    // resolves over it
    val deps = graft.operators.TraceQueries.dependencies(
      StoreLayout.readDependencyWindows(spark, missing, day1Us / 1000, 86400000L),
      endTs = day1Us / 1000, lookback = 86400000L)
    assert(deps.count() == 0)
    // autocomplete set store: empty through the collapse
    assert(graft.streaming.StreamingPipeline.readAutocompleteStore(spark, missing)
      .count() == 0)
    // retention: a no-op, not an aborted maintenance pass
    assert(StoreLayout.dropExpired(spark, missing, "trace_date",
      java.time.LocalDate.parse("2024-01-11")).isEmpty)
  }
}
