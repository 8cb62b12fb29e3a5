package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Host-factor-normalized cpu-floor adjudication (pure; spec-pinned).
    * Returns (hostFactor, flagged): hostFactor is the median measured/floor
    * ratio across the floored HEAVY queries (floor ≥ 2 cpu-s, falling back
    * to all floored queries when fewer than five qualify) — co-load
    * inflation shows up here and cancels — clamped to ≥1 so a
    * better-than-floor host never tightens the gate below the committed
    * floors. Heavy-only, because co-load inflation is NOT uniform: it
    * charges stall cycles to the queries that saturate the machine
    * (measured in round 12: the 32-thread compute queries at 1.3–1.9× floor
    * under a ~4-core background load while every sub-second query sat AT
    * floor — an all-query median reads 1.0 there and spuriously flags the
    * whole heavy family; the heavy-median cancels it, while a single
    * regressed heavy query still flags against its siblings). A query
    * flags when its min cpu exceeds `floor × hostFactor × 1.3 + 0.5 s`:
    * 1.3× relative for real signal over run-to-run jitter, +0.5 s absolute
    * because sub-second queries jitter by tenths of a cpu-second (JIT, GC
    * attribution) without meaning anything. Sentinel cpu (−1: process-CPU
    * unavailable) and non-positive floors are excluded from both the
    * median and the flags. Even-count medians average the two middle
    * ratios — taking the upper-middle element would bias the factor up
    * exactly when a regression sits in the upper half. The factor can
    * still self-mask a slowdown broad enough to move the heavy median
    * (a shared-operator regression); the caller warns past a sanity bound
    * for that case.
    *
    * `absSlack` is the channel's measured jitter allowance: 0.5 s for the
    * task-cpu hard gate (sub-second queries jitter by tenths), 1.5 s for
    * the advisory driver-overhead channel — its proc−task statistic
    * rides GC/compiler-thread scheduling and measured a 1.31 s p90
    * cross-run spread over the six r18 quiet runs, so the task-cpu slack
    * produced one-off never-repeating light-query detachments every run
    * (see tools/bench_driver_overhead.tsv's r18 notes).
    */
  private[graft] def flagCpuRegressions(measured: Seq[(String, Double)],
      floors: Map[String, Double],
      absSlack: Double = 0.5): (Double, Seq[(String, Double, Double)]) = {
    val allRatios = measured.collect {
      case (k, c) if c > 0 && floors.get(k).exists(_ > 0) => (floors(k), c / floors(k))
    }
    val heavy = allRatios.collect { case (f, r) if f >= 2.0 => r }
    val ratios = (if (heavy.length >= 5) heavy else allRatios.map(_._2)).sorted
    val hostFactor =
      if (ratios.isEmpty) 1.0
      else if (ratios.length % 2 == 0)
        math.max(1.0, (ratios(ratios.length / 2 - 1) + ratios(ratios.length / 2)) / 2)
      else math.max(1.0, ratios(ratios.length / 2))
    val flagged = measured.collect {
      case (k, c) if c > 0 &&
        floors.get(k).exists(f => f > 0 && c > f * hostFactor * 1.3 + absSlack) =>
        (k, c, floors(k))
    }
    (hostFactor, flagged)
  }

  /** One streaming leg's numbers; `frag` is the compact JSON the stdout line
    * carries, `detail` the full object (incl. traces_out/windows_out) for
    * the sidecar.
    */
  private final case class StreamStats(rowsIn: Int, tracesOut: Long, windowsOut: Long,
      batches: Int, sec: Double, stage1Sec: Double, stage2Sec: Double) {
    def rps: Double = if (sec > 0) rowsIn / sec else 0.0
    // per-stage seconds live in the sidecar only: every stdout-line byte
    // counts against the driver's 2KB tail window (see the length guard).
    // Keys match the big leg's compact form (rows/sec/rps — r14 renamed
    // rows_in/rows_per_sec, ~12 bytes toward the ≤1700 clean-line goal).
    def frag: String =
      s"""{"rows":$rowsIn,"batches":$batches,"sec":${f2(sec)},""" +
        s""""rps":${f1(rps)}"""
    def detail: String = frag +
      s""","stage1_sec":${f2(stage1Sec)},"stage2_sec":${f2(stage2Sec)}""" +
      s""","traces_out":$tracesOut,"windows_out":$windowsOut}"""
  }

  /** Streaming micro-bench: the reference's three-topology chain (envelopes →
    * session-window traces → dependency links → 1-minute windows) driven
    * through MemoryStream, so streaming-path regressions show up
    * round-over-round. The two stages are separate streaming queries — the
    * stage boundary mirrors the reference's `zipkin-dependency` topic (and
    * Spark drops event-time lineage across the typed flatMap anyway).
    * Runs twice per bench — sf0.01 and the timed dir — with the SAME batch
    * count, so the two `rps` values together show the per-batch
    * fixed cost (state-store commits, ~250 ms floor documented in DESIGN.md)
    * amortizing away: 10× the rows through the same 5 batches must yield
    * ≫1× the throughput, or per-BATCH cost, not per-ROW cost, would be
    * dominating — the claim 100 TB ingest rests on.
    */
  private def streamingBench(spark: SparkSession, sfDir: String,
      tag: String): StreamStats = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // envelope event time = the span's own timestamp (the transport record
    // time in the reference); fed in event-time order so the watermark
    // advances and sessions close incrementally across micro-batches
    val envs = sources.EventSpans.spans(spark, SparkEntry.events(spark, sfDir))
      .collect()
      .map(sp => SpanEnvelope(new java.sql.Timestamp(sp.timestampAsLong / 1000), sp))
      .sortBy(_.ingest_ts.getTime)
    if (envs.isEmpty) // empty fixture is a reportable zero, not a bench crash
      return StreamStats(0, 0, 0, 0, 0, 0, 0)
    // stateful micro-batches pay a per-(partition × batch) state-store commit;
    // 32 shuffle partitions for a 10k-row leg would measure commit overhead,
    // not pipeline throughput. Env knob so the floor is measurable directly
    // (see DESIGN.md "Streaming stage-2" — stage2 wall tracks parts × batches,
    // not data volume).
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    // micro-batch count per stage (default 4 data chunks + 1 watermark
    // flush). The MemoryStream feed has no wall-clock trigger, so batch
    // count IS the trigger-interval knob: fewer/larger batches amortize the
    // fixed per-(partition × batch) state-store commit exactly the way a
    // longer ProcessingTime trigger would — measured sensitivity in
    // README's bench notes
    val streamChunks = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "4").toInt)
    try {
    val t0 = System.nanoTime()
    val in1 = MemoryStream[SpanEnvelope]
    val q1 = StreamingPipeline.sessionTraces(in1.toDS())
      .writeStream.format("memory").queryName(s"bench_stream_traces_$tag")
      .outputMode("append").start()
    envs.grouped(math.max(1, envs.length / streamChunks)).foreach { chunk =>
      in1.addData(chunk.toIndexedSeq); q1.processAllAvailable()
    }
    // one far-future envelope pushes the watermark past every open session
    in1.addData(SpanEnvelope(
      new java.sql.Timestamp(envs.last.ingest_ts.getTime + 3600000L),
      envs.last.span))
    q1.processAllAvailable()
    val closed = spark.table(s"bench_stream_traces_$tag").as[ClosedTrace].collect()
      .sortBy(_.close_ts.getTime)
    val batches1 = q1.recentProgress.count(_.numInputRows > 0)
    q1.stop()
    // stage boundary: sessionize (envelopes → closed traces) vs
    // links → windows — reported separately so a regression localizes
    val t1 = System.nanoTime()
    val in2 = MemoryStream[ClosedTrace]
    val q2 = StreamingPipeline.dependencyWindowCounts(
        StreamingPipeline.dependencyLinkEvents(in2.toDS()))
      .writeStream.format("memory").queryName(s"bench_stream_windows_$tag")
      .outputMode("append").start()
    closed.grouped(math.max(1, closed.length / streamChunks)).foreach { chunk =>
      in2.addData(chunk.toIndexedSeq); q2.processAllAvailable()
    }
    // close the trailing 1-minute windows too: the closer trace must emit at
    // least one LINK (the stage-2 watermark rides on link event time, and a
    // linkless trace emits no rows to advance it)
    val lastClose = closed.map(_.close_ts.getTime).max
    def closerEp(s: String) = Some(graft.model.Endpoint(service_name = Some(s)))
    in2.addData(ClosedTrace("wm_close",
      new java.sql.Timestamp(lastClose + 3600000L),
      Seq(
        graft.model.Span(trace_id = "wm_close", id = "1", kind = Some("SERVER"),
          name = Some("a"), local_endpoint = closerEp("wm_a")),
        graft.model.Span(trace_id = "wm_close", id = "2", parent_id = Some("1"),
          kind = Some("SERVER"), name = Some("b"), local_endpoint = closerEp("wm_b"))),
      0L))
    q2.processAllAvailable()
    val windowsOut = spark.table(s"bench_stream_windows_$tag").count()
    q2.stop()
    val tEnd = System.nanoTime()
    StreamStats(envs.length, closed.length, windowsOut, batches1,
      (tEnd - t0) / 1e9, (t1 - t0) / 1e9, (tEnd - t1) / 1e9)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Fixed-precision JSON numbers: the driver keeps only the last ~2KB of
    * bench output and parses the JSON line out of that window, so the
    * complete line must sit inside it alongside sbt's trailing "[success]"
    * line — budget ≤ 1860 chars (2000-byte tail − ~75-byte success trailer
    * − ~60 margin; raised from 1800 in round 13, when 78 benched queries
    * put the 1-decimal map at 1798 chars and the old budget silently
    * dropped the streaming rates one tier early). (r1–r7's `parsed: null`
    * had TWO causes:
    * full-precision doubles overflowing the window in early rounds, and —
    * once the line fit — sbt's logger stamping it with "[info] ", fixed in
    * build.sbt via run/outputStrategy := StdoutOutput.) 2 decimals for
    * seconds, 1 for rates/CPU; the sidecar `target/bench_detail.json` keeps
    * full precision.
    */
  private def f2(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
  private def f1(d: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, d)

  /** Stdout-line key: the fixed "q_" prefix carries no information on a
    * line where every byte counts (84 queries × 2 chars ≈ 160 of the 1860
    * budget), so line keys drop it; the sidecar keeps full names. Safe
    * because every declared query except `q1_agg` starts with "q_", so the
    * stripped keys cannot collide.
    */
  /** Per-query input for the advisory driver-cpu channel: MIN over passes
    * of that pass's (proc-cpu − task-cpu), clamped at 0. Per-pass, NOT
    * min-proc − min-task — the two channels' separate minima can come from
    * different passes and their difference can clamp to zero while every
    * pass carried real driver overhead (BenchSpec pins the case). A query
    * that failed or returned the proc-cpu sentinel (−1) in ANY pass is
    * excluded, matching the hard gate's exclusion rule. Tuple shape is
    * runSuite's: (name, wall, task-cpu, proc-cpu, gc, error).
    */
  private[graft] def perPassOverheads(
      passes: Seq[Seq[(String, Double, Double, Double, Double, Option[String])]])
    : Seq[(String, Double)] = {
    // the invariant (≥1 pass, all equal-length, same query order — what
    // runSuite's deterministic sorted loop produces) is enforced up front:
    // a future ragged caller fails with a clear message instead of an
    // IndexOutOfBounds deep in the indexing below
    require(passes.nonEmpty && passes.map(_.size).distinct.size == 1,
      s"perPassOverheads needs same-length passes, got sizes ${passes.map(_.size).mkString(",")}")
    passes.transpose.flatMap { runs =>
      val perPass = runs.collect { case (_, _, tc, pc, _, None) if pc >= 0 =>
        math.max(0.0, pc - tc) }
      if (perPass.size == passes.size) Seq((runs.head._1, perPass.min))
      else Seq.empty
    }
  }

  private[graft] def lineKey(k: String): String =
    if (k.startsWith("q_")) k.substring(2) else k

  /** Stdout degrade ladder (r22 order; spec-pinned). Tiers shrink the line
    * until it fits the driver's tail budget, and the ORDER encodes what the
    * record can least afford to lose:
    *   1. full-precision walls → 2. 1-decimal walls → 3. integer cpu array →
    *   4. drop the cpu array → 5. cap `cpu_flagged` at [[FlaggedNameCap]]
    *   names → 6. compact streaming (bare small/big rps) → 7. null
    *   streaming → 8. error keys + compact streaming → 9. error keys →
    *   10. error count only.
    * Tier 5 is the r22 reorder (r21 VERDICT task 2): under co-load the
    * flagged-name list grows exactly when the line is tightest — r21's
    * 7-name list pushed the line to 1832 chars and the old ladder nulled
    * the STREAMING rates to pay for it, blinding the driver's only
    * streaming channel in the one round where it was contentious. The
    * flag COUNT always rides in `cpu_flags`, and sidecar + stderr keep
    * every flagged name, so capped names lose diagnostics depth only on
    * the line; the streaming rates exist nowhere else in the driver's
    * record. `mkLine(queries, cpuArray, flaggedFrag, errors, streaming)`
    * is main's line renderer, passed in so the ladder is testable pure.
    */
  private[graft] def degradeLadder(
      mkLine: (String, String, String, String, String) => String,
      qs: String, q1dec: String, cpuFull: String, cpuInt: String,
      flaggedFull: String, flaggedCapped: String,
      errs: String, errKeys: String, errCount: String,
      streamFull: String, streamCompact: String,
      budget: Int = 1860): String = {
    val tiers = Seq(
      () => mkLine(qs, cpuFull, flaggedFull, errs, streamFull),
      () => mkLine(q1dec, cpuFull, flaggedFull, errs, streamFull),
      () => mkLine(q1dec, cpuInt, flaggedFull, errs, streamFull),
      () => mkLine(q1dec, "[]", flaggedFull, errs, streamFull),
      () => mkLine(q1dec, "[]", flaggedCapped, errs, streamFull),
      () => mkLine(q1dec, "[]", flaggedCapped, errs, streamCompact),
      () => mkLine(q1dec, "[]", flaggedCapped, errs, "null"),
      // once the query map is gone the line is small again — carry the
      // compact rates through the failure tiers (the old ladder kept the
      // FULL streaming frag beside error keys; dropping to the bare rates
      // is the strictly-dominating middle ground) before nulling them
      () => mkLine("{}", "[]", flaggedCapped, errKeys, streamCompact),
      () => mkLine("{}", "[]", flaggedCapped, errKeys, "null"),
      () => mkLine("{}", "[]", flaggedCapped, errCount, "null"))
    tiers.view.map(_()).find(_.length <= budget)
      .getOrElse(mkLine("{}", "[]", flaggedCapped, errCount, "null"))
  }

  /** Flagged names kept on the line once the ladder reaches its capped
    * tier: 3 names ≈ 60 bytes, enough to aim a human at the sidecar
    * without re-crowding the budget the cap exists to protect.
    */
  private[graft] val FlaggedNameCap = 3

  /** The line's suite task-cpu total (r22, spec-pinned): sum of per-query
    * MIN task-cpu, 1 decimal — the co-load-immune counterpart of `value`
    * (see the cpuTotalJson comment in main). Pure so the fragment's grammar
    * and its sum-of-minima semantics are pinned without running a bench.
    */
  private[graft] def cpuTotalFrag(minTaskCpus: Seq[Double]): String =
    s""","cpu_total":${f1(minTaskCpus.sum)}"""

  /** Floor-TSV parsing core (shared by every channel's loader; spec-pinned):
    * comment/blank lines are skipped BEFORE tab-splitting (r21, ADVICE) —
    * a '#' comment containing one tab with a non-numeric tail would
    * otherwise throw in toDouble and silently disarm the whole channel,
    * and the TSVs are deliberately comment-heavy provenance records.
    */
  private[graft] def parseFloors(lines: Iterator[String]): Map[String, Double] =
    lines.filterNot(l => l.isBlank || l.startsWith("#"))
      .map(_.split("\t"))
      .collect { case Array(k, v) => k -> v.toDouble }.toMap

  /** Advisory wall-channel self-adjudication (r20 — additive under the
    * r19 protocol freeze: a new record field, no measurement semantics
    * touched): the line's `value` (sum of per-query min walls) over the
    * committed quiet-host wall floor (`tools/bench_wall_floor.tsv`, key
    * "total"). The cpu channel has self-adjudicated since r16 (`hf` +
    * `cpu_flags` ride the line), but classifying WALL inflation still
    * required a human holding quiet sidecars next to the official line —
    * three rounds running (r17 store_write, r18 task 3, the r19 official
    * 70.69 s at hf 1.00). With `wf` on the line, the wall-up/cpu-flat
    * co-load signature (wf ≫ 1, hf ≈ 1 — measured directly in the floor
    * TSV's negative controls) reads off the stdout JSON alone. None =
    * channel unarmed (non-sf0.1 run, or the floor file absent/zero) —
    * emitted as the `-1` sentinel, matching `cpu_flags` unarmed grammar.
    */
  private[graft] def wallFactor(total: Double, floors: Map[String, Double],
      nQueries: Option[Int] = None, nCpus: Option[Int] = None): Option[Double] = {
    // fingerprint guards (r21, ADVICE + the 8-core PERF check): the floor
    // is a whole-suite WALL sum, valid only for the suite and core count it
    // was derived under. A changed query set silently skews wf (added
    // queries push a quiet run into "coload"), and a lower-core run — the
    // driver's own PERF leg runs the bench at reduced SPARK_GRAFT_CPUS —
    // legitimately walls higher than the 32-core floor (measured r21:
    // wf 1.45 at 8 cores on the same quiet code) and would self-label
    // "coload" on a quiet host. When the TSV records `total_n` (benched
    // query count) / `total_cpus`, a mismatching run unarms the channel
    // (the -1 sentinel, loud on stderr) instead of reporting a number with
    // the wrong denominator — same grammar as a failed floor load. The cpu
    // channel needs neither guard: it keys per query, and task-cpu is
    // core-count-invariant to first order.
    def mismatch(key: String, actual: Option[Int], what: String): Boolean =
      (floors.get(key), actual) match {
        case (Some(f), Some(a)) if f.toInt != a =>
          System.err.println(
            s"[bench] wall floor derived at $what ${f.toInt} but this run " +
              s"has $a — wf unarmed; floor applies only at its own $what " +
              "(re-derive tools/bench_wall_floor.tsv for other shapes)")
          true
        case _ => false
      }
    if (mismatch("total_n", nQueries, "query count") ||
        mismatch("total_cpus", nCpus, "core count")) None
    else floors.get("total").filter(_ > 0).map(total / _)
  }

  /** Classification for the sidecar + stderr advisory. Bands from the
    * committed record (see bench_wall_floor.tsv provenance): the six
    * flag-free quiet r19 runs sit at wf 1.00–1.19, so ≤1.25 is "quiet"
    * with jitter headroom; above that, hf splits scheduler co-load
    * (task-cpu at floor, hf ≈ 1 → "coload": walls are environment, not
    * code) from contention broad enough to inflate cpu too
    * ("contended": read per-query cpu_vs_floor in the sidecar). `hf` is
    * an Option because the cpu gate's placeholder factor when ITS floors
    * failed to load is 1.0 — feeding that in would assert a cpu-flat
    * "coload" verdict with zero cpu evidence; with no armed cpu channel
    * the split is unknowable and the band says so ("inflated"). Advisory
    * only — never a flag, never an exit code.
    */
  private[graft] def wallBand(wf: Double, hf: Option[Double]): String =
    if (wf <= 1.25) "quiet"
    else hf match {
      case None => "inflated" // wall up; no cpu channel to attribute it
      case Some(h) if h <= 1.15 => "coload"
      case Some(_) => "contended"
    }
  /** Host 1/5/15-min load averages as a JSON array — recorded before and
    * after the run so a number taken under outside load is self-labeling:
    * wall time up while process-CPU time and the historical quiet-host
    * numbers are flat means contention, not a code regression.
    */
  private def loadavgJson(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString("[", ",", "]")
    catch { case _: Throwable => "null" }

  /** 1-minute load only, for the stdout line (the full triples go to the
    * sidecar): with min-of-2 walls the load numbers are corroboration, not
    * the primary contamination defence, and the line's byte budget is tight.
    */
  private[graft] def loadavg1(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").head
    catch { case _: Throwable => "null" }

  /** git HEAD SHA at run time, recorded in the sidecar (r19) so "this
    * confirmation ran at the round's final HEAD" is mechanically checkable
    * — the r18 verdict had to hand-adjudicate a run that predated HEAD by
    * one commit. Read from `.git` directly — gitfile redirect (linked
    * worktrees / submodules, where `.git` is a one-line pointer file),
    * then HEAD, then the loose ref (refs live in the commondir when one
    * is declared), then packed-refs — no subprocess; never fatal
    * ("unknown").
    */
  private[graft] def gitHeadSha(gitDir: String = ".git"): String = try {
    import java.nio.file.{Files, Paths}
    def read(p: java.nio.file.Path): String =
      new String(Files.readAllBytes(p), "UTF-8").trim
    val start = Paths.get(gitDir)
    // gitfile redirect: ".git" is a regular file "gitdir: <path>", with
    // <path> relative to the gitfile's own directory when not absolute
    val dir =
      if (Files.isRegularFile(start)) {
        val target = read(start).stripPrefix("gitdir:").trim
        val base = Option(start.toAbsolutePath.getParent).getOrElse(start)
        base.resolve(target).normalize()
      } else start
    val head = read(dir.resolve("HEAD"))
    if (!head.startsWith("ref: ")) head
    else {
      val ref = head.stripPrefix("ref: ").trim
      // a worktree gitdir holds only HEAD; refs + packed-refs live in the
      // commondir it declares (absent in a plain repository → itself)
      val commonFile = dir.resolve("commondir")
      val common =
        if (Files.exists(commonFile)) dir.resolve(read(commonFile)).normalize()
        else dir
      val loose = common.resolve(ref)
      if (Files.exists(loose)) read(loose)
      else {
        import scala.jdk.CollectionConverters._
        Files.readAllLines(common.resolve("packed-refs")).asScala
          .find(l => !l.startsWith("#") && !l.startsWith("^") && l.endsWith(" " + ref))
          .map(_.split(" ")(0)).getOrElse("unknown")
      }
    }
  } catch { case scala.util.control.NonFatal(_) => "unknown" }

  /** Working-tree dirtiness for the sidecar's `git_sha` suffix: a bench
    * run over UNCOMMITTED source must not record a clean SHA (the binary
    * wouldn't correspond to the commit — worse than the r18 nit the field
    * exists to close). `Some(true)` = dirty, `Some(false)` = clean,
    * `None` = the check itself failed (no git binary / not a work tree) —
    * kept distinct so a failed check can never masquerade as clean.
    *
    * SCOPED TO ADJUDICATION INPUTS (r21, the r20 verdict's task 1): the
    * porcelain check covers the build inputs (`src project build.sbt`)
    * PLUS the three floor TSVs — the floors are runtime inputs to the
    * cpu_flags/hf/wf verdicts the sidecar records, so an uncommitted floor
    * edit must not certify a clean SHA any more than an uncommitted source
    * edit would (a locally raised floor could mask a real regression into
    * cpu_flags:0 invisibly). The r20 tree-wide check made every driver-run
    * official read `-dirty` forever — the driver's own artifacts (modified
    * LEAKCHECK.json, untracked BENCH/CORRECTNESS_r*.json) tripped it while
    * none of them affect the binary or the verdicts; those stay excluded
    * by the path scope. Anything touched under src or project, build.sbt,
    * or a floor TSV still reads `-dirty` (BenchSpec pins both directions).
    */
  private[graft] val DirtyCheckScope = Seq("src", "project", "build.sbt",
    "tools/bench_cpu_floor.tsv", "tools/bench_wall_floor.tsv",
    "tools/bench_driver_overhead.tsv")

  private[graft] def gitDirty(workDir: String = "."): Option[Boolean] = try {
    // gated on the SAME `.git` gitHeadSha reads: without this, `git
    // status` would walk UP from cwd (or honor GIT_DIR) and could report
    // an unrelated enclosing repository's dirtiness against our SHA
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(workDir, ".git"))) None
    else {
      val pb = new ProcessBuilder(
        (Seq("git", "status", "--porcelain", "--") ++ DirtyCheckScope): _*)
        .directory(new java.io.File(workDir))
        .redirectErrorStream(true)
      // the existence gate above is not enough on its own: the subprocess
      // inherits this JVM's environment, so an exported GIT_DIR /
      // GIT_WORK_TREE / GIT_COMMON_DIR / GIT_INDEX_FILE (…) would make
      // `git status` report a DIFFERENT repository's dirtiness against the
      // SHA read from ./.git — a clean unrelated repo masking a dirty tree
      // as a bare SHA. Scrub the whole GIT_* family rather than a hand
      // enumeration (the first cut listed three and missed GIT_COMMON_DIR /
      // GIT_OBJECT_DIRECTORY): `git status` here is local and read-only, so
      // no inherited GIT_* override is legitimate, and discovery then finds
      // ./.git the same way gitHeadSha does.
      pb.environment.keySet.removeIf(_.startsWith("GIT_")): Unit
      val p = pb.start()
      // bounded wait: a stalled git (hung FS mount, misbehaving hook)
      // must not hang the run AFTER measurement — the stdout JSON line
      // prints after the sidecar write that calls this. Trade-off: output
      // beyond the pipe buffer (thousands of changed files) can stall git
      // into the timeout, degrading to None — the safe, distinct answer.
      if (!p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly(): Unit
        None
      } else {
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.exitValue() == 0) Some(out.trim.nonEmpty) else None
      }
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** The sidecar's provenance string: SHA, `-dirty` when the tree has
    * uncommitted changes, `-dirtycheck-failed` when cleanliness could not
    * be established. "unknown" stays bare — suffixing a dirtiness verdict
    * onto an unresolved SHA would attribute it to nothing.
    */
  private[graft] def gitProvenance(): String = {
    val sha = gitHeadSha()
    if (sha == "unknown") sha
    else sha + (gitDirty() match {
      case Some(true) => "-dirty"
      case Some(false) => ""
      case None => "-dirtycheck-failed"
    })
  }

  /** Cumulative process CPU nanos (-1 where the JVM doesn't expose it).
    * SECONDARY channel since round 16: whole-process deltas attribute
    * every background thread — sibling queries' lingering GC, listener
    * dispatch, store-build stragglers — to whichever query is on the
    * clock, which is exactly the "attribution high mode" documented in
    * tools/bench_cpu_floor.tsv (q_emb_neardup 9.3 in-bench vs 1.5–3.0
    * standalone, zero code change). The regression GATE now runs on
    * [[TaskCpuListener]] task metrics; this stays in the sidecar so
    * driver-side cost (BPE merge loop, k-means iterations, bounded
    * collects) remains visible — task metrics only see executor tasks.
    */
  private def processCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  /** Sums `executorCpuTime` + `executorDeserializeCpuTime` (both nanos,
    * thread-CPU of the task's own thread) over every finished task. With
    * the bench's strictly serial query loop, the delta between two
    * drained-bus snapshots is exactly the CPU its jobs' stages burned —
    * per-query attribution the whole-process delta cannot give (it bills
    * co-resident threads) and wall time cannot give (it bills scheduler
    * wait under co-load). Reads require a listener-bus drain first
    * ([[org.apache.spark.GraftBenchBridge.drainListenerBus]]): task-end
    * events post asynchronously, and an undrained snapshot charges a
    * query's tail tasks to its successor.
    */
  private final class TaskCpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null)
        cpuNanos.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime)
    }
  }

  /** Cumulative stop-the-world GC millis across all collectors (collectors
    * that don't report time contribute 0). Captured per query so a
    * contaminated pass self-labels in the sidecar: wall AND cpu inflated
    * with `gc ≈ the excess` is heap pressure in THIS process (fix: heap /
    * allocation), while `gc ≈ 0` with the same inflation is outside
    * contention (a VM neighbor's cycles billing to our clock) — the two
    * look identical in wall/cpu alone and round 5–8 adjudications had to
    * guess.
    */
  private def gcMillis(): Long = {
    var total = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.forEach { g =>
      val t = g.getCollectionTime
      if (t > 0) total += t
    }
    total
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the machine's cores (the target env is local[32]) — a low
    // default here would quietly serialize the whole benchmark
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // naive parquet timestamps (events.ts is TIMESTAMP_NTZ since the
      // 2026-08-13 testdata regeneration) must read as UTC instants on any
      // host — the same naive-as-UTC reading the DuckDB oracle gives them
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // line-key collisions fail BEFORE any work is spent (previously this
    // check ran after both timed passes — a colliding new query name cost
    // a full bench run to discover)
    val benchNames = SparkEntry.queries.keys.toSeq
      .filterNot(SparkEntry.benchExcluded).sorted
    require(benchNames.map(lineKey).distinct.size == benchNames.size,
      "bench line keys collide after q_ stripping — rename the new query")
    val taskCpu = new TaskCpuListener
    spark.sparkContext.addSparkListener(taskCpu)
    // drained-bus task-cpu snapshot; a timeout is logged, not fatal — the
    // affected delta bleeds into the neighbor, same failure mode the old
    // process-cpu channel had ALWAYS
    def taskCpuNanos(): Long = {
      if (!org.apache.spark.GraftBenchBridge.drainListenerBus(spark.sparkContext, 10000L))
        System.err.println("[bench] WARNING: listener bus not drained in 10s — task-cpu attribution may bleed across queries")
      taskCpu.cpuNanos.get()
    }
    // JVM/codegen warmup so the first timed query doesn't absorb one-time
    // class-loading + janino compilation (~4 s measured for the relational
    // family, ~8 s for the text/shingle expression family): run the whole
    // suite once at the smallest scale factor — different parquet files, so
    // nothing of the timed data is cached, only code paths are warm.
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warmDir.isDirectory && warmDir.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath)
      SparkEntry.queries.filterNot(q => SparkEntry.benchExcluded(q._1)).values.foreach { fn =>
        try fn(spark, warmDir.getAbsolutePath).queryExecution.toRdd.foreach(_ => ())
        catch { case _: Throwable => () }
      }
    else System.err.println(if (warmDir.isDirectory)
      s"[bench] warm-up skipped: $warmDir IS the timed dir (won't pre-touch timed data)"
    else
      s"[bench] WARM-UP SKIPPED (no $warmDir): first queries will absorb JIT/codegen cost")
    // serving stores build OUTSIDE the timed region (reported separately as
    // store_write_sec): the q_store_* queries then time read+query only, so
    // a pruning or read-path regression is visible instead of drowned in
    // write I/O. A failed build leaves the memo unset — the queries retry
    // it themselves and surface the error in the errors map.
    val tStores = System.nanoTime()
    val storeWriteSec = try {
      SparkEntry.prepareStores(spark, sfDir)
      (System.nanoTime() - tStores) / 1e9
    } catch { case e: Throwable =>
      System.err.println(s"[bench] store pre-build failed: ${e.getMessage}")
      -1.0
    }
    // per query: (name, wall_sec, task_cpu_sec, proc_cpu_sec, gc_sec, err)
    def runSuite(): Seq[(String, Double, Double, Double, Double, Option[String])] = {
      // collect the previous region's garbage OUTSIDE the timed queries: GC
      // time is attributed to whichever query triggers it, and the store
      // pre-build / previous pass churns enough old-gen to noticeably
      // inflate the first heavy queries' cpu_sec
      System.gc()
      // benchExcluded queries (streaming-engine-built stores) are Verify's
      // job, not the timed loop's — see the doc on SparkEntry.benchExcluded
      SparkEntry.queries.filterNot(q => SparkEntry.benchExcluded(q._1))
        .toSeq.sortBy(_._1).map { case (name, fn) =>
        // drop caches built by the warmup/previous queries: several queries
        // share cached lineages (e.g. the shingle index), and timing one
        // against another's warm cache would flatter it
        spark.catalog.clearCache()
        // task-cpu snapshot (drains the bus) BEFORE the wall clock starts,
        // so the drain wait is never billed to the query's wall
        val tc0 = taskCpuNanos()
        val t0 = System.nanoTime()
        val cpu0 = processCpuNanos()
        val gc0 = gcMillis()
        // full materialization of every output column on the executors —
        // a bare count() lets Catalyst prune unevaluated projections, which
        // would time a row count instead of the query
        val err = try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
        }
        // wall captured first (pure query time), THEN the draining snapshot
        val wall = (System.nanoTime() - t0) / 1e9
        val taskCpuSec = (taskCpuNanos() - tc0) / 1e9
        val cpuSec = { val c = processCpuNanos(); if (c < 0 || cpu0 < 0) -1.0 else (c - cpu0) / 1e9 }
        (name, wall, taskCpuSec, cpuSec, (gcMillis() - gc0) / 1e3, err)
      }
    }
    val loadBefore = loadavgJson()
    val load1Before = loadavg1()
    // UNTIMED priming pass at the TIMED dir (r18; the r17-root-caused JIT
    // transient): with only the sf0.001 code warm-up, the first sf0.1
    // execution of the per-row-kernel queries costs 2–5× their converged
    // band (SimhashProbe: 12.6–27.9 s first vs 4.4–6.2 s converged), so a
    // two-pass min-of-2 protocol never observed steady state and the cpu
    // floors had to bound the transient — a ~4× gate slack on exactly the
    // queries the kernels serve. One discarded pass absorbs the transient;
    // the timed pair then measures the converged band and the floors drop
    // to it (re-derived under this protocol — see bench_cpu_floor.tsv r18
    // note). Warming the timed parquet's page cache is deliberate and
    // protocol-consistent: pass 2 always ran warm and min-of-2 already
    // selected the warm-cache cost. The priming pass stays visible in the
    // sidecar (per-query "warm" array) so the transient's size remains
    // measurable round-over-round; SPARK_GRAFT_SKIP_PRIME=1 restores the
    // old protocol for A/B-measuring the transient itself.
    val warmPass: Option[Seq[(String, Double, Double, Double, Double, Option[String])]] =
      if (sys.env.get("SPARK_GRAFT_SKIP_PRIME").contains("1")) {
        System.err.println("[bench] priming pass SKIPPED (SPARK_GRAFT_SKIP_PRIME=1) — timed passes ride the JIT transient; floors assume a primed JVM")
        None
      } else Some(runSuite())
    // TWO back-to-back timed passes; the line reports each query's MIN wall
    // (and min cpu): transient co-load on the host inflates one pass, not
    // both, so a contaminated window can no longer fake a regression in the
    // headline (three of rounds 5–8 needed manual adjudication for exactly
    // that). The min is the right statistic here — the suite is deterministic
    // compute, where the floor IS the code's cost and everything above it is
    // interference. The sidecar keeps both passes in full.
    val passes = Seq(runSuite(), runSuite())
    // (name, min wall, min task-cpu, min proc-cpu, first error)
    val results = passes.head.indices.map { i =>
      val runs = passes.map(_(i))
      val name = runs.head._1
      val wall = runs.map(_._2).min
      val tcpu = runs.map(_._3).min
      val pcpus = runs.map(_._4)
      val pcpu = if (pcpus.exists(_ < 0)) -1.0 else pcpus.min
      // a query that failed in EITHER pass is broken or flaky — surface it
      (name, wall, tcpu, pcpu, runs.flatMap(_._6).headOption)
    }
    def jstr(s: String): String = Verify.jstr(s) // shared driver-JSON escaper
    // mechanical per-query cpu adjudication: tools/bench_cpu_floor.tsv holds
    // each query's quiet-host min-of-2 TASK-cpu floor (committed; refresh
    // it when a query's cost legitimately changes). Since round 16 the
    // gate input is the SparkListener task-metric sum (executorCpuTime +
    // executorDeserializeCpuTime over exactly the tasks the query's jobs
    // ran — serial loop + drained-bus snapshots make the delta exact),
    // replacing the whole-process CPU delta: process deltas billed
    // co-resident threads (sibling queries' tail GC, listener dispatch) to
    // whoever held the clock — the "attribution high mode" that flagged
    // q_emb_neardup at 9.3 cpu-s in-bench vs 1.5–3.0 standalone on
    // UNCHANGED code for three rounds. Task-cpu is still not load-immune
    // (memory-bandwidth contention charges stall cycles to the task
    // thread), but co-load inflates every query TOGETHER, while a code
    // regression inflates one query against the pack. So the gate
    // normalizes by the MEDIAN cpu-vs-floor ratio (the host factor) and
    // flags only queries inflated beyond 1.3× of it: quiet host ⇒ factor
    // ~1.0, identical to a raw floor check; busy host ⇒ the uniform
    // inflation cancels instead of flagging everything. Driver-side cost
    // (BPE merge loop, k-means, bounded collects) is NOT in the gate
    // basis — it lives in the sidecar's proc-cpu channel.
    // floors were measured at sf0.1 (the driver's per-round bench scale) —
    // at any other scale the ratio is meaningless, so the gate stays silent.
    // Computed BEFORE the stdout line is built: the flag COUNT rides inside
    // the JSON line itself ("cpu_flags") because in r13 the five stderr
    // REGRESSION lines printed before the line were evicted from the
    // driver's 2000-char tail by the line + sbt trailer — the official
    // record showed a clean run while the sidecar carried 5 flags. stderr
    // keeps the per-query detail for humans; the line carries the alarm.
    // shared floor-file loader: explicit UTF-8 (the default-charset read
    // dies on any non-ASCII byte in a comment when file.encoding is ASCII,
    // and the catch-all would silently disarm the whole gate), and a loud
    // stderr note on ANY failure — a silently-disarmed gate looks exactly
    // like a clean pass (this bit us twice: an unreadable comment byte
    // zeroed every floor with no trace, and the advisory channel shipped
    // one round pointing at a floors file that did not exist)
    def loadFloors(path: String, label: String): Map[String, Double] =
      if (new java.io.File(sfDir).getName != "sf0.1") Map.empty
      else try {
        val src = scala.io.Source.fromFile(path, "UTF-8")
        try parseFloors(src.getLines())
        finally src.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $label unavailable: ${e.getMessage}")
        Map.empty
      }
    val cpuFloors: Map[String, Double] =
      loadFloors("tools/bench_cpu_floor.tsv", "cpu floors")
    // failed queries are excluded from the gate entirely: a fast failure's
    // partial cpu yields a far-below-1 ratio that drags the median toward
    // the 1.0 clamp and spuriously flags healthy queries; the errors map
    // (and nonzero exit) already surfaces the failure itself
    val (cpuHostFactor, cpuRegressions) =
      flagCpuRegressions(
        results.collect { case (k, _, tc, _, None) => (k, tc) }, cpuFloors)
    // a factor this far above 1 means either heavy co-load (the load field
    // corroborates) or a slowdown broad enough to move the median — which
    // the relative gate then normalizes away. Say so instead of passing
    // silently; the gate is advisory, so this is a missed-signal guard.
    if (cpuHostFactor > 2.5)
      System.err.println(
        f"[bench] WARNING: cpu host factor $cpuHostFactor%.2f exceeds 2.5 — heavy co-load, or a suite-wide regression the median normalized away; check load + per-query cpu_vs_floor in the sidecar")
    cpuRegressions.foreach { case (k, c, f) =>
      System.err.println(
        f"[bench] CPU REGRESSION $k: min cpu_sec $c%.1f > 1.3x floor $f%.1f (host factor $cpuHostFactor%.2f)")
    }
    // ADVISORY driver-cpu channel (stderr-only — never in the line, never in
    // cpu_flags): the r16 gate basis is executor TASK cpu, which by
    // construction cannot see a driver-side regression (BPE merge loop,
    // k-means iterations, bounded collects). [[perPassOverheads]] supplies
    // the statistic; tools/bench_driver_overhead.tsv holds its quiet-host
    // floors, and the SAME median-normalized relative check surfaces a
    // query whose driver-side cost detached from the pack. Advisory only,
    // because proc-cpu bills co-resident threads to whoever holds the
    // clock — the attribution mode that produced three rounds of false
    // hard-gate flags.
    val overheadFloors: Map[String, Double] =
      loadFloors("tools/bench_driver_overhead.tsv",
        "driver-overhead floors (advisory channel disarmed)")
    // 1.5 s absolute slack, NOT the hard gate's 0.5: the overhead
    // statistic's own cross-run jitter is ~3x task-cpu's (measured p90
    // spread 1.31 s over six quiet runs — see flagCpuRegressions' doc)
    val (ovHostFactor, ovFlags) =
      flagCpuRegressions(perPassOverheads(passes), overheadFloors, absSlack = 1.5)
    ovFlags.foreach { case (k, c, f) =>
      System.err.println(
        f"[bench] ADVISORY driver-cpu $k: overhead $c%.1f s (proc−task) > 1.3x floor $f%.1f (host factor $ovHostFactor%.2f) — driver-side cost detached from its quiet floor; check the sidecar's proc-cpu channel")
    }
    // line keys drop the fixed "q_" prefix (84 queries × 2 chars ≈ 160
    // bytes of budget back); the sidecar keeps full names, and the one
    // un-prefixed query (q1_agg) passes through unchanged — no collisions
    // because every other declared query starts with "q_"
    val qs = results.map { case (k, v, _, _, _) => s"\"" + lineKey(k) + "\":" + f2(v) }
      .mkString("{", ",", "}")
    // TASK-CPU seconds per query as an array POSITIONALLY ALIGNED with
    // the (sorted) `queries` keys (the gate basis since r16; the sidecar
    // keeps the whole-process channel too): under a 32-thread local run
    // CPU can legitimately reach 32x wall, but a WALL-up/CPU-flat delta vs
    // the previous round is outside host load, not a code regression (see
    // README "Reading the bench JSON"). An array instead of a second
    // name→value map keeps the line inside the driver's tail window.
    val cpus_q = results.map { case (_, _, tc, _, _) => f1(tc) }
      .mkString("[", ",", "]")
    // a failed query's elapsed time is ~planning cost, not a result — the
    // errors map (and nonzero exit) is what distinguishes fast from broken.
    // Only FAILED queries are listed ({} = all passed), and messages are
    // capped at 100 chars HERE so the line survives a failure inside the
    // driver's 2KB tail (~1790 chars clean + ~130/failure); the sidecar and
    // stderr carry the longer message.
    val errs = results.collect { case (k, _, _, _, Some(e)) =>
      s"\"" + lineKey(k) + "\":" + jstr(e.take(100))
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // streaming leg 1 runs at sf0.01 regardless of the timed dir (the
    // fixed-floor point); leg 2 re-runs the identical pipeline on the timed
    // dir's rows (~10×) through the SAME batch count, so the pair of
    // rps values in the line demonstrates the per-batch floor
    // amortizing (see streamingBench's doc)
    val streamDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.01")
    var streamErr: Option[String] = None
    def streamLeg(dir: java.io.File, tag: String): Option[StreamStats] =
      if (!dir.isDirectory || streamErr.isDefined) None
      else try { spark.catalog.clearCache(); Some(streamingBench(spark, dir.getAbsolutePath, tag)) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] streaming leg $tag failed: $e")
        streamErr = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
        None
      }
    val streamSmall = streamLeg(streamDir, "small")
    // skip the big leg when the timed dir IS sf0.01 (it would duplicate leg
    // 1) or when leg 1 never ran (sf0.01 absent): the line and sidecar
    // report "big" only alongside "small", so running it alone would spend
    // bench time on stats that are then discarded
    val streamBig =
      if (streamSmall.isEmpty ||
        new java.io.File(sfDir).getCanonicalPath == streamDir.getCanonicalPath) None
      else streamLeg(new java.io.File(sfDir), "big")
    // compact "big" object: only what the amortization claim needs — the
    // sidecar carries the rest
    val bigFrag = streamBig.map(b =>
      s""","big":{"rows":${b.rowsIn},"sec":${f2(b.sec)},"rps":${f1(b.rps)}}""").getOrElse("")
    val streamJson = streamSmall.map(_.frag + bigFrag + "}").getOrElse("null")
    // key present only on failure — every byte of the stdout line counts
    // against the driver's tail window
    val streamErrJson = streamErr.map(e => s""","streaming_error":${jstr(e.take(100))}""").getOrElse("")
    val loadAfter = loadavgJson()
    // ALWAYS present: the alarm channel must be provably alive in a clean
    // run, not distinguishable-from-evicted only when it fires. 0 means
    // "gate armed, no flags"; -1 means "gate NOT armed" (non-sf0.1 scale,
    // or the floor file failed to load) — without the sentinel a silently
    // disarmed gate would read as a clean pass, the exact failure mode
    // this field exists to expose.
    val cpuFlagsJson =
      if (cpuFloors.isEmpty) "-1" else cpuRegressions.size.toString
    // the line self-adjudicates since r16: "hf" is the host factor the gate
    // normalized by (≈1 quiet, ≫1 co-loaded — meaningless when cpu_flags is
    // -1/gate unarmed), and the flagged NAMES ride along whenever the count
    // is nonzero (capped at 8: the count says how many, the sidecar has the
    // rest). r15's poster child: a 22.2 s q_j4_get_trace wall under load
    // 5.00 needed judge sidecar access to classify; with hf on the line it
    // reads as co-load directly.
    val hfJson = s""","hf":${f2(cpuHostFactor)}"""
    // wall-channel self-adjudication (r20, see wallFactor's doc): always
    // present like cpu_flags — a silently unarmed channel must not read
    // as a quiet pass, so the unarmed case is the -1 sentinel, not absent.
    // A run with ANY failed query is also the sentinel: a failure's wall
    // is ~planning cost (see the errors-map comment), so its truncated
    // total deflates the factor — a co-loaded broken run could read
    // "quiet", and a low broken total must never become a refresh minimum
    val wallFloors: Map[String, Double] =
      loadFloors("tools/bench_wall_floor.tsv", "wall floor (wf unarmed)")
    val anyFailed = results.exists(_._5.isDefined)
    val wallF =
      if (anyFailed) None
      else wallFactor(total, wallFloors, Some(results.size),
        scala.util.Try(cpus.toInt).toOption)
    // hf is only evidence when the cpu gate is armed (its own floors
    // loaded): unarmed flagCpuRegressions returns a placeholder 1.0
    val hfForBand = if (cpuFloors.isEmpty) None else Some(cpuHostFactor)
    val wfJson = wallF.map(v => s""","wf":${f2(v)}""").getOrElse(""","wf":-1""")
    wallF.foreach { v =>
      val band = wallBand(v, hfForBand)
      if (band != "quiet")
        System.err.println(
          f"[bench] ADVISORY wall factor $v%.2f (total $total%.2f s vs quiet floor ${wallFloors("total")}%.2f) hf $cpuHostFactor%.2f — $band: " +
            (band match {
              case "coload" => "wall-up/cpu-flat scheduler co-load; walls are environment, not code"
              case "inflated" => "wall elevated but the cpu gate is unarmed; no basis to attribute it"
              case _ => "wall AND cpu elevated; check load + per-query cpu_vs_floor in the sidecar"
            }))
    }
    def flaggedFrag(names: Seq[(String, Double, Double)]): String =
      if (names.isEmpty) ""
      else names.map(r => jstr(lineKey(r._1)))
        .mkString(""","cpu_flagged":[""", ",", "]")
    val flaggedJson = flaggedFrag(cpuRegressions.take(8))
    // capped variant for the ladder's tier 5 (see degradeLadder's doc):
    // the count stays in cpu_flags, sidecar + stderr keep the full list
    val flaggedCapped = flaggedFrag(cpuRegressions.take(FlaggedNameCap))
    // suite task-cpu TOTAL (r22, r21 VERDICT task 3): the sum of per-query
    // MIN task-cpu — the co-load-immune counterpart of `value`. r21 proved
    // the wall total can be worthless (wf 3.14) while task-cpu stays
    // adjudicable (hf 1.00); with the total ON the line, a round-over-round
    // cpu signal survives even when every wall is environment. Always
    // present (task metrics have no sentinel case), ~20 bytes, and kept in
    // the fixed part of the line so no ladder tier sheds it.
    val cpuTotalJson = cpuTotalFrag(results.map(_._3))
    def mkLine(qjson: String, cpuJson: String, flagged: String,
        errJson: String, streaming: String): String =
      s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qjson,"cpu_sec":$cpuJson,"cpu_flags":$cpuFlagsJson$hfJson$wfJson$cpuTotalJson$flagged,"errors":$errJson,"store_write_sec":${f2(storeWriteSec)},"load":[$load1Before,${loadavg1()}],"streaming":$streaming$streamErrJson,"sf":${jstr(sfDir)}}"""
    // degrade ladder, CHECKED at each tier (a long line is worthless — the
    // driver keeps only the last ~2KB of stdout, and an overflow loses the
    // whole result exactly when it carries failure diagnostics). Tier order
    // and rationale live on degradeLadder; the per-QUERY wall map is still
    // the last thing sacrificed — it is the round-over-round comparison
    // surface, and at 60+ queries the full-precision line started
    // overflowing, which under the oldest ladder silently dropped the map.
    val q1dec = results.map { case (k, v, _, _, _) => s"\"" + lineKey(k) + "\":" + f1(v) }
      .mkString("{", ",", "}")
    val cpuInt = results.map { case (_, _, tc, _, _) => math.round(tc).toString }
      .mkString("[", ",", "]")
    val streamCompact = streamSmall.map(sm =>
      s"""{"small_rps":${f1(sm.rps)}${streamBig.map(b =>
        s""","big_rps":${f1(b.rps)}""").getOrElse("")}}""").getOrElse("null")
    val errKeys = results.collect {
      case (k, _, _, _, Some(_)) => s"\"" + lineKey(k) + "\":\"\"" }.mkString("{", ",", "}")
    val errCount = s"""{"_failed":${results.count(_._5.isDefined)}}"""
    val line = degradeLadder(mkLine, qs, q1dec, cpus_q, cpuInt,
      flaggedJson, flaggedCapped, errs, errKeys, errCount,
      streamJson, streamCompact)
    // full-precision per-query wall+CPU detail for BOTH passes goes to a
    // sidecar file (the stdout line is the driver's parse target and must
    // fit its tail window)
    try {
      val detail = results.zipWithIndex.map { case ((k, v, tc, pc, e), i) =>
        // [wall_sec, task_cpu_sec, proc_cpu_sec, gc_sec] per pass (r16
        // schema — see BENCH_SCHEMA.md): task cpu is the gate basis, proc
        // cpu keeps driver-side cost visible, gc disambiguates heap
        // pressure from outside contention (see gcMillis)
        val pj = passes.map(p => s"[${p(i)._2},${p(i)._3},${p(i)._4},${p(i)._5}]").mkString("[", ",", "]")
        // the discarded priming pass, same [wall, task_cpu, proc_cpu, gc]
        // shape as a "passes" entry — the JIT transient's size per query
        // (warm cpu vs min timed cpu) stays measurable round-over-round.
        // A priming-pass FAILURE is nulled with its message beside it: the
        // aborted attempt's partial wall/cpu would otherwise read as a
        // plausible transient measurement (and stderr — the only other
        // place the failure lands — is evicted by the driver's tail)
        val warmFrag = warmPass.map { w =>
          w(i)._6 match {
            case Some(err) => s""","warm":null,"warm_error":${jstr(err.take(200))}"""
            case None => s""","warm":[${w(i)._2},${w(i)._3},${w(i)._4},${w(i)._5}]"""
          }
        }.getOrElse("")
        val floorFrag = cpuFloors.get(k).map(f =>
          s""","cpu_floor":$f,"cpu_vs_floor":${if (f > 0 && tc >= 0) f1(tc / f) else "null"}""").getOrElse("")
        s"\"$k\":{\"wall_sec\":$v,\"cpu_sec\":$tc,\"pcpu_sec\":$pc,\"passes\":$pj$warmFrag$floorFrag,\"error\":${e.map(jstr).getOrElse("null")}}"
      }.mkString("{", ",", "}")
      val streamDetail = (streamSmall, streamBig) match {
        case (Some(s), Some(b)) => s"""{"small":${s.detail},"big":${b.detail}}"""
        case (Some(s), None) => s"""{"small":${s.detail}}"""
        case _ => "null"
      }
      val regJson = cpuRegressions.map { case (k, c, f) =>
        s"\"$k\":[${f1(c)},${f1(f)}]" }.mkString("{", ",", "}")
      val w = new java.io.PrintWriter("target/bench_detail.json", "UTF-8")
      // wall channel, full form (the line only carries the bare "wf"):
      // total, the committed floor it was divided by, and the band
      val wallFrag = wallF match {
        case Some(v) =>
          s""","wall_total_sec":${f2(total)},"wall_floor_total":${f2(wallFloors("total"))},"wall_factor":${f2(v)},"wall_band":${jstr(wallBand(v, hfForBand))}"""
        case None =>
          // "partial" (a failed query truncated the total — not comparable
          // to the floor) is kept distinct from "unarmed" (no floor to
          // compare against). The loaded floor value is written in the
          // PARTIAL case only (r21, ADVICE): there it is the one piece of
          // context that lets a reader judge how far the truncated total
          // sits from quiet. An "unarmed" run keeps null even when a floor
          // loaded — the fingerprint-mismatch unarm (wrong core count /
          // query set) exists precisely because that floor is the wrong
          // denominator for this run, so re-presenting it would invite the
          // exact misreading the guard withholds; wall_factor stays null.
          val floorJson =
            if (anyFailed) wallFloors.get("total").filter(_ > 0)
              .map(f2).getOrElse("null")
            else "null"
          s""","wall_total_sec":${f2(total)},"wall_floor_total":$floorJson,"wall_factor":null,"wall_band":${jstr(if (anyFailed) "partial" else "unarmed")}"""
      }
      try w.println(s"""{"queries":$detail,"cpu_host_factor":${f2(cpuHostFactor)},"cpu_regressions":$regJson$wallFrag,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"store_write_sec":$storeWriteSec,"streaming":$streamDetail,"sf":${jstr(sfDir)},"git_sha":${jstr(gitProvenance())},"probe_jvmflags":${jstr(sys.env.getOrElse("SPARK_GRAFT_PROBE_JVMFLAGS", ""))}}""")
      finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    if (line.length > 1800)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars — may overflow the driver's 2000-char tail window")
    // shutdown WARNs ("Failed to cancel job group…") land on stderr AFTER
    // the JSON line and eat into the driver's tail window — silence them
    // once the line is the last thing that matters
    spark.sparkContext.setLogLevel("ERROR")
    println(line)
    spark.stop()
    if (results.exists(_._5.isDefined) || streamErr.isDefined) sys.exit(1)
  }
}
