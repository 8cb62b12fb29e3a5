package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.flagCpuRegressions]]'s host-factor normalization: the
  * cpu-floor gate must stay quiet when co-load inflates EVERY query
  * uniformly (measured 2× cpu inflation host-wide with zero code change)
  * yet still catch one query regressing against the pack.
  */
final class BenchSpec extends AnyFunSuite {

  private val floors = Map("a" -> 2.0, "b" -> 4.0, "c" -> 10.0, "d" -> 0.4, "e" -> 8.0)

  test("quiet host: factor ~1, a single 2x query flags, at-floor queries don't") {
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> 2.1, "b" -> 8.0, "c" -> 10.2, "d" -> 0.4, "e" -> 7.9), floors)
    assert(math.abs(factor - 1.02) < 1e-9) // median of sorted ratios (0.99, 1.0, 1.02, 1.05, 2.0)
    assert(flagged.map(_._1) == Seq("b")) // 8.0 > 4.0*1.02*1.3+0.5
  }

  test("uniform 2x co-load inflation cancels instead of flagging everything") {
    val inflated = Seq("a" -> 4.0, "b" -> 8.0, "c" -> 20.0, "d" -> 0.8, "e" -> 16.0)
    val (factor, flagged) = Bench.flagCpuRegressions(inflated, floors)
    assert(factor == 2.0)
    assert(flagged.isEmpty)
  }

  test("saturation-biased co-load: heavy-median cancels while shorts sit at floor") {
    // the r12 measurement: a ~4-core background tenant inflates every
    // machine-saturating query ~1.5× while sub-second queries stay AT
    // floor — an all-query median would read ~1.0 and flag the whole
    // heavy family; the heavy-only median cancels it
    val fl = Map("h1" -> 5.0, "h2" -> 8.0, "h3" -> 12.0, "h4" -> 20.0,
      "h5" -> 40.0, "s1" -> 0.5, "s2" -> 0.6, "s3" -> 0.8)
    val meas = Seq("h1" -> 7.5, "h2" -> 12.0, "h3" -> 18.0, "h4" -> 30.0,
      "h5" -> 60.0, "s1" -> 0.5, "s2" -> 0.6, "s3" -> 0.8)
    val (factor, flagged) = Bench.flagCpuRegressions(meas, fl)
    assert(factor == 1.5)
    assert(flagged.isEmpty)
    // a query ALSO regressed on top of the bias still flags against its
    // heavy siblings' median
    val meas2 = meas.map { case ("h3", _) => "h3" -> 36.0; case x => x }
    val (f2, flagged2) = Bench.flagCpuRegressions(meas2, fl)
    assert(f2 == 1.5)
    assert(flagged2.map(_._1) == Seq("h3"))
  }

  test("fewer than five heavy floors falls back to the all-query median") {
    // four heavy floors (a,b,c,e) → fallback; the light query d's ratio is
    // the outlier that moves the all-median (3.0) away from the heavy-only
    // median (2.5), so using `heavy` unconditionally would fail this
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> 2.0, "b" -> 8.0, "c" -> 30.0, "e" -> 24.0, "d" -> 4.0), floors)
    assert(factor == 3.0) // median of (1.0, 2.0, 3.0, 3.0, 10.0) — d included
    assert(flagged.map(_._1) == Seq("d")) // 4.0 > 0.4*3.0*1.3 + 0.5
  }

  test("a real regression still flags THROUGH uniform co-load") {
    // everything 2x (co-load), but c ALSO tripled on top of it
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> 4.0, "b" -> 8.0, "c" -> 60.0, "d" -> 0.8, "e" -> 16.0), floors)
    assert(factor == 2.0)
    assert(flagged == Seq(("c", 60.0, 10.0))) // 60 > 10*2*1.3+0.5
  }

  test("a faster-than-floor host clamps to factor 1 — the gate never tightens") {
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> 1.0, "b" -> 2.0, "c" -> 5.0, "d" -> 0.2, "e" -> 4.0), floors)
    assert(factor == 1.0)
    assert(flagged.isEmpty)
  }

  test("sentinel cpu (-1), unknown queries, and zero floors are excluded") {
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> -1.0, "zz" -> 99.0, "z0" -> 99.0), floors + ("z0" -> 0.0))
    assert(factor == 1.0 && flagged.isEmpty)
  }

  test("even-count median averages the two middle ratios") {
    // ratios sorted: (1.0, 1.0, 2.0, 2.1) — upper-middle would say 2.0 and
    // let "c" hide inside a fake host factor; the averaged 1.5 flags it
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> 2.0, "b" -> 4.0, "c" -> 21.0, "e" -> 16.0), floors)
    assert(factor == 1.5)
    assert(flagged == Seq(("c", 21.0, 10.0))) // 21 > 10*1.5*1.3+0.5 = 20.0
  }

  test("lineKey strips exactly the fixed q_ prefix and nothing else") {
    assert(Bench.lineKey("q_dedup_exact") == "dedup_exact")
    assert(Bench.lineKey("q1_agg") == "q1_agg") // the one un-prefixed query
    assert(Bench.lineKey("quality") == "quality") // prefix, not substring
    // the stripped namespace stays collision-free across the declared suite
    val keys = SparkEntry.queries.keys.toSeq.map(Bench.lineKey)
    assert(keys.distinct.size == keys.size)
  }

  test("sub-second queries ride the +0.5s absolute slack") {
    // others at floor pin the host factor to 1; d is 2.25x relative
    // (floor 0.4, measured 0.9) but within the 0.4*1.3+0.5 = 1.02 slack
    val (factor, flagged) = Bench.flagCpuRegressions(
      Seq("a" -> 2.0, "b" -> 4.0, "c" -> 10.0, "d" -> 0.9), floors)
    assert(factor == 1.0 && flagged.isEmpty)
  }

  test("the advisory channel's wider absolute slack absorbs overhead " +
      "jitter the hard-gate slack flags") {
    // r18 calibration: the proc−task statistic's cross-run p90 spread is
    // 1.31 s (six quiet runs), ~3x task-cpu's — a 2.4 s overhead on a
    // 1.2 floor is inside that jitter (2.4 ≤ 1.2*1.3+1.5 = 3.06) but the
    // hard gate's 0.5 s slack would cry wolf (2.4 > 2.06)
    val oflrs = Map("a" -> 10.0, "b" -> 10.0, "c" -> 10.0, "d" -> 10.0,
      "e" -> 10.0, "x" -> 1.2)
    val meas = Seq("a" -> 10.0, "b" -> 10.0, "c" -> 10.0, "d" -> 10.0,
      "e" -> 10.0, "x" -> 2.4)
    assert(Bench.flagCpuRegressions(meas, oflrs)._2.nonEmpty)
    assert(Bench.flagCpuRegressions(meas, oflrs, absSlack = 1.5)._2.isEmpty)
    // a genuinely detached driver cost (multi-second, the class the
    // channel exists for) still flags under the wider slack
    assert(Bench.flagCpuRegressions(meas.init :+ ("x" -> 3.2), oflrs,
      absSlack = 1.5)._2 == Seq(("x", 3.2, 1.2)))
  }

  test("advisory overhead is per-pass: cross-pass channel minima cannot " +
      "cancel real driver cost") {
    // the r17 self-review bug this pins: pass 1 pc=10/tc=2 (overhead 8),
    // pass 2 pc=20/tc=15 (overhead 5) — min(pc) − min(tc) = 10 − 15 would
    // clamp to 0 and hide BOTH passes' real overhead; per-pass min is 5
    def pass(tc: Double, pc: Double, err: Option[String] = None) =
      Seq(("q_x", 1.0, tc, pc, 0.0, err))
    assert(Bench.perPassOverheads(Seq(pass(2.0, 10.0), pass(15.0, 20.0)))
      == Seq(("q_x", 5.0)))
    // the proc-cpu sentinel (−1) in ANY pass excludes the query, matching
    // the hard gate's exclusion rule — a partial channel must not flag
    assert(Bench.perPassOverheads(Seq(pass(2.0, -1.0), pass(15.0, 20.0))).isEmpty)
    // same for a pass that errored: its cpu is partial, not a measurement
    assert(Bench.perPassOverheads(
      Seq(pass(2.0, 10.0, Some("boom")), pass(15.0, 20.0))).isEmpty)
    // task-cpu above proc-cpu in one pass (attribution skew) clamps that
    // pass to 0 and the min reports no overhead rather than a negative
    assert(Bench.perPassOverheads(Seq(pass(12.0, 10.0), pass(15.0, 20.0)))
      == Seq(("q_x", 0.0)))
    // ragged or empty input fails loudly up front (the r17 ADVICE item):
    // the implicit invariant — equal-length, same-order runSuite results —
    // must surface as a clear message, not an IndexOutOfBounds downstream
    val ragged = intercept[IllegalArgumentException] {
      Bench.perPassOverheads(Seq(pass(2.0, 10.0), pass(15.0, 20.0) ++ pass(1.0, 2.0)))
    }
    assert(ragged.getMessage.contains("same-length passes"))
    intercept[IllegalArgumentException] { Bench.perPassOverheads(Seq.empty) }
  }

  test("wall channel: factor vs the committed floor, unarmed on a missing " +
      "or zero floor, bands split co-load from contention") {
    // armed: the r19 official (70.69 s) against the committed 40.06 floor
    assert(Bench.wallFactor(70.69, Map("total" -> 40.06)).exists(v => math.abs(v - 1.7646) < 1e-3))
    // unarmed: no floors loaded (non-sf0.1 run / file missing) or a zero
    // floor — the caller emits the -1 sentinel, never a fake factor
    assert(Bench.wallFactor(50.0, Map.empty).isEmpty)
    assert(Bench.wallFactor(50.0, Map("total" -> 0.0)).isEmpty)
    // bands, from the committed record: six quiet r19 runs sat at
    // wf 1.00-1.19 -> "quiet" through the 1.25 jitter headroom
    assert(Bench.wallBand(1.19, Some(1.0)) == "quiet")
    assert(Bench.wallBand(1.25, Some(3.0)) == "quiet") // wf rules first; hf moot
    // the r19 official: wf 1.76 at hf 1.00 — the wall-up/cpu-flat
    // scheduler-co-load signature (negative controls in the floor TSV)
    assert(Bench.wallBand(1.76, Some(1.0)) == "coload")
    assert(Bench.wallBand(1.26, Some(1.15)) == "coload") // hf boundary inclusive
    // both channels elevated: contention broad enough to inflate cpu too
    assert(Bench.wallBand(1.7, Some(2.0)) == "contended")
    // cpu gate unarmed -> its placeholder hf 1.0 is NOT evidence: an
    // elevated wall must not assert the cpu-flat "coload" verdict, only
    // that the wall is inflated with nothing to attribute it to
    assert(Bench.wallBand(1.76, None) == "inflated")
    assert(Bench.wallBand(1.1, None) == "quiet") // quiet needs no hf
  }

  test("gitHeadSha resolves loose refs, packed refs, detached HEAD, and " +
      "degrades to 'unknown' — never throws") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("fakegit").toString
    def write(rel: String, body: String): Unit = {
      val p = Paths.get(s"$dir/$rel")
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes("UTF-8")): Unit
    }
    // loose ref
    write("HEAD", "ref: refs/heads/main\n")
    write("refs/heads/main", "aaaa000011112222333344445555666677778888\n")
    assert(Bench.gitHeadSha(dir) == "aaaa000011112222333344445555666677778888")
    // packed ref (loose file absent) — the '^' peeled-tag line must be skipped
    Files.delete(Paths.get(s"$dir/refs/heads/main"))
    write("packed-refs",
      "# pack-refs with: peeled fully-peeled sorted\n" +
        "bbbb000011112222333344445555666677778888 refs/heads/main\n" +
        "^cccc000011112222333344445555666677778888\n")
    assert(Bench.gitHeadSha(dir) == "bbbb000011112222333344445555666677778888")
    // detached HEAD: the SHA is in HEAD itself
    write("HEAD", "dddd000011112222333344445555666677778888\n")
    assert(Bench.gitHeadSha(dir) == "dddd000011112222333344445555666677778888")
    // no .git at all → "unknown", no exception
    assert(Bench.gitHeadSha(s"$dir/nonexistent") == "unknown")
    // gitfile redirect (linked worktree / submodule): ".git" is a one-line
    // pointer file; the worktree gitdir holds HEAD and declares a
    // commondir where refs + packed-refs actually live
    write("wt/dotgit", s"gitdir: $dir/gitdir/worktrees/wt\n")
    write("gitdir/worktrees/wt/HEAD", "ref: refs/heads/feature\n")
    write("gitdir/worktrees/wt/commondir", "../..\n")
    write("gitdir/refs/heads/feature", "eeee000011112222333344445555666677778888\n")
    assert(Bench.gitHeadSha(s"$dir/wt/dotgit") == "eeee000011112222333344445555666677778888")
    // the real repo resolves to a 40-hex SHA (this test runs inside it)
    assert(Bench.gitHeadSha().matches("[0-9a-f]{40}") || Bench.gitHeadSha() == "unknown")
    // dirty check: runs without throwing; in this repo's CI context git is
    // available so a definite answer comes back, and the provenance string
    // is SHA-shaped with the documented suffix grammar either way
    assert(Bench.gitProvenance().matches("([0-9a-f]{40}|unknown)(-dirty|-dirtycheck-failed)?"))
  }

  test("gitDirty is scoped to build inputs: an untracked top-level JSON " +
      "does NOT dirty the SHA, a touched src file DOES (r20 verdict task 1)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("scratchrepo")
    def sh(args: String*): Unit = {
      val pb = new ProcessBuilder(args: _*).directory(dir.toFile)
        .redirectErrorStream(true)
      pb.environment.keySet.removeIf(_.startsWith("GIT_")): Unit
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"${args.mkString(" ")} failed: $out")
    }
    sh("git", "init", "-q")
    sh("git", "config", "user.email", "spec@example.invalid")
    sh("git", "config", "user.name", "spec")
    Files.createDirectories(dir.resolve("src"))
    Files.createDirectories(dir.resolve("tools"))
    Files.write(dir.resolve("src/A.scala"), "object A\n".getBytes("UTF-8"))
    Files.write(dir.resolve("build.sbt"), "// build\n".getBytes("UTF-8"))
    Files.write(dir.resolve("tools/bench_cpu_floor.tsv"), "q_x\t1.0\n".getBytes("UTF-8"))
    sh("git", "add", "-A")
    sh("git", "commit", "-q", "-m", "seed")
    assert(Bench.gitDirty(dir.toString).contains(false))
    // driver-artifact shapes (untracked top-level JSON, like
    // BENCH_r21.json / CORRECTNESS_r21.json) must NOT dirty the SHA —
    // they are outside the binary's build inputs
    Files.write(dir.resolve("BENCH_r99.json"), "{}".getBytes("UTF-8"))
    assert(Bench.gitDirty(dir.toString).contains(false))
    // a tracked NON-build file changing is also out of scope
    Files.write(dir.resolve("build.sbt.bak"), "x".getBytes("UTF-8"))
    assert(Bench.gitDirty(dir.toString).contains(false))
    // but a touched build input must read dirty: src/** …
    Files.write(dir.resolve("src/A.scala"), "object A2\n".getBytes("UTF-8"))
    assert(Bench.gitDirty(dir.toString).contains(true))
    sh("git", "checkout", "--", "src/A.scala")
    assert(Bench.gitDirty(dir.toString).contains(false))
    // … and build.sbt itself, including an UNTRACKED new source file
    Files.write(dir.resolve("src/B.scala"), "object B\n".getBytes("UTF-8"))
    assert(Bench.gitDirty(dir.toString).contains(true))
    Files.delete(dir.resolve("src/B.scala"))
    assert(Bench.gitDirty(dir.toString).contains(false))
    // … and the floor TSVs: they are runtime inputs to the recorded
    // cpu_flags/hf/wf verdicts, so an uncommitted floor edit must not
    // certify a clean SHA
    Files.write(dir.resolve("tools/bench_cpu_floor.tsv"),
      "q_x\t9.9\n".getBytes("UTF-8"))
    assert(Bench.gitDirty(dir.toString).contains(true))
  }

  test("parseFloors skips comments and blank lines; a tabbed comment can " +
      "no longer disarm the channel (ADVICE r20)") {
    val floors = Bench.parseFloors(Iterator(
      "# provenance note with a\ttab and non-numeric tail",
      "",
      "q_x\t2.5",
      "# trailing note",
      "total\t40.06"))
    assert(floors == Map("q_x" -> 2.5, "total" -> 40.06))
  }

  test("degrade ladder sheds flagged NAMES before any streaming " +
      "information (r21 VERDICT task 2): a 7-flag co-load line still " +
      "carries small_rps/big_rps") {
    // mkLine mirrors main's renderer shape: fixed part + the five
    // ladder-controlled fragments. Sizes emulate the r21 official: a
    // ~1510-char 1-decimal query map, ~150 chars of flagged names, a
    // ~95-char full streaming frag — full-precision and cpu tiers always
    // overflow, so the ladder's choice is exactly "flag names vs streaming"
    def mk(q: String, cpu: String, flagged: String, errs: String,
        stream: String): String =
      s"""{"metric":"total","value":125.96,"queries":$q,"cpu_sec":$cpu,"cpu_flags":7,"hf":1.00,"wf":3.14,"cpu_total":160.2$flagged,"errors":$errs,"streaming":$stream}"""
    // 1572 chars — calibrated so tier 5 (capped flags + FULL streaming,
    // 1941/1877 chars) still overflows and tier 6 (capped + compact
    // streaming, 1814) is the first fit, mirroring the r21 official's
    // crowding
    val qs = (1 to 79).map(i => s""""qryx_name_$i":12.345678""").mkString("{", ",", "}")
    val q1dec = (1 to 79).map(i => s""""qryx_name_$i":12.3""").mkString("{", ",", "}")
    val cpuFull = (1 to 79).map(_ => "12.3").mkString("[", ",", "]")
    val cpuInt = (1 to 79).map(_ => "12").mkString("[", ",", "]")
    val names = Seq("q1_agg", "a3_dependency_links", "a4_dependency_windows",
      "ann_ivf_int8_recall", "j4_trace_many", "sc6_json", "store_compacted")
    def frag(ns: Seq[String]) =
      ns.map("\"" + _ + "\"").mkString(""","cpu_flagged":[""", ",", "]")
    val full = frag(names)
    val capped = frag(names.take(Bench.FlaggedNameCap))
    val streamFull = """{"rows":10000,"batches":5,"sec":10.63,"rps":940.7,"big":{"rows":100000,"sec":15.36,"rps":6510.6}}"""
    val streamCompact = """{"small_rps":940.7,"big_rps":6510.6}"""
    val line = Bench.degradeLadder(mk, qs, q1dec, cpuFull, cpuInt,
      full, capped, "{}", "{}", """{"_failed":0}""", streamFull, streamCompact)
    assert(line.length <= 1860)
    // the streaming rates survive; the flagged list is the capped 3
    assert(line.contains("small_rps") && line.contains("big_rps"))
    assert(line.contains(capped) && !line.contains(full))
    // the query map — the round-over-round surface — is intact
    assert(line.contains(q1dec))
    // an UNCROWDED line keeps everything: full flags, full streaming
    val small = (1 to 10).map(i => s""""q$i":1.2""").mkString("{", ",", "}")
    val easy = Bench.degradeLadder(mk, small, small, "[1.0]", "[1]",
      full, capped, "{}", "{}", """{"_failed":0}""", streamFull, streamCompact)
    assert(easy.contains(full) && easy.contains(streamFull))
  }

  test("cpu_total fragment: sum of per-query min task-cpu, 1 decimal, " +
      "always-present grammar (r21 VERDICT task 3)") {
    assert(Bench.cpuTotalFrag(Seq(1.25, 2.0, 0.05)) == ""","cpu_total":3.3""")
    assert(Bench.cpuTotalFrag(Seq.empty) == ""","cpu_total":0.0""")
  }

  test("wallFactor unarms on a query-set or core-count fingerprint " +
      "mismatch and arms on a match or an un-fingerprinted floor (r21)") {
    val floors = Map("total" -> 40.06, "total_n" -> 79.0, "total_cpus" -> 32.0)
    // matching fingerprints: armed; the fingerprint keys are not floors
    assert(Bench.wallFactor(44.0, floors, Some(79), Some(32)).isDefined)
    // suite size drifted (query added/removed): unarmed, not a skewed wf
    assert(Bench.wallFactor(44.0, floors, Some(80), Some(32)).isEmpty)
    // lower-core PERF leg: the 32-core wall floor does not apply there —
    // unarmed instead of self-labeling "coload" on a quiet host
    assert(Bench.wallFactor(44.0, floors, Some(79), Some(8)).isEmpty)
    // legacy floor file without the fingerprints keeps the old behavior
    assert(Bench.wallFactor(44.0, Map("total" -> 40.06), Some(80), Some(8)).isDefined)
    // caller that states neither shape (spec call sites) is not gated
    assert(Bench.wallFactor(44.0, floors).isDefined)
  }
}
