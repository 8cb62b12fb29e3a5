package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc diagnosis main for the q_dedup_simhash task-cpu bimodality
  * (r16 TSV: quiet-host runs land in a ~12 s or a ~24 s mode, RUN-level —
  * both passes of a bench run agree — with gc=0 and identical code).
  *
  * Separates the two hypothesis classes by variance structure:
  *  - intra-JVM stable + inter-JVM bimodal → a per-JVM compilation coin
  *    flip (C2 inlining/profile decisions around the MD5 hot loop);
  *  - intra-JVM drift (early runs fast, later slow, or vice versa) →
  *    cumulative in-process state (code-cache pressure, profile
  *    pollution from the rest of the suite).
  *
  * `SPARK_GRAFT_PROBE_WARM=suite` reproduces the bench context (full
  * suite once at sf0.001 before measuring); `self` (default) warms only
  * the probed query. `SPARK_GRAFT_PROBE_RUNS` (default 6) measured runs.
  * One line per run: `probe simhash run=K wall=W task_cpu=C`.
  *
  * FINDING (r17, measured — full provenance in tools/bench_cpu_floor.tsv
  * "ROUND-17 SIMHASH BIMODALITY DIAGNOSIS"): work is constant
  * (tasks/stages/input_records pinned across every run), so the variance
  * is a JIT warm-up transient — suite-warmed run 1 costs 12.6-27.9 s
  * task-cpu, every later run converges to 4.4-6.2 s. The two-pass bench
  * rides the transient, producing the run-level "modes". Converting
  * SimHashSig off CodegenFallback collapsed the pre-fix per-JVM
  * converged-mode split (~3.3 vs ~6) to one band; the floor stays at the
  * transient bound (see the TSV note for the false-flag arithmetic).
  *
  * NEGATIVE RESULT (r17, so nobody re-tries it): a per-thread token→hash60
  * memo in the SimHashSig kernel (~100% hit rate — sf0.1 has 270k token
  * occurrences over 31 distinct) left the converged task-cpu UNCHANGED
  * (3-6 s band, 2 fresh JVMs × 5 runs). The per-token md5 is NOT the
  * query's steady-state cost center; the banded self-join + distinct is.
  * The memo was reverted as unmeasurable complexity.
  *
  * r18: generalized — `SPARK_GRAFT_PROBE_QUERY` picks any `SparkEntry`
  * query (default stays `q_dedup_simhash`), so the same
  * first-execution-vs-converged method settles other suspected-transient
  * elevations (first use: `q_sc6_json`, the r17 verdict's open question).
  */
object SimhashProbe {
  private final class CpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val inputRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        cpuNanos.addAndGet(m.executorCpuTime + m.executorDeserializeCpuTime)
        tasks.incrementAndGet()
        inputRecords.addAndGet(m.inputMetrics.recordsRead): Unit
      }
    }
    override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.incrementAndGet(): Unit
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "6").toInt
    val warm = sys.env.getOrElse("SPARK_GRAFT_PROBE_WARM", "self")
    val query = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERY", "q_dedup_simhash")
    require(SparkEntry.queries.contains(query), s"unknown probe query $query")
    require(!SparkEntry.benchExcluded(query),
      s"$query is benchExcluded (streaming-engine-built store) — the probe's " +
        "batch loop cannot run it")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new CpuListener
    spark.sparkContext.addSparkListener(cpu)
    def snap(): (Long, Long, Long, Long) = {
      if (!org.apache.spark.GraftBenchBridge.drainListenerBus(spark.sparkContext, 10000L))
        System.err.println("[probe] WARNING: bus not drained")
      (cpu.cpuNanos.get(), cpu.tasks.get(), cpu.inputRecords.get(), cpu.stages.get())
    }
    val warmDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      .getAbsolutePath
    // SPARK_GRAFT_PROBE_INTERLEAVE (r18): "warm" runs the REST of the suite
    // at sf0.001 BETWEEN measured runs, "sfdir" at the timed dir (the bench
    // context exactly). Separates the profile-pollution hypothesis for the
    // in-bench vs back-to-back convergence gap: back-to-back runs in one
    // JVM converge low, so if the SAME JVM re-elevates when 80 other
    // queries execute between measurements, the interleaving IS the
    // mechanism; if it stays converged, the gap lives elsewhere.
    val interleave = sys.env.getOrElse("SPARK_GRAFT_PROBE_INTERLEAVE", "none")
    // validate up front (like the probe-query check): a typo ("sfDir" for
    // "sfdir") must refuse, not silently run the no-interleave protocol
    // and print plausible output measuring the wrong thing
    require(Set("none", "warm", "sfdir")(interleave),
      s"unknown SPARK_GRAFT_PROBE_INTERLEAVE '$interleave' — expected none|warm|sfdir")
    // serving stores build OUTSIDE the measured loop (the Bench pattern):
    // without this, a store-backed probe query's FIRST sfDir run would
    // time the one-time store delete+rewrite and report it as a "JIT
    // transient" — a wrong adjudication the method could not distinguish.
    // Gated: the build costs ~21 s per dir, so a probe that touches no
    // store (the default simhash run) skips it. The name check is a
    // hand-enumeration of the store-backed families; a missed future name
    // fails SAFE AND LOUD — ensureStore rebuilds in-loop and run 1's
    // store-write elevation plus the build's own stderr make it obvious.
    val storeBacked = query.startsWith("q_store_") ||
      query.startsWith("q_ann_ivf") || query == "q_shard_export"
    if (storeBacked || interleave != "none")
      try { SparkEntry.prepareStores(spark, warmDir); SparkEntry.prepareStores(spark, sfDir) }
      catch { case e: Throwable =>
        System.err.println(s"[probe] store pre-build failed (store-backed queries will rebuild in-loop): ${e.getMessage}")
      }
    // excludeProbed: the warm-up must INCLUDE the probed query (that is the
    // bench context r17's transcripts were captured under — Bench's own
    // sf0.001 warm runs everything); the interleave legs must EXCLUDE it so
    // the measured runs stay the query's only executions
    def runSuiteAt(dir: String, excludeProbed: Boolean): Unit =
      SparkEntry.queries.filterNot(q =>
          SparkEntry.benchExcluded(q._1) || (excludeProbed && q._1 == query))
        .values.foreach { fn =>
          try fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
          catch { case _: Throwable => () }
        }
    if (warm == "suite") runSuiteAt(warmDir, excludeProbed = false)
    else
      SparkEntry.queries(query)(spark, warmDir)
        .queryExecution.toRdd.foreach(_ => ())
    // phase markers (r19): epoch-ms boundaries between the interleave leg
    // and the measured run, so JIT-visibility sidecars captured via
    // SPARK_GRAFT_PROBE_JVMFLAGS (-XX:+PrintCompilation on stdout, or a
    // JFR recording whose jdk.Deoptimization events carry wall-clock
    // timestamps) can be binned per phase: deopts DURING interleave +
    // fresh compilations DURING the next measured run is the positive
    // profile-pollution signal the r18 elimination argument lacked.
    // flush: -XX:+PrintCompilation lines are written by JVM compiler
    // threads directly to fd 1, bypassing System.out's buffer — an
    // unflushed marker can appear AFTER compile events that happened
    // before it, mis-binning boundary events into the adjacent phase.
    // Flushing shrinks the fuzz to scheduling jitter; the JFR channel's
    // t_ms-based binning is immune to it entirely.
    def mark(phase: String, k: Int): Unit = {
      println(s"probe phase=$phase run=$k t_ms=${System.currentTimeMillis}")
      System.out.flush()
    }
    (1 to runs).foreach { k =>
      if (k > 1) interleave match {
        case "warm" => mark("interleave_start", k); runSuiteAt(warmDir, excludeProbed = true)
        case "sfdir" => mark("interleave_start", k); runSuiteAt(sfDir, excludeProbed = true)
        case _ => ()
      }
      spark.catalog.clearCache()
      System.gc()
      mark("measured_start", k)
      val (c0, t0n, i0, s0) = snap()
      val t0 = System.nanoTime()
      SparkEntry.queries(query)(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      val (c1, t1n, i1, s1) = snap()
      // tasks/stages/input separate the double-compute hypothesis (an AQE
      // materialization race computing the cached signature stage twice
      // would show ≈2× input records + an extra stage). Measured: constant
      // — the hypothesis is dead; see the FINDING note above.
      println(f"probe ${Bench.lineKey(query)} run=$k wall=$wall%.2f task_cpu=${(c1 - c0) / 1e9}%.2f " +
        s"tasks=${t1n - t0n} stages=${s1 - s0} input_records=${i1 - i0}")
    }
    spark.stop()
  }
}
