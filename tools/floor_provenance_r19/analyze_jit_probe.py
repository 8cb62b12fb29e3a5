#!/usr/bin/env python3
"""Bin JIT events from a SimhashProbe run into probe phases.

Input 1: the probe's stdout with -XX:+PrintCompilation interleaved
(SPARK_GRAFT_PROBE_JVMFLAGS). The probe's phase markers
(`probe phase=interleave_start|measured_start run=K t_ms=...`) segment the
stream in stdout order; every PrintCompilation line between two markers is
attributed to the earlier marker's phase.

BOUNDARY-FUZZ CAVEAT (r20, ADVICE): PrintCompilation lines are written by
JVM compiler threads straight to fd 1 while the markers go through
System.out, so the two streams can interleave out of order within a few
lines of each marker — a handful of JIT events near a phase boundary may
bin into the adjacent phase. The probe now flushes System.out in mark(),
shrinking the window to scheduling jitter, but the stdout-order binning
here remains approximate at the margins. This cannot flip the r19
conclusion (per-phase counts differ by 10-100x, not by a boundary
handful), and the JFR jdk.Deoptimization channel bins by event timestamp
against the markers' t_ms values, which sidesteps stream ordering
entirely — prefer the JFR numbers when the two disagree near a boundary.

Input 2 (optional): a JFR recording from the same JVM
(-XX:StartFlightRecording). jdk.Deoptimization events carry wall-clock
timestamps, binned against the markers' epoch-ms t_ms values.

The question this answers (r18 verdict task: close the interleave
attribution): does the interleave leg deoptimize ("made not entrant")
methods that the next measured run then recompiles? If yes — and the
back-to-back control shows neither — the in-bench kernel elevation is
positively profile pollution/deopt of shared JIT'd paths, not the
eliminated alternatives (code cache, data volume, store rebuilds).

Usage: analyze_jit_probe.py <stdout.txt> [<recording.jfr>]
"""
import json
import re
import subprocess
import sys
from collections import Counter
from datetime import datetime

MARKER = re.compile(r"probe phase=(\w+) run=(\d+) t_ms=(\d+)")
RESULT = re.compile(r"probe \S+ run=(\d+) wall=([\d.]+) task_cpu=([\d.]+)")
# PrintCompilation: "<uptime_ms> <id> [%!bsn ] <tier> Method::name [@ bci]
# (bytes) [made not entrant|made zombie]". A line is EITHER a fresh
# compilation OR a state-transition note ("made not entrant" = deopt,
# "made zombie" = later reclamation of an already-not-entrant method) —
# classify transitions first and never count them as compiles, and allow
# the OSR form's "@ bci" between method and size (both were mis-binned in
# the first cut of this script; see the transcript's re-derivation note).
NOT_ENTRANT = re.compile(r"^\s*\[?(?:info\]?\s*)?(\d+)\s+(\d+)\s+.*?\s(\S+::\S+)(?:\s+@\s+\d+)?\s+\([^)]*\)\s+made not entrant")
COMPILE = re.compile(r"^\s*\[?(?:info\]?\s*)?(\d+)\s+(\d+)\s+([%!bsn ]*)\s*(\d)\s+(\S+::\S+)")


def classify(ln):
    """-> ('deopt', method) | ('zombie'|'skipped', None)
    | ('compile', (tier, method)) | (None, None).

    Order matters: a not-entrant line whose shape the regex can't parse
    still counts as a deopt (method '<unparsed>') rather than silently
    weakening the counts; 'made zombie' (reclamation of already-not-
    entrant code) and 'COMPILE SKIPPED' bailouts are never compiles.
    """
    dm = NOT_ENTRANT.search(ln)
    if dm:
        return "deopt", dm.group(3)
    if "made not entrant" in ln:
        return "deopt", "<unparsed>"
    if "made zombie" in ln:
        return "zombie", None
    if "COMPILE SKIPPED" in ln:
        return "skipped", None
    cm = COMPILE.search(ln)
    if cm:
        return "compile", (cm.group(4), cm.group(5))
    return None, None


def segments(lines):
    """Yield (phase_label, lines) in stdout order."""
    label, buf = "setup_warmup_run1", []
    for ln in lines:
        m = MARKER.search(ln)
        if m:
            yield label, buf
            label, buf = f"{m.group(1)}_run{m.group(2)}", []
            continue
        buf.append(ln)
    yield label, buf


def main():
    stdout_path = sys.argv[1]
    with open(stdout_path, errors="replace") as f:
        lines = f.read().splitlines()

    marker_ts = []  # (epoch_ms, phase_label) for JFR binning
    for ln in lines:
        m = MARKER.search(ln)
        if m:
            marker_ts.append((int(m.group(3)), f"{m.group(1)}_run{m.group(2)}"))

    results = {int(m.group(1)): (float(m.group(2)), float(m.group(3)))
               for m in (RESULT.search(l) for l in lines) if m}

    print(f"== PrintCompilation events per probe phase ({stdout_path}) ==")
    print(f"{'phase':26s} {'compiles':>9s} {'c2(t4)':>7s} {'not_entrant':>12s}  top deopted methods")
    for label, seg in segments(lines):
        deopts = Counter()
        compiles = 0
        c2 = 0
        for ln in seg:
            kind, payload = classify(ln)
            if kind == "deopt":
                deopts[payload] += 1
            elif kind == "compile":
                compiles += 1
                if payload[0] == "4":
                    c2 += 1
        def short(m):
            if "::" not in m:
                return m  # e.g. the '<unparsed>' bucket
            cls, meth = m.split("::", 1)
            return f"{cls.split('.')[-1]}::{meth}"
        top = ", ".join(f"{short(m)}×{c}" for m, c in deopts.most_common(3))
        print(f"{label:26s} {compiles:9d} {c2:7d} {sum(deopts.values()):12d}  {top}")

    # The positive-signal cross-check: methods deopted during interleave_K
    # that are recompiled during measured_(K) — same JVM, same round.
    print("\n== interleave-deopt -> next-measured-recompile overlap ==")
    seg_list = list(segments(lines))
    for i, (label, seg) in enumerate(seg_list):
        if not label.startswith("interleave_"):
            continue
        run = label.split("run")[1]
        nxt = next((s for l2, s in seg_list if l2 == f"measured_start_run{run}"), None)
        if nxt is None:
            continue
        deopted = {p for k, p in map(classify, seg) if k == "deopt"}
        recompiled = {p[1] for k, p in map(classify, nxt) if k == "compile"}
        both = deopted & recompiled
        print(f"run {run}: {len(deopted)} methods deopted in interleave, "
              f"{len(both)} of them recompiled in the measured run")
        for m in sorted(both)[:8]:
            print(f"    {m}")

    print("\n== measured-run results (corroboration) ==")
    for k in sorted(results):
        print(f"run {k}: wall={results[k][0]:.2f} task_cpu={results[k][1]:.2f}")

    if len(sys.argv) > 2:
        jfr = sys.argv[2]
        print(f"\n== JFR jdk.Deoptimization events per phase ({jfr}) ==")
        out = subprocess.run(
            ["jfr", "print", "--json", "--events", "jdk.Deoptimization", jfr],
            capture_output=True, text=True)
        if out.returncode != 0:
            print(f"jfr print failed: {out.stderr.strip()[:300]}")
            return
        evts = json.loads(out.stdout)["recording"].get("events", [])

        def epoch_ms(iso):
            # jfr emits 9-digit fractional seconds; fromisoformat accepts
            # them only from Python 3.11 — trim to µs for older interpreters
            trimmed = re.sub(r"(\.\d{6})\d+", r"\1", iso)
            return int(datetime.fromisoformat(trimmed).timestamp() * 1000)

        def phase_of(ts):
            lab = "setup_warmup_run1"
            for mts, mlab in marker_ts:
                if ts >= mts:
                    lab = mlab
                else:
                    break
            return lab

        per_phase = Counter()
        reasons = Counter()
        for e in evts:
            v = e["values"]
            per_phase[phase_of(epoch_ms(v["startTime"]))] += 1
            reasons[v.get("reason", "?")] += 1
        print(f"total jdk.Deoptimization events: {len(evts)}")
        for lab, c in per_phase.most_common():
            print(f"  {lab:26s} {c}")
        print("reasons:", dict(reasons.most_common(8)))


if __name__ == "__main__":
    main()
