"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall-clock seconds.

Measurement protocol (VERDICT r8 item 3 — make the honest number the
recorded one): every query runs THREE times in the same JVM — window A
= cold + steady back-to-back, then, after the whole list finishes,
window B = one more steady rep. The recorded per-query number (and the
headline ``value``) is the MINIMUM of the two steady reps, which are
minutes apart for any given query. This machine shows intermittent
5-35 s stalls that /proc/stat steal does NOT capture (r7: p06 47.96 s
-> 16.44 s -> 2.48 s on identical reps; r8: glm_segment_auc 35.6 s in
one window vs 1.83 s quiet), so a single window's steady rep is not a
code-regression signal; the cross-window per-query min is what three
rounds of manual log archaeology converged on. Both windows' totals,
steal percentages, and a fixed numpy CPU canary are stamped into the
summary as evidence; the cold pass stays visible in ``queries_cold``
(codegen, shared family-cache builds — VERDICT r6 item 2).

``--jobs=N`` runs N worker threads against the SAME JVM, each in its own
FAIR scheduler pool (round-robin split of the name-ordered list, so each
worker still runs ITS queries in name order). Per-query timings under
concurrency share CPU and are not comparable to serial timings — the
summary therefore reports BOTH the serial-equivalent sum ("value", the
round-over-round comparison number) and the pooled wall clock
("pooled_wall_sec", what a session actually waits). The driver's default
invocation (no flag) is byte-compatible with previous rounds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from golem_spark.session import get_spark


def _cpu_times() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu
    line; None where unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(before, after) -> float | None:
    if before is None or after is None:
        return None
    dt = after[1] - before[1]
    if dt <= 0:
        return None
    return round(100.0 * (after[0] - before[0]) / dt, 2)


def _cpu_canary_sec() -> float:
    """Wall seconds for a FIXED single-thread numpy workload (best of
    3) — a machine-speed reference stamped beside the timings. Steal
    alone cannot adjudicate 'machine or code' (the stalls happen at
    <3% steal); a canary that drifts window-over-window can."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 512))
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        b = a.copy()
        for _ in range(12):
            b = b @ a
            b /= np.abs(b).max()
        best = min(best, time.monotonic() - t0)
    return round(best, 4)


def _load_baseline(here: str):
    """Newest prior-round bench archive for canary-normalized deltas
    (VERDICT r11 item 5): returns (label, {query: sec}, canary_min)
    or None. Prefers a local two-line archive (bench_r{N}_*.json,
    full per-query detail + summary canaries) over the driver's
    BENCH_r{N}.json (top-25 + canaries); override with
    $SPARK_GRAFT_BENCH_BASELINE=path."""
    import glob

    def parse(path):
        qs, canary = None, None
        try:
            txt = open(path).read()
        except OSError:
            return None
        try:  # driver artifact: one JSON object with a "parsed" summary
            d = json.loads(txt)
            p = d.get("parsed") or {}
            return (p.get("queries"), min(p["canary_sec"])
                    if p.get("canary_sec") else None)
        except ValueError:
            pass
        for line in txt.splitlines():  # local archive: JSON lines
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if d.get("detail") == "per_query_wall_clock":
                qs = d.get("queries")
            elif d.get("metric") == "total_query_wall_clock":
                qs = qs or d.get("queries")
                canary = min(d["canary_sec"]) if d.get("canary_sec") \
                    else None
        return (qs, canary)

    override = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
    if override:
        got = parse(override)
        if got and got[0]:
            return os.path.basename(override), got[0], got[1]
        return None
    cands = []
    for pat, pref in (("bench_r*_*.json", 0), ("BENCH_r*.json", 1)):
        for path in glob.glob(os.path.join(here, pat)):
            m = re.search(r"r(\d+)", os.path.basename(path))
            if m:
                cands.append((-int(m.group(1)), pref, path))
    # within the newest round, prefer local detail archives and among
    # them the QUIETEST window (smallest canary) — same convention the
    # notes use for "the definitive number"
    by_group: dict[tuple, list] = {}
    for rnd, pref, path in cands:
        by_group.setdefault((rnd, pref), []).append(path)
    for key in sorted(by_group):
        parsed = [(g[1], os.path.basename(p), g[0])
                  for p in sorted(by_group[key])
                  for g in [parse(p)] if g and g[0] and g[1]]
        if parsed:
            c, label, qs = min(parsed)
            return label, qs, c
    return None


def _session_cpus(spark) -> int | None:
    """Core count from the session's actual master URL (local[N]), or
    defaultParallelism for non-local masters; None if undeterminable."""
    try:
        m = re.match(r"local\[(\d+|\*)\]", spark.sparkContext.master or "")
        if m and m.group(1) != "*":
            return int(m.group(1))
        return int(spark.sparkContext.defaultParallelism)
    except Exception:
        return None


def main() -> None:
    # benchmark the serving computation, not the self-verification
    # pass on top of it: the glm_* KKT certificate aggregation
    # (~0.5-1 s x 20 queries) stays ON for the driver CORRECTNESS gate
    # and verify_oracle (their default), OFF here (VERDICT r8 item 8);
    # recorded in the summary so the artifact says so itself
    os.environ.setdefault("SPARK_GRAFT_GLM_CERTIFICATES", "0")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    jobs = 1
    for a in sys.argv[1:]:
        if a.startswith("--jobs="):
            jobs = max(1, int(a.split("=", 1)[1]))

    spark = get_spark(
        "golem_spark_bench",
        extra_conf={"spark.scheduler.mode": "FAIR"} if jobs > 1 else None)
    # name order, NOT the rotated driver order: rotation changes every
    # round, and which query pays a shared family cache's one-time
    # build depends on order — stable ordering keeps per-query timings
    # comparable round over round
    qs = dict(sorted(entrymod.queries().items()))

    # warm the JVM + parquet footers once so timings measure query work
    next(iter(qs.values()))(spark, sf_dir).collect()

    def measure(reps: int, tag: str):
        """One pass over the query list; per query, `reps` back-to-back
        runs. Returns ({name: last_rep_sec}, {name: first_rep_sec},
        wall). With reps=2 the first rep is the cold/codegen pass."""
        timings: dict[str, float] = {}
        first: dict[str, float] = {}
        lock = threading.Lock()

        def run_list(items, pool_name=None):
            if pool_name is not None:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool",
                                                    pool_name)
            for name, fn in items:
                t_first = None
                for _ in range(max(1, reps)):
                    t0 = time.monotonic()
                    df = fn(spark, sf_dir)
                    n = df.count() if df is not None else 0
                    dt = time.monotonic() - t0
                    if t_first is None:
                        t_first = dt
                with lock:
                    timings[name] = round(dt, 4)
                    first[name] = round(t_first, 4)
                print(f"# [{tag}] {name}: {dt:.3f}s "
                      f"(first {t_first:.3f}s) rows={n}", file=sys.stderr)

        wall0 = time.monotonic()
        if jobs == 1:
            run_list(list(qs.items()))
        else:
            from concurrent.futures import ThreadPoolExecutor

            items = list(qs.items())
            queues = [items[i::jobs] for i in range(jobs)]
            with ThreadPoolExecutor(max_workers=jobs) as pool:
                futs = [pool.submit(run_list, queues[i], f"bench{i}")
                        for i in range(jobs)]
                for f in futs:
                    f.result()
        return timings, first, time.monotonic() - wall0

    canary = [_cpu_canary_sec()]
    ticks = _cpu_times()
    w1, cold, wall1 = measure(2, "w1")  # cold + steady
    steal1 = _steal_pct(ticks, _cpu_times())
    canary.append(_cpu_canary_sec())
    ticks = _cpu_times()
    w2, _, wall2 = measure(1, "w2")  # second steady window, minutes later
    steal2 = _steal_pct(ticks, _cpu_times())
    canary.append(_cpu_canary_sec())

    # VERDICT r9 item 3: the r9 driver run had canary 0.20 s vs 0.016 s
    # quiet with steal <2% — contention the steal gauge cannot see. If
    # the canaries bracketing the windows drift >3x, at least one
    # window ran on a degraded machine: buy a third steady window and
    # min across all three (the per-query min only needs ONE quiet
    # window per query to be honest).
    windows = [w1, w2]
    steals = [steal1, steal2]
    walls = [wall1, wall2]
    if max(canary) > 3.0 * min(canary):
        print(f"# canary drift {min(canary):.4f}s -> {max(canary):.4f}s "
              f"(>3x): running extra steady window", file=sys.stderr)
        ticks = _cpu_times()
        w3, _, wall3 = measure(1, "w3")
        steals.append(_steal_pct(ticks, _cpu_times()))
        canary.append(_cpu_canary_sec())
        windows.append(w3)
        walls.append(wall3)

    best = {n: min(w[n] for w in windows if n in w) for n in w1}
    total = sum(best.values())

    # Full per-query detail first (large line, for humans/the judge), then
    # a SHORT final JSON line so the driver's bounded tail buffer always
    # ends with a complete, parseable summary (VERDICT r4 item 2: r4's
    # single giant line got front-clipped -> parsed: null). The short line
    # keeps only the slowest queries so it stays well under the tail size.
    detail = {"detail": "per_query_wall_clock", "queries": best,
              "queries_w1": w1, "queries_w2": w2,
              "queries_cold": cold, "sf": sf}
    if len(windows) > 2:
        detail["queries_w3"] = windows[2]
    # canary-normalized round-over-round deltas (VERDICT r11 item 5):
    # host speed drifts round to round (r11's quiet canary was ~1.8x
    # r10's), so raw per-query deltas conflate machine and code. The
    # fixed numpy canary is the machine-speed unit: normalized delta =
    # t_now / (t_prev * canary_now/canary_prev) - 1. BENCH_NOTES
    # quotes these numbers instead of hand-arguing from canary_sec.
    norm = None
    base = _load_baseline(os.path.dirname(os.path.abspath(__file__)))
    if base and base[2]:
        blabel, bqs, bcanary = base
        ratio = min(canary) / bcanary
        deltas = {n: round(best[n] / (bqs[n] * ratio) - 1.0, 3)
                  for n in best if bqs.get(n)}
        detail["queries_norm_delta_vs_prior"] = deltas
        common = [n for n in deltas]
        tot_now = sum(best[n] for n in common)
        tot_prev = sum(bqs[n] for n in common)
        norm = {
            "baseline": blabel,
            "canary_ratio_vs_baseline": round(ratio, 3),
            "norm_total_delta": round(tot_now / (tot_prev * ratio) - 1.0, 3)
            if tot_prev else None,
            "n_compared": len(common),
            "worst_norm_regressions": dict(
                sorted(deltas.items(), key=lambda kv: -kv[1])[:5]),
        }
    print(json.dumps(detail))
    slowest = dict(sorted(best.items(), key=lambda kv: -kv[1])[:25])
    summary = {
        "metric": "total_query_wall_clock",
        "value": round(total, 4),
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(best),
        "protocol": (f"per-query min of {len(windows)} steady reps in "
                     f"separate windows"
                     + (" (3rd window: canary drift >3x)"
                        if len(windows) > 2 else "")),
        "glm_certificates": os.environ["SPARK_GRAFT_GLM_CERTIFICATES"] != "0",
        "window_total_sec": [round(sum(w.values()), 4) for w in windows],
        "cold_total_sec": round(sum(cold.values()), 4),
        "sf": sf,
        # self-describing scaling evidence (VERDICT r14 item 2): echo
        # the core count the session ACTUALLY ran with (parsed back out
        # of the live master URL, not the env var) and the data dir, so
        # a driver comparing runs at two core counts can see the env
        # was honored rather than inferring it from per-query ratios
        # that are overhead-bound at bench scale
        "cpus": _session_cpus(spark),
        "sf_dir": sf_dir,
    }
    if steals[0] is not None:
        summary["steal_pct"] = steals
    summary["canary_sec"] = canary
    if norm is not None:
        summary["canary_normalized"] = norm
    if jobs > 1:
        summary["jobs"] = jobs
        summary["pooled_wall_sec"] = round(sum(walls), 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
