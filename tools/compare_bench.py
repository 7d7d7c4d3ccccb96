#!/usr/bin/env python
"""Compare two bench runs with a per-query verdict gated on measured
run-to-run spread: total delta, new/removed queries, and — the round-9
upgrade — a mechanical REGRESSED / NOISE split.

    python tools/compare_bench.py OLD.json NEW.json [--threshold 2.0]

Inputs are bench.py outputs: BENCH_FULL.json (preferred — carries the
per-query ``spread`` = max−min across the best-of-N runs) or the
truncated stdout capture (no spread → spread treated as 0 for that
side).  A shared query is REGRESSED only when BOTH hold:

* ``new > threshold × max(old, 0.05)`` (the old ratio gate), AND
* ``new − old > max(spread_old, spread_new)`` — the delta exceeds what
  the box itself measured as noise for this query at measure time.

Everything that trips the ratio gate but sits inside the measured
spread prints as NOISE instead — the shared-microVM reality
(DRIVER_NOTES #7/#16: same query 7 s and 51 s minutes apart) that made
raw ratio flags un-actionable.

Round-10 upgrade (round-9 verdict item 5): ``--remeasure N`` re-prices
every would-be REGRESSED row IN THIS PROCESS — a fresh best-of-N,
cache-cleared execution of just that query at the NEW side's scale
factor — and keeps the flag only if the fresh measurement still trips
both gates.  A row whose regression was box load at bench time clears
mechanically (the fresh min replaces the stale one and is reported as
REMEASURED); a genuine plan regression reproduces and stays REGRESSED.
Exit 1 only on rows that survive.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> tuple[dict, dict]:
    doc = json.load(open(path))
    # driver-recorded BENCH_r*.json wraps the stdout line under "parsed"
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc.get("queries", {}), doc.get("spread", {})


def _remeasure(names: list[str], n_runs: int) -> dict[str, float]:
    """Fresh best-of-N of just the flagged queries, same discipline as
    bench.py (clock spans the builder call, noop-format write forces
    full execution, clearCache between runs)."""
    import os
    import time

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from etl_cloud_batch_processing_spark import plans
    from etl_cloud_batch_processing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("compare-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        spec = plans.REGISTRY.get(name)
        if spec is None:
            continue
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(min(runs), 3)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--remeasure", type=int, default=0, metavar="N",
                    help="re-run would-be REGRESSED rows best-of-N "
                         "fresh and flag only survivors")
    args = ap.parse_args()
    old, old_spread = _load(args.old)
    new, new_spread = _load(args.new)

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(f"shared {len(shared)} queries: {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old - 1:+.1%})" if t_old else "no shared queries")
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    regressed, noise = [], []
    for q in shared:
        if new[q] <= args.threshold * max(old[q], 0.05):
            continue
        allowance = max(old_spread.get(q, 0.0), new_spread.get(q, 0.0))
        row = (q, old[q], new[q], allowance)
        (regressed if new[q] - old[q] > allowance else noise).append(row)

    if regressed and args.remeasure > 0:
        fresh = _remeasure([q for q, *_ in regressed], args.remeasure)
        still, cleared = [], []
        for q, o, n, a in regressed:
            best = min(n, fresh.get(q, n))
            if (best > args.threshold * max(o, 0.05)
                    and best - o > a):
                still.append((q, o, best, a))
            else:
                cleared.append((q, o, n, best))
        for q, o, n, b in cleared:
            print(f"REMEASURED {q}: {o:.3f}s -> {n:.3f}s was box load; "
                  f"fresh best-of-{args.remeasure} = {b:.3f}s — cleared")
        regressed = still
    for q, o, n, a in sorted(noise, key=lambda t: -(t[2] - t[1])):
        print(f"NOISE {q}: {o:.3f}s -> {n:.3f}s "
              f"(delta {n - o:+.3f}s within measured spread {a:.3f}s)")
    for q, o, n, a in sorted(regressed, key=lambda t: -t[2] / t[1]):
        print(f"REGRESSED {q}: {o:.3f}s -> {n:.3f}s ({n / o:.1f}x, "
              f"delta {n - o:+.3f}s > spread {a:.3f}s)")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
