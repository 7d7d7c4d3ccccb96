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

Round-11 upgrades (round-10 verdict item 2 + advice):

* ``--drift-old OLDER.json`` (the round-(N−2) record) closes the
  sub-2× blind spot: a query that never trips the 2×-vs-last-round
  gate can still creep (the BPE pair went 2.39 → 4.60 s across two
  quiet records without one flag).  Any shared query whose new price
  exceeds ``--drift-threshold`` (default 1.5) × its round-(N−2) price
  AND whose delta exceeds both sides' measured spread prints as DRIFT,
  is remeasured like a REGRESSED row, and fails the gate if it
  survives — slow creep now surfaces mechanically, exactly like box
  load does.
* ``--remeasure`` now derives its sf_dir FROM THE NEW BENCH DOC's
  recorded ``sf`` and errors if ``SPARK_GRAFT_SF_DIR`` points
  elsewhere — a fresh timing taken at a smaller scale factor would
  otherwise silently clear a genuine regression.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> tuple[dict, dict, object, object]:
    doc = json.load(open(path))
    # driver-recorded BENCH_r*.json wraps the stdout line under "parsed"
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return (doc.get("queries", {}), doc.get("spread", {}), doc.get("sf"),
            doc.get("calib"))


def _sf_value(raw: object) -> float | None:
    """Numeric scale factor from a recorded ``sf`` or a directory
    basename like ``sf0.1`` — comparisons are NUMERIC (round-11
    advice: ``1`` vs ``1.0`` vs ``"0.10"`` are the same scale and must
    not hard-error or derive a nonexistent path)."""
    s = str(raw).strip()
    if s.startswith("sf"):
        s = s[2:]
    try:
        return float(s)
    except ValueError:
        return None


def _resolve_sf_dir(new_sf: object) -> str:
    """The sf_dir a remeasure must run at: derived from the NEW bench
    doc's recorded ``sf``; SPARK_GRAFT_SF_DIR may confirm but never
    silently override it (fresh numbers from a different scale would
    clear genuine regressions).  Both sides compare NUMERICALLY."""
    import os

    env = os.environ.get("SPARK_GRAFT_SF_DIR")
    if new_sf is None:
        if env:
            return env
        raise SystemExit("remeasure: the new bench doc records no 'sf' "
                         "and SPARK_GRAFT_SF_DIR is unset — cannot "
                         "pick a scale factor safely")
    want = _sf_value(new_sf)
    if want is None:
        raise SystemExit(f"remeasure: unparseable sf={new_sf!r} in the "
                         "new bench doc")
    if env:
        have = _sf_value(os.path.basename(env.rstrip("/")))
        if have is None or have != want:
            raise SystemExit(
                f"remeasure: SPARK_GRAFT_SF_DIR={env} does not match "
                f"the new bench doc's sf={new_sf}; refusing to re-price "
                "at a different scale (it would silently clear real "
                "regressions)")
        return env
    # normalized spelling (0.10 -> 0.1, 1.0 -> 1) matches the testdata
    # directory layout
    return f"/root/testdata/sf{want:g}"


def _remeasure(names: list[str], n_runs: int,
               new_sf: object) -> dict[str, float]:
    """Fresh best-of-N of just the flagged queries, same discipline as
    bench.py (clock spans the builder call, noop-format write forces
    full execution, clearCache between runs)."""
    import os
    import time

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from etl_cloud_batch_processing_spark import plans
    from etl_cloud_batch_processing_spark.session import get_spark

    sf_dir = _resolve_sf_dir(new_sf)
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
                    help="re-run would-be REGRESSED/DRIFT rows "
                         "best-of-N fresh and flag only survivors")
    ap.add_argument("--drift-old", metavar="OLDER.json",
                    help="round-(N-2) bench doc: flag cumulative creep "
                         "the 2x-vs-last-round gate cannot see")
    ap.add_argument("--drift-threshold", type=float, default=1.5)
    ap.add_argument("--calibrate", action="store_true",
                    help="normalize the OLD side by the docs' "
                         "fixed-workload calibration ratio before "
                         "gating (both docs must carry 'calib')")
    args = ap.parse_args()
    old, old_spread, _, old_calib = _load(args.old)
    new, new_spread, new_sf, new_calib = _load(args.new)

    # Box-speed normalization (round-12 verdict item 4): when both
    # bench docs carry the fixed-workload calibration row, scale the
    # OLD side's per-query prices by the measured box-speed ratio
    # before gating, so a uniformly slower/faster box stops reading as
    # regression/improvement.  Opt-in (--calibrate) so historical
    # compares and the gate tests keep their exact semantics.
    if old_calib and new_calib:
        ratio = float(new_calib) / float(old_calib)
        print(f"calibration: old={old_calib}s new={new_calib}s "
              f"box-speed ratio={ratio:.3f}"
              + ("" if args.calibrate else " (pass --calibrate to apply)"))
        if args.calibrate:
            old = {q: v * ratio for q, v in old.items()}
            old_spread = {q: v * ratio for q, v in old_spread.items()}
    elif args.calibrate:
        raise SystemExit("--calibrate needs a 'calib' field in BOTH "
                         "bench docs (bench.py emits it since round 13)")

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

    # cumulative-drift gate vs the round-(N-2) record: catches sub-2x
    # creep that never trips the per-round ratio gate
    drift = []
    if args.drift_old:
        old2, old2_spread, _, _ = _load(args.drift_old)
        flagged = {q for q, *_ in regressed}
        for q in shared:
            if q not in old2 or q in flagged:
                continue
            if new[q] <= args.drift_threshold * max(old2[q], 0.05):
                continue
            allowance = max(old2_spread.get(q, 0.0),
                            new_spread.get(q, 0.0))
            if new[q] - old2[q] > allowance:
                drift.append((q, old2[q], new[q], allowance))

    fresh: dict[str, float] = {}
    if args.remeasure > 0 and (regressed or drift):
        fresh = _remeasure(
            sorted({q for q, *_ in regressed} | {q for q, *_ in drift}),
            args.remeasure, new_sf)

    def _survivors(rows, ratio, label):
        if not fresh:
            return rows
        still = []
        for q, o, n, a in rows:
            best = min(n, fresh.get(q, n))
            if best > ratio * max(o, 0.05) and best - o > a:
                still.append((q, o, best, a))
            else:
                print(f"REMEASURED {q}: {o:.3f}s -> {n:.3f}s was box "
                      f"load; fresh best-of-{args.remeasure} = "
                      f"{best:.3f}s — {label} cleared")
        return still

    regressed = _survivors(regressed, args.threshold, "regression")
    drift = _survivors(drift, args.drift_threshold, "drift")
    for q, o, n, a in sorted(noise, key=lambda t: -(t[2] - t[1])):
        print(f"NOISE {q}: {o:.3f}s -> {n:.3f}s "
              f"(delta {n - o:+.3f}s within measured spread {a:.3f}s)")
    for q, o, n, a in sorted(regressed, key=lambda t: -t[2] / t[1]):
        print(f"REGRESSED {q}: {o:.3f}s -> {n:.3f}s ({n / o:.1f}x, "
              f"delta {n - o:+.3f}s > spread {a:.3f}s)")
    for q, o, n, a in sorted(drift, key=lambda t: -t[2] / t[1]):
        print(f"DRIFT {q}: {o:.3f}s (two rounds back) -> {n:.3f}s "
              f"({n / o:.1f}x over {args.drift_threshold}x budget, "
              f"delta {n - o:+.3f}s > spread {a:.3f}s)")
    sys.exit(1 if regressed or drift else 0)


if __name__ == "__main__":
    main()
