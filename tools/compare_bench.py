#!/usr/bin/env python
"""Compare two bench.py JSON outputs: total delta, new/removed queries,
and per-query regressions beyond a threshold.

    python tools/compare_bench.py OLD.json NEW.json [--threshold 1.5]

Exit code 1 if any shared query slowed by more than --threshold x
(guards a round's perf work against silent regressions; noise on a
shared box is why the default is a generous 1.5x on top of bench.py's
best-of-2)."""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]

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

    regressed = [(q, old[q], new[q]) for q in shared
                 if new[q] > args.threshold * max(old[q], 0.05)]
    for q, o, n in sorted(regressed, key=lambda t: -t[2] / t[1]):
        print(f"REGRESSED {q}: {o:.3f}s -> {n:.3f}s ({n / o:.1f}x)")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
