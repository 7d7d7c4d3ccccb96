"""Convergence-driven iterative execution with bounded lineage — the
engine capability behind every run-until-converged training loop.

The value-checked iterative queries in this repo (k-means, PageRank,
LPA, BPE, power iteration) run a FIXED unrolled round count so a DuckDB
twin can replay them exactly.  A production 100-TB trainer instead runs
until a convergence criterion holds; doing that naively on Spark hits
two well-known failure modes this runner exists to prevent:

* **Unbounded lineage.**  Each round's plan contains the previous
  round's, so after r rounds Catalyst re-analyzes an O(r)-deep (for
  self-joining steps, O(2^r)-node) tree — analysis time, not data,
  becomes the bottleneck.  ``localCheckpoint(eager=True)`` every
  ``checkpoint_every`` rounds truncates the plan back to a leaf; the
  pytest suite asserts the checkpointed plan's size stays FLAT across
  rounds (tests/test_iterative.py).
* **Lazily-persisted recompute.**  A persisted-but-unmaterialized round
  whose consumers get scheduled concurrently inside one job re-executes
  its whole upstream per branch (measured 21.6 s -> ~1 s on
  dup_graph_lpa_communities, SCALE.md).  The runner therefore
  MATERIALIZES every round before the next one builds on it — MLlib's
  materialize-before-iterating rule, applied uniformly.

The only values that ever reach the driver are one convergence scalar
per round; state frames flow executor-side throughout.  Intermediate
rounds are unpersisted as soon as a later checkpoint makes them
unreachable, so peak cache is O(checkpoint_every) state frames, not
O(rounds).

Used by operators/graph.py (min-label and large-star/small-star
connected components), operators/similarity.py
(kmeans_converged_centroids), and plans/tokenization.py (the 16-merge
BPE trainer).  Reference parity note: the reference repo has no
iterative operator at all (its heaviest compute is one BigQuery
window, reference dags/daily_search_history.py:74-86); this module is
north-star engine capability per SURVEY.md §2.12/§7.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class FixpointResult:
    """Outcome of :func:`iterate_to_fixpoint`."""

    state: DataFrame      #: final round's frame (materialized, provided
    #: the fused-mode caller honored the scan-exactly-once contract —
    #: see ``iterate_to_fixpoint(materialize=...)``)
    rounds: int           #: rounds actually executed (>= 1)
    final_metric: float   #: convergence metric at the stopping round
    converged: bool       #: True iff final_metric <= tol (not a max_rounds cut)


def iterate_to_fixpoint(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    metric: Callable[[DataFrame, DataFrame], float],
    *,
    tol: float = 0.0,
    max_rounds: int = 25,
    checkpoint_every: int = 1,
    on_round: Callable[[int, DataFrame, float], None] | None = None,
    materialize: str = "count",
) -> FixpointResult:
    """Iterate ``state := step(state)`` until ``metric(prev, new) <=
    tol`` or ``max_rounds`` is hit, materializing every round and
    truncating lineage every ``checkpoint_every`` rounds.

    ``metric`` receives the previous and the (already materialized) new
    state and must return one driver-side float — a changed-row count,
    a max centroid shift, an edge-set delta.  It is the ONLY driver
    round-trip per iteration.  ``on_round`` (optional) observes
    ``(round, new_state, metric)`` after each round — used by tests to
    assert plan-size flatness and by callers that accumulate per-round
    side outputs.

    ``materialize`` picks the per-round materialization discipline:

    * ``"count"`` (default) — a dedicated action per round (eager
      ``localCheckpoint`` on checkpoint rounds, ``persist``+``count``
      otherwise).  Always safe.
    * ``"metric"`` — NO dedicated action: the round's frame is
      persisted (or lazily checkpointed) and the next scan over it —
      the metric's, or the next round's first driver fetch —
      materializes it as a side effect.  One job per round instead of
      two, which matters on schedulers where per-job latency, not
      data, dominates iterative queries (DRIVER_NOTES #24).  Only
      valid when every round's frame is scanned EXACTLY ONCE before
      any plan referencing it twice executes — true when the metric
      scans ``new`` once (``changed_count_metric``, shift checks,
      fingerprints).  A caller whose metric does NOT scan ``new``
      forfeits two guarantees (round-12 advice): checkpoint rounds
      free the persisted frames a still-lazy checkpoint depends on
      (the next scan then recomputes up to ``checkpoint_every - 1``
      rounds of step work in one job), and the returned final state
      may come back unmaterialized — which is why the BPE trainer's
      metric performs the next round's argmax (lookahead) rather than
      leaving the scan to the next ``step``.  A caller that scans a
      round's frame TWICE before any single scan completes recomputes
      the frame's upstream per concurrent branch inside one job — the
      measured 21.6 s LPA pathology — so the default stays ``"count"``.

    The initial ``state`` is caller-owned and never unpersisted here;
    frames the runner creates are freed once a later checkpoint makes
    them unreachable.  The returned final state stays materialized for
    the caller."""
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    if materialize not in ("count", "metric"):
        raise ValueError("materialize must be 'count' or 'metric'")
    fused = materialize == "metric"
    owned: list[DataFrame] = []
    rounds, m, converged = 0, float("inf"), False
    for r in range(1, max_rounds + 1):
        prev = state
        new = step(prev)
        if r % checkpoint_every == 0:
            # eager=True materializes AND truncates lineage: the new
            # frame no longer references any earlier round.  Fused
            # mode defers the materialization to the next scan (the
            # lazy checkpoint lands during whichever job computes the
            # frame first); the lineage truncation — what the
            # flat-plan tests pin — is identical either way.
            new = new.localCheckpoint(eager=not fused)
            was_checkpointed = True
        else:
            new = new.persist()
            if not fused:
                new.count()  # one-scalar materialization (pinning rule)
            was_checkpointed = False
        m = float(metric(prev, new))
        if was_checkpointed:
            # everything created since the last truncation is now
            # unreachable from `new` — free it (no-op for frames that
            # were themselves checkpointed; their blocks are bounded by
            # rounds/checkpoint_every and evicted with the session).
            for f in owned:
                f.unpersist()
            owned = [new]
        else:
            owned.append(new)
        state, rounds = new, r
        if on_round is not None:
            on_round(r, new, m)
        if m <= tol:
            converged = True
            break
    return FixpointResult(state=state, rounds=rounds, final_metric=m,
                          converged=converged)


def changed_count_metric(key: str, value: str
                         ) -> Callable[[DataFrame, DataFrame], float]:
    """Metric factory: number of ``key`` rows whose ``value`` changed
    between rounds — the standard label-propagation stopping criterion
    (tol=0 stops at the exact fixpoint)."""
    from pyspark.sql import functions as F

    def m(old: DataFrame, new: DataFrame) -> float:
        return float(
            new.alias("n").join(old.alias("o"), key)
            .filter(F.col(f"n.{value}") != F.col(f"o.{value}"))
            .count())

    return m
