"""Expression-level utilities shared across plans."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pushdown_barrier(c: Column) -> Column:
    """Wrap an expensive expression so Catalyst cannot re-inline it.

    ``PushDownPredicates`` substitutes projection aliases into filter
    conditions it pushes below the projection.  For a cheap expression
    that is the right call (the filter runs earlier), but for an
    expensive one it is a de-optimization: a filter on a derived score
    gets the WHOLE derivation chain inlined, and inside higher-order
    lambdas every ``element_at(split(text), i)`` then re-splits the
    source string per element — measured 15× recompute (2.7 s vs 0.2 s
    at sf0.1) on the curation pipeline's trigram score.

    The wrapper is value-identical — ``shuffle`` of a one-element array
    is the identity — but ``shuffle`` is flagged nondeterministic, which
    both ``PushDownPredicates`` and ``CollapseProject`` refuse to move:
    the alias stays materialized exactly where it was written.  (A
    ``when(rand(0) >= -1, c)`` guard does NOT work: the optimizer knows
    rand's bounds and folds the conditional away.)  Apply cheap,
    scan-pushable predicates BEFORE the projection that uses this,
    because they will not cross it either.
    """
    return F.element_at(F.shuffle(F.array(c)), 1)
