"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting (on by default in the engine conf) handles
most skew at runtime; salting is the explicit fallback for the cases
AQE can't fix — a skewed key on the BUILD side of a shuffled hash
join, or a skewed groupBy key whose single reducer becomes the
straggler.  Both helpers are pure plan rewrites (no UDF, no state):

* ``salted_join``: replicate the small side SALT ways, scatter the big
  side's rows uniformly across the replicas, join on (key, salt).  The
  hot key's rows now land on SALT reducers instead of one.
* ``salted_agg``: two-phase aggregation — partial aggregate on
  (key, salt), then final aggregate on key.  The second shuffle moves
  only SALT rows per key.

Both produce results identical to the unsalted form (tested in
tests/test_operators.py against plain join/groupBy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(big: DataFrame, small: DataFrame, on: str,
                how: str = "inner", salt: int = DEFAULT_SALT) -> DataFrame:
    """Equi-join big ⋈ small on ``on`` with the big side's skew spread
    across ``salt`` partitions per key.

    The small side is exploded ``salt``× (acceptable: it is small by
    assumption — this is for when it is still too big or too skewed to
    broadcast); the big side gets a uniform random-ish salt derived
    from a hash of its whole row, keeping the rewrite deterministic.
    Result column set matches ``big.join(small, on, how)``.
    """
    salt_col = (F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                       F.lit(salt))).cast("int")
    b = big.withColumn("__salt", salt_col)
    s = (small.withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))))
    return b.join(s, [on, "__salt"], how).drop("__salt")


def salted_agg(df: DataFrame, keys: Sequence[str],
               partial_aggs: Sequence[Column],
               final_aggs: Sequence[Column],
               salt: int = DEFAULT_SALT) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs``
    combine the partials per key and must reference the partials'
    output aliases (e.g. partial ``sum(x) AS s`` → final
    ``sum(s) AS total``).  Decomposable aggregates only (sum/count/
    min/max — avg as sum+count combined by the caller).
    """
    salt_col = (F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                       F.lit(salt))).cast("int")
    partial = (df.withColumn("__salt", salt_col)
               .groupBy(*keys, "__salt")
               .agg(*partial_aggs))
    return partial.groupBy(*keys).agg(*final_aggs)
