"""Batch MERGE (upsert) — the warehouse mutation primitive.

The reference's only mutation verbs are truncate and append (SURVEY.md
§2.9 L6/L7).  A complete engine also needs MERGE INTO semantics — SCD
type-1 refresh of a dimension from a source batch — which plain-file
storage expresses as a full-outer join + rewrite (what Delta/Iceberg do
under the hood, minus the transaction log).  Pure DataFrame ops: one
shuffle on the merge keys, output is the new table version.

At 100 TB: the join shuffles both sides on the key; if the target is
bucketed on the key (sources/readers bucketed tables) its shuffle
disappears, and dynamic partition overwrite limits the rewrite to
partitions that received source rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRC_FLAG = "__merge_src"
_TGT_FLAG = "__merge_tgt"


def merge_upsert(target: DataFrame, source: DataFrame,
                 keys: list[str],
                 update_cols: list[str] | None = None) -> DataFrame:
    """MERGE INTO target USING source ON keys:

    * matched → target row takes ``update_cols`` (default: every
      non-key source column present on the target) from the source —
      including explicit source NULLs (presence flags distinguish
      "source says NULL" from "no source row", which ``coalesce``
      alone cannot);
    * not matched by target → source row inserted;
    * not matched by source → target row kept unchanged.

    Requires ``source`` unique per key (enforce upstream with a
    deterministic dedup); output column order follows the target.
    """
    update_cols = [c for c in (update_cols or source.columns)
                   if c not in keys and c in target.columns]
    src_cols = set(source.columns)
    # Prefix-rename non-key source columns BEFORE the join: every output
    # column then resolves by plain name, so chained merges (target
    # lineage already containing this source) never trip Spark's
    # ambiguous-self-join detection the way df[c] references do.
    src = source.select(
        *[F.col(c) for c in keys],
        *[F.col(c).alias(f"__src_{c}") for c in source.columns
          if c not in keys],
        F.lit(1).alias(_SRC_FLAG))
    tgt = target.withColumn(_TGT_FLAG, F.lit(1))
    joined = tgt.join(src, keys, "full_outer")
    has_src = F.col(_SRC_FLAG).isNotNull()
    src_only = F.col(_TGT_FLAG).isNull()
    out = []
    for c in target.columns:
        if c in keys:
            out.append(F.col(c))      # key: list-form join coalesces sides
        elif c in update_cols:
            # matched AND source-only rows take the source value
            out.append(F.when(has_src, F.col(f"__src_{c}"))
                       .otherwise(F.col(c)).alias(c))
        elif c in src_cols:
            # excluded from updates: source value only for inserted rows
            out.append(F.when(src_only, F.col(f"__src_{c}"))
                       .otherwise(F.col(c)).alias(c))
        else:
            out.append(F.col(c))      # target-only column; inserts get NULL
    return joined.select(*out)
