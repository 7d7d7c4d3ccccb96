"""Round-8 operators: incremental IVF-PQ index maintenance (the vector
mirror of the MinHash band-index trio) and the schema-evolution append
path."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_cloud_batch_processing_spark.operators.similarity import (
    IVF_BATCH_MOD,
    IVF_BATCH_REM,
    _full_emb,
    append_to_ivf_index,
    build_ivf_index,
    probe_ivf_index,
    vector_ivf_pq_topk,
)


def _probe_rows(spark, sf_dir, path):
    emb = _full_emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return {tuple(r)
            for r in probe_ivf_index(spark, queries, path).collect()}


def test_ivf_index_full_build_probe_matches_selfcontained(spark, sf_dir,
                                                          tmp_path):
    """Parity: an index built on the WHOLE corpus and probed must equal
    the self-contained vector_ivf_pq_topk query row-for-row — the
    persisted-artifact path computes the same search, so the
    value-checked query is its oracle (same contract as
    pq_encode_with_codebook vs vector_pq_encode)."""
    path = str(tmp_path / "ivf_full")
    build_ivf_index(spark, sf_dir, path)
    got = _probe_rows(spark, sf_dir, path)
    want = {tuple(r) for r in vector_ivf_pq_topk(spark, sf_dir).collect()}
    assert got == want


def test_ivf_index_append_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a batch append must REPLACE its postings, not double
    them — same retry bar as append_to_band_index."""
    path = str(tmp_path / "ivf_incr")
    emb = _full_emb(spark, sf_dir)
    is_batch = (F.col("vec_id") % IVF_BATCH_MOD) == IVF_BATCH_REM
    build_ivf_index(spark, sf_dir, path, base_filter=~is_batch)
    batch = emb.filter(is_batch).select("vec_id", "embedding")
    append_to_ivf_index(batch, path, "b1")
    first = _probe_rows(spark, sf_dir, path)
    n_first = spark.read.parquet(f"{path}/postings").count()
    append_to_ivf_index(batch, path, "b1")  # retried batch
    assert spark.read.parquet(f"{path}/postings").count() == n_first
    assert _probe_rows(spark, sf_dir, path) == first


def test_ivf_index_appended_vectors_are_findable(spark, sf_dir, tmp_path):
    """Every appended vector must be reachable through a probe that
    targets its own cell (a query equal to the vector itself probes
    that cell first)."""
    path = str(tmp_path / "ivf_find")
    emb = _full_emb(spark, sf_dir)
    is_batch = (F.col("vec_id") % IVF_BATCH_MOD) == IVF_BATCH_REM
    build_ivf_index(spark, sf_dir, path, base_filter=~is_batch)
    batch = emb.filter(is_batch).select("vec_id", "embedding")
    append_to_ivf_index(batch, path, "b1")
    probe_self = (batch.limit(3)
                  .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = probe_ivf_index(spark, probe_self, path, k=50)
    returned = {r["vec_id"] for r in got.collect()}
    indexed_batch = {r["vec_id"] for r in spark.read.parquet(
        f"{path}/postings").filter(F.col("ingest") == "b1")
        .select("vec_id").distinct().collect()}
    # at least some same-cell batch members surface as candidates
    assert returned & indexed_batch or len(indexed_batch) <= 3


def test_ivf_probe_reads_only_probed_cell_partitions(spark, sf_dir,
                                                     tmp_path):
    """The probe must push its probed-cell list into the postings scan
    as a static partition filter: the files actually read all live
    under cell= directories of probed cells."""
    from etl_cloud_batch_processing_spark.operators.similarity import (
        _ivf_probe_cells,
    )

    path = str(tmp_path / "ivf_prune")
    build_ivf_index(spark, sf_dir, path)
    emb = _full_emb(spark, sf_dir)
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("vec_id"), "embedding", "nrm"))
    cents = spark.read.parquet(f"{path}/centroids")
    probed = {r["cell"] for r in _ivf_probe_cells(q, cents).collect()}
    all_cells = {r["cell"] for r in spark.read.parquet(
        f"{path}/postings").select("cell").distinct().collect()}
    assert probed < all_cells, "fixture probes cover every cell; " \
        "pruning unobservable"
    postings = (spark.read.parquet(f"{path}/postings")
                .filter(F.col("cell").isin(sorted(probed))))
    # input_file_name() reflects files ACTUALLY read at execution (the
    # partition filter applied), unlike inputFiles()'s pre-prune listing
    files = [r[0] for r in
             postings.select(F.input_file_name()).distinct().collect()]
    read_cells = {int(f.split("cell=")[1].split("/")[0]) for f in files}
    assert read_cells == {c for c in probed if c in all_cells}
    # and the physical scan carries the pushed partition filter
    plan = postings._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


# ---------------------------------------------------------------------------
# Schema evolution on partitioned appends (plans/evolution.py)
# ---------------------------------------------------------------------------

def test_schema_evolution_old_partition_surfaces_typed_nulls(
        spark, sf_dir, tmp_path):
    from etl_cloud_batch_processing_spark.plans.evolution import (
        write_evolving_partitions,
    )

    path = str(tmp_path / "evolved")
    d0, d1 = write_evolving_partitions(spark, sf_dir, path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert dict(back.dtypes)["value_cents"] == "bigint"  # typed, not lost
    old = back.filter(F.col("dt").cast("string") == d0)
    assert old.count() > 0
    assert old.filter(F.col("value_cents").isNotNull()).count() == 0
    new = back.filter(F.col("dt").cast("string") == d1)
    assert new.filter(F.col("value_cents").isNotNull()).count() == new.count()


def test_schema_evolution_backfill_rerun_is_idempotent(spark, sf_dir,
                                                       tmp_path):
    """Re-running the OLD-schema day after the table has evolved (the
    late backfill retry) must replace its partition and leave the
    merged read intact."""
    from etl_cloud_batch_processing_spark.plans.evolution import (
        write_evolving_partitions,
    )
    from etl_cloud_batch_processing_spark.plans.registry import table
    from etl_cloud_batch_processing_spark.sources.writers import (
        write_append_partition,
    )

    path = str(tmp_path / "evolved_rerun")
    d0, d1 = write_evolving_partitions(spark, sf_dir, path)
    before = {tuple(r) for r in
              spark.read.option("mergeSchema", "true").parquet(path)
              .select("event_id", "value_cents",
                      F.col("dt").cast("string")).collect()}
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    base = (ev.filter(F.col("day") == F.lit(d0).cast("date"))
            .select("event_id", "user_id", "event_type"))
    write_append_partition(base, path, d0)  # retry with pre-evolution schema
    after = {tuple(r) for r in
             spark.read.option("mergeSchema", "true").parquet(path)
             .select("event_id", "value_cents",
                     F.col("dt").cast("string")).collect()}
    assert after == before


def test_rollup_pipeline_survives_evolved_partition(spark, sf_dir,
                                                    tmp_path, monkeypatch):
    """maintain_daily_rollup keeps working after one of its table's
    partitions gains a column: re-running an old day stays idempotent
    and a mergeSchema read unions the schemas."""
    from etl_cloud_batch_processing_spark.plans import temporal
    from etl_cloud_batch_processing_spark.sources.writers import (
        write_append_partition,
    )

    path = str(tmp_path / "rollup_evo")
    monkeypatch.setattr(temporal, "rollup_table_path",
                        lambda _spark, _sf: path)
    temporal.maintain_daily_rollup(spark, sf_dir, run_date="2024-01-01")
    temporal.maintain_daily_rollup(spark, sf_dir, run_date="2024-01-02")
    # day 3 lands with an extra column (the evolution)
    evolved = (spark.read.parquet(f"{path}/dt=2024-01-01")
               .withColumn("source", F.lit("backfill-v2")))
    write_append_partition(evolved, path, "2024-01-03")
    # idempotent re-run of a pre-evolution day still works
    temporal.maintain_daily_rollup(spark, sf_dir, run_date="2024-01-01")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(back.columns) >= {"day", "event_type", "n_events",
                                 "source", "dt"}
    per_dt = {str(r["dt"]): r["n"] for r in
              back.groupBy("dt").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(per_dt) == 3
    assert (back.filter(F.col("dt").cast("string") == "2024-01-01")
            .filter(F.col("source").isNotNull()).count()) == 0


# ---------------------------------------------------------------------------
# mapInArrow Misra-Gries fast path (plans/llm.py _mg_summaries_arrow)
# ---------------------------------------------------------------------------

def _mg_batches_pandas(token_batches):
    import pandas as pd
    return [pd.DataFrame({"token": b}) for b in token_batches]


def _mg_batches_arrow(token_batches):
    import pyarrow as pa
    return [pa.RecordBatch.from_arrays(
        [pa.array(b, type=pa.string())], names=["token"])
        for b in token_batches]


def _run_mg(fn, batches):
    out = list(fn(iter(batches)))
    assert len(out) == 1
    frame = out[0]
    if hasattr(frame, "to_pydict"):  # RecordBatch
        d = frame.to_pydict()
        return dict(zip(d["token"], d["lower_bound"]))
    return dict(zip(frame["token"], frame["lower_bound"]))


def test_mg_arrow_summary_equals_pandas_without_midbatch_compaction():
    """With every batch's distinct count under the 4*MG_K mid-merge
    guard, the two implementations must produce the SAME summary
    mapping (per-batch totals are order-independent and end-of-batch
    compaction is a deterministic function of the dict)."""
    import random

    from etl_cloud_batch_processing_spark.plans.llm import (
        MG_K,
        _mg_summaries,
        _mg_summaries_arrow,
    )

    rng = random.Random(8)
    vocab = [f"t{i:03d}" for i in range(3 * MG_K)]
    batches = [[rng.choice(vocab) for _ in range(500)] for _ in range(4)]
    a = _run_mg(_mg_summaries, _mg_batches_pandas(batches))
    b = _run_mg(_mg_summaries_arrow, _mg_batches_arrow(batches))
    assert a == b
    assert 0 < len(b) <= MG_K


def test_mg_arrow_summary_keeps_mg_guarantees_under_midbatch_compaction():
    """A wide-vocabulary batch forces the 4*MG_K mid-merge compaction;
    whatever summary survives must keep the MG contract: <= MG_K items,
    every true heavy hitter present, and every lower_bound an
    undercount by at most n/MG_K."""
    import collections
    import random

    from etl_cloud_batch_processing_spark.plans.llm import (
        MG_K,
        _mg_summaries_arrow,
    )

    rng = random.Random(9)
    heavy = ["HH1", "HH2"]
    tokens = heavy * 800 + [f"u{i:05d}" for i in range(6 * MG_K)]
    rng.shuffle(tokens)
    batches = [tokens[:2000], tokens[2000:]]
    got = _run_mg(_mg_summaries_arrow, _mg_batches_arrow(batches))
    true = collections.Counter(tokens)
    n = len(tokens)
    assert len(got) <= MG_K
    for t in heavy:  # count > n/MG_K by construction
        assert true[t] * MG_K > n
        assert t in got
    for t, lb in got.items():
        assert lb <= true[t]
        assert true[t] - lb <= n / MG_K + 1e-9


def test_heavy_hitters_query_unchanged_by_arrow_port(spark, sf_dir, duck):
    """The driver-green contract: the mapInArrow-backed query still
    matches its DuckDB oracle row set."""
    from etl_cloud_batch_processing_spark.plans.llm import (
        frequent_tokens_heavy_hitters,
    )
    from etl_cloud_batch_processing_spark.plans.registry import REGISTRY

    got = {(r["token"], r["n_tokens"], r["n_occurrences"], r["share"])
           for r in frequent_tokens_heavy_hitters(spark, sf_dir).collect()}
    want = {tuple(r) for r in duck.execute(
        REGISTRY["frequent_tokens_heavy_hitters"].oracle).fetchall()}
    assert got == want
