"""Table-maintenance primitives: the MERGE INTO half of the engine's
hand-rolled Iceberg emulation.

The reference's checkpointing overwrites whole result parquet files per
stage (ref src/pipeline.py); the resumable-pipeline story here
(wbkg/checkpoint.py) already gives anti-join resume, and this module adds
the other thing a table format does for a continuously-updated KG: upsert
a batch of changed rows into a large snapshot without rewriting rows that
didn't change keys. At 100 TB the discipline is one shuffle on the merge
key — never a driver-side diff — and the source (the day's changes) is
orders of magnitude smaller than the target, so AQE broadcasts it into
the window stage's exchange when small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list,
    order_col: str,
) -> DataFrame:
    """MERGE INTO emulation -> the merged snapshot: for each key, the row
    with the greatest `order_col` wins; on an exact order tie the SOURCE
    row wins (the "matched -> update" arm of ANSI MERGE). Keys present
    only in the source are inserts, only in the target are carried
    unchanged. Source and target must share a schema (enforced by
    unionByName).

    Plan: tag provenance, one unionByName (no shuffle), ONE window shuffle
    on the merge key (row_number over (order_col DESC, source-first)) —
    the same latest-per-key shape as A1/W1, so it scales exactly like
    dedup-latest: shuffle carries the row once, no join, no driver state.
    Deterministic for any (keys, order_col) with a total order per key;
    ties beyond provenance are broken by nothing, so callers pass an
    order_col that is unique per key (a version, a timestamp, a batch id).
    """
    t = target.withColumn("_provenance", F.lit(0))
    s = source.withColumn("_provenance", F.lit(1))
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc("_provenance")
    )
    return (
        t.unionByName(s)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_provenance")
    )
