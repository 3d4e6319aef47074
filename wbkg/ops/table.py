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


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Adds (zkey): the Morton / Z-order interleave of the low `bits` bits
    of two non-negative integer columns — the OPTIMIZE ZORDER BY half of
    the Iceberg/Delta maintenance surface this module emulates. Writing a
    table sorted by zkey makes each parquet file's min/max footer tight in
    BOTH dimensions at once, so range predicates on either column prune
    files — the locality property a single-column sort only gives one
    dimension.

    zkey = sum_i ((a>>i & 1) << 2i) + ((b>>i & 1) << (2i+1)): a pure
    integer Catalyst expression (shift/and/add, whole-stage codegen, no
    UDF), bit-identical in any engine with the same operators. Columns are
    masked to `bits` bits first (callers bucket or hash wider domains
    down); 2*bits <= 62 keeps the key in a signed 64-bit long."""
    if 2 * bits > 62:
        raise ValueError("2*bits must fit a signed 64-bit long")
    a = F.col(col_a).cast("long")
    b = F.col(col_b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return df.withColumn("zkey", z)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list,
) -> DataFrame:
    """Snapshot diff / change-data-feed -> (keys..., op): classify every
    key across two table versions as 'I' (inserted), 'D' (deleted) or 'U'
    (updated — present in both with any non-key column changed) — the
    CDF an Iceberg/Delta reader serves between snapshots, computed
    relationally from two snapshots of any table.

    Change detection hashes the non-key columns (md5 over a unit-separator
    concat with a null sentinel, so NULL vs 'empty string' differ and
    column boundaries can't alias); unchanged keys drop out. Plan: ONE
    full-outer equi-join on the key (both sides shuffle once on the same
    key — co-partitioned; bucket both snapshots by the key and even that
    exchange disappears), hash computed map-side."""
    val_cols = [c for c in old.columns if c not in keys]
    if [c for c in new.columns if c not in keys] != val_cols:
        raise ValueError("old/new schemas differ")
    sep, nul = "\x1f", "\x00<null>"

    def h(df):
        parts = [F.coalesce(F.col(c).cast("string"), F.lit(nul)) for c in val_cols]
        return df.select(
            *keys, F.md5(F.concat_ws(sep, *parts)).alias("_h")
        )

    o = h(old).withColumnRenamed("_h", "_ho")
    n = h(new).withColumnRenamed("_h", "_hn")
    j = o.join(n, keys, "full_outer")
    return (
        j.select(
            *keys,
            F.when(F.col("_ho").isNull(), F.lit("I"))
            .when(F.col("_hn").isNull(), F.lit("D"))
            .when(F.col("_ho") != F.col("_hn"), F.lit("U"))
            .alias("op"),
        )
        .filter(F.col("op").isNotNull())
    )
