"""OLAP reporting shapes over the engine's tables: ROLLUP/CUBE subtotal
lattices and fixed-vocabulary pivots.

The reference's notebooks end in exactly these views — triples-per-
predicate tables, entity-type breakdowns (ref notebooks/explore.ipynb) —
computed pandas-side after collecting. At 100 TB the subtotal lattice has
to come out of the engine: Spark's rollup/cube compile to a single
Expand + partial-aggregated groupBy (each input row is replicated once
per grouping set BEFORE the shuffle, map-side combined), so the whole
lattice costs one shuffle, not one query per level. Pivot with an
explicit value list compiles to conditional aggregates (count FILTER per
value) in the same single groupBy — no second pass to discover the
columns, which is the 100-TB discipline anyway: a pivot without a fixed
vocabulary is a schema decided by the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rollup_counts(
    df: DataFrame, dims: list, use_cube: bool = False
) -> DataFrame:
    """Subtotal lattice -> (*dims, gid, n): counts at every ROLLUP (or
    CUBE) grouping set over `dims`, with `gid` = GROUPING bitmask (bit set
    = that dim is rolled up at this row, leftmost dim = highest bit — the
    ANSI GROUPING() semantics both Spark and DuckDB implement). Subtotal
    rows carry NULL in the rolled-up dims; gid disambiguates a genuine
    NULL data value from a subtotal NULL, which is the whole reason the
    column exists."""
    g = df.cube(*dims) if use_cube else df.rollup(*dims)
    return g.agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n"),
    )


def pivot_counts(
    df: DataFrame, key: str, pivot_col: str, values: list
) -> DataFrame:
    """Fixed-vocabulary pivot -> (key, <v1>, <v2>, ...): per-key counts of
    each pivot value as its own column. `values` is REQUIRED — passing the
    vocabulary skips Spark's distinct-scan pre-pass and keeps the output
    schema data-independent (the only pivot that is sane at scale).
    Compiles to one partial-aggregated groupBy with a conditional count
    per value; missing combinations are 0, not NULL (reporting
    convention)."""
    aggs = [
        F.count(F.when(F.col(pivot_col) == v, F.lit(1))).alias(str(v))
        for v in values
    ]
    return df.groupBy(key).agg(*aggs)


def unpivot_measures(
    df: DataFrame, ids: list, measures: list,
    var_name: str = "measure", value_name: str = "value",
) -> DataFrame:
    """Wide -> long reshape (ANSI UNPIVOT / pandas melt): one output row
    per (id-tuple, measure column), measures cast to double into a single
    value column — the step before any per-measure groupBy/window when
    metrics arrive as columns (the inverse of pivot_counts).

    Compiles to Spark's native unpivot (an Expand: each input row is
    replicated once per measure MAP-SIDE — no shuffle, no join, exactly
    the rollup lattice's mechanism pointed sideways). NULL measure values
    are KEPT (Spark's unpivot drops all-null rows only when no id columns
    are given; with ids it emits them — and so does the oracle's UNION
    ALL spelling)."""
    return df.unpivot(
        [F.col(c) for c in ids],
        [F.col(c).cast("double").alias(c) for c in measures],
        var_name,
        value_name,
    )
