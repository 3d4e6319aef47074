"""Temporal join operators: as-of join and interval-overlap (range) join.

Neither exists as a built-in Spark join type, and the naive formulations
are inequality joins that Catalyst can only run as broadcast-nested-loop —
quadratic work per key. Both ops re-express the semantics as
equi-join/window plans that survive a 100x scale-up:

- asof_join: point-in-time lookup — for each left row, the single most
  recent right row at-or-before its timestamp (kdb aj / pandas merge_asof
  / DuckDB ASOF JOIN semantics, backward + inclusive). Implemented with
  the union-sort-window formulation: tag both inputs, union them, sort
  once per key by (ts, side), and carry the latest right payload forward
  with last(ignorenulls) over an unbounded-preceding window; left rows
  then project their carried match. ONE shuffle (the window sort on the
  join key) and no join operator at all — at 100 TB the alternative
  (theta-join l.ts >= r.ts) is a per-key cross product. Payload rides in
  a single struct so the match is atomic (no column-wise tearing when
  several right columns fill independently).
- interval_overlap_join: all (left, right) interval pairs per key that
  truly overlap. Each interval explodes to the fixed-width time bins it
  covers (sequence + explode — bins are integers, never timestamps), the
  two sides equi-join on (key, bin), candidate pairs dedupe, and the
  exact predicate l_start <= r_end AND r_start <= l_end verifies on raw
  microsecond-precision timestamps. Candidate volume is bin co-occupancy,
  not |L|x|R| per key; `max_bins` hard-fails (raise_error, executor-side)
  on intervals that would explode the bin fan-out, the same bounded-hot-key
  discipline as the dedup band caps.

Oracles: DuckDB has native ASOF LEFT JOIN (v0.9+) — the as-of oracle in
__spark_entry__.py is the one-line spec statement; the overlap oracle is
the plain inequality join, which DuckDB executes fine at sf0.01 scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# fixed whole-second anchor for bin arithmetic: timestampdiff(SECOND)
# truncates identically in Spark and DuckDB for positive differences, and
# bins are internal to the Spark plan anyway (the oracle never bins)
_ANCHOR = "TIMESTAMP_NTZ '2000-01-01 00:00:00'"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward inclusive as-of join -> left.* plus each right payload
    column as `<col><suffix>` (null when no right row at-or-before).

    `tiebreak`: right column that breaks ties when several right rows
    share (key, ts) — the greatest value wins, making the result
    deterministic (pass the right side's unique id). Without it, equal
    (key, ts) right rows are an undefined choice, exactly as in DuckDB.
    """
    rpay = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    r2 = right.select(
        F.col(on).alias("__wbkg_k"),
        F.col(right_ts).alias("__wbkg_ts"),
        F.lit(0).alias("__wbkg_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__wbkg_tb"),
        F.struct(*[F.col(c) for c in rpay]).alias("__wbkg_pay"),
    )
    l2 = (
        left.withColumn("__wbkg_k", F.col(on))
        .withColumn("__wbkg_ts", F.col(left_ts))
        .withColumn("__wbkg_side", F.lit(1))
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # right (side 0) sorts before left (side 1) at equal ts -> inclusive;
    # among equal-(ts) right rows the greatest tiebreak sorts last -> wins.
    # Left rows carry a null tiebreak; asc_nulls_first keeps them ordered
    # after every right row only via the side column, never the tiebreak.
    w = (
        Window.partitionBy("__wbkg_k")
        .orderBy(
            F.col("__wbkg_ts"),
            F.col("__wbkg_side"),
            F.col("__wbkg_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(
        "__wbkg_m", F.last("__wbkg_pay", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("__wbkg_side") == 1).select(
        *left.columns,
        *[F.col(f"__wbkg_m.{c}").alias(c + suffix) for c in rpay],
    )


def _bin(col: str, bin_seconds: int) -> Column:
    secs = F.expr(f"timestampdiff(SECOND, {_ANCHOR}, {col})")
    return F.floor(secs / F.lit(bin_seconds))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    l_id: str,
    r_id: str,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    bin_seconds: int = 3600,
    max_bins: int = 10_000,
) -> DataFrame:
    """Interval overlap (range) join -> distinct (on, l_id, r_id) pairs
    whose [start, end] intervals intersect (closed-interval semantics:
    touching endpoints DO overlap, matching `l.s <= r.e AND r.s <= l.e`).

    Pick `bin_seconds` near the median interval length: too small
    multiplies the per-interval fan-out, too large packs unrelated
    intervals into shared bins. An interval spanning more than `max_bins`
    bins fails the job loudly (raise_error) instead of silently exploding
    a partition — re-run with a coarser bin for that workload.
    """

    def binned(df: DataFrame, idc: str, s: str, e: str, side: str) -> DataFrame:
        b0, b1 = _bin(s, bin_seconds), _bin(e, bin_seconds)
        guard = F.when(
            b1 - b0 >= max_bins,
            F.raise_error(
                F.format_string(
                    f"interval_overlap_join: {idc}=%s spans >= {max_bins} "
                    f"bins at bin_seconds={bin_seconds}; use a coarser bin",
                    F.col(idc).cast("string"),
                )
            ),
        ).otherwise(b1)
        return df.select(
            F.col(on).alias("__k"),
            F.col(idc).alias(side),
            F.col(s).alias(f"{side}_s"),
            F.col(e).alias(f"{side}_e"),
            F.explode(F.sequence(b0, guard)).alias("__bin"),
        )

    lb = binned(left, l_id, l_start, l_end, "__l")
    rb = binned(right, r_id, r_start, r_end, "__r")
    pairs = (
        lb.join(rb, ["__k", "__bin"])
        .filter(
            (F.col("__l_s") <= F.col("__r_e")) & (F.col("__r_s") <= F.col("__l_e"))
        )
        .select(F.col("__k").alias(on), F.col("__l").alias(l_id), F.col("__r").alias(r_id))
        .distinct()
    )
    return pairs
