"""Property-based invariants for the round-6 event/time-series/cleaning
operators (hypothesis over small random event logs; few examples, Spark per
example — the suite's standard budget discipline).

Invariants (definitional, independent of the implementation's plans):

- ewma_smooth: the smoothed value always lies within [min, max] of the
  user's values (a convex combination can't escape the hull), and
  n_events matches the input.
- gapfill_daily: the per-user day spine is DENSE (consecutive days, no
  holes) and spans exactly [min_day, max_day]; observed days keep their
  counts, silent days are zero.
- event_transitions: pair counts sum to sum_u(n_u - 1) (every non-final
  event emits exactly one pair) and each from-row's probs sum to 1.
- table_diff(df, df) is empty; winsorize clipped values never leave
  [lo, hi] and untouched values pass through.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

HC = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # user
        st.integers(min_value=0, max_value=10**6),   # ts offset seconds
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=25,
)


def _events_df(spark, rows):
    data = [
        (i, u, f"2024-01-01 00:00:{0:02d}", float(v), off)
        for i, (u, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, base string, value double, off long"
    )
    return df.select(
        "event_id",
        "user_id",
        (F.col("base").cast("timestamp") + F.make_interval(secs=F.col("off"))).alias(
            "ts"
        ),
        "value",
    )


@given(rows=EVENTS)
@settings(**HC)
def test_ewma_stays_in_hull(spark, rows):
    from wbkg.ops.prep import ewma_smooth

    df = _events_df(spark, rows)
    got = {r.user: r for r in ewma_smooth(df, alpha=0.5).collect()}
    byu = {}
    for i, (u, off, v) in enumerate(rows):
        byu.setdefault(u, []).append(float(v))
    for u, vals in byu.items():
        r = got[u]
        assert r.n_events == len(vals)
        assert min(vals) - 1e-6 <= r.ewma <= max(vals) + 1e-6


@given(rows=EVENTS)
@settings(**HC)
def test_gapfill_spine_dense(spark, rows):
    from datetime import date, timedelta

    from wbkg.ops.prep import gapfill_daily

    df = _events_df(spark, rows)
    out = gapfill_daily(df).collect()
    byu = {}
    for r in out:
        byu.setdefault(r.user, []).append(r)
    for u, rs in byu.items():
        days = sorted(date.fromisoformat(r.day) for r in rs)
        # dense: exactly one row per calendar day, no holes
        assert len(set(days)) == len(days)
        assert days[-1] - days[0] == timedelta(days=len(days) - 1)
        n_by_day = {r.day: r.n_events for r in rs}
        assert sum(n_by_day.values()) == sum(1 for (uu, _, _) in rows if uu == u)


@given(rows=EVENTS)
@settings(**HC)
def test_event_transitions_mass(spark, rows):
    from wbkg.ops.prep import event_transitions

    df = _events_df(spark, rows).withColumn(
        "event_type", (F.col("value") > 0).cast("string")
    )
    got = event_transitions(df).collect()
    byu = {}
    for u, _, _ in rows:
        byu[u] = byu.get(u, 0) + 1
    expect_pairs = sum(n - 1 for n in byu.values())
    assert sum(r.n for r in got) == expect_pairs
    from collections import defaultdict

    probs = defaultdict(float)
    for r in got:
        probs[r.from_type] += r.prob
    for ft, p in probs.items():
        assert abs(p - 1.0) < 1e-6


def test_table_diff_self_is_empty(spark):
    from wbkg.ops.table import table_diff

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert table_diff(df, df, ["o_orderkey"]).count() == 0


def test_winsorize_band_invariant(spark):
    from wbkg.ops.prep import winsorize

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    out = winsorize(df, "o_totalprice", lower=0.1, upper=0.9).collect()
    for r in out:
        assert r.lo <= r.clipped <= r.hi
        if r.lo <= r.o_totalprice <= r.hi:
            assert r.clipped == r.o_totalprice
