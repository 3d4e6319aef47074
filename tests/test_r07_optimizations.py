"""Focused pins for internals changed by the r07 optimization round.

Each test targets an EQUIVALENCE the optimization relies on, not a plan
shape: the rewritten operator must produce the same values as a plain
reference computation (or as the un-optimized formulation).
"""

import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

HC = dict(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])

NODE = st.integers(min_value=0, max_value=11)
EDGES = st.lists(
    st.tuples(NODE, NODE).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=30,
)


@settings(max_examples=10, **HC)
@given(pairs=EDGES)
def test_triangle_count_matches_python(spark, pairs):
    """Adjacency-intersection triangle count == brute-force count (the r07
    rewrite replaced the wedge self-join; same Schank-Wagner orientation)."""
    from wbkg.graph_analytics import triangle_count

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs] or [("x", "x")],
        "src string, dst string",
    )
    got = triangle_count(df).collect()[0][0]
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = (
        sum(
            1
            for i, u in enumerate(nodes)
            for v in nodes[i + 1 :]
            if v in adj[u]
            for w in nodes
            if w > v and w in adj[u] and w in adj[v]
        )
        if nodes
        else 0
    )
    assert got == want


def test_clustering_coefficient_matches_python(spark):
    """Per-node triangle attribution through the exploded intersection."""
    from wbkg.graph_analytics import clustering_coefficient

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5), (0, 3)]
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs], "src string, dst string"
    )
    out = {r.node: (r.deg, r.triangles) for r in clustering_coefficient(df).collect()}
    adj = {}
    for a, b in pairs:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
        adj.setdefault(f"n{b}", set()).add(f"n{a}")
    for n, (deg, tri) in out.items():
        assert deg == len(adj[n])
        want = sum(
            1
            for u in adj[n]
            for v in adj[n]
            if u < v and v in adj[u]
        )
        assert tri == want, (n, tri, want)


def test_hits_zero_fill_covers_all_nodes(spark):
    """r07 carries only nonzero scores through the loop and zero-fills at
    the end: pure sources must report authority 0, pure sinks hub 0, and
    every node must appear."""
    from wbkg.graph_analytics import hits

    df = spark.createDataFrame(
        [("s", "m"), ("s", "m2"), ("m", "t"), ("m2", "t")],
        "src string, dst string",
    )
    out = {r.node: (r.authority, r.hub) for r in hits(df, iterations=4).collect()}
    assert set(out) == {"s", "m", "m2", "t"}
    assert out["s"][0] == 0.0  # nothing points at the source
    assert out["t"][1] == 0.0  # the sink points at nothing
    assert out["t"][0] > 0 and out["s"][1] > 0


@settings(max_examples=25, **HC)
@given(s=st.text(max_size=60))
def test_normalize_surface_run_fold_equivalence(spark, s):
    """Run-local non-ASCII folding == whole-string NFKD + mark strip (the
    r07 hot-path rewrite; ASCII chars are NFKD-invariant and never marks)."""
    from wbkg.extract import _combining_deletion_table, normalize_surface

    tbl = _combining_deletion_table()
    want = " ".join(
        unicodedata.normalize("NFKD", s).translate(tbl).lower().split()
    )
    assert normalize_surface(s) == want


def test_bgp_join_reorder_preserves_solutions(spark):
    """Selectivity-ordered BGP joins return the same solution multiset as
    written-order compilation (inner joins commute); exercised on a BGP
    where the reorder actually fires (>= 3 patterns, skewed pred counts)."""
    from wbkg.sparql import _collect_pred_stats, sparql_select

    rows = []
    for i in range(60):
        rows.append((f"c{i}", "urn:in", f"g{i % 3}"))
    for j in range(6):
        rows.append((f"s{j}", "urn:sup", f"g{j % 3}"))
    for g in range(3):
        rows.append((f"g{g}", "urn:name", f"G-{g}"))
    edges = spark.createDataFrame(rows, "subj string, pred string, obj string")
    q = """
        SELECT ?c ?s ?nm WHERE {
            ?c <urn:in> ?g .
            ?s <urn:sup> ?g .
            ?g <urn:name> ?nm .
        }
    """
    got = sorted(map(tuple, sparql_select(edges, q).collect()))
    # reference: plain relational join in written order
    c = edges.filter(F.col("pred") == "urn:in").select(
        F.col("subj").alias("c"), F.col("obj").alias("g")
    )
    s = edges.filter(F.col("pred") == "urn:sup").select(
        F.col("subj").alias("s"), F.col("obj").alias("g")
    )
    nm = edges.filter(F.col("pred") == "urn:name").select(
        F.col("subj").alias("g"), F.col("obj").alias("nm")
    )
    want = sorted(
        map(tuple, c.join(s, "g").join(nm, "g").select("c", "s", "nm").collect())
    )
    assert got == want
    # stats collection is deterministic and the reorder is stable
    stats = _collect_pred_stats(edges)
    assert stats == {"urn:in": 60, "urn:sup": 6, "urn:name": 3}


def test_order_patterns_deterministic_and_complete():
    """_order_patterns returns a permutation, heaviest pattern last when
    connected, and is a no-op without stats."""
    from wbkg.sparql import _Term, _order_patterns

    def pat(s, p, o):
        return (_Term("var", s), _Term("const", p), _Term("var", o))

    pats = [pat("c", "urn:in", "g"), pat("s", "urn:sup", "g"), pat("g", "urn:name", "nm")]
    stats = {"urn:in": 1000, "urn:sup": 10, "urn:name": 3}
    ordered = _order_patterns(pats, stats)
    assert [p for p, _e in ordered][-1] is pats[0]  # biggest last
    assert sorted(id(p) for p, _ in ordered) == sorted(id(p) for p in pats)
    assert _order_patterns(pats, stats) == ordered  # stable
    assert [p for p, e in _order_patterns(pats, None)] == pats  # no stats -> as written


@settings(max_examples=8, **HC)
@given(pairs=EDGES)
def test_incremental_kcore_matches_python_peel(spark, pairs):
    """The r07 incremental-degree k-core == a plain Python peel (round-for-
    round equivalence argued in the docstring; this pins the fixpoint)."""
    from wbkg.graph_analytics import k_core

    k = 2
    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs] or [("x", "x")],
        "src string, dst string",
    )
    got = {(r.node, r.degree) for r in k_core(df, k=k).collect()}
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    adj = {}
    for a, b in und:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
        adj.setdefault(f"n{b}", set()).add(f"n{a}")
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    want = {(n, len(ns)) for n, ns in adj.items()}
    assert got == want
