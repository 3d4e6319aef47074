"""Property-based invariants for the iterative graph operators and table
maintenance ops (hypothesis over small random graphs — the same strategy
the chunker/ttl property suites use: few examples, Spark per example, so
budgets stay sane while the INVARIANT, not an instance, is what's
asserted).

Invariants checked (the definitional ones, independent of the
implementation's join shapes):

- k-core: every output node's degree (within the output subgraph) >= k,
  and the output is a FIXPOINT (running k_core on it changes nothing).
- k-truss: every surviving edge's support, recomputed in plain Python
  over the surviving edge set, >= k-2; reported support matches.
- merge_upsert: idempotent (re-applying the same source is a no-op) and
  key-complete (output keys == target keys ∪ source keys).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

HC = dict(deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])

NODE = st.integers(min_value=0, max_value=11)
EDGES = st.lists(
    st.tuples(NODE, NODE).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=30,
)


def _und(pairs):
    """canonical undirected simple edge set"""
    return {(min(a, b), max(a, b)) for a, b in pairs}


@settings(max_examples=12, **HC)
@given(pairs=EDGES, k=st.integers(min_value=1, max_value=4))
def test_k_core_definition_and_fixpoint(spark, pairs, k):
    from wbkg.graph_analytics import k_core

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs] or [("x", "x")],
        "src string, dst string",
    )
    out = {(r.node, r.degree) for r in k_core(df, k=k).collect()}
    nodes = {n for n, _ in out}
    # recompute degrees inside the surviving subgraph in plain python
    surviving = {
        (a, b)
        for a, b in _und((f"n{x}", f"n{y}") for x, y in pairs)
        if a in nodes and b in nodes
    }
    deg = {n: 0 for n in nodes}
    for a, b in surviving:
        deg[a] += 1
        deg[b] += 1
    for n, d in out:
        assert deg[n] == d, (n, d, deg[n])
        assert d >= k
    # fixpoint: the k-core of the k-core is itself
    if nodes:
        df2 = spark.createDataFrame(
            [(a, b) for a, b in surviving], "src string, dst string"
        )
        again = {(r.node, r.degree) for r in k_core(df2, k=k).collect()}
        assert again == out


@settings(max_examples=10, **HC)
@given(pairs=EDGES, k=st.integers(min_value=3, max_value=5))
def test_k_truss_definition(spark, pairs, k):
    from wbkg.graph_analytics import k_truss

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs] or [("x", "x")],
        "src string, dst string",
    )
    out = {(r.a, r.b): r.support for r in k_truss(df, k=k).collect()}
    edges = set(out)
    # recompute triangle support within the surviving edge set
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for (a, b), s in out.items():
        support = len(adj.get(a, set()) & adj.get(b, set()))
        assert support == s, ((a, b), s, support)
        assert support >= k - 2


@settings(max_examples=10, **HC)
@given(
    tgt=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), max_size=12),
    src=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 3)), max_size=12),
)
def test_merge_upsert_idempotent_and_key_complete(spark, tgt, src):
    from wbkg.ops.table import merge_upsert

    # unique key per side (latest-version row per key), as the contract asks
    tgt = {k: v for k, v in tgt}
    src = {k: v for k, v in src}
    target = spark.createDataFrame(
        [(k, f"t{k}", v) for k, v in tgt.items()] or [(99, "t", 0)],
        "k long, payload string, version int",
    )
    source = spark.createDataFrame(
        [(k, f"s{k}", v) for k, v in src.items()],
        "k long, payload string, version int",
    ) if src else spark.createDataFrame([], "k long, payload string, version int")
    once = merge_upsert(target, source, ["k"], "version")
    rows1 = {(r.k, r.payload, r.version) for r in once.collect()}
    # key-complete
    want_keys = set(tgt or {99: 0}) | set(src)
    assert {k for k, _, _ in rows1} == want_keys
    # idempotent: merging the same source into the result changes nothing
    rows2 = {
        (r.k, r.payload, r.version)
        for r in merge_upsert(once, source, ["k"], "version").collect()
    }
    assert rows2 == rows1
    # winner rule: source wins ties and higher versions, target keeps newer
    for k in want_keys:
        tv, sv = tgt.get(k, 99 if k == 99 else None), src.get(k)
        row = next(r for r in rows1 if r[0] == k)
        if sv is None:
            assert row[1].startswith("t")
        elif tv is None or sv >= tv:
            assert row[1].startswith("s")
        else:
            assert row[1].startswith("t")
