from pyspark.sql import functions as F

from wbkg.communities import (
    community_sizes_topk,
    community_triples,
    cooccurrence_edges,
    label_propagation,
    summarize_communities,
    summary_triples,
)


def _linked(spark, rows):
    return spark.createDataFrame(
        rows, schema="chunk_id string, qid_c string, rdf_safe_c string"
    )


def test_cooccurrence_weights(spark):
    # ref summarize.py:134-143: weight = number of shared entities
    rows = [
        ("c1", "Q1", "Q1"), ("c2", "Q1", "Q1"),       # Q1 shared by c1,c2
        ("c1", "Q2", "Q2"), ("c2", "Q2", "Q2"),       # Q2 shared by c1,c2
        ("c3", "Q3", "Q3"), ("c1", "Q3", "Q3"),       # Q3 shared by c1,c3
        ("c1", "Q1", "Q1"),                            # duplicate mention -> no double count
    ]
    out = {(r.src, r.dst): r.weight for r in cooccurrence_edges(_linked(spark, rows)).collect()}
    assert out == {("c1", "c2"): 2, ("c1", "c3"): 1}


def test_cooccurrence_hub_cap(spark):
    # hub entity mentioned in 6 chunks, cap=3 -> pairs only among first 3
    rows = [(f"c{i}", "HUB", "HUB") for i in range(6)]
    out = cooccurrence_edges(_linked(spark, rows), entity_chunk_cap=3).collect()
    assert len(out) == 3  # C(3,2)
    chunks = {r.src for r in out} | {r.dst for r in out}
    assert chunks == {"c0", "c1", "c2"}


def test_label_propagation_two_clusters(spark):
    edges = spark.createDataFrame(
        [
            ("a1", "a2", 5), ("a2", "a3", 5), ("a1", "a3", 5),
            ("b1", "b2", 5), ("b2", "b3", 5),
            ("a3", "b1", 1),  # weak bridge
        ],
        schema="src string, dst string, weight long",
    )
    comm = {r.chunk_id: r.community_id for r in label_propagation(edges).collect()}
    assert comm["a1"] == comm["a2"] == comm["a3"]
    assert comm["b1"] == comm["b2"] == comm["b3"]
    # determinism
    comm2 = {r.chunk_id: r.community_id for r in label_propagation(edges).collect()}
    assert comm == comm2


def test_community_triples_and_topk(spark):
    comms = spark.createDataFrame(
        [("c1", 7), ("c2", 7), ("c3", 9)], schema="chunk_id string, community_id long"
    )
    t = community_triples(comms).collect()
    preds = {(r.subj, r.pred, r.obj) for r in t}
    assert (
        "http://worldbank.example.org/chunk/c1",
        "http://schema.org/isPartOf",
        "http://worldbank.example.org/community/7",
    ) in preds
    assert (
        "http://worldbank.example.org/community/9",
        "rdf:type",
        "http://schema.org/Community",
    ) in preds
    top = community_sizes_topk(comms).collect()
    assert top[0].community_id == 7 and top[0].size == 2


def test_summarize_budget_and_triples(spark):
    comms = spark.createDataFrame(
        [("c1", 1), ("c2", 1), ("c3", 1)], schema="chunk_id string, community_id long"
    )
    chunks = spark.createDataFrame(
        [
            ("c1", "First sentence here. More text follows."),
            ("c2", " ".join(["w"] * 50)),
            ("c3", " ".join(["x"] * 10000)),  # exceeds the budget -> dropped
        ],
        schema="chunk_id string, text string",
    )
    s = summarize_communities(comms, chunks, max_tokens=100).collect()
    assert len(s) == 1
    row = s[0]
    assert row.n_chunks_used == 2  # c3 over budget
    assert row.summary == "First sentence here."
    st = summary_triples(spark.createDataFrame(s)).collect()
    assert st[0].pred == "http://schema.org/abstract"


# --------------------------------------------------------------------------- #
# hierarchical communities (G2 max_cluster_size; ref summarize.py:160-166)     #
# --------------------------------------------------------------------------- #


def _hier_rows(hier_df):
    return {(r.chunk_id, r.level): r.community_id for r in hier_df.collect()}


def test_hierarchical_bound_uniform_weights(spark):
    """A uniform-weight chain of 7 merges into one L0 community; the even
    split must bound every final community at max_cluster_size=3."""
    from wbkg.communities import final_communities, hierarchical_communities

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", 1) for i in range(6)],
        schema="src string, dst string, weight long",
    )
    hier = hierarchical_communities(edges, max_cluster_size=3)
    l0 = hier.filter("level = 0")
    assert l0.select("community_id").distinct().count() == 1  # one big community
    fin = final_communities(hier)
    sizes = [r.sz for r in fin.groupBy("community_id").agg(F.count("*").alias("sz")).collect()]
    assert max(sizes) <= 3 and sum(sizes) == 7
    # deterministic
    assert _hier_rows(hier) == _hier_rows(hierarchical_communities(edges, max_cluster_size=3))


def test_hierarchical_weak_tie_refinement(spark):
    """Two strong cliques joined by a weak bridge collapse at L0 (monotone LP
    pulls all labels to the min), then refinement drops the min-weight edge
    class and recovers the two cliques at L1."""
    from wbkg.communities import final_communities, hierarchical_communities

    edges = spark.createDataFrame(
        [
            ("a1", "a2", 5), ("a2", "a3", 5), ("a1", "a3", 5),
            ("b1", "b2", 5), ("b2", "b3", 5), ("b1", "b3", 5),
            ("a3", "b1", 1),  # weak bridge: the min-weight class to drop
        ],
        schema="src string, dst string, weight long",
    )
    hier = hierarchical_communities(edges, max_cluster_size=4)
    fin = {r.chunk_id: r.community_id for r in final_communities(hier).collect()}
    assert fin["a1"] == fin["a2"] == fin["a3"]
    assert fin["b1"] == fin["b2"] == fin["b3"]
    assert fin["a1"] != fin["b1"]
    sizes = [3, 3]
    got = sorted(
        r.sz
        for r in final_communities(hier).groupBy("community_id").agg(F.count("*").alias("sz")).collect()
    )
    assert got == sizes


def test_hierarchical_small_communities_untouched(spark):
    from wbkg.communities import hierarchical_communities

    edges = spark.createDataFrame(
        [("x1", "x2", 2), ("y1", "y2", 2)], schema="src string, dst string, weight long"
    )
    hier = hierarchical_communities(edges, max_cluster_size=10)
    assert hier.filter("level > 0").count() == 0  # nothing oversized -> flat
