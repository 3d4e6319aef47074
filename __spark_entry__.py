"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship: full KG pipeline (chunk -> extract -> link ->
                    canonicalize -> materialize) over the sf0.001 documents
                    table re-shaped into the interleaved-span input schema;
                    returns the edges DataFrame.
queries()         — one callable per implemented operator (SURVEY.md §2 +
                    training-data ops); each (spark, sf_dir) -> DataFrame.
oracle_sql()      — DuckDB-equivalent SQL for EVERY query (0 rows-only).
                    Hash-seeded ops (minhash/simhash/fingerprint) are made
                    oracle-checkable by planting verbatim duplicates whose
                    recovery the oracle states as ground truth; LSH ops
                    restate the fixed hyperplane buckets as SQL literals; the
                    full pipeline is compared in-query against the pure-
                    Python oracle and must report matching counts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERY_VEC = [1.0 if i % 3 == 0 else (0.5 if i % 3 == 1 else -0.25) for i in range(64)]
QUERY_VEC_SQL = "[" + ", ".join(str(x) for x in QUERY_VEC) + "]::DOUBLE[]"

DICT_TERMS = ["hash", "join", "window", "spark", "stream"]

# planted-duplicate scheme for the hash-seeded dedup/fingerprint operators:
# every 10th document is copied verbatim under doc_id + PLANT_OFFSET, so a
# correct implementation MUST pair each (orig, copy) — the DuckDB oracle
# states those pairs independently of the hashing internals.
PLANT_OFFSET = 10_000_000
EMB_PLANT_OFFSET = 1_000_000

# The exact hyperplanes used by wbkg.ops (seed=7, n_planes=8, dim=64): with
# these as SQL literals the LSH bucket itself is DuckDB-expressible, which
# upgrades the LSH queries from rows-only to full value-hash oracles.
import numpy as np

_LSH_PLANES = np.random.RandomState(7).randn(8, 64)
# the banded near-dup operator consumes RandomState(7).randn(n_bands*band_planes, dim)
_DEDUP_N_BANDS, _DEDUP_BAND_PLANES = 6, 8
_DEDUP_PLANES = np.random.RandomState(7).randn(_DEDUP_N_BANDS * _DEDUP_BAND_PLANES, 64)


def _plane_sql(p) -> str:
    return "[" + ",".join(repr(float(x)) for x in p) + "]::DOUBLE[]"


def _bucket_sql(col: str = "embedding") -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product({col}::DOUBLE[], {_plane_sql(_LSH_PLANES[i])}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )


def _band_bucket_sql(band: int, col: str = "embedding") -> str:
    """DuckDB replay of band k's sign-bit bucket (rows [k*bp, (k+1)*bp) of
    the operator's plane matrix)."""
    bp = _DEDUP_BAND_PLANES
    return " + ".join(
        f"(CASE WHEN list_dot_product({col}::DOUBLE[], {_plane_sql(_DEDUP_PLANES[band * bp + i])}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(bp)
    )


def _probe_bucket_sql(query, probe_bits: int = 2) -> str:
    """The multi-probe bucket set lsh_topk() visits, precomputed (the planes,
    seed and query vector are all compile-time constants)."""
    qsigns = (_LSH_PLANES @ np.asarray(query, dtype=float)) > 0
    qb = int((qsigns * (1 << np.arange(8))).sum())
    probes = {qb}
    if probe_bits >= 1:
        probes |= {qb ^ (1 << i) for i in range(8)}
    if probe_bits >= 2:
        probes |= {qb ^ (1 << i) ^ (1 << j) for i in range(8) for j in range(i + 1, 8)}
    return ", ".join(str(b) for b in sorted(probes))


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------- #
# flagship                                                                     #
# --------------------------------------------------------------------------- #


def _docs_as_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-shape the driver documents table into the input_hint span schema:
    one text span per document."""
    docs = _read(spark, sf_dir, "documents")
    span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), F.array(span).alias("spans")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wbkg.extract import build_pattern_rows
    from wbkg.pipeline import run_pipeline
    from wbkg.synth import build_entity_dict_rows, build_unbis_rows, entity_dict_df

    sf_dir = "/root/testdata/sf0.001"
    docs = _docs_as_interleaved(spark, sf_dir)
    # dictionary: the synth canonical dictionary + the driver-text term dict
    rows = build_entity_dict_rows(50)
    for i, t in enumerate(DICT_TERMS):
        rows.append(
            {
                "entity_id": f"T{i:03d}",
                "surface_norm": t,
                "kind": "sector",
                "label": t,
                "is_alias": False,
                "alias_of": None,
            }
        )
    edict = spark.createDataFrame(rows, schema="entity_id string, surface_norm string, kind string, label string, is_alias boolean, alias_of string")
    pats = build_pattern_rows(rows, build_unbis_rows())
    result = run_pipeline(spark, docs, edict, pats, metadata_df=None, cache=False)
    return result["edges"]


# --------------------------------------------------------------------------- #
# queries                                                                      #
# --------------------------------------------------------------------------- #


def q_a1_dedup_latest(spark, sf_dir):
    """A1/W1 — latest order per customer via row_number window
    (ref src/graph.py:185-190 drop-older-versions)."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


def q_a5_cooccurrence(spark, sf_dir):
    """A5 — co-occurrence pair weights (ref src/summarize.py:134-143);
    parts co-ordered within an order. Same solution set as the r06
    self-join formulation, but the ordered pairs are generated MAP-SIDE
    from each order's sorted part array (posexplode + slice — the
    wbkg/graph_analytics wedge rewrite), so the pair fold
    partial-aggregates before its one shuffle instead of sort-merge
    joining the incidence list against itself."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("_ps")
    )
    lhs = grouped.select("_ps", F.posexplode("_ps").alias("_i", "part_a"))
    return (
        lhs.select(
            "part_a",
            F.explode(F.slice("_ps", F.col("_i") + 2, F.size("_ps"))).alias(
                "part_b"
            ),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("weight"))
    )


def q_a6_top_event_types(spark, sf_dir):
    """A6 — community-size-histogram analogue: top-10 groups by count
    (ref src/summarize.py:168-170 Counter.most_common)."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
        .limit(10)
    )


def q_a7_texts_per_group(spark, sf_dir):
    """A7 — collect texts per community analogue (ref src/summarize.py:203-207);
    sorted join for order-insensitive comparison."""
    d = _read(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(F.sort_array(F.collect_list(F.col("doc_id").cast("string"))), "|").alias("doc_ids"),
    )


def q_w5_running_budget(spark, sf_dir):
    """A8/W5 — running token-budget cumulative sum + cutoff
    (ref src/summarize.py:214-220)."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        e.withColumn("cum_value", F.round(F.sum("value").over(w), 2))
        .filter(F.col("cum_value") < 500.0)
        .select("user_id", "event_id", "cum_value")
    )


def q_w4_prev_next(spark, sf_dir):
    """W4 — prev/next relationships via lag/lead (ref src/parser.py:185-189)."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lead("event_id").over(w).alias("next_id"),
    )


def q_j4_star_join(spark, sf_dir):
    """J4 — doc->country link analogue: customer->nation->region equi-joins
    (broadcast dims) + count (ref src/graph.py:605-616)."""
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
    )


def q_j5_explode_links(spark, sf_dir):
    """J5 — comma-separated multi-entity cell -> one row per entity
    (ref src/graph.py:584-587): build the comma list, split+explode, round-trip."""
    n = _read(spark, sf_dir, "nation")
    lists = n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names")
    )
    return (
        lists.select("n_regionkey", F.explode(F.split("names", ",")).alias("nation_name"))
        .filter(F.col("nation_name") != "")
    )


def q_j6_zip_explode(spark, sf_dir):
    """J6 — parallel id/name comma lists zipped (ref src/graph.py:513-533):
    arrays_zip + explode round-trips to the base table."""
    n = _read(spark, sf_dir, "nation")
    kv = F.sort_array(
        F.collect_list(F.struct(F.col("n_nationkey").alias("k"), F.col("n_name").alias("v")))
    )
    lists = n.groupBy("n_regionkey").agg(
        F.array_join(F.transform(kv, lambda s: s["k"].cast("string")), ",").alias("ids"),
        F.array_join(F.transform(kv, lambda s: s["v"]), ",").alias("names"),
    )
    zipped = lists.select(
        "n_regionkey",
        F.explode(
            F.arrays_zip(F.split("ids", ",").alias("id"), F.split("names", ",").alias("nm"))
        ).alias("z"),
    )
    return zipped.select(
        "n_regionkey",
        F.col("z.id").cast("int").alias("n_nationkey"),
        F.col("z.nm").alias("n_name"),
    )


def q_j7_contains_join(spark, sf_dir):
    """J7 — containment theta-join: term dictionary x document text
    (ref src/storage.py:201-210 annotate_chunk 'surface in text')."""
    d = _read(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in DICT_TERMS], "surface string")
    return (
        d.crossJoin(F.broadcast(terms))
        .filter(F.instr(F.lower(F.col("text")), F.col("surface")) > 0)
        .select("doc_id", "surface")
    )


def q_j9_self_join(spark, sf_dir):
    """J9 — two-pattern self-join on subject (ref src/graph.py:653-662):
    urgent orders x finished orders of the same customer."""
    o = _read(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey", F.col("o_orderkey").alias("urgent_order")
    )
    done = o.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", F.col("o_orderkey").alias("finished_order")
    )
    return urgent.join(done, "o_custkey").select("o_custkey", "urgent_order", "finished_order")


def q_j8_semi_join(spark, sf_dir):
    """J8 — left SEMI join gate (ref src/graph.py:747: link only if entity
    already typed): lineitems whose part is a large part."""
    li = _read(spark, sf_dir, "lineitem")
    big = _read(spark, sf_dir, "part").filter(F.col("p_size") > 40).select("p_partkey")
    return (
        li.join(big, li.l_partkey == big.p_partkey, "left_semi")
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )


def q_so2_anti_join(spark, sf_dir):
    """SO2 — already-done exclusion as left ANTI join (ref
    src/storage.py:267-284 existing-ids set difference): customers with no
    urgent orders."""
    c = _read(spark, sf_dir, "customer")
    o = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_g2_label_propagation(spark, sf_dir):
    """G2 — monotone weighted label propagation on the nation-chain graph
    (converges to per-region min on chains; ref src/summarize.py:148-172
    surrogate)."""
    from wbkg.communities import label_propagation
    from pyspark.sql import Window as W

    n = _read(spark, sf_dir, "nation")
    w = W.partitionBy("n_regionkey").orderBy("n_nationkey")
    key = lambda c: F.concat(F.lit("n"), F.lpad(F.col(c).cast("string"), 5, "0"))
    chain = (
        n.withColumn("nxt", F.lead("n_nationkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(key("n_nationkey").alias("src"), key("nxt").alias("dst"), F.lit(1).alias("weight"))
    )
    lp = label_propagation(chain)
    # map hashed community ids back to member labels for the oracle: emit
    # (member, community_size) which is hash-free
    return lp.groupBy("community_id").agg(F.count("*").alias("community_size")).select(
        "community_size"
    )


def q_g2_hierarchical(spark, sf_dir):
    """G2 hierarchical communities with max_cluster_size (ref
    src/summarize.py:160-166 hierarchical_leiden(max_cluster_size=50)): the
    nation-chain graph per region collapses to one community per region at
    level 0; the size bound (3) forces a deterministic level-1 split. Returns
    the structural histogram (level, community_size, n_communities)."""
    from wbkg.communities import hierarchical_communities
    from pyspark.sql import Window as W

    n = _read(spark, sf_dir, "nation")
    w = W.partitionBy("n_regionkey").orderBy("n_nationkey")
    key = lambda c: F.concat(F.lit("n"), F.lpad(F.col(c).cast("string"), 5, "0"))
    chain = (
        n.withColumn("nxt", F.lead("n_nationkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(key("n_nationkey").alias("src"), key("nxt").alias("dst"), F.lit(1).alias("weight"))
    )
    hier = hierarchical_communities(chain, max_cluster_size=3)
    sizes = hier.groupBy("level", "community_id").agg(F.count("*").alias("community_size"))
    return sizes.groupBy("level", "community_size").agg(F.count("*").alias("n_communities"))


def q_so1_union_distinct(spark, sf_dir):
    """SO1 — union-distinct set semantics (rdflib triple set; ref every
    g.add)."""
    n = _read(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    r = _read(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    return n.unionByName(r).unionByName(n).distinct()


def q_graph_2hop_neighborhood(spark, sf_dir):
    """Graph-hop retrieval composition (ref src/query.py:26-76): 2-hop BFS
    from region 0 over the customer->nation->region edge list; min hop per
    node."""
    from wbkg.query import entity_neighborhood

    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    e1 = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
    )
    e2 = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
    )
    return entity_neighborhood(e1.unionByName(e2), "r:0", hops=2)


def q_graph_sibling_docs(spark, sf_dir):
    """Sibling retrieval (chunk -> entity -> chunk 2-hop self-join, ref
    src/query.py:49-66): docs sharing a dictionary term with doc 0."""
    from wbkg.query import sibling_chunks_via_entities

    d = _read(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in DICT_TERMS], "surface string")
    mentions = (
        d.crossJoin(F.broadcast(terms))
        .filter(F.instr(F.lower(F.col("text")), F.col("surface")) > 0)
        .select(
            F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("subj"),
            F.concat(F.lit("t:"), F.col("surface")).alias("obj"),
        )
    )
    return sibling_chunks_via_entities(mentions, "d:0")


def q_sparql_bgp(spark, sf_dir):
    """SPARQL basic-graph-pattern SELECT compiled to DataFrame joins
    (wbkg/sparql.py — the query surface rdflib gives the reference's
    finished graph). Four-pattern star+chain over a TPC-H-derived edge
    list: customers and suppliers co-located in a nation, with the nation's
    name and region. The oracle is the equivalent relational join, so the
    hash match proves the BGP compiler's join/filter semantics, DISTINCT-
    free multiplicity, ORDER BY and LIMIT all agree with SQL."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")

    def _e(df, skey, sp, pred, okey, op, obj_cast=True):
        obj = F.concat(F.lit(op), F.col(okey).cast("string")) if obj_cast else F.col(okey)
        return df.select(
            F.concat(F.lit(sp), F.col(skey).cast("string")).alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
        )

    edges = (
        _e(c, "c_custkey", "c:", "urn:p:in_nation", "c_nationkey", "n:")
        .unionByName(_e(s, "s_suppkey", "s:", "urn:p:sup_nation", "s_nationkey", "n:"))
        .unionByName(_e(n, "n_nationkey", "n:", "urn:p:in_region", "n_regionkey", "r:"))
        .unionByName(_e(n, "n_nationkey", "n:", "urn:p:name", "n_name", "", obj_cast=False))
    )
    return sparql_select(
        edges,
        """
        PREFIX p: <urn:p:>
        SELECT ?c ?s ?nm ?r WHERE {
            ?c p:in_nation ?n .
            ?s p:sup_nation ?n .
            ?n p:name ?nm .
            ?n p:in_region ?r .
        } ORDER BY ?c ?s LIMIT 500
        """,
    )


def q_sparql_optional(spark, sf_dir):
    """OPTIONAL group = left join: every nation row survives with its
    region; the supplier variable nulls out where the (suppkey-restricted)
    optional pattern finds no match. Oracle is the equivalent LEFT JOIN."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    s = _read(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 5)
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_region").alias("pred"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
    ).unionByName(
        s.select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("subj"),
            F.lit("urn:p:sup_nation").alias("pred"),
            F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?r ?s WHERE {
            ?n <urn:p:in_region> ?r .
            OPTIONAL { ?s <urn:p:sup_nation> ?n . }
        } ORDER BY ?n ?s
        """,
    )


def q_sparql_filter(spark, sf_dir):
    """FILTER over a BGP: regex + disjunction + comparison, compiled to
    Column predicates after the join (Catalyst pushes the sargable parts
    back into the scans). Oracle replays it as the equivalent WHERE."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:name").alias("pred"),
        F.col("n_name").alias("obj"),
    ).unionByName(
        n.select(
            F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
            F.lit("urn:p:in_region").alias("pred"),
            F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?nm ?r WHERE {
            ?n <urn:p:name> ?nm .
            ?n <urn:p:in_region> ?r .
            FILTER(REGEX(?nm, "^[A-C]") || ?r = "r:2" && ?nm != "CHINA")
        } ORDER BY ?n
        """,
    )


def q_sparql_groupby(spark, sf_dir):
    """SPARQL aggregates: suppliers per nation + smallest supplier URI,
    compiled to groupBy/agg (partial-aggregated map-side like any Spark
    COUNT). Oracle is the equivalent GROUP BY."""
    from wbkg.sparql import sparql_select

    s = _read(spark, sf_dir, "supplier")
    edges = s.select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("subj"),
        F.lit("urn:p:sup_nation").alias("pred"),
        F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?n (COUNT(?s) AS ?suppliers) (MIN(?s) AS ?first_supplier)
        WHERE { ?s <urn:p:sup_nation> ?n . }
        GROUP BY ?n ORDER BY ?n
        """,
    )


def q_sparql_union(spark, sf_dir):
    """UNION branches (customers-in-region ∪ suppliers-in-region) compile
    independently and bag-union on the shared variables; the oracle is the
    equivalent UNION ALL of two joins."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")

    def _e(df, skey, sp, pred, okey, op):
        return df.select(
            F.concat(F.lit(sp), F.col(skey).cast("string")).alias("subj"),
            F.lit(pred).alias("pred"),
            F.concat(F.lit(op), F.col(okey).cast("string")).alias("obj"),
        )

    edges = (
        _e(c, "c_custkey", "c:", "urn:p:cust_nation", "c_nationkey", "n:")
        .unionByName(_e(s, "s_suppkey", "s:", "urn:p:sup_nation", "s_nationkey", "n:"))
        .unionByName(_e(n, "n_nationkey", "n:", "urn:p:in_region", "n_regionkey", "r:"))
    )
    return sparql_select(
        edges,
        """
        SELECT ?p ?r WHERE {
            { ?p <urn:p:cust_nation> ?n . ?n <urn:p:in_region> ?r . }
            UNION
            { ?p <urn:p:sup_nation> ?n . ?n <urn:p:in_region> ?r . }
        } ORDER BY ?p LIMIT 400
        """,
    )


def q_sparql_construct(spark, sf_dir):
    """CONSTRUCT materializes new triples from matched patterns (inverse +
    type edges per nation-in-region match); oracle replays the template
    projection as SQL."""
    from wbkg.sparql import sparql_construct

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_region").alias("pred"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
    )
    return sparql_construct(
        edges,
        """
        CONSTRUCT { ?r <urn:p:has_nation> ?n . ?r a <urn:c:Region> . }
        WHERE { ?n <urn:p:in_region> ?r . }
        """,
    )


def _supplier_nation_edges(spark, sf_dir, max_suppkey=None):
    n = _read(spark, sf_dir, "nation")
    s = _read(spark, sf_dir, "supplier")
    if max_suppkey is not None:
        s = s.filter(F.col("s_suppkey") < max_suppkey)
    return n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_region").alias("pred"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
    ).unionByName(
        s.select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("subj"),
            F.lit("urn:p:sup_nation").alias("pred"),
            F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("obj"),
        )
    )


def q_sparql_order_desc(spark, sf_dir):
    """ORDER BY DESC(...) with an ascending tie-break — rdflib-style mixed
    sort directions over an aggregated BGP; the oracle is the equivalent
    GROUP BY ... ORDER BY count DESC, key ASC LIMIT."""
    from wbkg.sparql import sparql_select

    return sparql_select(
        _supplier_nation_edges(spark, sf_dir),
        """
        SELECT ?n (COUNT(*) AS ?suppliers) WHERE {
            ?s <urn:p:sup_nation> ?n .
        } GROUP BY ?n ORDER BY DESC(?suppliers) ?n LIMIT 10
        """,
    )


def q_sparql_not_exists(spark, sf_dir):
    """FILTER NOT EXISTS = left-anti join on the shared variable: nations in
    a region with NO supplier under the suppkey<8 restriction; the inner
    group never multiplies rows. Oracle is the equivalent NOT EXISTS SQL."""
    from wbkg.sparql import sparql_select

    return sparql_select(
        _supplier_nation_edges(spark, sf_dir, max_suppkey=8),
        """
        SELECT ?n ?r WHERE {
            ?n <urn:p:in_region> ?r .
            FILTER NOT EXISTS { ?s <urn:p:sup_nation> ?n . }
        } ORDER BY ?n
        """,
    )


def q_sparql_minus(spark, sf_dir):
    """MINUS group = anti join on shared variables (SPARQL 1.1 §8.3); same
    relational shape as NOT EXISTS on this graph, but the verb and compile
    path differ (disjoint-domain MINUS is the identity, unit-tested)."""
    from wbkg.sparql import sparql_select

    return sparql_select(
        _supplier_nation_edges(spark, sf_dir, max_suppkey=8),
        """
        SELECT ?n ?r WHERE {
            ?n <urn:p:in_region> ?r .
            MINUS { ?s <urn:p:sup_nation> ?n . }
        } ORDER BY ?n
        """,
    )


def q_sparql_sum_avg(spark, sf_dir):
    """SUM/AVG aggregates over numeric-literal objects (integer-valued so
    the double sum is exact and order-independent); oracle is the relational
    GROUP BY with the same casts."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_nation").alias("pred"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
    ).unionByName(
        c.select(
            F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
            F.lit("urn:p:key").alias("pred"),
            F.col("c_custkey").cast("string").alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?n (SUM(?k) AS ?sum_k) (AVG(?k) AS ?avg_k) WHERE {
            ?c <urn:p:in_nation> ?n .
            ?c <urn:p:key> ?k .
        } GROUP BY ?n ORDER BY ?n
        """,
    )


def q_sparql_filter_strfns(spark, sf_dir):
    """CONTAINS / STRSTARTS / STRENDS filter functions over a BGP, composed
    with boolean operators; oracle uses the DuckDB string predicates."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:name").alias("pred"),
        F.col("n_name").alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?nm WHERE {
            ?n <urn:p:name> ?nm .
            FILTER(STRSTARTS(?nm, "A") || (CONTAINS(?nm, "AN") && !STRENDS(?nm, "A")))
        } ORDER BY ?n
        """,
    )


def q_sparql_path_seq(spark, sf_dir):
    """Property-path sequence <p1>/<p2>: customer -> nation -> region in one
    pattern; each step is a constant-predicate scan chained by equi-join.
    Oracle is the two-hop relational join."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_nation").alias("pred"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
    ).unionByName(
        n.select(
            F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
            F.lit("urn:p:in_region").alias("pred"),
            F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?c ?r WHERE { ?c <urn:p:in_nation>/<urn:p:in_region> ?r . }
        ORDER BY ?c LIMIT 500
        """,
    )


def q_sparql_path_plus(spark, sf_dir):
    """Transitive closure <p>+ over the per-region nation chain (the same
    graph the distributed-CC bench uses): semi-naive iteration with
    localCheckpoint lineage cuts. The chain is ordered by nationkey within
    region, so the oracle states the closure non-recursively as all ordered
    same-region pairs."""
    from pyspark.sql import Window

    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    chain = (
        n.withColumn("nxt", F.lead("n_nationkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
            F.lit("urn:p:next").alias("pred"),
            F.concat(F.lit("n:"), F.col("nxt").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        chain, "SELECT ?a ?b WHERE { ?a <urn:p:next>+ ?b . } ORDER BY ?a ?b"
    )


def _nation_chain_edges(spark, sf_dir):
    """Per-region nation chain as (subj, pred, obj) edges — the shared
    fixture graph for the closure-path queries."""
    n = _read(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    return (
        n.withColumn("nxt", F.lead("n_nationkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
            F.lit("urn:p:next").alias("pred"),
            F.concat(F.lit("n:"), F.col("nxt").cast("string")).alias("obj"),
        )
    )


def q_sparql_path_alt(spark, sf_dir):
    """Property-path alternation <p1>|<p2> (SPARQL 1.1 §9, the most common
    path operator after sequence): customer-nation and supplier-nation
    memberships asked as one pattern. Compiles to a bag unionByName of the
    two constant-predicate scans — no join, no shuffle beyond the scans."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    s = _read(spark, sf_dir, "supplier")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("urn:p:cust_nation").alias("pred"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
    ).unionByName(
        s.select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("subj"),
            F.lit("urn:p:supp_nation").alias("pred"),
            F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?x ?n WHERE { ?x <urn:p:cust_nation>|<urn:p:supp_nation> ?n . }
        """,
    )


def q_sparql_path_star(spark, sf_dir):
    """Zero-or-more path <p>* (the isPartOf*-style hierarchy operator):
    closure of the per-region nation chain UNION the graph-node identity
    relation (SPARQL 1.1 §9.1 ZeroOrMorePath). The chain is ordered within
    region, so the oracle states the closure as all ordered same-region
    pairs plus one reflexive row per chain node."""
    from wbkg.sparql import sparql_select

    edges = _nation_chain_edges(spark, sf_dir)
    return sparql_select(
        edges, "SELECT ?a ?b WHERE { ?a <urn:p:next>* ?b . }"
    )


def q_sparql_bind(spark, sf_dir):
    """BIND(expr AS ?v) — derived bindings via withColumn over the joined
    pattern block; the expression compiler is shared with FILTER (CONCAT /
    UCASE / STRLEN here, all Catalyst string functions)."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:name").alias("pred"),
        F.col("n_name").alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?lbl WHERE { ?n <urn:p:name> ?nm .
            BIND(CONCAT(UCASE(?nm), "/", STRLEN(?nm)) AS ?lbl) }
        """,
    )


def q_sparql_str_extract(spark, sf_dir):
    """SUBSTR / STRBEFORE / STRAFTER value functions (SPARQL 1.1
    §17.4.3): 1-based fn:substring plus separator extraction with the
    spec's absent-separator -> "" rule (?missing pins it — "#" never
    occurs in a nation name). All compile to Catalyst substring/instr
    expressions; no UDFs."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:name").alias("pred"),
        F.col("n_name").alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?num ?stem ?abbr ?missing WHERE {
            ?n <urn:p:name> ?nm .
            BIND(STRAFTER(?nm, "_") AS ?num)
            BIND(STRBEFORE(?nm, "_") AS ?stem)
            BIND(SUBSTR(?nm, 2, 3) AS ?abbr)
            BIND(STRBEFORE(?nm, "#") AS ?missing)
        } ORDER BY ?n
        """,
    )


def q_sparql_filter_numeric(spark, sf_dir):
    """Typed-numeric FILTER comparison (VERDICT r05 #1): a bare numeric
    literal casts both sides to double (rdflib compares typed literals
    numerically), while quoted strings stay lexical. The fixture values
    (multiples of 5 up to "120") order differently lexically vs
    numerically, so a lexical `>` would hash-mismatch the oracle."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:pop").alias("pred"),
        (F.col("n_nationkey") * 5).cast("string").alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?pop WHERE {
            ?n <urn:p:pop> ?pop .
            FILTER(?pop > 59 && ?pop != "60")
        } ORDER BY ?n
        """,
    )


def q_sparql_lang(spark, sf_dir):
    """Language-tag surface (VERDICT r05 #3): the edges table carries the
    `lang` column the Turtle ingest emits (the reference tags literals
    lang='en', ref src/graph.py:231,242,267); LANG(?v) reads the hidden
    companion binding and the FILTER drops the @de rows. The oracle
    reconstructs the surviving (en + plain) rows with their tags."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    subj = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))

    def _lbl(obj, lang):
        return n.select(
            subj.alias("subj"),
            F.lit("urn:p:label").alias("pred"),
            obj.alias("obj"),
            (F.lit(lang) if lang else F.lit(None)).cast("string").alias("lang"),
        )

    edges = (
        _lbl(F.col("n_name"), "en")
        .unionByName(_lbl(F.lower("n_name"), "de"))
        .unionByName(_lbl(F.concat(F.col("n_name"), F.lit("!")), None))
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?lbl ?lg WHERE {
            ?n <urn:p:label> ?lbl .
            BIND(LANG(?lbl) AS ?lg)
            FILTER(LANG(?lbl) != "de")
        } ORDER BY ?n ?lbl
        """,
    )


def q_sparql_datatype(spark, sf_dir):
    """DATATYPE(?v) (closes the VERDICT r05 missing-#2 remainder): the
    edges fixture carries lang AND obj_is_literal (the full edge schema,
    wbkg/schemas.py); the object variable binds a hidden term-type
    companion. en-tagged label -> rdf:langString, plain label ->
    xsd:string, IRI object -> null (SPARQL type error leaves ?dt unbound
    in BIND). Oracle reconstructs the three branches."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    subj = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))

    def _edge(pred, obj, lang, lit):
        return n.select(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            (F.lit(lang) if lang else F.lit(None)).cast("string").alias("lang"),
            F.lit(lit).alias("obj_is_literal"),
        )

    edges = (
        _edge("urn:p:label", F.col("n_name"), "en", True)
        .unionByName(
            _edge("urn:p:label", F.concat(F.col("n_name"), F.lit("!")), None, True)
        )
        .unionByName(
            _edge("urn:p:ref", F.concat(F.lit("urn:x:"), F.col("n_name")), None, False)
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?p ?v ?dt WHERE {
            ?n ?p ?v .
            BIND(DATATYPE(?v) AS ?dt)
        } ORDER BY ?n ?p ?v
        """,
    )


def q_sparql_strlang(spark, sf_dir):
    """STRLANG(expr, "tag") constructs a lang-tagged literal in BIND: the
    bound variable gains a lang companion, so LANG() and DATATYPE()
    (rdf:langString) downstream see the tag. Works over a plain
    (subj,pred,obj) table — the companion is born in the BIND."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:label").alias("pred"),
        F.col("n_name").alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?u ?lg ?dt WHERE {
            ?n <urn:p:label> ?v .
            BIND(STRLANG(UCASE(?v), "en") AS ?u)
            BIND(LANG(?u) AS ?lg)
            BIND(DATATYPE(?u) AS ?dt)
        } ORDER BY ?n
        """,
    )


def q_sparql_subquery_having(spark, sf_dir):
    """HAVING inside a { SELECT } subquery (ADVICE r05 medium): the lift is
    brace-depth-aware, so the HAVING filters the SUBQUERY's groups — the
    pre-fix parser hoisted it to the outer query (unfiltered groups +
    an outer HAVING over a subquery-internal variable)."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    s = _read(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 50)
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:name").alias("pred"),
        F.col("n_name").alias("obj"),
    ).unionByName(
        s.select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("subj"),
            F.lit("urn:p:sup_nation").alias("pred"),
            F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?n ?c WHERE {
            ?n <urn:p:name> ?nm .
            { SELECT ?n (COUNT(?s) AS ?c) WHERE { ?s <urn:p:sup_nation> ?n }
              GROUP BY ?n HAVING(COUNT(?s) > 2) }
        } ORDER BY ?n
        """,
    )


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (wbkg/ops/prep.py sessionize): lag-gap-
    cumsum window dataflow, 30-minute gap — the batch twin of Structured
    Streaming's session_window. Oracle replays the identical windows."""
    from wbkg.ops.prep import sessionize

    ev = _read(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize(ev, gap_minutes=30).select(
        "user_id", "event_id", "session_seq", "session_id"
    )


def q_sketch_quantiles(spark, sf_dir):
    """Quantile sketch vs exact ranks per language (wbkg/ops/prep.py
    sketch_quantiles): percentile_approx's rank guarantee checked exactly
    (tie-safe rank interval), same bound-check pattern as the HLL sketch —
    the exact row counts and the verdict are oracle-replayable."""
    from wbkg.ops.prep import sketch_quantiles

    return sketch_quantiles(
        _read(spark, sf_dir, "documents"), group_col="lang", value_col="n_chars"
    )


def q_sketch_distinct_sources(spark, sf_dir):
    """HLL++ cardinality sketch vs exact distinct per language
    (wbkg/ops/prep.py sketch_distinct): the exact count and the 5-sigma
    bound check are oracle-replayable; a broken sketch (or a broken exact
    path) flips within_bounds and fails the value hash."""
    from wbkg.ops.prep import sketch_distinct

    return sketch_distinct(
        _read(spark, sf_dir, "documents"), group_col="lang", value_col="source"
    )


def q_graph_pagerank(spark, sf_dir):
    """Power-iteration PageRank (wbkg/graph_analytics.py) over the
    per-region nation chain: every node has <=1 in-edge, so each
    iteration's update is a single-term recurrence and the oracle replays
    all 10 iterations EXACTLY with a single-row recursive CTE over the 5
    chain positions (nation is the fixed 5x5 TPC-H table at every sf).
    Dangling mass (the 5 chain tails) is redistributed uniformly each
    round, same correction on both sides; ranks rounded to 8 decimals to
    absorb sum-order ulp."""
    from wbkg.graph_analytics import pagerank

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    pr = pagerank(chain, iterations=10, damping=0.85)
    return pr.select("node", F.round("rank", 8).alias("rank"))


def q_graph_triangles(spark, sf_dir):
    """Triangle count (ordered three-way self-join) over the part
    co-purchase graph — parts co-occurring in one order, the same pair
    generator as a5_cooccurrence. Oracle restates the identical ordered
    join in SQL."""
    from wbkg.graph_analytics import triangle_count

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    return triangle_count(pairs)


def q_graph_node_jaccard(spark, sf_dir):
    """Item-item similarity (wbkg/graph_analytics.py neighbor_jaccard)
    over the part->order incidence: Jaccard of two parts' order sets,
    the collaborative-filtering 'bought together' primitive. Wedge
    enumeration through the shared order (center), Schank-Wagner shape;
    the center cap (1000) is a no-op on this data — baskets are small —
    so the oracle states the plain spec; the cap's recall behavior is
    unit-tested separately. Integer counts, one IEEE division, round 8."""
    from wbkg.graph_analytics import neighbor_jaccard

    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_orderkey").alias("dst")
    )
    return neighbor_jaccard(li, min_common=3, max_center_degree=1000)


def q_graph_bfs(spark, sf_dir):
    """Multi-source BFS hop distance (wbkg/graph_analytics.py
    bfs_distances): undirected frontier expansion over the per-region
    nation chain from BOTH chain ends, so each node's distance is the
    min over the two sources. The chain is ordered within region, so the
    oracle states the closed form min(pos, cnt-1-pos) per region."""
    from wbkg.graph_analytics import bfs_distances

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    srcs = chain.select(F.col("src").alias("node")).distinct()
    dsts = chain.select(F.col("dst").alias("node")).distinct()
    heads = srcs.join(dsts, "node", "left_anti")
    tails = dsts.join(srcs, "node", "left_anti")
    return bfs_distances(
        chain, heads.unionByName(tails), directed=False
    ).select("node", "dist")


def q_graph_sssp(spark, sf_dir):
    """Weighted shortest paths (wbkg/graph_analytics.py sssp, the
    Bellman-Ford frontier relaxation) over the per-region nation chain
    with edge u->v weighted by v's chain position: node at position p has
    dist = 1+2+...+p, so the oracle states the closed form p(p+1)/2. The
    frontier loop relaxes exactly chain-length rounds then stops on the
    empty-improvement test."""
    from wbkg.graph_analytics import sssp

    n = _read(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    pos = F.row_number().over(w) - 1
    nodes = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("node"),
        pos.alias("p"),
        F.lead("n_nationkey").over(w).alias("nxt"),
    )
    edges = nodes.filter(F.col("nxt").isNotNull()).select(
        F.col("node").alias("src"),
        F.concat(F.lit("n:"), F.col("nxt").cast("string")).alias("dst"),
        (F.col("p") + 1).cast("double").alias("weight"),
    )
    sources = nodes.filter(F.col("p") == 0).select("node")
    return sssp(edges, sources)


def q_scd2_history(spark, sf_dir):
    """SCD2 change history (wbkg/ops/prep.py scd2_history): the events
    log collapsed to versioned (user, state) intervals — one row per
    event_type CHANGE, valid_to = next change's ts (null while current).
    One window shuffle; event_id tiebreak pins equal-ts ordering on both
    sides."""
    from wbkg.ops.prep import scd2_history

    return scd2_history(
        _read(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        state_col="event_type",
        tiebreak_col="event_id",
    )


def q_graph_degree_stats(spark, sf_dir):
    """Per-node in/out/total degree over the customer->nation->region
    membership digraph; one partial-aggregated shuffle per direction plus
    a full outer merge."""
    from wbkg.graph_analytics import degree_stats

    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("dst"),
    ).unionByName(
        n.select(
            F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("dst"),
        )
    )
    return degree_stats(edges)


def q_sparql_nested_groups(spark, sf_dir):
    """Nested group graph patterns (r05: groups recurse arbitrarily — the
    old 'nested groups not supported' boundary is gone): an outer pattern
    joined with a bare subgroup whose body is a UNION. Compiles to the
    union of the two branch joins; oracle is the equivalent UNION ALL."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    nsub = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    edges = (
        c.select(
            F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
            F.lit("urn:p:in_nation").alias("pred"),
            F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
        )
        .unionByName(n.select(nsub.alias("subj"), F.lit("urn:p:name").alias("pred"),
                              F.col("n_name").alias("obj")))
        .unionByName(n.select(nsub.alias("subj"), F.lit("urn:p:region").alias("pred"),
                              F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj")))
    )
    return sparql_select(
        edges,
        """
        SELECT ?c ?x WHERE { ?c <urn:p:in_nation> ?n .
          { { ?n <urn:p:name> ?x . } UNION { ?n <urn:p:region> ?x . } } }
        """,
    )


def q_sparql_subquery(spark, sf_dir):
    """SPARQL 1.1 §12 subquery: per-nation customer counts computed in a
    { SELECT ... GROUP BY } block and joined back onto each membership row.
    Compiles to the aggregate subplan + one equi-join on the projected
    variable; oracle is the equivalent SQL derived-table join."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_nation").alias("pred"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?c ?n ?cnt WHERE { ?c <urn:p:in_nation> ?n .
          { SELECT ?n (COUNT(?c2) AS ?cnt)
            WHERE { ?c2 <urn:p:in_nation> ?n . } GROUP BY ?n } }
        """,
    )


def q_sparql_having_groupconcat(spark, sf_dir):
    """GROUP_CONCAT (sorted for determinism; SPARQL leaves order
    implementation-defined), SAMPLE (pinned to MIN) and HAVING (hidden
    aggregate column + post-agg filter, one exchange) in one grouped
    query over the nation->region membership edges."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:region").alias("pred"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
    )
    return sparql_select(
        edges,
        """
        SELECT ?r (GROUP_CONCAT(?n; SEPARATOR=",") AS ?nations)
               (COUNT(?n) AS ?c) (SAMPLE(?n) AS ?first)
        WHERE { ?n <urn:p:region> ?r . }
        GROUP BY ?r HAVING(COUNT(?n) > 1)
        """,
    )


def q_url_normalize(spark, sf_dir):
    """URL canonicalization + URL-level dedup (wbkg/ops/prep.py
    normalize_urls / url_canonical_docs): scheme/host case-fold, www and
    default-port strip, fragment drop, tracking-param removal, param sort,
    trailing-slash strip — then smallest doc_id per canonical URL wins.
    URLs are built deterministically from doc_id (4 raw variants, two of
    which normalize to the SAME canonical), so the oracle states the
    expected canonical form per variant in closed form — it does not
    reimplement the parser."""
    from wbkg.ops.prep import url_canonical_docs

    k = F.floor(F.col("doc_id") / 8).cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(
            F.lit("HTTP://WWW.Example.COM:80/a/b/?x=2&utm_source=tw&a=1&id="), k, F.lit("#frag")))
        .when(v == 1, F.concat(F.lit("https://example.com/a/b?id="), k, F.lit("&a=1&x=2")))
        .when(v == 2, F.concat(F.lit("http://example.com/a/b?a=1&x=2&id="), k, F.lit("&fbclid=abc")))
        .otherwise(F.concat(F.lit("https://sub.example.org:8443/p/?gclid=zz&id="), k))
    )
    docs = _read(spark, sf_dir, "documents").select("doc_id").withColumn("url", url)
    return url_canonical_docs(docs).select("doc_id", "url", "norm_url", "is_canonical")


def q_sparql_offset(spark, sf_dir):
    """LIMIT/OFFSET solution-sequence slicing (SPARQL 1.1 §15.4/15.5):
    deterministic under the unique-name ORDER BY; Spark collapses
    offset+limit into one GlobalLimit."""
    from wbkg.sparql import sparql_select

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:name").alias("pred"),
        F.col("n_name").alias("obj"),
    )
    return sparql_select(
        edges,
        "SELECT ?nm WHERE { ?n <urn:p:name> ?nm . } ORDER BY ?nm LIMIT 10 OFFSET 5",
    )


def q_sparql_path_neg(spark, sf_dir):
    """Negated property set !<iri> (SPARQL 1.1 §9.1 NegatedPropertySet):
    compiles to a NOT-IN predicate scan — over the two-predicate
    membership graph it keeps exactly the supplier edges."""
    from wbkg.sparql import sparql_select

    c = _read(spark, sf_dir, "customer")
    s = _read(spark, sf_dir, "supplier")
    edges = c.select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("urn:p:cust_nation").alias("pred"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("obj"),
    ).unionByName(
        s.select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias("subj"),
            F.lit("urn:p:supp_nation").alias("pred"),
            F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("obj"),
        )
    )
    return sparql_select(
        edges, "SELECT ?x ?n WHERE { ?x !<urn:p:cust_nation> ?n . }"
    )


def q_sparql_describe(spark, sf_dir):
    """DESCRIBE verb (concise bounded description): constants become an
    isin subject filter, variables a left-semi join against the WHERE
    bindings — here every nation in region 0, via the variable form."""
    from wbkg.sparql import sparql_describe

    n = _read(spark, sf_dir, "nation")
    subj = F.concat(F.lit("n:"), F.col("n_nationkey").cast("string"))
    edges = n.select(
        subj.alias("subj"), F.lit("urn:p:name").alias("pred"), F.col("n_name").alias("obj")
    ).unionByName(
        n.select(
            subj.alias("subj"),
            F.lit("urn:p:region").alias("pred"),
            F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
        )
    )
    return sparql_describe(
        edges, 'DESCRIBE ?n WHERE { ?n <urn:p:region> "r:0" . }'
    )


def q_k1_ttl_roundtrip(spark, sf_dir):
    """K1 round-trip — serialize edges to Turtle lines and parse them back
    (ref src/graph.py:782-811 load_or_build). Literals are spiked with quotes
    and backslashes so the escape/unescape path is exercised; the oracle
    reconstructs the expected edges directly from nation."""
    from wbkg.materialize import to_turtle_lines
    from wbkg.ttl import from_turtle_lines

    n = _read(spark, sf_dir, "nation")
    subj = F.concat(F.lit("http://ex.org/nation/"), F.col("n_nationkey").cast("string"))
    name_lit = F.concat(F.lit('say "'), F.col("n_name"), F.lit('" \\ done'))
    lit1 = n.select(
        subj.alias("subj"),
        F.lit("http://schema.org/name").alias("pred"),
        name_lit.alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )
    lit2 = n.select(
        subj.alias("subj"),
        F.lit("http://schema.org/label").alias("pred"),
        F.lower("n_name").alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.lit("en").alias("lang"),
    )
    uri1 = n.select(
        subj.alias("subj"),
        F.lit("http://schema.org/isPartOf").alias("pred"),
        F.concat(F.lit("http://ex.org/region/"), F.col("n_regionkey").cast("string")).alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )
    typ = n.select(
        subj.alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("http://schema.org/Country").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )
    edges = lit1.unionByName(lit2).unionByName(uri1).unionByName(typ)
    return from_turtle_lines(to_turtle_lines(edges))


def q_answer_synthesis(spark, sf_dir):
    """Deterministic chat-path surrogate (VERDICT r02 missing #2): retrieval
    + extractive compact-response composition with citations (ref
    src/query.py:31-36,66-72 — the LLM itself is the documented
    non-reproducible boundary). Sentence-structured docs are built from
    nation on BOTH sides; region-2 nations carry the extra query terms, so
    chunk ranking, sentence ranking and tie-breaks are all exercised."""
    from wbkg.query import synthesize_answer

    n = _read(spark, sf_dir, "nation")
    body = F.concat(
        F.lit("The "),
        F.col("n_name"),
        F.lit(" project builds wind turbines. "),
        F.when(
            F.col("n_regionkey") == 2,
            F.lit("Environmental impact assessment of the wind farm is complete. "),
        ).otherwise(F.lit("The committee report is pending review. ")),
        F.lit("Total emissions fall as the "),
        F.lower("n_name"),
        F.lit(" turbines spin."),
    )
    docs = n.select(F.col("n_nationkey").alias("chunk_id"), body.alias("text"))
    return synthesize_answer(
        docs, "wind turbines environmental impact emissions", k_chunks=3, n_sentences=4
    )


def q_k1_ttl_pretty_roundtrip(spark, sf_dir):
    """K1 full-grammar round-trip — serialize edges as REAL Turtle
    (@prefix header, `a`, `;`/`,` subject grouping, prefixed predicates)
    and re-ingest through the Turtle 1.1 grammar parser (per-file
    mapInPandas). Covers the reference's actual resume format (rdflib
    serializer, ref src/graph.py:771-779 + :67). Literals are spiked with
    quotes, backslashes AND newlines/tabs so the full escape chain is
    exercised; the oracle reconstructs the expected edges from nation."""
    from wbkg.ttl import load_turtle_full, save_turtle_pretty

    n = _read(spark, sf_dir, "nation")
    subj = F.concat(F.lit("http://ex.org/nation/"), F.col("n_nationkey").cast("string"))
    name_lit = F.concat(F.lit('say "'), F.col("n_name"), F.lit('" \\ multi\nline\ttab'))
    lit1 = n.select(
        subj.alias("subj"),
        F.lit("http://schema.org/name").alias("pred"),
        name_lit.alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )
    lit2 = n.select(
        subj.alias("subj"),
        F.lit("http://schema.org/alternateName").alias("pred"),
        F.lower("n_name").alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.lit("en").alias("lang"),
    )
    uri1 = n.select(
        subj.alias("subj"),
        F.lit("http://schema.org/isPartOf").alias("pred"),
        F.concat(F.lit("http://ex.org/region/"), F.col("n_regionkey").cast("string")).alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )
    typ = n.select(
        subj.alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("http://schema.org/Country").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )
    edges = lit1.unionByName(lit2).unionByName(uri1).unionByName(typ)
    path = "/tmp/wbkg_q_pretty_ttl"
    save_turtle_pretty(edges, path)
    return load_turtle_full(spark, path)


def q_p1_sanitize(spark, sf_dir):
    """P1 — identifier sanitize chain (ref src/graph.py:141-149)."""
    c = _read(spark, sf_dir, "customer")
    s = F.regexp_replace(F.col("c_name"), r"\s+", "_")
    s = F.regexp_replace(s, "-", "_")
    s = F.regexp_replace(s, "^_+|_+$", "")
    return c.select("c_custkey", s.alias("name_sanitized"))


def q_p2_p3_filter_chain(spark, sf_dir):
    """P2/P3 — predicate filter chain (ref src/utils.py:4-42): keep docs whose
    text is 2..200 chars, has >=2 alnum, at least one letter, no HTML tag."""
    d = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return d.filter(
        (F.length(t) >= 2)
        & (F.length(t) <= 200)
        & (F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", "")) >= 2)
        & t.rlike("[A-Za-z]")
        & ~t.rlike("</?\\w+>")
    ).select("doc_id", "n_chars")


def q_w2_topk_similarity(spark, sf_dir):
    """W2 — vector top-k retrieval (ref src/acronyms.py:34-40): exact cosine
    vs a fixed query vector, deterministic tie-break."""
    from wbkg.ops.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, QUERY_VEC, k=10)


def q_w2_topk_filtered(spark, sf_dir):
    """W2 with the reference's doc-filter-BEFORE-topk (ExactMatchFilter,
    src/acronyms.py:36-38): restrict to one label partition first."""
    from wbkg.ops.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings").filter(F.col("label") == 0)
    return brute_force_topk(emb, QUERY_VEC, k=5)


def q_g4_connected_components(spark, sf_dir):
    """G4 — iterative connected components on a nation-chain graph: nations
    within a region chained by key order; components must equal regions
    (needs multiple label-propagation rounds to converge)."""
    from wbkg.canonicalize import connected_components

    n = _read(spark, sf_dir, "nation")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    key = lambda c: F.concat(F.lit("n"), F.lpad(F.col(c).cast("string"), 5, "0"))
    chain = (
        n.withColumn("nxt", F.lead("n_nationkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(key("n_nationkey").alias("src"), key("nxt").alias("dst"))
    )
    return connected_components(chain).select("member", "component")


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 hash-groupBy, min-id representative."""
    from wbkg.ops.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs via shingle inverted-index join."""
    from wbkg.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"), threshold=0.35)


def q_dedup_ngram_prefiltered(spark, sf_dir):
    """MinHash-prefiltered exact n-gram jaccard: LSH candidates (64 sigs, 32
    bands), then the EXACT df-capped jaccard per candidate pair. Runs over
    the planted corpus (verbatim copies guarantee jaccard-1.0 pairs that
    collide in every band); the oracle is the full exact-jaccard SQL at the
    same threshold over the same corpus — so the value hash asserts the
    prefilter LOSES NOTHING at this threshold, not merely that planted pairs
    come back."""
    from wbkg.ops.dedup import ngram_jaccard_pairs_prefiltered

    return ngram_jaccard_pairs_prefiltered(_planted_docs(spark, sf_dir), threshold=0.8)


def q_decontam_report(spark, sf_dir):
    """Benchmark decontamination: 8-gram containment of a small eval set in
    the corpus. The eval set is derived deterministically in-query (words
    4..15 of every 25th document — planted contamination with overlap 1.0
    for the source doc), so the oracle replays the whole report in SQL:
    per-doc arg-max item, containment fraction, contaminated flag."""
    from wbkg.ops.decontam import contamination_report

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.trim(F.col("text")), r"\s+")
    bench = (
        docs.filter((F.col("doc_id") % 25 == 0) & (F.size(words) >= 15))
        .select(F.col("doc_id").alias("bench_id"), F.concat_ws(" ", F.slice(words, 4, 12)).alias("text"))
    )
    return contamination_report(docs, bench, n=8, threshold=0.5)


def q_decontam_bloom(spark, sf_dir):
    """Bloom-prefiltered decontamination (wbkg/ops/decontam.py
    contamination_report_bloom): same report, but corpus shingles first
    pass a 4M-bit / 4-hash bitmap built from the benchmark shingles —
    what replaces the multi-GB broadcast dictionary at 100 TB. False
    positives die in the exact join, false negatives are impossible, so
    the oracle is the SAME SQL as decontam_report."""
    from wbkg.ops.decontam import contamination_report_bloom

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.trim(F.col("text")), r"\s+")
    bench = (
        docs.filter((F.col("doc_id") % 25 == 0) & (F.size(words) >= 15))
        .select(F.col("doc_id").alias("bench_id"), F.concat_ws(" ", F.slice(words, 4, 12)).alias("text"))
    )
    return contamination_report_bloom(docs, bench, n=8, threshold=0.5)


def q_repeated_passages(spark, sf_dir):
    """Passage-level dedup primitive: 24-word windows (stride 12) recurring
    in >= 2 distinct documents of the planted corpus (verbatim copies
    guarantee every window of a copied doc recurs). Oracle replays windows,
    md5 passage hashes, distinct-doc counts and the occurrence join."""
    from wbkg.ops.dedup import repeated_passages

    return repeated_passages(_planted_docs(spark, sf_dir), w=24, stride=12, min_docs=2)


def q_dedup_keep_list(spark, sf_dir):
    """Dedup end-to-end: near-dup pairs -> TRANSITIVE clusters (connected
    components over the pair graph) -> keep/drop list with the min-id
    representative per cluster. The oracle replays the full ngram pair set
    in SQL and closes it with WITH RECURSIVE — so cluster transitivity, the
    representative rule and the keep flags are all value-hash-checked."""
    from wbkg.ops.dedup import near_dup_keep_list, ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.35)
    return near_dup_keep_list(docs, pairs)


def _planted_docs(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup detection, self-validating: verbatim copies are
    planted under doc_id + PLANT_OFFSET; every (orig, copy) pair MUST come
    back with sig_jaccard = 1.0 (identical text -> identical signatures ->
    identical band buckets). The oracle states the planted pairs directly —
    a broken signature, banding or join produces found=false rows and fails
    the value hash."""
    from wbkg.ops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_planted_docs(spark, sf_dir), threshold=0.35)
    expected = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("orig_id"), (F.col("doc_id") + PLANT_OFFSET).alias("copy_id"))
    )
    j = expected.join(
        pairs,
        (expected.orig_id == pairs.doc_a) & (expected.copy_id == pairs.doc_b),
        "left",
    )
    sj = F.coalesce("sig_jaccard", F.lit(-1.0))
    return j.select("orig_id", "copy_id", sj.alias("sig_jaccard"), (sj == 1.0).alias("found"))


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup detection, self-validating via the same planted-copy
    scheme: identical text -> identical simhash -> hamming 0 through at least
    one identical 16-bit band."""
    from wbkg.ops.dedup import simhash_near_dup_pairs

    pairs = simhash_near_dup_pairs(_planted_docs(spark, sf_dir), max_hamming=8)
    expected = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("orig_id"), (F.col("doc_id") + PLANT_OFFSET).alias("copy_id"))
    )
    j = expected.join(
        pairs,
        (expected.orig_id == pairs.doc_a) & (expected.copy_id == pairs.doc_b),
        "left",
    )
    ham = F.coalesce("hamming", F.lit(-1))
    return j.select("orig_id", "copy_id", ham.alias("hamming"), (ham == 0).alias("found"))


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs via BANDED multi-table hyperplane LSH
    (6 bands x 8 planes, per-bucket size cap) + exact verify. Identical-vector
    copies are planted (they collide in every band, any seed), and the full
    banded scheme — per-band buckets, cap, cross-band dedup — is restated in
    the DuckDB oracle with the literal hyperplanes: full value-hash check."""
    from wbkg.ops.dedup import embedding_near_dup_pairs

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + EMB_PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    return embedding_near_dup_pairs(
        emb.unionByName(copies),
        threshold=0.95,
        n_bands=_DEDUP_N_BANDS,
        band_planes=_DEDUP_BAND_PLANES,
        max_bucket_size=1000,
    )


def q_ann_lsh_topk(spark, sf_dir):
    """ANN: LSH-bucketed top-k. The probed bucket set is a compile-time
    constant (fixed planes + query vector), so the DuckDB oracle replays the
    exact same bucket filter + exact re-score — full value-hash check."""
    from wbkg.ops.similarity import add_lsh_bucket, lsh_topk

    emb = add_lsh_bucket(_read(spark, sf_dir, "embeddings"))
    return lsh_topk(emb, QUERY_VEC, k=10, probe_bits=2)


def q_text_quality(spark, sf_dir):
    """Quality scoring: token count, punct ratio, stopword ratio."""
    from wbkg.ops.textops import quality_score

    d = quality_score(_read(spark, sf_dir, "documents"))
    return d.select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", "quality_ok")


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword-hit argmax)."""
    from wbkg.ops.textops import lang_id

    return lang_id(_read(spark, sf_dir, "documents")).select("doc_id", "lang_pred")


def q_token_count(spark, sf_dir):
    """Token counting: whitespace, punctuation-aware subword proxy, and the
    GPT-2 pre-tokenizer piece count (the tight SQL-replayable proxy for a
    real BPE count — merges only split within pieces)."""
    from wbkg.ops.textops import gpt2_piece_count, subword_count, token_count

    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_count(F.col("text")).alias("n_subwords"),
        gpt2_piece_count(F.col("text")).alias("n_gpt2_pieces"),
    )


def q_bpe_token_count(spark, sf_dir):
    """Real BPE token count (closes the tiktoken deviation — the merge table
    is trained deterministically at import, ref src/utils.py:45-47): GPT-2
    pre-tokenizer pieces JVM-side, ranked-merge loop in an Arrow-batched
    pandas UDF with a per-batch piece memo. The oracle replays the SAME 80
    merges with a recursive CTE (fixpoint replace per rank over
    chr(31)-separated symbol sequences) — full value verification of an
    iterative subword algorithm."""
    from wbkg.ops.textops import bpe_token_count

    d = _read(spark, sf_dir, "documents")
    return bpe_token_count(d).select("doc_id", "n_bpe_tokens")


def _bpe_oracle_sql() -> str:
    from wbkg.ops.textops import BPE_MERGES

    values = ",".join(
        "('{}','{}',{})".format(l.replace("'", "''"), r.replace("'", "''"), i)
        for i, (l, r) in enumerate(BPE_MERGES, 1)
    )
    n = len(BPE_MERGES)
    return rf"""
        WITH RECURSIVE
        merges(lft, rgt, rnk) AS (VALUES {values}),
        doc_pieces AS (
          SELECT doc_id, unnest(regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)| ?\p{{L}}+| ?\p{{N}}+| ?[^\s\p{{L}}\p{{N}}]+'
          )) AS piece
          FROM documents
        ),
        dp AS (SELECT DISTINCT piece FROM doc_pieces),
        bpe(piece, rnk, seq) AS (
          SELECT piece, 1,
                 chr(31) || array_to_string(string_split(piece, ''), chr(31)) || chr(31)
          FROM dp
          UNION ALL
          SELECT piece,
                 CASE WHEN nseq <> seq THEN rnk ELSE rnk + 1 END,
                 CASE WHEN nseq <> seq THEN nseq ELSE seq END
          FROM (
            SELECT b.piece, b.rnk, b.seq,
                   replace(b.seq, chr(31)||m.lft||chr(31)||m.rgt||chr(31),
                                  chr(31)||m.lft||m.rgt||chr(31)) AS nseq
            FROM bpe b JOIN merges m ON m.rnk = b.rnk
          ) WHERE rnk < {n} OR nseq <> seq
        ),
        counts AS (
          SELECT piece, min(len(seq)) - len(piece) - 1 AS n_toks
          FROM bpe GROUP BY piece
        ),
        per_doc AS (
          SELECT dp2.doc_id, sum(c.n_toks) AS s
          FROM doc_pieces dp2 JOIN counts c USING (piece) GROUP BY dp2.doc_id
        )
        SELECT d.doc_id, coalesce(p.s, 0)::BIGINT AS n_bpe_tokens
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


def q_doc_fingerprint(spark, sf_dir):
    """Rolling polynomial fingerprint, self-validating: planted verbatim
    copies must fingerprint identically, and the fingerprint must be
    injective over the corpus's distinct texts (n_distinct_fp == number of
    distinct texts, which the oracle computes independently)."""
    from wbkg.ops.textops import fingerprint

    fp = fingerprint(_planted_docs(spark, sf_dir)).select("doc_id", "fingerprint")
    orig = fp.filter((F.col("doc_id") < PLANT_OFFSET) & (F.col("doc_id") % 10 == 0)).select(
        F.col("doc_id").alias("orig_id"), F.col("fingerprint").alias("fp_o")
    )
    copy = fp.filter(F.col("doc_id") >= PLANT_OFFSET).select(
        (F.col("doc_id") - PLANT_OFFSET).alias("orig_id"), F.col("fingerprint").alias("fp_c")
    )
    ndist = (
        fp.filter(F.col("doc_id") < PLANT_OFFSET)
        .agg(F.countDistinct("fingerprint").alias("n_distinct_fp"))
    )
    return (
        orig.join(copy, "orig_id")
        .select(
            "orig_id",
            (F.col("orig_id") + PLANT_OFFSET).alias("copy_id"),
            (F.col("fp_o") == F.col("fp_c")).alias("fp_match"),
        )
        .crossJoin(F.broadcast(ndist))
    )


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payload -> feature vector via mapInPandas
    (decode stubbed). The synthetic media table is formula-generated, so the
    oracle reproduces (ids, kinds, dims) via generate_series and asserts the
    feature vectors are L2-normalized."""
    from wbkg.ops.multimodal import extract_features, gen_media_df

    media = gen_media_df(spark, docs=30)
    feats = extract_features(media)
    sq_norm = F.aggregate(
        "feature", F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return feats.select(
        "media_id",
        "doc_id",
        "kind",
        F.size("feature").alias("dim"),
        (F.abs(F.sqrt(sq_norm) - 1.0) < 1e-3).alias("unit_norm"),
    )


def q_media_png_decode(spark, sf_dir):
    """REAL PNG decode (pure-stdlib inflate + scanline-filter reconstruction,
    wbkg/ops/multimodal.py decode_png): dims come from the decoded IHDR and
    channel means from the decoded pixels. The synthetic pixels are closed-
    form (r=(x+y+base)%256, g=(2x+base)%256, b=(3y+base)%256, base=(2d+m)%251),
    so the oracle replays the exact means over a generated (x, y) grid —
    any filter-reconstruction bug shifts the means and fails the hash."""
    from wbkg.ops.multimodal import gen_media_df, png_decode_stats

    return png_decode_stats(gen_media_df(spark, docs=30))


def q_media_wav_decode(spark, sf_dir):
    """REAL WAV decode (pure-stdlib RIFF/PCM16 parser, wbkg/ops/multimodal.py
    decode_wav): sample count/rate/duration from the payload's own header,
    mean|s| and zero-crossing count from the decoded samples. Synthetic
    samples are closed-form (s[i]=((i*(3+d)+17d+1)%4096)-2048), so the
    oracle replays every statistic over a generated sample index."""
    from wbkg.ops.multimodal import gen_media_df, wav_decode_stats

    return wav_decode_stats(gen_media_df(spark, docs=30))


def q_fuzzy_match_edit1(spark, sf_dir):
    """Edit-distance-1 fuzzy matching (FastSS deletion-neighborhood
    blocking + levenshtein verify, wbkg/ops/dedup.py fuzzy_pairs_edit1):
    nation names vs deterministic 1-char-deleted corruptions plus part
    types as distractors. The oracle is the brute-force levenshtein cross
    join (tiny sides at oracle scale) — hash equality proves the blocking
    loses no pair."""
    from wbkg.ops.dedup import fuzzy_pairs_edit1

    n = _read(spark, sf_dir, "nation")
    p = _read(spark, sf_dir, "part")
    names = n.select(F.col("n_name").alias("surface"))
    corrupted = n.select(
        F.concat(
            F.expr("substr(n_name, 1, (n_nationkey % length(n_name)))"),
            F.expr("substr(n_name, (n_nationkey % length(n_name)) + 2)"),
        ).alias("surface")
    )
    noisy = corrupted.unionByName(
        p.filter(F.col("p_partkey") <= 50).select(F.col("p_type").alias("surface"))
    )
    return fuzzy_pairs_edit1(names, noisy).select(
        F.col("a").alias("dict_surface"), F.col("b").alias("noisy_surface")
    )


def q_inverted_index(spark, sf_dir):
    """Positional inverted index (wbkg/ops/textops.py inverted_index) at
    the flat (term, doc) grain with a max_df stop-word cap; positions are
    renumbered over non-empty tokens and comma-joined, so the oracle
    replays rows byte-exactly."""
    from wbkg.ops.textops import inverted_index

    return inverted_index(_read(spark, sf_dir, "documents"), max_df=400)


def q_phrase_search(spark, sf_dir):
    """Exact phrase search via posting-list slot votes (wbkg/ops/textops.py
    phrase_search): occurrences of the phrase's terms vote for start
    q = pos - slot; q is a hit iff all slots voted. Oracle replays the
    adjacency with a positional self-join over the tokenized corpus."""
    from wbkg.ops.textops import phrase_search

    return phrase_search(_read(spark, sf_dir, "documents"), "fast table")


def q_asof_join_events(spark, sf_dir):
    """Point-in-time lookup (wbkg/ops/joins.py asof_join): each click
    event picks up the user's most recent purchase at-or-before it
    (backward inclusive, kdb aj semantics). Union-sort-window plan — ONE
    shuffle, no join operator; the oracle is DuckDB's native ASOF LEFT
    JOIN, the one-line spec statement. event_id tiebreak makes equal-ts
    right rows deterministic on both sides (none exist in this data, so
    the tiebreak never changes the answer — it pins it)."""
    from wbkg.ops.joins import asof_join

    ev = _read(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        left, right, on="user_id", right_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_r").alias("prior_purchase_id"),
        F.col("value_r").alias("prior_value"),
    )


def q_interval_overlap(spark, sf_dir):
    """Interval overlap join (wbkg/ops/joins.py interval_overlap_join):
    click and error events widen to 30-minute windows per user; pairs
    whose windows intersect. Spark side bins intervals to 1800s buckets
    and equi-joins on (user, bin) — candidates are bin co-occupancy, not
    a per-user cross product; the oracle is the plain inequality join
    (the spec), fine at sf0.01."""
    from wbkg.ops.joins import interval_overlap_join

    ev = _read(spark, sf_dir, "events")
    mk = lambda t, idc: ev.filter(F.col("event_type") == t).select(
        "user_id",
        F.col("event_id").alias(idc),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("e"),
    )
    return interval_overlap_join(
        mk("click", "click_id"),
        mk("error", "error_id"),
        on="user_id",
        l_id="click_id",
        r_id="error_id",
        l_start="s",
        l_end="e",
        r_start="s",
        r_end="e",
        bin_seconds=1800,
    )


def q_bm25_rank(spark, sf_dir):
    """Okapi BM25 retrieval (wbkg/ops/textops.py bm25_rank) for the query
    'hash join stream'. The tf shuffle carries only the queried terms'
    postings; N/avgdl fold in as one-row broadcasts. Scores round to 8
    decimals (the tfidf ulp convention); float literals in the oracle
    reproduce the engine's exact IEEE steps ((1.2::DOUBLE + 1), never a
    pre-folded 2.2, which is a different double)."""
    from wbkg.ops.textops import bm25_rank

    return bm25_rank(_read(spark, sf_dir, "documents"), "hash join stream")


def q_bigram_lm(spark, sf_dir):
    """Add-one-smoothed corpus bigram LM fluency score (wbkg/ops/textops.py
    bigram_lm_score) — the KenLM-style perplexity filter. Bigrams are
    map-side arrays_zip (no adjacency self-join); counts are integer-exact
    on both engines, so only ln and the per-doc mean are floating
    (round 8)."""
    from wbkg.ops.textops import bigram_lm_score

    return bigram_lm_score(_read(spark, sf_dir, "documents"))


def q_tfidf_topk(spark, sf_dir):
    """Top-5 TF-IDF terms per document (wbkg/ops/textops.py tfidf_topk).
    Scores round to 8 decimals on both sides (Java Math.log and DuckDB ln
    differ by 1 ulp on ~8% of this domain — measured — which round-8
    absorbs); rank order is stable because mathematically distinct scores
    are far beyond 1 ulp apart and true ties (equal tf and df_t) break on
    term asc in both engines."""
    from wbkg.ops.textops import tfidf_topk

    return tfidf_topk(_read(spark, sf_dir, "documents"), k=5)


def q_token_freq_score(spark, sf_dir):
    """Corpus-frequency fluency scoring (CCNet-style LM-filter surrogate,
    wbkg/ops/textops.py token_frequency_score): mean corpus frequency of a
    document's tokens, integer-exact (sum of BIGINT counts / BIGINT token
    count) so the oracle replays it bit-for-bit."""
    from wbkg.ops.textops import token_frequency_score

    return token_frequency_score(_read(spark, sf_dir, "documents"))


def q_media_resize_real(spark, sf_dir):
    """REAL image resize (decode_png -> nearest-neighbor downsample to
    max_side=32, wbkg/ops/multimodal.py resize_image): the 64x48 synthetic
    PNGs map to 32x24 with source index 2x'/2y' (floor map), so the oracle
    replays channel means over exactly the sampled grid — any off-by-one in
    the index map shifts the means and fails the hash."""
    from wbkg.ops.multimodal import gen_media_df, resize_png_stats

    return resize_png_stats(gen_media_df(spark, docs=30), max_side=32)


def q_media_resample_audio(spark, sf_dir):
    """REAL audio downsample (decode_wav -> decimate by 2): with the
    closed-form samples s[i]=((i*(3+d)+17d+1)%4096)-2048 the oracle
    replays mean|s| over exactly the kept indices 0,2,4,..."""
    from wbkg.ops.multimodal import gen_media_df, wav_resample_stats

    return wav_resample_stats(gen_media_df(spark, docs=30), factor=2)


def q_media_video_decode(spark, sf_dir):
    """REAL MP4 frame decode (pure-stdlib ISO BMFF sample-table walk,
    wbkg/ops/multimodal.py decode_mp4_frames): dims from the stsd 'raw '
    entry, frames sliced out of mdat via stsz/stco. Synthetic frames are
    closed-form (r=(x+2f+base)%256, g=(y+3f+base)%256, b=(x+y+f+base)%256,
    base=(2d+m)%251, m=2), so the oracle replays every per-frame channel
    mean over a generated (f, x, y) grid — any sample-table or slicing bug
    shifts the means and fails the hash."""
    from wbkg.ops.multimodal import gen_media_df, video_decode_stats

    return video_decode_stats(gen_media_df(spark, docs=30, per_doc=3))


def q_kmeans_assign(spark, sf_dir):
    """Nearest-centroid assignment (wbkg/ops/similarity.py kmeans_assign)
    with deterministic centroids = the 4 lowest-vec_id embeddings — a pure
    map-side argmin projection, zero shuffle. Distances are sequential
    IEEE-double folds, so DuckDB's list_distance replays them bit-for-bit;
    ties break to the lowest cluster index on both sides."""
    from wbkg.ops.similarity import kmeans_assign

    emb = _read(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    return kmeans_assign(emb, cents)


def q_quantize_embeddings(spark, sf_dir):
    """Per-vector symmetric int8 quantization (the 4x ANN-storage cut):
    scale, per-element codes, and max reconstruction error, computed as
    pure Catalyst array expressions. Codes explode to scalar rows (the
    driver's value hash covers every element; array columns don't hash)."""
    from wbkg.ops.similarity import quantize_embeddings

    q = quantize_embeddings(_read(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", "scale", "recon_err", F.posexplode("codes").alias("dim", "code")
    )


def q_cap_per_source(spark, sf_dir):
    """Per-domain frequency cap (C4/Gopher-style): at most K docs per
    source, selected by a deterministic md5 rank so the kept set is an
    unbiased sample independent of ingestion order. Oracle replays the
    identical window."""
    from wbkg.ops.prep import cap_per_source

    return cap_per_source(_read(spark, sf_dir, "documents"), max_per_key=40).select(
        "doc_id", "source", "kept_rank"
    )


def q_media_mp4_meta(spark, sf_dir):
    """REAL MP4 container parsing (ISO BMFF box walk, wbkg/ops/multimodal.py
    parse_mp4_meta): brand/timescale/duration from the payload's own
    ftyp/moov/mvhd boxes. Frame decode stays the documented stub — this is
    the metadata layer a routing/sampling pipeline reads without decoding."""
    from wbkg.ops.multimodal import gen_media_df, mp4_meta_stats

    return mp4_meta_stats(gen_media_df(spark, docs=30, per_doc=3))


def q_media_frame_sample(spark, sf_dir):
    """Multimodal frame sampling (sequence explode on metadata); the sampled
    frame grid is formula-determined, so the oracle replays it with
    generate_series."""
    from wbkg.ops.multimodal import frame_sample, gen_media_df

    return frame_sample(gen_media_df(spark, docs=30))


def q_gopher_quality(spark, sf_dir):
    """Gopher-rule quality signals (Rae et al. 2021 A1.1) — word stats,
    symbol/bullet/ellipsis ratios, stopword hits, 3-gram repetition."""
    from wbkg.ops.textops import gopher_quality

    return gopher_quality(_read(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "bullet_frac",
        "ellipsis_frac",
        "stop_hits",
        "dup_3gram_frac",
        "gopher_ok",
    )


def q_pack_sequences(spark, sf_dir):
    """Training-pack assignment: per-language shards, 512-token packs
    (streaming boundary rule — see wbkg/ops/prep.py)."""
    from wbkg.ops.prep import pack_sequences

    return pack_sequences(
        _read(spark, sf_dir, "documents"), max_tokens=512, shard_col="lang"
    )


def q_split_assign(spark, sf_dir):
    """md5-stable train/val/test split (90/5/5): row order, partitioning and
    re-runs can never move a document across splits."""
    from wbkg.ops.prep import split_assign

    d = split_assign(_read(spark, sf_dir, "documents"))
    return d.select("doc_id", "split_bucket", "split")


def q_sample_mixture(spark, sf_dir):
    """Deterministic domain-mixture downsampling to a 50/25/25 en/de/fr
    target (es and zh dropped): md5-stable accepts against integer
    thresholds, so the oracle replays the whole decision — per-domain rate
    computation, scale binding, and every individual accept — exactly."""
    from wbkg.ops.prep import sample_mixture

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sample_mixture(d, {"en": 0.5, "de": 0.25, "fr": 0.25}, domain_col="lang")
    return out.select("doc_id", "lang", F.round("_mix_rate", 6).alias("mix_rate"))


def q_percentile_filter(spark, sf_dir):
    """Keep the top 30% of documents per language by size — the exact
    percent_rank path (the approx_percentile broadcast-threshold variant is
    the 100 TB path, unit-tested for agreement). Boundary ties keep or drop
    together, so the result is order- and partitioning-free."""
    from wbkg.ops.textops import percentile_filter

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = percentile_filter(d, "n_chars", group_col="lang", keep_frac=0.3)
    return out.select(
        "doc_id", "lang", "n_chars", F.round("score_rank", 6).alias("score_rank")
    )


def q_scrub_pii(spark, sf_dir):
    """PII scrub over text spiked with a deterministic email+URL per doc
    (so the redaction path is actually exercised)."""
    from wbkg.ops.prep import scrub_pii

    d = _read(spark, sf_dir, "documents")
    spiked = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org or https://ex.org/d/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return scrub_pii(spiked).select("doc_id", "clean_text", "n_redactions")


KG_N_DOCS = 30


def q_kg_pipeline_edges(spark, sf_dir):
    """The full KG pipeline on the deterministic synthetic corpus, verified
    in-query against the independent pure-Python oracle (wbkg/oracle.py):
    returns one row of (n_spark, n_oracle, n_matched) whose values the DuckDB
    oracle states as constants — any extraction/link/canonicalize drift
    changes the counts and fails the value hash."""
    from wbkg.extract import build_pattern_rows
    from wbkg.oracle import oracle_pipeline
    from wbkg.pipeline import run_pipeline
    from wbkg.synth import (
        build_entity_dict_rows,
        build_unbis_rows,
        entity_dict_df,
        gen_documents_df,
        gen_metadata_df,
    )

    n_docs = KG_N_DOCS
    docs = gen_documents_df(spark, n_docs)
    edict = entity_dict_df(spark, n_docs)
    meta = gen_metadata_df(spark, n_docs)
    pats = build_pattern_rows(build_entity_dict_rows(n_docs), build_unbis_rows())
    edges = run_pipeline(spark, docs, edict, pats, metadata_df=meta, cache=False)["edges"]

    return _edges_vs_oracle(spark, edges, n_docs)


def q_kg_pipeline_heur_edges(spark, sf_dir):
    """Full pipeline with the C5 heuristic-NER pass ENABLED (capitalized
    n-gram candidates merged ruler-first, wbkg/extract.py
    heuristic_ner_candidates_py), hard-gated against the pure-Python oracle
    running the same pass — proves the Spark word-trie matcher, the
    ruler-first merge and the extra HEUR_ENT entities all replay exactly."""
    from wbkg.extract import build_pattern_rows
    from wbkg.pipeline import run_pipeline
    from wbkg.synth import (
        build_entity_dict_rows,
        build_unbis_rows,
        entity_dict_df,
        gen_documents_df,
        gen_metadata_df,
    )

    n_docs = KG_N_DOCS
    docs = gen_documents_df(spark, n_docs)
    edict = entity_dict_df(spark, n_docs)
    meta = gen_metadata_df(spark, n_docs)
    pats = build_pattern_rows(build_entity_dict_rows(n_docs), build_unbis_rows())
    edges = run_pipeline(
        spark, docs, edict, pats, metadata_df=meta, cache=False, heuristic_ner=True
    )["edges"]
    return _edges_vs_oracle(spark, edges, n_docs, heuristic_ner=True)


def _edges_vs_oracle(spark, edges, n_docs, heuristic_ner=False):
    from wbkg.oracle import oracle_pipeline

    exp = spark.createDataFrame(
        list(oracle_pipeline(n_docs, heuristic_ner=heuristic_ner)),
        "subj string, pred string, obj string",
    )
    got = edges.select("subj", "pred", "obj")
    n_spark = got.agg(F.count("*").alias("n_spark"))
    n_oracle = exp.agg(F.count("*").alias("n_oracle"))
    n_matched = got.join(exp, ["subj", "pred", "obj"], "left_semi").agg(
        F.count("*").alias("n_matched")
    )
    return n_spark.crossJoin(n_oracle).crossJoin(n_matched)


def q_kg_pipeline_salted_edges(spark, sf_dir):
    """The SAME full-pipeline-vs-Python-oracle gate, but through the salted
    shuffle-join strategy — the 100x-scale (non-broadcastable-dictionary)
    path is hard-gated by the driver, not just equivalence-tested in CI."""
    from wbkg.extract import build_pattern_rows
    from wbkg.pipeline import run_pipeline
    from wbkg.synth import (
        build_entity_dict_rows,
        build_unbis_rows,
        entity_dict_df,
        gen_documents_df,
        gen_metadata_df,
    )

    n_docs = KG_N_DOCS
    docs = gen_documents_df(spark, n_docs)
    edict = entity_dict_df(spark, n_docs)
    meta = gen_metadata_df(spark, n_docs)
    pats = build_pattern_rows(build_entity_dict_rows(n_docs), build_unbis_rows())
    edges = run_pipeline(
        spark, docs, edict, pats, metadata_df=meta, cache=False, link_strategy="salted"
    )["edges"]
    return _edges_vs_oracle(spark, edges, n_docs)


def q_graph_kcore(spark, sf_dir):
    """k-core decomposition (wbkg/graph_analytics.py k_core): the 6-core
    of the bipartite part--order incidence graph — iterative peel until
    every surviving node keeps >= 6 distinct neighbors. Cascading fixture:
    dropping thin orders thins part degrees and vice versa (6-12 peel
    rounds at the test SFs); the oracle unrolls 16 peel rounds
    mechanically, strictly more than any tested SF needs, so its fixpoint
    equals the loop's."""
    from wbkg.graph_analytics import k_core

    li = _read(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("dst"),
    )
    return k_core(li, k=6)


def q_graph_modularity(spark, sf_dir):
    """Newman modularity (wbkg/graph_analytics.py modularity) of a
    deliberately-mixed partition: nation-chain + customer-membership
    edges, nations assigned to communities by nationkey parity (so chain
    edges cross communities), customers left out of the map (so the
    singleton-fallback path is exercised on every customer node).
    Integer-count folds; the two divisions and the sum are the only
    floating ops (round 8)."""
    from wbkg.graph_analytics import modularity

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    cust = _read(spark, sf_dir, "customer").select(
        F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    nations = _read(spark, sf_dir, "nation").select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("node"),
        F.concat(F.lit("m:"), (F.col("n_nationkey") % 2).cast("string")).alias(
            "community"
        ),
    )
    return modularity(chain.unionByName(cust), nations)


def q_pmi_collocations(spark, sf_dir):
    """Collocation mining (wbkg/ops/textops.py pmi_collocations): top-40
    adjacent word pairs by PMI over the documents corpus, min pair count
    5. Integer count ratios into one ln (round 8); the top-k order is
    totalized by (pmi DESC, c12 DESC, w1, w2) so the LIMIT cut is
    engine-independent."""
    from wbkg.ops.textops import pmi_collocations

    docs = _read(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5, top_k=40)


def q_rollup_events(spark, sf_dir):
    """ROLLUP subtotal lattice (wbkg/ops/olap.py rollup_counts): event
    counts at (event_type, user_bucket), (event_type), and () grouping
    sets in ONE Expand+groupBy pass, gid = the ANSI GROUPING bitmask that
    separates subtotal NULLs from data NULLs."""
    from wbkg.ops.olap import rollup_counts

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    )
    return rollup_counts(ev, ["event_type", "user_bucket"])


def q_cube_events(spark, sf_dir):
    """CUBE lattice (wbkg/ops/olap.py rollup_counts use_cube=True): same
    fixture as rollup_events plus the (user_bucket)-only grouping set —
    the full 2^2 lattice, still one Expand pass."""
    from wbkg.ops.olap import rollup_counts

    ev = _read(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket")
    )
    return rollup_counts(ev, ["event_type", "user_bucket"], use_cube=True)


def q_pivot_event_counts(spark, sf_dir):
    """Fixed-vocabulary pivot (wbkg/ops/olap.py pivot_counts): per-user
    counts of each of the five event types as columns — conditional
    aggregates in one partial-agg groupBy, no distinct-scan pre-pass,
    schema independent of the data."""
    from wbkg.ops.olap import pivot_counts

    ev = _read(spark, sf_dir, "events")
    return pivot_counts(
        ev, "user_id", "event_type", ["click", "error", "purchase", "signup", "view"]
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling (wbkg/ops/prep.py
    sample_stratified): downsample en to 30% and zh to 50% by md5-hex
    threshold compare (pure string <, zero float ops), other languages
    kept whole — the no-RNG per-class mixture control, exactly
    reproducible in any engine with md5."""
    from wbkg.ops.prep import sample_stratified

    docs = _read(spark, sf_dir, "documents")
    return sample_stratified(
        docs, {"en": 0.3, "zh": 0.5}, label_col="lang", id_col="doc_id"
    ).select("doc_id", "lang", "source")


def q_merge_upsert(spark, sf_dir):
    """MERGE INTO emulation (wbkg/ops/table.py merge_upsert): upsert a
    derived change-batch into the orders snapshot — every 7th order
    repriced (update arm), every 13th mirrored to a fresh offset key
    (insert arm; an offset, not negation, so orderkey 0 — which is in both
    residue classes — cannot collide with its own update) — latest version wins, one window shuffle on the merge
    key, no join. Oracle restates the union + row_number latest-per-key
    rule."""
    from wbkg.ops.table import merge_upsert

    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit(0).alias("version")
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("version", F.lit(1))
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(1000000000))
        .withColumn("version", F.lit(1))
    )
    return merge_upsert(
        o, updates.unionByName(inserts), keys=["o_orderkey"], order_col="version"
    )


def q_dedup_sentences(spark, sf_dir):
    """Within-document repeated-sentence removal (wbkg/ops/textops.py
    dedup_sentences): order-preserving first-occurrence filter over the
    sentence array, pure map-side Catalyst (no explode/shuffle/UDF). The
    split regex is lookbehind-free so DuckDB's RE2 tokenizes identically;
    the oracle replays the same position-indexed list filter."""
    from wbkg.ops.textops import dedup_sentences

    return dedup_sentences(_read(spark, sf_dir, "documents"))


def q_graph_link_prediction(spark, sf_dir):
    """Link prediction (wbkg/graph_analytics.py link_prediction): top-100
    unconnected node pairs of the part--order incidence graph by
    Adamic-Adar, hub centers capped at degree 30 (wedge volume stays
    ~10M at sf0.1 instead of quadratic blowup; the cap is part of the
    stated contract and the oracle applies it identically). Integer
    common counts; the 1/ln(degree) sum rounds to 8 and the top-k order
    is totalized by (adamic_adar, common, u, v)."""
    from wbkg.graph_analytics import link_prediction

    li = _read(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("o:"), F.col("l_orderkey").cast("string")).alias("dst"),
    )
    return link_prediction(li, min_common=3, max_center_degree=30, top_k=100)


def q_event_rate_anomaly(spark, sf_dir):
    """Per-user event-rate z-score anomalies (wbkg/ops/prep.py
    event_rate_anomaly): hours whose count deviates > 2.5 sample stddevs
    from the user's own hourly mean. The moments are integer sums and the
    mean/var/z expressions are spelled in one fixed IEEE order repeated
    literally by the oracle — no Welford-vs-naive drift."""
    from wbkg.ops.prep import event_rate_anomaly

    return event_rate_anomaly(_read(spark, sf_dir, "events"))


def q_rolling_stats(spark, sf_dir):
    """Trailing 7-row per-user moving sum/avg (wbkg/ops/prep.py
    rolling_stats): ROWS BETWEEN 6 PRECEDING AND CURRENT ROW over
    (ts, event_id) — the tiebreak totalizes equal timestamps so both
    engines fold the same frame; round 8 absorbs Spark's sequential
    recompute vs DuckDB's segment-tree summation order."""
    from wbkg.ops.prep import rolling_stats

    return rolling_stats(_read(spark, sf_dir, "events"), window_rows=7)


def q_ntile_deciles(spark, sf_dir):
    """Exact distributed NTILE(10) (wbkg/ops/prep.py ntile_buckets) over
    document length: range repartition + per-partition parallel windows +
    prefix offsets, NOT the single-partition global window (the
    scale-killer this op exists to avoid); (n_chars, doc_id) totalizes
    the order so bucket assignment is engine-exact."""
    from wbkg.ops.prep import ntile_buckets

    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return ntile_buckets(docs, n=10, order_cols=["n_chars", "doc_id"])


def q_sparql_update(spark, sf_dir):
    """SPARQL 1.1 Update (wbkg/sparql.py sparql_update): a three-op
    request — predicate rewrite via DELETE/INSERT WHERE (evaluated against
    the pre-op graph per spec §3.1.3), a DELETE WHERE sweep, and an
    INSERT DATA — applied functionally to a nation-derived edge set. The
    oracle states the final graph relationally."""
    from wbkg.sparql import sparql_update

    n = _read(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("urn:p:in_region").alias("pred"),
        F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("obj"),
    ).unionByName(
        n.select(
            F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("subj"),
            F.lit("urn:p:name").alias("pred"),
            F.col("n_name").alias("obj"),
        )
    )
    return sparql_update(
        edges,
        """DELETE { ?n <urn:p:in_region> ?r } INSERT { ?n <urn:p:region> ?r }
           WHERE { ?n <urn:p:in_region> ?r } ;
           DELETE WHERE { ?n <urn:p:name> ?v } ;
           INSERT DATA { <n:0> <urn:p:flag> "zero" }""",
    )


def q_token_entropy(spark, sf_dir):
    """Per-doc token-distribution Shannon entropy (wbkg/ops/textops.py
    token_entropy) — repetition/word-salad quality signal. Integer counts
    into one division + ln per distinct term, round 8."""
    from wbkg.ops.textops import token_entropy

    return token_entropy(_read(spark, sf_dir, "documents"))


def q_flesch_reading_ease(spark, sf_dir):
    """Flesch reading ease (wbkg/ops/textops.py flesch_reading_ease):
    vowel-group syllable heuristic, lookbehind-free sentence split, one
    map-side projection (no explode/shuffle/UDF); the oracle replays the
    identical lambda pipeline with ::DOUBLE-pinned literals."""
    from wbkg.ops.textops import flesch_reading_ease

    return flesch_reading_ease(_read(spark, sf_dir, "documents"))


def q_key_skew_report(spark, sf_dir):
    """Shuffle-skew diagnostic (wbkg/ops/prep.py key_skew_report) over the
    lineitem part key: per-key counts folded into power-of-two buckets via
    binary-digit length (pure integer, immune to the floor(log2) float
    edge). The pre-salting audit report, <= 64 rows."""
    from wbkg.ops.prep import key_skew_report

    return key_skew_report(_read(spark, sf_dir, "lineitem"), "l_partkey")


def q_zorder_key(spark, sf_dir):
    """Morton/Z-order clustering key (wbkg/ops/table.py zorder_key) over
    (custkey, orderkey) — the OPTIMIZE ZORDER BY maintenance primitive;
    pure integer shift/and/add Catalyst expression, bit-identical in any
    engine."""
    from wbkg.ops.table import zorder_key

    o = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return zorder_key(o, "o_custkey", "o_orderkey", bits=16)


def q_funnel_stages(spark, sf_dir):
    """Ordered funnel conversion (wbkg/ops/prep.py funnel_stages): how far
    each user gets through view -> click -> purchase as an in-order
    subsequence of their event stream. One groupBy collect+fold on the
    user key; the greedy cursor walk equals the oracle's
    min-position-after-slice subsequence test."""
    from wbkg.ops.prep import funnel_stages

    return funnel_stages(
        _read(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix (wbkg/ops/prep.py cohort_retention): users
    bucketed by first-activity ISO week x active-week offset. Integer
    epoch-day difference / 7 (exact — both sides are Monday-truncated);
    user-distinct (user, week) rows feed the fold."""
    from wbkg.ops.prep import cohort_retention

    return cohort_retention(_read(spark, sf_dir, "events"))


def q_state_dwell_time(spark, sf_dir):
    """SCD2 dwell-time rollup (wbkg/ops/prep.py state_dwell_time over
    scd2_history's output): seconds per (user, state) across closed
    versions + per-user share. Integer timestampdiff microseconds; one
    (key,state) fold + one key-total window, co-partitioned."""
    from wbkg.ops.prep import scd2_history, state_dwell_time

    hist = scd2_history(
        _read(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        state_col="event_type",
        tiebreak_col="event_id",
    )
    return state_dwell_time(hist)


def q_rrf_fusion(spark, sf_dir):
    """Hybrid-retrieval reciprocal-rank fusion (wbkg/ops/textops.py
    rrf_fuse): BM25 lexical ranking ('hash join stream') fused with the
    bigram-LM fluency ranking by rank, not raw score. Integer ranks with
    id tiebreaks; two 1/(60+rank) terms summed in fixed order, round 8;
    top-50 cut totalized by (rrf, doc_id)."""
    from wbkg.ops.textops import bigram_lm_score, bm25_rank, rrf_fuse

    docs = _read(spark, sf_dir, "documents")
    bm = bm25_rank(docs, "hash join stream")
    fl = bigram_lm_score(docs)
    return rrf_fuse(bm, fl, score_a="score", score_b="avg_logp", top_k=50)


def q_sample_weighted(spark, sf_dir):
    """Deterministic weighted sampling (wbkg/ops/prep.py sample_weighted,
    Efraimidis-Spirakis A-Res): top-64 documents by u^(1/n_chars) with the
    md5-derived uniform — inclusion probability proportional to document
    length, zero RNG. round-8 key + id tiebreak totalizes the cut."""
    from wbkg.ops.prep import sample_weighted

    return sample_weighted(
        _read(spark, sf_dir, "documents"), k=64, weight_col="n_chars"
    )


def q_graph_ktruss(spark, sf_dir):
    """k-truss (wbkg/graph_analytics.py k_truss): the 6-truss of the
    co-purchase graph restricted to every 4th part — support peel where
    each round recounts per-edge triangle support with the degree-ordered
    Schank-Wagner shape (3-4 rounds at the tested SFs; the oracle unrolls
    8 naive-spec rounds, strictly more). Survivors carry their final
    integer support."""
    from wbkg.graph_analytics import k_truss

    li = (
        _read(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return k_truss(pairs, k=6)


def q_unpivot_measures(spark, sf_dir):
    """Wide->long unpivot (wbkg/ops/olap.py unpivot_measures): lineitem's
    four numeric measures melted to (orderkey, linenumber, measure, value)
    — Spark's native unpivot Expand (map-side row replication, no
    shuffle); oracle spells the same reshape as UNION ALL."""
    from wbkg.ops.olap import unpivot_measures

    li = _read(spark, sf_dir, "lineitem")
    return unpivot_measures(
        li,
        ids=["l_orderkey", "l_linenumber"],
        measures=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def q_graph_hits(spark, sf_dir):
    """HITS hubs & authorities (wbkg/graph_analytics.py hits) over the
    per-region nation chain: each node has <= 1 in- and out-edge, so the
    raw half-step sums are single terms and the oracle unrolls all 10
    L2-normalized iterations over the 5 chain positions exactly (the
    norm's 25-node sum collapses to 5x the per-position squares —
    association differs from Spark's fold by ulps, absorbed by the shared
    round-8 convention)."""
    from wbkg.graph_analytics import hits

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return hits(chain, iterations=10)


def _user_type_bipartite(spark, sf_dir):
    """Undirected user<->event_type bipartite graph from the event log —
    the metapath fixture for walk/centrality ops (walks alternate
    u:/t: nodes)."""
    ev = _read(spark, sf_dir, "events").select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    )
    return ev


def q_sparql_numeric_fns(spark, sf_dir):
    """SPARQL numeric value functions (wbkg/sparql.py ABS/ROUND/CEIL/
    FLOOR, §17.4.4): BINDs over order totals (strings, as this graph
    stores) and a negative integer key — FLOOR/CEIL restringify as
    integral longs, ROUND/ABS as doubles; the oracle casts to the same
    shapes (floor(x)::BIGINT vs DuckDB's native DOUBLE floor)."""
    from wbkg.sparql import sparql_select

    o = _read(spark, sf_dir, "orders")
    edges = o.select(
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("subj"),
        F.lit("urn:p:total").alias("pred"),
        F.col("o_totalprice").cast("string").alias("obj"),
    ).unionByName(
        o.select(
            F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias(
                "subj"
            ),
            F.lit("urn:p:negkey").alias("pred"),
            (-F.col("o_custkey")).cast("string").alias("obj"),
        )
    )
    return sparql_select(
        edges,
        """
        SELECT ?o ?f ?c ?r ?a WHERE {
          ?o <urn:p:total> ?t . ?o <urn:p:negkey> ?k .
          BIND(FLOOR(?t) AS ?f) BIND(CEIL(?t) AS ?c)
          BIND(ROUND(?t) AS ?r) BIND(ABS(?k) AS ?a)
        }
        """,
    )


def q_prep_pipeline(spark, sf_dir):
    """Composed training-data prep chain — the ops are individually
    oracle-checked elsewhere; this entry pins their COMPOSITION (the
    thing a real corpus build runs): keep English docs in a length band,
    exact-dedup by content (min-id survivor), then md5-stable 90/5/5
    split. One groupBy shuffle (the dedup) end to end; the filters and
    the split are map-side. Output (doc_id, n_chars, split)."""
    from wbkg.ops.prep import split_assign

    docs = (
        _read(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & F.col("n_chars").between(50, 400))
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return split_assign(deduped).select("doc_id", "n_chars", "split")


def q_winsorize(spark, sf_dir):
    """Percentile winsorization (wbkg/ops/prep.py winsorize): order totals
    clipped into each priority class's exact [p01, p99] band — Spark
    percentile() and DuckDB quantile_cont share the linear-interpolation
    definition; thresholds round 6 so the clip comparisons are
    engine-stable."""
    from wbkg.ops.prep import winsorize

    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return winsorize(
        o, "o_totalprice", group_col="o_orderpriority", lower=0.01, upper=0.99
    )


def q_graph_katz(spark, sf_dir):
    """Katz centrality (wbkg/graph_analytics.py katz_centrality) over the
    per-region nation chain: <=1 in-edge per node makes each update a
    single-term recurrence, so the oracle replays all 10 truncated-series
    iterations with the same 5-column recursive CTE scheme as
    graph_pagerank (k_p' = 1 + 0.1*k_{p-1}, heads pinned at 1). Round 8
    output convention."""
    from wbkg.graph_analytics import katz_centrality

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    k = katz_centrality(chain, iterations=10, alpha=0.1)
    return k.select("node", F.round("katz", 8).alias("katz"))


def q_table_diff(spark, sf_dir):
    """Snapshot diff / change-data-feed (wbkg/ops/table.py table_diff):
    two synthetic versions of orders (v1 drops every 3rd key, v2 drops
    every 5th and doubles even keys' totals) classified I/D/U via ONE
    full-outer key join with map-side value hashing. The oracle states
    the diff relationally (IS DISTINCT FROM per column) — algorithm-
    independent of the hash."""
    from wbkg.ops.table import table_diff

    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 3 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(old, new, ["o_orderkey"])


def q_graph_scc(spark, sf_dir):
    """Strongly connected components (wbkg/graph_analytics.py
    strongly_connected_components, Orzan coloring) on the nation chains
    CLOSED into per-region cycles (tail->head back edge) plus ONE one-way
    region-0-tail -> region-1-head bridge: five 5-cycles, two DAG-linked —
    coloring floods region 0's min into region 1, so region 1 peels only
    in round 2 (the multi-round path runs for real; the other cycles peel
    immediately, keeping the query's job count bounded). The oracle is
    algorithm-independent: recursive-CTE closure + mutual-reachability
    pairs, scc_id = min member (lexicographic on both sides)."""
    from wbkg.graph_analytics import strongly_connected_components

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    n = _read(spark, sf_dir, "nation")
    hd = n.groupBy("n_regionkey").agg(
        F.min("n_nationkey").alias("h"), F.max("n_nationkey").alias("t")
    )
    back = hd.select(
        F.concat(F.lit("n:"), F.col("t").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("h").cast("string")).alias("dst"),
    )
    a, b = hd.alias("a"), hd.alias("b")
    bridges = a.join(
        b,
        (F.col("b.n_regionkey") == F.col("a.n_regionkey") + 1)
        & (F.col("a.n_regionkey") == 0),
    ).select(
        F.concat(F.lit("n:"), F.col("a.t").cast("string")).alias("src"),
        F.concat(F.lit("n:"), F.col("b.h").cast("string")).alias("dst"),
    )
    e = chain.unionByName(back).unionByName(bridges)
    return strongly_connected_components(e)


def q_graph_clustering(spark, sf_dir):
    """Local clustering coefficient (wbkg/graph_analytics.py
    clustering_coefficient) over the part co-purchase graph — the
    degree-ordered wedge enumeration attributing each triangle to its
    three corners; the oracle counts each node's closed neighbor pairs
    naively (spec form) at sf scale."""
    from wbkg.graph_analytics import clustering_coefficient

    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    return clustering_coefficient(pairs)


def q_rake_keyphrases(spark, sf_dir):
    """RAKE keyphrases (wbkg/ops/textops.py rake_keyphrases): stopword-
    island candidate phrases, per-doc degree/frequency word scores,
    phrase = sum of word scores, top-3 per doc with (score, phrase)
    tie-breaks. The oracle replays the islands windows, the deg/freq
    join and the ordered string_agg phrase assembly."""
    from wbkg.ops.textops import rake_keyphrases

    return rake_keyphrases(_read(spark, sf_dir, "documents"), top_k=3)


def q_sample_temperature(spark, sf_dir):
    """sqrt-temperature domain rebalance (wbkg/ops/prep.py
    sample_temperature): per-source keep rates ~ sqrt(n)/n (sqrt is
    IEEE-exact cross-engine, unlike pow), rate round-6, accept =
    md5-bucket MOD 1e6 < integer micro-threshold — the data-derived-rate
    variant of sample_mixture's integer-exact accept discipline."""
    from wbkg.ops.prep import sample_temperature

    return sample_temperature(
        _read(spark, sf_dir, "documents"), target_fraction=0.5
    )


def q_vocab_oov_rate(spark, sf_dir):
    """Vocabulary coverage / OOV rate (wbkg/ops/prep.py vocab_oov_rate):
    top-8 corpus vocabulary (tf desc, term tie-break — a deterministic
    TakeOrderedAndProject cut, no SinglePartition window) then per-doc
    out-of-vocabulary rate via a broadcast membership join."""
    from wbkg.ops.prep import vocab_oov_rate

    return vocab_oov_rate(_read(spark, sf_dir, "documents"), vocab_size=8)


def q_mmr_rerank(spark, sf_dir):
    """MMR diversified re-ranking (wbkg/ops/similarity.py mmr_rerank):
    shortlist-20 by exact cosine, then 4 greedy rounds of
    0.7*rel - 0.3*max_sim_to_selected (rel round-4, sims round-6 BEFORE
    the max, score round-6, id tie-breaks — every cut engine-exact). The
    oracle unrolls the same rounds with MATERIALIZED selected-set CTEs."""
    from wbkg.ops.similarity import mmr_rerank

    emb = _read(spark, sf_dir, "embeddings")
    return mmr_rerank(emb, QUERY_VEC, k=5, shortlist=20, lam=0.7)


def q_quantized_topk(spark, sf_dir):
    """Two-stage ANN serving (wbkg/ops/similarity.py quantized_topk):
    int8 asymmetric-distance shortlist (scale * sum(code*q), half-up codes
    — quantize_embeddings' exact arithmetic) then exact re-rank, both
    cuts TakeOrderedAndProject with id tie-breaks. The oracle replays
    quantization, shortlist and re-rank with the same rounding (6/4 dp)."""
    from wbkg.ops.similarity import quantized_topk

    emb = _read(spark, sf_dir, "embeddings")
    return quantized_topk(emb, QUERY_VEC, k=10, shortlist=50)


def q_graph_ppr(spark, sf_dir):
    """Personalized PageRank (wbkg/graph_analytics.py
    personalized_pagerank) over the per-region nation chain, restarting
    at the 5 chain HEADS: initial mass 1/5 per head, dangling tails
    restart to the heads, every other node earns rank only by walk —
    so position p's rank depends only on p and the oracle replays all
    10 iterations with one 5-column recursive CTE (same scheme as
    graph_pagerank, different recurrence: r0' = 0.03 + 0.85*dang/5,
    rp' = 0.85*r(p-1)). Round 8 absorbs the dangling-fold sum-order
    ulp."""
    from wbkg.graph_analytics import personalized_pagerank

    chain = _nation_chain_edges(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    srcs = chain.select(F.col("src").alias("node")).distinct()
    dsts = chain.select(F.col("dst").alias("node")).distinct()
    heads = srcs.join(dsts, "node", "left_anti")
    ppr = personalized_pagerank(chain, heads, iterations=10, damping=0.85)
    return ppr.select("node", F.round("rank", 8).alias("rank"))


def q_graph_random_walks(spark, sf_dir):
    """Deterministic random-walk corpus (wbkg/graph_analytics.py
    random_walks — the DeepWalk/node2vec walk-generation stage): 1 walk of
    3 steps from every node of the user<->event-type bipartite graph. No
    RNG — step t follows out-edge md5(walk_id:rw:t) % outdeg in
    row_number-over-(src ORDER BY dst) slot order, so the oracle replays
    every hop exactly with the same md5 arithmetic."""
    from wbkg.graph_analytics import random_walks

    ev = _user_type_bipartite(spark, sf_dir)
    g = ev.unionByName(
        ev.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return random_walks(g, walk_len=3, walks_per_node=1)


def q_graph_harmonic(spark, sf_dir):
    """Seed-set harmonic closeness (wbkg/graph_analytics.py
    harmonic_centrality): per-seed labeled BFS from every event-type node
    over the undirected user<->type bipartite graph, harmonic(v) =
    sum 1/d(seed, v) within 4 hops. The oracle is a recursive-CTE BFS
    taking min(dist) per (seed, node) — identical semantics to the
    hop-bounded frontier loop."""
    from wbkg.graph_analytics import harmonic_centrality

    ev = _user_type_bipartite(spark, sf_dir)
    seeds = ev.select(F.col("dst").alias("node")).distinct()
    return harmonic_centrality(ev, seeds, max_hops=4)


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix (wbkg/ops/prep.py
    event_transitions): per-user lead() pairing on (ts, event_id) — the
    tiebreak totalizes equal timestamps — then a (from, to) partial-agg
    count and a row-normalized probability. One user-key window shuffle;
    the oracle replays the identical window + normalization."""
    from wbkg.ops.prep import event_transitions

    return event_transitions(_read(spark, sf_dir, "events"))


def q_gapfill_daily(spark, sf_dir):
    """Calendar gap-fill / resample (wbkg/ops/prep.py gapfill_daily):
    per-user dense day spine via sequence()+explode, zero-filled counts,
    forward-filled day values via the engine-portable gaps-and-islands
    fill (running non-null count -> per-island max). Days are ISO strings
    — the computed-DATE hash trap. Oracle builds the same spine with
    generate_series."""
    from wbkg.ops.prep import gapfill_daily

    return gapfill_daily(_read(spark, sf_dir, "events"))


def q_ewma_smooth(spark, sf_dir):
    """Per-user EWMA (wbkg/ops/prep.py ewma_smooth): array_sort-collected
    values folded by ONE map-side F.aggregate (s_i = a*x_i + (1-a)*s_-1,
    seeded at x_1). alpha=0.5 so 1-alpha is IEEE-exact in both engines;
    the oracle's list_reduce folds the identical left-to-right order
    (DuckDB's ordered list() aggregate supplies the sort)."""
    from wbkg.ops.prep import ewma_smooth

    return ewma_smooth(_read(spark, sf_dir, "events"), alpha=0.5)


def q_profile_columns(spark, sf_dir):
    """Column profiling (wbkg/ops/prep.py profile_columns): one aggregate
    pass (exact distincts via the multi-distinct Expand) + stack() unpivot
    to the long (column, stat) data-quality layout. String/integer columns
    only — double->string formatting is the one cast engines render
    differently."""
    from wbkg.ops.prep import profile_columns

    return profile_columns(
        _read(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderkey"],
    )


def _query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Unordered base registry — the public queries() applies the mechanical
    # manifest ordering (registry_order) before the driver sees it.
    return {
        "percentile_filter": q_percentile_filter,
        "scrub_pii": q_scrub_pii,
        "media_features": q_media_features,
        "media_png_decode": q_media_png_decode,
        "media_wav_decode": q_media_wav_decode,
        "media_mp4_meta": q_media_mp4_meta,
        "media_video_decode": q_media_video_decode,
        "media_resize_real": q_media_resize_real,
        "media_resample_audio": q_media_resample_audio,
        "token_freq_score": q_token_freq_score,
        "tfidf_topk": q_tfidf_topk,
        "inverted_index": q_inverted_index,
        "phrase_search": q_phrase_search,
        "asof_join_events": q_asof_join_events,
        "interval_overlap": q_interval_overlap,
        "bm25_rank": q_bm25_rank,
        "bigram_lm": q_bigram_lm,
        "fuzzy_match_edit1": q_fuzzy_match_edit1,
        "media_frame_sample": q_media_frame_sample,
        "sparql_order_desc": q_sparql_order_desc,
        "sparql_not_exists": q_sparql_not_exists,
        "sparql_sum_avg": q_sparql_sum_avg,
        "sparql_filter_strfns": q_sparql_filter_strfns,
        "sparql_minus": q_sparql_minus,
        "cap_per_source": q_cap_per_source,
        "quantize_embeddings": q_quantize_embeddings,
        "kmeans_assign": q_kmeans_assign,
        "sparql_path_seq": q_sparql_path_seq,
        "sparql_path_plus": q_sparql_path_plus,
        "sparql_path_alt": q_sparql_path_alt,
        "sparql_path_star": q_sparql_path_star,
        "sparql_bind": q_sparql_bind,
        "sparql_str_extract": q_sparql_str_extract,
        "sparql_filter_numeric": q_sparql_filter_numeric,
        "sparql_lang": q_sparql_lang,
        "sparql_datatype": q_sparql_datatype,
        "sparql_strlang": q_sparql_strlang,
        "sparql_subquery_having": q_sparql_subquery_having,
        "sparql_offset": q_sparql_offset,
        "sparql_path_neg": q_sparql_path_neg,
        "sparql_describe": q_sparql_describe,
        "url_normalize": q_url_normalize,
        "graph_pagerank": q_graph_pagerank,
        "graph_triangles": q_graph_triangles,
        "graph_degree_stats": q_graph_degree_stats,
        "graph_bfs": q_graph_bfs,
        "graph_node_jaccard": q_graph_node_jaccard,
        "graph_sssp": q_graph_sssp,
        "scd2_history": q_scd2_history,
        "sessionize_events": q_sessionize_events,
        "sparql_having_groupconcat": q_sparql_having_groupconcat,
        "sparql_nested_groups": q_sparql_nested_groups,
        "sparql_subquery": q_sparql_subquery,
        "sketch_distinct_sources": q_sketch_distinct_sources,
        "sketch_quantiles": q_sketch_quantiles,
        "kg_pipeline_edges": q_kg_pipeline_edges,
        "kg_pipeline_salted_edges": q_kg_pipeline_salted_edges,
        "kg_pipeline_heur_edges": q_kg_pipeline_heur_edges,
        "a1_dedup_latest": q_a1_dedup_latest,
        "a5_cooccurrence": q_a5_cooccurrence,
        "a6_top_event_types": q_a6_top_event_types,
        "a7_texts_per_group": q_a7_texts_per_group,
        "w5_running_budget": q_w5_running_budget,
        "w4_prev_next": q_w4_prev_next,
        "j4_star_join": q_j4_star_join,
        "j5_explode_links": q_j5_explode_links,
        "j6_zip_explode": q_j6_zip_explode,
        "j7_contains_join": q_j7_contains_join,
        "j8_semi_join": q_j8_semi_join,
        "j9_self_join": q_j9_self_join,
        "so1_union_distinct": q_so1_union_distinct,
        "so2_anti_join": q_so2_anti_join,
        "g2_label_propagation": q_g2_label_propagation,
        "g2_hierarchical": q_g2_hierarchical,
        "graph_2hop_neighborhood": q_graph_2hop_neighborhood,
        "graph_sibling_docs": q_graph_sibling_docs,
        "sparql_bgp": q_sparql_bgp,
        "sparql_optional": q_sparql_optional,
        "sparql_filter": q_sparql_filter,
        "sparql_groupby": q_sparql_groupby,
        "sparql_union": q_sparql_union,
        "sparql_construct": q_sparql_construct,
        "k1_ttl_roundtrip": q_k1_ttl_roundtrip,
        "k1_ttl_pretty_roundtrip": q_k1_ttl_pretty_roundtrip,
        "answer_synthesis": q_answer_synthesis,
        "dedup_keep_list": q_dedup_keep_list,
        "p1_sanitize": q_p1_sanitize,
        "p2_p3_filter_chain": q_p2_p3_filter_chain,
        "w2_topk_similarity": q_w2_topk_similarity,
        "w2_topk_filtered": q_w2_topk_filtered,
        "g4_connected_components": q_g4_connected_components,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_ngram_prefiltered": q_dedup_ngram_prefiltered,
        "decontam_report": q_decontam_report,
        "decontam_bloom": q_decontam_bloom,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "repeated_passages": q_repeated_passages,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "ann_lsh_topk": q_ann_lsh_topk,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "token_count": q_token_count,
        "bpe_token_count": q_bpe_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "gopher_quality": q_gopher_quality,
        "pack_sequences": q_pack_sequences,
        "split_assign": q_split_assign,
        "sample_mixture": q_sample_mixture,
        "graph_kcore": q_graph_kcore,
        "graph_modularity": q_graph_modularity,
        "pmi_collocations": q_pmi_collocations,
        "rollup_events": q_rollup_events,
        "cube_events": q_cube_events,
        "pivot_event_counts": q_pivot_event_counts,
        "sample_stratified": q_sample_stratified,
        "merge_upsert": q_merge_upsert,
        "dedup_sentences": q_dedup_sentences,
        "graph_link_prediction": q_graph_link_prediction,
        "event_rate_anomaly": q_event_rate_anomaly,
        "rolling_stats": q_rolling_stats,
        "ntile_deciles": q_ntile_deciles,
        "sparql_update": q_sparql_update,
        "token_entropy": q_token_entropy,
        "flesch_reading_ease": q_flesch_reading_ease,
        "key_skew_report": q_key_skew_report,
        "zorder_key": q_zorder_key,
        "funnel_stages": q_funnel_stages,
        "cohort_retention": q_cohort_retention,
        "state_dwell_time": q_state_dwell_time,
        "rrf_fusion": q_rrf_fusion,
        "sample_weighted": q_sample_weighted,
        "graph_ktruss": q_graph_ktruss,
        "unpivot_measures": q_unpivot_measures,
        "graph_hits": q_graph_hits,
        "sparql_numeric_fns": q_sparql_numeric_fns,
        "prep_pipeline": q_prep_pipeline,
        "winsorize": q_winsorize,
        "graph_katz": q_graph_katz,
        "table_diff": q_table_diff,
        "graph_scc": q_graph_scc,
        "graph_clustering": q_graph_clustering,
        "rake_keyphrases": q_rake_keyphrases,
        "sample_temperature": q_sample_temperature,
        "vocab_oov_rate": q_vocab_oov_rate,
        "mmr_rerank": q_mmr_rerank,
        "quantized_topk": q_quantized_topk,
        "graph_ppr": q_graph_ppr,
        "graph_random_walks": q_graph_random_walks,
        "graph_harmonic": q_graph_harmonic,
        "event_transitions": q_event_transitions,
        "gapfill_daily": q_gapfill_daily,
        "ewma_smooth": q_ewma_smooth,
        "profile_columns": q_profile_columns,
    }


# --------------------------------------------------------------------------- #
# oracle SQL (DuckDB)                                                          #
# --------------------------------------------------------------------------- #

EN_PAT = r"\b(the|and|of|to|a|in|is|for)\b"
ES_PAT = r"\b(el|la|de|que|los|una)\b"
FR_PAT = r"\b(le|les|des|une|est|dans)\b"


def _oracle_sqls() -> dict[str, str]:
    sqls = {
        "a1_dedup_latest": """
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
              FROM orders) WHERE rn = 1
        """,
        "a5_cooccurrence": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS weight
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        """,
        "a6_top_event_types": """
            SELECT event_type, count(*) AS cnt FROM events
            GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 10
        """,
        "a7_texts_per_group": """
            SELECT lang, count(*) AS n_docs,
                   array_to_string(list_sort(list(doc_id::VARCHAR)), '|') AS doc_ids
            FROM documents GROUP BY lang
        """,
        "w5_running_budget": """
            SELECT user_id, event_id, cum_value FROM (
              SELECT user_id, event_id,
                     round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_value
              FROM events) WHERE cum_value < 500.0
        """,
        "w4_prev_next": """
            SELECT user_id, event_id,
                   lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
                   lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id
            FROM events
        """,
        "j4_star_join": """
            SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "j5_explode_links": """
            SELECT n_regionkey, n_name AS nation_name FROM nation
        """,
        "j6_zip_explode": """
            SELECT n_regionkey, n_nationkey, n_name FROM nation
        """,
        "j7_contains_join": """
            SELECT d.doc_id, t.surface
            FROM documents d JOIN (VALUES ('hash'), ('join'), ('window'), ('spark'), ('stream')) t(surface)
              ON strpos(lower(d.text), t.surface) > 0
        """,
        "j9_self_join": """
            SELECT u.o_custkey, u.o_orderkey AS urgent_order, f.o_orderkey AS finished_order
            FROM (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') u
            JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderstatus = 'F') f
              USING (o_custkey)
        """,
        "j8_semi_join": """
            SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
            WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_size > 40)
        """,
        "so2_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        """,
        "g2_label_propagation": """
            SELECT count(*)::BIGINT AS community_size
            FROM nation GROUP BY n_regionkey HAVING count(*) > 1
        """,
        "g2_hierarchical": """
            WITH m AS (
              SELECT n_regionkey,
                     row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) - 1 AS i,
                     count(*) OVER (PARTITION BY n_regionkey) AS n
              FROM nation),
            chains AS (SELECT * FROM m WHERE n > 1),
            l0 AS (SELECT n_regionkey, count(*) AS csize FROM chains GROUP BY n_regionkey),
            l1 AS (SELECT n_regionkey, floor(i * ceil(n / 3.0) / n) AS bucket, count(*) AS csize
                   FROM chains WHERE n > 3
                   GROUP BY n_regionkey, floor(i * ceil(n / 3.0) / n)),
            u AS (SELECT 0 AS level, csize FROM l0
                  UNION ALL SELECT 1 AS level, csize FROM l1)
            SELECT level::INTEGER AS level, csize::BIGINT AS community_size,
                   count(*)::BIGINT AS n_communities
            FROM u GROUP BY level, csize
        """,
        "so1_union_distinct": """
            SELECT DISTINCT name FROM (
              SELECT n_name AS name FROM nation
              UNION ALL SELECT r_name FROM region
              UNION ALL SELECT n_name FROM nation)
        """,
        "graph_2hop_neighborhood": """
            SELECT 'r:0' AS node, 0 AS hop
            UNION ALL
            SELECT 'n:' || n_nationkey, 1 FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT 'c:' || c_custkey, 2
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE n_regionkey = 0
        """,
        "graph_sibling_docs": """
            WITH m AS (
              SELECT d.doc_id, t.surface
              FROM documents d
              JOIN (VALUES ('hash'), ('join'), ('window'), ('spark'), ('stream')) t(surface)
                ON strpos(lower(d.text), t.surface) > 0)
            SELECT DISTINCT 'd:' || m2.doc_id AS sibling
            FROM m m1 JOIN m m2 ON m1.surface = m2.surface AND m2.doc_id <> 0
            WHERE m1.doc_id = 0
        """,
        "k1_ttl_roundtrip": r"""
            WITH s AS (SELECT 'http://ex.org/nation/' || n_nationkey AS subj, * FROM nation)
            SELECT subj, 'http://schema.org/name' AS pred,
                   'say "' || n_name || '" \ done' AS obj,
                   true AS obj_is_literal, NULL::VARCHAR AS lang FROM s
            UNION ALL
            SELECT subj, 'http://schema.org/label', lower(n_name), true, 'en' FROM s
            UNION ALL
            SELECT subj, 'http://schema.org/isPartOf',
                   'http://ex.org/region/' || n_regionkey, false, NULL FROM s
            UNION ALL
            SELECT subj, 'rdf:type', 'http://schema.org/Country', false, NULL FROM s
        """,
        "answer_synthesis": r"""
            WITH docs AS (
              SELECT n_nationkey AS chunk_id,
                     'The ' || n_name || ' project builds wind turbines. ' ||
                     CASE WHEN n_regionkey = 2
                          THEN 'Environmental impact assessment of the wind farm is complete. '
                          ELSE 'The committee report is pending review. ' END ||
                     'Total emissions fall as the ' || lower(n_name) || ' turbines spin.' AS text
              FROM nation),
            scored AS (
              SELECT chunk_id, text,
                     len(list_intersect(list_distinct(string_split_regex(lower(text), '\W+')),
                         ['emissions','environmental','impact','turbines','wind'])) AS chunk_score
              FROM docs),
            top3 AS (SELECT * FROM scored ORDER BY chunk_score DESC, chunk_id LIMIT 3),
            sents AS (
              SELECT chunk_id,
                     unnest(string_split_regex(text, '[.!?]\s+')) AS sentence,
                     unnest(range(len(string_split_regex(text, '[.!?]\s+')))) AS pos
              FROM top3),
            ss AS (
              SELECT chunk_id, pos, sentence,
                     len(list_intersect(list_distinct(string_split_regex(lower(sentence), '\W+')),
                         ['emissions','environmental','impact','turbines','wind']))::INTEGER AS sent_score
              FROM sents WHERE trim(sentence) <> '')
            SELECT * FROM (
              SELECT row_number() OVER (ORDER BY sent_score DESC, chunk_id, pos)::INTEGER AS rank,
                     sentence, chunk_id AS citation, sent_score
              FROM ss)
            WHERE rank <= 4
        """,
        "k1_ttl_pretty_roundtrip": r"""
            WITH s AS (SELECT 'http://ex.org/nation/' || n_nationkey AS subj, * FROM nation)
            SELECT subj, 'http://schema.org/name' AS pred,
                   'say "' || n_name || '" \ multi' || chr(10) || 'line' || chr(9) || 'tab' AS obj,
                   true AS obj_is_literal, NULL::VARCHAR AS lang FROM s
            UNION ALL
            SELECT subj, 'http://schema.org/alternateName', lower(n_name), true, 'en' FROM s
            UNION ALL
            SELECT subj, 'http://schema.org/isPartOf',
                   'http://ex.org/region/' || n_regionkey, false, NULL FROM s
            UNION ALL
            SELECT subj, 'rdf:type', 'http://schema.org/Country', false, NULL FROM s
        """,
        "p1_sanitize": r"""
            SELECT c_custkey,
                   regexp_replace(regexp_replace(regexp_replace(c_name, '\s+', '_', 'g'),
                     '-', '_', 'g'), '^_+|_+$', '', 'g') AS name_sanitized
            FROM customer
        """,
        "p2_p3_filter_chain": r"""
            SELECT doc_id, n_chars FROM documents
            WHERE length(text) BETWEEN 2 AND 200
              AND length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) >= 2
              AND regexp_matches(text, '[A-Za-z]')
              AND NOT regexp_matches(text, '</?\w+>')
        """,
        "w2_topk_similarity": f"""
            SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], {QUERY_VEC_SQL}), 4) AS score
            FROM embeddings ORDER BY score DESC, vec_id LIMIT 10
        """,
        "w2_topk_filtered": f"""
            SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], {QUERY_VEC_SQL}), 4) AS score
            FROM embeddings WHERE label = 0 ORDER BY score DESC, vec_id LIMIT 5
        """,
        "g4_connected_components": """
            WITH comp AS (
              SELECT n_nationkey, min(n_nationkey) OVER (PARTITION BY n_regionkey) AS m,
                     count(*) OVER (PARTITION BY n_regionkey) AS sz
              FROM nation)
            SELECT 'n' || lpad(n_nationkey::VARCHAR, 5, '0') AS member,
                   'n' || lpad(m::VARCHAR, 5, '0') AS component
            FROM comp WHERE sz > 1
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram_jaccard": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
              FROM words, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)),
            df AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000),
            kept AS (SELECT sh.* FROM sh JOIN df USING (shingle)),
            sizes AS (SELECT doc_id, count(*) n_sh FROM kept GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
              FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(inter / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                       JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 4) >= 0.35
        """,
        # full exact-jaccard replay over the PLANTED corpus at threshold 0.8:
        # passing the value hash proves the minhash prefilter loses no pair
        # the exact inverted-index formulation finds at this threshold
        "dedup_ngram_prefiltered": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {PLANT_OFFSET}, text FROM documents WHERE doc_id % 10 = 0),
            words AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM corpus),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
              FROM words, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)),
            df AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000),
            kept AS (SELECT sh.* FROM sh JOIN df USING (shingle)),
            sizes AS (SELECT doc_id, count(*) n_sh FROM kept GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
              FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(inter / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                       JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 4) >= 0.8
        """,
        "decontam_report": r"""
            WITH w AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
            bench AS (
              SELECT doc_id AS bench_id,
                     string_split_regex(trim(array_to_string(w[4:15], ' ')), '\s+') AS bw
              FROM w WHERE doc_id % 25 = 0 AND len(w) >= 15),
            bsh AS (
              SELECT DISTINCT bench_id,
                     bw[i]||' '||bw[i+1]||' '||bw[i+2]||' '||bw[i+3]||' '||bw[i+4]||' '||bw[i+5]||' '||bw[i+6]||' '||bw[i+7] AS shingle
              FROM bench, unnest(generate_series(1, greatest(len(bw) - 7, 0))) AS t(i)),
            dsh AS (
              SELECT DISTINCT doc_id,
                     w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS shingle
              FROM w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)),
            sizes AS (SELECT bench_id, count(*) bench_n FROM bsh GROUP BY bench_id),
            m AS (
              SELECT d.doc_id, b.bench_id, count(*) matched
              FROM dsh d JOIN bsh b USING (shingle) GROUP BY 1, 2),
            ov AS (
              SELECT doc_id, bench_id, round(matched / bench_n, 4) AS overlap
              FROM m JOIN sizes USING (bench_id)),
            best AS (
              SELECT doc_id, bench_id, overlap,
                     row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, bench_id) AS rn
              FROM ov)
            SELECT d.doc_id,
                   b.bench_id AS top_bench_id,
                   coalesce(b.overlap, 0.0)::DOUBLE AS max_overlap,
                   coalesce(b.overlap, 0.0) >= 0.5 AS contaminated
            FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
        """,
        "repeated_passages": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {PLANT_OFFSET}, text FROM documents WHERE doc_id % 10 = 0),
            words AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM corpus),
            win AS (
              SELECT doc_id,
                     ((i - 1) * 12)::BIGINT AS start_word,
                     md5(array_to_string(w[(i - 1) * 12 + 1 : (i - 1) * 12 + 24], ' ')) AS phash
              FROM words,
                   unnest(generate_series(1, greatest(floor((len(w) - 24) / 12)::BIGINT + 1, 0))) AS t(i)),
            counts AS (
              SELECT phash, count(DISTINCT doc_id)::BIGINT AS n_docs
              FROM win GROUP BY phash HAVING count(DISTINCT doc_id) >= 2)
            SELECT win.doc_id, win.start_word, win.phash, counts.n_docs
            FROM win JOIN counts USING (phash)
        """,
        "dedup_keep_list": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
              FROM words, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)),
            df AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000),
            kept AS (SELECT sh.* FROM sh JOIN df USING (shingle)),
            sizes AS (SELECT doc_id, count(*) n_sh FROM kept GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) inter
              FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT doc_a, doc_b
              FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                         JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 4) >= 0.35),
            sym AS (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
              SELECT a, b FROM sym
              UNION
              SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a),
            comp AS (SELECT a AS doc_id, least(a, min(b)) AS keep_id FROM reach GROUP BY a)
            SELECT d.doc_id,
                   coalesce(c.keep_id, d.doc_id) AS keep_id,
                   coalesce(c.keep_id, d.doc_id) = d.doc_id AS is_kept
            FROM documents d LEFT JOIN comp c USING (doc_id)
        """,
        "text_quality": rf"""
            WITH t AS (
              SELECT doc_id, text,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                     len(regexp_extract_all(lower(text), '{EN_PAT}')) AS stop_hits
              FROM documents)
            SELECT doc_id, n_tokens,
                   round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
                   round(stop_hits / greatest(n_tokens, 1), 4) AS stop_ratio,
                   (n_tokens >= 5
                    AND round(n_punct / greatest(n_chars, 1), 4) < 0.2
                    AND round((n_chars - n_tokens + 1) / greatest(n_tokens, 1), 4) > 2.0
                    AND round((n_chars - n_tokens + 1) / greatest(n_tokens, 1), 4) < 12.0) AS quality_ok
            FROM t
        """,
        "lang_id": rf"""
            WITH s AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '{EN_PAT}')) AS en,
                     len(regexp_extract_all(lower(text), '{ES_PAT}')) AS es,
                     len(regexp_extract_all(lower(text), '{FR_PAT}')) AS fr
              FROM documents)
            SELECT doc_id,
                   CASE WHEN greatest(en, es, fr) = 0 THEN 'und'
                        WHEN en = greatest(en, es, fr) THEN 'en'
                        WHEN es = greatest(en, es, fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                   len(string_split_regex(trim(text), '[\s.,;:!?()]+')) AS n_subwords,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'
                   )) AS n_gpt2_pieces
            FROM documents
        """,
        "bpe_token_count": _bpe_oracle_sql(),
        "gopher_quality": rf"""
            WITH t AS (
              SELECT doc_id, text,
                     string_split_regex(trim(text), '\s+') AS w,
                     string_split(text, chr(10)) AS lines
              FROM documents),
            s AS (
              SELECT doc_id, text, lines,
                     len(w) AS n_words,
                     greatest(len(lines), 1) AS n_lines,
                     CASE WHEN len(w) >= 3
                          THEN list_transform(generate_series(1, len(w) - 2),
                                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                          ELSE [] END AS grams
              FROM t)
            SELECT doc_id,
                   n_words::INTEGER AS n_words,
                   round((length(text) - n_words + 1) / greatest(n_words, 1), 4) AS mean_word_len,
                   round(len(regexp_extract_all(text, '#|\.\.\.|…')) / greatest(n_words, 1), 4) AS symbol_ratio,
                   round(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) / n_lines, 4) AS bullet_frac,
                   round(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) / n_lines, 4) AS ellipsis_frac,
                   len(regexp_extract_all(lower(text), '{EN_PAT}'))::INTEGER AS stop_hits,
                   round(CASE WHEN len(grams) > 0
                              THEN 1.0 - len(list_distinct(grams)) / len(grams)
                              ELSE 0.0 END, 4) AS dup_3gram_frac,
                   (n_words BETWEEN 10 AND 100000
                    AND round((length(text) - n_words + 1) / greatest(n_words, 1), 4) BETWEEN 2.0 AND 12.0
                    AND round(len(regexp_extract_all(text, '#|\.\.\.|…')) / greatest(n_words, 1), 4) < 0.1
                    AND round(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) / n_lines, 4) < 0.9
                    AND round(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) / n_lines, 4) < 0.3
                    AND len(regexp_extract_all(lower(text), '{EN_PAT}')) >= 2
                    AND round(CASE WHEN len(grams) > 0
                                   THEN 1.0 - len(list_distinct(grams)) / len(grams)
                                   ELSE 0.0 END, 4) < 0.3) AS gopher_ok
            FROM s
        """,
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id, lang AS shard,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens
              FROM documents)
            SELECT doc_id, shard, n_tokens::INTEGER AS n_tokens,
                   sum(n_tokens) OVER w::BIGINT AS cum_tokens,
                   floor((sum(n_tokens) OVER w - n_tokens) / 512.0)::BIGINT AS pack_id
            FROM t
            WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "sparql_bgp": """
            SELECT 'c:' || c_custkey AS c,
                   's:' || s_suppkey AS s,
                   n_name AS nm,
                   'r:' || n_regionkey AS r
            FROM customer
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN supplier ON s_nationkey = n_nationkey
            ORDER BY c, s LIMIT 500
        """,
        "sparql_optional": """
            SELECT 'n:' || n_nationkey AS n,
                   'r:' || n_regionkey AS r,
                   CASE WHEN s_suppkey IS NULL THEN NULL
                        ELSE 's:' || s_suppkey END AS s
            FROM nation
            LEFT JOIN (SELECT * FROM supplier WHERE s_suppkey < 5) sub
                   ON s_nationkey = n_nationkey
            ORDER BY n, s
        """,
        "sparql_filter": """
            SELECT 'n:' || n_nationkey AS n,
                   n_name AS nm,
                   'r:' || n_regionkey AS r
            FROM nation
            WHERE regexp_matches(n_name, '^[A-C]')
               OR ('r:' || n_regionkey = 'r:2' AND n_name <> 'CHINA')
            ORDER BY n
        """,
        "sparql_groupby": """
            SELECT 'n:' || s_nationkey AS n,
                   count(*)::BIGINT AS suppliers,
                   min('s:' || s_suppkey) AS first_supplier
            FROM supplier
            GROUP BY s_nationkey
            ORDER BY n
        """,
        "sparql_union": """
            SELECT p, r FROM (
              SELECT 'c:' || c_custkey AS p, 'r:' || n_regionkey AS r
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              UNION ALL
              SELECT 's:' || s_suppkey AS p, 'r:' || n_regionkey AS r
              FROM supplier JOIN nation ON s_nationkey = n_nationkey)
            ORDER BY p LIMIT 400
        """,
        "sparql_construct": """
            SELECT subj, pred, obj FROM (
              SELECT DISTINCT 'r:' || n_regionkey AS subj,
                     'urn:p:has_nation' AS pred,
                     'n:' || n_nationkey AS obj
              FROM nation
              UNION
              SELECT DISTINCT 'r:' || n_regionkey,
                     'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                     'urn:c:Region'
              FROM nation)
        """,
        "sparql_order_desc": """
            SELECT 'n:' || s_nationkey AS n, count(*)::BIGINT AS suppliers
            FROM supplier
            GROUP BY s_nationkey
            ORDER BY suppliers DESC, n ASC LIMIT 10
        """,
        "sparql_not_exists": """
            SELECT 'n:' || n_nationkey AS n, 'r:' || n_regionkey AS r
            FROM nation
            WHERE NOT EXISTS (
                SELECT 1 FROM supplier
                WHERE s_suppkey < 8 AND s_nationkey = n_nationkey)
            ORDER BY n
        """,
        "sparql_minus": """
            SELECT 'n:' || n_nationkey AS n, 'r:' || n_regionkey AS r
            FROM nation
            WHERE NOT EXISTS (
                SELECT 1 FROM supplier
                WHERE s_suppkey < 8 AND s_nationkey = n_nationkey)
            ORDER BY n
        """,
        "sparql_sum_avg": """
            SELECT 'n:' || c_nationkey AS n,
                   SUM(c_custkey)::DOUBLE AS sum_k,
                   AVG(c_custkey)::DOUBLE AS avg_k
            FROM customer GROUP BY c_nationkey ORDER BY n
        """,
        "sparql_filter_strfns": """
            SELECT 'n:' || n_nationkey AS n, n_name AS nm
            FROM nation
            WHERE starts_with(n_name, 'A')
               OR (contains(n_name, 'AN') AND NOT ends_with(n_name, 'A'))
            ORDER BY n
        """,
        "sparql_path_seq": """
            SELECT 'c:' || c_custkey AS c, 'r:' || n_regionkey AS r
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            ORDER BY c LIMIT 500
        """,
        "sparql_path_plus": """
            SELECT 'n:' || a.n_nationkey AS a, 'n:' || b.n_nationkey AS b
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey
             AND b.n_nationkey > a.n_nationkey
            ORDER BY a, b
        """,
        "sparql_path_alt": """
            SELECT 'c:' || c_custkey AS x, 'n:' || c_nationkey AS n FROM customer
            UNION ALL
            SELECT 's:' || s_suppkey AS x, 'n:' || s_nationkey AS n FROM supplier
        """,
        "sparql_path_star": """
            SELECT 'n:' || a.n_nationkey AS a, 'n:' || b.n_nationkey AS b
            FROM nation a JOIN nation b
              ON a.n_regionkey = b.n_regionkey
             AND b.n_nationkey > a.n_nationkey
            UNION ALL
            SELECT 'n:' || n.n_nationkey AS a, 'n:' || n.n_nationkey AS b
            FROM nation n
            WHERE (SELECT count(*) FROM nation x
                   WHERE x.n_regionkey = n.n_regionkey) > 1
        """,
        "sparql_bind": """
            SELECT 'n:' || n_nationkey AS n,
                   upper(n_name) || '/' || length(n_name) AS lbl
            FROM nation
        """,
        "sparql_str_extract": """
            SELECT 'n:' || n_nationkey AS n,
                   substr(n_name, instr(n_name, '_') + 1) AS num,
                   substr(n_name, 1, instr(n_name, '_') - 1) AS stem,
                   substr(n_name, 2, 3) AS abbr,
                   '' AS missing
            FROM nation
        """,
        "sparql_filter_numeric": """
            SELECT 'n:' || n_nationkey AS n, (n_nationkey * 5)::VARCHAR AS pop
            FROM nation
            WHERE n_nationkey * 5 > 59 AND (n_nationkey * 5)::VARCHAR <> '60'
        """,
        "sparql_strlang": """
            SELECT 'n:' || n_nationkey AS n, upper(n_name) AS u,
                   'en' AS lg,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString'
                     AS dt
            FROM nation ORDER BY n
        """,
        "sparql_datatype": """
            WITH e AS (
              SELECT 'n:' || n_nationkey AS n, 'urn:p:label' AS p,
                     n_name AS v,
                     'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString' AS dt
              FROM nation
              UNION ALL
              SELECT 'n:' || n_nationkey, 'urn:p:label', n_name || '!',
                     'http://www.w3.org/2001/XMLSchema#string'
              FROM nation
              UNION ALL
              SELECT 'n:' || n_nationkey, 'urn:p:ref', 'urn:x:' || n_name,
                     NULL
              FROM nation)
            SELECT n, p, v, dt FROM e ORDER BY n, p, v
        """,
        "sparql_lang": """
            SELECT 'n:' || n_nationkey AS n, n_name AS lbl, 'en' AS lg
            FROM nation
            UNION ALL
            SELECT 'n:' || n_nationkey AS n, n_name || '!' AS lbl, '' AS lg
            FROM nation
        """,
        "sparql_subquery_having": """
            SELECT 'n:' || n_nationkey AS n, cnt AS c
            FROM nation
            JOIN (SELECT s_nationkey, count(*)::BIGINT AS cnt
                  FROM supplier WHERE s_suppkey < 50 GROUP BY 1) x
              ON n_nationkey = s_nationkey
            WHERE cnt > 2
        """,
        "sparql_offset": """
            SELECT n_name AS nm FROM nation ORDER BY nm LIMIT 10 OFFSET 5
        """,
        "sparql_subquery": """
            SELECT 'c:' || c_custkey AS c, 'n:' || c_nationkey AS n, cnt
            FROM customer
            JOIN (SELECT c_nationkey, count(*)::BIGINT AS cnt
                  FROM customer GROUP BY 1) x USING (c_nationkey)
        """,
        "sparql_nested_groups": """
            SELECT 'c:' || c_custkey AS c, n_name AS x
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            UNION ALL
            SELECT 'c:' || c_custkey AS c, 'r:' || n_regionkey AS x
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
        "sparql_having_groupconcat": """
            SELECT 'r:' || n_regionkey AS r,
                   array_to_string(list_sort(list('n:' || n_nationkey)), ',') AS nations,
                   count(*)::BIGINT AS c,
                   min('n:' || n_nationkey) AS first
            FROM nation GROUP BY 1 HAVING count(*) > 1
        """,
        "sessionize_events": """
            WITH x AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
              FROM events
            ),
            s AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN pts IS NULL
                               OR (ts - pts) > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS ns
              FROM x
            ),
            q AS (
              SELECT user_id, event_id,
                     sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
              FROM s
            )
            SELECT user_id, event_id, session_seq,
                   user_id || '#' || session_seq AS session_id
            FROM q
        """,
        "sketch_distinct_sources": """
            SELECT lang, count(DISTINCT source)::BIGINT AS exact,
                   TRUE AS within_bounds
            FROM documents GROUP BY lang
        """,
        "sketch_quantiles": """
            SELECT lang, p::DOUBLE AS p, count(*)::BIGINT AS n_rows,
                   TRUE AS within_bounds
            FROM documents
            CROSS JOIN (VALUES (0.25), (0.5), (0.75), (0.95)) AS t(p)
            GROUP BY lang, p
        """,
        "graph_pagerank": """
            WITH RECURSIVE it AS (
              SELECT 0 AS t,
                     (1.0::DOUBLE/25) AS r0, (1.0::DOUBLE/25) AS r1,
                     (1.0::DOUBLE/25) AS r2, (1.0::DOUBLE/25) AS r3,
                     (1.0::DOUBLE/25) AS r4
              UNION ALL
              SELECT t + 1,
                ((1.0::DOUBLE - 0.85::DOUBLE)/25) + 0.85::DOUBLE * ((5*r4)/25),
                ((1.0::DOUBLE - 0.85::DOUBLE)/25) + 0.85::DOUBLE * (r0 + (5*r4)/25),
                ((1.0::DOUBLE - 0.85::DOUBLE)/25) + 0.85::DOUBLE * (r1 + (5*r4)/25),
                ((1.0::DOUBLE - 0.85::DOUBLE)/25) + 0.85::DOUBLE * (r2 + (5*r4)/25),
                ((1.0::DOUBLE - 0.85::DOUBLE)/25) + 0.85::DOUBLE * (r3 + (5*r4)/25)
              FROM it WHERE t < 10
            ),
            fin AS (SELECT * FROM it WHERE t = 10),
            pos AS (
              SELECT 'n:' || n_nationkey AS node,
                     (row_number() OVER (PARTITION BY n_regionkey
                                         ORDER BY n_nationkey) - 1) AS p
              FROM nation
            )
            SELECT node,
                   round(CASE p WHEN 0 THEN r0 WHEN 1 THEN r1 WHEN 2 THEN r2
                                WHEN 3 THEN r3 ELSE r4 END, 8) AS rank
            FROM pos, fin
        """,
        "graph_triangles": """
            WITH und AS (
              SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
              FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
              JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            )
            SELECT count(*)::BIGINT AS n_triangles
            FROM und ab
            JOIN und bc ON ab.b = bc.a
            JOIN und ac ON ab.a = ac.a AND bc.b = ac.b
        """,
        "graph_sssp": """
            SELECT 'n:' || n_nationkey AS node,
                   ((p * (p + 1)) / 2)::DOUBLE AS dist
            FROM (SELECT n_nationkey,
                         row_number() OVER (PARTITION BY n_regionkey
                                            ORDER BY n_nationkey) - 1 AS p
                  FROM nation)
        """,
        "scd2_history": """
            WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events),
            c AS (
              SELECT user_id, event_type AS state, ts AS valid_from, event_id
              FROM o WHERE prev IS NULL OR prev <> event_type)
            SELECT user_id, state, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY valid_from, event_id)
                     AS valid_to
            FROM c
        """,
        "graph_node_jaccard": """
            WITH e AS (SELECT DISTINCT l_partkey AS p, l_orderkey AS o
                       FROM lineitem),
            d AS (SELECT p, count(*)::BIGINT AS deg FROM e GROUP BY 1),
            c AS (SELECT a.p AS u, b.p AS v, count(*)::BIGINT AS common
                  FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
                  GROUP BY 1, 2)
            SELECT u, v, common,
                   round(common / (da.deg + db.deg - common)::DOUBLE, 8)::DOUBLE
                     AS jaccard
            FROM c JOIN d da ON c.u = da.p JOIN d db ON c.v = db.p
            WHERE common >= 3
        """,
        "graph_bfs": """
            WITH p AS (
              SELECT 'n:' || n_nationkey AS node,
                     row_number() OVER (PARTITION BY n_regionkey
                                        ORDER BY n_nationkey) - 1 AS pos,
                     count(*) OVER (PARTITION BY n_regionkey) AS cnt
              FROM nation
            )
            SELECT node, least(pos, cnt - 1 - pos)::INTEGER AS dist FROM p
        """,
        "graph_degree_stats": """
            WITH e AS (
              SELECT DISTINCT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
              FROM customer
              UNION
              SELECT DISTINCT 'n:' || n_nationkey AS src, 'r:' || n_regionkey AS dst
              FROM nation
            ),
            o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY 1),
            i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY 1)
            SELECT coalesce(o.node, i.node) AS node,
                   coalesce(out_deg, 0)::BIGINT AS out_deg,
                   coalesce(in_deg, 0)::BIGINT AS in_deg,
                   (coalesce(out_deg, 0) + coalesce(in_deg, 0))::BIGINT AS degree
            FROM o FULL JOIN i ON o.node = i.node
        """,
        "url_normalize": """
            WITH u AS (
              SELECT doc_id, (doc_id // 8)::VARCHAR AS k, doc_id % 4 AS v
              FROM documents
            ),
            n AS (
              SELECT doc_id,
                CASE v
                  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/a/b/?x=2&utm_source=tw&a=1&id=' || k || '#frag'
                  WHEN 1 THEN 'https://example.com/a/b?id=' || k || '&a=1&x=2'
                  WHEN 2 THEN 'http://example.com/a/b?a=1&x=2&id=' || k || '&fbclid=abc'
                  ELSE 'https://sub.example.org:8443/p/?gclid=zz&id=' || k
                END AS url,
                CASE WHEN v IN (0, 2) THEN 'http://example.com/a/b?a=1&id=' || k || '&x=2'
                     WHEN v = 1 THEN 'https://example.com/a/b?a=1&id=' || k || '&x=2'
                     ELSE 'https://sub.example.org:8443/p?id=' || k
                END AS norm_url
              FROM u)
            SELECT doc_id, url, norm_url,
                   doc_id = min(doc_id) OVER (PARTITION BY norm_url) AS is_canonical
            FROM n
        """,
        "sparql_path_neg": """
            SELECT 's:' || s_suppkey AS x, 'n:' || s_nationkey AS n FROM supplier
        """,
        "sparql_describe": """
            SELECT 'n:' || n_nationkey AS subj, 'urn:p:name' AS pred,
                   n_name AS obj
            FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT 'n:' || n_nationkey AS subj, 'urn:p:region' AS pred,
                   'r:0' AS obj
            FROM nation WHERE n_regionkey = 0
        """,
        "sample_mixture": """
            WITH w(lang, w) AS (VALUES ('en', 0.5::DOUBLE), ('de', 0.25::DOUBLE), ('fr', 0.25::DOUBLE)),
            c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            s AS (SELECT min(n / w) AS s FROM c JOIN w USING (lang)),
            r AS (
              SELECT lang,
                     round(w * s.s / n, 6) AS mix_rate,
                     floor(w * s.s / n * 4294967296.0)::BIGINT AS thresh
              FROM c JOIN w USING (lang), s)
            SELECT d.doc_id, d.lang, r.mix_rate
            FROM documents d JOIN r USING (lang)
            WHERE (('0x' || substr(md5(d.doc_id::VARCHAR || ':42'), 1, 8))::UBIGINT)::BIGINT < r.thresh
        """,
        "percentile_filter": """
            WITH r AS (
              SELECT doc_id, lang, n_chars,
                     percent_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS pr
              FROM documents)
            SELECT doc_id, lang, n_chars, round(pr, 6) AS score_rank
            FROM r WHERE pr < 0.3
        """,
        "split_assign": """
            WITH b AS (
              SELECT doc_id,
                     (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS split_bucket
              FROM documents)
            SELECT doc_id, split_bucket,
                   CASE WHEN split_bucket < 90 THEN 'train'
                        WHEN split_bucket < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "scrub_pii": r"""
            WITH s AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id || '@example.org or https://ex.org/d/' || doc_id AS text
              FROM documents),
            m AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                     regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS no_mail
              FROM s)
            SELECT doc_id,
                   regexp_replace(no_mail, 'https?://[^\s]+', '<URL>', 'g') AS clean_text,
                   (n_emails + len(regexp_extract_all(no_mail, 'https?://[^\s]+')))::INTEGER AS n_redactions
            FROM m
        """,
        # planted-duplicate verdicts: the oracle states the ground truth the
        # hash-seeded operators MUST recover (see PLANT_OFFSET note above)
        "dedup_minhash_lsh": f"""
            SELECT doc_id AS orig_id, doc_id + {PLANT_OFFSET} AS copy_id,
                   1.0::DOUBLE AS sig_jaccard, true AS found
            FROM documents WHERE doc_id % 10 = 0
        """,
        "dedup_simhash": f"""
            SELECT doc_id AS orig_id, doc_id + {PLANT_OFFSET} AS copy_id,
                   0::INTEGER AS hamming, true AS found
            FROM documents WHERE doc_id % 10 = 0
        """,
        "doc_fingerprint": f"""
            SELECT doc_id AS orig_id, doc_id + {PLANT_OFFSET} AS copy_id,
                   true AS fp_match,
                   (SELECT count(DISTINCT text) FROM documents)::BIGINT AS n_distinct_fp
            FROM documents WHERE doc_id % 10 = 0
        """,
        # the banded LSH restated with literal hyperplanes: per-band buckets,
        # per-(band,bucket) size cap, cross-band candidate dedup, exact verify
        # — exact replay of the Spark operator's plan
        "dedup_embedding": f"""
            WITH allv AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + {EMB_PLANT_OFFSET}, embedding FROM embeddings WHERE vec_id % 10 = 0),
            bb AS ({" UNION ALL ".join(
                f"SELECT vec_id, {k} AS band, ({_band_bucket_sql(k)}) AS bucket FROM allv"
                for k in range(_DEDUP_N_BANDS))}),
            capped AS (
              SELECT vec_id, band, bucket FROM (
                SELECT vec_id, band, bucket,
                       count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bb)
              WHERE bsz <= 1000),
            cand AS (
              SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM capped a JOIN capped b
                ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
            SELECT c.vec_a, c.vec_b,
                   round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) AS cosine
            FROM cand c
            JOIN allv ea ON ea.vec_id = c.vec_a
            JOIN allv eb ON eb.vec_id = c.vec_b
            WHERE round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) >= 0.95
        """,
        "ann_lsh_topk": f"""
            WITH b AS (SELECT vec_id, embedding, ({_bucket_sql()}) AS bucket FROM embeddings)
            SELECT vec_id, round(list_dot_product(embedding::DOUBLE[], {QUERY_VEC_SQL}), 4) AS score
            FROM b WHERE bucket IN ({_probe_bucket_sql(QUERY_VEC, probe_bits=2)})
            ORDER BY score DESC, vec_id LIMIT 10
        """,
        "media_features": """
            SELECT printf('M%05d_%d', d.g, m.g) AS media_id,
                   printf('D%07d', d.g) AS doc_id,
                   CASE WHEN m.g = 0 THEN 'image' ELSE 'audio' END AS kind,
                   16::INTEGER AS dim, true AS unit_norm
            FROM generate_series(0, 29) d(g), generate_series(0, 1) m(g)
        """,
        "media_png_decode": """
            WITH px AS (
                SELECT d.g AS d, x.g AS x, y.g AS y, (2*d.g) % 251 AS base
                FROM generate_series(0, 29) d(g),
                     generate_series(0, 63) x(g),
                     generate_series(0, 47) y(g)
            )
            SELECT printf('M%05d_0', d) AS media_id,
                   64::INTEGER AS width, 48::INTEGER AS height,
                   round(avg((x + y + base) % 256), 4) AS mean_r,
                   round(avg((2*x + base) % 256), 4) AS mean_g,
                   round(avg((3*y + base) % 256), 4) AS mean_b
            FROM px GROUP BY d
        """,
        "fuzzy_match_edit1": """
            WITH names AS (SELECT DISTINCT n_name AS a FROM nation),
            noisy AS (
              SELECT substr(n_name, 1, (n_nationkey % length(n_name)))
                     || substr(n_name, (n_nationkey % length(n_name)) + 2) AS b
              FROM nation
              UNION ALL
              SELECT p_type AS b FROM part WHERE p_partkey <= 50
            )
            SELECT DISTINCT a AS dict_surface, b AS noisy_surface
            FROM names, noisy WHERE levenshtein(a, b) <= 1
        """,
        "inverted_index": r"""
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(lower(text), '\W+') AS l
              FROM documents),
            raw AS (
              SELECT doc_id, l[i] AS term, i
              FROM w, unnest(generate_series(1, len(l))) t(i)
              WHERE l[i] <> ''),
            toks AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos
              FROM raw),
            p AS (
              SELECT term, doc_id,
                     array_to_string(list(pos ORDER BY pos), ',') AS positions
              FROM toks GROUP BY 1, 2),
            d AS (SELECT term, count(*)::BIGINT AS df_docs FROM p GROUP BY 1)
            SELECT term, df_docs, doc_id, positions
            FROM p JOIN d USING (term) WHERE df_docs <= 400
        """,
        "phrase_search": r"""
            WITH w AS (
              SELECT doc_id, regexp_split_to_array(lower(text), '\W+') AS l
              FROM documents),
            raw AS (
              SELECT doc_id, l[i] AS term, i
              FROM w, unnest(generate_series(1, len(l))) t(i)
              WHERE l[i] <> ''),
            toks AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos
              FROM raw),
            m AS (
              SELECT a.doc_id, a.pos
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              WHERE a.term = 'fast' AND b.term = 'table')
            SELECT doc_id, count(*)::INTEGER AS n_hits,
                   min(pos)::INTEGER AS first_pos
            FROM m GROUP BY doc_id
        """,
        "asof_join_events": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 r AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id, l.ts,
                   r.event_id AS prior_purchase_id,
                   r.value AS prior_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "interval_overlap": """
            WITH l AS (SELECT user_id, event_id AS click_id, ts AS s,
                              ts + INTERVAL 30 MINUTE AS e
                       FROM events WHERE event_type = 'click'),
                 r AS (SELECT user_id, event_id AS error_id, ts AS s,
                              ts + INTERVAL 30 MINUTE AS e
                       FROM events WHERE event_type = 'error')
            SELECT l.user_id, click_id, error_id
            FROM l JOIN r ON l.user_id = r.user_id
                         AND l.s <= r.e AND r.s <= l.e
        """,
        "bm25_rank": r"""
            WITH toks AS (
              SELECT doc_id, t.tok AS term
              FROM documents,
                   unnest(regexp_split_to_array(lower(text), '\W+')) t(tok)
              WHERE t.tok <> ''),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
            stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
                   WHERE term IN ('hash', 'join', 'stream') GROUP BY 1, 2),
            dft AS (SELECT term, count(*)::BIGINT AS df_t FROM tf GROUP BY 1),
            c AS (
              SELECT tf.doc_id,
                     (ln(1.0::DOUBLE + ((n_docs - df_t) + 0.5::DOUBLE)
                                       / (df_t + 0.5::DOUBLE))
                      * (tf * (1.2::DOUBLE + 1)))
                     / (tf + 1.2::DOUBLE
                             * ((1 - 0.75::DOUBLE)
                                + (0.75::DOUBLE * dl) / avgdl)) AS contrib
              FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
              CROSS JOIN stats)
            SELECT doc_id, count(*)::INTEGER AS n_matched,
                   round(sum(contrib), 8)::DOUBLE AS score
            FROM c GROUP BY doc_id
        """,
        "bigram_lm": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\W+'),
                                 x -> x <> '') AS l
              FROM documents),
            bg AS (
              SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
              FROM w, unnest(generate_series(1, len(l) - 1)) t(i)
              WHERE len(l) >= 2),
            c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2),
            c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY 1),
            v AS (SELECT count(DISTINCT term)::BIGINT AS v
                  FROM (SELECT unnest(l) AS term FROM w)),
            s AS (
              SELECT doc_id,
                     ln((c12 + 1)::DOUBLE / (c1 + v)) AS lp
              FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
            SELECT doc_id, count(*)::INTEGER AS n_bigrams,
                   round(avg(lp), 8)::DOUBLE AS avg_logp
            FROM s GROUP BY doc_id
        """,
        "tfidf_topk": """
            WITH toks AS (
              SELECT doc_id, t.tok AS term
              FROM documents,
                   unnest(regexp_split_to_array(lower(text), '\\W+')) t(tok)
              WHERE t.tok <> ''
            ),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM toks GROUP BY 1, 2),
            dft AS (SELECT term, count(*)::BIGINT AS df_t FROM tf GROUP BY 1),
            n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
            s AS (
              SELECT doc_id, term, tf, df_t,
                     tf * ln((n_docs + 1)::DOUBLE / (df_t + 1)) AS score
              FROM tf JOIN dft USING (term) CROSS JOIN n
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term) AS rn
              FROM s)
            SELECT doc_id, term, tf, df_t, round(score, 8)::DOUBLE AS score
            FROM r WHERE rn <= 5
        """,
        "token_freq_score": """
            WITH toks AS (
              SELECT doc_id, t.tok AS w
              FROM documents,
                   unnest(regexp_split_to_array(lower(text), '\\W+')) t(tok)
              WHERE t.tok <> ''
            ),
            cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w)
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   round(sum(c) / count(*), 6) AS mean_token_freq
            FROM toks JOIN cnt USING (w) GROUP BY doc_id
        """,
        "media_resample_audio": """
            WITH s AS (
                SELECT d.g AS d, i.g AS i,
                       ((2*i.g * (3 + d.g) + 17*d.g + 1) % 4096) - 2048 AS v
                FROM generate_series(0, 29) d(g), generate_series(0, 1999) i(g)
            )
            SELECT printf('M%05d_1', d) AS media_id,
                   2000::INTEGER AS out_samples,
                   4000::INTEGER AS out_rate,
                   round(avg(abs(v)), 4) AS mean_abs
            FROM s GROUP BY d
        """,
        "media_resize_real": """
            WITH px AS (
                SELECT d.g AS d, x.g AS x, y.g AS y, (2*d.g) % 251 AS base
                FROM generate_series(0, 29) d(g),
                     generate_series(0, 31) x(g),
                     generate_series(0, 23) y(g)
            )
            SELECT printf('M%05d_0', d) AS media_id,
                   32::INTEGER AS out_w, 24::INTEGER AS out_h,
                   round(avg((2*x + 2*y + base) % 256), 4) AS mean_r,
                   round(avg((4*x + base) % 256), 4) AS mean_g,
                   round(avg((6*y + base) % 256), 4) AS mean_b
            FROM px GROUP BY d
        """,
        "media_video_decode": """
            WITH px AS (
                SELECT d.g AS d, f.g AS f, x.g AS x, y.g AS y,
                       (2*d.g + 2) % 251 AS base
                FROM generate_series(0, 29) d(g), generate_series(0, 3) f(g),
                     generate_series(0, 31) x(g), generate_series(0, 23) y(g)
            )
            SELECT printf('M%05d_2', d) AS media_id,
                   4::INTEGER AS n_frames,
                   32::INTEGER AS width, 24::INTEGER AS height,
                   f::INTEGER AS frame_idx,
                   round(avg((x + 2*f + base) % 256), 4) AS mean_r,
                   round(avg((y + 3*f + base) % 256), 4) AS mean_g,
                   round(avg((x + y + f + base) % 256), 4) AS mean_b
            FROM px GROUP BY d, f
        """,
        "media_wav_decode": """
            WITH s AS (
                SELECT d.g AS d, i.g AS i,
                       ((i.g * (3 + d.g) + 17*d.g + 1) % 4096) - 2048 AS v
                FROM generate_series(0, 29) d(g), generate_series(0, 3999) i(g)
            ),
            x AS (
                SELECT d, v, lag(v) OVER (PARTITION BY d ORDER BY i) AS pv
                FROM s
            )
            SELECT printf('M%05d_1', d) AS media_id,
                   4000::INTEGER AS n_samples,
                   8000::INTEGER AS sample_rate,
                   500::INTEGER AS duration_payload_ms,
                   round(avg(abs(v)), 4) AS mean_abs,
                   (count(*) FILTER (pv IS NOT NULL AND (v < 0) != (pv < 0)))::INTEGER
                       AS zero_crossings
            FROM x GROUP BY d
        """,
        "kmeans_assign": """
            WITH c AS (
              SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
              FROM embeddings ORDER BY vec_id LIMIT 4
            ),
            d AS (
              SELECT e.vec_id, c.cid,
                     list_distance(e.embedding::DOUBLE[], c.cv) AS dist
              FROM embeddings e CROSS JOIN c
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) AS rn
              FROM d)
            SELECT vec_id, cid::INTEGER AS cluster,
                   round(dist, 6)::DOUBLE AS dist
            FROM r WHERE rn = 1
        """,
        "quantize_embeddings": """
            WITH s AS (
                SELECT vec_id, embedding,
                       CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
                            THEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
                            ELSE 1.0 END AS raw_scale
                FROM embeddings),
            c AS (
                SELECT vec_id, raw_scale, embedding,
                       list_transform(embedding,
                           x -> floor(x::DOUBLE / raw_scale + 0.5)::INTEGER) AS codes
                FROM s)
            SELECT vec_id,
                   round(raw_scale, 6) AS scale,
                   round(list_max(list_transform(generate_series(1, len(codes)),
                       i -> abs(codes[i]::DOUBLE * raw_scale - embedding[i]::DOUBLE))), 6)
                       AS recon_err,
                   (u.i - 1)::INTEGER AS dim,
                   codes[u.i] AS code
            FROM c, unnest(generate_series(1, len(codes))) u(i)
        """,
        "cap_per_source": """
            SELECT doc_id, source, kept_rank FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(doc_id::VARCHAR || ':cap'), doc_id
                       )::INTEGER AS kept_rank
                FROM documents)
            WHERE kept_rank <= 40
        """,
        "media_mp4_meta": """
            SELECT printf('M%05d_2', d.g) AS media_id,
                   'isom' AS brand,
                   1000::INTEGER AS timescale,
                   3000::INTEGER AS duration_payload_ms
            FROM generate_series(0, 29) d(g)
        """,
        "media_frame_sample": """
            SELECT printf('M%05d_1', d.g) AS media_id,
                   printf('D%07d', d.g) AS doc_id,
                   'audio' AS kind,
                   (f.g * 500)::INTEGER AS frame_ms
            FROM generate_series(0, 29) d(g), generate_series(0, 4) f(g)
        """,
        "kg_pipeline_edges": _kg_expected_sql(),
        "kg_pipeline_salted_edges": _kg_expected_sql(),
        "kg_pipeline_heur_edges": _kg_expected_sql(heuristic_ner=True),
    }
    # the Bloom prefilter provably cannot change the report (false
    # positives die in the exact join) — the oracle IS decontam_report's
    sqls["decontam_bloom"] = sqls["decontam_report"]
    sqls["graph_kcore"] = _kcore_oracle_sql(k=6, rounds=16)
    sqls["graph_ktruss"] = _ktruss_oracle_sql(k=6, rounds=8)
    sqls["graph_hits"] = _hits_oracle_sql(iterations=10)
    sqls["graph_modularity"] = """
        WITH ch AS (
          SELECT 'n:' || n_nationkey AS src, 'n:' || nxt AS dst
          FROM (SELECT n_nationkey,
                       lead(n_nationkey) OVER (PARTITION BY n_regionkey
                                               ORDER BY n_nationkey) AS nxt
                FROM nation)
          WHERE nxt IS NOT NULL),
        cust AS (
          SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
          FROM customer),
        raw AS (SELECT src, dst FROM ch UNION ALL SELECT src, dst FROM cust),
        und AS (
          SELECT src, dst FROM (
            SELECT src, dst FROM raw UNION SELECT dst, src FROM raw)
          WHERE src <> dst),
        cmap AS (
          SELECT 'n:' || n_nationkey AS n,
                 'm:' || (n_nationkey % 2) AS c
          FROM nation),
        tagged AS (
          SELECT coalesce(cs.c, '_singleton:' || u.src) AS c_src,
                 coalesce(cd.c, '_singleton:' || u.dst) AS c_dst
          FROM und u
          LEFT JOIN cmap cs ON u.src = cs.n
          LEFT JOIN cmap cd ON u.dst = cd.n),
        per_c AS (
          SELECT c_src AS c, count(*)::BIGINT AS d_c,
                 sum(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END)::BIGINT
                   AS intra_half
          FROM tagged GROUP BY 1),
        tot AS (SELECT sum(d_c)::BIGINT AS two_m FROM per_c)
        SELECT count(*)::INTEGER AS n_communities,
               (sum(intra_half) / 2)::BIGINT AS intra_edges,
               (min(two_m) / 2)::BIGINT AS total_edges,
               round(sum(intra_half / two_m::DOUBLE
                         - (d_c / two_m::DOUBLE) * (d_c / two_m::DOUBLE)),
                     8)::DOUBLE AS modularity
        FROM per_c CROSS JOIN tot
    """
    sqls["pmi_collocations"] = r"""
        WITH w AS (
          SELECT list_filter(regexp_split_to_array(lower(text), '\W+'),
                             x -> x <> '') AS l
          FROM documents),
        bg AS (
          SELECT l[i] AS w1, l[i + 1] AS w2
          FROM w, unnest(generate_series(1, len(l) - 1)) t(i)
          WHERE len(l) >= 2),
        p AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY 1, 2
              HAVING count(*) >= 5),
        toks AS (SELECT unnest(l) AS term FROM w),
        uni AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY 1),
        tot AS (SELECT count(*)::BIGINT AS t FROM toks)
        SELECT w1, w2, c12,
               round(ln((c12 * t) / (u1.c * u2.c)::DOUBLE), 8)::DOUBLE AS pmi
        FROM p JOIN uni u1 ON p.w1 = u1.term
               JOIN uni u2 ON p.w2 = u2.term
               CROSS JOIN tot
        ORDER BY pmi DESC, c12 DESC, w1, w2
        LIMIT 40
    """
    sqls["rollup_events"] = """
        SELECT event_type, user_id % 10 AS user_bucket,
               GROUPING(event_type, user_id % 10)::BIGINT AS gid,
               count(*)::BIGINT AS n
        FROM events GROUP BY ROLLUP (event_type, user_id % 10)
    """
    sqls["cube_events"] = """
        SELECT event_type, user_id % 10 AS user_bucket,
               GROUPING(event_type, user_id % 10)::BIGINT AS gid,
               count(*)::BIGINT AS n
        FROM events GROUP BY CUBE (event_type, user_id % 10)
    """
    sqls["pivot_event_counts"] = """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')::BIGINT AS click,
               count(*) FILTER (WHERE event_type = 'error')::BIGINT AS error,
               count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchase,
               count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS signup,
               count(*) FILTER (WHERE event_type = 'view')::BIGINT AS view
        FROM events GROUP BY user_id
    """
    sqls["merge_upsert"] = """
        WITH t AS (
          SELECT o_orderkey, o_custkey, o_totalprice, 0 AS version, 0 AS prov
          FROM orders),
        s AS (
          SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice,
                 1 AS version, 1 AS prov
          FROM orders WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000, o_custkey, o_totalprice,
                 1 AS version, 1 AS prov
          FROM orders WHERE o_orderkey % 13 = 0),
        u AS (SELECT * FROM t UNION ALL SELECT * FROM s)
        SELECT o_orderkey, o_custkey, o_totalprice, version FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                       ORDER BY version DESC, prov DESC) AS rn
          FROM u)
        WHERE rn = 1
    """
    sqls["dedup_sentences"] = r"""
        SELECT doc_id,
               len(l)::INTEGER AS n_sentences,
               len(kept)::INTEGER AS n_kept,
               array_to_string(kept, ' ') AS text_deduped
        FROM (
          SELECT doc_id, l,
                 list_filter(l, (x, i) -> list_position(l[1:i-1], x) = 0)
                   AS kept
          FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[.!?]+\s+'),
                               x -> x <> '') AS l
            FROM documents))
    """
    sqls["sample_stratified"] = """
        SELECT doc_id, lang, source FROM documents
        WHERE substr(md5(doc_id::VARCHAR), 1, 8) <
              CASE lang WHEN 'en' THEN '4ccccccc'
                        WHEN 'zh' THEN '80000000'
                        ELSE 'g' END
    """
    sqls["graph_link_prediction"] = """
        WITH e AS MATERIALIZED (
          SELECT DISTINCT 'p:' || l_partkey AS src, 'o:' || l_orderkey AS dst
          FROM lineitem),
        und AS MATERIALIZED (
          SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        deg AS MATERIALIZED (
          SELECT src AS center, count(*)::BIGINT AS cdeg FROM und GROUP BY 1),
        adj AS MATERIALIZED (
          SELECT u.dst AS center, u.src AS node
          FROM und u JOIN deg d ON u.dst = d.center
          WHERE d.cdeg <= 30),
        w AS (
          SELECT a.node AS u, b.node AS v, d.cdeg
          FROM adj a JOIN adj b ON a.center = b.center AND a.node < b.node
          JOIN deg d ON d.center = a.center),
        s AS (
          SELECT u, v, count(*)::BIGINT AS common,
                 round(sum(1.0 / ln(cdeg)), 8)::DOUBLE AS adamic_adar
          FROM w GROUP BY 1, 2 HAVING count(*) >= 3)
        SELECT s.u, s.v, s.common, s.adamic_adar
        FROM s LEFT JOIN und ON s.u = und.src AND s.v = und.dst
        WHERE und.src IS NULL
        ORDER BY s.adamic_adar DESC, s.common DESC, s.u, s.v
        LIMIT 100
    """
    sqls["event_rate_anomaly"] = """
        WITH h AS (
          SELECT user_id AS "user", date_trunc('hour', ts) AS hour,
                 count(*)::BIGINT AS n
          FROM events GROUP BY 1, 2),
        m AS (
          SELECT "user", count(*)::BIGINT AS k, sum(n)::BIGINT AS sx,
                 sum(n * n)::BIGINT AS sxx
          FROM h GROUP BY 1)
        SELECT "user", hour, n, z FROM (
          SELECT h."user", h.hour, h.n,
                 round((h.n - sx / k)
                       / sqrt((sxx - (sx * sx) / k) / (k - 1)), 8)::DOUBLE AS z
          FROM h JOIN m ON h."user" = m."user"
          WHERE k >= 3 AND (sxx - (sx * sx) / k) / (k - 1) > 0)
        WHERE abs(z) > 2.5
    """
    sqls["rolling_stats"] = """
        SELECT user_id, ts, event_id,
               count(*) OVER w AS roll_n,
               round(sum(value) OVER w, 8)::DOUBLE AS roll_sum,
               round(avg(value) OVER w, 8)::DOUBLE AS roll_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """
    sqls["ntile_deciles"] = """
        SELECT doc_id, n_chars,
               NTILE(10) OVER (ORDER BY n_chars, doc_id)::INTEGER AS bucket
        FROM documents
    """
    sqls["sparql_update"] = """
        SELECT 'n:' || n_nationkey AS subj, 'urn:p:region' AS pred,
               'r:' || n_regionkey AS obj
        FROM nation
        UNION ALL
        SELECT 'n:0', 'urn:p:flag', 'zero'
    """
    sqls["token_entropy"] = r"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(text), '\W+'),
                   x -> x <> '')) AS term
          FROM documents),
        c AS (SELECT doc_id, term, count(*)::BIGINT AS c
              FROM toks GROUP BY 1, 2),
        n AS (SELECT doc_id, term, c, sum(c) OVER (PARTITION BY doc_id) AS n
              FROM c)
        SELECT doc_id, max(n)::INTEGER AS n_tokens,
               count(*)::INTEGER AS n_distinct,
               round(-sum((c / n::DOUBLE) * ln(c / n::DOUBLE)), 8)::DOUBLE
                 AS entropy
        FROM n GROUP BY doc_id
    """
    sqls["flesch_reading_ease"] = r"""
        WITH base AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(text, '[.!?]+\s+'),
                                 x -> x <> ''))::INTEGER AS n_sentences,
                 list_filter(regexp_split_to_array(lower(text), '\W+'),
                             x -> x <> '') AS words
          FROM documents),
        cnt AS (
          SELECT doc_id, n_sentences, len(words)::INTEGER AS n_words,
                 list_sum(list_transform(words,
                   w -> len(list_filter(
                          regexp_split_to_array(w, '[^aeiouy]+'),
                          s -> s <> ''))))::INTEGER AS n_syllables
          FROM base)
        SELECT doc_id, n_sentences, n_words, n_syllables,
               round(206.835::DOUBLE
                     - 1.015::DOUBLE * (n_words / n_sentences::DOUBLE)
                     - 84.6::DOUBLE * (n_syllables / n_words::DOUBLE),
                     8)::DOUBLE AS flesch
        FROM cnt WHERE n_sentences > 0 AND n_words > 0
    """
    sqls["key_skew_report"] = """
        WITH c AS (SELECT l_partkey AS k, count(*)::BIGINT AS c
                   FROM lineitem GROUP BY 1)
        SELECT (length(bin(c)) - 1)::INTEGER AS bucket,
               count(*)::BIGINT AS n_keys, sum(c)::BIGINT AS n_rows,
               min(c)::BIGINT AS min_count, max(c)::BIGINT AS max_count
        FROM c GROUP BY 1
    """
    sqls["zorder_key"] = _zorder_oracle_sql(bits=16)
    sqls["funnel_stages"] = """
        WITH seq AS (
          SELECT user_id AS "user",
                 list(event_type ORDER BY ts, event_id) AS s
          FROM events GROUP BY 1),
        p AS (SELECT "user", s, list_position(s, 'view') AS p1 FROM seq),
        q AS (SELECT "user", s, p1,
                     CASE WHEN p1 = 0 THEN 0
                          ELSE list_position(s[p1 + 1:], 'click') END AS r2
              FROM p),
        r AS (SELECT "user", p1, r2,
                     CASE WHEN r2 = 0 THEN 0
                          ELSE list_position(s[p1 + r2 + 1:], 'purchase') END
                       AS r3
              FROM q)
        SELECT "user",
               (CASE WHEN p1 = 0 THEN 0
                     WHEN r2 = 0 THEN 1
                     WHEN r3 = 0 THEN 2
                     ELSE 3 END)::INTEGER AS reached
        FROM r
    """
    sqls["cohort_retention"] = """
        WITH weeks AS (
          SELECT DISTINCT user_id AS u,
                 date_trunc('week', ts)::DATE AS week
          FROM events),
        first AS (SELECT u, min(week) AS cohort_week FROM weeks GROUP BY 1)
        SELECT cohort_week::VARCHAR AS cohort_week,
               (datediff('day', cohort_week, week) / 7)::INTEGER
                 AS week_offset,
               count(*)::BIGINT AS n_users
        FROM weeks JOIN first USING (u)
        GROUP BY 1, 2
    """
    sqls["state_dwell_time"] = """
        WITH o AS (
          SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events),
        c AS (
          SELECT user_id, event_type AS state, ts AS valid_from, event_id
          FROM o WHERE prev IS NULL OR prev <> event_type),
        h AS (
          SELECT user_id, state, valid_from,
                 lead(valid_from) OVER (PARTITION BY user_id
                                        ORDER BY valid_from, event_id)
                   AS valid_to
          FROM c),
        closed AS (
          SELECT user_id AS key, state,
                 (epoch_us(valid_to) - epoch_us(valid_from))::BIGINT AS us
          FROM h WHERE valid_to IS NOT NULL),
        per AS (
          SELECT key, state, count(*)::INTEGER AS n_intervals,
                 sum(us)::BIGINT AS total_micros
          FROM closed GROUP BY 1, 2)
        SELECT key, state, n_intervals, total_micros,
               round(total_micros
                     / (sum(total_micros) OVER (PARTITION BY key))::DOUBLE,
                     8)::DOUBLE AS share
        FROM per
    """
    sqls["rrf_fusion"] = f"""
        WITH bm AS ({sqls["bm25_rank"]}),
        fl AS ({sqls["bigram_lm"]}),
        ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
                         AS rank_a FROM bm),
        rb AS (SELECT doc_id, row_number() OVER (ORDER BY avg_logp DESC, doc_id)
                         AS rank_b FROM fl)
        SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id, rank_a, rank_b,
               round(coalesce(1.0::DOUBLE / (rank_a + 60), 0.0::DOUBLE)
                     + coalesce(1.0::DOUBLE / (rank_b + 60), 0.0::DOUBLE),
                     8)::DOUBLE AS rrf
        FROM ra FULL JOIN rb USING (doc_id)
        ORDER BY rrf DESC, doc_id
        LIMIT 50
    """
    sqls["sample_weighted"] = """
        SELECT doc_id, n_chars::DOUBLE AS weight,
               round(pow((('0x' || substr(md5(doc_id::VARCHAR || ':wrs'),
                                          1, 8))::BIGINT + 1)
                         / 4294967296.0::DOUBLE,
                         1.0::DOUBLE / n_chars::DOUBLE),
                     8)::DOUBLE AS key
        FROM documents
        WHERE n_chars > 0
        ORDER BY key DESC, doc_id
        LIMIT 64
    """
    sqls["unpivot_measures"] = """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               l_quantity::DOUBLE AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               l_extendedprice::DOUBLE FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
               l_discount::DOUBLE FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax',
               l_tax::DOUBLE FROM lineitem
    """
    sqls["sparql_numeric_fns"] = """
        SELECT 'o:' || o_orderkey AS o,
               floor(o_totalprice)::BIGINT::VARCHAR AS f,
               ceil(o_totalprice)::BIGINT::VARCHAR AS c,
               round(o_totalprice)::DOUBLE::VARCHAR AS r,
               abs((-o_custkey)::DOUBLE)::VARCHAR AS a
        FROM orders
    """
    sqls["prep_pipeline"] = """
        WITH kept AS (
          SELECT doc_id, text, n_chars
          FROM documents
          WHERE lang = 'en' AND n_chars BETWEEN 50 AND 400),
        dd AS (
          SELECT doc_id, n_chars,
                 row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) AS rn
          FROM kept)
        SELECT doc_id, n_chars,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, n_chars,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                       % 100 AS b
              FROM dd WHERE rn = 1)
    """
    sqls["winsorize"] = """
        WITH pct AS (
          SELECT o_orderpriority AS grp,
                 round(quantile_cont(o_totalprice, 0.01), 6) AS lo,
                 round(quantile_cont(o_totalprice, 0.99), 6) AS hi
          FROM orders GROUP BY 1)
        SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
               p.lo, p.hi,
               least(greatest(o.o_totalprice, p.lo), p.hi) AS clipped
        FROM orders o JOIN pct p ON o.o_orderpriority = p.grp
    """
    sqls["graph_katz"] = """
        WITH RECURSIVE it AS (
          SELECT 0 AS t, 1.0::DOUBLE AS r0, 1.0::DOUBLE AS r1,
                 1.0::DOUBLE AS r2, 1.0::DOUBLE AS r3, 1.0::DOUBLE AS r4
          UNION ALL
          SELECT t + 1,
            1.0::DOUBLE,
            1.0::DOUBLE + 0.1::DOUBLE * r0,
            1.0::DOUBLE + 0.1::DOUBLE * r1,
            1.0::DOUBLE + 0.1::DOUBLE * r2,
            1.0::DOUBLE + 0.1::DOUBLE * r3
          FROM it WHERE t < 10),
        fin AS (SELECT * FROM it WHERE t = 10),
        pos AS (
          SELECT 'n:' || n_nationkey AS node,
                 (row_number() OVER (PARTITION BY n_regionkey
                                     ORDER BY n_nationkey) - 1) AS p
          FROM nation)
        SELECT node,
               round(CASE p WHEN 0 THEN r0 WHEN 1 THEN r1 WHEN 2 THEN r2
                            WHEN 3 THEN r3 ELSE r4 END, 8) AS katz
        FROM pos, fin
    """
    sqls["table_diff"] = """
        WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p
                   FROM orders WHERE o_orderkey % 3 <> 0),
        n AS (SELECT o_orderkey AS k, o_orderstatus AS s,
                     CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
                          ELSE o_totalprice END AS p
              FROM orders WHERE o_orderkey % 5 <> 0),
        j AS (
          SELECT coalesce(o.k, n.k) AS o_orderkey,
                 CASE WHEN o.k IS NULL THEN 'I'
                      WHEN n.k IS NULL THEN 'D'
                      WHEN (o.s IS DISTINCT FROM n.s)
                           OR (o.p IS DISTINCT FROM n.p) THEN 'U'
                 END AS op
          FROM o FULL OUTER JOIN n ON o.k = n.k)
        SELECT o_orderkey, op FROM j WHERE op IS NOT NULL
    """
    sqls["graph_scc"] = """
        WITH RECURSIVE pos AS (
          SELECT n_nationkey AS k, n_regionkey AS r,
                 row_number() OVER (PARTITION BY n_regionkey
                                    ORDER BY n_nationkey) AS p
          FROM nation),
        chain AS (
          SELECT 'n:' || a.k AS src, 'n:' || b.k AS dst
          FROM pos a JOIN pos b ON a.r = b.r AND b.p = a.p + 1),
        hd AS (SELECT n_regionkey AS r, min(n_nationkey) AS h,
                      max(n_nationkey) AS t
               FROM nation GROUP BY 1),
        e AS (
          SELECT src, dst FROM chain
          UNION
          SELECT 'n:' || t, 'n:' || h FROM hd
          UNION
          SELECT 'n:' || a.t, 'n:' || b.h
          FROM hd a JOIN hd b ON b.r = a.r + 1 AND a.r = 0),
        reach AS (
          SELECT src AS a, dst AS b FROM e
          UNION
          SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
        m AS (
          SELECT r1.a AS v, r1.b AS u
          FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
        nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        aug AS (SELECT v, v AS u FROM nodes
                UNION ALL SELECT v, u FROM m)
        SELECT v AS member, min(u) AS scc_id FROM aug GROUP BY v
    """
    sqls["graph_clustering"] = """
        WITH und AS (
          SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
          JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        nb AS (SELECT a AS v, b AS x FROM und
               UNION ALL SELECT b, a FROM und),
        deg AS (SELECT v AS node, count(*)::BIGINT AS deg FROM nb GROUP BY 1),
        tri AS (
          SELECT p.v AS node, count(*)::BIGINT AS triangles
          FROM nb p JOIN nb q ON p.v = q.v AND p.x < q.x
          JOIN und e ON e.a = p.x AND e.b = q.x
          GROUP BY 1)
        SELECT d.node, d.deg,
               coalesce(t.triangles, 0)::BIGINT AS triangles,
               round(coalesce(t.triangles, 0) * 2
                     / (d.deg * (d.deg - 1))::DOUBLE, 8)::DOUBLE AS coeff
        FROM deg d LEFT JOIN tri t ON d.node = t.node
        WHERE d.deg >= 2
    """
    sqls["rake_keyphrases"] = r"""
        WITH t AS (
          SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
                                                           '\W+'),
                                     x -> x <> '') AS ws
          FROM documents),
        w0 AS (
          SELECT doc_id, u.i AS pos, t.ws[u.i] AS word
          FROM t, unnest(generate_series(1, len(t.ws))) u(i)),
        w1 AS (
          SELECT doc_id, pos, word,
                 word IN ('the','and','of','to','a','in','is','for')
                   AS is_stop
          FROM w0),
        w2 AS (
          SELECT doc_id, pos, word, is_stop,
                 sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM w1),
        w3 AS (SELECT doc_id, pos, word, grp FROM w2 WHERE NOT is_stop),
        w4 AS (SELECT *, count(*) OVER (PARTITION BY doc_id, grp) AS plen
               FROM w3),
        wsc AS (SELECT doc_id, word,
                       sum(plen)::BIGINT / count(*)::DOUBLE AS wscore
                FROM w4 GROUP BY 1, 2),
        ph AS (SELECT doc_id, grp,
                      string_agg(word, ' ' ORDER BY pos) AS phrase
               FROM w4 GROUP BY 1, 2),
        sc AS (SELECT w4.doc_id, w4.grp,
                      round(sum(wsc.wscore), 8)::DOUBLE AS score
               FROM w4 JOIN wsc ON w4.doc_id = wsc.doc_id
                               AND w4.word = wsc.word
               GROUP BY 1, 2),
        fin AS (
          SELECT sc.doc_id, ph.phrase, sc.score,
                 row_number() OVER (PARTITION BY sc.doc_id
                                    ORDER BY sc.score DESC, ph.phrase)
                   ::INTEGER AS rank
          FROM sc JOIN ph ON sc.doc_id = ph.doc_id AND sc.grp = ph.grp)
        SELECT doc_id, phrase, score, rank FROM fin WHERE rank <= 3
    """
    sqls["sample_temperature"] = """
        WITH c AS (SELECT source, count(*)::BIGINT AS n
                   FROM documents GROUP BY 1),
        t AS (SELECT sum(sqrt(n::DOUBLE)) AS sw,
                     floor(sum(n) * 0.5::DOUBLE)::BIGINT AS nt
              FROM c),
        r AS (SELECT source,
                     least(1.0::DOUBLE,
                           round(nt * sqrt(n::DOUBLE) / sw / n, 6)) AS rate
              FROM c, t),
        thr AS (SELECT source, round(rate * 1000000.0::DOUBLE)::BIGINT AS thr
                FROM r)
        SELECT d.doc_id, d.source
        FROM documents d JOIN thr ON d.source = thr.source
        WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
              % 1000000 < thr.thr
    """
    sqls["vocab_oov_rate"] = r"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(text), '\W+'),
                   x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT term, count(*)::BIGINT AS tf FROM toks GROUP BY 1),
        vocab AS (SELECT term FROM tf ORDER BY tf DESC, term LIMIT 8)
        SELECT t.doc_id, count(*)::INTEGER AS n_tokens,
               sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::INTEGER
                 AS n_oov,
               round(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 8)::DOUBLE AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.term = v.term
        GROUP BY t.doc_id
    """
    sqls["mmr_rerank"] = _mmr_oracle_sql(k=5, shortlist=20, lam=0.7)
    sqls["quantized_topk"] = """
        WITH s AS (
          SELECT vec_id, embedding,
                 CASE WHEN list_max(list_transform(embedding,
                                                   x -> abs(x::DOUBLE))) > 0
                      THEN list_max(list_transform(embedding,
                                                   x -> abs(x::DOUBLE))) / 127.0
                      ELSE 1.0 END AS raw_scale
          FROM embeddings),
        c AS (
          SELECT vec_id, embedding, raw_scale,
                 list_transform(embedding,
                     x -> floor(x::DOUBLE / raw_scale + 0.5)) AS codes
          FROM s),
        cand AS (
          SELECT vec_id, embedding,
                 round(raw_scale * list_dot_product(codes::DOUBLE[],
                                                    {QV}), 6) AS approx_score
          FROM c
          ORDER BY approx_score DESC, vec_id LIMIT 50)
        SELECT vec_id, approx_score,
               round(list_dot_product(embedding::DOUBLE[], {QV}), 4) AS score
        FROM cand ORDER BY score DESC, vec_id LIMIT 10
    """.replace("{QV}", QUERY_VEC_SQL)
    sqls["graph_ppr"] = """
        WITH RECURSIVE it AS (
          SELECT 0 AS t, (1.0::DOUBLE/5) AS r0, 0.0::DOUBLE AS r1,
                 0.0::DOUBLE AS r2, 0.0::DOUBLE AS r3, 0.0::DOUBLE AS r4
          UNION ALL
          SELECT t + 1,
            ((1.0::DOUBLE - 0.85::DOUBLE)/5)
              + 0.85::DOUBLE * ((5*r4)/5),
            0.85::DOUBLE * r0,
            0.85::DOUBLE * r1,
            0.85::DOUBLE * r2,
            0.85::DOUBLE * r3
          FROM it WHERE t < 10),
        fin AS (SELECT * FROM it WHERE t = 10),
        pos AS (
          SELECT 'n:' || n_nationkey AS node,
                 (row_number() OVER (PARTITION BY n_regionkey
                                     ORDER BY n_nationkey) - 1) AS p
          FROM nation)
        SELECT node,
               round(CASE p WHEN 0 THEN r0 WHEN 1 THEN r1 WHEN 2 THEN r2
                            WHEN 3 THEN r3 ELSE r4 END, 8) AS rank
        FROM pos, fin
    """
    sqls["graph_random_walks"] = _walks_oracle_sql(walk_len=3)
    sqls["graph_harmonic"] = """
        WITH RECURSIVE e AS (
          SELECT DISTINCT 'u:' || user_id AS src, 't:' || event_type AS dst
          FROM events
          UNION
          SELECT DISTINCT 't:' || event_type, 'u:' || user_id FROM events),
        seeds AS (SELECT DISTINCT 't:' || event_type AS seed FROM events),
        r AS (
          SELECT seed, seed AS node, 0 AS dist FROM seeds
          UNION
          SELECT r.seed, e.dst, r.dist + 1
          FROM r JOIN e ON e.src = r.node WHERE r.dist < 4),
        d AS (SELECT seed, node, min(dist) AS dist FROM r GROUP BY 1, 2)
        SELECT node, count(*)::INTEGER AS n_reaching,
               round(sum(1.0::DOUBLE / dist), 8)::DOUBLE AS harmonic
        FROM d WHERE dist > 0 GROUP BY node
    """
    sqls["event_transitions"] = """
        WITH p AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events),
        c AS (SELECT from_type, to_type, count(*)::BIGINT AS n
              FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               round(n / (sum(n) OVER (PARTITION BY from_type))::DOUBLE,
                     8)::DOUBLE AS prob
        FROM c
    """
    sqls["gapfill_daily"] = """
        WITH daily AS (
          SELECT user_id AS "user", ts::DATE AS day,
                 count(*)::INTEGER AS n_events,
                 round(sum(value), 8)::DOUBLE AS day_value
          FROM events GROUP BY 1, 2),
        spine AS (
          SELECT "user",
                 unnest(generate_series(min(day), max(day),
                                        INTERVAL 1 DAY))::DATE AS day
          FROM daily GROUP BY "user"),
        j AS (
          SELECT s."user", s.day,
                 coalesce(d.n_events, 0)::INTEGER AS n_events, d.day_value
          FROM spine s
          LEFT JOIN daily d ON s."user" = d."user" AND s.day = d.day),
        g AS (
          SELECT *, sum(CASE WHEN day_value IS NOT NULL THEN 1 ELSE 0 END)
                    OVER (PARTITION BY "user" ORDER BY day) AS grp
          FROM j)
        SELECT "user", day::VARCHAR AS day, n_events, day_value,
               max(day_value) OVER (PARTITION BY "user", grp) AS carried
        FROM g
    """
    sqls["ewma_smooth"] = """
        WITH s AS (
          SELECT user_id AS "user",
                 list(value ORDER BY ts, event_id) AS vals
          FROM events GROUP BY 1)
        SELECT "user", len(vals)::INTEGER AS n_events,
               round(list_reduce(vals,
                     (acc, x) -> 0.5::DOUBLE * x + 0.5::DOUBLE * acc),
                     8)::DOUBLE AS ewma
        FROM s
    """
    sqls["profile_columns"] = """
        SELECT 'o_orderstatus' AS "column", count(*)::BIGINT AS n_rows,
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_nulls,
               count(DISTINCT o_orderstatus)::BIGINT AS n_distinct,
               min(o_orderstatus)::VARCHAR AS min_str,
               max(o_orderstatus)::VARCHAR AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*)::BIGINT,
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT o_orderpriority)::BIGINT,
               min(o_orderpriority)::VARCHAR, max(o_orderpriority)::VARCHAR
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*)::BIGINT,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT o_custkey)::BIGINT,
               min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR
        FROM orders
        UNION ALL
        SELECT 'o_orderkey', count(*)::BIGINT,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
               count(DISTINCT o_orderkey)::BIGINT,
               min(o_orderkey)::VARCHAR, max(o_orderkey)::VARCHAR
        FROM orders
    """
    return sqls


def _mmr_oracle_sql(k: int, shortlist: int, lam: float) -> str:
    """Unrolled MMR greedy: one (scored, pick, selected) CTE triple per
    round. selected sets are AS MATERIALIZED — each is referenced three
    times per round and plain CTEs would inline 3^k-fold."""
    lam_s = f"{lam}::DOUBLE"
    om_s = f"{round(1.0 - lam, 10)}::DOUBLE"
    parts = [
        f"""
        WITH cand AS MATERIALIZED (
          SELECT vec_id, embedding,
                 round(list_dot_product(embedding::DOUBLE[], {QUERY_VEC_SQL}),
                       4) AS rel
          FROM embeddings ORDER BY rel DESC, vec_id LIMIT {shortlist}),
        r1 AS (SELECT 1 AS rank, vec_id, embedding, rel
               FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
        sel1 AS MATERIALIZED (SELECT * FROM r1)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""",
        s{r} AS MATERIALIZED (
          SELECT c.vec_id, c.embedding, c.rel,
                 round({lam_s} * c.rel - {om_s} * (
                       SELECT max(round(list_dot_product(
                                    c.embedding::DOUBLE[],
                                    s.embedding::DOUBLE[]), 6))
                       FROM sel{r - 1} s), 6) AS score
          FROM cand c
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})),
        r{r} AS (SELECT {r} AS rank, vec_id, embedding, rel
                 FROM s{r} ORDER BY score DESC, vec_id LIMIT 1),
        sel{r} AS MATERIALIZED (
          SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM r{r})"""
        )
    parts.append(f"\n        SELECT rank, vec_id, rel FROM sel{k}")
    return "".join(parts)


def _walks_oracle_sql(walk_len: int) -> str:
    """Unrolled random-walk replay: one CTE per step, each picking the
    md5(walk_id:rw:t) % outdeg slot from the row_number-ordered neighbor
    table — byte-identical hop choices to graph_analytics.random_walks."""
    steps = []
    for t in range(1, walk_len + 1):
        prev = f"s{t - 1}"
        steps.append(
            f"""s{t} AS (
          SELECT s.walk_id, {t} AS step, n.dst AS node
          FROM {prev} s JOIN nbr n ON n.src = s.node
           AND n.rn = ('0x' || substr(md5(s.walk_id || ':rw:{t}'), 1, 8))::BIGINT
                       % n.outdeg)"""
        )
    unions = "\n        UNION ALL ".join(
        f"SELECT walk_id, step, node FROM s{t}" for t in range(walk_len + 1)
    )
    return f"""
        WITH e AS (
          SELECT DISTINCT 'u:' || user_id AS src, 't:' || event_type AS dst
          FROM events
          UNION
          SELECT DISTINCT 't:' || event_type, 'u:' || user_id FROM events),
        nbr AS (
          SELECT src, dst,
                 (row_number() OVER (PARTITION BY src ORDER BY dst) - 1)::BIGINT
                   AS rn,
                 count(*) OVER (PARTITION BY src) AS outdeg
          FROM e),
        s0 AS (
          SELECT DISTINCT src || '#0' AS walk_id, 0 AS step, src AS node
          FROM nbr),
        {",".join(steps)}
        {unions}
    """


def _zorder_oracle_sql(bits: int) -> str:
    """The Morton interleave as explicit BIGINT shift/and/add terms — the
    same expression wbkg/ops/table.py zorder_key compiles, spelled for
    DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"(((o_custkey >> {i}) & 1) << {2 * i})")
        terms.append(f"(((o_orderkey >> {i}) & 1) << {2 * i + 1})")
    return (
        "SELECT o_orderkey, o_custkey, ("
        + " + ".join(terms)
        + ")::BIGINT AS zkey FROM orders"
    )


def _ktruss_oracle_sql(k: int, rounds: int) -> str:
    """Mechanically-unrolled support peel for the k-truss oracle (naive
    spec formulation: canonical a<b<c triangle join + 3-way edge credit
    per round). `rounds` strictly exceeds the probed peel depth at every
    tested SF (3-4 for k=6). MATERIALIZED for the same 3^rounds inlining
    reason as the k-core oracle."""
    parts = [
        "WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,",
        "    l_partkey AS p FROM lineitem WHERE l_partkey % 4 = 0),",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(a.p, b.p) AS a,",
        "    greatest(a.p, b.p) AS b FROM li a JOIN li b",
        "    ON a.o = b.o AND a.p < b.p)",
    ]
    for i in range(rounds):
        parts.append(
            f", t{i} AS MATERIALIZED (SELECT ab.a AS x, ab.b AS y, bc.b AS z"
            f" FROM e{i} ab JOIN e{i} bc ON ab.b = bc.a"
            f" JOIN e{i} ac ON ac.a = ab.a AND ac.b = bc.b)"
        )
        parts.append(
            f", s{i} AS MATERIALIZED (SELECT a, b, count(*)::INTEGER AS s FROM ("
            f"SELECT x AS a, y AS b FROM t{i}"
            f" UNION ALL SELECT x, z FROM t{i}"
            f" UNION ALL SELECT y, z FROM t{i}) GROUP BY 1, 2)"
        )
        parts.append(
            f", e{i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{i} e"
            f" JOIN s{i} ON e.a = s{i}.a AND e.b = s{i}.b"
            f" AND s{i}.s >= {k - 2})"
        )
    parts.append(
        f"SELECT e.a, e.b, coalesce(s{rounds - 1}.s, 0)::INTEGER AS support"
        f" FROM e{rounds} e LEFT JOIN s{rounds - 1}"
        f" ON e.a = s{rounds - 1}.a AND e.b = s{rounds - 1}.b"
    )
    return "\n".join(parts)


def _hits_oracle_sql(iterations: int) -> str:
    """HITS on the 5-position chain, all iterations unrolled: state =
    (a0..a4) authorities and (h0..h4) hubs per position; per iteration the
    authority half-step divides the incoming hub by the 25-node L2 norm
    (= sqrt(5 * sum of per-position squares)), then the hub half-step does
    the same with the new authorities."""
    parts = [
        "WITH it0 AS (SELECT "
        + ", ".join(f"1.0::DOUBLE AS h{p}" for p in range(5))
        + ")"
    ]
    for i in range(iterations):
        parts.append(
            f", x{i} AS (SELECT *, sqrt(5 * (h0*h0 + h1*h1 + h2*h2 + h3*h3))"
            f" AS na FROM it{i})"
        )
        a_cols = ["0.0::DOUBLE AS a0"] + [
            f"CASE WHEN na > 0 THEN h{p - 1} / na ELSE 0.0::DOUBLE END AS a{p}"
            for p in range(1, 5)
        ]
        parts.append(f", y{i} AS (SELECT {', '.join(a_cols)} FROM x{i})")
        parts.append(
            f", z{i} AS (SELECT *, sqrt(5 * (a1*a1 + a2*a2 + a3*a3 + a4*a4))"
            f" AS nh FROM y{i})"
        )
        h_cols = [
            f"CASE WHEN nh > 0 THEN a{p + 1} / nh ELSE 0.0::DOUBLE END AS h{p}"
            for p in range(4)
        ] + ["0.0::DOUBLE AS h4"]
        parts.append(
            f", it{i + 1} AS (SELECT a0, a1, a2, a3, a4, {', '.join(h_cols)}"
            f" FROM z{i})"
        )
    parts.append(
        """, pos AS (
          SELECT 'n:' || n_nationkey AS node,
                 (row_number() OVER (PARTITION BY n_regionkey
                                     ORDER BY n_nationkey) - 1) AS p
          FROM nation)
        SELECT node,
               round(CASE p WHEN 0 THEN a0 WHEN 1 THEN a1 WHEN 2 THEN a2
                            WHEN 3 THEN a3 ELSE a4 END, 8)::DOUBLE AS authority,
               round(CASE p WHEN 0 THEN h0 WHEN 1 THEN h1 WHEN 2 THEN h2
                            WHEN 3 THEN h3 ELSE h4 END, 8)::DOUBLE AS hub
        FROM pos, it"""
        + str(iterations)
    )
    return "\n".join(parts)


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Mechanically-unrolled peel for the k-core oracle: `rounds` is chosen
    strictly above the peel depth at every tested SF (probed: 6 rounds at
    sf0.001, 10 at sf0.01, 12 at sf0.1 for k=6), so e{rounds} is the
    fixpoint the Spark loop converges to."""
    # MATERIALIZED is load-bearing: each e{i} is referenced three times
    # (the edge scan + both keep-joins), so inlined CTEs would expand
    # 3^rounds ways and exhaust file handles on the base parquet scan.
    parts = [
        "WITH b AS MATERIALIZED (SELECT DISTINCT 'p:' || l_partkey AS src,",
        "                           'o:' || l_orderkey AS dst FROM lineitem),",
        "e0 AS MATERIALIZED (SELECT src, dst FROM b UNION SELECT dst, src FROM b)",
    ]
    for i in range(rounds):
        parts.append(
            f", k{i} AS MATERIALIZED (SELECT src FROM e{i} GROUP BY src"
            f" HAVING count(*) >= {k})"
        )
        parts.append(
            f", e{i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i} e"
            f" JOIN k{i} a ON e.src = a.src JOIN k{i} b2 ON e.dst = b2.src)"
        )
    parts.append(
        f"SELECT src AS node, count(*)::INTEGER AS degree"
        f" FROM e{rounds} GROUP BY src"
    )
    return "\n".join(parts)


def _kg_expected_sql(heuristic_ner: bool = False) -> str:
    """The independent pure-Python oracle (wbkg/oracle.py — AC automaton +
    dict maps + union-find, no Spark) fixes the expected triple count for the
    deterministic KG_N_DOCS corpus; the Spark query must report
    n_spark == n_matched == that constant."""
    from wbkg.oracle import oracle_pipeline

    n = len(oracle_pipeline(KG_N_DOCS, heuristic_ner=heuristic_ner))
    return f"SELECT {n}::BIGINT AS n_spark, {n}::BIGINT AS n_oracle, {n}::BIGINT AS n_matched"


# --------------------------------------------------------------------------- #
# Mechanical driver-window ordering (VERDICT r04 "What's wrong" #1).
#
# The driver records CORRECTNESS rows for only the FIRST 50 queries()
# entries, so which entries get a fresh driver-side check is decided by dict
# order — and hand-maintaining that order let an in-place edit (r04's
# token_count) escape verification. The order is now computed:
#   1. entries whose definition (query function source + oracle SQL) differs
#      from the committed manifest — i.e. changed or brand-new since their
#      last driver verification — come first, alphabetically;
#   2. then unchanged entries, least-recently-verified round first, so every
#      entry rotates back into the window within two rounds.
# scripts/update_manifest.py refreshes scripts/oracle_manifest.json from a
# round's CORRECTNESS_r{N}.json; tests/test_registry.py fails if a changed
# entry would sit outside the 50-entry window or the manifest is stale in a
# way ordering can't absorb.
# --------------------------------------------------------------------------- #

import hashlib as _hashlib
import inspect as _inspect
import json as _json
import os as _os

MANIFEST_PATH = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "scripts", "oracle_manifest.json"
)
DRIVER_WINDOW = 50


def definition_hash(name: str, fns=None, sqls=None) -> str:
    """Stable fingerprint of one registry entry: the query function's source
    + its oracle SQL. Any edit to either marks the entry changed."""
    fns = _query_fns() if fns is None else fns
    sqls = _oracle_sqls() if sqls is None else sqls
    body = _inspect.getsource(fns[name]) + "\n--oracle--\n" + sqls.get(name, "")
    return _hashlib.sha256(body.encode()).hexdigest()[:16]


def load_manifest() -> dict:
    try:
        with open(MANIFEST_PATH) as f:
            return _json.load(f)
    except OSError:
        return {}


def registry_order() -> list[str]:
    fns, sqls = _query_fns(), _oracle_sqls()
    manifest = load_manifest()

    def key(name: str):
        ent = manifest.get(name)
        if ent is not None and ent.get("hash") != definition_hash(name, fns, sqls):
            # A definition the driver previously verified has CHANGED —
            # silent-drift risk, must re-verify THIS round: first tier.
            return (0, -1, name)
        if ent is None:
            # Brand new, never driver-verified. Second tier: if more than
            # DRIVER_WINDOW definitions are new+changed in one round, only
            # new entries may overflow (they are locally oracle-verified by
            # scripts/check_contract.py and lead the NEXT round's window —
            # there is no previously-claimed driver verdict to go stale).
            return (1, -1, name)
        return (2, ent.get("round", -1), name)

    return sorted(fns, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    fns = _query_fns()
    return {n: fns[n] for n in registry_order()}


def oracle_sql() -> dict[str, str]:
    sqls = _oracle_sqls()
    return {n: sqls[n] for n in registry_order() if n in sqls}
