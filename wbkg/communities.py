"""Stage 6 — chunk co-occurrence graph + communities + summaries
(G1/A5, G2, G3, C8, A6/A7/A8).

Reference: src/summarize.py. The co-occurrence build is the reference's
nested loop (entity -> all chunk pairs, weight += 1, :134-143) re-expressed
as a self-join + hash aggregation. Hierarchical Leiden (:148-172, a
randomized native library) is replaced by deterministic weighted label
propagation — documented surrogate; community structure is checked at the
structural level (determinism, sizes, connectivity), not id-for-id.
hierarchical_communities() adds the reference's max_cluster_size=50 bound
(src/summarize.py:160-166): oversized communities are recursively split
(weak-tie refinement, even-split fallback) and every level is kept.

Skew (SURVEY §4.4): hub entities ("World Bank") touch a large share of all
chunks, making the self-join quadratic in the hub's chunk count. A
per-entity chunk cap (deterministic: first N chunks by id) bounds the
blow-up, mirroring the reference's max_cluster_size bound downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wbkg.materialize import EX, SCHEMA, RDF_TYPE, _lit_edges, _uri, _uri_edges

DEFAULT_ENTITY_CHUNK_CAP = 200
LP_MAX_ITER = 6


def cooccurrence_edges(
    linked: DataFrame, entity_chunk_cap: int = DEFAULT_ENTITY_CHUNK_CAP
) -> DataFrame:
    """linked mentions -> (src, dst, weight): chunk pairs sharing entities,
    weight = number of shared entities (A5; ref summarize.py:134-143)."""
    pairs = linked.select(
        "chunk_id", F.coalesce("qid_c", "rdf_safe_c").alias("ent")
    ).distinct()
    # per-entity chunk list, sorted and capped (same first-`cap`-by-
    # chunk_id semantics as the r06 row_number window); ordered pairs
    # then generate MAP-SIDE via posexplode + slice, so the (src, dst)
    # weight fold partial-aggregates before its one shuffle instead of
    # sort-merge self-joining the incidence list
    grouped = pairs.groupBy("ent").agg(
        F.slice(
            F.sort_array(F.collect_list("chunk_id")), 1, entity_chunk_cap
        ).alias("_cs")
    )
    lhs = grouped.select("_cs", F.posexplode("_cs").alias("_i", "src"))
    return (
        lhs.select(
            "src",
            F.explode(F.slice("_cs", F.col("_i") + 2, F.size("_cs"))).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )


def label_propagation(
    edges: DataFrame, max_iter: int = LP_MAX_ITER, num_partitions: int = 32
) -> DataFrame:
    """Deterministic synchronous weighted label propagation.

    Each node adopts the label with the highest incident weight sum
    (tie-break: smallest label). -> (chunk_id, community_id: long)."""
    sym = (
        edges.select("src", "dst", "weight")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        .repartition(num_partitions, "src")
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint()

    # MONOTONE weighted label propagation: each node finds the label with the
    # highest incident-weight sum among its neighbors (tie: smallest label)
    # and adopts it ONLY if it is smaller than its current label. Labels only
    # decrease, so the iteration provably converges (no synchronous-LP
    # oscillation); weight-dominance still decides membership, so a weak
    # bridge edge cannot pull a node out of its strongly-connected cluster.
    for it in range(max_iter):
        neigh = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.sum("weight").alias("w"))
        )
        pick = Window.partitionBy("node").orderBy(F.desc("w"), F.asc("label"))
        candidate = (
            neigh.withColumn("_rn", F.row_number().over(pick))
            .filter("_rn = 1")
            .select("node", F.col("label").alias("new_label"))
        )
        # labels only decrease, so changed == "new label strictly smaller";
        # the count rides the checkpoint materialization as an OBSERVED
        # metric (accumulator) — no separate per-iteration count job
        # (VERDICT r03 #7)
        from pyspark.sql import Observation

        obs = Observation(f"lp_changed_{it}")
        new_col = F.least(F.col("label"), F.coalesce("new_label", "label"))
        flagged = labels.join(candidate, "node", "left").select(
            "node",
            new_col.alias("_new"),
            (new_col < F.col("label")).cast("long").alias("_chg"),
        )
        new_labels = (
            flagged.observe(obs, F.sum("_chg").alias("changed"))
            .select("node", F.col("_new").alias("label"))
            .localCheckpoint()
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if changed == 0:
            break

    # structural id: the converged min-label (a member chunk_id) IS the
    # community id — injective by construction, no hash-collision risk
    # (ADVICE r02: a cross-parent xxhash64 collision could silently merge
    # two communities and break the max_cluster_size bound)
    return labels.select(
        F.col("node").alias("chunk_id"),
        F.col("label").alias("community_id"),
    )


def _ntile_split(mem: DataFrame, max_cluster_size: int) -> DataFrame:
    """Deterministic even split of (chunk_id, parent) members into
    ceil(n/max) buckets by chunk_id order — the guaranteed-bound fallback
    used when edge weights carry no structure to split on (uniform weights)
    or when refinement stalls. -> (chunk_id, community_id)."""
    w = Window.partitionBy("parent").orderBy("chunk_id")
    n = F.count("*").over(Window.partitionBy("parent"))
    nb = F.ceil(n / F.lit(max_cluster_size))
    bucket = F.floor((F.row_number().over(w) - 1) * nb / n)
    return mem.select(
        "chunk_id",
        # structural id: parent id + bucket ordinal, unique across parents
        F.concat_ws(":", F.col("parent").cast("string"), bucket.cast("string")).alias(
            "community_id"
        ),
    )


def hierarchical_communities(
    edges: DataFrame,
    max_cluster_size: int = 50,
    max_levels: int = 4,
    num_partitions: int = 32,
) -> DataFrame:
    """Hierarchical community detection with a hard cluster-size bound —
    the deterministic surrogate for the reference's
    `hierarchical_leiden(..., max_cluster_size=50)` (ref
    src/summarize.py:160-166): communities above the bound are recursively
    split and every refinement level is kept.

    Per level, each oversized community is split by one of two rules:
      - weights vary inside it: drop its minimum-weight edge class and
        re-run label propagation on the remaining intra-community edges
        (Leiden-style refinement: weak ties break first). Members left
        without edges become singletons.
      - weights are uniform (or refinement returned a single label): even
        deterministic split by chunk_id order into ceil(n/max) buckets.
    The final level is always forced through the even split, so the bound
    holds unconditionally.

    -> (chunk_id, level, community_id); a chunk appears once per level at
    which its community was (re)assigned. Use final_communities() for the
    leaf assignment."""
    labels = label_propagation(edges, num_partitions=num_partitions)
    out = labels.withColumn("level", F.lit(0))
    cur = labels.localCheckpoint()

    for level in range(1, max_levels + 1):
        sizes = cur.groupBy("community_id").agg(F.count("*").alias("sz"))
        over = sizes.filter(F.col("sz") > max_cluster_size).select("community_id")
        if over.isEmpty():
            break
        mem = cur.join(over, "community_id", "left_semi").select(
            "chunk_id", F.col("community_id").alias("parent")
        )
        if level == max_levels:
            refined = _ntile_split(mem, max_cluster_size)
        else:
            src_m = mem.select(F.col("chunk_id").alias("src"), F.col("parent"))
            dst_m = mem.select(F.col("chunk_id").alias("dst"), F.col("parent").alias("p2"))
            intra = (
                edges.join(src_m, "src")
                .join(dst_m, "dst")
                .filter(F.col("parent") == F.col("p2"))
                .select("src", "dst", "weight", "parent")
            )
            wstats = intra.groupBy("parent").agg(
                F.min("weight").alias("wmin"), F.max("weight").alias("wmax")
            )
            varying = wstats.filter(F.col("wmax") > F.col("wmin")).select("parent", "wmin")
            kept = (
                intra.join(varying, "parent")
                .filter(F.col("weight") > F.col("wmin"))
                .select("src", "dst", "weight")
            )
            refine_mem = mem.join(varying.select("parent"), "parent", "left_semi")
            ntile_mem = mem.join(varying.select("parent"), "parent", "left_anti")

            sub = label_propagation(kept, num_partitions=num_partitions).withColumnRenamed(
                "community_id", "sub_label"
            )
            singleton = F.concat_ws("#", "parent", "chunk_id")
            refined0 = refine_mem.join(sub, "chunk_id", "left").select(
                "chunk_id", "parent", F.coalesce("sub_label", singleton).alias("sub_label")
            )
            # refinement that failed to split (single label == parent size)
            # stalls forever on re-entry -> route those parents to the even
            # split now
            nsub = refined0.groupBy("parent").agg(
                F.countDistinct("sub_label").alias("nsub")
            )
            stuck = nsub.filter(F.col("nsub") <= 1).select("parent")
            split_ok = refined0.join(stuck, "parent", "left_anti").select(
                "chunk_id",
                # structural id: parent id + refinement sub-label (itself a
                # member chunk_id) — unique across parents by construction
                F.concat_ws("/", F.col("parent").cast("string"),
                            F.col("sub_label").cast("string")).alias("community_id"),
            )
            ntile_all = ntile_mem.unionByName(
                refine_mem.join(stuck, "parent", "left_semi")
            )
            refined = split_ok.unionByName(_ntile_split(ntile_all, max_cluster_size))

        refined = refined.localCheckpoint()
        out = out.unionByName(refined.withColumn("level", F.lit(level)))
        cur = refined

    return out.select("chunk_id", "level", "community_id")


def final_communities(hier: DataFrame) -> DataFrame:
    """leaf assignment: each chunk's community at its deepest level."""
    w = Window.partitionBy("chunk_id").orderBy(F.desc("level"))
    return (
        hier.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("chunk_id", "community_id")
    )


def community_triples(communities: DataFrame) -> DataFrame:
    """G3 (ref summarize.py:175-194): chunk isPartOf community + community
    node triples."""
    chunk_uri = _uri(EX, F.lit("chunk/"), F.col("chunk_id"))
    comm_uri = _uri(EX, F.lit("community/"), F.col("community_id").cast("string"))
    links = _uri_edges(communities, chunk_uri, SCHEMA + "isPartOf", comm_uri)
    comms = communities.select(F.col("community_id").cast("string").alias("cid")).distinct()
    cu = _uri(EX, F.lit("community/"), F.col("cid"))
    typ = _uri_edges(comms, cu, RDF_TYPE, F.lit(SCHEMA + "Community"))
    ident = _lit_edges(comms, cu, SCHEMA + "identifier", F.col("cid"))
    name = _lit_edges(comms, cu, SCHEMA + "name", F.concat(F.lit("Community "), F.col("cid")))
    return links.unionByName(typ).unionByName(ident).unionByName(name)


def community_sizes_topk(communities: DataFrame, k: int = 10) -> DataFrame:
    """A6 (ref summarize.py:168-170 Counter.most_common(10))."""
    return (
        communities.groupBy("community_id")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), "community_id")
        .limit(k)
    )


def summarize_communities(
    communities: DataFrame, chunks: DataFrame, max_tokens: int = 6000
) -> DataFrame:
    """C8 deterministic surrogate for the LLM summary (ref
    summarize.py:197-244): within each community, take chunk texts in
    chunk_id order under a running whitespace-token budget (A8/W5 cumsum;
    ref :214-220 greedy stop), emit first sentence of the packed text.
    -> (community_id, summary, n_chunks_used)."""
    joined = communities.join(chunks.select("chunk_id", "text"), "chunk_id")
    tok = F.size(F.split(F.col("text"), r"\s+"))
    w = (
        Window.partitionBy("community_id")
        .orderBy("chunk_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budgeted = joined.withColumn("cum_tok", F.sum(tok).over(w)).filter(
        F.col("cum_tok") < max_tokens
    )
    packed = budgeted.groupBy("community_id").agg(
        F.count("*").alias("n_chunks_used"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_id", "text"))),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("_joined"),
    )
    first_sentence = F.regexp_extract(F.col("_joined"), r"^(.*?[.!?])(\s|$)", 1)
    summary = F.when(first_sentence != "", first_sentence).otherwise(
        F.substring(F.col("_joined"), 1, 200)
    )
    return packed.select("community_id", summary.alias("summary"), "n_chunks_used")


def summary_triples(summaries: DataFrame) -> DataFrame:
    comm_uri = _uri(EX, F.lit("community/"), F.col("community_id").cast("string"))
    return _lit_edges(summaries, comm_uri, SCHEMA + "abstract", F.col("summary"))
