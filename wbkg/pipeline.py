"""End-to-end pipeline orchestration (SURVEY §7.0 target architecture).

chunk -> acronyms -> mentions -> link -> canonicalize -> materialize.
Each stage is a DataFrame; `run_pipeline` wires them and returns every
intermediate so tests/checkpointing/benchmarks can grab any boundary.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wbkg.canonicalize import apply_canonicalization, canonical_map
from wbkg.chunker import chunk_documents
from wbkg.extract import build_pattern_rows, extract_acronyms, extract_mentions
from wbkg.link import link_mentions
from wbkg.materialize import (
    RDF_TYPE,
    chunk_triples,
    entity_triples,
    metadata_triples,
    nodes_from_edges,
    union_distinct,
)


def run_pipeline(
    spark: SparkSession,
    docs_df: DataFrame,
    entity_dict_df: DataFrame,
    pattern_rows: List[Tuple[str, str, str]],
    metadata_df: Optional[DataFrame] = None,
    link_strategy: str = "broadcast",
    cache: bool = True,
) -> Dict[str, DataFrame]:
    chunks = chunk_documents(docs_df)
    if cache:
        chunks = chunks.persist()

    acronyms = extract_acronyms(chunks)
    if cache:
        acronyms = acronyms.persist()

    mentions = extract_mentions(chunks, acronyms, pattern_rows)
    if cache:
        # link_mentions probes mentions multiple times (work list, safe_map,
        # result join) — without a persist the Aho-Corasick scan would rerun
        mentions = mentions.persist()
    linked = link_mentions(mentions, entity_dict_df, strategy=link_strategy)
    if cache:
        linked = linked.persist()

    cmap = canonical_map(entity_dict_df, acronyms, linked)
    linked_c = apply_canonicalization(linked, cmap)
    if cache:
        linked_c = linked_c.persist()

    ent_edges = entity_triples(linked_c)
    if cache:
        ent_edges = ent_edges.persist()
    typed_entities = (
        ent_edges.filter(F.col("pred") == RDF_TYPE).select(F.col("subj").alias("uri")).distinct()
    )
    chk_edges = chunk_triples(chunks, linked_c, typed_entities)

    frames = [ent_edges, chk_edges]
    if metadata_df is not None:
        frames.append(metadata_triples(metadata_df, entity_dict_df, dedup=False))
    edges = union_distinct(*frames)
    if cache:
        edges = edges.persist()
    nodes = nodes_from_edges(edges)

    return {
        "chunks": chunks,
        "acronyms": acronyms,
        "mentions": mentions,
        "linked": linked_c,
        "canonical_map": cmap,
        "edges": edges,
        "nodes": nodes,
    }
