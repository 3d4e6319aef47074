"""Fixed StructType schemas for every stage boundary.

The reference is duck-typed row-at-a-time Python (SURVEY.md §1.3); here every
stage boundary has an explicit columnar schema so Catalyst can prune/push down
and Arrow batches have a stable layout.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- input (per BASELINE.json input_hint) -----------------------------------
SPAN = StructType(
    [
        StructField("kind", StringType()),       # 'text' | 'header' | 'table' | 'image'
        StructField("text", StringType()),       # headers: '<level>|<title>'
        StructField("media_ref", StringType()),  # '' for text; asset path otherwise
        StructField("offset", IntegerType()),    # 0-based order within doc
    ]
)

DOCUMENTS_INTERLEAVED = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN)),
    ]
)

# --- stage 1: chunks (ref src/parser.py:94-200) ------------------------------
CHUNKS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_id", StringType()),      # f"{doc_id}_chunk_{idx}"
        StructField("chunk_idx", IntegerType()),
        StructField("text", StringType()),
        StructField("header_path", StringType()),   # '/H1/H2/' (ref parser.py:191-198)
        StructField("prev_id", StringType()),
        StructField("next_id", StringType()),
    ]
)

# --- stage 2: mentions + acronyms (ref src/ner.py, src/acronyms.py) ----------
MENTIONS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_id", StringType()),
        StructField("surface", StringType()),
        StructField("surface_norm", StringType()),   # lower+accent-fold+ws-collapse
        StructField("label", StringType()),          # ACRONYM|ACRONYM_EXPANDED|UNBIS_TERM|DICT_*
        StructField("rule_id", StringType()),        # pattern id (ref ner.py:69,79,91 id_)
        StructField("begin", IntegerType()),
        StructField("end", IntegerType()),
    ]
)

ACRONYMS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("abbr", StringType()),
        StructField("expansion", StringType()),
        StructField("source", StringType()),  # 'glossary' (primary) | 'inline' (detected)
    ]
)

# --- dictionary / vocab dimension tables (FIXTURES.md §2, §4) ----------------
ENTITY_DICT = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("surface_norm", StringType()),
        StructField("kind", StringType()),   # project|country|sector|indicator|org
        StructField("label", StringType()),
        StructField("is_alias", BooleanType()),
        StructField("alias_of", StringType()),
    ]
)

UNBIS_VOCAB = StructType(
    [StructField("term", StringType()), StructField("href", StringType())]
)

# --- stage 3: linked mentions -------------------------------------------------
LINKED = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("chunk_id", StringType()),
        StructField("surface", StringType()),
        StructField("surface_norm", StringType()),
        StructField("label", StringType()),
        StructField("rule_id", StringType()),
        StructField("qid", StringType()),        # dictionary entity_id or null
        StructField("rdf_safe", StringType()),   # qid else sanitized surface (ner.py:46-54)
    ]
)

# --- stage 5: edges / nodes ---------------------------------------------------
EDGES = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("obj_is_literal", BooleanType()),
        StructField("lang", StringType()),
    ]
)

NODES = StructType(
    [
        StructField("uri", StringType()),
        StructField("type", StringType()),
        StructField("name", StringType()),
        StructField("qid", StringType()),
    ]
)

# --- metadata table (FIXTURES.md §3; ref src/graph.py:80-84) -----------------
DOC_METADATA = StructType(
    [
        StructField("id", StringType()),
        StructField("display_title", StringType()),
        StructField("last_modified_date", TimestampType()),
        StructField("pdfurl", StringType()),
        StructField("year", IntegerType()),
        StructField("docty", StringType()),
        StructField("owner", StringType()),
        StructField("count", StringType()),
        StructField("projn", StringType()),
        StructField("projectid", StringType()),
        StructField("trustfund", StringType()),
        StructField("trustfund_key", StringType()),
    ]
)

# --- stage 6: communities ------------------------------------------------------
COMMUNITIES = StructType(
    [
        StructField("chunk_id", StringType()),
        # structural string id (parent/sub-label path), injective by
        # construction — no hashed-long collision risk (ADVICE r02)
        StructField("community_id", StringType()),
    ]
)

# --- lineage / metrics ----------------------------------------------------------
STAGE_METRICS = StructType(
    [
        StructField("stage", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("rows_in", LongType()),
        StructField("rows_out", LongType()),
        StructField("wall_ms", DoubleType()),
    ]
)
