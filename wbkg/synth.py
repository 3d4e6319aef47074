"""Deterministic synthetic interleaved-document corpus (seed-fixed).

Per FIXTURES.md §1-§4: generates the pipeline input tables so every reference
code path is exercised — header-stack truncation, glossary sections,
Schwartz-Hearst inline patterns, case-varied dictionary surfaces, excluded-
label decoys, Zipf-skewed hub entities ("World Bank", country names), long
sections forcing sentence splits, simple HTML tables, pre-header content.

Generation is itself distributed (spark.range -> mapInPandas) so the same
code scales the corpus to arbitrary size; a pure-Python path (gen_doc) is
shared with tests and the correctness oracle.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta
from typing import Dict, List

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from wbkg.schemas import DOC_METADATA, DOCUMENTS_INTERLEAVED, ENTITY_DICT, UNBIS_VOCAB

SEED = 42

# --- canonical entity dictionary (broadcast side of the linking join) ----------

COUNTRIES = [
    ("Q96", "México", ["Mexico"]),
    ("Q717", "Venezuela", []),
    ("Q155", "Brazil", ["Federative Republic of Brazil"]),
    ("Q142", "France", []),
    ("Q30", "United States", ["USA", "United States of America"]),
    ("Q668", "India", []),
    ("Q148", "China", []),
    ("Q115", "Ethiopia", []),
    ("Q1033", "Nigeria", []),
    ("Q953", "Zambia", []),
    ("Q916", "Angola", []),
    ("Q43", "Türkiye", ["Turkey"]),
    ("Q881", "Vietnam", ["Viet Nam"]),
    ("Q252", "Indonesia", []),
    ("Q843", "Pakistan", []),
    ("Q889", "Afghanistan", []),
    ("Q114", "Kenya", []),
    ("Q1036", "Uganda", []),
    ("Q1041", "Senegal", []),
    ("Q774", "Guatemala", []),
    ("Q804", "Panama", []),
    ("Q419", "Perú", ["Peru"]),
    ("Q739", "Colombia", []),
    ("Q928", "Philippines", []),
    ("Q921", "Brunei", []),
]

ORGS = [
    ("Q7164", "World Bank", ["WB", "the World Bank Group", "IBRD"]),
    ("Q1065", "United Nations", ["UN"]),
    ("Q827525", "International Development Association", ["IDA"]),
    ("Q160746", "International Monetary Fund", ["IMF"]),
    ("Q848633", "International Finance Corporation", ["IFC"]),
    ("Q7817", "World Health Organization", ["WHO"]),
    ("Q48340", "United Nations Development Programme", ["UNDP"]),
]

SECTORS = [
    ("S001", "renewable energy", ["clean energy"]),
    ("S002", "hazardous waste management", ["waste management"]),
    ("S003", "climate change", []),
    ("S004", "public procurement", ["procurement"]),
    ("S005", "water supply", ["drinking water"]),
    ("S006", "rural electrification", []),
    ("S007", "primary education", []),
    ("S008", "financial inclusion", []),
    ("S009", "urban transport", []),
    ("S010", "food security", []),
]

INDICATORS = [
    ("I001", "GDP per capita", []),
    ("I002", "access to electricity", []),
    ("I003", "poverty headcount ratio", []),
    ("I004", "carbon dioxide emissions", ["CO2 emissions"]),
    ("I005", "literacy rate", []),
]

# (ABBR, expansion) pairs used for glossaries + Schwartz-Hearst inline patterns
ACRONYM_DEFS = [
    ("STEP", "Systematic Tracking of Exchanges in Procurement"),
    ("PAD", "Project Appraisal Document"),
    ("ESMF", "Environmental and Social Management Framework"),
    ("MSME", "Micro Small and Medium Enterprises"),
    ("PIU", "Project Implementation Unit"),
    ("RAP", "Resettlement Action Plan"),
    ("GRM", "Grievance Redress Mechanism"),
    ("NDC", "Nationally Determined Contribution"),
]

# static country-property dimension (replaces the per-QID Wikidata property
# fetch, ref src/graph.py:290-365 + COUNTRY_PROPERTY_MAP :35-43)
COUNTRY_PROPS = {
    # qid: (continent, currency, official_language)
    "Q96": ("North America", "Mexican peso", "Spanish"),
    "Q155": ("South America", "Brazilian real", "Portuguese"),
    "Q30": ("North America", "United States dollar", "English"),
    "Q668": ("Asia", "Indian rupee", "Hindi"),
    "Q114": ("Africa", "Kenyan shilling", "Swahili"),
    "Q43": ("Asia", "Turkish lira", "Turkish"),
    "Q1033": ("Africa", "Nigerian naira", "English"),
    "Q881": ("Asia", "Vietnamese dong", "Vietnamese"),
}

PROPERTY_PREDICATES = {  # ref COUNTRY_PROPERTY_MAP src/graph.py:35-43
    "continent": "http://www.wikidata.org/prop/direct/P30",
    "currency": "http://www.wikidata.org/prop/direct/P38",
    "official_language": "http://www.wikidata.org/prop/direct/P37",
}


def build_country_props_rows() -> List[dict]:
    rows = []
    for qid, (continent, currency, language) in COUNTRY_PROPS.items():
        for prop, value in [
            ("continent", continent),
            ("currency", currency),
            ("official_language", language),
        ]:
            rows.append(
                {"qid": qid, "pred": PROPERTY_PREDICATES[prop], "value": value}
            )
    return rows


UNBIS_TERMS = [
    "sustainable development",
    "poverty mitigation",
    "technical cooperation",
    "development finance",
    "capacity building",
    "environmental protection",
    "gender equality",
    "infrastructure investment",
    "economic growth",
    "social protection",
]

# decoys with excluded labels (ref src/ner.py:20-22 EXCLUDED_ENTS) — present in
# text, must NOT survive the P2 filter into triples
DECOYS = ["January 2020", "US$5 million", "25 percent", "第三"]

_FILLER = (
    "The project aims to strengthen institutional capacity and improve service "
    "delivery across participating regions. Implementation arrangements follow "
    "standard fiduciary requirements. Monitoring and evaluation will track key "
    "performance indicators throughout the project lifecycle. Safeguard policies "
    "apply to all components. Disbursement is conditional on agreed milestones. "
).split(". ")


def n_projects(n_docs: int) -> int:
    return max(10, n_docs // 10)


def project_entities(n_docs: int) -> List[tuple]:
    return [
        (f"P{i:05d}", f"Project {_project_name(i)}", [f"P-{i:05d}"])
        for i in range(n_projects(n_docs))
    ]


def _project_name(i: int) -> str:
    adjectives = ["Green", "Inclusive", "Resilient", "Digital", "Rural", "Urban"]
    nouns = ["Growth", "Transport", "Energy", "Water", "Education", "Health"]
    return f"{adjectives[i % len(adjectives)]} {nouns[(i // 6) % len(nouns)]} {i}"


def normalize_surface(s: str) -> str:
    """lower + accent-fold + whitespace-collapse (ref src/graph.py:141-149 +
    linker cache-key lowering src/linker.py:86,92)."""
    import unicodedata

    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return " ".join(s.lower().split())


def build_entity_dict_rows(n_docs: int) -> List[dict]:
    rows: List[dict] = []
    kinds = [
        ("country", COUNTRIES),
        ("org", ORGS),
        ("sector", SECTORS),
        ("indicator", INDICATORS),
        ("project", project_entities(n_docs)),
    ]
    for kind, ents in kinds:
        for eid, label, aliases in ents:
            rows.append(
                {
                    "entity_id": eid,
                    "surface_norm": normalize_surface(label),
                    "kind": kind,
                    "label": label,
                    "is_alias": False,
                    "alias_of": None,
                }
            )
            for a_i, alias in enumerate(aliases):
                rows.append(
                    {
                        "entity_id": f"{eid}#a{a_i}",
                        "surface_norm": normalize_surface(alias),
                        "kind": kind,
                        "label": alias,
                        "is_alias": True,
                        "alias_of": eid,
                    }
                )
    return rows


def build_unbis_rows() -> List[dict]:
    return [
        {"term": t, "href": f"http://metadata.un.org/thesaurus/{1000 + i}"}
        for i, t in enumerate(UNBIS_TERMS)
    ]


def _zipf_pick(rng: random.Random, items: List, skew: float = 1.2):
    """Zipf-ish pick: index i with weight (i+1)^-skew — item 0 is the hub."""
    n = len(items)
    weights = [(i + 1) ** -skew for i in range(n)]
    return rng.choices(items, weights=weights, k=1)[0]


def _sentence(rng: random.Random, mentionables: List[str]) -> str:
    parts = [rng.choice(_FILLER).strip()]
    # 1-2 entity mentions per sentence, Zipf-skewed toward hubs
    for _ in range(rng.randint(1, 2)):
        surface = _zipf_pick(rng, mentionables)
        if rng.random() < 0.3:  # case variation (drives case-insensitive C4)
            surface = surface.upper() if rng.random() < 0.5 else surface.lower()
        verb = rng.choice(["supports", "is financed by", "was reviewed with", "benefits"])
        parts.append(f"This component {verb} {surface}")
    if rng.random() < 0.15:
        parts.append(f"The review took place in {rng.choice(DECOYS)}")
    return ". ".join(parts) + "."


def gen_doc(doc_idx: int, n_docs: int, seed: int = SEED, weight: int = 1) -> dict:
    """Pure, deterministic single-document generator (shared with oracle).

    weight multiplies the section count — weight=8 yields ~120KB documents
    (real World Bank PADs are 100+ pages), used by the scaling benchmark so
    per-document compute dominates fixed overhead."""
    rng = random.Random((seed << 20) ^ doc_idx)
    doc_id = f"D{doc_idx:07d}"

    projects = project_entities(n_docs)
    mentionables = (
        [label for _, label, _ in ORGS]
        + [label for _, label, _ in COUNTRIES]
        + [label for _, label, _ in SECTORS]
        + [label for _, label, _ in INDICATORS]
        + UNBIS_TERMS
        + [alias for _, _, aliases in ORGS + COUNTRIES for alias in aliases]
        + [label for _, label, _ in projects[: max(5, len(projects) // 5)]]
    )

    spans: List[dict] = []
    off = 0

    def add(kind: str, text: str, media_ref: str = ""):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    # pre-header content (tests/test_custom_parser.py:45-59)
    if rng.random() < 0.4:
        add("text", _sentence(rng, mentionables))

    # optional glossary section (drives C3)
    doc_acros = rng.sample(ACRONYM_DEFS, k=rng.randint(2, 5))
    has_glossary = rng.random() < 0.5
    if has_glossary:
        title = rng.choice(["Abbreviations", "List of Acronyms", "Acronyms"])
        add("header", f"1|{title}")
        lines = [f"{abbr} — {exp}" for abbr, exp in doc_acros]
        add("text", "\n".join(lines))

    n_sections = rng.randint(2, 5) * weight
    for s_i in range(n_sections):
        level = 1 if s_i == 0 or rng.random() < 0.4 else rng.randint(2, 3)
        add("header", f"{level}|Section {doc_idx}.{s_i}")

        n_paras = rng.randint(1, 3)
        for _ in range(n_paras):
            n_sents = rng.randint(2, 5) if rng.random() < 0.8 else rng.randint(40, 80)
            sents = [_sentence(rng, mentionables) for _ in range(n_sents)]
            # inline Schwartz-Hearst pattern (drives C2)
            if rng.random() < 0.4:
                abbr, exp = rng.choice(doc_acros)
                sents.append(f"The {exp} ({abbr}) applies to this component.")
            add("text", " ".join(sents))

        if rng.random() < 0.25:  # table span
            c = rng.choice([label for _, label, _ in COUNTRIES])
            add(
                "table",
                f"<table><tr><th>Country</th><th>Amount</th></tr>"
                f"<tr><td>{c}</td><td>{rng.randint(1, 99)}M</td></tr></table>",
                media_ref=f"assets/{doc_id}_t{s_i}.html",
            )
        if rng.random() < 0.2:  # image span (skipped by chunker)
            add("image", "Figure: project map", media_ref=f"assets/{doc_id}_f{s_i}.png")

    return {"doc_id": doc_id, "spans": spans, "_acros": doc_acros, "_glossary": has_glossary}


def gen_metadata_row(doc_idx: int, n_docs: int, seed: int = SEED) -> List[dict]:
    """doc_metadata rows; ~20% of docs get a stale duplicate row (drives A1)."""
    rng = random.Random((seed << 21) ^ doc_idx)
    doc_id = f"D{doc_idx:07d}"
    projects = project_entities(n_docs)
    n_p = rng.randint(1, 3)
    picked = rng.sample(projects, k=min(n_p, len(projects)))
    country = rng.choice(COUNTRIES)[1]
    base_date = datetime(2024, 1, 1) + timedelta(days=doc_idx % 365)
    row = {
        "id": doc_id,
        "display_title": f"Appraisal {_project_name(doc_idx % 36)} {doc_idx}",
        "last_modified_date": base_date,
        "pdfurl": f"http://documents.example.org/{doc_id}.pdf",
        "year": 2020 + doc_idx % 6,
        "docty": rng.choice(["Project Appraisal Document", "Implementation Report"]),
        "owner": rng.choice([o[1] for o in ORGS[:3]]),
        "count": country,
        "projn": ",".join(p[1] for p in picked),
        "projectid": ",".join(p[0] for p in picked),
        "trustfund": ",".join(f"Trustfund {i}" for i in range(doc_idx % 3)),
        "trustfund_key": ",".join(f"TF{i:04d}" for i in range(doc_idx % 3)),
    }
    rows = [row]
    if doc_idx % 5 == 0:  # stale older version of the same doc
        stale = dict(row)
        stale["last_modified_date"] = base_date - timedelta(days=30)
        stale["display_title"] = row["display_title"] + " draft"
        rows.append(stale)
    return rows


# --- Spark-side distributed generation -------------------------------------------


def gen_documents_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = SEED,
    partitions: int | None = None,
    weight: int = 1,
) -> DataFrame:
    partitions = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_idx in pdf["id"]:
                d = gen_doc(int(doc_idx), n_docs, seed, weight)
                rows.append({"doc_id": d["doc_id"], "spans": d["spans"]})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return (
        spark.range(n_docs)
        .repartition(partitions)
        .mapInPandas(gen, schema=DOCUMENTS_INTERLEAVED)
    )


def gen_metadata_df(spark: SparkSession, n_docs: int, seed: int = SEED) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_idx in pdf["id"]:
                rows.extend(gen_metadata_row(int(doc_idx), n_docs, seed))
            yield pd.DataFrame(rows, columns=[f.name for f in DOC_METADATA.fields])

    return spark.range(n_docs).repartition(8).mapInPandas(gen, schema=DOC_METADATA)


def entity_dict_df(spark: SparkSession, n_docs: int) -> DataFrame:
    return spark.createDataFrame(build_entity_dict_rows(n_docs), schema=ENTITY_DICT)


def unbis_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(build_unbis_rows(), schema=UNBIS_VOCAB)
