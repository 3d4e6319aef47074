"""Stage 5 — triple materialization (C6/C7, SO1, J4-J6, A1, P1, P7, J9, K1).

The reference accumulates rdflib triples (a set) and serializes Turtle
(src/graph.py). Here the graph IS two tables:

    edges (subj, pred, obj, obj_is_literal, lang)
    nodes (uri, type, name, qid)

rdflib-set semantics == union-distinct over all per-stage edge frames (SO1;
double-adds like src/summarize.py:181,190 collapse). Turtle export is a sink
(mapPartitions formatter), not the storage model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCHEMA = "http://schema.org/"
WD = "http://www.wikidata.org/entity/"
EX = "http://worldbank.example.org/"
RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_LABEL = "rdfs:label"

# ref src/graph.py:24-33
COLUMN_TO_SCHEMA = {
    "id": "identifier",
    "display_title": "name",
    "last_modified_date": "dateModified",
    "pdfurl": "url",
    "year": "datePublished",
    "docty": "genre",
    "owner": "creator",
}


def _uri(ns: str, *parts) -> "F.Column":
    return F.concat(F.lit(ns), *parts)


def _lit_edges(df: DataFrame, subj, pred: str, obj, lang: str | None = None) -> DataFrame:
    return df.select(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.cast("string").alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.lit(lang).cast("string").alias("lang"),
    )


def _uri_edges(df: DataFrame, subj, pred: str, obj) -> DataFrame:
    return df.select(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("lang"),
    )


def union_distinct(*frames: DataFrame) -> DataFrame:
    """SO1 — rdflib Graph set semantics (union of all g.add calls)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.dropDuplicates(["subj", "pred", "obj"])


def entity_uri_col(qid_col: str, rdf_safe_col: str):
    """wd:<qid> if linked else ex:entity/<rdf_safe> (ref src/graph.py:681)."""
    return F.when(
        F.col(qid_col).isNotNull(), _uri(WD, F.col(qid_col))
    ).otherwise(_uri(EX, F.lit("entity/"), F.col(rdf_safe_col)))


# --------------------------------------------------------------------------- #
# C6 — entity + doc->entity triples (ref src/graph.py:665-696)                 #
# --------------------------------------------------------------------------- #


def entity_triples(linked: DataFrame) -> DataFrame:
    """linked mentions (canonicalized) -> C6 triples."""
    base = linked.filter(
        F.col("surface").isNotNull() & F.col("rdf_safe_c").isNotNull()
    ).select(
        entity_uri_col("qid_c", "rdf_safe_c").alias("ent_uri"),
        "surface",
        "label",
        _uri(EX, F.lit("document/"), F.col("doc_id")).alias("doc_uri"),
    )
    # dedupe early: triple emission is a projection; distinct happens in SO1,
    # but pre-shrinking (doc,ent)/(ent,surface) pairs cuts the union width
    typ = _uri_edges(base.select("ent_uri").distinct(), F.col("ent_uri"), RDF_TYPE, F.lit(SCHEMA + "Thing"))
    name = _lit_edges(base.select("ent_uri", "surface").distinct(), F.col("ent_uri"), SCHEMA + "name", F.col("surface"))
    addl = _lit_edges(
        base.filter(F.col("label").isNotNull()).select("ent_uri", "label").distinct(),
        F.col("ent_uri"), SCHEMA + "additionalType", F.col("label"),
    )
    mentions = _uri_edges(base.select("doc_uri", "ent_uri").distinct(), F.col("doc_uri"), SCHEMA + "mentions", F.col("ent_uri"))
    return typ.unionByName(name).unionByName(addl).unionByName(mentions)


# --------------------------------------------------------------------------- #
# C7 — chunk triples (ref src/graph.py:700-752), J8 semi-join gate             #
# --------------------------------------------------------------------------- #


def chunk_triples(chunks: DataFrame, linked: DataFrame, typed_entities: DataFrame) -> DataFrame:
    """chunk nodes + isPartOf + text + chunk->entity mentions gated by a left
    SEMI join against already-typed entity URIs (graph.py:747)."""
    chunk_uri = _uri(EX, F.lit("chunk/"), F.col("chunk_id"))
    doc_uri = _uri(EX, F.lit("document/"), F.col("doc_id"))
    base = chunks.select(chunk_uri.alias("chunk_uri"), doc_uri.alias("doc_uri"), "text")

    typ = _uri_edges(base, F.col("chunk_uri"), RDF_TYPE, F.lit(SCHEMA + "TextObject"))
    txt = _lit_edges(base, F.col("chunk_uri"), SCHEMA + "text", F.col("text"))
    part = _uri_edges(base, F.col("chunk_uri"), SCHEMA + "isPartOf", F.col("doc_uri"))

    pairs = linked.select(
        _uri(EX, F.lit("chunk/"), F.col("chunk_id")).alias("chunk_uri"),
        entity_uri_col("qid_c", "rdf_safe_c").alias("ent_uri"),
    ).distinct()
    gated = pairs.join(
        typed_entities.select(F.col("uri").alias("ent_uri")), "ent_uri", "left_semi"
    )
    men = _uri_edges(gated, F.col("chunk_uri"), SCHEMA + "mentions", F.col("ent_uri"))
    return typ.unionByName(txt).unionByName(part).unionByName(men)


# --------------------------------------------------------------------------- #
# Metadata KG (ref src/graph.py:755-768 build(); SURVEY §3.2)                  #
# --------------------------------------------------------------------------- #


SAN_SRC = "áàâäãåçéèêëíìîïñóòôöõúùûüýÁÀÂÄÃÅÇÉÈÊËÍÌÎÏÑÓÒÔÖÕÚÙÛÜÝşŞğĞıİ"
SAN_DST = "aaaaaaceeeeiiiinooooouuuuyAAAAAACEEEEIIIINOOOOOUUUUYsSgGiI"
assert len(SAN_SRC) == len(SAN_DST)


def sanitize_str_py(s) -> str | None:
    """Pure-Python twin of sanitize_column (shared with the oracle)."""
    import re as _re

    if s is None:
        return None
    s = str(s).translate(str.maketrans(SAN_SRC, SAN_DST))
    s = _re.sub(r"\s+", "_", s)
    s = s.replace("-", "_").strip("_")
    return None if s == "nan" else s


def sanitize_column(col):
    """P1 — accent fold, \\s+ -> _, '-' -> _, strip '_', 'nan' -> null
    (ref src/graph.py:141-149). Accent folding uses a translate table for the
    Latin-1 range (JVM-side; full unidecode only matters for display strings)."""
    c = F.translate(col.cast("string"), SAN_SRC, SAN_DST)
    c = F.regexp_replace(c, r"\s+", "_")
    c = F.regexp_replace(c, "-", "_")
    c = F.regexp_replace(c, "^_+|_+$", "")
    return F.when(c == "nan", F.lit(None)).otherwise(c)


def dedup_latest(metadata: DataFrame) -> DataFrame:
    """A1 — keep the newest row per id (ref src/graph.py:185-190)."""
    w = Window.partitionBy("id").orderBy(
        F.desc("last_modified_date"), F.desc("display_title")
    )
    return metadata.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def prepare_metadata(metadata: DataFrame) -> DataFrame:
    meta = dedup_latest(metadata)
    for c in ["docty", "count", "trustfund", "trustfund_key", "projn", "projectid", "display_title", "owner"]:
        meta = meta.withColumn(c, sanitize_column(F.col(c)))
    return meta


def metadata_triples(
    metadata: DataFrame, entity_dict: DataFrame, dedup: bool = True
) -> DataFrame:
    """Document instances + P7 unpivot of extra columns + countries (J4) +
    projects/trustfunds (J5/J6 zip-explode) + doc->entity links.

    dedup=False skips the union-distinct when the caller dedups downstream
    anyway (avoids a double shuffle in the full pipeline)."""
    meta = prepare_metadata(metadata).cache()
    doc_uri = _uri(EX, F.lit("document/"), F.col("id"))

    # --- document instances (graph.py:482-510; primary_key=True path) ---
    docs = meta.filter(F.col("id").isNotNull())
    frames = [
        _uri_edges(docs, doc_uri, RDF_TYPE, F.lit(EX + "document")),
        _lit_edges(docs, doc_uri, SCHEMA + "identifier", F.col("id")),
        _lit_edges(
            docs.filter(F.col("display_title").isNotNull()),
            doc_uri, SCHEMA + "name", F.col("display_title"), lang="en",
        ),
    ]
    # P7: extra columns -> schema.org props (graph.py:459-468)
    for col_name in ["pdfurl", "last_modified_date", "docty", "owner"]:
        prop = COLUMN_TO_SCHEMA.get(col_name, col_name)
        frames.append(
            _lit_edges(
                docs.filter(F.col(col_name).isNotNull()),
                doc_uri, SCHEMA + prop, F.col(col_name),
            )
        )
    # class triples (graph.py:422-426, 229-231)
    spark = metadata.sparkSession
    cls = spark.createDataFrame(
        [
            (EX + "document", RDF_TYPE, "rdfs:Class", False, None),
            (EX + "document", RDFS_SUBCLASS, SCHEMA + "CreativeWork", False, None),
            (EX + "document", RDFS_LABEL, "A document produced and written for the World Bank.", True, "en"),
            (EX + "project", RDF_TYPE, "rdfs:Class", False, None),
            (EX + "project", RDFS_SUBCLASS, SCHEMA + "Thing", False, None),
            (EX + "project", RDFS_LABEL, "World Bank Project", True, "en"),
            (EX + "trustfund", RDF_TYPE, "rdfs:Class", False, None),
            (EX + "trustfund", RDFS_SUBCLASS, SCHEMA + "Thing", False, None),
            (EX + "trustfund", RDFS_LABEL, "World Bank Trustfund", True, "en"),
        ],
        schema="subj string, pred string, obj string, obj_is_literal boolean, lang string",
    )
    frames.append(cls)

    # --- countries (graph.py:259-287): distinct count values + dict QID join ---
    countries = meta.select(F.col("count").alias("ckey")).filter(F.col("ckey").isNotNull()).distinct()
    country_label = F.regexp_replace(F.col("ckey"), "_", " ")
    cdict = (
        entity_dict.filter((F.col("kind") == "country"))
        .select(F.col("surface_norm"), F.coalesce("alias_of", "entity_id").alias("cqid"))
        .groupBy("surface_norm")
        .agg(F.min("cqid").alias("cqid"))
    )
    countries = countries.withColumn("label", country_label).join(
        F.broadcast(cdict), F.lower(F.col("label")) == F.col("surface_norm"), "left"
    )
    c_uri = _uri(EX, F.lit("country/"), F.col("ckey"))
    frames.append(_uri_edges(countries, c_uri, RDF_TYPE, F.lit(SCHEMA + "Country")))
    frames.append(_lit_edges(countries, c_uri, SCHEMA + "name", F.col("label"), lang="en"))
    frames.append(
        _uri_edges(
            countries.filter(F.col("cqid").isNotNull()),
            c_uri, SCHEMA + "sameAs", _uri(WD, F.col("cqid")),
        )
    )

    # --- projects & trustfunds (J6 arrays_zip + explode; graph.py:513-543) ---
    for name_col, id_col, ref in [("projn", "projectid", "project"), ("trustfund", "trustfund_key", "trustfund")]:
        zipped = (
            meta.filter(F.col(id_col).isNotNull() & F.col(name_col).isNotNull())
            .select(
                F.explode(
                    F.arrays_zip(
                        F.split(id_col, ",").alias("ids"),
                        F.split(name_col, ",").alias("names"),
                    )
                ).alias("z")
            )
            .select(
                F.trim(F.col("z.ids")).alias("eid"),
                F.trim(F.col("z.names")).alias("ename"),
            )
            .filter((F.col("eid") != "") & F.col("eid").isNotNull() & (F.col("ename") != ""))
            # dict/zip semantics of the reference: last name wins per id
            .groupBy("eid").agg(F.max("ename").alias("ename"))
        )
        e_uri = _uri(EX, F.lit(f"{ref}/"), F.col("eid"))
        frames.append(_uri_edges(zipped, e_uri, RDF_TYPE, F.lit(EX + ref)))
        frames.append(_lit_edges(zipped, e_uri, SCHEMA + "name", F.col("ename"), lang="en"))
        frames.append(_lit_edges(zipped, e_uri, SCHEMA + "identifier", F.col("eid")))

    # --- doc->entity links (J4 single, J5 multi explode; graph.py:546-642) ---
    link_doc_uri = _uri(EX, F.lit("document/"), F.col("id"))
    # J4 doc -> country
    j4 = meta.filter(F.col("count").isNotNull() & F.col("id").isNotNull())
    frames.append(
        _uri_edges(j4, link_doc_uri, SCHEMA + "countryOfOrigin", _uri(EX, F.lit("country/"), F.col("count")))
    )
    # J5 doc -> projects / trustfunds (comma explode)
    for id_col, pred, ref in [("projectid", "isPartOf", "project"), ("trustfund_key", "funder", "trustfund")]:
        ex_df = (
            meta.filter(F.col(id_col).isNotNull() & F.col("id").isNotNull())
            .select("id", F.explode(F.split(id_col, ",")).alias("eid"))
            .withColumn("eid", F.trim("eid"))
            .filter(F.col("eid") != "")
        )
        frames.append(
            _uri_edges(
                ex_df,
                _uri(EX, F.lit("document/"), F.col("id")),
                SCHEMA + pred,
                _uri(EX, F.lit(f"{ref}/"), F.col("eid")),
            )
        )

    if not dedup:
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
    return union_distinct(*frames)


# --------------------------------------------------------------------------- #
# Node table + lookups                                                         #
# --------------------------------------------------------------------------- #


def nodes_from_edges(edges: DataFrame) -> DataFrame:
    """Derive the NODES table from typed subjects (uri, type, name, qid)."""
    typed = edges.filter(F.col("pred") == RDF_TYPE).select(
        F.col("subj").alias("uri"), F.col("obj").alias("type")
    )
    names = (
        edges.filter(F.col("pred") == SCHEMA + "name")
        .groupBy(F.col("subj").alias("uri"))
        .agg(F.min("obj").alias("name"))
    )
    qid = F.when(
        F.col("uri").startswith(WD), F.expr(f"substring(uri, {len(WD) + 1}, 100)")
    ).otherwise(F.lit(None))
    return (
        typed.groupBy("uri").agg(F.min("type").alias("type"))
        .join(names, "uri", "left")
        .withColumn("qid", qid)
    )


def get_url_by_id(edges: DataFrame) -> DataFrame:
    """J9 — self-join of edges on subj: identifier x url (graph.py:653-662)."""
    ids = edges.filter(F.col("pred") == SCHEMA + "identifier").select(
        F.col("subj"), F.col("obj").alias("doc_id")
    )
    urls = edges.filter(F.col("pred") == SCHEMA + "url").select(
        F.col("subj"), F.col("obj").alias("url")
    )
    return ids.join(urls, "subj").select("doc_id", "url")


# --------------------------------------------------------------------------- #
# K1 — Turtle sink (export only)                                               #
# --------------------------------------------------------------------------- #


def to_turtle_lines(edges: DataFrame) -> DataFrame:
    """Distributed TTL formatting via native expressions (one line per triple,
    N-Triples-ish; prefixes resolved inline). Write with df.write.text."""
    esc = F.regexp_replace(F.regexp_replace(F.col("obj"), r"\\", r"\\\\"), '"', '\\\"')
    obj_term = F.when(
        F.col("obj_is_literal") & F.col("lang").isNotNull(),
        F.concat(F.lit('"'), esc, F.lit('"@'), F.col("lang")),
    ).when(F.col("obj_is_literal"), F.concat(F.lit('"'), esc, F.lit('"'))).otherwise(
        F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
    )
    pred_term = F.when(
        F.col("pred").startswith("rdf"), F.col("pred")
    ).otherwise(F.concat(F.lit("<"), F.col("pred"), F.lit(">")))
    return edges.select(
        F.concat(
            F.lit("<"), F.col("subj"), F.lit("> "), pred_term, F.lit(" "), obj_term, F.lit(" .")
        ).alias("line")
    )
