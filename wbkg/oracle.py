"""Pure-Python reference-semantics oracle (no Spark).

Runs the same extract -> link -> canonicalize -> materialize semantics as the
reference (object-at-a-time, dicts and sets — the reference's own execution
style) and returns the triple set. The Spark pipeline is compared against
this oracle for the P/R >= 0.95 fidelity gate (BASELINE.md).

The chunker/extractor pure functions are shared with the Spark UDFs (they ARE
the per-document semantics); the relational parts — dedup, joins, alias
resolution, connected components, triple projection, union-distinct — are
implemented independently here with plain dicts/sets/union-find, so the
comparison genuinely validates the distributed plumbing.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

from wbkg.chunker import chunk_spans_py
from wbkg.extract import (
    EXCLUDED_ENTS,
    AhoCorasick,
    build_pattern_rows,
    clean_acronyms_py,
    extract_glossary_acronyms_py,
    extract_inline_acronyms_py,
    normalize_surface,
    sanitize_for_sparql,
)
from wbkg.materialize import EX, SCHEMA, WD, RDF_TYPE, RDFS_LABEL, RDFS_SUBCLASS, sanitize_str_py
from wbkg.synth import (
    SEED,
    build_entity_dict_rows,
    build_unbis_rows,
    gen_doc,
    gen_metadata_row,
)

Triple = Tuple[str, str, str]


class _UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _rdf_safe(surface: str) -> str | None:
    from urllib.parse import quote

    clean = sanitize_for_sparql(surface)
    if clean is None:
        return None
    return quote(clean.replace(" ", "_"))[:100]


def oracle_pipeline(
    n_docs: int,
    seed: int = SEED,
    with_metadata: bool = True,
    with_country_props: bool = False,
    heuristic_ner: bool = False,
) -> Set[Triple]:
    entity_rows = build_entity_dict_rows(n_docs)
    unbis_rows = build_unbis_rows()
    static_ac = AhoCorasick(build_pattern_rows(entity_rows, unbis_rows))

    # --- dictionary lookup maps with the LIMIT-1 tie-break -----------------
    primary_map: Dict[str, str] = {}
    alias_map: Dict[str, str] = {}
    for r in sorted(entity_rows, key=lambda r: r["entity_id"]):
        tgt = r["alias_of"] or r["entity_id"]
        m = alias_map if r["is_alias"] else primary_map
        m.setdefault(r["surface_norm"], tgt)

    triples: Set[Triple] = set()
    uf = _UnionFind()
    for r in entity_rows:
        if r["is_alias"]:
            uf.union(f"qid::{r['entity_id']}", f"qid::{r['alias_of']}")

    per_doc: List[dict] = []
    for doc_idx in range(n_docs):
        d = gen_doc(doc_idx, n_docs, seed)
        chunks = chunk_spans_py(d["spans"])

        # acronyms: per-chunk detect, clean (P5), merge glossary-first (A2)
        found: Dict[Tuple[str, str], Tuple[int, str]] = {}
        for c in chunks:
            for src_name, detector in (
                ("glossary", lambda c=c: extract_glossary_acronyms_py(c["header_path"], c["text"])),
                ("inline", lambda c=c: extract_inline_acronyms_py(c["text"])),
            ):
                prio = 0 if src_name == "glossary" else 1
                for abbr, exp in clean_acronyms_py(detector()).items():
                    key = (d["doc_id"], abbr)
                    cand = (prio, exp)
                    if key not in found or cand < found[key]:
                        found[key] = cand
        acronyms = {abbr: exp for (_, abbr), (_, exp) in found.items()}

        # mentions: static AC + per-doc acronym AC, leftmost-longest merge
        doc_pats = []
        for abbr, exp in acronyms.items():
            doc_pats.append((abbr, "ACRONYM", abbr))
            if exp:
                doc_pats.append((exp, "ACRONYM_EXPANDED", exp))
        doc_ac = AhoCorasick(doc_pats) if doc_pats else None

        heur_ac = None
        if heuristic_ner:
            # same candidate emitter as the Spark UDF (per-document
            # semantics are shared by design, docstring above); the MATCHER
            # stays the independent char-level AC
            from wbkg.extract import HEUR_LABEL, heuristic_ner_candidates_py

            cands = heuristic_ner_candidates_py([c["text"] for c in chunks])
            if cands:
                heur_ac = AhoCorasick(
                    [(s, HEUR_LABEL, normalize_surface(s)) for s in cands]
                )

        doc_mentions = []
        for c in chunks:
            norm_text = normalize_surface(c["text"])
            matches = list(static_ac.find(c["text"]))
            if doc_ac:
                matches.extend(doc_ac.find(c["text"]))
            matches.sort(key=lambda m: (m[0], -(m[1] - m[0])))
            sel, last_end = [], -1
            for m in matches:
                if m[0] >= last_end:
                    sel.append(m)
                    last_end = m[1]
            if heur_ac is not None:
                # ruler-first merge: heuristic matches only fill gaps the
                # dictionary/acronym spans left open (ref pipeline.py:63-66)
                ruled = [(m[0], m[1]) for m in sel]
                extra = sorted(
                    heur_ac.find(c["text"]), key=lambda m: (m[0], -(m[1] - m[0]))
                )
                for m in extra:
                    if all(m[1] <= b or m[0] >= e for b, e in ruled):
                        sel.append(m)
                        ruled.append((m[0], m[1]))
                sel.sort(key=lambda m: m[0])
            for b, e, label, rule_id in sel:
                if label in EXCLUDED_ENTS:
                    continue
                surface = norm_text[b:e]
                doc_mentions.append(
                    {"chunk_idx": c["chunk_idx"], "surface": surface, "label": label}
                )

        # linking J1 -> J2 with rdf_safe fallback (P4)
        for m in doc_mentions:
            qid = primary_map.get(m["surface"]) or alias_map.get(m["surface"])
            m["qid"] = qid
            m["rdf_safe"] = qid if qid else _rdf_safe(m["surface"])

        # alias edges for canonicalization
        for abbr, exp in acronyms.items():
            # same normalize_surface keying as the mention side (ADVICE r01)
            uf.union(f"surf::{normalize_surface(abbr)}", f"surf::{normalize_surface(exp)}")
        for m in doc_mentions:
            if m["qid"]:
                uf.union(f"surf::{m['surface'].lower()}", f"qid::{m['qid']}")

        per_doc.append({"doc": d, "chunks": chunks, "mentions": doc_mentions})

    # canonical representative per component: min qid:: member, else min member
    members: Dict[str, List[str]] = {}
    for node in list(uf.parent):
        members.setdefault(uf.find(node), []).append(node)
    rep: Dict[str, str] = {}
    for root, ms in members.items():
        qids = [m for m in ms if m.startswith("qid::")]
        r = min(qids) if qids else min(ms)
        for m in ms:
            rep[m] = r

    # --- materialize C6 + C7 -------------------------------------------------
    for entry in per_doc:
        doc_id = entry["doc"]["doc_id"]
        doc_uri = f"{EX}document/{doc_id}"
        typed_entities: Set[str] = set()
        canon = []
        for m in entry["mentions"]:
            if m["rdf_safe"] is None:
                continue
            qid_c = m["qid"]
            if not qid_c:
                r = rep.get(f"surf::{m['surface'].lower()}")
                if r and r.startswith("qid::"):
                    qid_c = r[5:]
            rdf_safe_c = qid_c if qid_c else m["rdf_safe"]
            ent_uri = f"{WD}{qid_c}" if qid_c else f"{EX}entity/{rdf_safe_c}"
            canon.append((m, ent_uri))
            triples.add((ent_uri, RDF_TYPE, SCHEMA + "Thing"))
            triples.add((ent_uri, SCHEMA + "name", m["surface"]))
            if m["label"]:
                triples.add((ent_uri, SCHEMA + "additionalType", m["label"]))
            triples.add((doc_uri, SCHEMA + "mentions", ent_uri))
            typed_entities.add(ent_uri)

        for c in entry["chunks"]:
            chunk_uri = f"{EX}chunk/{doc_id}_chunk_{c['chunk_idx']}"
            triples.add((chunk_uri, RDF_TYPE, SCHEMA + "TextObject"))
            triples.add((chunk_uri, SCHEMA + "text", c["text"]))
            triples.add((chunk_uri, SCHEMA + "isPartOf", doc_uri))
        for m, ent_uri in canon:
            chunk_uri = f"{EX}chunk/{doc_id}_chunk_{m['chunk_idx']}"
            if ent_uri in typed_entities:  # J8 gate — all C6 entities are typed
                triples.add((chunk_uri, SCHEMA + "mentions", ent_uri))

    if with_metadata:
        triples |= oracle_metadata_triples(n_docs, seed, with_country_props)
    return triples


def oracle_metadata_triples(
    n_docs: int, seed: int = SEED, with_country_props: bool = False
) -> Set[Triple]:
    entity_rows = build_entity_dict_rows(n_docs)
    country_qid: Dict[str, str] = {}
    for r in sorted(entity_rows, key=lambda r: r["entity_id"]):
        if r["kind"] == "country":
            tgt = r["alias_of"] or r["entity_id"]
            cur = country_qid.get(r["surface_norm"])
            country_qid[r["surface_norm"]] = min(cur, tgt) if cur else tgt

    # A1 dedup-latest with the same tie-break as the Spark window
    rows_by_id: Dict[str, dict] = {}
    for doc_idx in range(n_docs):
        for row in gen_metadata_row(doc_idx, n_docs, seed):
            cur = rows_by_id.get(row["id"])
            key = (row["last_modified_date"], row["display_title"])
            if cur is None or key > (cur["last_modified_date"], cur["display_title"]):
                rows_by_id[row["id"]] = dict(row)

    sanit_cols = ["docty", "count", "trustfund", "trustfund_key", "projn", "projectid", "display_title", "owner"]
    meta = []
    for row in rows_by_id.values():
        r = dict(row)
        for c in sanit_cols:
            r[c] = sanitize_str_py(r[c])
        meta.append(r)

    t: Set[Triple] = set()
    for cls, parent, label in [
        ("document", SCHEMA + "CreativeWork", "A document produced and written for the World Bank."),
        ("project", SCHEMA + "Thing", "World Bank Project"),
        ("trustfund", SCHEMA + "Thing", "World Bank Trustfund"),
    ]:
        t.add((EX + cls, RDF_TYPE, "rdfs:Class"))
        t.add((EX + cls, RDFS_SUBCLASS, parent))
        t.add((EX + cls, RDFS_LABEL, label))

    ent_names: Dict[Tuple[str, str], str] = {}
    for r in meta:
        doc_uri = f"{EX}document/{r['id']}"
        t.add((doc_uri, RDF_TYPE, EX + "document"))
        t.add((doc_uri, SCHEMA + "identifier", r["id"]))
        if r["display_title"]:
            t.add((doc_uri, SCHEMA + "name", r["display_title"]))
        for col, prop in [("pdfurl", "url"), ("last_modified_date", "dateModified"), ("docty", "genre"), ("owner", "creator")]:
            if r[col] is not None:
                t.add((doc_uri, SCHEMA + prop, str(r[col])))

        # countries
        if r["count"]:
            ckey = r["count"]
            label = ckey.replace("_", " ")
            c_uri = f"{EX}country/{ckey}"
            t.add((c_uri, RDF_TYPE, SCHEMA + "Country"))
            t.add((c_uri, SCHEMA + "name", label))
            qid = country_qid.get(label.lower())
            if qid:
                t.add((c_uri, SCHEMA + "sameAs", f"{WD}{qid}"))
                if with_country_props:
                    from wbkg.synth import build_country_props_rows

                    for p in build_country_props_rows():
                        if p["qid"] == qid:
                            t.add((c_uri, p["pred"], p["value"]))
            t.add((doc_uri, SCHEMA + "countryOfOrigin", c_uri))

        # projects / trustfunds: zip (extras dropped) + links
        for name_col, id_col, ref, pred in [
            ("projn", "projectid", "project", "isPartOf"),
            ("trustfund", "trustfund_key", "trustfund", "funder"),
        ]:
            ids = [i.strip() for i in (r[id_col] or "").split(",") if i.strip()]
            names = [n.strip() for n in (r[name_col] or "").split(",") if n.strip()]
            for eid, ename in zip(ids, names):
                key = (ref, eid)
                if key not in ent_names or ename > ent_names[key]:
                    ent_names[key] = ename
            if r[id_col]:
                for eid in ids:
                    t.add((doc_uri, SCHEMA + pred, f"{EX}{ref}/{eid}"))

    for (ref, eid), ename in ent_names.items():
        e_uri = f"{EX}{ref}/{eid}"
        t.add((e_uri, RDF_TYPE, EX + ref))
        t.add((e_uri, SCHEMA + "name", ename))
        t.add((e_uri, SCHEMA + "identifier", eid))
    return t
