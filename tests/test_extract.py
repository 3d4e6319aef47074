"""Extraction (C2/C3/C4) + filter (P2/P3/P5) tests.

Golden assertions ported from reference semantics:
- acronym merge first-wins + flip (ref tests/test_acronyms.py:66-77)
- uppercase-ratio acronym filter (ref tests/test_acronyms.py:80-88)
- excluded entity labels dropped (ref tests/test_ner.py:89-107)
- SPARQL sanitize chain (ref src/utils.py:4-42)
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wbkg.extract import (
    AhoCorasick,
    clean_acronyms_py,
    extract_acronyms,
    extract_glossary_acronyms_py,
    extract_inline_acronyms_py,
    extract_mentions,
    flip_acronyms_py,
    merge_acronym_dicts_py,
    sanitize_for_sparql,
)


# ---- pure function tests -----------------------------------------------------


def test_aho_corasick_basic():
    ac = AhoCorasick([("world bank", "ORG", "Q7164"), ("bank", "ORG", "B"), ("kenya", "GPE", "Q114")])
    matches = ac.find("The World Bank and Kenya signed.")
    surfaces = [("the world bank and kenya signed."[b:e], lab) for b, e, lab, _ in matches]
    assert ("world bank", "ORG") in surfaces
    assert ("kenya", "GPE") in surfaces
    # longest-match wins: 'bank' inside 'world bank' must not double-report
    assert ("bank", "ORG") not in surfaces


def test_aho_corasick_word_boundaries():
    ac = AhoCorasick([("un", "ORG", "Q1065")])
    assert ac.find("the UN met.") != []
    assert ac.find("under the bridge") == []
    assert ac.find("fun times") == []


def test_aho_corasick_case_and_accent_insensitive():
    ac = AhoCorasick([("méxico", "GPE", "Q96")])
    assert ac.find("MEXICO is participating") != []
    assert ac.find("in Mexico today") != []


def test_schwartz_hearst_inline():
    text = "The Systematic Tracking of Exchanges in Procurement (STEP) applies here."
    found = extract_inline_acronyms_py(text)
    assert found == {"STEP": "Systematic Tracking of Exchanges in Procurement"}


def test_schwartz_hearst_rejects_non_acronym_parens():
    assert extract_inline_acronyms_py("The budget (see annex 4 for details) grew.") == {}
    assert extract_inline_acronyms_py("growth (7) continued") == {}


def test_glossary_parsing():
    text = "STEP — Systematic Tracking of Exchanges in Procurement\nPAD — Project Appraisal Document"
    out = extract_glossary_acronyms_py("/Abbreviations/", text)
    assert out["STEP"].startswith("Systematic")
    assert out["PAD"] == "Project Appraisal Document"
    # non-glossary sections yield nothing
    assert extract_glossary_acronyms_py("/Introduction/", text) == {}


def test_clean_acronyms_uppercase_ratio():
    # ref tests/test_acronyms.py:80-88 semantics incl. html unescape
    out = clean_acronyms_py({"GDP": "gross &amp; domestic", "notup": "x", "A": "too short", "MoF": "Ministry of Finance"})
    assert out["GDP"] == "gross & domestic"
    assert "notup" not in out
    assert "A" not in out
    assert "MoF" in out  # 2/3 uppercase >= 0.5


def test_merge_first_wins_and_flip():
    # ref tests/test_acronyms.py:66-77
    primary = {"WB": "World Bank"}
    detected = {"WB": "Whole Bean", "UN": "United Nations"}
    merged = merge_acronym_dicts_py(primary, detected)
    assert merged == {"WB": "World Bank", "UN": "United Nations"}
    flipped = flip_acronyms_py(primary, detected)
    assert flipped["World Bank"] == "WB"
    assert flipped["United Nations"] == "UN"
    assert flipped["Whole Bean"] == "WB"


def test_sanitize_for_sparql_rules():
    # ref src/utils.py:4-42
    assert sanitize_for_sparql("  World   Bank ") == "World Bank"
    assert sanitize_for_sparql("a{b}c\\d") == "abcd"
    assert sanitize_for_sparql("<div>html</div>") is None
    assert sanitize_for_sparql("12345") is None
    assert sanitize_for_sparql("a") is None
    assert sanitize_for_sparql("???") is None
    assert sanitize_for_sparql("x" * 201) is None
    assert sanitize_for_sparql('say "hi"') == 'say \\"hi\\"'


# ---- Spark operator tests ------------------------------------------------------


@pytest.fixture(scope="module")
def chunks_df(spark):
    rows = [
        ("D1", "D1_chunk_0", 0, "STEP — Systematic Tracking of Exchanges in Procurement", "/Abbreviations/", None, "D1_chunk_1"),
        ("D1", "D1_chunk_1", 1, "The World Bank supports Kenya. The Environmental and Social Management Framework (ESMF) applies. STEP milestones reached in January 2020.", "/Body/", "D1_chunk_0", None),
        ("D2", "D2_chunk_0", 0, "México and the UN discussed sustainable development.", "/", None, None),
    ]
    return spark.createDataFrame(
        rows, schema="doc_id string, chunk_id string, chunk_idx int, text string, header_path string, prev_id string, next_id string"
    )


def test_extract_acronyms_spark(spark, chunks_df):
    out = extract_acronyms(chunks_df).toPandas()
    d1 = out[out.doc_id == "D1"].set_index("abbr")
    assert d1.loc["STEP", "expansion"].startswith("Systematic Tracking")
    assert d1.loc["STEP", "source"] == "glossary"  # glossary beats inline
    assert d1.loc["ESMF", "expansion"] == "Environmental and Social Management Framework"
    assert d1.loc["ESMF", "source"] == "inline"


def test_extract_mentions_spark(spark, chunks_df):
    from wbkg.extract import build_pattern_rows
    from wbkg.synth import build_entity_dict_rows, build_unbis_rows

    acros = extract_acronyms(chunks_df)
    pats = build_pattern_rows(build_entity_dict_rows(20), build_unbis_rows())
    # add a decoy pattern with an excluded label to exercise P2
    pats.append(("january 2020", "DATE", "decoy"))
    m = extract_mentions(chunks_df, acros, pats).toPandas()

    d1 = m[m.doc_id == "D1"]
    assert "world bank" in set(d1.surface)
    assert "kenya" in set(d1.surface)
    assert "step" in set(d1.surface)  # ACRONYM pattern from doc's own glossary
    assert "DATE" not in set(m.label)  # P2 excluded
    d2 = m[m.doc_id == "D2"]
    assert "mexico" in set(d2.surface)  # accent-folded
    assert "un" in set(d2.surface)
    assert "sustainable development" in set(d2.surface)  # UNBIS term
    # ESMF expansion matched as ACRONYM_EXPANDED (longest match over sector overlap)
    assert "ACRONYM_EXPANDED" in set(d1.label) or "environmental and social management framework" in set(d1.surface)


def test_unicode_acronym_survives_jvm_recheck(spark):
    """ADVICE r01: the Catalyst uppercase re-check must be Unicode-aware
    (\\p{Lu}) so 'ÉSMF' passes both the Python clean and the JVM filter."""
    from wbkg.extract import extract_acronyms

    chunks = spark.createDataFrame(
        [("d1", "Intro", "The École de Santé Mondiale Fédérale (ÉSMF) was funded.")],
        "doc_id string, header_path string, text string",
    )
    out = {r.abbr: r.expansion for r in extract_acronyms(chunks).collect()}
    assert "ÉSMF" in out
    assert out["ÉSMF"] == "École de Santé Mondiale Fédérale"


def test_token_index_matcher_equals_aho_corasick():
    """The engine's word-trie matcher (TokenIndexMatcher) is semantically
    identical to the AhoCorasick implementation the fidelity oracle keeps —
    randomized phrase sets x randomized texts, including punctuation-initial
    phrases, accents, uppercase folds and glued tokens."""
    import random

    from wbkg.extract import AhoCorasick, TokenIndexMatcher

    rng = random.Random(20260816)
    vocab = [
        "world", "bank", "group", "trade", "org", "a", "ab", "x-y", "de",
        "été", "un", "ação", "climate", "fund", "the", "of", "(wb)", "s&p",
        "w.h.o", "2030", "-x", ".net", "green v.",
    ]
    for _ in range(300):
        pats = [
            (" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3))),
             rng.choice(["ORG", "GPE", "TERM"]), f"R{i}")
            for i in range(rng.randint(1, 14))
        ]
        text = " ".join(
            rng.choice(vocab + [",", ".", "xx", "worldbank"])
            for _ in range(rng.randint(0, 40))
        )
        if rng.random() < 0.3:
            text = text.replace(" ", "", 1)
        if rng.random() < 0.2:
            text = text.upper()
        assert AhoCorasick(pats).find(text) == TokenIndexMatcher(pats).find(text), (
            pats, text,
        )


# --- heuristic NER (C5 narrowing, round 4) ---------------------------------

def test_heuristic_ner_candidates_pure():
    from wbkg.extract import heuristic_ner_candidates_py

    texts = [
        "The World Bank and the Ministry of Finance met in Nairobi. "
        "Nairobi hosted the summit. Funding from Global Environment Facility "
        "was approved; later Kenya ratified it and Kenya enacted Project "
        "Green Growth 1.",
    ]
    cands = heuristic_ner_candidates_py(texts)
    assert "Ministry of Finance" in cands
    assert "Global Environment Facility" in cands
    assert "Kenya" in cands  # 2 non-sentence-initial occurrences
    assert "Project Green Growth 1" in cands  # trailing ordinal included
    assert "Nairobi" not in cands  # only 1 non-sentence-initial occurrence
    assert heuristic_ner_candidates_py([""]) == []
    assert heuristic_ner_candidates_py(["no capitals here at all"]) == []
    # determinism: same input -> same ordered output
    assert heuristic_ner_candidates_py(texts) == cands


def test_heuristic_ner_rediscovers_withheld_dictionary():
    """P/R narrowing measurement (VERDICT r03 #5): with the dictionary
    WITHHELD, the capitalized-n-gram emitter must rediscover >= 95% of the
    cased multi-word dictionary labels that literally occur in the synthetic
    corpus — the slice a statistical NER would be expected to catch."""
    from wbkg.extract import heuristic_ner_candidates_py
    from wbkg.synth import build_entity_dict_rows, gen_doc

    import re as _re

    labels = {
        r["label"]
        for r in build_entity_dict_rows(40)
        if " " in r["label"] and _re.match(r"[A-Z][a-z]", r["label"])
    }
    found = total = 0
    for i in range(40):
        d = gen_doc(i, 40, 42)
        text = "\n".join(s["text"] for s in d["spans"])
        gold = {l for l in labels if l in text}
        cands = set(heuristic_ner_candidates_py([s["text"] for s in d["spans"]]))
        total += len(gold)
        # a gold phrase subsumed by a longer emitted phrase ('United States'
        # inside 'United States of America') counts: leftmost-longest
        # matching covers that span
        found += sum(1 for g in gold if g in cands or any(g in c for c in cands))
    assert total > 0
    recall = found / total
    assert recall >= 0.95, f"heuristic NER recall {recall:.3f} on {total} gold"


def test_match_chunk_ruler_first_merge():
    """Dictionary spans beat overlapping heuristic spans; heuristic fills
    the gaps only (ref src/pipeline.py:63-66 entity_ruler before ner)."""
    from wbkg.extract import HEUR_LABEL, TokenIndexMatcher, _match_chunk

    static = TokenIndexMatcher([("world bank", "DICT_ORG", "Q1")])
    heur = TokenIndexMatcher(
        [("World Bank Group", HEUR_LABEL, "world bank group"),
         ("Nairobi Office", HEUR_LABEL, "nairobi office")]
    )
    out = _match_chunk(
        "the World Bank Group opened the Nairobi Office.", static, None, heur
    )
    labels = {(m[4], m[2]) for m in out}
    # 'world bank' (ruler) wins its overlap with 'world bank group'
    assert ("world bank", "DICT_ORG") in labels
    assert all(l != HEUR_LABEL or s == "nairobi office" for s, l in labels)
    assert ("nairobi office", HEUR_LABEL) in labels
