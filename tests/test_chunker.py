"""Chunker (C1) parity tests.

The first four tests port the reference's deterministic parser assertions
(/root/reference/tests/test_custom_parser.py:26-105) onto chunk_spans_py.
"""

import pandas as pd

from wbkg.chunker import chunk_documents, chunk_spans_py, html_table_to_markdown, split_text


def _spans(*elems):
    out = []
    for i, (kind, text) in enumerate(elems):
        out.append({"kind": kind, "text": text, "media_ref": "", "offset": i})
    return out


def test_header_splits():
    # ref tests/test_custom_parser.py:26-42
    chunks = chunk_spans_py(
        _spans(
            ("header", "1|Header 1"),
            ("text", "Paragraph under header 1."),
            ("header", "1|Header 2"),
            ("text", "Paragraph under header 2."),
        )
    )
    assert len(chunks) == 2
    assert "Header 1" in chunks[0]["header_path"]
    assert "Paragraph under header 1." in chunks[0]["text"]
    assert "Header 2" in chunks[1]["header_path"]
    assert "Paragraph under header 2." in chunks[1]["text"]


def test_pre_header_content():
    # ref tests/test_custom_parser.py:45-59
    chunks = chunk_spans_py(
        _spans(
            ("text", "pre-header content."),
            ("header", "1|Header 1"),
            ("text", "Paragraph under header 1."),
        )
    )
    assert len(chunks) == 2
    assert "pre-header content." in chunks[0]["text"]
    assert chunks[0]["header_path"] == "/"
    assert "Header 1" in chunks[1]["header_path"]
    assert "Paragraph under header 1." in chunks[1]["text"]


def test_header_metadata_stack_truncation():
    # ref tests/test_custom_parser.py:62-80 (level-1 reset + deeper truncation)
    chunks = chunk_spans_py(
        _spans(
            ("header", "1|Main Header"),
            ("text", "Paragraph under header 1."),
            ("header", "2|Sub-header"),
            ("text", "Paragraph under header 2."),
            ("header", "3|Sub-sub-header"),
            ("text", "Paragraph under header 3."),
            ("header", "1|New title"),
        )
    )
    assert len(chunks) == 4
    assert chunks[0]["header_path"] == "/Main Header/"
    assert chunks[1]["header_path"] == "/Main Header/Sub-header/"
    assert chunks[2]["header_path"] == "/Main Header/Sub-header/Sub-sub-header/"
    assert chunks[3]["header_path"] == "/New title/"


def test_same_level_header_replaces_sibling():
    # parser.py:141 keeps lvl < level strictly: a level-2 header after a
    # level-2 header replaces the sibling, not nests under it
    chunks = chunk_spans_py(
        _spans(
            ("header", "1|Top"),
            ("header", "2|A"),
            ("text", "a"),
            ("header", "2|B"),
            ("text", "b"),
        )
    )
    assert chunks[-1]["header_path"] == "/Top/B/"


def test_table_parsing():
    # ref tests/test_custom_parser.py:83-96; also verifies the table is
    # flushed as its own section while text keeps accumulating
    chunks = chunk_spans_py(
        _spans(
            ("header", "1|Header 1"),
            ("table", "<table><tr><td>Cell 1</td><td>Cell 2</td></tr></table>"),
            ("text", "Paragraph after table."),
        )
    )
    assert len(chunks) == 2
    assert "Cell 1" in chunks[0]["text"] and "Cell 2" in chunks[0]["text"]
    # the header line stays in the text buffer and flushes with trailing text
    assert "Paragraph after table." in chunks[1]["text"]
    assert "# Header 1" in chunks[1]["text"]


def test_images_and_unknown_kinds_skipped():
    chunks = chunk_spans_py(
        _spans(("text", "before."), ("image", "Figure 1"), ("weird", "x"), ("text", "after."))
    )
    assert len(chunks) == 1
    assert "Figure 1" not in chunks[0]["text"]
    assert "before." in chunks[0]["text"] and "after." in chunks[0]["text"]


def test_empty_header_skipped():
    # parser.py:135-137
    chunks = chunk_spans_py(_spans(("header", "1|  "), ("text", "body.")))
    assert len(chunks) == 1
    assert chunks[0]["header_path"] == "/"


def test_long_section_sentence_split_with_overlap():
    sents = [f"Sentence number {i} has exactly six words." for i in range(100)]
    chunks = chunk_spans_py(
        _spans(("header", "1|Long"), ("text", " ".join(sents))),
        chunk_size=100,
        chunk_overlap=20,
    )
    assert len(chunks) > 3
    # every chunk respects the budget
    for c in chunks:
        assert len(c["text"].split()) <= 101  # +header line tokens
    # overlap: consecutive chunks share trailing/leading sentences
    assert chunks[1]["text"].split(".")[0] + "." in chunks[0]["text"]
    # no sentence lost
    joined = " ".join(c["text"] for c in chunks)
    for s in sents:
        assert s in joined


def test_split_text_oversized_sentence():
    words = " ".join(["w"] * 250)
    parts = split_text(words, chunk_size=100, chunk_overlap=10)
    assert all(len(p.split()) <= 100 for p in parts)
    assert sum(len(p.split()) for p in parts) >= 250


def test_html_table_to_markdown_header_row():
    md = html_table_to_markdown(
        "<table><tr><th>Country</th><th>Amount</th></tr><tr><td>Kenya</td><td>5M</td></tr></table>"
    )
    assert "| Country | Amount |" in md
    assert "| Kenya | 5M |" in md


def test_spark_chunker_matches_pure_fold(spark):
    from wbkg.synth import gen_doc

    docs = [gen_doc(i, 20) for i in range(20)]
    sdf = spark.createDataFrame(
        [(d["doc_id"], d["spans"]) for d in docs], schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    got = chunk_documents(sdf).toPandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    expected_rows = []
    for d in docs:
        for c in chunk_spans_py(d["spans"]):
            expected_rows.append(
                {"doc_id": d["doc_id"], "chunk_idx": c["chunk_idx"], "text": c["text"], "header_path": c["header_path"]}
            )
    exp = pd.DataFrame(expected_rows).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got["text"].values == exp["text"].values).all()
    assert (got["header_path"].values == exp["header_path"].values).all()
    # prev/next relationships (ref parser.py:185-189)
    first = got[got["chunk_idx"] == 0]
    assert first["prev_id"].isna().all()


def test_span_sequence_invariant_preserved(spark):
    """input_hint invariant: the spans column passes through unchanged —
    chunking derives from it without mutating (kind, text, media_ref, order)."""
    from wbkg.synth import gen_doc, gen_documents_df

    n = 10
    sdf = gen_documents_df(spark, n)
    got = {r["doc_id"]: r["spans"] for r in sdf.collect()}
    for i in range(n):
        d = gen_doc(i, n)
        spans = [tuple(s.asDict().values()) for s in got[d["doc_id"]]]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]]
        assert spans == exp
