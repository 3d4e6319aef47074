"""Property-based chunker invariants (hypothesis): no text is lost or
reordered by the fold, regardless of span composition (SURVEY §5.2.3)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from wbkg.chunker import chunk_spans_py

WORD = st.from_regex(r"[a-z]{1,8}", fullmatch=True)
SENTENCE = st.lists(WORD, min_size=1, max_size=8).map(lambda w: " ".join(w) + ".")

TEXT_SPAN = st.lists(SENTENCE, min_size=1, max_size=4).map(
    lambda s: {"kind": "text", "text": " ".join(s), "media_ref": ""}
)
HEADER_SPAN = st.tuples(st.integers(1, 3), WORD).map(
    lambda t: {"kind": "header", "text": f"{t[0]}|H{t[1]}", "media_ref": ""}
)
IMAGE_SPAN = st.just({"kind": "image", "text": "fig", "media_ref": "a.png"})
TABLE_SPAN = WORD.map(
    lambda w: {
        "kind": "table",
        "text": f"<table><tr><td>{w}</td></tr></table>",
        "media_ref": "t.html",
    }
)

SPANS = st.lists(
    st.one_of(TEXT_SPAN, HEADER_SPAN, IMAGE_SPAN, TABLE_SPAN), min_size=0, max_size=12
).map(lambda spans: [dict(s, offset=i) for i, s in enumerate(spans)])


@given(SPANS)
@settings(max_examples=150, deadline=None)
def test_no_text_lost_and_order_preserved(spans):
    chunks = chunk_spans_py(spans, chunk_size=50, chunk_overlap=5)
    joined = " ".join(c["text"] for c in chunks)
    # every text-span sentence survives somewhere
    for s in spans:
        if s["kind"] == "text":
            for sent in s["text"].split(". "):
                sent = sent.strip().rstrip(".")
                if sent:
                    assert sent in joined
        elif s["kind"] == "table":
            cell = re.search(r"<td>(\w+)</td>", s["text"]).group(1)
            assert cell in joined
        elif s["kind"] == "image":
            assert "a.png" not in joined
    # chunk_idx dense and ordered
    assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
    # header paths always wrapped in separators
    for c in chunks:
        assert c["header_path"].startswith("/") and c["header_path"].endswith("/")


@given(SPANS)
@settings(max_examples=60, deadline=None)
def test_fold_is_deterministic(spans):
    a = chunk_spans_py(spans)
    b = chunk_spans_py(list(reversed(spans)))  # offset sort must normalize order
    assert a == b
