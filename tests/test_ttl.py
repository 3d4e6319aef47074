"""K1 round-trip: load(save(edges)) == edges, incl. lang tags and escapes."""

import pytest
from pyspark.sql import functions as F

from wbkg.ttl import from_turtle_lines, load_or_build, load_turtle, save_turtle


@pytest.fixture()
def tricky_edges(spark):
    rows = [
        ("http://ex.org/a", "http://schema.org/name", 'He said "hi"', True, None),
        ("http://ex.org/a", "http://schema.org/path", "C:\\tmp\\x", True, None),
        ("http://ex.org/a", "http://schema.org/alt", 'trailing backslash\\', True, None),
        ("http://ex.org/a", "http://schema.org/label", "bonjour", True, "fr"),
        ("http://ex.org/a", "http://schema.org/note", 'mix "q" and \\ and @en inside', True, None),
        # control chars must survive (ADVICE r02: unescaped \n split a triple
        # across lines and silently dropped both halves)
        ("http://ex.org/a", "http://schema.org/abstract", "line one\nline two\nthree", True, None),
        ("http://ex.org/a", "http://schema.org/csv", "a\tb\tc\r\nnext", True, None),
        ("http://ex.org/a", "http://schema.org/hard", "backslash-n literal: \\n vs real\n", True, None),
        ("http://ex.org/a", "http://schema.org/endsat", 'looks tagged\\"@en', True, None),
        ("http://ex.org/a", "rdf:type", "http://schema.org/Thing", False, None),
        ("http://ex.org/a", "http://schema.org/isPartOf", "http://ex.org/b", False, None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean, lang string"
    )


def _as_set(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.lang)
        for r in df.select("subj", "pred", "obj", "obj_is_literal", "lang").collect()
    }


def test_roundtrip_exact_set(spark, tmp_path, tricky_edges):
    path = str(tmp_path / "graph_nt")
    save_turtle(tricky_edges, path)
    assert _as_set(load_turtle(spark, path)) == _as_set(tricky_edges)


def test_load_or_build(spark, tmp_path, tricky_edges):
    path = str(tmp_path / "lob_nt")
    calls = []

    def build():
        calls.append(1)
        return tricky_edges

    first = load_or_build(spark, path, build)
    assert _as_set(first) == _as_set(tricky_edges) and calls == [1]
    second = load_or_build(spark, path, build)  # must NOT rebuild
    assert _as_set(second) == _as_set(tricky_edges) and calls == [1]


def test_malformed_lines_dropped(spark):
    lines = spark.createDataFrame(
        [("not a triple",), ("<http://a> <http://p> <http://b> .",), ("",)], "line string"
    )
    out = from_turtle_lines(lines).collect()
    assert len(out) == 1 and out[0].subj == "http://a"
