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


# ---------------------------------------------------------------------------- #
# Full Turtle 1.1 grammar (VERDICT r02: a .ttl written by the reference's      #
# rdflib serializer must load, not just our own N-Triples sink output)          #
# ---------------------------------------------------------------------------- #

RDFLIB_STYLE = """\
@prefix ex: <http://worldbank.example.org/> .
@prefix schema1: <http://schema.org/> .
@prefix wd: <http://www.wikidata.org/entity/> .

<http://worldbank.example.org/document/D1> a schema1:CreativeWork ;
    schema1:name "Wind Turbine Project"@en ;
    schema1:mentions wd:Q42,
        wd:Q7,
        ex:entity\\/X1 ;
    schema1:identifier "D1" ;
    schema1:dateModified "2020-01-01"^^<http://www.w3.org/2001/XMLSchema#date> ;
    schema1:position 3 ;
    schema1:score 0.95 .

wd:Q42 schema1:name "line one\\nwith \\"quotes\\" and \\u00e9" .
# full-line comment
wd:Q7 schema1:description '''a long
multiline "string" here''' .
"""


def test_parse_turtle_text_rdflib_style():
    from wbkg.ttl import parse_turtle_text

    got = set(parse_turtle_text(RDFLIB_STYLE))
    S, W, E = "http://schema.org/", "http://www.wikidata.org/entity/", "http://worldbank.example.org/"
    d1 = E + "document/D1"
    assert (d1, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", S + "CreativeWork", False, None, None) in got
    assert (d1, S + "name", "Wind Turbine Project", True, "en", None) in got
    # ',' object list fan-out + PN_LOCAL escape
    assert (d1, S + "mentions", W + "Q42", False, None, None) in got
    assert (d1, S + "mentions", E + "entity/X1", False, None, None) in got
    # typed + numeric literals
    assert (d1, S + "dateModified", "2020-01-01", True, None, "http://www.w3.org/2001/XMLSchema#date") in got
    assert (d1, S + "position", "3", True, None, "http://www.w3.org/2001/XMLSchema#integer") in got
    assert (d1, S + "score", "0.95", True, None, "http://www.w3.org/2001/XMLSchema#decimal") in got
    # string escapes + unicode, and triple-quoted multiline string
    assert (W + "Q42", S + "name", 'line one\nwith "quotes" and é', True, None, None) in got
    assert (W + "Q7", S + "description", 'a long\nmultiline "string" here', True, None, None) in got
    assert len(got) == 11


def test_parse_turtle_unsupported_is_loud():
    import pytest as _pytest

    from wbkg.ttl import TurtleSyntaxError, parse_turtle_text

    with _pytest.raises(TurtleSyntaxError):
        parse_turtle_text("<http://a> <http://p> undefined:name .")
    with _pytest.raises(TurtleSyntaxError):
        parse_turtle_text("<http://a> <http://p> ( <http://x> .")  # unterminated
    with _pytest.raises(TurtleSyntaxError):
        parse_turtle_text("<http://a> <http://p> [ <http://q> .")  # unterminated


def test_load_turtle_full_distributed(spark, tmp_path):
    """Grammar parse through mapInPandas (per-file parallelism): two part
    files -> one edges frame; rdf:type normalized to engine convention."""
    from wbkg.ttl import load_turtle_full

    d = tmp_path / "full_ttl"
    d.mkdir()
    (d / "part-0.ttl").write_text(RDFLIB_STYLE)
    (d / "part-1.ttl").write_text(
        '@prefix schema1: <http://schema.org/> .\n'
        '<http://x/1> a schema1:Thing ; schema1:name "two" .\n'
    )
    out = load_turtle_full(spark, str(d))
    rows = {(r.subj, r.pred, r.obj, r.obj_is_literal, r.lang) for r in out.collect()}
    assert ("http://x/1", "rdf:type", "http://schema.org/Thing", False, None) in rows
    assert len(rows) == 13


def test_pretty_roundtrip(spark, tmp_path, tricky_edges):
    """Real-Turtle sink (subject grouping, @prefix header, `a`) -> grammar
    parser -> identical edge set."""
    from wbkg.ttl import load_turtle_full, save_turtle_pretty

    path = str(tmp_path / "pretty_ttl")
    save_turtle_pretty(tricky_edges, path)
    back = load_turtle_full(spark, path)
    assert _as_set(back) == _as_set(tricky_edges)


def test_load_or_build_auto_dispatch(spark, tmp_path, tricky_edges):
    """load_or_build on a full-grammar Turtle dump (as the reference would
    leave behind) parses it rather than silently dropping every line."""
    from wbkg.ttl import load_or_build, save_turtle_pretty

    path = str(tmp_path / "auto_ttl")
    save_turtle_pretty(tricky_edges, path)
    loaded = load_or_build(spark, path, lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")))
    assert _as_set(loaded) == _as_set(tricky_edges)


def test_parse_turtle_prefix_named_prefix():
    """A legal prefixed name whose prefix is literally 'prefix'/'base' must
    not be misparsed as a SPARQL-form directive (directive keywords require
    trailing whitespace)."""
    from wbkg.ttl import parse_turtle_text

    t = (
        "@prefix prefix: <http://p.example/> .\n"
        "@prefix base: <http://b.example/> .\n"
        "prefix:foo <http://pred> base:bar .\n"
    )
    assert parse_turtle_text(t) == [
        ("http://p.example/foo", "http://pred", "http://b.example/bar", False, None, None)
    ]


# --- ADVICE r03 regressions -------------------------------------------------

def test_resolve_base_keeps_schemeful_iris():
    """@base must not mangle absolute IRIs whose scheme has no '://' (urn:,
    mailto:), and relative IRIs sharing a prefix with base still resolve."""
    from wbkg.ttl import parse_turtle_text

    text = (
        "@base <http://b/> .\n"
        "<urn:s> <mailto:p@x.org> <rel> .\n"
        "<http:stillabs> <http://b/p> <http://b/already> .\n"
    )
    triples = parse_turtle_text(text)
    subjects = {t[0] for t in triples}
    assert subjects == {"urn:s", "http:stillabs"}
    s, p, o = triples[0][:3]
    assert (s, p, o) == ("urn:s", "mailto:p@x.org", "http://b/rel")
    # relative IRI that shares a prefix with base's path still resolves
    t2 = parse_turtle_text("@base <http://b/> .\n<http2rel> <http://p> <x> .\n")
    # 'http2rel' has no scheme (digit before ':'? no ':' at all) -> resolved
    assert t2[0][0] == "http://b/http2rel"


def test_trailing_dot_terminates_pname_and_number():
    """'ex:a ex:p ex:b.' and '... 42.' are legal Turtle: PN_LOCAL/number must
    not eat the statement terminator."""
    from wbkg.ttl import parse_turtle_text

    triples = parse_turtle_text(
        "@prefix ex: <http://e/> .\nex:a ex:p ex:b.\nex:a ex:n 42.\n"
    )
    assert ("http://e/a", "http://e/p", "http://e/b", False, None, None) in triples
    num = [t for t in triples if t[1] == "http://e/n"][0]
    assert num[2] == "42" and num[5].endswith("integer")
    # dotted locals still parse when the dot is interior or escaped
    t2 = parse_turtle_text("@prefix ex: <http://e/> .\nex:a.b ex:p ex:c\\. .\n")
    assert t2[0][0] == "http://e/a.b" and t2[0][2] == "http://e/c."


def test_blank_label_trailing_dot():
    from wbkg.ttl import parse_turtle_text

    triples = parse_turtle_text("@prefix ex: <http://e/> .\n_:x1 ex:p _:y2.\n")
    assert triples[0][0] == "_:x1" and triples[0][2] == "_:y2"


def test_blank_node_property_lists_and_collections():
    """Turtle 1.1 blankNodePropertyList + collection productions (round 4 —
    previously a loud 'not supported')."""
    from wbkg.ttl import parse_turtle_text

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    t = (
        "@prefix ex: <http://e/> .\n"
        'ex:a ex:knows [ ex:name "Bob" ; ex:age 42 ] .\n'
        '[ ex:label "anon" ] .\n'
        "[ ex:p ex:q ] ex:r ex:s .\n"
        'ex:list ex:items ( "one" 2 ex:three ) .\n'
        "ex:empty ex:items () .\n"
    )
    triples = parse_turtle_text(t)
    by_pred = {}
    for s, p, o, lit, lang, dt in triples:
        by_pred.setdefault(p, []).append((s, o, lit))

    # [ ... ] as object: fresh bnode carries the inner triples
    (knows,) = by_pred["http://e/knows"]
    bnode = knows[1]
    assert bnode.startswith("_:") and not knows[2]
    assert ("Bob") in [o for s, o, _l in by_pred["http://e/name"] if s == bnode]
    # [ ... ] as subject with outer po-list
    (r_edge,) = by_pred["http://e/r"]
    assert r_edge[0].startswith("_:")
    # collection: first/rest chain ending in nil; () is nil itself
    firsts = [o for _s, o, _l in by_pred[RDF + "first"]]
    assert firsts == ["one", "2", "http://e/three"]
    rests = [o for _s, o, _l in by_pred[RDF + "rest"]]
    assert rests.count(RDF + "nil") == 1
    empties = [o for _s, o, _l in by_pred["http://e/items"]]
    assert RDF + "nil" in empties
    # generated bnode labels never collide with each other
    gen = {x for s, p, o, *_ in triples for x in (s, o) if str(x).startswith("_:")}
    assert len(gen) == 6  # knows-bnode, anon, r-subject, three list cells
