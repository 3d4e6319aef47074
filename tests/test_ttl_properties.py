"""Property-based coverage for the Turtle surfaces (VERDICT r04 #7).

Three properties, mirroring what test_sparql_properties.py does for the
query parser:

1. N-Triples-style sink round-trip: ANY literal content (control chars,
   quotes, backslash runs, unicode) survives to_turtle_lines ->
   from_turtle_lines bit-exactly.
2. Pretty-Turtle sink round-trip: the subject-grouped `;`/`,`-style sink
   output re-parses (pure-Python parse_turtle_text) to the same triple set.
3. Grammar fixpoint: for generated documents exercising blank-node property
   lists, collections, numeric/boolean literals, language tags and
   datatypes, parse(serialize(parse(doc))) == parse(doc) — the r04 grammar
   additions (bnodes, collections) hold under arbitrary nesting, not just
   the hand-picked unit-test documents.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from wbkg.materialize import to_turtle_lines
from wbkg.ttl import from_turtle_lines, parse_turtle_text, to_turtle_pretty

# characters the escape paths must handle: quotes, backslashes, the escaped
# control trio, plus arbitrary printable unicode (no surrogates)
LIT_TEXT = st.text(
    alphabet=st.one_of(
        st.sampled_from(list('"\\\n\r\t@<>^;,. ')),
        st.characters(min_codepoint=32, exclude_categories=("Cs", "Cc")),
    ),
    max_size=30,
)
IRI = st.from_regex(r"http://[a-z]{1,6}\.org/[A-Za-z0-9_./#-]{1,10}", fullmatch=True)
LANG = st.one_of(st.none(), st.from_regex(r"[a-z]{2}(-[a-z0-9]{1,4})?", fullmatch=True))

EDGE = st.tuples(IRI, IRI, LIT_TEXT, st.just(True), LANG) | st.tuples(
    IRI, IRI, IRI, st.just(False), st.none()
)


def _as_set(rows):
    return {(r.subj, r.pred, r.obj, r.obj_is_literal, r.lang) for r in rows}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(EDGE, min_size=1, max_size=8))
def test_nt_sink_roundtrip_property(spark, edges):
    df = spark.createDataFrame(
        list(set(edges)),
        "subj string, pred string, obj string, obj_is_literal boolean, lang string",
    )
    back = from_turtle_lines(to_turtle_lines(df))
    assert _as_set(back.collect()) == _as_set(df.collect())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(EDGE, min_size=1, max_size=8))
def test_pretty_sink_roundtrip_property(spark, edges):
    rows = list(set(edges))
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean, lang string"
    )
    doc = "".join(r.line for r in to_turtle_pretty(df).collect())
    got = {(s, p, o, lit, lang) for s, p, o, lit, lang, _dt in parse_turtle_text(doc)}
    assert got == {(s, p, o, lit, lang) for s, p, o, lit, lang in rows}


# ---------------------------------------------------------------------------- #
# pure-grammar fixpoint: bnodes + collections under arbitrary nesting          #
# ---------------------------------------------------------------------------- #

SIMPLE_IRI = st.from_regex(r"http://[a-z]{1,5}\.org/[A-Za-z0-9_]{1,6}", fullmatch=True)


def _lit_src(text, lang):
    esc = (
        text.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return f'"{esc}"' + (f"@{lang}" if lang else "")


_SIMPLE_OBJ = st.one_of(
    SIMPLE_IRI.map(lambda i: f"<{i}>"),
    st.tuples(LIT_TEXT, LANG).map(lambda t: _lit_src(*t)),
    st.integers(-999, 999).map(str),
    st.sampled_from(["true", "false", "1.5", "2e3"]),
)

# object position: simple term | collection of simple terms | nested
# blank-node property list (depth-bounded by st.recursive's max_leaves)
_OBJ_SRC = st.recursive(
    _SIMPLE_OBJ,
    lambda children: st.one_of(
        st.lists(_SIMPLE_OBJ, min_size=0, max_size=3).map(
            lambda xs: "( " + " ".join(xs) + " )"
        ),
        st.lists(
            st.tuples(SIMPLE_IRI, children), min_size=1, max_size=2
        ).map(lambda pos: "[ " + " ; ".join(f"<{p}> {o}" for p, o in pos) + " ]"),
    ),
    max_leaves=6,
)


def _serialize(triples):
    """Pure-Python N-Triples-ish twin of the sink, bnode labels kept."""
    out = []
    for s, p, o, is_lit, lang, dtype in triples:
        st_ = s if s.startswith("_:") else f"<{s}>"
        if is_lit:
            ot = _lit_src(o, None)
            if lang:
                ot += f"@{lang}"
            elif dtype:
                ot += f"^^<{dtype}>"
        else:
            ot = o if o.startswith("_:") else f"<{o}>"
        out.append(f"{st_} <{p}> {ot} .")
    return "\n".join(out)


@settings(max_examples=60, deadline=None)
@given(
    subj=SIMPLE_IRI,
    pos=st.lists(st.tuples(SIMPLE_IRI, _OBJ_SRC), min_size=1, max_size=3),
)
def test_grammar_fixpoint_bnodes_collections(subj, pos):
    doc = f"<{subj}> " + " ;\n  ".join(f"<{p}> {o}" for p, o in pos) + " .\n"
    first = parse_turtle_text(doc)
    again = parse_turtle_text(_serialize(first))
    assert sorted(first) == sorted(again)
    # generated bnode labels are deterministic: re-parsing the same document
    # assigns the same labels
    assert parse_turtle_text(doc) == first


@settings(max_examples=200, deadline=None)
@given(junk=st.text(max_size=80))
def test_arbitrary_turtle_text_never_crashes(junk):
    """Fuzz: any input either parses or raises TurtleSyntaxError/ValueError
    — no foreign exceptions escape the grammar."""
    from wbkg.ttl import TurtleSyntaxError

    try:
        parse_turtle_text(junk)
    except (TurtleSyntaxError, ValueError):
        pass
