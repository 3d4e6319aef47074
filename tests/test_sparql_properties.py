"""Property-based robustness for the SPARQL surface (hypothesis).

The BGP compiler is a user-facing query parser: arbitrary identifiers,
IRIs and literals flow through it. These properties pin down that (a) any
structurally-valid query parses and compiles to a plan with the declared
columns, (b) string literals round-trip through tokenizer + escape
handling regardless of content, (c) invalid input raises SparqlError, not
an arbitrary exception.
"""

import pytest
from hypothesis import given, settings, strategies as st

from wbkg.sparql import SparqlError, parse_sparql, sparql_select

VAR = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
LOCAL = st.from_regex(r"[A-Za-z_][A-Za-z0-9_.-]{0,10}", fullmatch=True)
# IRI body: anything printable except '>' and whitespace
IRI = st.from_regex(r"[a-z]+://[A-Za-z0-9_./#-]{0,20}", fullmatch=True)


@settings(max_examples=60, deadline=None)
@given(
    vars_=st.lists(VAR, min_size=3, max_size=3, unique=True),
    pred_iri=IRI,
    use_prefix=st.booleans(),
    pfx=st.from_regex(r"[A-Za-z_][A-Za-z0-9_-]{0,6}", fullmatch=True),
    local=LOCAL,
)
def test_any_valid_bgp_parses(vars_, pred_iri, use_prefix, pfx, local):
    s, p, o = vars_
    if use_prefix:
        q = f"PREFIX {pfx}: <{pred_iri}> SELECT ?{s} ?{o} WHERE {{ ?{s} {pfx}:{local} ?{o} . }}"
        want_pred = pred_iri + local
    else:
        q = f"SELECT ?{s} ?{o} WHERE {{ ?{s} <{pred_iri}> ?{o} . }}"
        want_pred = pred_iri
    select_vars, _d, groups, _pfx, _agg, _g, _ov, _lim, _off, _hav = parse_sparql(q)
    assert select_vars == [s, o]
    (grp,) = groups
    patterns = grp.patterns
    (subj, pred, obj), = patterns
    assert subj.kind == "var" and subj.value == s
    assert pred.kind == "const" and pred.value == want_pred
    assert obj.kind == "var" and obj.value == o


# literal content: anything without raw '"' or '\' (those must be escaped)
# and without braces (the grammar's WHERE-block delimiters — documented limit)
LIT_BODY = st.text(
    alphabet=st.characters(blacklist_characters='"\\{}', blacklist_categories=("Cs",)),
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(body=LIT_BODY)
def test_literal_roundtrip_through_parser(body):
    escaped = body.replace("\\", "\\\\").replace('"', '\\"')
    q = f'SELECT ?s WHERE {{ ?s <p:name> "{escaped}" . }}'
    _sv, _d, groups, _pfx, _agg, _g, _ov, _lim, _off, _hav = parse_sparql(q)
    (_s, _p, obj), = groups[0].patterns
    assert obj.kind == "const"
    # the tokenizer may drop tokens it cannot lex only for whitespace-
    # normalized content; the literal itself must survive verbatim
    assert obj.value == body


@settings(max_examples=40, deadline=None)
@given(junk=st.text(max_size=30))
def test_garbage_raises_sparql_error_not_crash(junk):
    q = f"SELECT ?x WHERE {{ {junk} }}"
    try:
        parse_sparql(q)
    except SparqlError:
        pass  # the contract: structured error, never IndexError/TypeError


def test_compiled_columns_match_select(spark):
    g = spark.createDataFrame(
        [("a", "p:x", "b")], "subj string, pred string, obj string"
    )
    out = sparql_select(g, "SELECT ?o ?s WHERE { ?s <p:x> ?o . }")
    assert out.columns == ["o", "s"]  # SELECT order preserved


@settings(max_examples=200, deadline=None)
@given(junk=st.text(max_size=60))
def test_arbitrary_where_text_never_crashes(junk):
    """Fuzz: ANY WHERE-body text either parses or raises SparqlError — the
    parser's error boundary is its own exception type, never IndexError/
    TypeError leaking from tokenizer internals."""
    try:
        parse_sparql("SELECT ?x WHERE { " + junk + " }")
    except SparqlError:
        pass
