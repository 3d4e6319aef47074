"""K1 round-trip — Turtle/N-Triples ingest (the missing half of the K1 sink).

The reference resumes from a saved Turtle file via rdflib
(`load_or_build`, ref src/graph.py:782-811). Here the same entry point is a
distributed line parser: `materialize.to_turtle_lines` writes one
N-Triples-ish line per triple, and `from_turtle_lines` inverts it with pure
Catalyst regexp expressions — no rdflib, no Python in the hot path, so a
multi-TB .nt dump parses at parquet-scan speed (whole-stage codegen over
`spark.read.text`).

Grammar handled (exactly what the sink emits):
    <subj> <pred> <obj-uri> .
    <subj> rdf:type <obj-uri> .
    <subj> <pred> "literal with \" and \\ escapes" .
    <subj> <pred> "literal"@lang .
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one line = subj uri, pred term (uri or bare rdf:* curie), obj term, dot
_LINE_RE = r"^<([^>]*)> (\S+) (.*) \.$"
# a well-formed escaped string: content chars are non-quote/non-backslash or
# backslash-escape pairs, optionally language-tagged
_LIT_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*))?$'


def _unescape(col):
    """Inverse of the sink's escape chain: \\\\ \\" \\n \\r \\t.

    regexp_replace can't do a single-pass multi-escape, so escaped
    backslashes are parked on a \\x00 sentinel first — otherwise the '\\\\n'
    in an escaped backslash-then-n would wrongly become a newline. \\x00
    never occurs in sink output (it would have arrived as a raw control char
    and the sink escapes nothing to \\x00)."""
    _S = "\u0000"  # sentinel: never present in sink output
    s = F.regexp_replace(col, r"\\\\", _S)
    s = F.regexp_replace(s, r"\\n", "\n")
    s = F.regexp_replace(s, r"\\r", "\r")
    s = F.regexp_replace(s, r"\\t", "\t")
    s = F.regexp_replace(s, r"\\(.)", "$1")  # \" and any other \x -> x
    return F.regexp_replace(s, _S, r"\\")


def from_turtle_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Inverse of materialize.to_turtle_lines: lines -> edges
    (subj, pred, obj, obj_is_literal, lang). Malformed lines are dropped."""
    c = F.col(line_col)
    parsed = lines.select(
        F.regexp_extract(c, _LINE_RE, 1).alias("subj"),
        F.regexp_extract(c, _LINE_RE, 2).alias("pred_term"),
        F.regexp_extract(c, _LINE_RE, 3).alias("obj_term"),
    ).filter(F.col("subj") != "")

    pred = F.when(
        F.col("pred_term").startswith("<"),
        F.expr("substring(pred_term, 2, length(pred_term) - 2)"),
    ).otherwise(F.col("pred_term"))

    lit_body = F.regexp_extract("obj_term", _LIT_RE, 1)
    lit_lang = F.regexp_extract("obj_term", _LIT_RE, 2)
    is_uri = F.col("obj_term").startswith("<")
    obj = F.when(
        is_uri, F.expr("substring(obj_term, 2, length(obj_term) - 2)")
    ).otherwise(_unescape(lit_body))
    lang = F.when(is_uri | (lit_lang == ""), F.lit(None).cast("string")).otherwise(lit_lang)

    return parsed.select(
        "subj",
        pred.alias("pred"),
        obj.alias("obj"),
        (~is_uri).alias("obj_is_literal"),
        lang.alias("lang"),
    )


def save_turtle(edges: DataFrame, path: str) -> None:
    """K1 sink: edges -> one-triple-per-line text files."""
    from wbkg.materialize import to_turtle_lines

    to_turtle_lines(edges).write.mode("overwrite").text(path)


def load_turtle(spark: SparkSession, path: str) -> DataFrame:
    """K1 ingest: text files -> edges."""
    return from_turtle_lines(spark.read.text(path), line_col="value")


def load_or_build(spark: SparkSession, path: str, build_fn) -> DataFrame:
    """Mirror of the reference's load-else-build entry point (ref
    src/graph.py:782-811): return the saved graph if the Turtle dump exists,
    else build it with build_fn() and save it."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        return load_turtle(spark, path)
    edges = build_fn()
    save_turtle(edges, path)
    return load_turtle(spark, path)
