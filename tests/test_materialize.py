from pyspark.sql import functions as F

from wbkg.materialize import (
    dedup_latest,
    sanitize_column,
    sanitize_str_py,
    to_turtle_lines,
    union_distinct,
)


def test_sanitize_column_matches_pure(spark):
    vals = ["México City", "a-b-c", "  x  y ", "nan", "Türkiye", None, "__pad__"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r.s for r in df.select(sanitize_column(F.col("v")).alias("s")).collect()]
    want = [sanitize_str_py(v) if v is not None else None for v in vals]
    # Spark translate(null) -> null; pure fn mirrors
    assert got == want
    assert got[0] == "Mexico_City"
    assert got[3] is None  # 'nan' -> null (ref graph.py:148)
    assert got[4] == "Turkiye"
    assert got[6] == "pad"


def test_dedup_latest_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("d1", "old", "2024-01-01 00:00:00"),
            ("d1", "new", "2024-02-01 00:00:00"),
            ("d2", "only", "2024-01-01 00:00:00"),
        ],
        "id string, display_title string, last_modified_date string",
    ).withColumn("last_modified_date", F.col("last_modified_date").cast("timestamp"))
    out = {r.id: r.display_title for r in dedup_latest(df).collect()}
    assert out == {"d1": "new", "d2": "only"}


def test_union_distinct_collapses(spark):
    e = spark.createDataFrame(
        [("s", "p", "o", False, None)],
        "subj string, pred string, obj string, obj_is_literal boolean, lang string",
    )
    assert union_distinct(e, e, e).count() == 1


def test_turtle_lines(spark):
    e = spark.createDataFrame(
        [
            ("http://x/s", "http://schema.org/name", 'va"l', True, "en"),
            ("http://x/s", "rdf:type", "http://schema.org/Thing", False, None),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, lang string",
    )
    lines = sorted(r.line for r in to_turtle_lines(e).collect())
    assert lines[0] == '<http://x/s> <http://schema.org/name> "va\\"l"@en .'
    assert lines[1] == "<http://x/s> rdf:type <http://schema.org/Thing> ."
