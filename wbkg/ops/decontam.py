"""Benchmark decontamination for training-data pipelines.

A corpus destined for model training must not contain the evaluation
benchmarks the model will be scored on. The standard check (GPT-3 appendix C
style) is word n-gram overlap: a document is contaminated if it contains a
large fraction of some benchmark item's n-grams verbatim.

Scale shape (100 TB corpus, ~10^5-10^6 benchmark items): the benchmark side
is tiny relative to the corpus, so its shingle table is BROADCAST — the
corpus-side shingle stream never shuffles for the probe; the only exchange
is the partial-aggregated (doc_id, bench_id) match counts. Contrast with
dedup: this is corpus x small-reference, not corpus x corpus, so no LSH is
needed — the broadcast inverted index IS the exact answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wbkg.ops.dedup import shingles_df


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_text: str = "text",
    doc_id: str = "doc_id",
    bench_text: str = "text",
    bench_id: str = "bench_id",
    n: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """-> one row per document: (doc_id, top_bench_id, max_overlap,
    contaminated).

    max_overlap = max over benchmark items of
        |doc n-grams  INTERSECT  item n-grams| / |item n-grams|
    (the denominator is the BENCHMARK item's shingle count: a 100-word doc
    fully containing a 12-word eval prompt scores 1.0 — containment, not
    symmetric jaccard, is what leaks eval answers). top_bench_id is the
    arg-max item (ties -> smallest bench_id); docs with zero matching
    n-grams report (null, 0.0, false).

    Plan: corpus shingles probe a broadcast of the benchmark shingle table;
    match counts partial-aggregate map-side on (doc_id, bench_id); the
    per-doc arg-max is a row_number window over doc_id. The corpus is
    scanned once and shuffles only the match counts (pair-bounded, tiny)."""
    doc_sh = shingles_df(docs, doc_text, doc_id, n)
    bench_sh = (
        shingles_df(benchmark, bench_text, bench_id, n)
        .withColumnRenamed("doc_id", "bench_id")
    )
    sizes = bench_sh.groupBy("bench_id").agg(F.count("*").alias("bench_n"))

    matched = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("matched"))
        .join(F.broadcast(sizes), "bench_id")
        .withColumn("overlap", F.round(F.col("matched") / F.col("bench_n"), 4))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("overlap"), F.asc("bench_id"))
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("bench_id").alias("top_bench_id"), F.col("overlap").alias("max_overlap"))
    )
    out = docs.select(F.col(doc_id).alias("doc_id")).join(best, "doc_id", "left")
    return out.select(
        "doc_id",
        "top_bench_id",
        F.coalesce("max_overlap", F.lit(0.0)).alias("max_overlap"),
        (F.coalesce("max_overlap", F.lit(0.0)) >= threshold).alias("contaminated"),
    )
