"""Deduplication operators for training-data pipelines.

Five strategies, scale-ranked:

- exact_dedup: md5 hash-groupBy — one shuffle on the hash, partial agg
  map-side.
- ngram_jaccard_pairs: word n-gram shingles -> explode -> shingle equi-join
  -> pair-count / union-size jaccard. The shingle join is the classic
  inverted-index trick: pairs only materialize for docs sharing a shingle.
  A document-frequency cap drops ubiquitous shingles (the skew/explosion
  guard — a stopword shingle would otherwise produce |df|^2 pairs).
- minhash_lsh_pairs: k minhash signatures (vectorized numpy over Arrow
  batches), banded LSH -> band-bucket equi-join for candidates -> exact
  jaccard verify on candidates only. This is the 100 TB path: cost is
  O(docs x k) + join on (band, bucket), never all-pairs.
- ngram_jaccard_pairs_prefiltered: the two above composed — minhash-LSH
  candidates, then the EXACT df-capped n-gram jaccard verified per pair via
  array_intersect (no shingle self-join). High-threshold regime.
- simhash64: 64-bit simhash fingerprint; near-dups differ in <= 3 bits.
  Banded into 4x16-bit keys for the same bucket-join pattern.
- embedding_near_dup: cosine >= threshold pairs over normalized embeddings;
  banded multi-table hyperplane LSH (n_bands independent sign-bit tables,
  per-bucket size cap) generates candidates, exact dot verifies — candidate
  volume is capped per bucket, never Sigma|bucket|^2 over one small table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    """Deterministic 63-bit string hash (python's builtin hash() is
    process-seeded and would differ across executors)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big") >> 1


def _stable_hash32(s: str) -> int:
    """32-bit variant for minhash: keeps (a*h + b) inside uint64 so the
    permutation math stays vectorized numpy (no Python-object bigints)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest(), "big")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (keep_id, dup_count): representative (min id) per exact-text group."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def shingles_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """word n-gram shingles via pure SQL expressions: slide a window over the
    split array with transform(sequence(...)) — no Python.

    The split array is materialized in its own projection and each window is
    array_join(slice(...)) rather than n element_at() calls: with the split
    inline, Catalyst re-evaluated the regex split inside EVERY element_at of
    the transform lambda — O(words x n) regex splits per document. Measured
    at sf0.1: 7.9s -> 1.2s for the identical 286k-shingle output."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    w = F.col("_w")
    k = F.greatest(F.size(w) - (n - 1), F.lit(0))
    # sequence(0, k-1) DESCENDS to [0,-1] when k=0 (Spark sequence is
    # bidirectional) and slice(w, 0, n) then throws
    # INVALID_PARAMETER_VALUE.START, aborting the job on any doc shorter
    # than n words — common for n=8 decontamination prompts. Guard so short
    # docs yield zero shingles instead.
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    return base.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """-> (doc_a, doc_b, jaccard) for pairs with jaccard >= threshold.

    Sizes and intersections are BOTH computed on the df-capped shingle set
    (`kept`), so the jaccard is the exact jaccard of the capped sets — no
    asymmetric bias from mixing capped intersections with uncapped sizes.
    No persist: the df-cap is a count() window over the shingle partition,
    so `kept` is already hash-partitioned on `shingle` and BOTH sides of the
    self-join reuse that one exchange (ReusedExchange); only the doc-sizes
    branch recomputes the shingle scan (pure whole-stage codegen — cheaper
    than pinning doc_count x shingles rows in executor memory at 100 TB).
    Measured at sf0.1/local[32]: 10.2s vs 13.9s for the r01
    persist+aggregate-join formulation. (r07 also tried the map-side
    sorted-doc-array pair fold that a5/link_prediction use: identical
    output, 13.2s -> 12.2s warm on the 10x near-dup tiling — marginal, and
    its shingle-table checkpoint broke the op's pinned no-persist-leak
    contract, so the window formulation stays.)"""
    from pyspark.sql import Window

    sh = shingles_df(df, text_col, id_col, n)
    # skew guard: drop shingles shared by too many docs (they contribute
    # pairs quadratically but little discriminative signal)
    w = Window.partitionBy("shingle")
    kept = (
        sh.withColumn("df_cnt", F.count("*").over(w))
        .filter(F.col("df_cnt") <= max_df)
        .drop("df_cnt")
    )
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = kept.alias("a")
    b = kept.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sz_b"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def ngram_jaccard_pairs_prefiltered(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
    k: int = 64,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """ngram_jaccard_pairs semantics with a MinHash-LSH candidate prefilter
    in front of the exact verify. -> (doc_a, doc_b, jaccard), jaccard being
    the EXACT n-gram jaccard on the df-capped shingle sets (same definition
    as ngram_jaccard_pairs).

    Why this beats the inverted-index join at scale: the exact path's
    shingle self-join materializes a row per (shared shingle x doc pair) —
    near-identical docs sharing 500 shingles cost 500 rows per pair before
    the groupBy collapses them. Here candidates come from the banded minhash
    join (carrying only (doc_id, band, bucket)), and each surviving pair is
    verified ONCE via array_intersect over the two docs' collected shingle
    sets — per-pair cost is O(|shingles|) compute, O(1) rows.

    Recall is the LSH curve: P(candidate) = 1 - (1 - j^(k/bands))^bands.
    Defaults (64 sigs, 32 bands -> r=2) give P > 0.9999 at j = 0.8 and
    P ~ 0.985 at j = 0.5; identical texts collide in every band with any
    seed. Use the exact ngram_jaccard_pairs when the target threshold is
    low (< ~0.5) and misses matter; use this when the corpus is large and
    the threshold is high — the standard near-dup regime.

    Work is candidate-bounded, not corpus-bounded: only docs that appear in
    some candidate pair have their shingle sets collected (semi-join before
    the collect_set), so the per-doc set materialization scales with the
    dup-pair population, not the corpus. The one full-corpus pass that
    remains is the df-cap statistic (a partial-aggregated groupBy on
    shingle; over-df shingles are then removed with an anti-join — AQE
    broadcasts that side when it is small, which it is everywhere except
    pathological corpora), so the capped jaccard matches the exact
    operator's definition bit-for-bit on every candidate pair."""
    # lazily checkpointed: the df-cap statistic AND the kept-set anti-join
    # both read the shingle table — without it the regex shingling ran twice
    sh = shingles_df(df, text_col, id_col, n).localCheckpoint(eager=False)
    over_df = (
        sh.groupBy("shingle").agg(F.count("*").alias("df_cnt"))
        .filter(F.col("df_cnt") > max_df)
        .select("shingle")
    )
    kept = sh.join(over_df, "shingle", "left_anti")

    sigs = minhash_signatures(df, text_col, id_col, k, n, seed)
    cand = minhash_candidates(sigs, k, bands).persist()
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # persisted: it feeds BOTH sides of the pair join and is candidate-
    # bounded (only docs in some pair), so it is small even at 100 TB
    docsets = (
        kept.join(cand_docs, "doc_id", "semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shs"), F.count("*").alias("n_sh"))
        .persist()
    )

    with_sets = cand.join(
        docsets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("n_sh").alias("sz_a")),
        "doc_a",
    ).join(
        docsets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("n_sh").alias("sz_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        with_sets.withColumn(
            "jaccard", F.round(inter / (F.col("sz_a") + F.col("sz_b") - inter), 4)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_params(k: int, seed: int = 42):
    """a in [1, 2^31), b in [0, p): with 32-bit shingle hashes, a*h + b
    stays < 2^63 + 2^61 < 2^64, so the whole permutation sweep is native
    uint64 numpy (no Python-object bigint math)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=k).astype(np.uint64)
    b = (rng.randint(0, 1 << 62, size=k).astype(np.uint64) % np.uint64(_MERSENNE))
    return a, b


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 64, n: int = 3, seed: int = 42
) -> DataFrame:
    """-> (doc_id, sig: array<long>) k-permutation minhash over word n-grams.
    numpy-vectorized inside mapInPandas (Arrow batches); all-uint64 math."""
    a_coef, b_coef = _minhash_params(k, seed)
    mod = np.uint64(_MERSENNE)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                if len(words) < n:
                    grams = {" ".join(words)} if words else {""}
                else:
                    grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
                hv = np.fromiter(
                    (_stable_hash32(g) for g in grams), dtype=np.uint64, count=len(grams)
                )
                # (a*h + b) mod p for all k perms x all shingles, take min
                sig = ((a_coef[:, None] * hv[None, :] + b_coef[:, None]) % mod).min(axis=1)
                out_ids.append(doc_id)
                out_sigs.append(sig.astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": out_ids, "sig": out_sigs})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        sig_batches, schema="doc_id long, sig array<long>"
    )


def minhash_candidates(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    """Banded-LSH candidate generation over a (doc_id, sig) signature table:
    explode each signature into `bands` (band, bucket) keys, equi-join on the
    key, dedup across bands. -> (doc_a, doc_b), doc_a < doc_b.

    Shuffle diet (100 TB): the band explode and the band-bucket self-join
    carry ONLY (doc_id, band, bucket) — the k-long signature array (~8 KB/doc
    at k=64) never rides the x`bands` explode or the candidate shuffle."""
    rows_per_band = k // bands
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sigs.select("doc_id", "sig", band_idx).select(
        "doc_id",
        "band",
        F.xxhash64(F.concat_ws(",", F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band))).alias("bucket"),
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """banded LSH candidate generation + signature-jaccard verify.
    -> (doc_a, doc_b, sig_jaccard).

    Signatures are joined back exactly once per side onto the deduplicated
    candidate pairs (the candidate shuffle itself is signature-free — see
    minhash_candidates). `sigs` is persisted because it feeds three subplans
    (banding + two rejoins) and the mapInPandas signature pass is the
    expensive Python stage; on a real cluster it would be a materialized
    signature table."""
    sigs = minhash_signatures(df, text_col, id_col, k, n, seed).persist()
    cand = minhash_candidates(sigs, k, bands)
    pairs = cand.join(
        sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a"
    ).join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    return (
        pairs.withColumn("sig_jaccard", F.round(matches / F.lit(k), 4))
        .filter(F.col("sig_jaccard") >= threshold)
        .select("doc_a", "doc_b", "sig_jaccard")
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, simhash) 64-bit simhash over word tokens (numpy batched)."""

    def sh_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").lower().split()
                if not words:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                hv = np.fromiter(
                    (
                        int.from_bytes(hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big")
                        for w in words
                    ),
                    dtype=np.uint64,
                    count=len(words),
                )
                bitmat = ((hv[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
                v = (bitmat * 2 - 1).sum(axis=0)
                sh = int(((v > 0).astype(np.uint64) << bits).sum(dtype=np.uint64))
                ids.append(doc_id)
                hashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)  # store as signed
            yield pd.DataFrame({"doc_id": ids, "simhash": hashes})

    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        sh_batches, schema="doc_id long, simhash long"
    )


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Band the 64-bit simhash into 4x16-bit keys (pigeonhole: <=3 differing
    bits => at least one band identical) -> bucket join -> exact hamming
    verify via bit_count(xor). -> (doc_a, doc_b, hamming)."""
    sh = simhash64(df, text_col, id_col)
    bands = []
    for i in range(4):
        bands.append(
            sh.select(
                "doc_id",
                "simhash",
                F.lit(i).alias("band"),
                F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("key"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bands: int = 6,
    band_planes: int = 8,
    seed: int = 7,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """cosine >= threshold pairs over L2-normalized embeddings.

    Banded multi-table random-hyperplane LSH (VERDICT r02: the old single
    8-plane table maxed out at 256 buckets with an UNCAPPED quadratic
    within-bucket join — a scale-killer at 1B vectors):

    - n_bands independent tables of band_planes sign bits each. A pair is a
      candidate if it collides in ANY band. For cos=t the per-band collision
      prob is (1 - acos(t)/pi)^band_planes; at t=0.95 with 6x8 defaults,
      P(>=1 of 6 bands) ~ 0.965 — and identical vectors collide in every
      band. Raise band_planes with corpus size: bucket count is 2^band_planes
      PER BAND, so bits scale without touching recall-critical n_bands.
    - per-(band, bucket) frequency cap (`max_bucket_size`) mirrors the
      ngram path's max_df: a degenerate hot bucket (duplicate-heavy or
      zero-vector pileup) is dropped instead of exploding into |bucket|^2
      pairs. The cap count reuses the band-shuffle exchange (window, not a
      second groupBy).
    - the band shuffle carries only (vec_id, band, bucket) — vectors are
      rejoined once, AFTER cross-band candidate dedup, so each surviving
      pair is verified exactly once (same sig-free-shuffle trick as
      minhash_lsh_pairs).
    """
    from pyspark.sql import Window

    dim_df = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    dim = dim_df[0]["d"] if dim_df else 0
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_bands * band_planes, dim)  # band k = rows [k*bp, (k+1)*bp)

    def bucket_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(band_planes)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].values)
            signs = (mat @ planes.T) > 0  # (n, n_bands*band_planes)
            out_ids, out_band, out_bucket = [], [], []
            ids = pdf[id_col].values
            for k in range(n_bands):
                bk = signs[:, k * band_planes : (k + 1) * band_planes]
                out_ids.append(ids)
                out_band.append(np.full(len(ids), k, dtype=np.int32))
                out_bucket.append((bk * weights).sum(axis=1))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "band": np.concatenate(out_band),
                    "bucket": np.concatenate(out_bucket),
                }
            )

    keyed = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    bucketed = keyed.mapInPandas(bucket_batches, schema="vec_id long, band int, bucket long")
    # skew guard: drop over-full buckets; window reuses the (band, bucket)
    # exchange the self-join needs anyway
    w = Window.partitionBy("band", "bucket")
    capped = (
        bucketed.withColumn("_bsz", F.count("*").over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )
    cand = (
        capped.alias("a")
        .join(capped.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])  # across bands, BEFORE the verify join
    )
    with_vecs = cand.join(
        keyed.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("embedding", "emb_a"), "vec_a"
    ).join(
        keyed.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("embedding", "emb_b"), "vec_b"
    )
    dot = F.aggregate(
        F.zip_with(F.col("emb_a"), F.col("emb_b"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        with_vecs.withColumn("cosine", F.round(dot, 4))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def near_dup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """The last stage of the dedup pipeline: candidate pairs (from ANY of the
    five strategies above) -> transitive near-dup clusters -> keep/drop list.

    -> (doc_id, keep_id, is_kept): every doc mapped to its cluster
    representative (min id over the connected component of the pair graph);
    docs with no near-dup pair keep themselves. A 100 TB dedup run feeds the
    drop set (is_kept = false) straight into an anti-join on the corpus.

    The component computation is size-gated exactly like alias
    canonicalization (wbkg/canonicalize.py): pair sets small enough for the
    driver take one union-find job, bigger ones take the iterative
    DataFrame min-label loop. Near-dup pair graphs are pair-bounded, not
    corpus-bounded — dup clusters are tiny and most docs never appear."""
    from wbkg.canonicalize import (
        LOCAL_CC_THRESHOLD,
        connected_components,
        connected_components_local,
    )

    id_type = dict(docs.dtypes)[id_col]
    numeric = id_type in ("tinyint", "smallint", "int", "bigint")
    # CC's representative is the lexicographic min member — zero-pad numeric
    # ids so that equals the numeric min ("100" < "99" otherwise; assumes
    # non-negative ids). String ids keep plain lexicographic-min semantics.
    key = (
        (lambda c: F.lpad(F.col(c).cast("string"), 25, "0"))
        if numeric
        else (lambda c: F.col(c).cast("string"))
    )
    edges = pairs.select(key(pair_a).alias("src"), key(pair_b).alias("dst")).persist()
    n = edges.count()
    comp = (
        connected_components_local(edges)
        if n <= LOCAL_CC_THRESHOLD
        else connected_components(edges)
    )
    edges.unpersist()
    comp_typed = comp.select(
        F.col("member").cast(id_type).alias(id_col),
        F.col("component").cast(id_type).alias("_rep"),
    )
    out = docs.select(id_col).join(comp_typed, id_col, "left")
    keep = F.coalesce(F.col("_rep"), F.col(id_col))
    return out.select(
        F.col(id_col),
        keep.alias("keep_id"),
        (keep == F.col(id_col)).alias("is_kept"),
    )


def repeated_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 32,
    stride: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-passage detection — the passage-REMOVAL
    primitive (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": exact substring dedup, here approximated with fixed
    word windows instead of a suffix array). Doc-level dedup drops whole
    documents; this finds the w-word spans that recur across >= min_docs
    DISTINCT documents, so a pipeline can cut boilerplate (headers, legal
    blocks, templated sections) out of otherwise-unique documents.

    -> (doc_id, start_word, phash, n_docs): one row per window occurrence
    whose passage text appears in at least min_docs distinct documents.
    start_word indexes the doc's whitespace tokens (stride-aligned), so the
    caller can map spans back and excise them.

    Plan shape at 100 TB: windows are pure Catalyst (one projection +
    explode — the slice/array_join form shares shingles_df's fast path, no
    per-element regex re-evaluation), the distinct-doc count is ONE
    partial-aggregated exchange keyed on the 32-hex md5 of the passage, and
    occurrences rejoin the (tiny, repeated-passage-bounded) count table.
    Linear in corpus tokens / stride — the practical approximation of the
    suffix-array approach, which cannot be expressed as a dataflow without
    a global sort. md5 (not xxhash64) so the DuckDB oracle replays the hash
    bit-for-bit."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    k = F.floor((F.size("_w") - w) / stride) + 1
    # sequence(0, -1) would DESCEND ([0, -1]) — short docs need an
    # explicitly empty window list
    idx = F.when(k > 0, F.sequence(F.lit(0).cast("long"), (k - 1).cast("long"))).otherwise(
        F.array().cast("array<long>")
    )
    win = F.transform(
        idx,
        lambda i: F.struct(
            (i * stride).alias("start_word"),
            F.md5(F.array_join(F.slice("_w", i * stride + 1, w), " ")).alias("phash"),
        ),
    )
    # lazily checkpointed: the distinct-doc count AND the occurrence
    # rejoin both read the window table — without it the md5-per-window
    # explode ran twice over the corpus
    occ = base.select("doc_id", F.explode(win).alias("p")).select(
        "doc_id", "p.start_word", "p.phash"
    ).localCheckpoint(eager=False)
    counts = occ.groupBy("phash").agg(
        F.count_distinct("doc_id").alias("n_docs")
    ).filter(F.col("n_docs") >= min_docs)
    return occ.join(counts, "phash").select("doc_id", "start_word", "phash", "n_docs")


def _deletion_neighborhood(col: str):
    """string -> array of itself + every single-character deletion (the
    FastSS radius-1 neighborhood). Pure Catalyst: Column.substr with Column
    positions inside a transform over sequence(1, length)."""
    s = F.col(col)
    dels = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.greatest(F.length(s) - i, F.lit(0))),
        ),
    )
    return F.array_union(F.array(s), dels)


def fuzzy_pairs_edit1(
    left: DataFrame,
    right: DataFrame,
    col: str = "surface",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """All (left, right) string pairs within Levenshtein distance 1 —
    the fuzzy second-pass linking primitive (dictionary surface vs noisy
    mention) WITHOUT a cross join.

    FastSS deletion-neighborhood blocking: ed(a,b) <= 1 implies the
    radius-1 deletion neighborhoods of a and b intersect (equal strings
    share themselves; one substitution shares the both-deleted form; one
    insert/delete shares the shorter string). So: explode both
    neighborhoods, equi-join on the variant (shuffle carries (variant,
    string) pairs — explode factor = len+1, bounded by surface length),
    dedup candidates, then VERIFY with the built-in JVM levenshtein
    (the block admits some ed=2 pairs). No pair of strings ever meets
    outside a shared variant bucket — the 100 TB shape.

    `max_bucket` (VERDICT r05 #5, the max_df analogue every other blocking
    op carries): a variant shared by more than `max_bucket` DISTINCT
    strings on either side is dropped from blocking before the join, so a
    pathological dictionary (thousands of 1-edit-apart short strings
    inserting into one stem) cannot create an O(n²) hot bucket. Dropping a
    variant loses exactly the pairs whose ONLY shared variant it was —
    strings in such a bucket are pairwise ed<=2 insertions into the same
    stem, so this is the deliberate skew/recall trade every banded blocker
    makes; the dropped-variant set is the `hot` subplan here (count it
    with the same groupBy if you need an audit number). None disables."""
    lv = (
        left.select(F.col(col).alias("a"))
        .distinct()
        .select("a", F.explode(_deletion_neighborhood("a")).alias("v"))
    )
    rv = (
        right.select(F.col(col).alias("b"))
        .distinct()
        .select("b", F.explode(_deletion_neighborhood("b")).alias("v"))
    )
    if max_bucket is not None:
        # per-variant distinct-string counts are tiny (variant, long) rows;
        # the anti-joins broadcast the hot set when it is small — at scale
        # it is, because hot variants are by definition rare
        hot = (
            lv.groupBy("v").agg(F.count("*").alias("nl"))
            .join(rv.groupBy("v").agg(F.count("*").alias("nr")), "v", "full")
            .filter(
                (F.coalesce(F.col("nl"), F.lit(0)) > max_bucket)
                | (F.coalesce(F.col("nr"), F.lit(0)) > max_bucket)
            )
            .select("v")
        )
        lv = lv.join(hot, "v", "left_anti")
        rv = rv.join(hot, "v", "left_anti")
    cand = lv.join(rv, "v").select("a", "b").distinct()
    return cand.filter(F.levenshtein("a", "b") <= 1)
