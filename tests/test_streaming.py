import os

from pyspark.sql import functions as F

from wbkg.extract import build_pattern_rows
from wbkg.streaming import stream_extract_edges, windowed_event_counts
from wbkg.synth import build_entity_dict_rows, build_unbis_rows, entity_dict_df, gen_documents_df


def test_stream_matches_batch(spark, tmp_path):
    """availableNow stream over the corpus produces the same C6 entity edges
    as the batch pipeline."""
    n = 12
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    gen_documents_df(spark, n, partitions=4).write.parquet(in_dir)

    edict = entity_dict_df(spark, n)
    pats = build_pattern_rows(build_entity_dict_rows(n), build_unbis_rows())

    q = stream_extract_edges(spark, in_dir, out_dir, ckpt, edict, pats)
    q.awaitTermination(300)

    got = {
        (r.subj, r.pred, r.obj)
        for r in spark.read.parquet(out_dir).select("subj", "pred", "obj").distinct().collect()
    }

    # batch reference
    from wbkg.canonicalize import apply_canonicalization, canonical_map
    from wbkg.chunker import chunk_documents
    from wbkg.extract import extract_acronyms, extract_mentions
    from wbkg.link import link_mentions
    from wbkg.materialize import entity_triples

    docs = spark.read.parquet(in_dir)
    chunks = chunk_documents(docs)
    acr = extract_acronyms(chunks)
    mentions = extract_mentions(chunks, acr, pats)
    linked = link_mentions(mentions, edict)
    lc = apply_canonicalization(linked, canonical_map(edict, acr, linked))
    want = {(r.subj, r.pred, r.obj) for r in entity_triples(lc).collect()}
    assert got == want

    # restart with same checkpoint: no new input -> no new output files rows
    n_before = spark.read.parquet(out_dir).count()
    q2 = stream_extract_edges(spark, in_dir, out_dir, ckpt, edict, pats)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n_before


def test_windowed_agg_on_real_stream(spark, tmp_path):
    """Actual readStream over the driver events parquet: watermarked window
    agg, complete mode to a memory sink, equal to the batch aggregation."""
    import shutil

    # the file-stream source needs a directory of files
    src_dir = str(tmp_path / "events_in")
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir)
    batch_df = spark.read.parquet(src_dir)
    stream_df = (
        spark.readStream.schema(batch_df.schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
    q = (
        windowed_event_counts(stream_df)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window"]["start"], r["event_type"]): (r["cnt"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window"]["start"], r["event_type"]): (r["cnt"], round(r["total_value"], 6))
        for r in windowed_event_counts(batch_df).collect()
    }
    assert got == want and len(got) > 0


def test_windowed_event_counts_batch_shape(spark):
    """The watermark+window agg compiles and aggregates correctly (executed
    on a static frame; same plan runs on a stream)."""
    ev = spark.createDataFrame(
        [("2026-01-01 00:01:00", "click", 1.0), ("2026-01-01 00:02:00", "click", 2.0),
         ("2026-01-01 00:07:00", "view", 5.0)],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    out = windowed_event_counts(ev).collect()
    by_type = {r.event_type: (r.cnt, r.total_value) for r in out}
    assert by_type["click"] == (2, 3.0)
    assert by_type["view"] == (1, 5.0)
