"""Extra measurement harness for the optimization round (guide §1.1/1.4/1.5).

NOT part of the frozen driver contract (bench.py is the measuring stick);
this file exists so individual queries can be isolated, timed, and their
physical plans captured without editing bench.py.

Subcommands:

  python bench_extra.py time  [--sf DIR] [--reps N] [--noop] [q substr ...]
      Time each matching declared query with the SAME methodology bench.py
      uses (.count() on the returned DataFrame), labelled via
      setJobDescription. --noop additionally times a noop-sink write
      (computes every column, guide §1.4).

  python bench_extra.py explain [--sf DIR] [--out DIR] [--tag TAG] [q ...]
      Write .explain("formatted") for each matching query to
      <out>/<query>_<tag>.txt (default plans/r07, tag "before").

  python bench_extra.py tile [--sf DIR] [--out DIR] [--mult K]
      Build a driver-scale mimic of the next SF up by tiling the input
      tables K times (default 10) with re-keyed ids:
        - customer/supplier/orders/lineitem/part: keys shifted per replica,
          nationkey kept (nation/region are fixed-size at every TPC-H sf,
          so the customer x supplier per-nation join blowup is reproduced);
        - lineitem orderkey+partkey both shifted (co-purchase graph = K
          disjoint copies: per-part degree matches a real 10x sf, which
          keeps Schank-Wagner wedge volume honest);
        - documents/embeddings/events: the bench.py ensure_sf1 convention
          (replica-suffixed text, epsilon-shifted vectors, disjoint users).
      Written to --out (default /tmp/wbkg_sf_tiled); never touches
      /root/testdata.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session():
    from wbkg.session import get_spark

    os.environ.setdefault("WBKG_DRIVER_MEM", "24g")
    return get_spark(
        "wbkg-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )


def _explain_str(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _matching(names, patterns):
    if not patterns:
        return list(names)
    return [n for n in names if any(p in n for p in patterns)]


def cmd_time(args):
    import __spark_entry__ as entry

    spark = get_session()
    qmap = entry.queries()
    names = _matching(qmap, args.queries)
    results = {}
    for name in names:
        best_count, best_noop = None, None
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} count rep{rep}")
            t0 = time.time()
            n = qmap[name](spark, args.sf).count()
            dt = time.time() - t0
            best_count = dt if best_count is None else min(best_count, dt)
            print(f"[time] {name} rep{rep}: count={dt:.3f}s rows={n}", flush=True)
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name} noop rep{rep}")
                t0 = time.time()
                qmap[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best_noop = dt if best_noop is None else min(best_noop, dt)
                print(f"[time] {name} rep{rep}: noop={dt:.3f}s", flush=True)
        results[name] = {"count": round(best_count, 3)}
        if best_noop is not None:
            results[name]["noop"] = round(best_noop, 3)
    print("RESULTS " + repr(results))


def cmd_explain(args):
    import __spark_entry__ as entry

    spark = get_session()
    qmap = entry.queries()
    names = _matching(qmap, args.queries)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            p = _explain_str(qmap[name](spark, args.sf))
        except Exception as e:  # iterative queries run jobs during build
            p = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"[explain] wrote {path} ({len(p)} bytes)")


def cmd_tile(args):
    from pyspark.sql import functions as F

    spark = get_session()
    k = args.mult
    out = args.out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(k).withColumnRenamed("id", "rep")

    def rd(t):
        return spark.read.parquet(os.path.join(args.sf, f"{t}.parquet"))

    def wr(df, t):
        df.repartition(CPUS).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"[tile] {t} done")

    # fixed-size dimension tables: copy as-is
    for t in ("nation", "region"):
        wr(rd(t), t)

    shift = {
        "customer": ("c_custkey", 1_000_000),
        "supplier": ("s_suppkey", 1_000_000),
        "part": ("p_partkey", 10_000_000),
        "orders": ("o_orderkey", 100_000_000),
    }
    for t, (key, step) in shift.items():
        df = rd(t).crossJoin(F.broadcast(reps))
        cols = []
        for c in df.columns:
            if c == "rep":
                continue
            if c == key or (t == "orders" and c == "o_custkey"):
                base = 1_000_000 if c == "o_custkey" else step
                cols.append((F.col(c) + F.col("rep") * F.lit(base)).alias(c))
            else:
                cols.append(F.col(c))
        wr(df.select(cols), t)

    li = rd("lineitem").crossJoin(F.broadcast(reps))
    cols = []
    for c in li.columns:
        if c == "rep":
            continue
        if c == "l_orderkey":
            cols.append((F.col(c) + F.col("rep") * F.lit(100_000_000)).alias(c))
        elif c == "l_partkey":
            cols.append((F.col(c) + F.col("rep") * F.lit(10_000_000)).alias(c))
        elif c == "l_suppkey":
            cols.append((F.col(c) + F.col("rep") * F.lit(1_000_000)).alias(c))
        else:
            cols.append(F.col(c))
    wr(li.select(cols), "lineitem")

    docs = rd("documents").crossJoin(F.broadcast(reps))
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
    )
    wr(
        docs.select(
            (F.col("doc_id") + F.col("rep") * F.lit(100_000)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        ),
        "documents",
    )
    emb = rd("embeddings").crossJoin(F.broadcast(reps))
    wr(
        emb.select(
            (F.col("vec_id") + F.col("rep") * F.lit(100_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (x + F.col("rep").cast("float") * F.lit(0.0001)).cast(
                    "float"
                ),
            ).alias("embedding"),
            "label",
        ),
        "embeddings",
    )
    ev = rd("events").crossJoin(F.broadcast(reps))
    wr(
        ev.select(
            (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * F.lit(100_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
        "events",
    )
    open(os.path.join(out, "_DONE"), "w").write("ok")
    print(f"[tile] all tables written to {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("time", "explain", "tile"):
        p = sub.add_parser(name)
        p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        if name == "time":
            p.add_argument("--reps", type=int, default=1)
            p.add_argument("--noop", action="store_true")
            p.add_argument("queries", nargs="*")
        elif name == "explain":
            p.add_argument("--out", default="plans/r07")
            p.add_argument("--tag", default="before")
            p.add_argument("queries", nargs="*")
        else:
            p.add_argument("--out", default="/tmp/wbkg_sf_tiled")
            p.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    {"time": cmd_time, "explain": cmd_explain, "tile": cmd_tile}[args.cmd](args)


if __name__ == "__main__":
    main()
