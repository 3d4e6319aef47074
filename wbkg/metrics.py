"""Per-partition lineage + metrics (north_rule: every stage writes
per-partition lineage and metrics).

with_lineage wraps any DataFrame in a pass-through mapInPandas that records
(stage, partition_id, rows_in, rows_out, wall_ms) per partition. Metrics rows
are written executor-side as one small parquet file per partition (same
write discipline as Spark task output: unique file names, no coordination),
so the hot path never synchronizes on the driver.
"""

from __future__ import annotations

import os
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def with_lineage(df: DataFrame, stage: str, metrics_dir: str) -> DataFrame:
    """Pass-through wrapper that records per-partition metrics."""
    schema = df.schema

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.time()
        rows = 0
        for pdf in batches:
            rows += len(pdf)
            yield pdf
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        rec = pd.DataFrame(
            [
                {
                    "stage": stage,
                    "partition_id": pid,
                    "rows_in": rows,
                    "rows_out": rows,
                    "wall_ms": (time.time() - t0) * 1000.0,
                }
            ]
        )
        out_dir = os.path.join(metrics_dir, stage)
        os.makedirs(out_dir, exist_ok=True)
        rec.to_parquet(os.path.join(out_dir, f"part-{pid}-{uuid.uuid4().hex}.parquet"))

    return df.mapInPandas(wrap, schema=schema)


def read_metrics(spark: SparkSession, metrics_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(metrics_dir, stage))
