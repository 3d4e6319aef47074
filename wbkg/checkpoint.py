"""Checkpoint / resume protocol (SURVEY §4.3; north_rule resumability).

Maps the reference's JSON caches + skip-if-exists guards
(src/linker.py:48-56, src/summarize.py:67-79 + 209-212,
src/pipeline.py:31-33, src/storage.py:283-285) onto per-stage checkpoint
tables:

    run_stage = load checkpoint -> anti-join remaining work -> compute the
    remainder only -> append to checkpoint -> return the full table.

A killed job re-runs the same driver program; every stage whose keys are
already checkpointed contributes zero new computation. Storage is a table
directory per stage (Parquet here; the same code targets an Iceberg catalog
by swapping the writer — the sandbox has no Iceberg runtime jar, SURVEY
§7.3).
"""

from __future__ import annotations

import os
from typing import Callable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir

    def _path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS")) or any(
            f.endswith(".parquet")
            for f in (os.listdir(self._path(stage)) if os.path.isdir(self._path(stage)) else [])
        )

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def append(self, stage: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._path(stage))

    def pending(self, stage: str, work: DataFrame, keys: List[str]) -> DataFrame:
        """Left-anti join the work list against the checkpointed keys — the
        relational form of 'skip if already done'."""
        if not self.exists(stage):
            return work
        done = self.read(stage).select(*keys).distinct()
        return work.join(done, keys, "left_anti")

    def run_stage(
        self,
        stage: str,
        work: DataFrame,
        compute: Callable[[DataFrame], DataFrame],
        keys: List[str],
    ) -> DataFrame:
        """Compute `compute(pending_work)` and append; returns the complete
        checkpointed table. Records how many work rows were actually
        recomputed in self.last_recomputed (for the zero-recompute test)."""
        todo = self.pending(stage, work, keys)
        n_todo = todo.count()
        self.last_recomputed = n_todo
        if n_todo > 0:
            self.append(stage, compute(todo))
        return self.read(stage)
