"""SparkSession factory with scale-oriented defaults.

Configs chosen for the 100 TB target (and harmless at test scale):
- AQE on (runtime coalesce, skew-join split) — the linking join's probe side
  is Zipf-skewed (hub surfaces like "World Bank"), cf. SURVEY.md §4.4.
- Arrow on — every heavy operator is a pandas UDF; Arrow batching is the
  JVM<->Python transfer path.
- shuffle partitions sized to cores locally; on a real cluster this is set
  per-job (or left to AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wbkg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    # parse local[N] for a sensible shuffle-partition default
    if shuffle_partitions is None:
        try:
            n = master.split("[", 1)[1].rstrip("]")
            shuffle_partitions = cpus if n == "*" else max(int(n), 4)
        except (IndexError, ValueError):
            shuffle_partitions = 200

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("WBKG_DRIVER_MEM", "8g"))
        # pin the initial heap to the max: on a big benchmark heap, GC-driven
        # uncommit/re-expansion between runs adds tens-of-seconds page-fault
        # noise to whichever run happens to re-grow it (observed 25s..46s for
        # the identical warm pipeline); irrelevant at the 8g default.
        # ReservedCodeCacheSize=512m: Spark codegen emits enough classes at
        # canonical-bench scale to stress the 240m default; the reservation
        # is virtual and harmless otherwise. WBKG_PRETOUCH=1 (bench sets it)
        # adds AlwaysPreTouch, moving the big-heap page-fault storm (~700s
        # of sys jiffies measured during the first canonical run) to session
        # startup, off the measured path.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('WBKG_DRIVER_MEM', '8g')}"
            " -XX:ReservedCodeCacheSize=512m"
            + (
                " -XX:+AlwaysPreTouch"
                if os.environ.get("WBKG_PRETOUCH") == "1"
                else ""
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", "/tmp/wbkg_warehouse")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
