"""SparkSession factory.

Replaces the reference's ad-hoc session setup (notebook-local
``spark.executor.memory=4g``, ``/root/reference/notebooks/Spark test.ipynb``
cell 2) with a single configured entry point designed for scale:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  subsumes the reference's hand-tuned ``numPartitions`` choices
  (``next_window_target.py:53``).
- ``spark.sql.session.timeZone=UTC`` so timestamp semantics match the
  DuckDB oracle (naive-UTC) bit-for-bit.
- Arrow enabled for the few pandas boundaries (vectorized transfer).
- shuffle partitions sized to cores for local mode; on a real cluster this
  is AQE-coalesced from a higher initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "bicis_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or ``*``.
    """
    env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and env_cpus:
        cores = int(env_cpus)
    master = f"local[{cores}]" if cores else "local[*]"
    n_shuffle = shuffle_partitions or (cores if cores else 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing is bytes-based; Python-heavy stages (cogrouped
        # applyInPandas) are CPU-bound per GROUP, so let small shuffles keep
        # their parallelism instead of collapsing to 1-3 tasks
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # driver testdata stores events.ts as parquet TIMESTAMP(NANOS), which
        # Spark cannot read natively; read as long nanos + convert (sources.io)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # STATIC conf, default 100 generated classes: a 75-query bench
        # session thrashes it, so late-position queries re-Janino-compile
        # on BOTH min-of-2 runs (the r5 quality_classifier/holt_winters
        # driver-only 2-8x "regressions" — steady-state plans were flat).
        # One long-lived JVM serving many queries wants a cache sized to
        # its workload, same as a real Spark Thrift/Connect server.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # PySpark 4 wraps EVERY DataFrame/Column API call in a call-site
        # capture (errors/utils.py _with_origin): a conf.get RPC + Python
        # stack walk + PySparkCurrentOrigin.set/clear round-trips — 3-4
        # extra py4j calls per API call, billed to every query BUILDER.
        # Measured on the expression-heavy ANN rows: ~0.6s of a 3.6s
        # build (17%) before any data moves. The capture only enriches
        # error messages with user line numbers; a long-lived engine
        # session values build latency over that nicety (same class of
        # choice as disabling the UI above).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # The bypass-merge shuffle writer opens ONE FILE PER REDUCE
        # PARTITION per map task (maps×reducers creates+opens per
        # exchange, then an mmap/transferTo concat). jstack sampling of
        # the iterative-graph rows showed executor threads serialized in
        # FileOutputStream.open0/DiskBlockManager under it — shuffle
        # *write time* was ~40% of task run time for 64 KB outputs.
        # Forcing the sort-based writer (2 files per map task regardless
        # of reducer count) cut pagerank_part_supplier 6.0→2.2s and
        # kcore_parts 6.1→3.6s (A/B, warm min-of-3). On a real cluster
        # this conf is inert: bypass only ever engages when reducers ≤
        # 200, which a 100 TB shuffle never is — the default only
        # penalizes exactly this local/low-partition regime.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "1"),
        )
    )
    # Shuffle/spill local dirs belong on the fastest node-local storage.
    # In this sandbox the root FS is virtio-ext4 where the per-file
    # create/unlink syscalls of shuffle temp files dominate near-empty
    # micro-batch stages (streaming rows 2-4x slower on ext4 than tmpfs
    # under the sort writer, A/B in OPTIMIZATION_r11.md); tmpfs makes
    # them ~free. Production deploys point this at NVMe via
    # SPARK_GRAFT_LOCAL_DIR (or Spark's own SPARK_LOCAL_DIRS, which
    # Spark itself gives precedence); tmpfs is appropriate locally
    # because bench-scale shuffles are MBs against a 126 GB tmpfs.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-graft-local"
    if local_dir:
        try:
            os.makedirs(local_dir, exist_ok=True)
            builder = builder.config("spark.local.dir", local_dir)
        except OSError:
            pass
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
