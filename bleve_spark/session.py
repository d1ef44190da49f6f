"""SparkSession helper with the engine's preferred configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Allocator settings for the Python workers (inherited via the JVM's
# environment, so they must be set before the gateway starts). Measured
# on local[32]: PyArrow's bundled jemalloc pool plus pymalloc arena
# churn caused mmap/munmap page-fault storms across 32 workers that
# inflated identical per-segment CPU time 5-15×; routing Arrow and
# CPython small objects through glibc malloc with trim/mmap disabled
# makes worker heaps reach steady state and removes the kernel-side
# contention entirely (index build: 46k → 250k turns/sec).
_WORKER_ALLOC_ENV = {
    "ARROW_DEFAULT_MEMORY_POOL": "system",
    "PYTHONMALLOC": "malloc",
    "MALLOC_MMAP_THRESHOLD_": "2147483647",
    "MALLOC_TRIM_THRESHOLD_": "2147483647",
    "MALLOC_ARENA_MAX": "1",
    "MALLOC_MMAP_MAX_": "0",
}


def get_spark(
    app: str = "bleve-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    for k, v in _WORKER_ALLOC_ENV.items():
        os.environ.setdefault(k, v)
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master.split("[")[-1].rstrip("]")
    try:
        ncores = int(cores) if cores != "*" else (os.cpu_count() or 8)
    except ValueError:
        ncores = 8
    sp = shuffle_partitions or max(ncores, 8)
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
