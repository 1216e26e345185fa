"""SparkSession factory with scale-aware defaults.

Local-mode testing, cluster-shaped configuration: every knob here is one we
would also set on a 1000-executor cluster (AQE, skew-join handling, Arrow
batch sizing for MB-scale ``html`` rows), plus local-only conveniences
(driver memory, UI off).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS_PER_CORE = 4

# html rows are 1-64 KiB; bound Python-worker memory on the Arrow boundary
# (SURVEY.md §4.2.4). 2048 rows * 64 KiB ≈ 128 MiB worst-case per batch.
ARROW_MAX_RECORDS_PER_BATCH = 2048


def get_spark(
    app_name: str = "feast_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cores=None`` uses ``local[*]``. On a real cluster this function is
    bypassed — ``spark-submit`` provides the session and these configs move
    to ``spark-defaults.conf`` / submit args; see BENCH/run.sh.
    """
    # make the package importable in Python workers regardless of cwd —
    # local-mode equivalent of `spark-submit --py-files fx.zip` (workers
    # inherit the driver process env, including PYTHONPATH)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cores_env = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and cores_env:
        cores = int(cores_env)
    master = f"local[{cores}]" if cores else "local[*]"
    n_cores = cores or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = n_cores * DEFAULT_SHUFFLE_PARTITIONS_PER_CORE

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("FEAST_SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # INT64 micros, not legacy INT96: the Iceberg parquet spec forbids
        # INT96, and pyarrow round-trips (compaction) preserve micros
        # exactly while INT96 resurfaces as unreadable-nanos
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Spark sizes Tungsten memory pages up to 64 MiB from (heap /
        # cores); on-heap pages are zero-initialized Java arrays, so with
        # many-core executors + high shuffle-partition counts every small
        # sort/window task pays ~100 MiB of memset + GC churn before
        # touching a row. Measured here (32 threads, 128 partitions,
        # 135k-row window stage): 366 CPU-s with default paging vs 9
        # CPU-s at 4 MiB pages. Large partitions at 100 TB amortize page
        # count, so 4 MiB stays safe cluster-side too.
        .config("spark.buffer.pageSize", "4m")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
