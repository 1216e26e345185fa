#!/usr/bin/env python
"""One scaling-bench run at a fixed parallelism level (its own JVM).

Usage: python BENCH/scaling_worker.py <cores> <pages_path>
Prints one JSON line: {"cores": N, "sec": T, "rows": R, "rows_per_sec": X}

The job is the full materialization pipeline of the north rule: scan →
vectorized HTML extraction (mapInPandas) → quality features → window
features (lag + rolling) → PIT as-of join at a probe grid → noop write.
Python-worker count and shuffle partitions scale with cores (4×), as on
a real cluster where executors = cores and shuffle partitions track
total cores.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from feast_spark.operators.asof import asof_join
    from feast_spark.operators.text import extract_features_col
    from feast_spark.session import get_spark

    # split files so input partitions ≫ cores: 37 default splits on 32
    # cores = 2 waves with the 2nd 84% idle; 16 MiB splits → ~210 tasks,
    # last-wave waste <8%. (Cluster equivalent: tune maxPartitionBytes to
    # target ~4-6 tasks per core per scan.)
    spark = get_spark(
        f"scaling_{cores}",
        cores=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )

    pages = spark.read.parquet(pages_path).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    )
    rows = pages.count()
    # warm the JVM + Python workers without running the real job
    spark.range(100_000).selectExpr("sum(id)").collect()
    extract_features_col(
        pages.limit(256).select("url", "warc_ts", "html")
    ).write.format("noop").mode("overwrite").save()

    t0 = time.monotonic()
    # fused Arrow kernel: extract + per-doc features in one pass; only
    # compact numerics cross the Arrow boundary (the 100 TB hot path)
    feats = extract_features_col(pages.select("url", "warc_ts", "html"))
    w = Window.partitionBy("url").orderBy("warc_ts")
    wr = (
        Window.partitionBy("url")
        .orderBy(F.col("warc_ts").cast("double"))
        .rangeBetween(-7 * 86400, 0)
    )
    feats = feats.select(
        "url",
        "warc_ts",
        "q_n_chars",
        "q_n_tokens",
        F.lag("q_n_chars", 1).over(w).alias("lag1_n_chars"),
        F.count(F.lit(1)).over(wr).alias("roll7d_count"),
    )
    # Materialize the (tiny) probe set up front: otherwise its scan stage
    # races the extraction stage for task slots and the Python workers
    # idle — measured 42s vs 75-90s run-to-run variance at 32 cores from
    # exactly this scheduler race. (Cluster equivalent: probes are their
    # own small table, not a rescan of the 100 TB pages table.)
    probes = (
        pages.select("url")
        .distinct()
        .withColumn("ts", F.lit("2024-02-01 00:00:00").cast("timestamp"))
        .persist()
    )
    probes.count()
    retrieved = asof_join(
        probes, feats, by="url", left_on="ts", right_on="warc_ts",
        ttl=90 * 86400, strategy="union",
    )
    retrieved.write.format("noop").mode("overwrite").save()
    sec = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "sec": round(sec, 2),
                "rows": rows,
                "rows_per_sec": round(rows / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
