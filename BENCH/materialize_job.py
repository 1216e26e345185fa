#!/usr/bin/env python
"""spark-submit entry: materialize the pages table's latest-per-url
feature rows for [start, end) into a serving store, with per-bucket
lineage + resume (SURVEY.md §3.2; driven by BENCH/run.sh).

The SparkSession comes from spark-submit (cluster configs live in the
submit args), NOT from session.get_spark — the sandbox-only factory.
"""
from __future__ import annotations

import json
import sys
from datetime import timedelta

from pyspark.sql import SparkSession


def main() -> None:
    table_root, dest, start, end = sys.argv[1:5]
    spark = SparkSession.builder.appName("feast_spark_materialize").getOrCreate()

    from feast_spark.materialize import MaterializeJob
    from feast_spark.operators.text import extract_features_col
    from feast_spark.registry import Entity, FeatureSpec, FeatureView

    view = FeatureView(
        name="pages",
        entity=Entity("url", "url"),
        source=table_root,
        features=[
            FeatureSpec("q_n_chars", "bigint"),
            FeatureSpec("q_n_tokens", "bigint"),
            FeatureSpec("q_punct_ratio", "double"),
            FeatureSpec("q_stopword_ratio", "double"),
        ],
        ttl=timedelta(days=90),
        timestamp_field="warc_ts",
    )

    def transform(df):
        return extract_features_col(df.select("url", "warc_ts", "html")).select(
            "url", "warc_ts", "q_n_chars", "q_n_tokens",
            "q_punct_ratio", "q_stopword_ratio",
        )

    job = MaterializeJob(spark, view, dest, transform=transform)
    summary = job.run(start, end)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
