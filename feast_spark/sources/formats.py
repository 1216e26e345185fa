"""File-format sources beyond Parquet (upstream FileSource supports
parquet; warehouse sources arrive as tables/queries — here the useful
superset for a Spark-native engine is any DataFrameReader format).

``file_source`` returns a FeatureView-compatible callable source, so
format choice stays out of the registry schema:

    FeatureView(source=file_source("/data/events.csv", "csv",
                                   schema="url string, warc_ts timestamp",
                                   header=True), ...)

Scale note: prefer Parquet/the layout for anything hot — csv/json scans
re-parse text per query and carry no column statistics. These exist for
ingestion edges (landing zones, exports), after which
``sources.pages.write_table`` is the durable home.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SUPPORTED = ("parquet", "csv", "json", "orc", "text")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema: str | None = None,
    **options,
) -> DataFrame:
    if fmt not in SUPPORTED:
        raise ValueError(f"format {fmt!r} not in {SUPPORTED}")
    reader = spark.read.format(fmt)
    if schema:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def file_source(
    path: str, fmt: str = "parquet", *, schema: str | None = None, **options
) -> Callable[[SparkSession], DataFrame]:
    """A FeatureView ``source=`` callable bound to (path, format)."""

    def load(spark: SparkSession) -> DataFrame:
        return read_source(spark, path, fmt, schema=schema, **options)

    load.__name__ = f"file_source_{fmt}"
    return load
