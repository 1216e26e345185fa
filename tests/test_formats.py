"""CSV/JSON file sources feed the same retrieval path as parquet
(SURVEY.md S1/S4 breadth)."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView
from feast_spark.sources.formats import file_source, read_source


@pytest.fixture(scope="module")
def multi_format_dir(spark, pages_df, tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    slim = pages_df.select(
        "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"),
        F.length("text").cast("long").alias("n_chars"),
    )
    # CSV's default timestampFormat is millisecond-precision; warc_ts
    # carries microseconds — pin the format on write AND read
    (
        slim.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(str(d / "pages_csv"))
    )
    (
        slim.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(str(d / "pages_json"))
    )
    return d, slim


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_roundtrip_matches_parquet(spark, multi_format_dir, fmt):
    d, slim = multi_format_dir
    schema = "url string, warc_ts timestamp, n_chars long"
    opts = {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}
    if fmt == "csv":
        opts["header"] = True
    got = read_source(spark, str(d / f"pages_{fmt}"), fmt, schema=schema, **opts)
    assert got.count() == slim.count()
    assert got.exceptAll(slim).count() == 0


def test_csv_source_through_retrieval(spark, multi_format_dir, probes_df):
    d, _slim = multi_format_dir
    store = FeatureStore(spark)
    store.apply(
        FeatureView(
            name="pg_csv",
            entity=Entity("url", "url"),
            source=file_source(
                str(d / "pages_csv"), "csv",
                schema="url string, warc_ts timestamp, n_chars long",
                header=True,
                timestampFormat="yyyy-MM-dd HH:mm:ss.SSSSSS",
            ),
            features=[FeatureSpec("n_chars", "bigint")],
            ttl=timedelta(days=90),
            timestamp_field="warc_ts",
        )
    )
    out = store.get_historical_features(probes_df, ["pg_csv:n_chars"])
    assert out.count() == probes_df.count()
    assert out.filter(F.col("n_chars").isNotNull()).count() > 0


def test_orc_roundtrip(spark, multi_format_dir, tmp_path_factory):
    _d, slim = multi_format_dir
    p = str(tmp_path_factory.mktemp("orc") / "pages_orc")
    slim.write.mode("overwrite").orc(p)
    got = read_source(spark, p, "orc")
    assert got.exceptAll(slim).count() == 0
    assert slim.exceptAll(got).count() == 0


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="not in"):
        read_source(spark, "/tmp/x", "avro")
