"""Declared Aggregation specs on FeatureViews (upstream
feast/aggregation.py — stream-feature-view Aggregation(column, function,
time_window)): derived trailing-window features computed at event times,
served PIT-correctly by retrieval, materialized to the online store, and
persisted through the JSON registry."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from feast_spark.registry import (
    Aggregation,
    Entity,
    FeatureSpec,
    FeatureStore,
    FeatureView,
)

TS = "ts string, url string, value double"


def _events(spark):
    rows = [
        ("2024-01-01 00:00:00", "a", 1.0),
        ("2024-01-01 00:30:00", "a", 2.0),
        ("2024-01-01 01:15:00", "a", 4.0),
        ("2024-01-01 00:10:00", "b", 10.0),
        ("2024-01-01 02:00:00", "b", 20.0),
    ]
    return spark.createDataFrame(rows, TS).select(
        F.col("ts").cast("timestamp").alias("warc_ts"), "url", "value"
    )


def _view(spark, aggs, features, ttl=None):
    return FeatureView(
        name="ev",
        entity=Entity("url", "url"),
        source=lambda s: _events(s),
        features=features,
        ttl=ttl,
        timestamp_field="warc_ts",
        aggregations=aggs,
    )


def test_aggregation_names_and_guards():
    assert (
        Aggregation("value", "sum", timedelta(hours=1)).feature_name
        == "sum_value_3600s"
    )
    assert Aggregation("value", "avg").feature_name == "avg_value"
    with pytest.raises(ValueError, match="not supported"):
        Aggregation("value", "median", timedelta(hours=1))
    with pytest.raises(ValueError, match="positive"):
        Aggregation("value", "sum", timedelta(seconds=0))


def test_derived_frame_trailing_window_values(spark):
    aggs = [
        Aggregation("value", "sum", timedelta(hours=1)),
        Aggregation("value", "count", timedelta(hours=1)),
        Aggregation("value", "sum"),  # lifetime
    ]
    fv = _view(spark, aggs, [FeatureSpec("sum_value_3600s", "double")])
    got = {
        (r["url"], str(r["warc_ts"])): (
            r["sum_value_3600s"], r["count_value_3600s"], r["sum_value"]
        )
        for r in fv.derived_frame(_events(spark)).collect()
    }
    # a@01:15 — 1h window [00:15, 01:15] holds 00:30 and 01:15
    assert got[("a", "2024-01-01 01:15:00")] == (6.0, 2, 7.0)
    assert got[("a", "2024-01-01 00:30:00")] == (3.0, 2, 3.0)
    assert got[("a", "2024-01-01 00:00:00")] == (1.0, 1, 1.0)
    # b@02:00 — 00:10 fell out of the 1h window; lifetime keeps it
    assert got[("b", "2024-01-01 02:00:00")] == (20.0, 1, 30.0)


def test_retrieval_serves_aggregates_pit_correctly(spark):
    aggs = [Aggregation("value", "sum", timedelta(hours=1))]
    store = FeatureStore(spark)
    store.apply(
        _view(spark, aggs, [FeatureSpec("sum_value_3600s", "double")])
    )
    probes = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:45:00"),  # anchor 00:30 -> 3.0
            ("a", "2024-01-01 01:20:00"),  # anchor 01:15 -> 6.0
            ("b", "2024-01-01 01:00:00"),  # anchor 00:10 -> 10.0
            ("b", "2024-01-01 00:05:00"),  # before first event -> NULL
        ],
        "url string, ts string",
    ).select("url", F.col("ts").cast("timestamp").alias("ts"))
    out = store.get_historical_features(
        probes, ["ev:sum_value_3600s"], strategy="union"
    )
    got = {
        (r["url"], str(r["ts"])): r["sum_value_3600s"] for r in out.collect()
    }
    assert got[("a", "2024-01-01 00:45:00")] == 3.0
    assert got[("a", "2024-01-01 01:20:00")] == 6.0
    assert got[("b", "2024-01-01 01:00:00")] == 10.0
    assert got[("b", "2024-01-01 00:05:00")] is None


def test_layout_ttl_scan_widening_preserves_window_history(
    spark, tmp_path_factory
):
    """A TTL-pruned layout scan must still include the aggregation
    window's history BELOW the TTL horizon: the trailing sum at the
    first in-TTL event counts events the TTL alone would have pruned."""
    from feast_spark.sources import pages as layout

    root = str(tmp_path_factory.mktemp("aggl") / "t")
    ev = _events(spark)
    layout.write_table(ev, root, key_col="url", n_buckets=2)
    aggs = [Aggregation("value", "sum", timedelta(hours=1))]
    mk = lambda ttl: FeatureView(  # noqa: E731
        name="evl",
        entity=Entity("url", "url"),
        source=root,
        features=[FeatureSpec("sum_value_3600s", "double")],
        ttl=ttl,
        timestamp_field="warc_ts",
        aggregations=aggs,
    )
    probes = spark.createDataFrame(
        [("a", "2024-01-01 01:20:00")], "url string, ts string"
    ).select("url", F.col("ts").cast("timestamp").alias("ts"))
    for ttl in (timedelta(minutes=10), None):
        store = FeatureStore(spark)
        store.apply(mk(ttl))
        out = store.get_historical_features(
            probes, ["evl:sum_value_3600s"], strategy="union"
        ).collect()
        # anchor 01:15 (within any ttl >= 5min); window [00:15, 01:15]
        # includes 00:30 which a bare ttl=10min scan bound would prune
        assert out[0]["sum_value_3600s"] == 6.0, ttl


def test_materialize_aggregated_view_serves_latest_window_value(
    spark, tmp_path_factory
):
    from feast_spark.materialize import MaterializeJob, read_online

    aggs = [
        Aggregation("value", "sum", timedelta(hours=1)),
        Aggregation("value", "count"),
    ]
    fv = _view(
        spark,
        aggs,
        [
            FeatureSpec("sum_value_3600s", "double"),
            FeatureSpec("count_value", "bigint"),
        ],
    )
    dest = str(tmp_path_factory.mktemp("aggm") / "store")
    job = MaterializeJob(spark, fv, dest, n_buckets=2)
    job.run(datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 1, 3, 0))
    got = {
        r["url"]: (r["sum_value_3600s"], r["count_value"])
        for r in read_online(spark, dest).collect()
    }
    # a: latest in range = 01:15, 1h window sum = 6 (00:30 provided by
    # the widened scan, even though 00:30 < materialization start);
    # lifetime count sees all 3 events
    assert got["a"] == (6.0, 3)
    # b: latest = 02:00, window holds only itself; lifetime count = 2
    assert got["b"] == (20.0, 2)


def test_registry_roundtrip_and_validation(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aggr"))
    pq = str(tmp_path_factory.mktemp("aggsrc") / "ev.parquet")
    _events(spark).write.parquet(pq)
    aggs = [Aggregation("value", "max", timedelta(days=1))]
    store = FeatureStore(spark, root=root)
    store.apply(
        FeatureView(
            name="evp",
            entity=Entity("url", "url"),
            source=pq,
            features=[FeatureSpec("max_value_86400s", "double")],
            timestamp_field="warc_ts",
            aggregations=aggs,
        ),
        validate=True,  # declared feature exists only in the DERIVED schema
    )
    reloaded = FeatureStore(spark, root=root).get_view("evp")
    assert reloaded.aggregations == aggs
    assert reloaded.max_agg_window == timedelta(days=1)


def test_pinned_ref_view_reads_release_through_head_advance(
    spark, tmp_path_factory
):
    """FeatureView(ref='tag') pins retrieval AND materialization to a
    corpus release: after more commits advance HEAD, the pinned view
    still reads (and serves) only the tagged snapshot's rows, while an
    unpinned twin follows HEAD. Registry round-trip preserves the pin."""
    from datetime import datetime

    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.sources import pages as layout

    root = str(tmp_path_factory.mktemp("pin") / "t")
    mk = lambda url, ts, v: spark.createDataFrame(  # noqa: E731
        [(url, ts, v)], "url string, ts string, v double"
    ).select("url", F.col("ts").cast("timestamp").alias("ts"), "v")
    layout.write_table(
        mk("a", "2024-01-01 00:00:00", 1.0), root,
        key_col="url", ts_col="ts", n_buckets=2,
    )
    layout.create_tag(root, "rel1")
    layout.write_table(
        mk("b", "2024-01-02 00:00:00", 2.0), root,
        key_col="url", ts_col="ts", n_buckets=2, mode="append",
    )
    feats = [FeatureSpec("v", "double")]
    pinned = FeatureView(
        name="pv", entity=Entity("url", "url"), source=root,
        features=feats, timestamp_field="ts", ref="rel1",
    )
    live = FeatureView(
        name="lv", entity=Entity("url", "url"), source=root,
        features=feats, timestamp_field="ts",
    )
    reg_root = str(tmp_path_factory.mktemp("pinreg"))
    store = FeatureStore(spark, root=reg_root)
    store.apply([pinned, live])
    probes = spark.createDataFrame(
        [("a", "2024-02-01 00:00:00"), ("b", "2024-02-01 00:00:00")],
        "url string, ts string",
    ).select("url", F.col("ts").cast("timestamp").alias("ts"))
    got_pin = store.get_historical_features(probes, ["pv:v"], strategy="union")
    got_live = store.get_historical_features(probes, ["lv:v"], strategy="union")
    pin = {r["url"]: r["v"] for r in got_pin.collect()}
    liv = {r["url"]: r["v"] for r in got_live.collect()}
    assert pin == {"a": 1.0, "b": None}  # b is post-release, invisible
    assert liv == {"a": 1.0, "b": 2.0}
    # registry round-trip preserves the pin
    assert FeatureStore(spark, root=reg_root).get_view("pv").ref == "rel1"
    # materialization of the pinned view serves only release rows, and
    # records the PINNED snapshot in lineage
    dest = str(tmp_path_factory.mktemp("pin") / "store")
    MaterializeJob(spark, pinned, dest, n_buckets=2).run(
        datetime(2023, 12, 1), datetime(2024, 3, 1)
    )
    assert {r["url"] for r in read_online(spark, dest).collect()} == {"a"}
