"""Mergeable-sketch semantics (operators.sketches): accuracy vs exact,
and EXACT equality of merged-partial vs single-pass estimates (the
property that makes sketch rollup tables sound)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.sketches import (
    hll_distinct,
    hll_rollup,
    hll_union_rows,
)

EVENTS = "/root/testdata/sf0.01/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS).cache()


def test_hll_estimate_close_to_exact(spark, events):
    exact = events.select("user_id").distinct().count()
    est = hll_distinct(events, "user_id").first()["approx_n_user_id"]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_rollup_union_equals_single_pass(spark, events):
    """Register-max merge: union of per-day sketches must give the SAME
    estimate as one sketch over all rows — not just close, identical."""
    daily = hll_rollup(
        events.withColumn("day", F.to_date("ts")), "user_id", part_col="day"
    ).cache()
    assert daily.count() > 5  # really multiple partitions
    merged = hll_union_rows(daily).first()["approx_distinct"]
    direct = hll_distinct(events, "user_id").first()["approx_n_user_id"]
    assert merged == direct

    # range query: union only some days ≥ any single day's estimate
    some = daily.orderBy("day").limit(3)
    sub = hll_union_rows(some).first()["approx_distinct"]
    assert 0 < sub <= merged


def test_hll_grouped(spark, events):
    per_type = {
        r["event_type"]: r["approx_n_user_id"]
        for r in hll_distinct(events, "user_id", by=["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert per_type.keys() == exact.keys()
    for k in exact:
        assert abs(per_type[k] - exact[k]) / exact[k] < 0.1, k


def test_count_min_heavy_hitters(spark, events):
    """Count-Min: estimates are ≥ true counts (one-sided error) and
    tight for heavy hitters."""
    sk = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch
    row = __import__("feast_spark.operators.sketches", fromlist=["freq_sketch"]) \
        .freq_sketch(events, "event_type").first()
    cms = sk.readFrom(bytes(row["cms"]))
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, n in exact.items():
        est = cms.estimateCount(k)
        assert n <= est <= n * 1.05, (k, n, est)
