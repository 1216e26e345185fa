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


# ----------------------------------------------------------- Bloom ---------


@pytest.fixture(scope="module")
def bloom_parts(spark, events):
    """Two disjoint halves of the event users, for merge-equality."""
    a = events.filter(F.col("user_id") % 2 == 0)
    b = events.filter(F.col("user_id") % 2 == 1)
    return a, b


def test_bloom_no_false_negatives(spark, events):
    from feast_spark.operators.sketches import bloom_contains, bloom_sketch

    sk = bloom_sketch(events, "user_id").cache()
    got = bloom_contains(sk, events, "user_id")
    n_vals = events.select("user_id").distinct().count()
    hits = got.filter(F.col("contained")).count()
    assert hits == n_vals  # every inserted key screens in, no exception


def test_bloom_false_positive_rate_bounded(spark, events):
    from feast_spark.operators.sketches import bloom_contains, bloom_sketch

    sk = bloom_sketch(events, "user_id")
    # probe keys guaranteed absent (user ids are small positive ints)
    absent = spark.range(1_000_000, 1_002_000).select(
        F.col("id").alias("user_id")
    )
    fp = (
        bloom_contains(sk, absent, "user_id")
        .filter(F.col("contained"))
        .count()
    )
    # m=63*4096 ≈ 258k bits, k=3, n≈1.5k users → fp ≈ (kn/m)^k ~ 1e-5;
    # allow two orders of slack for hash variance
    assert fp / 2000 < 0.01, fp


def test_bloom_merge_equals_single_pass(spark, events, bloom_parts):
    """bit_or is associative/commutative/idempotent: the merged sketch
    table must be ROW-IDENTICAL to single-pass construction — the
    property that makes per-batch persisted sketches sound."""
    from feast_spark.operators.sketches import bloom_merge, bloom_sketch

    a, b = bloom_parts
    merged = bloom_merge(bloom_sketch(a, "user_id"), bloom_sketch(b, "user_id"))
    single = bloom_sketch(events, "user_id")
    assert merged.exceptAll(single).count() == 0
    assert single.exceptAll(merged).count() == 0


def test_bloom_word_width_is_shift_safe(spark):
    """Every mask must stay a POSITIVE long (63-bit words): bit 63 would
    overflow DuckDB's BIGINT shift and go negative in Spark, breaking
    oracle portability."""
    from feast_spark.operators.sketches import bloom_sketch

    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    sk = bloom_sketch(df, "v", m_bits=63 * 64)  # dense small filter
    rows = sk.collect()
    assert rows and all(r["bits"] > 0 for r in rows)
    assert all(0 <= r["word"] < 64 for r in rows)


def test_bloom_m_bits_guard_and_wide_positions(spark):
    """r04 review: positions from an 8-hex md5 prefix silently clipped
    any m_bits above 2^32 (the docstring sizes m ≈ 10^10 for n = 10^9).
    The 15-hex draw must actually reach beyond 2^32, and m_bits beyond
    the hash range must raise instead of silently degrading."""
    import pytest as _pt

    from feast_spark.operators.sketches import (
        BLOOM_MAX_BITS, bloom_sketch,
    )

    df = spark.range(300).select(F.col("id").cast("string").alias("w"))
    wide = bloom_sketch(df, "w", m_bits=1 << 40)
    # each word covers 63 bits; any word index above 2^32/63 proves the
    # draw escaped the old 32-bit range (P[miss] ≈ 2^-8 per draw)
    assert wide.filter(F.col("word") > (1 << 32) // 63).count() > 0
    with _pt.raises(ValueError, match="m_bits"):
        bloom_sketch(df, "w", m_bits=BLOOM_MAX_BITS * 2)
