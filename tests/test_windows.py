"""Windowed feature builders: backfill invariance, sessionization
boundaries, salted-window equivalence, permutation determinism
(SURVEY.md §5.2.2)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.windows import (
    backfill_fill,
    latest_per_key,
    rolling_aggregates,
    salted_rolling_count,
    session_stats,
    sessionize,
    with_lag_lead,
)


@pytest.fixture(scope="module")
def ev(spark):
    rows = []
    # url A: regular 10-min cadence; url B: two bursts 2h apart; url C: one row
    for i in range(12):
        rows.append(("A", 1_700_000_000 + i * 600, float(i)))
    for i in range(5):
        rows.append(("B", 1_700_000_000 + i * 60, 100.0 + i))
        rows.append(("B", 1_700_007_200 + i * 60, 200.0 + i))
    rows.append(("C", 1_700_000_000, 7.0))
    df = spark.createDataFrame(rows, "url string, sec long, v double")
    return df.withColumn("warc_ts", F.col("sec").cast("timestamp")).drop("sec")


def test_lag_lead(spark, ev):
    out = with_lag_lead(ev, ["v"], offsets=(1,)).toPandas()
    a = out[out.url == "A"].sort_values("warc_ts")
    assert a["lag1_v"].iloc[0] != a["lag1_v"].iloc[0]  # NaN first
    assert (a["lag1_v"].iloc[1:].values == a["v"].iloc[:-1].values).all()
    assert (a["lead1_v"].iloc[:-1].values == a["v"].iloc[1:].values).all()


def test_rolling_window_bounds(spark, ev):
    out = rolling_aggregates(
        ev, "v", window_seconds=1800, prefix="r"
    ).toPandas()
    a = out[out.url == "A"].sort_values("warc_ts").reset_index(drop=True)
    # at row i (10-min cadence), trailing 30 min covers rows i-3..i
    assert a["r_count"].tolist() == [min(i + 1, 4) for i in range(12)]
    c = out[out.url == "C"]
    assert c["r_count"].tolist() == [1] and c["r_mean"].tolist() == [7.0]


def test_backfill_invariance(spark, ev):
    """North rule "backfill-aware": recomputing a historical slice with
    window_seconds of preceding context reproduces identical values."""
    full = rolling_aggregates(ev, "v", window_seconds=1800, prefix="r")
    cut = F.lit("2023-11-14T22:40:00").cast("timestamp")
    # slice = rows at/after cut, computed with context from cut-1800s
    ctx = ev.filter(F.col("warc_ts") >= F.lit("2023-11-14T22:10:00").cast("timestamp"))
    sliced = rolling_aggregates(ctx, "v", window_seconds=1800, prefix="r").filter(
        F.col("warc_ts") >= cut
    )
    expected = full.filter(F.col("warc_ts") >= cut)
    assert sliced.exceptAll(expected).count() == 0
    assert expected.exceptAll(sliced).count() == 0


def test_sessionize_boundaries(spark, ev):
    s = sessionize(ev, gap_seconds=1800).toPandas()
    assert s[s.url == "A"]["sess_id"].nunique() == 1  # 10-min gaps: one session
    assert s[s.url == "B"]["sess_id"].nunique() == 2  # 2h gap splits
    assert s[s.url == "C"]["sess_id"].tolist() == [1]
    stats = session_stats(ev, gap_seconds=1800).toPandas()
    b = stats[stats.url == "B"].sort_values("sess_id")
    assert b["n_events"].tolist() == [5, 5]


def test_latest_per_key_permutation_invariant(spark, ev):
    dup = ev.unionByName(ev.limit(6))  # inject duplicates
    a = latest_per_key(dup, key="url", order="warc_ts").toPandas()
    b = latest_per_key(
        dup.orderBy(F.rand(seed=1)).repartition(7), key="url", order="warc_ts"
    ).toPandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_rolling_count_equals_plain(spark, pages_df):
    """The two-phase salted cumulative count must equal the naive window
    exactly (hot-domain skew policy, SURVEY.md §4.2.2)."""
    from pyspark.sql import Window

    df = pages_df.select(
        "url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "lang"
    )
    got = salted_rolling_count(df, key="url", order="warc_ts")
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").asc(), F.xxhash64(*[F.col(c) for c in df.columns]).asc()
    )
    want = df.withColumn("cum_count", F.row_number().over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_backfill_fill_locf(spark):
    df = spark.createDataFrame(
        [("u", 1, 1.0), ("u", 2, None), ("u", 3, None), ("u", 4, 4.0), ("v", 1, None)],
        "url string, t long, v double",
    )
    out = backfill_fill(df, ["v"], order="t").orderBy("url", "t").toPandas()
    assert out["v"].tolist()[:4] == [1.0, 1.0, 1.0, 4.0]
    assert pd.isna(out["v"].iloc[4])  # no prior observation stays NULL
