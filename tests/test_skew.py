"""Hot-key detection + salted aggregation (SURVEY.md §4.2.2: the
explicit skew policy AQE can't provide for windows/groupBy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.skew import (
    detect_hot_keys,
    domain_of,
    plan_salting,
    salted_group_agg,
)


def test_detect_hot_keys_finds_zipf_head(spark, pages_df):
    """The Zipf(1.3) domain distribution has a hot head — detection on
    the domain key must surface it."""
    d = pages_df.withColumn("domain", domain_of("url"))
    total = d.count()
    hot = detect_hot_keys(d, "domain", threshold=total // 20).toPandas()
    assert len(hot) >= 1
    # the hottest domain in the fixture is d000.example (rank-1 Zipf)
    assert hot.iloc[0]["key"] == "d000.example"
    assert (hot["n"] > total // 20).all()


def test_detect_hot_keys_sampled(spark, pages_df):
    d = pages_df.withColumn("domain", domain_of("url"))
    total = d.count()
    hot = detect_hot_keys(
        d, "domain", threshold=total // 10, sample_fraction=0.5
    ).toPandas()
    # rank-1 domain must survive sampling
    assert "d000.example" in set(hot["key"])


def test_salted_group_agg_exact(spark, pages_df):
    d = pages_df.select(
        domain_of("url").alias("domain"), F.length("text").alias("n")
    )
    got = salted_group_agg(
        d,
        "domain",
        {
            "cnt": ("n", "count"),
            "total": ("n", "sum"),
            "lo": ("n", "min"),
            "hi": ("n", "max"),
        },
        salt=8,
    )
    want = d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("total"),
        F.min("n").alias("lo"),
        F.max("n").alias("hi"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_group_agg_rejects_nondecomposable(spark, pages_df):
    # avg/stddev are composed since r03; truly order/set-dependent
    # aggregates still refuse
    d = pages_df.select(domain_of("url").alias("domain"), F.length("text").alias("n"))
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_group_agg(d, "domain", {"m": ("n", "median")})


def test_plan_salting(spark, pages_df):
    d = pages_df.withColumn("domain", domain_of("url"))
    total = d.count()
    plan = plan_salting(d, "domain", threshold=total // 20, sample_fraction=None)
    assert plan["use_salting"] is True
    assert "d000.example" in plan["hot_keys"]
    cold = plan_salting(d, "domain", threshold=total * 2, sample_fraction=None)
    assert cold["use_salting"] is False and cold["hot_keys"] == []


def test_salted_count_null_semantics_and_determinism(spark):
    """count on a named column skips nulls (groupBy semantics) and the
    salt is a deterministic function of row content (retry-safe)."""
    from pyspark.sql import Row

    from feast_spark.operators.skew import salted_group_agg

    df = spark.createDataFrame(
        [Row(k="a", v=1.0), Row(k="a", v=None), Row(k="a", v=3.0),
         Row(k="b", v=None), Row(k="b", v=None)]
    )
    got = salted_group_agg(
        df, "k", {"n": ("v", "count"), "n_star": ("*", "count")}, salt=4
    ).orderBy("k").collect()
    want = (
        df.groupBy("k")
        .agg(F.count("v").alias("n"), F.count(F.lit(1)).alias("n_star"))
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # deterministic across evaluations (same plan → identical results)
    again = salted_group_agg(
        df, "k", {"n": ("v", "count"), "n_star": ("*", "count")}, salt=4
    ).orderBy("k").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_salted_group_agg_moments_match_plain(spark):
    """VERDICT r02 next #6: avg/stddev are built-in moment compositions —
    results equal plain groupBy().agg(avg, stddev_samp) including the
    null edges (all-null group → NULL; single value → NULL stddev)."""
    import math

    from pyspark.sql import Row

    from feast_spark.operators.skew import salted_group_agg

    rows = [Row(k=f"k{i % 7}", v=float(i * i % 97)) for i in range(500)]
    rows += [Row(k="single", v=3.5), Row(k="allnull", v=None)]
    df = spark.createDataFrame(rows)
    got = {
        r["k"]: (r["m"], r["sd"], r["n"])
        for r in salted_group_agg(
            df, "k",
            {"m": ("v", "avg"), "sd": ("v", "stddev"), "n": ("v", "count")},
            salt=8,
        ).collect()
    }
    want = {
        r["k"]: (r["m"], r["sd"], r["n"])
        for r in df.groupBy("k")
        .agg(
            F.avg("v").alias("m"),
            F.stddev_samp("v").alias("sd"),
            F.count("v").alias("n"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        for g, w in zip(got[k], want[k]):
            if w is None:
                assert g is None, (k, got[k], want[k])
            elif isinstance(w, float):
                assert math.isclose(g, w, rel_tol=1e-9), (k, got[k], want[k])
            else:
                assert g == w, (k, got[k], want[k])
