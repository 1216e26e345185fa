"""Expectation-based validation semantics (feast_spark.validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.validation import expect, validate_table


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(id=1, grp="a", v=1.0),
        Row(id=2, grp="a", v=2.0),
        Row(id=3, grp="b", v=-5.0),
        Row(id=3, grp="b", v=7.0),     # duplicate id
        Row(id=4, grp=None, v=None),   # null grp + null v
        Row(id=5, grp="zz", v=3.0),    # off-list grp
    ]
    return spark.createDataFrame(rows)


def test_validate_table_measures(spark, df):
    out = {
        (r["kind"], r["column"]): (r["passed"], r["observed"])
        for r in validate_table(
            df,
            [
                {"kind": "not_null", "column": "v"},
                {"kind": "unique", "columns": ["id"]},
                {"kind": "unique", "columns": ["id", "grp"]},
                {"kind": "accepted_range", "column": "v", "min": 0.0},
                {"kind": "accepted_values", "column": "grp",
                 "values": ["a", "b"]},
            ],
        ).collect()
    }
    rows = validate_table(
        df, [{"kind": "row_count_min", "value": 5},
             {"kind": "row_count_min", "value": 100}]
    ).collect()
    assert [r["passed"] for r in rows] == [True, False]
    assert all(r["observed"] == 6.0 for r in rows)

    assert out[("not_null", "v")][0] is False
    assert out[("not_null", "v")][1] == pytest.approx(1 / 6)
    assert out[("unique", "id")] == (False, 1.0)       # one duplicate id
    assert out[("unique", "id,grp")] == (False, 1.0)   # same pair twice
    assert out[("accepted_range", "v")] == (False, 1.0)  # -5.0
    assert out[("accepted_values", "grp")] == (False, 1.0)  # 'zz'; null ok


def test_validate_single_pass(spark, df, monkeypatch):
    """All expectations evaluate in ONE aggregation job."""
    from pyspark.sql.classic.dataframe import DataFrame

    n_aggs = []
    orig = DataFrame.agg

    def spy(self, *a, **kw):
        n_aggs.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "agg", spy)
    validate_table(
        df,
        [
            {"kind": "row_count_min", "value": 1},
            {"kind": "not_null", "column": "v"},
            {"kind": "unique", "columns": ["id"]},
            {"kind": "accepted_range", "column": "v", "min": 0},
            {"kind": "accepted_values", "column": "grp", "values": ["a"]},
        ],
    ).collect()
    assert len(n_aggs) == 1


def test_expect_raises_listing_failures(spark, df):
    with pytest.raises(ValueError, match="unique"):
        expect(df, [{"kind": "unique", "columns": ["id"]}])
    expect(df, [{"kind": "row_count_min", "value": 2}])  # passes silently
    with pytest.raises(ValueError, match="unknown expectation"):
        validate_table(df, [{"kind": "nope"}])


def test_validate_empty_table(spark):
    out = {
        r["kind"]: (r["passed"], r["observed"])
        for r in validate_table(
            spark.createDataFrame([], "id long, v double"),
            [
                {"kind": "row_count_min", "value": 1},
                {"kind": "not_null", "column": "v"},
                {"kind": "accepted_range", "column": "v", "min": 0},
            ],
        ).collect()
    }
    assert out["row_count_min"] == (False, 0.0)
    assert out["not_null"] == (True, 0.0)   # vacuously: no nulls present
    assert out["accepted_range"] == (True, 0.0)


# ------------------------------------------------------- PSI drift ---------


def test_psi_zero_for_identical_distributions(spark):
    from feast_spark.validation import psi_drift

    df = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)], "x double"
    )
    rows = psi_drift(df, df, "x", lo=0.0, hi=10.0, bins=10).collect()
    assert len(rows) == 10
    assert abs(sum(r["psi"] for r in rows)) < 1e-12
    for r in rows:
        assert abs(r["p_ref"] - 0.1) < 1e-12 and r["p_ref"] == r["p_cur"]


def test_psi_detects_shift_and_gate_raises(spark):
    import pytest as _pt

    from feast_spark.validation import expect_no_drift, psi_drift

    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)], "x double"
    )
    # current mass concentrated in the top bins — a strong shift
    cur = spark.createDataFrame(
        [(7.0 + (i % 3),) for i in range(1000)], "x double"
    )
    total = sum(
        r["psi"]
        for r in psi_drift(ref, cur, "x", lo=0.0, hi=10.0, bins=10).collect()
    )
    assert total > 0.25, total
    with _pt.raises(ValueError, match="PSI drift"):
        expect_no_drift(ref, cur, "x", lo=0.0, hi=10.0, threshold=0.25)
    # identical passes the gate and returns ~0
    assert expect_no_drift(ref, ref, "x", lo=0.0, hi=10.0) < 1e-12


def test_psi_outliers_clamp_into_edge_bins_and_nulls_drop(spark):
    from feast_spark.validation import psi_drift

    ref = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], "x double"
    )
    cur = spark.createDataFrame(
        [(-100.0,), (999.0,), (None,)], "x double"
    )
    rows = {
        r["bin"]: r for r in psi_drift(
            ref, cur, "x", lo=0.0, hi=10.0, bins=5
        ).collect()
    }
    # outliers register as edge-bin mass (not dropped): bin 0 and bin 4
    assert rows[0]["p_cur"] == 0.5 and rows[4]["p_cur"] == 0.5
    # nulls excluded: fractions are over 2 rows each side
    # (1.0 -> bin 0, 2.0 -> bin 1 at width 2)
    assert rows[0]["p_ref"] == 0.5 and rows[1]["p_ref"] == 0.5
