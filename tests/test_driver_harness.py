"""Replica of the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare row-count + order-insensitive values against
``oracle_sql()`` in DuckDB (SURVEY.md §5.2.6)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                norm.append("<null>")
            elif pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                norm.append("<null>")
            elif isinstance(v, float):
                norm.append(f"{v:.9g}")
            elif isinstance(v, pd.Timestamp):
                norm.append(v.isoformat())
            else:
                norm.append(str(v))
        rows.append(tuple(norm))
    return sorted(rows)


SQL_CHECKED = sorted(set(entrymod.oracle_sql().keys()))
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(entrymod.oracle_sql().keys()))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    exp = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"columns: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    # The driver's value-hash is dtype-sensitive: a DuckDB HUGEINT sum that
    # fetchdf() renders as float64 vs Spark's bigint hashes differently even
    # when values agree (round-1 sessionize/grouping_sets failures). Replicate
    # by requiring matching numeric-kind per column (int-family vs float).
    kind = lambda d: {"i": "i", "u": "i", "f": "f"}.get(d.kind, "o")  # noqa: E731
    for col in got.columns:
        gk, ek = kind(got[col].dtype), kind(exp[col].dtype)
        # all-null columns surface as object/float64 in pandas; skip those
        if got[col].isna().all() or exp[col].isna().all():
            continue
        assert gk == ek, (
            f"dtype kind mismatch on {col!r}: spark {got[col].dtype} vs "
            f"oracle {exp[col].dtype} — driver hash would differ"
        )
    g, e = _normalize(got), _normalize(exp)
    mismatches = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
    assert not mismatches, (
        f"{len(mismatches)} mismatched rows; first: {g[mismatches[0]]} vs {e[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
