"""Incremental append scan (Iceberg incremental read): only the rows
appended between two snapshots, append-only ranges enforced."""

import pytest
from pyspark.sql import functions as F

from feast_spark.sources import pages as layout


def mk(spark, ids, day):
    return spark.createDataFrame(
        [(f"u{i}", f"2024-01-{day:02d} 00:00:00", float(i)) for i in ids],
        "url string, ts string, v double",
    ).select("url", F.col("ts").cast("timestamp").alias("ts"), "v")


@pytest.fixture()
def root3(spark, tmp_path):
    """Three append snapshots: ids 0-9 (day 1), 10-19 (day 2), 20-29 (day 3)."""
    root = str(tmp_path / "t")
    s1 = layout.write_table(
        mk(spark, range(10), 1), root, key_col="url", ts_col="ts", n_buckets=2
    )
    s2 = layout.write_table(
        mk(spark, range(10, 20), 2), root, key_col="url", ts_col="ts",
        n_buckets=2, mode="append",
    )
    s3 = layout.write_table(
        mk(spark, range(20, 30), 3), root, key_col="url", ts_col="ts",
        n_buckets=2, mode="append",
    )
    return root, (s1, s2, s3)


def ids_of(df):
    return sorted(int(r["url"][1:]) for r in df.select("url").collect())


def test_incremental_reads_only_new_rows(spark, root3):
    root, (s1, s2, s3) = root3
    assert ids_of(layout.read_table_incremental(spark, root, s1)) == list(
        range(10, 30)
    )
    assert ids_of(layout.read_table_incremental(spark, root, s2)) == list(
        range(20, 30)
    )
    assert ids_of(
        layout.read_table_incremental(spark, root, s1, to_snapshot=s2)
    ) == list(range(10, 20))


def test_from_head_is_empty(spark, root3):
    root, (_, _, s3) = root3
    df = layout.read_table_incremental(spark, root, s3)
    assert df.count() == 0
    # schema preserved even when empty
    assert set(df.columns) == {"url", "ts", "v"}


def test_pruning_composes(spark, root3):
    root, (s1, _, _) = root3
    # time pruning within the delta: only day-2 rows survive
    got = layout.read_table_incremental(
        spark, root, s1, start="2024-01-02", end="2024-01-03"
    )
    assert ids_of(got) == list(range(10, 20))
    # bucket pruning: union over both buckets = the whole delta
    b0 = layout.read_table_incremental(spark, root, s1, buckets={0})
    b1 = layout.read_table_incremental(spark, root, s1, buckets={1})
    assert sorted(ids_of(b0) + ids_of(b1)) == list(range(10, 30))
    assert b0.count() > 0 and b1.count() > 0


def test_non_append_in_range_raises(spark, root3):
    root, (s1, _, _) = root3
    layout.compact_table(spark, root)
    with pytest.raises(ValueError, match="append-only"):
        layout.read_table_incremental(spark, root, s1)


def test_not_an_ancestor_raises(spark, root3):
    root, _ = root3
    with pytest.raises(ValueError, match="not an ancestor"):
        layout.read_table_incremental(spark, root, 999)


def test_expired_chain_raises(spark, root3):
    root, (s1, _, _) = root3
    layout.expire_snapshots(root, keep_last=1)
    with pytest.raises(ValueError, match="chain broken|not possible"):
        layout.read_table_incremental(spark, root, s1)


def test_matches_full_diff(spark, root3):
    """Incremental == full(to) exceptAll full(from) on an append table."""
    root, (s1, _, s3) = root3
    inc = layout.read_table_incremental(spark, root, s1, to_snapshot=s3)
    full_to = layout.read_table(spark, root, snapshot=s3)
    full_from = layout.read_table(spark, root, snapshot=s1)
    diff = full_to.exceptAll(full_from)
    assert inc.exceptAll(diff).count() == 0
    assert diff.exceptAll(inc).count() == 0
