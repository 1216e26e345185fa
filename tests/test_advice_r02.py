"""Regression tests for the round-2 ADVICE findings (judge advisor):

1. pages._file_stats: decimal/bytes parquet stats must not reach the
   json.dump'd snapshot (commit crash for tables with such columns).
2. pages.write_table overwrite: HEAD is dropped before the data-dir swap
   so a crash leaves the table loudly uninitialized, and append on a
   data-without-HEAD root raises instead of silently re-registering.
3. MaterializeJob.run records the key dtype in store.json (read_online
   then never reads a parquet footer on the serving hot path).
4. registry._deserialize_transform validates the src BEFORE exec: write
   access to registry.json is not arbitrary code execution.
"""

from __future__ import annotations

import decimal
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.sources import pages as layout


def test_file_stats_json_unsafe_bounds_dropped(tmp_path):
    """decimal.Decimal / bytes min-max pairs are dropped from the
    manifest (json cannot serialize them); key/ts stats survive."""
    p = str(tmp_path / "f.parquet")
    t = pa.table(
        {
            "k": ["a", "b"],
            "ts": pd.to_datetime(["2023-01-01", "2023-01-02"]),
            "price": pa.array(
                [decimal.Decimal("1.25"), decimal.Decimal("9.50")],
                type=pa.decimal128(10, 2),
            ),
            "blob": pa.array([b"xx", b"yy"], type=pa.binary()),
        }
    )
    pq.write_table(t, p)
    st = layout._file_stats(p, "f.parquet", "k", "ts")
    assert "price" not in st["cols"]
    assert "blob" not in st["cols"]
    assert st["min_key"] == "a" and st["max_key"] == "b"
    json.dumps(st)  # the actual r02 crash


def test_write_table_decimal_column_commits(spark, tmp_path):
    """End to end: a table with a decimal column commits a loadable
    snapshot (the r02 advisory crash was json.dump at commit time)."""
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [Row(url=f"u{i}", warc_ts="2023-06-01 00:00:00") for i in range(4)]
    ).withColumn("price", F.lit("12.34").cast("decimal(10,2)"))
    snap_id = layout.write_table(df, root, n_buckets=2)
    snap = layout.current_snapshot(root)
    assert snap["snapshot_id"] == snap_id
    assert layout.read_table(spark, root).count() == 4


def _mk_table(spark, root, n=6):
    df = spark.createDataFrame(
        [Row(url=f"u{i}", warc_ts="2023-06-01 00:00:00", v=i) for i in range(n)]
    )
    layout.write_table(df, root, n_buckets=2)


def test_append_on_headless_data_raises(spark, tmp_path):
    """Data dir present but no committed HEAD = interrupted overwrite;
    append must fail loudly, and a fresh overwrite heals the table."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root)
    os.remove(os.path.join(root, layout.META_DIR, "HEAD"))
    df = spark.createDataFrame([Row(url="x", warc_ts="2023-06-02 00:00:00", v=9)])
    with pytest.raises(RuntimeError, match="no committed HEAD"):
        layout.write_table(df, root, n_buckets=2, mode="append")
    # overwrite heals
    layout.write_table(df, root, n_buckets=2, mode="overwrite")
    assert layout.read_table(spark, root).count() == 1


def test_overwrite_drops_head_before_swap(spark, tmp_path, monkeypatch):
    """Crash injected at the first data-dir rename: HEAD must already be
    gone (loudly uninitialized) rather than pointing at moved files."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root)
    df = spark.createDataFrame([Row(url="x", warc_ts="2023-06-02 00:00:00", v=9)])

    real_replace = os.replace
    data_path = os.path.join(root, layout.DATA_DIR)

    def crashing_replace(src, dst):
        if src == data_path:  # the data -> data.old swap
            raise RuntimeError("injected crash mid-overwrite")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(RuntimeError, match="injected crash"):
        layout.write_table(df, root, n_buckets=2, mode="overwrite")
    monkeypatch.undo()
    assert layout.current_snapshot(root) is None  # loud, not stale
    with pytest.raises(RuntimeError, match="no committed HEAD"):
        layout.write_table(df, root, n_buckets=2, mode="append")


def test_store_meta_records_key_type(spark, tmp_path):
    from datetime import timedelta

    from feast_spark.materialize import MaterializeJob, read_store_meta
    from feast_spark.registry import Entity, FeatureSpec, FeatureView

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [Row(user_id=i, ts="2023-06-01 00:00:00", v=float(i)) for i in range(8)]
    ).write.parquet(src)
    dest = str(tmp_path / "store")
    view = FeatureView(
        name="v",
        entity=Entity("user", "user_id"),
        source=src,
        features=[FeatureSpec("v", "double")],
        ttl=timedelta(days=30),
        timestamp_field="ts",
    )
    MaterializeJob(spark, view, dest, n_buckets=4, bucket_batch=4).run(
        "2023-01-01", "2024-01-01"
    )
    meta = read_store_meta(dest)
    assert meta["key_type"] == "bigint"


def test_registry_load_rejects_tampered_src():
    from feast_spark.registry import _deserialize_transform

    # structure violation: extra top-level statement
    with pytest.raises(ValueError, match="single undecorated def"):
        _deserialize_transform(
            {"src": "import os\ndef f(pdf):\n    return pdf\n", "fn": "f"}
        )
    # escape-hatch builtins are banned even though they ARE builtins
    with pytest.raises(ValueError, match="disallowed globals"):
        _deserialize_transform(
            {
                "src": (
                    "def f(pdf):\n"
                    "    __import__('os').system('true')\n"
                    "    return pdf\n"
                ),
                "fn": "f",
            }
        )
    # a benign numpy/pandas transform still loads and runs
    fn = _deserialize_transform(
        {
            "src": (
                "def f(pdf):\n"
                "    out = pd.DataFrame()\n"
                "    out['y'] = pdf['x'] * 2\n"
                "    return out\n"
            ),
            "fn": "f",
        }
    )
    assert list(fn(pd.DataFrame({"x": [1, 2]}))["y"]) == [2, 4]
