"""Regression tests for the round-2 self-review findings (each was a
confirmed or plausible silent-wrong-results / crash bug)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.sources import pages as layout


def test_file_stats_drop_column_when_any_rowgroup_capped(tmp_path):
    """Per-column stats must be whole-file or absent: a row group whose
    long string is cap-dropped would otherwise leave bounds that exclude
    real values — pruning then drops files containing matches."""
    p = str(tmp_path / "f.parquet")
    t = pa.table(
        {
            "k": ["a", "b", "c", "d"],
            "ts": pd.to_datetime(
                ["2023-01-01", "2023-01-02", "2023-01-03", "2023-01-04"]
            ),
            "title": ["apple", "banana", "m", "z" * 80],  # rg2 capped
        }
    )
    pq.write_table(t, p, row_group_size=2)
    st = layout._file_stats(p, "f.parquet", "k", "ts")
    assert "title" not in st["cols"], st["cols"]
    # key/ts still fully recorded
    assert st["min_key"] == "a" and st["max_key"] == "d"
    # and _col_ranges_overlap keeps the file (no stats → no pruning)
    assert layout._col_ranges_overlap(st, {"title": ("zz", None)})


def test_buckets_of_keys_native_int_type(spark):
    """xxhash64 of an int-as-string differs from the bigint the writer
    hashed; point lookups with non-string keys must still hit."""
    want = {
        r["b"]
        for r in spark.createDataFrame([(1,)], "k bigint")
        .select(F.pmod(F.xxhash64("k"), F.lit(8)).alias("b"))
        .collect()
    }
    assert layout.buckets_of_keys(spark, [1], 8) == want
    assert layout.buckets_of_keys(spark, [1], 8, key_type="bigint") == want
    # and through the serving store end to end
    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.registry import Entity, FeatureSpec, FeatureView

    import tempfile

    d = tempfile.mkdtemp()
    src = spark.createDataFrame(
        [Row(user_id=i, ts="2023-06-01 00:00:00", v=float(i)) for i in range(20)]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    srcp = os.path.join(d, "src.parquet")
    src.write.parquet(srcp)
    view = FeatureView(
        name="u", entity=Entity("user_id", "user_id"), source=srcp,
        features=[FeatureSpec("v", "double")], timestamp_field="ts",
    )
    MaterializeJob(
        spark, view, os.path.join(d, "store"), n_buckets=8, bucket_batch=8,
        transform=lambda df: df.select("user_id", "ts", "v"),
    ).run("2023-01-01", "2024-01-01")
    for k in (1, 7, 13):
        got = read_online(
            spark, os.path.join(d, "store"), keys=[k], key_col="user_id"
        ).collect()
        assert len(got) == 1 and got[0]["user_id"] == k


def test_append_rejects_bucket_modulus_change(spark, pages_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nb") / "t")
    layout.write_table(pages_df.limit(50), root, n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        layout.write_table(
            pages_df.limit(10), root, n_buckets=8, mode="append"
        )


def test_materialize_single_entity_list(spark, tmp_path_factory):
    """entity=[Entity(...)] (one-element list) is a legal view shape and
    must materialize, not crash on .join_key."""
    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.registry import Entity, FeatureSpec, FeatureView

    d = tmp_path_factory.mktemp("elist")
    src = spark.createDataFrame(
        [Row(url=f"https://x.example/{i}", warc_ts="2023-06-01 00:00:00",
             n=i) for i in range(10)]
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    p = str(d / "src.parquet")
    src.write.parquet(p)
    view = FeatureView(
        name="l", entity=[Entity("url", "url")], source=p,
        features=[FeatureSpec("n", "bigint")], timestamp_field="warc_ts",
    )
    MaterializeJob(
        spark, view, str(d / "store"), n_buckets=4, bucket_batch=4,
    ).run("2023-01-01", "2024-01-01")
    assert read_online(spark, str(d / "store")).count() == 10


def test_failed_overwrite_keeps_table_readable(spark, pages_df, tmp_path_factory):
    """An overwrite that fails at analysis time (bad frame) must leave
    the previous snapshot intact and readable."""
    root = str(tmp_path_factory.mktemp("ow") / "t")
    layout.write_table(pages_df.limit(80), root, n_buckets=4)
    n = layout.read_table(spark, root).count()
    bad = pages_df.limit(5).drop("warc_ts")  # missing ts_col -> analysis error
    with pytest.raises(Exception):
        layout.write_table(bad, root, n_buckets=4)
    assert layout.current_snapshot(root) is not None
    assert layout.read_table(spark, root).count() == n


def test_odfv_with_foreign_global_not_persisted(spark, tmp_path_factory):
    """A transform referencing a module-level global outside np/pd would
    NameError after a registry round-trip — it must stay in-memory."""
    from feast_spark.registry import _serialize_transform

    def uses_global(pdf):
        return pd.DataFrame({"x": pdf["v"] * _SCALE_CONST})  # noqa: F821

    def clean(pdf):
        return pd.DataFrame({"x": pd.Series(pdf["v"]) * 2})

    assert _serialize_transform(uses_global) is None
    assert _serialize_transform(clean) is not None


def test_salted_group_agg_with_map_column(spark):
    from feast_spark.operators.skew import salted_group_agg

    df = spark.createDataFrame(
        [Row(k="a", v=1.0, m={"h": "x"}), Row(k="a", v=2.0, m={"h": "y"}),
         Row(k="b", v=3.0, m=None)]
    )
    got = salted_group_agg(df, "k", {"s": ("v", "sum")}, salt=4).orderBy("k").collect()
    assert [(r["k"], r["s"]) for r in got] == [("a", 3.0), ("b", 3.0)]


def test_cc_nonconvergence_raises(spark):
    """A chain longer than max_iter rounds must raise, never silently
    split one cluster into several."""
    from feast_spark.operators.dedupe import connected_components

    chain = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(12)]
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=2)
    comp = {r["id"]: r["component"]
            for r in connected_components(chain, max_iter=25).collect()}
    assert set(comp.values()) == {0}


def test_buckets_of_keys_null_keys(spark):
    """All-None key lists must not crash type inference (reachable from
    read_online(keys=[None]) / planner key sampling)."""
    got = layout.buckets_of_keys(spark, [None], 8, key_type="string")
    assert len(got) == 1
    assert layout.buckets_of_keys(spark, [None, None], 8) == got


def test_zorder_many_columns_keeps_high_bits():
    """k=5 zorder columns: uint64 shifts >= 64 silently zero in numpy,
    which would drop the HIGH rank bits. Property: when every column
    carries the SAME permutation, the Morton order must be monotone in
    the value — with dropped high bits it wraps every 2^13 ranks."""
    import numpy as np

    rng = np.random.default_rng(3)
    vals = rng.permutation(2_000)
    tbl = pa.table({f"c{j}": vals for j in range(5)})
    order = layout._zorder_indices(tbl, [f"c{j}" for j in range(5)])
    assert (vals[order] == np.sort(vals)).all()


def test_profile_table_semantics(spark):
    """profile_table: null fractions, orderable min/max, arrays excluded
    from min/max, dotted column names (r02 review)."""
    from feast_spark.operators.text import profile_table

    df = spark.createDataFrame(
        [Row(a=1, b=None, arr=[1, 2]), Row(a=2, b="x", arr=[]),
         Row(a=3, b="y", arr=None), Row(a=4, b=None, arr=[3])]
    ).withColumnRenamed("b", "b.dotted")
    p = profile_table(df).toPandas().set_index("column")
    assert p.loc["a", "null_frac"] == 0.0
    assert p.loc["a", "min"] == "1" and p.loc["a", "max"] == "4"
    assert p.loc["b.dotted", "null_frac"] == 0.5
    assert p.loc["arr", "min"] is None and p.loc["arr", "max"] is None
    assert (p["n_rows"] == 4).all()


def test_overwrite_survives_execution_failure(spark, pages_df, tmp_path_factory):
    """An overwrite whose Spark JOB fails mid-execution (not just
    analysis) must leave the previous table fully readable — the staged
    swap only happens after the write succeeds."""
    root = str(tmp_path_factory.mktemp("owx") / "t")
    layout.write_table(pages_df.limit(80), root, n_buckets=4)
    n = layout.read_table(spark, root).count()

    def boom(it):
        raise RuntimeError("injected executor failure")
        yield  # pragma: no cover

    bad = pages_df.limit(20).select("url", "warc_ts").mapInPandas(
        boom, "url string, warc_ts timestamp"
    )
    with pytest.raises(Exception):
        layout.write_table(bad, root, n_buckets=4)
    assert layout.current_snapshot(root) is not None
    assert layout.read_table(spark, root).count() == n
