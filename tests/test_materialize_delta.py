"""Snapshot-delta materialization: merge only the appended files'
latest rows; result identical to a one-shot full materialization."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feast_spark.materialize import (
    MaterializeJob,
    materialize_delta,
    read_online,
)
from feast_spark.registry import Entity, FeatureSpec, FeatureView
from feast_spark.sources import pages as layout

START, END = datetime(2023, 12, 1), datetime(2024, 6, 1)


def mk(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts string, v double"
    ).select("url", F.col("ts").cast("timestamp").alias("ts"), "v")


def view(root):
    return FeatureView(
        name="pv", entity=Entity("u", "url"), source=root,
        features=[FeatureSpec("v", "double")], timestamp_field="ts",
    )


def served(spark, dest):
    return {
        r["url"]: (r["ts"].isoformat(), r["v"])
        for r in read_online(spark, dest).collect()
    }


def test_delta_equals_full_recompute(spark, tmp_path):
    root, dest, dest_full = (
        str(tmp_path / "t"), str(tmp_path / "o"), str(tmp_path / "of")
    )
    day1 = [("a", "2024-01-01 00:00:00", 1.0), ("b", "2024-01-01 00:00:00", 2.0)]
    # day2: new key c, and a NEWER row for a (must overwrite the served a)
    day2 = [("c", "2024-01-02 00:00:00", 3.0), ("a", "2024-01-02 12:00:00", 9.0)]
    # day3: an OLDER row for b arrives late (must NOT overwrite served b)
    day3 = [("b", "2023-12-25 00:00:00", -1.0)]
    layout.write_table(mk(spark, day1), root, key_col="url", ts_col="ts", n_buckets=2)
    MaterializeJob(spark, view(root), dest, n_buckets=2).run(START, END)

    layout.write_table(mk(spark, day2), root, key_col="url", ts_col="ts",
                       n_buckets=2, mode="append")
    r1 = materialize_delta(spark, view(root), dest)
    assert r1["caught_up"] is False and r1["rows_pushed"] == 2

    layout.write_table(mk(spark, day3), root, key_col="url", ts_col="ts",
                       n_buckets=2, mode="append")
    r2 = materialize_delta(spark, view(root), dest)
    assert r2["from_snapshot"] == r1["to_snapshot"]  # runs chain

    # one-shot full materialization over the final table == delta chain
    MaterializeJob(spark, view(root), dest_full, n_buckets=2).run(START, END)
    assert served(spark, dest) == served(spark, dest_full)
    assert served(spark, dest)["a"][1] == 9.0  # newer delta row won
    assert served(spark, dest)["b"][1] == 2.0  # older late row lost


def test_caught_up_noop(spark, tmp_path):
    root, dest = str(tmp_path / "t"), str(tmp_path / "o")
    layout.write_table(
        mk(spark, [("a", "2024-01-01 00:00:00", 1.0)]), root,
        key_col="url", ts_col="ts", n_buckets=2,
    )
    MaterializeJob(spark, view(root), dest, n_buckets=2).run(START, END)
    out = materialize_delta(spark, view(root), dest)
    assert out["caught_up"] is True and out["rows_pushed"] == 0


def test_refusals(spark, tmp_path):
    root, dest = str(tmp_path / "t"), str(tmp_path / "o")
    layout.write_table(
        mk(spark, [("a", "2024-01-01 00:00:00", 1.0)]), root,
        key_col="url", ts_col="ts", n_buckets=2,
    )
    # no prior full materialization
    with pytest.raises(ValueError, match="full MaterializeJob"):
        materialize_delta(spark, view(root), dest)
    # non-layout view
    v = view(root)
    v2 = FeatureView(
        name="pv", entity=Entity("u", "url"), source=lambda s: None,
        features=v.features, timestamp_field="ts",
    )
    with pytest.raises(ValueError, match="layout-backed"):
        materialize_delta(spark, v2, dest)


def test_delta_refuses_time_bounded_baseline(spark, tmp_path):
    """r04 review: a time-bounded run records input_snapshot=HEAD while
    leaving out-of-range rows unmaterialized; trusting it as a delta
    baseline made those rows silently unservable forever. The baseline
    must carry a complete=True lineage record."""
    root, dest = str(tmp_path / "t"), str(tmp_path / "o")
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("m", "2024-03-15 00:00:00", 7.0),  # outside the bounded range
    ]
    layout.write_table(mk(spark, rows), root, key_col="url", ts_col="ts",
                       n_buckets=2)
    MaterializeJob(spark, view(root), dest, n_buckets=2).run(
        datetime(2024, 1, 1), datetime(2024, 2, 1)
    )
    assert "m" not in served(spark, dest)
    with pytest.raises(ValueError, match="not verifiably complete"):
        materialize_delta(spark, view(root), dest)
    # widening the range to cover the span heals the baseline
    MaterializeJob(spark, view(root), dest, n_buckets=2).run(START, END)
    layout.write_table(
        mk(spark, [("z", "2024-04-01 00:00:00", 2.0)]), root,
        key_col="url", ts_col="ts", n_buckets=2, mode="append",
    )
    out = materialize_delta(spark, view(root), dest)
    assert out["rows_pushed"] == 1
    assert served(spark, dest)["m"][1] == 7.0


def test_incremental_chain_keeps_completeness(spark, tmp_path):
    """The incremental induction: a bounded resume that covers every
    file APPENDED since a complete baseline is itself complete — so the
    natural daily pipeline (full once, then materialize_incremental,
    then snapshot-delta) keeps working."""
    from feast_spark.materialize import materialize_incremental

    root, dest = str(tmp_path / "t"), str(tmp_path / "o")
    layout.write_table(
        mk(spark, [("a", "2024-01-01 00:00:00", 1.0)]), root,
        key_col="url", ts_col="ts", n_buckets=2,
    )
    MaterializeJob(spark, view(root), dest, n_buckets=2).run(
        START, datetime(2024, 1, 2)
    )
    # append strictly-newer rows; resume covers exactly their span
    layout.write_table(
        mk(spark, [("b", "2024-01-03 00:00:00", 2.0)]), root,
        key_col="url", ts_col="ts", n_buckets=2, mode="append",
    )
    materialize_incremental(spark, view(root), dest, datetime(2024, 1, 4))
    recs = layout.list_lineage(dest)
    assert any(r.get("complete") for r in recs
               if r["input_snapshot"] == max(x["input_snapshot"] for x in recs))
    # delta now accepts the incremental run as its baseline
    layout.write_table(
        mk(spark, [("c", "2024-01-05 00:00:00", 3.0)]), root,
        key_col="url", ts_col="ts", n_buckets=2, mode="append",
    )
    out = materialize_delta(spark, view(root), dest)
    assert out["rows_pushed"] == 1
    assert set(served(spark, dest)) == {"a", "b", "c"}


def test_crashed_multibatch_run_is_not_a_delta_baseline(spark, tmp_path):
    """r04 review batch 3: the completeness marker must land only after
    EVERY bucket batch commits — a per-batch flag let a crashed run pass
    the baseline check with half its buckets unmaterialized."""
    root, dest = str(tmp_path / "t"), str(tmp_path / "o")
    rows = [(f"u{i}", "2024-01-01 00:00:00", float(i)) for i in range(8)]
    layout.write_table(mk(spark, rows), root, key_col="url", ts_col="ts",
                       n_buckets=4)
    job = lambda: MaterializeJob(  # noqa: E731
        spark, view(root), dest, n_buckets=4, bucket_batch=2,
        fail_after_batches=1,
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        job().run(START, END)
    with pytest.raises(ValueError, match="not verifiably complete"):
        materialize_delta(spark, view(root), dest)
    # resume to completion: the marker lands, delta accepts the baseline
    MaterializeJob(spark, view(root), dest, n_buckets=4, bucket_batch=2).run(
        START, END
    )
    layout.write_table(
        mk(spark, [("z", "2024-02-01 00:00:00", 9.0)]), root,
        key_col="url", ts_col="ts", n_buckets=4, mode="append",
    )
    out = materialize_delta(spark, view(root), dest)
    assert out["rows_pushed"] == 1 and len(served(spark, dest)) == 9


def test_legacy_per_batch_complete_records_are_not_a_baseline(
    spark, tmp_path
):
    """r04 review batch 4: stores written by the pre-marker code carry
    complete=True on PER-BATCH records (identifiable by their 'buckets'
    key); a crashed multi-batch run left them behind, so they must not
    satisfy the delta baseline check."""
    root, dest = str(tmp_path / "t"), str(tmp_path / "o")
    rows = [(f"u{i}", "2024-01-01 00:00:00", float(i)) for i in range(8)]
    layout.write_table(mk(spark, rows), root, key_col="url", ts_col="ts",
                       n_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        MaterializeJob(
            spark, view(root), dest, n_buckets=4, bucket_batch=2,
            fail_after_batches=1,
        ).run(START, END)
    # simulate the old code's on-disk state: per-batch record with the flag
    recs = layout.list_lineage(dest)
    assert len(recs) == 1 and "buckets" in recs[0]
    recs[0]["complete"] = True
    layout.write_lineage(dest, recs[0]["partition_id"], recs[0])
    with pytest.raises(ValueError, match="not verifiably complete"):
        materialize_delta(spark, view(root), dest)
