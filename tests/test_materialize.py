"""Materialization runner tests (SURVEY.md §3.2, §5.2.5): latest-per-key
correctness, resume-after-failure identity, incremental upsert, lineage
manifests."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from feast_spark.materialize import MaterializeJob, read_online
from feast_spark.registry import Entity, FeatureSpec, FeatureView
from feast_spark.sources import pages as layout

B = 4
START, END = "2023-11-01", "2024-03-01"


@pytest.fixture(scope="module")
def table_root(spark, pages_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mat") / "pages_table")
    layout.write_table(pages_df, root, n_buckets=B)
    return root


def _view(root) -> FeatureView:
    return FeatureView(
        name="pages",
        entity=Entity("url", "url"),
        source=root,
        features=[FeatureSpec("n_chars", "bigint")],
        ttl=timedelta(days=90),
        timestamp_field="warc_ts",
    )


def _transform(df):
    return df.select(
        "url", "warc_ts", F.length("text").cast("long").alias("n_chars")
    )


def _expected_latest(pages_df):
    """Oracle: pandas latest-per-url over the raw pages."""
    pdf = (
        pages_df.select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"), "text")
        .toPandas()
    )
    pdf["n_chars"] = pdf["text"].str.len()
    idx = pdf.groupby("url")["warc_ts"].idxmax()
    return (
        pdf.loc[idx, ["url", "warc_ts", "n_chars"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_materialize_latest_per_key(spark, pages_df, table_root, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("mat_out") / "store")
    job = MaterializeJob(
        spark, _view(table_root), dest, bucket_batch=2, transform=_transform
    )
    summary = job.run(START, END)
    assert summary["batches_run"] == B // 2
    out = read_online(spark, dest).select("url", "warc_ts", "n_chars")

    got = out.orderBy("url").toPandas()
    want = _expected_latest(pages_df)
    assert len(got) == len(want)
    assert (got["url"].values == want["url"].values).all()
    # event_ts matches; n_chars may differ only on exact-duplicate
    # (url, warc_ts) rows where the hash tiebreak picks a revision — the
    # timestamps must still agree
    assert (got["warc_ts"].values == want["warc_ts"].values).all()

    # lineage manifests exist, carry metrics; a finished run adds ONE
    # completeness marker on top of the per-batch records
    lineage = layout.list_lineage(dest)
    marks = [l for l in lineage if l.get("complete")]
    batches = [l for l in lineage if not l.get("complete")]
    assert len(batches) == B // 2 and len(marks) == 1
    assert all(l["rows_out"] > 0 and l["max_event_ts"] for l in batches)
    assert sum(l["rows_out"] for l in batches) == len(got)


def test_resume_after_failure_identical(spark, table_root, tmp_path_factory):
    base = tmp_path_factory.mktemp("mat_resume")
    d_full = str(base / "full")
    d_part = str(base / "partial")

    MaterializeJob(
        spark, _view(table_root), d_full, bucket_batch=1, transform=_transform
    ).run(START, END)

    # fail after 2 of 4 bucket batches
    with pytest.raises(RuntimeError, match="injected failure"):
        MaterializeJob(
            spark, _view(table_root), d_part, bucket_batch=1,
            transform=_transform, fail_after_batches=2,
        ).run(START, END)
    assert len(layout.list_lineage(d_part)) == 2

    # resume: only the remaining batches run; output identical to the
    # uninterrupted store
    summary = MaterializeJob(
        spark, _view(table_root), d_part, bucket_batch=1, transform=_transform
    ).run(START, END)
    assert summary["batches_skipped"] == 2
    assert summary["batches_run"] == 2

    a = read_online(spark, d_full).select("url", "warc_ts", "n_chars")
    b = read_online(spark, d_part).select("url", "warc_ts", "n_chars")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_incremental_upsert(spark, pages_df, tmp_path_factory):
    """Materializing [t0,t1) then [t1,t2) must equal one [t0,t2) run —
    the per-bucket upsert keeps the latest row across increments."""
    base = tmp_path_factory.mktemp("mat_incr")
    root = str(base / "table")
    layout.write_table(pages_df, root, n_buckets=B)
    mid = "2023-12-20"

    d_two = str(base / "two_step")
    MaterializeJob(
        spark, _view(root), d_two, bucket_batch=2, transform=_transform
    ).run(START, mid)
    MaterializeJob(
        spark, _view(root), d_two, bucket_batch=2, transform=_transform
    ).run(mid, END)

    d_one = str(base / "one_step")
    MaterializeJob(
        spark, _view(root), d_one, bucket_batch=2, transform=_transform
    ).run(START, END)

    a = read_online(spark, d_two).select("url", "warc_ts")
    b = read_online(spark, d_one).select("url", "warc_ts")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_point_lookup_bucket_pruning(spark, pages_df, table_root, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("mat_kv") / "store")
    MaterializeJob(
        spark, _view(table_root), dest, bucket_batch=B, transform=_transform
    ).run(START, END)
    urls = [r["url"] for r in pages_df.select("url").distinct().limit(3).collect()]
    got = read_online(spark, dest, keys=urls).select("url").distinct().count()
    assert got == len(urls)


def test_plain_parquet_source(spark, pages_df, data_dir, tmp_path_factory):
    """Non-layout (plain parquet path) sources materialize too — bucket
    filtering happens on the fly instead of via the manifest."""
    import os

    dest = str(tmp_path_factory.mktemp("mat_plain") / "store")
    view = FeatureView(
        name="pages_plain",
        entity=Entity("url", "url"),
        source=os.path.join(data_dir, "pages.parquet"),
        features=[FeatureSpec("n_chars", "bigint")],
        timestamp_field="warc_ts",
    )
    summary = MaterializeJob(
        spark, view, dest, n_buckets=B, bucket_batch=2, transform=_transform
    ).run(START, END)
    assert summary["rows"] == pages_df.select("url").distinct().count()


def test_point_lookup_with_unwritten_top_bucket(spark, tmp_path_factory):
    """ADVICE r01 (medium): the store's bucket modulus must come from
    persisted metadata, not 1+max(existing bucket dirs) — when no key
    hashes to the highest bucket, the inferred modulus is wrong and point
    lookups silently miss keys that exist."""
    from pyspark.sql import Row

    # find urls that all hash AWAY from the top bucket for n_buckets=8
    n_b = 8
    urls = [f"https://m.example/{i}" for i in range(200)]
    bdf = spark.createDataFrame([Row(url=u) for u in urls]).withColumn(
        "b", layout.bucket_expr("url", n_b)
    )
    rows = {r["url"]: r["b"] for r in bdf.collect()}
    top = max(rows.values())
    keep = [u for u, b in rows.items() if b != top][:50]
    assert keep, "need urls avoiding the top bucket"

    src = spark.createDataFrame(
        [Row(url=u, warc_ts="2023-12-01 00:00:00", text="x" * 10) for u in keep]
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    import os

    d = tmp_path_factory.mktemp("meta_store")
    src_path = str(d / "src.parquet")
    src.write.parquet(src_path)
    dest = str(d / "store")
    view = FeatureView(
        name="m",
        entity=Entity("url", "url"),
        source=src_path,
        features=[FeatureSpec("n_chars", "bigint")],
        timestamp_field="warc_ts",
    )
    MaterializeJob(
        spark, view, dest, n_buckets=n_b, bucket_batch=4, transform=_transform
    ).run(START, END)
    # top bucket dir must be absent for the test to bite
    dirs = os.listdir(os.path.join(dest, layout.DATA_DIR))
    assert f"bucket={top}" not in dirs
    got = read_online(spark, dest, keys=keep).select("url").distinct().count()
    assert got == len(keep)

    # re-materializing with a different modulus is refused
    with pytest.raises(ValueError, match="n_buckets"):
        MaterializeJob(
            spark, view, dest, n_buckets=4, bucket_batch=4, transform=_transform
        ).run(START, END)


# ----------------------------------------------------- composite keys ------


@pytest.fixture(scope="module")
def composite_src(spark, tmp_path_factory):
    """(user, device) composite-key feature rows with several revisions."""
    from pyspark.sql import Row

    rows = []
    for u in range(40):
        for dev in ("ios", "android", "web"):
            for rev in range(3):
                rows.append(
                    Row(
                        user=f"u{u}",
                        device=dev,
                        ts=f"2023-12-{10 + rev:02d} 00:00:00",
                        score=float(u * 10 + rev),
                    )
                )
    path = str(tmp_path_factory.mktemp("comp") / "src.parquet")
    spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(path)
    return path


def _composite_view(path) -> FeatureView:
    return FeatureView(
        name="comp",
        entity=[Entity("user", "user"), Entity("device", "device")],
        source=path,
        features=[FeatureSpec("score", "double")],
        timestamp_field="ts",
    )


def test_materialize_composite_latest(spark, composite_src, tmp_path_factory):
    """VERDICT r02 next #1: multi-entity views materialize — one serving
    row per (user, device) TUPLE, the latest revision of each."""
    dest = str(tmp_path_factory.mktemp("comp_out") / "store")
    MaterializeJob(
        spark, _composite_view(composite_src), dest, n_buckets=4, bucket_batch=2
    ).run(START, END)
    got = read_online(spark, dest).toPandas()
    assert len(got) == 40 * 3  # one row per tuple, not per user
    assert (got["score"] % 10 == 2).all()  # rev 2 = latest everywhere
    # store meta records the composite key + dtypes
    from feast_spark.materialize import read_store_meta

    meta = read_store_meta(dest)
    assert meta["key_cols"] == ["user", "device"]
    assert meta["key_types"] == ["string", "string"]


def test_materialize_composite_resume(spark, composite_src, tmp_path_factory):
    """Kill after 1 of 2 bucket batches; the resumed run skips the done
    batch and the store equals an uninterrupted one."""
    base = tmp_path_factory.mktemp("comp_resume")
    d_full, d_part = str(base / "full"), str(base / "part")
    view = _composite_view(composite_src)
    MaterializeJob(spark, view, d_full, n_buckets=4, bucket_batch=2).run(START, END)
    with pytest.raises(RuntimeError, match="injected failure"):
        MaterializeJob(
            spark, view, d_part, n_buckets=4, bucket_batch=2,
            fail_after_batches=1,
        ).run(START, END)
    summary = MaterializeJob(
        spark, view, d_part, n_buckets=4, bucket_batch=2
    ).run(START, END)
    assert summary["batches_skipped"] == 1
    a = read_online(spark, d_full)
    b = read_online(spark, d_part)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_composite_point_lookup(spark, composite_src, tmp_path_factory):
    """Tuple-key point lookup: bucket pruning via xxhash64(k1,k2) plus a
    broadcast semi-join residual — returns exactly the probed tuples."""
    dest = str(tmp_path_factory.mktemp("comp_pl") / "store")
    MaterializeJob(
        spark, _composite_view(composite_src), dest, n_buckets=8, bucket_batch=8
    ).run(START, END)
    probes = [("u1", "ios"), ("u2", "web"), ("u1", "web"), ("u99", "ios")]
    got = read_online(
        spark, dest, keys=probes, key_cols=["user", "device"]
    ).toPandas()
    assert sorted(zip(got["user"], got["device"])) == sorted(probes[:3])
    # and through the FeatureStore facade
    from feast_spark.registry import FeatureStore

    fs = FeatureStore(spark)
    got2 = fs.get_online_features(
        dest, [("u3", "android")], key_cols=["user", "device"]
    ).toPandas()
    assert len(got2) == 1 and got2["score"][0] == 32.0


def test_read_online_ttl_expiry(spark, tmp_path_factory):
    """Read-side TTL eviction (upstream online stores expire rows older
    than the view ttl): rows whose event time predates now - ttl are
    never served; `now` is explicit so lookups are reproducible."""
    from datetime import datetime, timedelta

    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.registry import Entity, FeatureSpec, FeatureView

    fresh = datetime(2024, 1, 10)
    stale = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(stale, "old", 1.0), (fresh, "new", 2.0)],
        "warc_ts timestamp, url string, value double",
    )
    view = FeatureView(
        name="tt", entity=Entity("url", "url"),
        source=lambda s, d=df: d,
        features=[FeatureSpec("value", "double")],
        timestamp_field="warc_ts",
    )
    dest = str(tmp_path_factory.mktemp("ttl") / "store")
    MaterializeJob(spark, view, dest, n_buckets=2).run(
        datetime(2023, 12, 1), datetime(2024, 2, 1)
    )
    now = datetime(2024, 1, 12)
    all_rows = {r["url"] for r in read_online(spark, dest).collect()}
    assert all_rows == {"old", "new"}
    live = {
        r["url"]
        for r in read_online(
            spark, dest, ttl=timedelta(days=7), now=now
        ).collect()
    }
    assert live == {"new"}
    # keyed lookups expire identically
    live_keyed = {
        r["url"]
        for r in read_online(
            spark, dest, ["old", "new"], ttl=timedelta(days=7), now=now
        ).collect()
    }
    assert live_keyed == {"new"}
    import pytest as _pt

    with _pt.raises(ValueError, match="now"):
        read_online(spark, dest, ttl=timedelta(days=7))


def test_get_online_features_logging_and_sql_entity_df(
    spark, tmp_path_factory
):
    """Feature logging (served rows + log_ts appended to a parquet log)
    and the SQL-string entity_df form of get_historical_features."""
    from datetime import datetime

    from feast_spark.materialize import MaterializeJob
    from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView

    df = spark.createDataFrame(
        [(datetime(2024, 1, 5), "a", 1.0), (datetime(2024, 1, 6), "b", 2.0)],
        "warc_ts timestamp, url string, value double",
    )
    view = FeatureView(
        name="lg", entity=Entity("url", "url"),
        source=lambda s, d=df: d,
        features=[FeatureSpec("value", "double")],
        timestamp_field="warc_ts",
    )
    base = tmp_path_factory.mktemp("log")
    dest = str(base / "store")
    MaterializeJob(spark, view, dest, n_buckets=2).run(
        datetime(2024, 1, 1), datetime(2024, 2, 1)
    )
    store = FeatureStore(spark)
    store.apply(view)
    log = str(base / "servelog")
    served = store.get_online_features(
        dest, ["a"], now=datetime(2024, 1, 7), log_to=log
    )
    assert served.count() == 1
    logged = spark.read.parquet(log).collect()
    assert len(logged) == 1 and logged[0]["url"] == "a"
    assert str(logged[0]["log_ts"]) == "2024-01-07 00:00:00"

    # SQL-string entity_df goes through spark.sql
    df.createOrReplaceTempView("probe_src")
    out = store.get_historical_features(
        "SELECT url, warc_ts AS ts FROM probe_src",
        ["lg:value"], strategy="union",
    )
    assert out.count() == 2
    assert {r["value"] for r in out.collect()} == {1.0, 2.0}


def test_read_online_ttl_on_legacy_store_infers_ts_col(
    spark, tmp_path_factory
):
    """r04 review: stores materialized before ts_col landed in
    store.json made TTL reads assume warc_ts — an UNRESOLVED_COLUMN
    failure on stores keyed on any other event-time field. The reader
    must resolve the column from the store's own schema instead."""
    import json
    import os
    from datetime import datetime, timedelta

    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.registry import Entity, FeatureSpec, FeatureView

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), "old", 1.0), (datetime(2024, 1, 10), "new", 2.0)],
        "event_ts timestamp, url string, value double",
    )
    view = FeatureView(
        name="legacy", entity=Entity("url", "url"),
        source=lambda s, d=df: d,
        features=[FeatureSpec("value", "double")],
        timestamp_field="event_ts",
    )
    dest = str(tmp_path_factory.mktemp("ttl_legacy") / "store")
    MaterializeJob(spark, view, dest, n_buckets=2).run(
        datetime(2023, 12, 1), datetime(2024, 2, 1)
    )
    # simulate a pre-r04 store: strip ts_col from the persisted meta
    meta_path = os.path.join(dest, "metadata", "store.json")
    meta = json.load(open(meta_path))
    del meta["ts_col"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    got = {
        r["url"]
        for r in read_online(
            spark, dest, ttl=timedelta(days=7), now=datetime(2024, 1, 12)
        ).collect()
    }
    assert got == {"new"}
