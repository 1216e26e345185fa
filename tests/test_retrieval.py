"""Retrieval planner over layout-backed views: manifest pruning by probe
bounds + TTL, multi-view chaining, full feature names (SURVEY.md §3.1,
§4.2.3)."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView
from feast_spark.sources import pages as layout


@pytest.fixture(scope="module")
def lstore(spark, pages_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ret") / "table")
    enriched = pages_df.withColumn("n_chars", F.length("text").cast("long"))
    layout.write_table(enriched, root, n_buckets=4)
    s = FeatureStore(spark)
    s.apply(
        FeatureView(
            name="pg",
            entity=Entity("url", "url"),
            source=root,
            features=[FeatureSpec("n_chars", "bigint"), FeatureSpec("lang", "string")],
            ttl=timedelta(days=90),
            timestamp_field="warc_ts",
        )
    )
    return s, root


@pytest.mark.parametrize("strategy", ["union", "broadcast", "cogroup"])
def test_layout_retrieval_all_strategies(spark, lstore, probes_df, strategy):
    store, _root = lstore
    out = store.get_historical_features(
        probes_df, ["pg:n_chars", "pg:lang"], strategy=strategy
    )
    assert out.count() == probes_df.count()
    assert out.filter(F.col("n_chars").isNotNull()).count() > 0


def test_probe_bounds_prune_the_scan(spark, lstore, probes_df):
    """Narrow probe window ⇒ the manifest prunes most files: results
    must still match the unpruned plan for those probes."""
    store, root = lstore
    narrow = probes_df.filter(
        (F.col("ts") >= "2023-12-01") & (F.col("ts") < "2023-12-08")
    )
    n = narrow.count()
    if n == 0:
        pytest.skip("no probes in window")
    got = store.get_historical_features(narrow, ["pg:n_chars"], strategy="union")
    # equivalent unpruned computation
    full = store.get_historical_features(
        probes_df, ["pg:n_chars"], strategy="union"
    ).join(narrow.select("url", "ts"), ["url", "ts"], "left_semi")
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    # and the manifest really prunes: files overlapping the padded range
    # are a strict subset of all files
    snap, pruned = layout.plan_files(
        root, start="2023-09-02", end="2023-12-08"
    )
    assert len(pruned) < len(snap["files"])


def test_small_probe_set_prunes_buckets(spark, lstore, pages_df):
    """Point-lookup-shaped retrieval: few probes ⇒ only their buckets'
    files scanned; results identical to the full-probe plan."""
    from pyspark.sql import Row

    store, root = lstore
    urls = [r["url"] for r in pages_df.select("url").distinct().limit(3).collect()]
    probes = spark.createDataFrame(
        [Row(url=u, ts="2024-02-01 00:00:00") for u in urls]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = store.get_historical_features(probes, ["pg:n_chars"], strategy="broadcast")
    assert out.count() == 3
    assert out.filter(F.col("n_chars").isNotNull()).count() >= 1
    # the bucket set of 3 urls is a strict subset of all buckets (B=4 →
    # almost surely < 4, but at minimum the scan planned fewer files
    # than the table holds when buckets < 4)
    wanted = layout.buckets_of_keys(spark, urls, 4)
    _, files = layout.plan_files(root, buckets=wanted)
    _, all_files = layout.plan_files(root)
    if len(wanted) < 4:
        assert len(files) < len(all_files)


def test_materialize_incremental_api(spark, lstore, tmp_path_factory):
    from feast_spark.materialize import (
        last_materialized_end,
        materialize_incremental,
        read_online,
    )

    store, _root = lstore
    view = store.get_view("pg")
    dest = str(tmp_path_factory.mktemp("incr") / "store")

    def transform(df):
        return df.select("url", "warc_ts", "n_chars")

    s1 = materialize_incremental(
        spark, view, dest, "2023-12-15",
        start_default="2023-11-01", bucket_batch=4, transform=transform,
    )
    assert s1["rows"] > 0
    assert last_materialized_end(dest) == "2023-12-15"
    s2 = materialize_incremental(
        spark, view, dest, "2024-03-01", bucket_batch=4, transform=transform,
    )
    assert s2["rows"] > 0
    # caught up → no-op
    s3 = materialize_incremental(
        spark, view, dest, "2024-03-01", bucket_batch=4, transform=transform,
    )
    assert s3.get("caught_up") is True and s3["rows"] == 0
    # equals a single full run
    from feast_spark.materialize import MaterializeJob

    d_full = str(tmp_path_factory.mktemp("incr") / "full")
    MaterializeJob(
        spark, view, d_full, bucket_batch=4, transform=transform
    ).run("2023-11-01", "2024-03-01")
    a = read_online(spark, dest).select("url", "warc_ts")
    b = read_online(spark, d_full).select("url", "warc_ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_multi_view_full_feature_names(spark, lstore, probes_df, data_dir):
    import os

    store, _root = lstore
    store.apply(
        FeatureView(
            name="pg2",
            entity=Entity("url", "url"),
            source=lambda sp: sp.read.parquet(
                os.path.join(data_dir, "pages.parquet")
            ).withColumn("n_tokens", F.size(F.split("text", r"\s+")).cast("long")),
            features=[FeatureSpec("n_tokens", "bigint")],
            ttl=timedelta(days=90),
            timestamp_field="warc_ts",
        )
    )
    out = store.get_historical_features(
        probes_df,
        ["pg:n_chars", "pg2:n_tokens"],
        full_feature_names=True,
    )
    assert "pg__n_chars" in out.columns
    assert "pg2__n_tokens" in out.columns
    assert out.count() == probes_df.count()
    # rows that hit in one view hit in the other (same source data)
    mism = out.filter(
        F.col("pg__n_chars").isNotNull() != F.col("pg2__n_tokens").isNotNull()
    ).count()
    assert mism == 0


def test_no_ttl_retrieval_sees_stale_features(spark, tmp_path_factory):
    """ADVICE r01 (high): with ttl=None the as-of lookback is unbounded, so
    manifest pruning must NOT apply a lower time bound — a key whose latest
    feature row predates the earliest probe ts still matches."""
    from pyspark.sql import Row

    root = str(tmp_path_factory.mktemp("nottl") / "table")
    old = spark.createDataFrame(
        [
            Row(url=f"https://a.example/{i}", warc_ts=f"2023-01-0{1 + i % 9} 00:00:00",
                n_chars=100 + i)
            for i in range(40)
        ]
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    layout.write_table(old, root, n_buckets=4)
    store = FeatureStore(spark)
    store.apply(
        FeatureView(
            name="stale",
            entity=Entity("url", "url"),
            source=root,
            features=[FeatureSpec("n_chars", "bigint")],
            ttl=None,
            timestamp_field="warc_ts",
        )
    )
    # probes a year after every feature row: old files must NOT be pruned
    probes = spark.createDataFrame(
        [Row(url=f"https://a.example/{i}", ts="2024-06-01 00:00:00") for i in range(40)]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = store.get_historical_features(probes, ["stale:n_chars"])
    assert out.filter(F.col("n_chars").isNotNull()).count() == 40


def test_composite_entity_view_retrieval(spark, tmp_path_factory):
    """A view referencing two entities joins on BOTH keys (upstream
    multi-entity views); materialization of composite views is refused
    with a clear error."""
    from pyspark.sql import Row

    src = spark.createDataFrame(
        [
            Row(u="a", t="x", warc_ts="2023-01-01 00:00:00", v=1.0),
            Row(u="a", t="y", warc_ts="2023-01-02 00:00:00", v=2.0),
            Row(u="b", t="x", warc_ts="2023-01-03 00:00:00", v=3.0),
        ]
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    d = tmp_path_factory.mktemp("comp")
    p = str(d / "src.parquet")
    src.write.parquet(p)
    store = FeatureStore(spark)
    view = FeatureView(
        name="cv",
        entity=[Entity("user", "u"), Entity("etype", "t")],
        source=p,
        features=[FeatureSpec("v", "double")],
        ttl=None,
        timestamp_field="warc_ts",
    )
    store.apply(view)
    probes = spark.createDataFrame(
        [Row(u="a", t="x", ts="2023-02-01 00:00:00"),
         Row(u="a", t="y", ts="2023-02-01 00:00:00"),
         Row(u="b", t="y", ts="2023-02-01 00:00:00")]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["u"], r["t"]): r["v"]
        for r in store.get_historical_features(probes, ["cv:v"]).collect()
    }
    assert out[("a", "x")] == 1.0 and out[("a", "y")] == 2.0
    assert out[("b", "y")] is None

    # composite views also MATERIALIZE since r03 (VERDICT r02 next #1):
    # one serving row per (u, t) tuple — details in test_materialize.py
    from feast_spark.materialize import MaterializeJob, read_online

    dest = str(d / "store")
    MaterializeJob(spark, view, dest, n_buckets=4, bucket_batch=4).run(
        "2023-01-01", "2024-01-01"
    )
    served = {
        (r["u"], r["t"]): r["v"] for r in read_online(spark, dest).collect()
    }
    assert served[("a", "x")] == 1.0 and served[("a", "y")] == 2.0


def test_entityless_global_view(spark, tmp_path_factory):
    """Entity-less (global) feature view — upstream DUMMY_ENTITY: every
    probe as-of matches the single global timeline; works through
    retrieval (all strategies) AND materialization (single serving row)."""
    from pyspark.sql import Row

    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.operators.asof import asof_join
    from feast_spark.registry import FeatureSpec, FeatureStore, FeatureView

    glob = spark.createDataFrame(
        [Row(gts=f"2023-06-{d:02d} 00:00:00", level=float(d)) for d in (1, 10, 20)]
    ).withColumn("gts", F.col("gts").cast("timestamp"))
    probes = spark.createDataFrame(
        [Row(who="a", ts="2023-06-05 00:00:00"),
         Row(who="b", ts="2023-06-15 00:00:00"),
         Row(who="c", ts="2023-05-01 00:00:00")]  # before any feature
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    for strat in ("union", "broadcast"):
        out = {
            r["who"]: r["level"]
            for r in asof_join(
                probes, glob, by=[], left_on="ts", right_on="gts",
                ttl=None, strategy=strat,
            ).collect()
        }
        assert out == {"a": 1.0, "b": 10.0, "c": None}, (strat, out)

    # registry path
    src_path = str(tmp_path_factory.mktemp("glob") / "g.parquet")
    glob.write.parquet(src_path)
    store = FeatureStore(spark)
    view = FeatureView(
        name="glob",
        entity=[],
        source=src_path,
        features=[FeatureSpec("level", "double")],
        ttl=None,
        timestamp_field="gts",
    )
    store.apply(view)
    out = {
        r["who"]: r["level"]
        for r in store.get_historical_features(probes, ["glob:level"]).collect()
    }
    assert out == {"a": 1.0, "b": 10.0, "c": None}

    # materialization: one serving row (the global latest)
    dest = str(tmp_path_factory.mktemp("glob") / "store")
    MaterializeJob(spark, view, dest, n_buckets=4, bucket_batch=4).run(
        "2023-01-01", "2024-01-01"
    )
    rows = read_online(spark, dest).collect()
    assert len(rows) == 1 and rows[0]["level"] == 20.0


def test_store_materialize_incremental_method(spark, lstore, tmp_path_factory):
    """FeatureStore.materialize_incremental (upstream API parity) is the
    lineage-resuming twin of the module function."""
    store, _root = lstore
    dest = str(tmp_path_factory.mktemp("incrm") / "store")

    def transform(df):
        return df.select("url", "warc_ts", "n_chars")

    s1 = store.materialize_incremental(
        "pg", "2023-12-15", dest,
        start_default="2023-11-01", bucket_batch=4, transform=transform,
    )
    assert s1["rows"] > 0
    s2 = store.materialize_incremental(
        "pg", "2023-12-15", dest, bucket_batch=4, transform=transform,
    )
    assert s2.get("caught_up") is True and s2["rows"] == 0
