"""Streaming operators (SURVEY.md §2.10) — replayed-file-stream results
must equal their batch twins (§5.2.7)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.windows import session_stats
from feast_spark.streaming import pipeline as sp


@pytest.fixture(scope="module")
def stream_dir(spark, pages_df, tmp_path_factory):
    """Pages replayed as a 4-file stream (text/lang only; html dropped to
    keep the fixture light)."""
    d = str(tmp_path_factory.mktemp("stream") / "pages")
    (
        pages_df.select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"),
                        F.lit(None).cast("binary").alias("html"), "text", "lang")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def test_session_window_equals_batch(spark, stream_dir, pages_df):
    """T3 streaming session_window == W6 batch sessionization."""
    stream = sp.stream_pages(spark, stream_dir)
    sess = sp.session_windows(stream, key="url", gap="30 minutes")
    q = sp.run_to_memory(sess, "t3_sessions")
    got = (
        spark.table("t3_sessions")
        .select("url", "sess_start", "sess_end", "n_events")
    )

    want = session_stats(
        pages_df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp")),
        key="url",
        gap_seconds=1800,
    ).select("url", "sess_start", "sess_end", "n_events")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    q.stop()


def test_tumbling_counts_equal_batch(spark, stream_dir, pages_df):
    stream = sp.stream_pages(spark, stream_dir)
    agg = sp.tumbling_counts(stream, key="lang", window="1 day")
    q = sp.run_to_memory(agg, "t2_counts")
    got = spark.table("t2_counts")

    want = (
        pages_df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        .groupBy(F.window("warc_ts", "1 day").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "lang",
            "n",
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    q.stop()


def test_sliding_counts_equal_batch(spark, stream_dir, pages_df):
    """T2 sliding variant: 2-day window sliding 1 day."""
    stream = sp.stream_pages(spark, stream_dir)
    agg = sp.tumbling_counts(stream, key="lang", window="2 days", slide="1 day")
    q = sp.run_to_memory(agg, "t2_sliding")
    got = spark.table("t2_sliding")
    want = (
        pages_df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        .groupBy(F.window("warc_ts", "2 days", "1 day").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "lang",
            "n",
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    q.stop()


def test_stream_dedupe(spark, stream_dir):
    stream = sp.stream_pages(spark, stream_dir)
    dd = sp.stream_dedupe(stream, keys=("url", "warc_ts"))
    q = (
        dd.writeStream.format("memory")
        .queryName("t5_dedupe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t5_dedupe")
    # generator injects exact (url, warc_ts) dups at ~1% — they must be gone
    assert got.count() == got.select("url", "warc_ts").distinct().count()
    q.stop()


def test_stateful_crawl_stats_matches_batch(spark, stream_dir, pages_df):
    """T4 custom stateful operator: after replaying the whole stream,
    the last emitted row per url equals the batch aggregate."""
    stream = sp.stream_pages(spark, stream_dir, max_files_per_trigger=2)
    stats = sp.stateful_crawl_stats(stream, key="url")
    q = (
        stats.writeStream.format("memory")
        .queryName("t4_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    got = spark.table("t4_stats").toPandas()
    # multiple batches may emit per url: the final (max n_crawls) wins
    final = got.sort_values("n_crawls").groupby("url").last().reset_index()

    want = (
        pages_df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_crawls"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
        .toPandas()
    )
    merged = final.merge(want, on="url", suffixes=("_g", "_w"))
    assert len(merged) == len(want)
    assert (merged["n_crawls_g"] == merged["n_crawls_w"]).all()
    assert (merged["first_ts_g"] == merged["first_ts_w"]).all()
    assert (merged["last_ts_g"] == merged["last_ts_w"]).all()
    q.stop()


def test_stream_latest_to_online_matches_batch(
    spark, stream_dir, pages_df, tmp_path_factory
):
    """T4: streaming upsert through foreachBatch lands the same latest
    rows as a batch latest-per-key over the full replay."""
    from feast_spark.materialize import read_online
    from feast_spark.operators.windows import latest_per_key

    dest = str(tmp_path_factory.mktemp("stream_online") / "store")
    ckpt = str(tmp_path_factory.mktemp("stream_online") / "ckpt")
    stream = sp.stream_pages(spark, stream_dir, max_files_per_trigger=1)
    q = sp.stream_latest_to_online(
        stream.select("url", "warc_ts", "lang"),
        dest,
        n_buckets=4,
        checkpoint=ckpt,
    )
    q.awaitTermination()

    got = read_online(spark, dest).select("url", "warc_ts")
    want = latest_per_key(
        pages_df.select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts")),
        key="url",
        order="warc_ts",
    ).select("url", "warc_ts")
    # urls must agree exactly; per-url latest ts must agree
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_kafka_decode_json_batch(spark):
    """decode_kafka_records is a pure transform over the Kafka record
    shape: typed payload columns come back JVM-side; malformed payloads
    null-fill instead of failing (VERDICT r01 missing #3)."""
    import json as _json

    from feast_spark.streaming.kafka import (
        KAFKA_RECORD_SCHEMA,
        decode_kafka_records,
    )

    recs = []
    for i in range(20):
        v = _json.dumps(
            {"url": f"https://k{i}.example/", "n_chars": i * 10,
             "warc_ts": f"2023-12-0{1 + i % 9}T00:00:00"}
        ).encode()
        recs.append((f"k{i}".encode(), v, "pages", i % 3, i, None, 0))
    recs.append((b"bad", b"{not json", "pages", 0, 99, None, 0))  # malformed
    df = spark.createDataFrame(recs, KAFKA_RECORD_SCHEMA)
    out = decode_kafka_records(
        df, "url string, n_chars long, warc_ts string",
        event_ts_col="warc_ts",
    ).toPandas()
    assert len(out) == 21
    assert set(out.columns) == {
        "kafka_key", "topic", "partition", "offset", "kafka_timestamp",
        "url", "n_chars", "warc_ts",
    }
    ok = out[out["url"].notna()]
    assert len(ok) == 20 and list(ok["n_chars"])[:3] == [0, 10, 20]
    bad = out[out["offset"] == 99]
    assert bad["url"].isna().all() and bad["kafka_key"].iloc[0] == "bad"
    assert str(out.dtypes["warc_ts"]).startswith("datetime64")


def test_kafka_decode_csv_and_bad_format(spark):
    from feast_spark.streaming.kafka import (
        KAFKA_RECORD_SCHEMA,
        decode_kafka_records,
    )

    df = spark.createDataFrame(
        [(None, b"https://a.example/,42", "t", 0, 0, None, 0)],
        KAFKA_RECORD_SCHEMA,
    )
    out = decode_kafka_records(
        df, "url string, n_chars long", value_format="csv",
        key_col=None, include_meta=False,
    ).collect()
    assert out[0]["url"] == "https://a.example/" and out[0]["n_chars"] == 42
    with pytest.raises(ValueError, match="value_format"):
        decode_kafka_records(df, "url string", value_format="protobuf")


def test_stream_upsert_checkpoint_idempotent(spark, pages_df, tmp_path_factory):
    """Re-running the availableNow stream with the SAME checkpoint
    processes nothing new: the serving store is byte-stable (streaming
    exactly-once via checkpoint + idempotent bucket upsert)."""
    import os

    from feast_spark.materialize import read_online
    from feast_spark.streaming.pipeline import stream_latest_to_online

    d = tmp_path_factory.mktemp("ckpt")
    src = str(d / "src")
    pages_df.select("url", "warc_ts", "lang").write.parquet(src)
    dest, ckpt = str(d / "store"), str(d / "ck")

    def run():
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, lang string"
        ).parquet(src)
        q = stream_latest_to_online(
            stream, dest, key="url", ts_col="warc_ts", n_buckets=4,
            checkpoint=ckpt,
        )
        q.awaitTermination()

    run()
    first = sorted(
        map(tuple, read_online(spark, dest).select("url", "warc_ts").collect())
    )
    run()  # same checkpoint: no new data, store unchanged
    second = sorted(
        map(tuple, read_online(spark, dest).select("url", "warc_ts").collect())
    )
    assert first == second and len(first) > 0


def test_stream_changed_rows_suppresses_unchanged(spark, tmp_path_factory):
    """transformWithStateInPandas CDC (Spark 4 arbitrary-state API): only
    rows whose value tuple differs from the key's last emitted row pass;
    replay equals the batch lag()-filter twin."""
    from pyspark.sql import Row, Window

    from feast_spark.streaming.pipeline import (
        run_to_memory,
        stream_changed_rows,
        stream_pages,
    )

    rows = []
    # u1: value changes each crawl → all pass; u2: constant → only first
    for i in range(4):
        rows.append(Row(url="u1", warc_ts=f"2023-06-01 0{i}:00:00",
                        html=None, text=f"v{i}", lang="en"))
        rows.append(Row(url="u2", warc_ts=f"2023-06-01 0{i}:00:00",
                        html=None, text="same", lang="en"))
    # u3: change, revert, change pattern: v a a v → emits at 0, skips 1? no:
    # a→a suppressed, a→v emitted (compare to LAST EMITTED)
    for i, t in enumerate(["x", "x", "y", "y"]):
        rows.append(Row(url="u3", warc_ts=f"2023-06-01 0{i}:00:00",
                        html=None, text=t, lang="en"))
    schema = "url string, warc_ts string, html binary, text string, lang string"
    src = str(tmp_path_factory.mktemp("cdc") / "in")
    spark.createDataFrame(rows, schema).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    ).write.parquet(src)

    stream = stream_pages(spark, src)
    out = stream_changed_rows(
        stream, key="url", ts_col="warc_ts", value_cols=["text", "lang"]
    )
    run_to_memory(out, "cdc_out", complete=False)
    got = spark.table("cdc_out").toPandas()

    per_key = got.groupby("url").size().to_dict()
    assert per_key == {"u1": 4, "u2": 1, "u3": 2}

    # batch twin: value != lag(value) over (key, ts)
    batch = spark.createDataFrame(rows, schema).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    )
    w = Window.partitionBy("url").orderBy("warc_ts")
    twin = (
        batch.withColumn("__prev", F.lag("text").over(w))
        .filter(F.col("__prev").isNull() | (F.col("text") != F.col("__prev")))
        .select("url", "warc_ts", "text", "lang")
    )
    a = set(map(tuple, got[["url", "text"]].values))
    b = {(r["url"], r["text"]) for r in twin.collect()}
    assert a == b


def test_stream_stream_join_interval_bounds(spark, tmp_path_factory):
    """Stream-stream interval join: inclusive [left_ts, left_ts+within]
    bounds, key-scoped, right columns prefixed."""
    from pyspark.sql import Row

    from feast_spark.streaming.pipeline import stream_stream_join

    d = tmp_path_factory.mktemp("ssj")
    lrows = [Row(user="u1", vts="2023-06-01 10:00:00", vid=1),
             Row(user="u2", vts="2023-06-01 10:00:00", vid=2)]
    rrows = [
        Row(user="u1", pts="2023-06-01 10:30:00", pid=10),  # in window
        Row(user="u1", pts="2023-06-01 11:00:00", pid=11),  # boundary: in
        Row(user="u1", pts="2023-06-01 11:00:01", pid=12),  # just out
        Row(user="u1", pts="2023-06-01 09:59:59", pid=13),  # before: out
        Row(user="u2", pts="2023-06-01 10:30:00", pid=20),  # other key
    ]
    lsrc, rsrc = str(d / "l"), str(d / "r")
    spark.createDataFrame(lrows).withColumn(
        "vts", F.col("vts").cast("timestamp")).write.parquet(lsrc)
    spark.createDataFrame(rrows).withColumn(
        "pts", F.col("pts").cast("timestamp")).write.parquet(rsrc)

    ls = spark.readStream.schema("user string, vts timestamp, vid long").parquet(lsrc)
    rs = spark.readStream.schema("user string, pts timestamp, pid long").parquet(rsrc)
    out = stream_stream_join(
        ls, rs, key="user", left_ts="vts", right_ts="pts", within="1 hour"
    )
    import uuid

    name = "ssj" + uuid.uuid4().hex[:8]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table(name).toPandas()
    assert sorted(zip(got["vid"], got["r_pid"])) == [(1, 10), (1, 11), (2, 20)]


def test_stream_enrich_pit_equals_batch_retrieval(
    spark, pages_df, tmp_path_factory
):
    """VERDICT r03 next #4: streamed probes PIT-enriched in foreachBatch
    must equal batch get_historical_features on the same (deduped)
    probes — one retrieval code path for both serving modes."""
    from datetime import timedelta

    from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView

    base = tmp_path_factory.mktemp("stream_pit")
    store = FeatureStore(spark)
    store.apply(
        FeatureView(
            name="pg",
            entity=Entity("url", "url"),
            source=lambda sp_, df=pages_df: df.select(
                "url",
                F.col("warc_ts").cast("timestamp").alias("warc_ts"),
                F.length("text").cast("long").alias("n_chars"),
            ).dropDuplicates(["url", "warc_ts"]),
            features=[FeatureSpec("n_chars", "bigint")],
            ttl=timedelta(days=90),
            timestamp_field="warc_ts",
        )
    )
    probes = (
        pages_df.select(
            "url",
            (F.col("warc_ts").cast("timestamp") + F.expr("INTERVAL 1 HOUR"))
            .alias("ts"),
        )
        .dropDuplicates(["url", "ts"])
        .limit(200)
    )
    # duplicate every probe: the stream must dedupe within the watermark
    src = str(base / "probes")
    probes.unionAll(probes).repartition(3).write.parquet(src)
    dest = str(base / "out")
    stream = spark.readStream.schema("url string, ts timestamp").parquet(src)
    q = sp.stream_enrich_pit(
        stream, store, ["pg:n_chars"], dest,
        dedupe_keys=("url", "ts"),
        checkpoint=str(base / "ckpt"),
    )
    q.awaitTermination()

    got = spark.read.parquet(dest).drop("__batch")
    want = store.get_historical_features(probes, ["pg:n_chars"])
    assert got.count() == probes.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_enrich_pit_refuses_legacy_flat_dest(
    spark, pages_df, tmp_path_factory
):
    """ADVICE r04: a dest holding unpartitioned parquet (written by the
    pre-__batch code) must be refused up front — resuming onto it would
    mix flat files with __batch= partition dirs and break partition
    discovery. A dest that already carries __batch= dirs resumes fine
    (covered by the replay-idempotence test)."""
    from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView

    base = tmp_path_factory.mktemp("stream_pit_legacy")
    store = FeatureStore(spark)
    store.apply(
        FeatureView(
            name="pg",
            entity=Entity("url", "url"),
            source=lambda sp_, df=pages_df: df.select(
                "url",
                F.col("warc_ts").cast("timestamp").alias("warc_ts"),
                F.length("text").cast("long").alias("n_chars"),
            ).dropDuplicates(["url", "warc_ts"]),
            features=[FeatureSpec("n_chars", "bigint")],
            timestamp_field="warc_ts",
        )
    )
    src = str(base / "probes")
    pages_df.select(
        "url", F.col("warc_ts").cast("timestamp").alias("ts")
    ).limit(5).write.parquet(src)
    # the legacy shape: flat parquet at the dest root, no partition dirs
    dest = str(base / "out")
    spark.range(3).write.parquet(dest)
    stream = spark.readStream.schema("url string, ts timestamp").parquet(src)
    with pytest.raises(ValueError, match="fresh dest"):
        sp.stream_enrich_pit(
            stream, store, ["pg:n_chars"], dest,
            checkpoint=str(base / "ckpt"),
        )


def test_stream_agg_to_online_matches_batch_with_late_rows(
    spark, tmp_path_factory
):
    """Streaming aggregated materialization (stream_agg_to_online) ==
    batch materialization of the same aggregated view over the full
    replay — INCLUDING a cross-batch late row whose arrival must correct
    an already-served anchor's trailing-window value."""
    from datetime import datetime, timedelta

    from feast_spark.materialize import MaterializeJob, read_online
    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )

    base = tmp_path_factory.mktemp("stream_agg")
    src = str(base / "src")
    schema = "warc_ts timestamp, url string, value double"
    b1 = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0, 0), "a", 1.0),
            (datetime(2024, 1, 1, 1, 0), "a", 2.0),
            (datetime(2024, 1, 1, 0, 5), "b", 5.0),
        ],
        schema,
    )
    # batch 2 carries a LATE row for a (00:30 < batch-1 max 01:00): the
    # served anchor a@01:00 must be re-materialized with sum 1+10+2
    b2 = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0, 30), "a", 10.0),
            (datetime(2024, 1, 1, 2, 0), "b", 7.0),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    aggs = [Aggregation("value", "sum", timedelta(hours=1))]
    feats = [FeatureSpec("sum_value_3600s", "double")]
    view = FeatureView(
        name="sagg",
        entity=Entity("url", "url"),
        source="unused",
        features=feats,
        timestamp_field="warc_ts",
        aggregations=aggs,
    )
    dest = str(base / "store")
    hist = str(base / "hist")
    ckpt = str(base / "ckpt")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = sp.stream_agg_to_online(
        stream, view, dest, history_root=hist, n_buckets=4, checkpoint=ckpt
    )
    q.awaitTermination()

    got = {
        r["url"]: (str(r["warc_ts"]), r["sum_value_3600s"])
        for r in read_online(spark, dest).collect()
    }
    # a: latest anchor 01:00, window [00:00, 01:00] = 1 + 10 + 2
    assert got["a"] == ("2024-01-01 01:00:00", 13.0)
    # b: latest anchor 02:00, 00:05 outside the 1h window
    assert got["b"] == ("2024-01-01 02:00:00", 7.0)

    # and byte-compatible with a one-shot batch materialization
    import dataclasses

    bdest = str(base / "bstore")
    bview = dataclasses.replace(
        view, source=lambda s: b1.unionByName(b2)
    )
    MaterializeJob(spark, bview, bdest, n_buckets=4).run(
        datetime(2024, 1, 1), datetime(2024, 1, 2)
    )
    batch = {
        r["url"]: (str(r["warc_ts"]), r["sum_value_3600s"])
        for r in read_online(spark, bdest).collect()
    }
    assert got == batch


def test_stream_agg_unbounded_window_late_row_corrects_newer_anchors(
    spark, tmp_path_factory
):
    """r04 review: a LIFETIME (unbounded) aggregation has no finite
    window reach — a late row changes every anchor AFTER it, including
    anchors NEWER than the late batch's own max ts. The recompute span
    must therefore extend through the newest anchor in history (the old
    pad=0 span left the already-served newest anchor stale forever)."""
    from datetime import datetime, timedelta

    from feast_spark.materialize import read_online
    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )

    base = tmp_path_factory.mktemp("stream_agg_life")
    src = str(base / "src")
    schema = "warc_ts timestamp, url string, value double"
    b1 = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 1, 0), "u", 1.0),
            (datetime(2024, 1, 1, 5, 0), "u", 2.0),
        ],
        schema,
    )
    # late row at 02:00 — BELOW batch 1's served anchor 05:00
    b2 = spark.createDataFrame(
        [(datetime(2024, 1, 1, 2, 0), "u", 10.0)], schema
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    view = FeatureView(
        name="slife",
        entity=Entity("url", "url"),
        source="unused",
        features=[FeatureSpec("sum_value", "double")],
        timestamp_field="warc_ts",
        aggregations=[Aggregation("value", "sum", None)],
    )
    dest = str(base / "store")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = sp.stream_agg_to_online(
        stream, view, dest,
        history_root=str(base / "hist"), n_buckets=2,
        checkpoint=str(base / "ckpt"),
    )
    q.awaitTermination()
    got = {
        r["url"]: (str(r["warc_ts"]), r["sum_value"])
        for r in read_online(spark, dest).collect()
    }
    # lifetime sum at the newest anchor 05:00 must include the late 10.0
    assert got["u"] == ("2024-01-01 05:00:00", 13.0)


def test_stream_agg_replay_skips_committed_append(spark, tmp_path_factory):
    """Crash-window replay (fresh checkpoint, identical batch): the
    stream_batch marker committed in the history snapshot summary makes
    the replayed append a no-op — no double-counted history rows."""
    from datetime import datetime, timedelta

    from feast_spark.materialize import read_online
    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )
    from feast_spark.sources import pages as layout

    base = tmp_path_factory.mktemp("stream_agg_replay")
    src = str(base / "src")
    schema = "warc_ts timestamp, url string, value double"
    spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0, 0), "u", 1.0),
            (datetime(2024, 1, 1, 0, 30), "u", 2.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    view = FeatureView(
        name="sreplay",
        entity=Entity("url", "url"),
        source="unused",
        features=[FeatureSpec("sum_value_3600s", "double")],
        timestamp_field="warc_ts",
        aggregations=[Aggregation("value", "sum", timedelta(hours=1))],
    )
    dest = str(base / "store")
    hist = str(base / "hist")

    def run(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = sp.stream_agg_to_online(
            stream, view, dest, history_root=hist, n_buckets=2,
            checkpoint=str(base / ckpt),
        )
        q.awaitTermination()

    run("ckpt1")
    head = layout.current_snapshot(hist)["snapshot_id"]
    run("ckpt2")  # replays batch 0 with identical contents
    assert layout.current_snapshot(hist)["snapshot_id"] == head
    assert layout.read_table(spark, hist).count() == 2  # not 4
    got = read_online(spark, dest).collect()
    assert len(got) == 1 and got[0]["sum_value_3600s"] == 3.0


def test_stream_agg_fresh_checkpoint_with_new_data_raises(
    spark, tmp_path_factory
):
    """A fresh checkpoint whose restarted batch 0 carries DIFFERENT rows
    than the committed batch 0 is not a replay — silently skipping it
    loses data, appending it double-counts the overlap. It must raise."""
    from datetime import datetime, timedelta

    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )

    base = tmp_path_factory.mktemp("stream_agg_mismatch")
    src = str(base / "src")
    schema = "warc_ts timestamp, url string, value double"
    spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0), "u", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    view = FeatureView(
        name="smismatch",
        entity=Entity("url", "url"),
        source="unused",
        features=[FeatureSpec("sum_value_3600s", "double")],
        timestamp_field="warc_ts",
        aggregations=[Aggregation("value", "sum", timedelta(hours=1))],
    )
    dest = str(base / "store")
    hist = str(base / "hist")

    def run(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = sp.stream_agg_to_online(
            stream, view, dest, history_root=hist, n_buckets=2,
            checkpoint=str(base / ckpt),
        )
        q.awaitTermination()

    run("ckpt1")
    # more data arrives; a FRESH checkpoint folds it into a new batch 0
    spark.createDataFrame(
        [(datetime(2024, 1, 1, 1, 0), "u", 5.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="different contents"):
        run("ckpt2")


def test_stream_enrich_pit_replay_is_idempotent(
    spark, pages_df, tmp_path_factory
):
    """r04 review batch 2: a replayed enrichment micro-batch (crash
    between the parquet write and the checkpoint commit) must rewrite
    its own __batch partition, not append duplicates."""
    from datetime import timedelta

    from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView

    base = tmp_path_factory.mktemp("stream_pit_replay")
    store = FeatureStore(spark)
    store.apply(
        FeatureView(
            name="pgr",
            entity=Entity("url", "url"),
            source=lambda sp_, df=pages_df: df.select(
                "url",
                F.col("warc_ts").cast("timestamp").alias("warc_ts"),
                F.length("text").cast("long").alias("n_chars"),
            ).dropDuplicates(["url", "warc_ts"]),
            features=[FeatureSpec("n_chars", "bigint")],
            ttl=timedelta(days=90),
            timestamp_field="warc_ts",
        )
    )
    probes = pages_df.select(
        "url",
        (F.col("warc_ts").cast("timestamp") + F.expr("INTERVAL 1 HOUR"))
        .alias("ts"),
    ).dropDuplicates(["url", "ts"]).limit(50)
    src = str(base / "probes")
    probes.coalesce(1).write.parquet(src)
    dest = str(base / "out")

    def run(ck):
        stream = spark.readStream.schema("url string, ts timestamp").parquet(src)
        sp.stream_enrich_pit(
            stream, store, ["pgr:n_chars"], dest,
            checkpoint=str(base / ck),
        ).awaitTermination()

    run("ckpt1")
    first = spark.read.parquet(dest).drop("__batch").collect()
    run("ckpt2")  # fresh checkpoint replays batch 0 over the same probes
    second = spark.read.parquet(dest).drop("__batch").collect()
    assert len(second) == len(first) == probes.count()
