"""Regression pins for round-4 review batch 2 (the second full-diff
review): non-ASCII blocklist boundaries, LSH recall-cap logging,
re-crawled-id incremental verify, window-strategy sample guards."""

import pytest
from pyspark.sql import functions as F


def test_blocklist_matches_non_ascii_phrases(spark):
    """Java's default \\b/\\w are ASCII-only: without (?U) a phrase
    edged by a non-ASCII letter never saw a word boundary and the
    filter was silently inert for it."""
    from feast_spark.operators.text import blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "http://a.com/1", "лучшее казино в сети"),
            (2, "http://a.com/2", "обычный текст без запрещённого"),
            (3, "http://a.com/3", "das Über-Angebot hier"),
            (4, "http://a.com/4", "plain english page"),
        ],
        "doc_id long, url string, text string",
    )
    out = blocklist_filter(
        df, banned_phrases=["казино", "über"], blocked_domains=None
    )
    assert {r["doc_id"] for r in out.collect()} == {2, 4}
    # boundaries still boundaries: a phrase INSIDE a longer word stays
    out2 = blocklist_filter(df, banned_phrases=["казин"])
    assert {r["doc_id"] for r in out2.collect()} == {1, 2, 3, 4}


def test_choose_lsh_params_logs_recall_shortfall(caplog):
    """The max_tables clamp must be loud: it silently delivered ~0.5
    recall where the docstring promised >= target_recall."""
    import logging

    from feast_spark.operators.similarity import choose_lsh_params

    with caplog.at_level(logging.WARNING, logger="feast_spark.operators.similarity"):
        n_bits, n_tables = choose_lsh_params(
            18_000_000_000, threshold=0.9, target_recall=0.95
        )
    assert n_tables == 32  # still capped (bounded index size)
    assert any("shortfall" in r.message for r in caplog.records)
    # comfortable configs stay silent
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="feast_spark.operators.similarity"):
        choose_lsh_params(100_000, threshold=0.99)
    assert not caplog.records


def test_minhash_incremental_recrawled_id_verifies_against_new_text(
    spark, tmp_path
):
    """A doc_id present in BOTH the index and the new batch (a re-crawl)
    fanned every candidate pair into duplicate rows with conflicting
    jaccard values; the new batch's text must win, one row per pair."""
    from feast_spark.operators.dedupe import (
        build_minhash_index, minhash_incremental_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    old = spark.createDataFrame(
        [(1, base), (2, base + "tail one two three")],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    build_minhash_index(old, root, id_col="doc_id", text_col="text")
    # re-crawl of doc 2 with slightly different text, plus a fresh dup
    new = spark.createDataFrame(
        [(2, base + "tail four five six"), (3, base)],
        "doc_id long, text string",
    )
    out = minhash_incremental_pairs(
        new, root, threshold=0.6, verify="exact", old_docs=old
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert len(pairs) == len(set(pairs))  # no duplicated pair rows
    assert (1, 3) in pairs  # the genuinely new duplicate is found


def test_stratified_sample_window_guard_observe_and_validation(spark):
    """guard='observe' on the window strategy was silently ignored (the
    contractual check_sample_guard then raised on API-conformant use),
    and bogus guard values slipped through."""
    from feast_spark.operators.sampling import (
        check_sample_guard, stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(60)], "id long, g string"
    )
    out = stratified_sample(
        df, group_col="g", id_col="id", k=5,
        strategy="window", guard="observe",
    )
    n = out.count()  # the action the observations ride
    assert n == 15
    assert check_sample_guard(out) == 15
    with pytest.raises(ValueError, match="unknown guard"):
        stratified_sample(
            df, group_col="g", id_col="id", k=5,
            strategy="window", guard="bogus",
        )


def test_stream_agg_fingerprint_sees_even_multiplicity_change(
    spark, tmp_path_factory
):
    """r04 review batch 3: count + xor alone is blind to rows repeated
    an even number of times ([r1,r1] and [r2,r2] both xor to 0); the
    multiset-sum term must make a reset checkpoint with different
    duplicated rows RAISE instead of silently skipping the append."""
    from datetime import datetime, timedelta

    from pyspark.errors import StreamingQueryException

    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )
    from feast_spark.streaming import pipeline as sp

    base = tmp_path_factory.mktemp("fp_even")
    schema = "warc_ts timestamp, url string, value double"
    view = FeatureView(
        name="fpe",
        entity=Entity("url", "url"),
        source="unused",
        features=[FeatureSpec("sum_value_3600s", "double")],
        timestamp_field="warc_ts",
        aggregations=[Aggregation("value", "sum", timedelta(hours=1))],
    )
    dest, hist = str(base / "store"), str(base / "hist")
    r1 = (datetime(2024, 1, 1, 0, 0), "u", 1.0)
    r2 = (datetime(2024, 1, 1, 0, 0), "u", 2.0)

    def run(src, ck):
        stream = spark.readStream.schema(schema).parquet(src)
        sp.stream_agg_to_online(
            stream, view, dest, history_root=hist, n_buckets=2,
            checkpoint=str(base / ck),
        ).awaitTermination()

    src1 = str(base / "src1")
    spark.createDataFrame([r1, r1], schema).coalesce(1).write.parquet(src1)
    run(src1, "ck1")
    src2 = str(base / "src2")
    spark.createDataFrame([r2, r2], schema).coalesce(1).write.parquet(src2)
    with pytest.raises(StreamingQueryException, match="different contents"):
        run(src2, "ck2")  # same count, same xor — the sum term must differ


def test_stream_agg_unbounded_scan_fallback_on_partial_stats(
    spark, tmp_path_factory
):
    """r04 review batch 3: footer max_ts over only the stat-bearing
    files underestimates the recompute bound when a stats-less file
    holds the newest anchor — the scan fallback must kick in whenever
    ANY file lacks ts stats."""
    import json
    import os
    from datetime import datetime

    from feast_spark.materialize import read_online
    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )
    from feast_spark.sources import pages as layout
    from feast_spark.streaming import pipeline as sp

    base = tmp_path_factory.mktemp("partial_stats")
    schema = "warc_ts timestamp, url string, value double"
    view = FeatureView(
        name="ps",
        entity=Entity("url", "url"),
        source="unused",
        features=[FeatureSpec("sum_value", "double")],
        timestamp_field="warc_ts",
        aggregations=[Aggregation("value", "sum", None)],
    )
    dest, hist = str(base / "store"), str(base / "hist")
    src = str(base / "src")
    spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 1), "u", 1.0),
            (datetime(2024, 1, 1, 5), "u", 2.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    def run(ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        sp.stream_agg_to_online(
            stream, view, dest, history_root=hist, n_buckets=2,
            checkpoint=str(base / ck),
        ).awaitTermination()

    run("ck")
    # simulate a stats-less newest file: null every footer ts stat in
    # HEAD (worse than the mixed case — forces the fallback outright)
    meta = os.path.join(hist, "metadata")
    head = os.path.join(meta, open(os.path.join(meta, "HEAD")).read().strip())
    snap = json.load(open(head))
    for f in snap["files"]:
        f["max_ts"] = None
    json.dump(snap, open(head, "w"))
    # late row below the served 05:00 anchor arrives in batch 2
    spark.createDataFrame(
        [(datetime(2024, 1, 1, 2), "u", 10.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run("ck")  # same checkpoint continues with the new file
    got = {
        r["url"]: (str(r["warc_ts"]), r["sum_value"])
        for r in read_online(spark, dest).collect()
    }
    assert got["u"] == ("2024-01-01 05:00:00", 13.0)


def test_orphan_sweep_skips_concurrently_vanished_file(
    spark, pages_df, tmp_path_factory, monkeypatch
):
    """r04 review batch 3: a file deleted between listing and the age
    stat must be skipped, not crash the sweep."""
    import os

    from feast_spark.sources import pages as layout

    root = str(tmp_path_factory.mktemp("vanish") / "t")
    layout.write_table(pages_df, root, n_buckets=2)
    orphan = os.path.join(
        root, layout.DATA_DIR, "dt=2023-11", "bucket=0",
        "append-cafebabe-0000.parquet",
    )
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"x")
    real = os.path.getmtime

    def racy(p):
        if p == orphan:
            raise FileNotFoundError(p)  # vanished after listing
        return real(p)

    monkeypatch.setattr(os.path, "getmtime", racy)
    out = layout.remove_orphan_files(root, min_age_s=0)
    assert out["orphans_found"] == 0  # skipped, no crash


def test_stream_agg_accepts_legacy_two_segment_fingerprint(
    spark, tmp_path_factory
):
    """r04 review batch 4: markers written before the multiset-sum term
    carry 'n:xr' — a crash replay against one must match on the common
    prefix, not crash the stream as a reset checkpoint."""
    import json
    import os
    from datetime import datetime, timedelta

    from feast_spark.materialize import read_online
    from feast_spark.registry import (
        Aggregation, Entity, FeatureSpec, FeatureView,
    )
    from feast_spark.sources import pages as layout
    from feast_spark.streaming import pipeline as sp

    base = tmp_path_factory.mktemp("fp_legacy")
    schema = "warc_ts timestamp, url string, value double"
    view = FeatureView(
        name="fpl",
        entity=Entity("url", "url"),
        source="unused",
        features=[FeatureSpec("sum_value_3600s", "double")],
        timestamp_field="warc_ts",
        aggregations=[Aggregation("value", "sum", timedelta(hours=1))],
    )
    dest, hist = str(base / "store"), str(base / "hist")
    src = str(base / "src")
    spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0), "u", 1.0)], schema
    ).coalesce(1).write.parquet(src)

    def run(ck):
        stream = spark.readStream.schema(schema).parquet(src)
        sp.stream_agg_to_online(
            stream, view, dest, history_root=hist, n_buckets=2,
            checkpoint=str(base / ck),
        ).awaitTermination()

    run("ck1")
    # rewrite the committed marker into the legacy two-segment format
    meta = os.path.join(hist, "metadata")
    head = os.path.join(meta, open(os.path.join(meta, "HEAD")).read().strip())
    snap = json.load(open(head))
    n, xr, _sm = snap["summary"]["stream_fp"].split(":")
    snap["summary"]["stream_fp"] = f"{n}:{xr}"
    json.dump(snap, open(head, "w"))
    before = layout.current_snapshot(hist)["snapshot_id"]
    run("ck2")  # identical replay against the legacy marker: must skip
    assert layout.current_snapshot(hist)["snapshot_id"] == before
    got = read_online(spark, dest).collect()
    assert len(got) == 1 and got[0]["sum_value_3600s"] == 1.0
