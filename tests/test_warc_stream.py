"""Streaming WARC-directory ingestion: new segments flow into the
layout exactly once; SQL catalog registration over the result."""

import os

import pytest
from pyspark.sql import functions as F

from feast_spark.sources import pages as layout
from feast_spark.sources import warc


def seg(tmp, name, urls_days):
    p = str(tmp / name)
    warc.write_warc_file(
        [
            {
                "url": u,
                "date": f"2024-01-{d:02d}T00:00:00Z",
                "text": f"text of {u}",
            }
            for u, d in urls_days
        ],
        p,
    )
    return p


def wet(df):
    return df.filter(F.col("warc_type") == "conversion").select(
        "url", "warc_date", "text"
    )


def run_once(spark, indir, dest, ckpt):
    q = warc.stream_warc_dir(
        spark, indir, dest, checkpoint=ckpt, transform=wet, n_buckets=2
    )
    q.awaitTermination(120)


def test_stream_ingests_new_segments_exactly_once(spark, tmp_path):
    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    seg(indir, "a.warc.gz", [("u1", 1), ("u2", 2)])
    seg(indir, "b.warc.gz", [("u3", 3)])
    run_once(spark, str(indir), dest, ckpt)
    got = {r["url"] for r in layout.read_table(spark, dest).collect()}
    assert got == {"u1", "u2", "u3"}

    # second run, nothing new: no new snapshot, same rows
    head = layout.current_snapshot(dest)["snapshot_id"]
    run_once(spark, str(indir), dest, ckpt)
    assert layout.current_snapshot(dest)["snapshot_id"] == head

    # a new segment arrives: ONLY it is ingested (append, no dupes)
    seg(indir, "c.warc.gz", [("u4", 4), ("u1", 5)])
    run_once(spark, str(indir), dest, ckpt)
    rows = layout.read_table(spark, dest).collect()
    assert len(rows) == 5  # u1 twice (two crawls), u2-u4 once
    assert {r["url"] for r in rows} == {"u1", "u2", "u3", "u4"}
    # the snapshot history is append-only: incremental read sees only c
    delta = layout.read_table_incremental(spark, dest, head)
    assert {r["url"] for r in delta.collect()} == {"u4", "u1"}
    assert delta.count() == 2


def test_replayed_batch_is_noop_via_snapshot_summary(spark, tmp_path):
    """Simulate the crash-between-commits window: the segment list
    committed in the snapshot summary makes a replay skip the append."""
    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    seg(indir, "a.warc.gz", [("u1", 1)])
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt1"))
    head = layout.current_snapshot(dest)
    assert head["summary"]["warc_batch"] == "0"
    assert len(head["summary"]["warc_segments"]) == 1
    # new checkpoint ⇒ the file source REPLAYS batch 0 with the same
    # file list; the committed marker must make it a no-op
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt2"))
    assert layout.current_snapshot(dest)["snapshot_id"] == head["snapshot_id"]
    assert layout.read_table(spark, dest).count() == 1


def test_fresh_checkpoint_with_new_segments_ingests_only_them(
    spark, tmp_path
):
    """r04 review: a fresh checkpoint restarts batch numbering, so its
    batch 0 can MIX already-ingested and brand-new segments. A
    batch-id-keyed ledger skipped the whole batch (losing the new
    segments forever); the per-segment set difference must ingest
    exactly the new ones."""
    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    seg(indir, "a.warc.gz", [("u1", 1)])
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt1"))
    # checkpoint lost; a new segment arrives before the re-run
    seg(indir, "b.warc.gz", [("u2", 2)])
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt2"))
    rows = layout.read_table(spark, dest).collect()
    assert {r["url"] for r in rows} == {"u1", "u2"}
    assert len(rows) == 2  # u1 NOT double-ingested


def test_register_table_sql_surface(spark, tmp_path):
    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    seg(indir, "a.warc.gz", [("u1", 1), ("u2", 2), ("u3", 3)])
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt"))
    layout.register_table(spark, dest, "crawl")
    n = spark.sql("SELECT count(*) AS n FROM crawl").collect()[0]["n"]
    assert n == 3
    top = spark.sql(
        "SELECT url FROM crawl ORDER BY warc_date DESC LIMIT 1"
    ).collect()[0]["url"]
    assert top == "u3"
    # registration pins the planned snapshot: new appends are invisible
    # until re-registration (Iceberg snapshot-isolation semantics)
    seg(indir, "b.warc.gz", [("u9", 9)])
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt"))
    assert spark.sql("SELECT count(*) AS n FROM crawl").collect()[0]["n"] == 3
    layout.register_table(spark, dest, "crawl")
    assert spark.sql("SELECT count(*) AS n FROM crawl").collect()[0]["n"] == 4


def test_legacy_ledger_still_guards_replays(spark, tmp_path):
    """r04 review batch 3: tables ingested by the pre-summary code have
    no warc_segments summaries — only the legacy batch-id ledger. A
    replayed batch against such a table must still be skipped."""
    import json

    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    p = seg(indir, "a.warc.gz", [("u1", 1)])
    # simulate the OLD code's state: table written WITHOUT summaries,
    # plus its _stream_ingest/batch-0.json ledger
    df = warc.read_warc(spark, [p])
    layout.write_table(
        wet(df), dest, key_col="url", ts_col="warc_date", n_buckets=2,
    )
    ldir = tmp_path / "tbl" / "_stream_ingest"
    ldir.mkdir()
    (ldir / "batch-0.json").write_text(
        json.dumps({"batch_id": 0, "snapshot": 1, "n_files": 1})
    )
    head = layout.current_snapshot(dest)["snapshot_id"]
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt"))
    assert layout.current_snapshot(dest)["snapshot_id"] == head
    assert layout.read_table(spark, dest).count() == 1


def test_legacy_ledger_mismatch_raises_not_drops(spark, tmp_path):
    """r04 review batch 4: a reset checkpoint over a legacy table whose
    batch id collides with a legacy ledger entry but presents a
    DIFFERENT file count cannot be safely diffed — it must raise, not
    silently drop the new segments."""
    import json

    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    p = seg(indir, "a.warc.gz", [("u1", 1)])
    df = warc.read_warc(spark, [p])
    layout.write_table(
        wet(df), dest, key_col="url", ts_col="warc_date", n_buckets=2,
    )
    ldir = tmp_path / "tbl" / "_stream_ingest"
    ldir.mkdir()
    (ldir / "batch-0.json").write_text(
        json.dumps({"batch_id": 0, "snapshot": 1, "n_files": 1})
    )
    seg(indir, "b.warc.gz", [("u2", 2)])  # new segment joins batch 0
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="cannot be safely"):
        run_once(spark, str(indir), dest, str(tmp_path / "ckpt"))
    assert layout.read_table(spark, dest).count() == 1  # nothing corrupted


def test_legacy_ledger_equal_count_spoof_refuses(spark, tmp_path):
    """ADVICE r04: count equality alone is NOT a replay — a reset
    checkpoint presenting the same NUMBER of different, never-ingested
    segments must refuse (previously it was silently skipped, dropping
    those segments). The distinguishing signal for count-only legacy
    records is CONTENT: a pure replay's rows all already exist in the
    table; the spoof's segments carry rows the table has never seen.
    Metadata (mtime) is deliberately not trusted — mv/rsync -a preserve
    timestamps."""
    import json

    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    p = seg(indir, "a.warc.gz", [("u1", 1)])
    df = warc.read_warc(spark, [p])
    layout.write_table(
        wet(df), dest, key_col="url", ts_col="warc_date", n_buckets=2,
    )
    ldir = tmp_path / "tbl" / "_stream_ingest"
    ldir.mkdir()
    (ldir / "batch-0.json").write_text(
        json.dumps({"batch_id": 0, "snapshot": 1, "n_files": 1})
    )
    # the spoof: a.warc.gz vanishes, a DIFFERENT new segment arrives
    # (mtime-preserving transfer assumed — the check must not care) —
    # a fresh checkpoint's batch 0 presents exactly n_files=1 file
    import os as _os

    _os.remove(p)
    seg(indir, "b.warc.gz", [("u2", 2)])
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="absent from the table"):
        run_once(spark, str(indir), dest, str(tmp_path / "ckpt"))
    assert layout.read_table(spark, dest).count() == 1  # u2 NOT dropped silently


def test_legacy_replay_with_null_urls_still_skips(spark, tmp_path):
    """r05 review batch 2: without a transform, real WARCs yield
    NULL-url rows (warcinfo records carry no WARC-Target-URI) — the
    content probe's membership join must be null-safe, or a genuine
    replay is branded 'absent from the table' forever."""
    import json

    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    p = str(indir / "a.warc.gz")
    warc.write_warc_file(
        [
            {"url": None, "date": "2024-01-01T00:00:00Z",
             "warc_type": "warcinfo", "text": "crawl metadata"},
            {"url": "u1", "date": "2024-01-01T00:00:01Z", "text": "body"},
        ],
        p,
    )
    df = warc.read_warc(spark, [p])  # NO transform: NULL-url row kept
    layout.write_table(
        df, dest, key_col="url", ts_col="warc_date", n_buckets=2,
    )
    ldir = tmp_path / "tbl" / "_stream_ingest"
    ldir.mkdir()
    (ldir / "batch-0.json").write_text(
        json.dumps({"batch_id": 0, "snapshot": 1, "n_files": 1})
    )
    head = layout.current_snapshot(dest)["snapshot_id"]
    q = warc.stream_warc_dir(
        spark, str(indir), dest, checkpoint=str(tmp_path / "ckpt"),
        n_buckets=2,
    )
    q.awaitTermination(120)
    # pure replay: skipped (no new snapshot, no duplicate rows)
    assert layout.current_snapshot(dest)["snapshot_id"] == head
    assert layout.read_table(spark, dest).count() == 2


def test_legacy_ledger_path_list_compares_exactly(spark, tmp_path):
    """ADVICE r04: legacy records that DO carry a file list are compared
    by path set, which beats both the count and the mtime heuristics —
    an exact match skips (even with fresh mtimes), a different set at
    equal count refuses."""
    import json

    indir = tmp_path / "drop"
    indir.mkdir()
    dest = str(tmp_path / "tbl")
    p = seg(indir, "a.warc.gz", [("u1", 1)])
    df = warc.read_warc(spark, [p])
    layout.write_table(
        wet(df), dest, key_col="url", ts_col="warc_date", n_buckets=2,
    )
    ldir = tmp_path / "tbl" / "_stream_ingest"
    ldir.mkdir()
    (ldir / "batch-0.json").write_text(
        json.dumps({"batch_id": 0, "snapshot": 1, "n_files": 1, "paths": [p]})
    )
    head = layout.current_snapshot(dest)["snapshot_id"]
    # exact path match → pure replay, skipped
    run_once(spark, str(indir), dest, str(tmp_path / "ckpt"))
    assert layout.current_snapshot(dest)["snapshot_id"] == head
    # different set at equal count → refuse, not skip
    import os as _os

    _os.remove(p)
    seg(indir, "b.warc.gz", [("u2", 2)])
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="file list differs"):
        run_once(spark, str(indir), dest, str(tmp_path / "ckpt2"))
    assert layout.read_table(spark, dest).count() == 1
