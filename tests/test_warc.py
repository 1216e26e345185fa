"""WARC/WET ingestion: writer↔reader round-trip, gzip member handling,
HTTP splitting, truncation detection, and streaming batch bounds."""

import gzip

import pytest

from feast_spark.sources import warc


def recs(n=5, warc_type="conversion"):
    out = []
    for i in range(n):
        out.append(
            {
                "url": f"https://ex{i % 3}.org/p/{i}",
                "date": f"2024-01-0{(i % 7) + 1}T0{i % 10}:00:00Z",
                "text": f"document {i} body with words " + "x" * i,
                "warc_type": warc_type,
            }
        )
    return out


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_conversion(tmp_path, compress):
    rs = recs(7)
    p = str(tmp_path / ("a.warc" + (".gz" if compress else "")))
    warc.write_warc_file(rs, p, compress=compress)
    got = list(warc.iter_warc_records(p))
    assert len(got) == 7
    for r, g in zip(rs, got):
        assert g["url"] == r["url"]
        assert g["text"] == r["text"]
        assert g["payload"] == r["text"].encode()
        assert g["warc_type"] == "conversion"
        assert g["warc_date"].isoformat().startswith(r["date"][:13])
        assert g["record_id"].startswith("<urn:uuid:")


def test_response_records_split_http(tmp_path):
    rs = recs(3, warc_type="response")
    for r in rs:
        r["content_type"] = "text/html"
        r["payload"] = f"<html><body>{r['text']}</body></html>".encode()
    p = str(tmp_path / "r.warc.gz")
    warc.write_warc_file(rs, p)
    got = list(warc.iter_warc_records(p))
    for r, g in zip(rs, got):
        assert g["http_status"] == 200
        assert g["content_type"] == "text/html"
        assert g["payload"] == r["payload"]  # HTTP headers stripped
        assert g["text"] == r["payload"].decode()  # text/* decodes


def test_writer_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a.gz"), str(tmp_path / "b.gz")
    warc.write_warc_file(recs(4), a)
    warc.write_warc_file(recs(4), b)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_per_record_gzip_members_and_magic_detection(tmp_path):
    p = str(tmp_path / "multi.warc.gz")
    warc.write_warc_file(recs(4), p)
    # 4 separate gzip members (CC layout): magic appears 4 times
    raw = open(p, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") == 4
    # extension is irrelevant — magic detection
    p2 = str(tmp_path / "renamed.warc")
    open(p2, "wb").write(raw)
    assert len(list(warc.iter_warc_records(p2))) == 4


def test_truncated_record_raises(tmp_path):
    p = str(tmp_path / "t.warc")
    warc.write_warc_file(recs(2), p, compress=False)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-10])
    with pytest.raises(ValueError, match="truncated"):
        list(warc.iter_warc_records(p))


def test_read_warc_dataframe_and_wet_view(spark, tmp_path):
    files = []
    for f in range(3):
        p = str(tmp_path / f"seg-{f}.warc.gz")
        rows = recs(6)
        for r in rows:
            r["url"] += f"?seg={f}"
        warc.write_warc_file(rows, p)
        files.append(p)
    df = warc.read_warc(spark, str(tmp_path / "seg-*.warc.gz"))
    assert df.schema == warc.WARC_SCHEMA
    out = df.collect()
    assert len(out) == 18
    assert {r["warc_file"] for r in out} == set(files)
    assert all(r["text"].startswith("document ") for r in out)
    # per-file record ordering preserved
    by_file = {}
    for r in out:
        by_file.setdefault(r["warc_file"], []).append(r["rec_idx"])
    for idxs in by_file.values():
        assert sorted(idxs) == list(range(6))
    wet = warc.read_wet(spark, files)
    assert wet.count() == 18
    assert set(wet.columns) == {"url", "warc_date", "text", "warc_file", "rec_idx"}


def test_read_warc_batches_bound_memory(spark, tmp_path):
    """batch_rows caps Arrow batch size: 10 records at batch_rows=3
    arrive in ceil(10/3)=4 batches (observed via a partition-count
    invariant on the pandas side is not visible here, so assert the
    data is complete and correct instead — the bound is structural)."""
    p = str(tmp_path / "big.warc.gz")
    warc.write_warc_file(recs(10), p)
    df = warc.read_warc(spark, p, batch_rows=3)
    assert df.count() == 10


def test_mixed_stream_with_warcinfo(tmp_path):
    """Non-content record types are preserved and typed."""
    rs = [{"url": None, "date": "2024-01-01T00:00:00Z",
           "payload": b"software: feast_spark", "warc_type": "warcinfo",
           "content_type": "application/warc-fields"}] + recs(2)
    p = str(tmp_path / "m.warc.gz")
    warc.write_warc_file(rs, p)
    got = list(warc.iter_warc_records(p))
    assert got[0]["warc_type"] == "warcinfo"
    assert got[0]["text"] is None and got[0]["payload"] == b"software: feast_spark"
    assert [g["warc_type"] for g in got[1:]] == ["conversion", "conversion"]


def test_missing_file_raises(spark):
    with pytest.raises(FileNotFoundError):
        warc.read_warc(spark, ["/nope/missing.warc"])
    with pytest.raises(ValueError):
        warc.read_warc(spark, [])
