"""WARC / WET ingestion (SURVEY.md §2 S-family — the entry format of a
Common-Crawl-style corpus; ISO 28500 WARC/1.0/1.1).

Design (scale-first):

- The unit of parallelism is the WARC FILE: crawl archives ship as many
  ~100 MiB-1 GiB `.warc.gz` segments, so `read_warc` turns the file
  LIST into a DataFrame (one row per file, repartitioned to one file
  per task) and parses inside ``mapInPandas``. Each task STREAMS its
  file — gzip members decode incrementally and records are yielded in
  bounded batches — so task memory is O(batch), never O(file). This
  deliberately avoids ``spark.read.format("binaryFile")``, which
  materializes the whole archive as one JVM row and ships a GiB-sized
  cell across the Arrow boundary.
- Record-level gzip (how Common Crawl writes: one gzip member per
  record, concatenated) and whole-file gzip both decode through the
  same multi-member stream; uncompressed `.warc` works too.
- `response` records carry an HTTP message in the block: the status
  line and headers are split off (status + Content-Type surfaced as
  columns), payload = the HTTP body. `conversion` records (WET) and
  `resource` records carry the payload directly and surface a decoded
  ``text`` column. Other record types (warcinfo, request, metadata)
  are preserved with their raw payload — filter on ``warc_type``.
- Everything downstream (extraction, dedup, quality, layout writes)
  consumes the returned DataFrame; the durable home after ingestion is
  ``sources.pages.write_table`` (parquet + manifest), exactly like the
  reference pipeline's fetch → extract → store flow.

The local opener is plain ``open()``; on a cluster the same code path
reads from shared storage via a mounted FS, and an object-store opener
(fsspec-style) slots into ``_open_stream`` without touching the parser.

`write_warc_file` is the deterministic fixture writer (tests, driver
round-trip query, and a migration-shaped export path) — records in,
spec-compliant WARC out, byte-stable for identical input.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import logging
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = logging.getLogger(__name__)

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("rec_idx", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_date", T.TimestampType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

_CRLF = b"\r\n"


# -------------------------------------------------------------- parser --


def _open_stream(path: str):
    """Binary stream for a local/mounted path; gzip (incl. concatenated
    members — Python's gzip reads multi-member streams natively) is
    detected by magic bytes, not extension, so `.warc.gz` named `.warc`
    still decodes."""
    raw = open(path, "rb")
    head = raw.read(2)
    raw.seek(0)
    if head == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=raw)
    return raw


def _read_headers(stream) -> dict[str, str] | None:
    """Read one WARC header block: the WARC/ version line then
    name:value lines until the blank line. Returns None at EOF."""
    line = stream.readline()
    while line in (_CRLF, b"\n"):  # tolerate stray blank lines
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"expected WARC version line, got {line[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = stream.readline()
        if line in (_CRLF, b"\n", b""):
            return headers
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP message block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(b"\r\n")
    status = None
    parts = lines[0].split(b" ")
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            if k.decode("ascii", "replace").strip().lower() == "content-type":
                ctype = v.decode("utf-8", "replace").strip()
                break
    return status, ctype, body


def iter_warc_records(path: str) -> Iterator[dict]:
    """Stream (header, payload)-parsed records from one WARC file.
    Memory is O(largest single record)."""
    with _open_stream(path) as stream:
        idx = 0
        while True:
            headers = _read_headers(stream)
            if headers is None:
                return
            length = int(headers.get("content-length", "0"))
            block = stream.read(length)
            if len(block) != length:
                raise ValueError(
                    f"{path}: truncated record {idx} "
                    f"(wanted {length} bytes, got {len(block)})"
                )
            wtype = headers.get("warc-type")
            block_ct = headers.get("content-type", "")
            status = None
            payload = block
            ctype = block_ct or None
            if wtype == "response" and block_ct.startswith(
                "application/http"
            ):
                status, ctype, payload = _split_http(block)
            text = None
            if wtype in ("conversion", "resource") or (
                ctype or ""
            ).startswith("text/"):
                text = payload.decode("utf-8", "replace")
            date = headers.get("warc-date")
            ts = pd.Timestamp(date) if date else None
            if ts is not None and ts.tzinfo is not None:
                ts = ts.tz_convert(None)  # naive UTC (session convention)
            yield {
                "rec_idx": idx,
                "warc_type": wtype,
                "url": headers.get("warc-target-uri"),
                "warc_date": ts,
                "record_id": headers.get("warc-record-id"),
                "content_type": ctype,
                "http_status": status,
                "payload": payload,
                "text": text,
            }
            idx += 1


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    batch_rows: int = 256,
) -> DataFrame:
    """WARC/WET files → DataFrame[WARC_SCHEMA]. One task per file (see
    module docstring); ``batch_rows`` bounds Arrow batch size — web
    payloads are KiB-to-MiB, so 256 records ≈ tens of MiB per batch."""
    if isinstance(paths, str):
        expanded = sorted(_glob.glob(paths)) or [paths]
    else:
        expanded = sorted(paths)
    if not expanded:
        raise ValueError("read_warc: no input files")
    missing = [p for p in expanded if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(f"read_warc: missing {missing[:3]}")
    files = spark.createDataFrame(
        [(p,) for p in expanded], "path string"
    ).repartition(len(expanded), "path")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in it:
            for path in pdf["path"]:
                buf: list[dict] = []
                for rec in iter_warc_records(path):
                    rec["warc_file"] = path
                    buf.append(rec)
                    if len(buf) >= batch_rows:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=cols)

    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def read_wet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """WET convenience view: conversion records only, the columns a text
    pipeline starts from."""
    return (
        read_warc(spark, paths)
        .filter(F.col("warc_type") == "conversion")
        .select("url", "warc_date", "text", "warc_file", "rec_idx")
    )


# ----------------------------------------------------------- streaming --


def stream_warc_dir(
    spark: SparkSession,
    path: str,
    dest_root: str,
    *,
    checkpoint: str,
    key_col: str = "url",
    ts_col: str = "warc_date",
    n_buckets: int = 64,
    max_files_per_trigger: int | None = None,
    transform=None,
    available_now: bool = True,
):
    """Continuous crawl ingestion: new WARC segments dropped into
    ``path`` flow into a layout table at ``dest_root``.

    File DISCOVERY rides Spark's file-stream source (checkpointed,
    exactly-once file tracking, ``maxFilesPerTrigger`` backpressure) —
    but only the ``path`` column is ever projected, so the binaryFile
    source never reads segment bytes into JVM rows. Each micro-batch
    collects its bounded file-NAME list (≤ maxFilesPerTrigger strings),
    parses those segments through the same streaming ``read_warc``
    tasks as batch, applies ``transform`` (e.g. read-WET projection,
    quality filters), and APPENDS to the layout table through the CAS
    commit machinery.

    Exactly-once across crashes AND checkpoint resets: every append
    commits the batch's segment list into its snapshot ``summary``
    (``warc_segments`` — atomic with the commit itself, no side-channel
    ledger to lose in a crash window), and each micro-batch ingests only
    the set difference against the union of all committed lists. A
    replayed batch (crash before the checkpoint committed) is a pure
    no-op; a FRESH checkpoint whose restarted batch 0 mixes old and new
    segments ingests exactly the new ones (r04 review — a batch-id-keyed
    ledger would have skipped them). Retention note: ``expire_snapshots``
    drops expired summaries with their snapshots — keep the checkpoint
    (the primary dedup) or retain snapshots covering the re-presentable
    segment window.
    """
    from feast_spark.sources import pages as layout
    from feast_spark.sources.pages import is_table, read_table, write_table

    reader = (
        spark.readStream.format("binaryFile")
        # binaryFile's fixed schema, stated explicitly (streaming sources
        # don't infer); content is never projected below, so bytes are
        # never read by the discovery stream
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path")

    def ingest(batch_df, batch_id: int) -> None:
        paths = sorted(
            r["path"].removeprefix("file:") for r in batch_df.collect()
        )
        if not paths:
            return
        done: set[str] = set()
        if is_table(dest_root):
            for snap in layout.iter_snapshots(dest_root):
                done.update(
                    snap.get("summary", {}).get("warc_segments", [])
                )
        # tables ingested by the pre-summary code carry only the legacy
        # batch-id ledger (no file lists anywhere, so their segments can
        # never enter `done`). Honor it for PURE replays and REFUSE
        # otherwise: the ledger can't say which of the presented files
        # were ingested, so both skipping (drops new segments) and
        # diffing (double-ingests legacy segments) silently corrupt
        # (r04 review batches 3+4). Replay plausibility (ADVICE r04 —
        # count equality alone is spoofable by a reset checkpoint whose
        # restarted batch presents the SAME NUMBER of different,
        # never-ingested segments):
        #   1. records that carry a file list compare the presented
        #      path set exactly;
        #   2. count-only records get the decisive CONTENT check: parse
        #      the presented segments (same tasks as ingest would run)
        #      and anti-join their post-transform (key, ts) pairs
        #      against the table — a pure replay's rows all already
        #      exist (skipping loses nothing), while any missing pair
        #      proves never-ingested data and forces the refuse path.
        #      Metadata heuristics (mtime) are spoofable by mv/rsync -a
        #      preserved timestamps; row membership is not. Cost: one
        #      batch-bounded job, only on this rare legacy path.
        legacy = os.path.join(
            dest_root, "_stream_ingest", f"batch-{batch_id}.json"
        )
        if os.path.exists(legacy):
            import json as _json

            with open(legacy) as f:
                rec = _json.load(f)
            presented_new = [p for p in paths if p not in done]
            rec_paths = rec.get("paths")
            if rec_paths is not None:
                plausible = set(rec_paths) == set(presented_new)
                why = "file list differs from the presented set"
            elif rec.get("n_files") != len(presented_new):
                plausible = False
                why = (
                    f"count mismatch (ledger {rec.get('n_files')}, "
                    f"presented {len(presented_new)})"
                )
            else:
                probe = read_warc(spark, presented_new)
                if transform is not None:
                    probe = transform(probe)
                # eqNullSafe keys (r05 review batch 2): without a
                # transform, real WARCs yield NULL-url rows (warcinfo
                # records have no WARC-Target-URI) — a null-unsafe
                # anti-join would brand the genuine replay "absent
                # from the table" forever
                pr = probe.select(key_col, ts_col).distinct().alias("p")
                tb = (
                    read_table(spark, dest_root)
                    .select(key_col, ts_col).distinct().alias("t")
                )
                cond = (
                    F.col(f"p.{key_col}").eqNullSafe(F.col(f"t.{key_col}"))
                ) & (F.col(f"p.{ts_col}").eqNullSafe(F.col(f"t.{ts_col}")))
                missing = pr.join(tb, cond, "left_anti").limit(1).count()
                plausible = missing == 0
                why = (
                    "presented segments contain rows absent from the "
                    "table (not a replay)"
                )
            if plausible:
                _LOG.warning(
                    "stream_warc_dir: batch %d skipped via the legacy "
                    "ledger %s; re-ingest into a fresh table to gain "
                    "per-segment exactly-once",
                    batch_id, legacy,
                )
                return
            raise RuntimeError(
                f"batch {batch_id} presents {len(presented_new)} "
                f"unaccounted segments that do not look like a replay "
                f"of legacy ledger {legacy} ({why}) — a reset "
                "checkpoint over a legacy-ingested table cannot be "
                "safely diffed (the old ledger has no trustworthy file "
                "lists); re-ingest into a fresh table or restore the "
                "original checkpoint"
            )
        new = [p for p in paths if p not in done]
        if not new:
            return  # replay, or a reset checkpoint re-presenting old files
        df = read_warc(spark, new)
        if transform is not None:
            df = transform(df)
        write_table(
            df, dest_root, key_col=key_col, ts_col=ts_col,
            n_buckets=n_buckets,
            mode="append" if is_table(dest_root) else "overwrite",
            properties={
                "warc_batch": str(batch_id),
                "warc_segments": new,
            },
        )

    writer = (
        files.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -------------------------------------------------------------- writer --


def _ser_record(
    *,
    warc_type: str,
    url: str | None,
    date: str,
    payload: bytes,
    content_type: str,
    record_id: str,
    http_headers: list[tuple[str, str]] | None = None,
    http_status: int = 200,
) -> bytes:
    if http_headers is not None:
        head = [f"HTTP/1.1 {http_status} OK".encode()]
        head += [f"{k}: {v}".encode() for k, v in http_headers]
        block = _CRLF.join(head) + _CRLF * 2 + payload
        block_ct = 'application/http; msgtype=response'
    else:
        block = payload
        block_ct = content_type
    hdr = [
        b"WARC/1.0",
        f"WARC-Type: {warc_type}".encode(),
        f"WARC-Date: {date}".encode(),
        f"WARC-Record-ID: {record_id}".encode(),
        f"Content-Type: {block_ct}".encode(),
        f"Content-Length: {len(block)}".encode(),
    ]
    if url:
        hdr.insert(2, f"WARC-Target-URI: {url}".encode())
    return _CRLF.join(hdr) + _CRLF * 2 + block + _CRLF * 2


def write_warc_file(
    records: list[dict],
    path: str,
    compress: bool = True,
) -> None:
    """Deterministic fixture/export writer. ``records``: dicts with
    url, date (ISO 8601 Z), payload (bytes) or text (str), and optional
    warc_type ('response' with synthesized HTTP headers, 'conversion'
    for WET-style), content_type. Record ids derive from uuid5 of
    (url, date, index) — identical input ⇒ identical bytes. ``compress``
    writes one gzip member PER RECORD (mtime=0), the Common-Crawl
    layout that keeps archives seekable/splittable."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        wtype = r.get("warc_type", "conversion")
        payload = r.get("payload")
        if payload is None:
            payload = (r.get("text") or "").encode()
        rid = "<urn:uuid:%s>" % uuid.uuid5(
            uuid.NAMESPACE_URL, f"{r.get('url')}|{r.get('date')}|{i}"
        )
        raw = _ser_record(
            warc_type=wtype,
            url=r.get("url"),
            date=r["date"],
            payload=payload,
            content_type=r.get("content_type", "text/plain"),
            record_id=rid,
            http_headers=(
                [("Content-Type", r.get("content_type", "text/html"))]
                if wtype == "response"
                else None
            ),
            http_status=r.get("http_status", 200),
        )
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(raw)
            out.write(buf.getvalue())
        else:
            out.write(raw)
    from feast_spark.sources.fileio import FileIO

    FileIO().makedirs(os.path.dirname(path) or ".")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
