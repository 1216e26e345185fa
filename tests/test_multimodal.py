"""Multimodal plumbing semantics (schema, batching, determinism — the
codec itself is a stubbed deterministic fake; see operators.multimodal)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.multimodal import (
    _fake_decode,
    decode_features,
    frame_sample,
    media_metadata,
    resize_features,
)


@pytest.fixture()
def payloads(spark):
    rows = [
        (1, b"\x89PNG" + b"x" * 1000),
        (2, b"RIFF" + bytes(range(256)) * 3),
        (3, b"plain text payload " * 40),
        (4, None),
    ]
    return spark.createDataFrame(rows, "id int, payload binary")


def test_metadata_sniff_and_nulls(spark, payloads):
    out = {r["id"]: r["meta"] for r in media_metadata(payloads).collect()}
    assert out[1]["kind"] == "image" and out[1]["magic"] == "png"
    assert out[2]["kind"] == "audio"
    assert out[3]["kind"] == "unknown"
    assert out[4] is None
    assert out[1]["n_bytes"] == 1004


def test_decode_features_deterministic(spark, payloads):
    a = decode_features(payloads).select("id", "px_mean", "px_feat8").collect()
    b = decode_features(payloads).select("id", "px_mean", "px_feat8").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    row = {r["id"]: r for r in a}
    # fake decode = byte histogram: verify against numpy directly
    arr = _fake_decode(b"\x89PNG" + b"x" * 1000).astype("float64")
    assert abs(row[1]["px_mean"] - arr.mean()) < 1e-9
    assert row[4]["px_mean"] is None


def test_resize_block_mean(spark, payloads):
    out = {r["id"]: r["px_resized"] for r in resize_features(payloads).collect()}
    assert out[4] is None
    arr = _fake_decode(b"plain text payload " * 40).astype("float64")
    want = [
        float(arr[i * 4 : (i + 1) * 4, j * 4 : (j + 1) * 4].mean())
        for i in range(4)
        for j in range(4)
    ]
    assert np.allclose(out[3], want, rtol=1e-6)
    assert len(out[1]) == 16


def test_resize_strict_requires_codec(spark, payloads):
    with pytest.raises(NotImplementedError):
        resize_features(payloads, strict=True)


def test_frame_sample_counts(spark, payloads):
    out = frame_sample(payloads, every_n_bytes=256, max_frames=3).toPandas()
    per_id = out.groupby("id")["frame_idx"].count()
    # id1: 1004B → 3 frames (capped); id2: 768B → 3; id3: 760B → 2
    assert per_id[1] == 3 and per_id[2] == 3 and per_id[3] == 2
    assert 4 not in per_id.index  # NULL payload emits no frames
    first = out[(out.id == 2) & (out.frame_idx == 0)]["frame_bytes"].iloc[0]
    assert bytes(first)[:4] == b"RIFF" and len(first) == 256
