"""Vector-search serving surface: FeatureSpec(vector_index=True) →
build_vector_index → retrieve_online_documents (upstream Feast's
vector-online-store API shape)."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feast_spark.registry import Entity, FeatureSpec, FeatureStore, FeatureView

DIM = 8


def vec(direction: int, wiggle: float = 0.0, flip: bool = False):
    """Unit-ish vector near axis ``direction`` with a small off-axis
    component — deterministic."""
    v = [wiggle * math.sin(i + direction) for i in range(DIM)]
    v[direction % DIM] = -1.0 if flip else 1.0
    return v


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vecstore"))
    rows = []
    # 30 entities in 3 clusters (axis 0/2/4), one row each
    for i in range(30):
        rows.append(
            (f"d{i}", "2024-01-01 00:00:00", vec(2 * (i % 3), 0.05 * (i % 7)),
             float(i))
        )
    # entity "stale": OLD row points at axis 0, NEW row at axis 4 —
    # the index must see only the new one
    rows.append(("stale", "2024-01-01 00:00:00", vec(0), 99.0))
    rows.append(("stale", "2024-02-01 00:00:00", vec(4), 100.0))
    df = spark.createDataFrame(
        rows, "doc_id string, ts string, embedding array<double>, score double"
    ).select(
        "doc_id", F.col("ts").cast("timestamp").alias("ts"),
        "embedding", "score",
    )
    src = str(tmp_path_factory.mktemp("vecsrc") / "docs.parquet")
    df.write.parquet(src)
    fs = FeatureStore(spark, root=root)
    fs.apply(
        FeatureView(
            name="docs",
            entity=Entity("doc", "doc_id"),
            source=src,
            features=[
                FeatureSpec("embedding", "array<double>",
                            vector_index=True, vector_dim=DIM),
                FeatureSpec("score", "double"),
            ],
            timestamp_field="ts",
        )
    )
    fs.build_vector_index("docs", corpus_count=31, seed=11)
    return fs


def test_retrieve_topk_finds_planted_cluster(store):
    got = store.retrieve_online_documents("docs", vec(0), top_k=5).collect()
    assert len(got) == 5
    # rank-1 is an exact axis-0 vector (d0/d3/... have wiggle 0 at i%7==0)
    assert got[0]["distance"] == pytest.approx(1.0, abs=1e-6)
    # every returned doc is from the axis-0 cluster (ids ≡ 0 mod 3)
    for r in got:
        assert int(r["doc_id"][1:]) % 3 == 0
    # distances are sorted descending
    ds = [r["distance"] for r in got]
    assert ds == sorted(ds, reverse=True)


def test_index_uses_latest_embedding_per_key(store):
    """'stale' now points at axis 4: it must surface for an axis-4
    query and must NOT surface for axis-0 even though its OLD row
    matched axis 0 exactly."""
    near4 = store.retrieve_online_documents("docs", vec(4), top_k=12).collect()
    assert "stale" in {r["doc_id"] for r in near4}
    near0 = store.retrieve_online_documents("docs", vec(0), top_k=10).collect()
    assert "stale" not in {r["doc_id"] for r in near0}


def test_enrichment_from_online_store(store, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("vec") / "online")
    store.materialize(
        "docs", datetime(2023, 1, 1), datetime(2024, 6, 1), dest, n_buckets=2
    )
    got = store.retrieve_online_documents(
        "docs", vec(2), top_k=3, store_path=dest, features=["score"]
    ).collect()
    assert len(got) == 3
    for r in got:
        assert r["score"] == float(r["doc_id"][1:])  # served value joined


def test_registry_roundtrip_preserves_vector_fields(spark, store):
    fs2 = FeatureStore(spark, root=store.root)
    spec = fs2.get_view("docs").vector_feature()
    assert spec.name == "embedding" and spec.vector_dim == DIM
    assert spec.similarity == "cosine"


def test_vector_feature_validation(spark):
    v = FeatureView(
        name="x", entity=Entity("d", "id"), source="/nope",
        features=[FeatureSpec("a", "double")], timestamp_field="ts",
    )
    with pytest.raises(ValueError, match="no vector_index"):
        v.vector_feature()
    v2 = FeatureView(
        name="x", entity=Entity("d", "id"), source="/nope",
        features=[FeatureSpec("a", "array<double>", vector_index=True)],
        timestamp_field="ts",
    )
    with pytest.raises(ValueError, match="vector_dim"):
        v2.vector_feature()
