"""Dedup + similarity semantics (planted-duplicate recall / precision —
the checks the rows-only driver queries can't make)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.dedupe import (
    fingerprint_dedup_stats,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from feast_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark, pages_tbl):
    """~300 docs + 30 planted near-dups (last token dropped) + 5 exact."""
    base = (
        spark.createDataFrame(pages_tbl.to_pandas())
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
        .filter(F.length("text") > 100)
        .limit(300)
        .cache()
    )
    near = base.limit(30).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, size(split(text, ' ')) - 1))"
        ).alias("text"),
    )
    exact = base.limit(5).select(
        (F.col("doc_id") + 200_000).alias("doc_id"), "text"
    )
    return base.unionByName(near).unionByName(exact).cache()


def test_minhash_finds_planted_near_dups(spark, docs):
    pairs = minhash_near_dup_pairs(
        docs, threshold=0.8, num_hashes=64, bands=16, shingle_k=3
    ).toPandas()
    planted_near = {
        (a, a + 100_000) for a in
        [r["doc_id"] for r in docs.filter(F.col("doc_id") < 30).collect()]
    }
    found = {(min(a, b), max(a, b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    # recall on planted near-dups (64 hashes / 16 bands at j>=0.8: high)
    hit = sum(1 for p in planted_near if p in found)
    assert hit >= int(0.9 * len(planted_near)), (hit, len(planted_near))
    # every reported pair is exact-verified ≥ threshold
    assert (pairs["jaccard"] >= 0.8).all()


def test_minhash_no_unrelated_pairs(spark, docs):
    """Distinct random docs must not exceed the verified threshold."""
    pairs = minhash_near_dup_pairs(
        docs, threshold=0.8, num_hashes=64, bands=16, shingle_k=3
    ).toPandas()
    for a, b in zip(pairs.id_a, pairs.id_b):
        assert (b - a) in (100_000, 200_000), (a, b)


def test_ngram_jaccard_is_exact_superset_of_minhash(spark, docs):
    """Exact inverted-index Jaccard finds everything MinHash-LSH finds
    (LSH can only miss, never invent)."""
    mh = minhash_near_dup_pairs(
        docs, threshold=0.8, num_hashes=64, bands=16, shingle_k=3
    ).select("id_a", "id_b")
    ex = ngram_jaccard_pairs(docs, threshold=0.8, shingle_k=3).select(
        "id_a", "id_b"
    )
    assert mh.exceptAll(ex).count() == 0
    assert ex.count() >= mh.count()


def test_simhash_finds_exact_and_near(spark, docs):
    pairs = simhash_near_dup_pairs(docs, max_hamming=3).toPandas()
    found = {(min(a, b), max(a, b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    exact_ids = [r["doc_id"] for r in docs.filter(F.col("doc_id") < 5).collect()]
    for a in exact_ids:  # exact copies: hamming 0 — must all be found
        assert (a, a + 200_000) in found
    assert (pairs["hamming"] <= 3).all()


def test_fingerprint_clusters_exact_only(spark, docs):
    stats = fingerprint_dedup_stats(docs).toPandas()
    # 5 exact-dup clusters of size 2; near-dups must NOT cluster
    assert (stats["n_copies"] == 2).sum() == 5
    assert (stats["n_copies"] > 2).sum() == 0


def test_lsh_topk_recall_vs_brute_force(spark):
    import numpy as np

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((400, 16)).astype("float32")
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=10).toPandas()
    # single-table is the low-recall baseline; OR-amplified multi-table
    # (VERDICT r01 #8) must beat it substantially on the same data
    single = lsh_topk(
        corpus, queries, dim=16, k=10, n_bits=4, n_tables=1
    ).toPandas()
    multi = lsh_topk(
        corpus, queries, dim=16, k=10, n_bits=4, n_tables=8
    ).toPandas()
    e = exact.groupby("query_id")["vec_id"].apply(set)

    def mean_recall(approx):
        a = approx.groupby("query_id")["vec_id"].apply(set)
        rs = [len(e[q] & a.get(q, set())) / 10 for q in e.index]
        return sum(rs) / len(rs)

    r1, r8 = mean_recall(single), mean_recall(multi)
    assert r8 >= 0.8, (r1, r8)
    assert r8 > r1, (r1, r8)


def test_lsh_topk_recall_on_embeddings_table(spark):
    """Recall ≥0.9 at k=10 on the driver's embeddings fixture (64-dim,
    10 planted label clusters) with banded OR-amplification — the
    VERDICT r01 #8 acceptance bar."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, queries, k=10).toPandas()
    approx = lsh_topk(
        emb, queries, dim=64, k=10, n_bits=3, n_tables=12
    ).toPandas()
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / 10 for q in e.index]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_embedding_near_dup_lsh_matches_exact_for_identicals(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 16)).astype("float32")
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    rows += [(i + 1000, v.tolist()) for i, v in enumerate(vecs[:40])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = embedding_near_dup_pairs(corpus, threshold=0.9999, exact=True).toPandas()
    lsh = embedding_near_dup_pairs(
        corpus, threshold=0.9999, dim=16, n_bits=6
    ).toPandas()
    # identical vectors always share every sign bucket → LSH == exact
    assert set(zip(exact.id_a, exact.id_b)) == set(zip(lsh.id_a, lsh.id_b))
    assert len(exact) == 40


def test_ngram_stop_shingle_cap(spark):
    """A universal shingle shared by EVERY doc must not generate
    quadratic candidates: with the df cap it is dropped from the inverted
    index, while true near-dup pairs (sharing rare shingles) keep their
    EXACT jaccard score."""
    from pyspark.sql import Row

    header = "of the and"  # universal 3-token shingle
    docs = [
        Row(doc_id=i, text=f"{header} unique{i} body{i} words{i} tail{i}")
        for i in range(50)
    ]
    # planted near-dup pair: same body, one trailing token changed
    docs.append(Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta"))
    docs.append(Row(doc_id=101, text="alpha beta gamma delta epsilon zeta theta"))
    df = spark.createDataFrame(docs)

    pairs = ngram_jaccard_pairs(
        df, threshold=0.5, shingle_k=3, max_shingle_df=5
    ).toPandas()
    # the 50 header-only docs share nothing rare → no pairs among them
    assert set(map(tuple, pairs[["id_a", "id_b"]].values)) == {(100, 101)}
    # exact jaccard on the planted pair: 5 shingles each, 4 shared
    got = float(pairs["jaccard"].iloc[0])
    assert abs(got - 4 / 6) < 1e-9
    # without the cap the header docs pair up quadratically (sanity that
    # the cap is what bounds it)
    uncapped = ngram_jaccard_pairs(
        df, threshold=0.01, shingle_k=3, max_shingle_df=10_000
    ).count()
    capped = ngram_jaccard_pairs(
        df, threshold=0.01, shingle_k=3, max_shingle_df=5
    ).count()
    assert uncapped >= 50 * 49 / 2 and capped == 1


def test_connected_components_and_keepers(spark):
    """Pairwise matches -> dedup clusters: planted chains/cliques resolve
    to min-id components; keeper selection keeps exactly one per
    component plus all singletons."""
    from pyspark.sql import Row

    from feast_spark.operators.dedupe import connected_components, near_dup_keepers

    # chain 1-2-3-4, clique 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11), Row(id_a=10, id_b=12), Row(id_a=11, id_b=12),
         Row(id_a=20, id_b=21)]
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [Row(doc_id=i) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]]
    )
    k = near_dup_keepers(docs, pairs).toPandas().set_index("doc_id")
    assert set(k[k["keep"]].index) == {1, 10, 20, 99}
    assert k.loc[99, "component"] == 99  # singleton keeps itself
