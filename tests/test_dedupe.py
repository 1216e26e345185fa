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


def test_connected_components_single_action_per_round(spark, monkeypatch):
    """VERDICT r02 next #3: the changed-flag rides the label-update pass
    as an ``observe`` metric, so each propagation round runs exactly ONE
    action (the eager localCheckpoint) — the old separate
    join+limit(1).count() change detector is gone. Chain 0-1-2-3-4 needs
    4 propagation rounds + 1 quiescent round; actions = 2 init
    checkpoints + 5 round checkpoints, and zero count() calls.
    (Raw Spark job ids are no proxy here: AQE splits one action into a
    job per query stage.)"""
    from pyspark.sql import Row
    # patch the CONCRETE class: pyspark.sql.DataFrame is the abstract
    # parent in Spark 4 and its methods are overridden, not inherited
    from pyspark.sql.classic.dataframe import DataFrame

    from feast_spark.operators.dedupe import connected_components

    counts, ckpts = [], []
    orig_count = DataFrame.count
    orig_ckpt = DataFrame.localCheckpoint

    def spy_count(self):
        counts.append(1)
        return orig_count(self)

    def spy_ckpt(self, *a, **kw):
        ckpts.append(1)
        return orig_ckpt(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "count", spy_count)
    monkeypatch.setattr(DataFrame, "localCheckpoint", spy_ckpt)
    pairs = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(4)]
    )
    labels = connected_components(pairs)
    assert counts == [], "change detection must not run a separate count()"
    assert len(ckpts) == 2 + 5  # init edges+labels, then one per round
    monkeypatch.undo()
    comp = {r["id"]: r["component"] for r in labels.collect()}
    assert comp == {i: 0 for i in range(5)}


def test_connected_components_non_convergence_raises(spark):
    from pyspark.sql import Row

    from feast_spark.operators.dedupe import connected_components

    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(6)])
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_lsh_topk_shuffle_path_at_scale(spark):
    """VERDICT r02 next #8: above broadcast_threshold queries, lsh_topk
    must NOT broadcast the query side (batch ANN with millions of probes
    would OOM the broadcast) — and the shuffle plan's top-k must be
    identical to the broadcast plan's."""
    from feast_spark.operators.similarity import lsh_topk

    dim = 16

    def vecs(df, id_name):
        return df.select(
            F.col("id").alias(id_name),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.sin(F.col("id") * 0.7 + i * 1.3).cast("float"),
            ).alias("embedding"),
        )

    corpus = vecs(spark.range(300), "vec_id")
    queries = vecs(spark.range(100_001), "query_id")

    big = lsh_topk(corpus, queries, dim=dim, k=3, n_bits=4, n_tables=2)
    # auto-decision: >100k queries → no broadcast hint in the plan
    assert "broadcast" not in big._jdf.queryExecution().analyzed().toString().lower()
    small = lsh_topk(
        corpus, vecs(spark.range(50), "query_id"), dim=dim, k=3,
        n_bits=4, n_tables=2,
    )
    assert "broadcast" in small._jdf.queryExecution().analyzed().toString().lower()

    # identical results on a subset either way (same candidates, same
    # dedup + ranking — only the join strategy differs)
    sub = vecs(spark.range(500), "query_id")
    a = lsh_topk(corpus, sub, dim=dim, k=3, n_bits=4, n_tables=2,
                 broadcast_queries=True)
    b = lsh_topk(corpus, sub, dim=dim, k=3, n_bits=4, n_tables=2,
                 broadcast_queries=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hyperplane_signature_plan_stays_small_at_dim_512(spark):
    """VERDICT r02 next #4: planes are ONE nested-array literal, not
    dim×bits×tables scalar literals — the analyzed plan at dim=512 must
    stay far below the old ~16k-node blowup (string length is a coarse
    but monotone proxy)."""
    import time

    from feast_spark.operators.similarity import (
        hyperplane_signature,
        make_planes,
    )

    df = spark.range(4).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(511)),
            lambda i: F.sin(F.col("id") + i).cast("float"),
        ).alias("v")
    )
    t0 = time.monotonic()
    sig = df.select(
        hyperplane_signature(F.col("v"), make_planes(512, 8, 42)).alias("sig")
    )
    rows = sig.collect()
    assert len(rows) == 4 and all(r["sig"] is not None for r in rows)
    # analysis+execution of 4 rows must be interactive, not minutes
    assert time.monotonic() - t0 < 60


def test_star_cc_equals_min_label(spark):
    """Alternating large/small-star CC (O(log² n) rounds) must produce
    identical components to min-label propagation on chains, cliques,
    stars, and seeded random graphs."""
    import random

    from pyspark.sql import Row

    from feast_spark.operators.dedupe import (
        connected_components,
        connected_components_star,
    )

    cases = {
        "chain+clique+pair": [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12),
                              (11, 12), (20, 21)],
        "long_chain": [(i, i + 1) for i in range(40)],
        "star": [(0, i) for i in range(1, 15)],
    }
    rng = random.Random(42)
    cases["random_sparse"] = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(50)
    ]
    cases["random_sparse"] = [(a, b) for a, b in cases["random_sparse"] if a != b]

    for name, pairs in cases.items():
        df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in pairs])
        ml = {r["id"]: r["component"]
              for r in connected_components(df, max_iter=60).collect()}
        st = {r["id"]: r["component"]
              for r in connected_components_star(df).collect()}
        assert ml == st, (name, ml, st)


def test_star_cc_fewer_rounds_on_deep_chain(spark, monkeypatch):
    """The point of the star method: a 48-node chain needs ~47 min-label
    rounds but O(log²) star rounds — count via localCheckpoint spies."""
    from pyspark.sql import Row
    from pyspark.sql.classic.dataframe import DataFrame

    from feast_spark.operators.dedupe import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(47)])
    counts = {"n": 0}
    orig = DataFrame.localCheckpoint

    def spy(self, *a, **kw):
        counts["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    connected_components_star(pairs).collect()
    star_ckpts = counts["n"]
    counts["n"] = 0
    connected_components(pairs, max_iter=60).collect()
    ml_ckpts = counts["n"]
    monkeypatch.undo()
    assert star_ckpts < ml_ckpts / 3, (star_ckpts, ml_ckpts)


def test_dedup_spans_removes_cross_doc_boilerplate(spark):
    """C4-style span dedup: a boilerplate footer shared by many docs
    survives exactly once (in the lowest (doc_id, pos)); unique content
    is untouched; rebuild reassembles spans in order."""
    from pyspark.sql import Row

    from feast_spark.operators.text import dedup_spans

    boiler = " ".join(f"b{i}" for i in range(20))  # exactly one span
    rows = [
        Row(doc_id=i, text=" ".join(f"u{i}w{j}" for j in range(20)) + " " + boiler)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    kept = dedup_spans(df, span_tokens=20).toPandas()
    boiler_rows = kept[kept["span"] == boiler]
    assert len(boiler_rows) == 1
    assert boiler_rows.iloc[0]["doc_id"] == 0  # first occurrence wins
    # every doc keeps its unique leading span
    assert kept[kept["pos"] == 1]["doc_id"].nunique() == 5

    rebuilt = dedup_spans(df, span_tokens=20, rebuild=True).toPandas()
    r0 = rebuilt[rebuilt["doc_id"] == 0].iloc[0]
    assert r0["text_dedup"] == rows[0].text  # doc 0 intact, order kept
    r3 = rebuilt[rebuilt["doc_id"] == 3].iloc[0]
    assert boiler not in r3["text_dedup"] and "u3w0" in r3["text_dedup"]


def test_ann_index_serves_identical_to_on_the_fly(spark, tmp_path_factory):
    """VERDICT r03 next #7: a persisted LSH index must serve EXACTLY the
    on-the-fly lsh_topk results (same hyperplane config, persisted with
    the table), and a point lookup must read only the buckets its
    signature keys hash to."""
    from feast_spark.operators.similarity import ann_index_topk, build_ann_index
    from feast_spark.sources.pages import plan_files

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path_factory.mktemp("ann") / "idx")
    build_ann_index(
        emb, root, dim=64, n_bits=5, n_tables=6, n_buckets=32, seed=11
    )

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = ann_index_topk(queries, root, k=7)
    fly = lsh_topk(emb, queries, dim=64, k=7, n_bits=5, n_tables=6, seed=11)
    assert served.exceptAll(fly).count() == 0
    assert fly.exceptAll(served).count() == 0
    assert served.count() == 5 * 7

    # point lookup: 1 query → ≤ n_tables signature keys → ≤ 6 of the 32
    # buckets scanned (manifest pruning, not a full index read)
    one = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    import json as _json

    from feast_spark.operators.similarity import _table_signatures
    from feast_spark.sources.pages import buckets_of_keys

    keys = [
        r["k"]
        for r in one.select(
            F.explode(
                _table_signatures(F.col("embedding"), 64, 5, 6, 11)
            ).alias("ts")
        ).select(
            (F.col("ts.sig") * 6 + F.col("ts.t")).cast("long").alias("k")
        ).collect()
    ]
    bks = buckets_of_keys(spark, keys, 32, key_type="bigint")
    _, pruned = plan_files(root, buckets=bks)
    _, full = plan_files(root)
    assert len(bks) <= 6
    assert len(pruned) < len(full)
    # correctness of the pruned serve itself
    s1 = ann_index_topk(one, root, k=7)
    f1 = lsh_topk(emb, one, dim=64, k=7, n_bits=5, n_tables=6, seed=11)
    assert s1.exceptAll(f1).count() == 0 and f1.exceptAll(s1).count() == 0


def test_probe_all_broadcast_accounts_for_fanout(spark, tmp_path_factory):
    """r05 review: the serving join's broadcast decision must threshold
    the JOIN INPUT (queries × probed keys), not the raw query count —
    probe_all crossJoins every query with all 2^n_bits × n_tables keys,
    so a batch that is broadcastable raw becomes a multi-GB broadcast
    after the blowup. The decision helper is shared by the LSH and both
    IVF serving joins; Catalyst remains free to broadcast the (small)
    INDEX side on its own statistics."""
    from feast_spark.operators.similarity import (
        _broadcast_queries_ok,
        ann_index_topk,
        build_ann_index,
        brute_force_topk,
    )

    # raw-count-broadcastable batch, NOT broadcastable after fan-out
    assert _broadcast_queries_ok(30, 1, 100_000)
    assert not _broadcast_queries_ok(30, 4096, 100_000)  # 2^10 × 4 keys
    assert _broadcast_queries_ok(1, 4096, 100_000)  # point audit lookup
    assert not _broadcast_queries_ok(None, 1, 100_000)  # unestimable

    # the audit mode still equals brute force end-to-end under the
    # shuffle-join decision
    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).select("vec_id", "embedding")
    root = str(tmp_path_factory.mktemp("annb") / "idx")
    build_ann_index(
        emb, root, dim=64, n_bits=10, n_tables=4, n_buckets=8, seed=3
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_index_topk(queries, root, k=3, probe_all=True)
    want = brute_force_topk(emb, queries, k=3)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_lsh_topk_broadcast_decision_uses_fanout(spark, monkeypatch):
    """r05 review batch 2: lsh_topk's auto broadcast decision must route
    through the shared fan-out-aware helper with fan_out = n_tables (its
    query side explodes ×n_tables full-vector rows before the hint)."""
    import numpy as np

    import feast_spark.operators.similarity as sim

    calls = []
    real = sim._broadcast_queries_ok

    def spy(n, fan_out, threshold):
        calls.append((n, fan_out, threshold))
        return real(n, fan_out, threshold)

    monkeypatch.setattr(sim, "_broadcast_queries_ok", spy)
    rng = np.random.default_rng(9)
    rows = [(i, v.tolist()) for i, v in enumerate(rng.standard_normal((50, 8)))]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    sim.lsh_topk(corpus, queries, dim=8, k=3, n_bits=4, n_tables=8).collect()
    assert calls and calls[0][1] == 8  # fan_out == n_tables


def test_incremental_cc_equals_full_recompute(spark):
    """Seeding from yesterday's component table + today's new pairs must
    be row-identical to recomputing CC over the full pair union
    (VERDICT r03 next #9). Cases cover: merging two old components,
    attaching new nodes to an old component, a new-only chain, a pair
    wholly inside one old component (no-op), and a new node smaller than
    every old member (label takeover)."""
    import random

    from pyspark.sql import Row

    from feast_spark.operators.dedupe import (
        connected_components,
        connected_components_incremental,
    )

    old_pairs = [(10, 11), (11, 12), (20, 21), (30, 31), (40, 41)]
    new_cases = {
        "merge_two_old": [(12, 20)],
        "attach_new": [(99, 21), (98, 99)],
        "new_only_chain": [(70, 71), (71, 72)],
        "noop_inside_old": [(10, 12)],
        "label_takeover": [(5, 30)],
        "mixed": [(12, 20), (99, 21), (70, 71), (10, 12), (5, 30), (71, 72)],
    }
    old_df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in old_pairs])
    prev = connected_components(old_df)
    for name, new_pairs in new_cases.items():
        new_df = spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in new_pairs]
        )
        incr = {
            r["id"]: r["component"]
            for r in connected_components_incremental(prev, new_df).collect()
        }
        full = {
            r["id"]: r["component"]
            for r in connected_components(old_df.unionByName(new_df)).collect()
        }
        assert incr == full, (name, incr, full)
        # covers every old id plus every new id, exactly once each
        assert len(incr) == len(full), name


def test_incremental_cc_random_appends_and_star(spark):
    """Randomized appends (seeded) over both CC algorithms: repeated
    incremental folding across three batches equals one full recompute."""
    import random

    from pyspark.sql import Row

    from feast_spark.operators.dedupe import (
        connected_components,
        connected_components_incremental,
    )

    rng = random.Random(7)
    batches = [
        [(rng.randrange(50), rng.randrange(80)) for _ in range(30)]
        for _ in range(3)
    ]
    batches = [[(a, b) for a, b in batch if a != b] for batch in batches]
    dfs = [
        spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in batch])
        for batch in batches
    ]
    prev = connected_components(dfs[0], max_iter=60)
    for algorithm, new_df in (("label", dfs[1]), ("star", dfs[2])):
        prev = connected_components_incremental(
            prev, new_df, algorithm=algorithm, max_iter=60
        ).localCheckpoint()
    incr = {r["id"]: r["component"] for r in prev.collect()}
    full_df = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
    full = {
        r["id"]: r["component"]
        for r in connected_components(full_df, max_iter=60).collect()
    }
    assert incr == full


@pytest.fixture(scope="module")
def mh_index(spark, docs, tmp_path_factory):
    """Persisted MinHash index over the ORIGINAL docs only (the planted
    near/exact dups play the role of today's crawl batch)."""
    from feast_spark.operators.dedupe import build_minhash_index

    old = docs.filter(F.col("doc_id") < 100_000)
    root = str(tmp_path_factory.mktemp("mh") / "idx")
    build_minhash_index(old, root, num_hashes=32, bands=8, shingle_k=3)
    return old, root


def test_minhash_incremental_equals_batch(spark, docs, mh_index):
    """Exact-verified incremental pairs (new batch vs persisted index)
    must be row-identical to the batch operator over old∪new restricted
    to pairs with a new endpoint — same hash config, same threshold."""
    from feast_spark.operators.dedupe import minhash_incremental_pairs

    old, root = mh_index
    new = docs.filter(F.col("doc_id") >= 100_000)
    incr = minhash_incremental_pairs(
        new, root, threshold=0.8, verify="exact", old_docs=old
    ).toPandas()
    full = minhash_near_dup_pairs(
        docs, threshold=0.8, num_hashes=32, bands=8, shingle_k=3
    ).toPandas()
    touching = full[(full.id_a >= 100_000) | (full.id_b >= 100_000)]
    mk = lambda df: {
        (min(a, b), max(a, b), round(j, 6))
        for a, b, j in zip(df.id_a, df.id_b, df.jaccard)
    }
    assert mk(incr) == mk(touching)
    assert len(mk(touching)) > 0  # the comparison is non-vacuous


def test_minhash_incremental_signature_estimate(spark, docs, mh_index):
    """Index-only signature verification: exact copies estimate J=1.0,
    and planted near-dups are recalled at a loose threshold (the
    estimator has sd ≈ sqrt(J(1−J)/32) ≈ 0.07 at J=0.8)."""
    from feast_spark.operators.dedupe import minhash_incremental_pairs

    _, root = mh_index
    new = docs.filter(F.col("doc_id") >= 100_000)
    est = minhash_incremental_pairs(
        new, root, threshold=0.5, verify="signature"
    ).toPandas()
    found = {(min(a, b), max(a, b)): j
             for a, b, j in zip(est.id_a, est.id_b, est.jaccard)}
    exact_ids = sorted(
        r["doc_id"] for r in docs.filter(F.col("doc_id") >= 200_000).collect()
    )
    for e in exact_ids:
        assert found.get((e - 200_000, e)) == 1.0, (e, found.get((e - 200_000, e)))
    near_ids = [r["doc_id"] for r in docs.filter(
        (F.col("doc_id") >= 100_000) & (F.col("doc_id") < 200_000)
    ).collect()]
    hit = sum(1 for n in near_ids if (n - 100_000, n) in found)
    assert hit >= int(0.9 * len(near_ids)), (hit, len(near_ids))


def test_minhash_append_then_next_batch(spark, docs, mh_index, tmp_path):
    """Append day-1's batch into the index, then day-2's batch must see
    BOTH prior days — identical to the batch operator over all three
    corpora restricted to day-2 pairs. Proves the layout-append path
    serves, and chains with incremental CC to the full-recompute
    clustering."""
    import shutil

    from feast_spark.operators.dedupe import (
        append_minhash_index,
        connected_components,
        connected_components_incremental,
        minhash_incremental_pairs,
    )

    old, root0 = mh_index
    root = str(tmp_path / "idx")
    shutil.copytree(root0, root)  # keep the shared fixture pristine
    day1 = docs.filter(F.col("doc_id") >= 100_000)
    day1_pairs = minhash_incremental_pairs(
        day1, root, threshold=0.8, verify="exact", old_docs=old
    ).localCheckpoint()
    append_minhash_index(day1, root)
    day2 = day1.select(
        (F.col("doc_id") + 300_000).alias("doc_id"), "text"
    )
    day2_pairs = minhash_incremental_pairs(
        day2, root, threshold=0.8, verify="exact", old_docs=docs
    ).toPandas()
    corpus = docs.unionByName(day2.select("doc_id", "text"))
    full_sdf = minhash_near_dup_pairs(
        corpus, threshold=0.8, num_hashes=32, bands=8, shingle_k=3
    ).localCheckpoint()
    full = full_sdf.toPandas()
    touching2 = full[(full.id_a >= 400_000) | (full.id_b >= 400_000)]
    mk = lambda df: {
        (min(a, b), max(a, b), round(j, 6))
        for a, b, j in zip(df.id_a, df.id_b, df.jaccard)
    }
    day2_df = spark.createDataFrame(day2_pairs)
    assert mk(day2_pairs) == mk(touching2) and len(mk(touching2)) > 0
    # end-to-end: incremental pair batches + incremental CC == full CC
    old_pairs = minhash_near_dup_pairs(
        old, threshold=0.8, num_hashes=32, bands=8, shingle_k=3
    )
    comp = connected_components(old_pairs, max_iter=60)
    comp = connected_components_incremental(comp, day1_pairs, max_iter=60)
    comp = connected_components_incremental(comp, day2_df, max_iter=60)
    incr_cc = {r["id"]: r["component"] for r in comp.collect()}
    full_cc = {
        r["id"]: r["component"]
        for r in connected_components(full_sdf, max_iter=60).collect()
    }
    assert incr_cc == full_cc


# ------------------------- ExactSubstr duplicate-substring spans -----------


def test_dup_substring_spans_planted_shared_paragraph(spark):
    """Two docs share an 8-word run at different offsets; sliding grams
    at any alignment find it and overlapping grams merge into ONE
    maximal span per doc (Lee et al. 2022 semantics)."""
    from feast_spark.operators.dedupe import duplicate_substring_spans

    shared = "the quick brown fox jumps over lazy dogs"
    rows = [
        (1, "alpha beta " + shared + " gamma delta epsilon"),
        (2, shared + " zeta eta theta iota kappa wow"),
        (3, "entirely unique words with no overlap at all here today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = (
        duplicate_substring_spans(df, k=4)
        .toPandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    # doc 1: words 3..10; doc 2: words 1..8; doc 3: nothing
    got = list(zip(spans.doc_id, spans.span_start, spans.span_end))
    assert got == [(1, 3, 10), (2, 1, 8)], got


def test_dup_substring_spans_within_doc_repeat_and_short_docs(spark):
    from feast_spark.operators.dedupe import duplicate_substring_spans

    rows = [
        # the 4-word phrase repeats INSIDE one doc -> both occurrences
        (1, "a b c d xx yy zz a b c d"),
        # shorter than k -> no grams, never marked
        (2, "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = (
        duplicate_substring_spans(df, k=4)
        .toPandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    got = list(zip(spans.doc_id, spans.span_start, spans.span_end))
    assert got == [(1, 1, 4), (1, 8, 11)], got


def test_remove_duplicate_substrings_cuts_all_occurrences(spark):
    from feast_spark.operators.dedupe import remove_duplicate_substrings

    shared = "one two three four"
    rows = [
        (1, "keepA keepB " + shared + " keepC"),
        (2, shared + " keepD keepE keepF keepG keepH"),
        (3, "no duplicated content in this document at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text_clean"]
        for r in remove_duplicate_substrings(df, k=4).collect()
    }
    assert out[1] == "keepA keepB keepC"
    assert out[2] == "keepD keepE keepF keepG keepH"
    # untouched doc passes through byte-identical
    assert out[3] == "no duplicated content in this document at all"
