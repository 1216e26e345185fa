"""Deterministic sampling/splitting semantics (operators.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.sampling import hash_split, stratified_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for g, n in (("a", 200), ("b", 50), ("c", 3)):
        rows += [Row(grp=g, doc_id=f"{g}-{i}", v=i) for i in range(n)]
    return spark.createDataFrame(rows).cache()


def test_stratified_sample_sizes_and_determinism(spark, corpus):
    s1 = stratified_sample(corpus, group_col="grp", id_col="doc_id", k=20)
    sizes = {r["grp"]: r["n"] for r in s1.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"a": 20, "b": 20, "c": 3}  # min(k, n) per stratum
    # identical output on a re-run and under different partitioning
    s2 = stratified_sample(
        corpus.repartition(13), group_col="grp", id_col="doc_id", k=20
    )
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    # different seed → different sample
    s3 = stratified_sample(
        corpus, group_col="grp", id_col="doc_id", k=20, seed=7
    )
    assert s1.select("doc_id").exceptAll(s3.select("doc_id")).count() > 0


def test_threshold_strategy_equals_window(spark, corpus):
    """The scale path must return the SAME rows as the exact window."""
    w = stratified_sample(corpus, group_col="grp", id_col="doc_id", k=10)
    t = stratified_sample(
        corpus, group_col="grp", id_col="doc_id", k=10,
        strategy="threshold", oversample=8.0,
    )
    assert sorted(r["doc_id"] for r in w.collect()) == sorted(
        r["doc_id"] for r in t.collect()
    )


def test_threshold_raises_on_undersampling(spark, corpus):
    with pytest.raises(RuntimeError, match="oversample"):
        stratified_sample(
            corpus, group_col="grp", id_col="doc_id", k=40,
            strategy="threshold", oversample=0.01,
        )


def test_hash_split_stable_and_sized(spark, corpus):
    s = hash_split(corpus, id_col="doc_id", test_frac=0.25)
    frac = s.filter(F.col("split") == "test").count() / s.count()
    assert 0.1 < frac < 0.4  # 253 rows: loose binomial bounds
    # stability: a row's split is independent of the rest of the corpus
    sub = hash_split(corpus.limit(50), id_col="doc_id", test_frac=0.25)
    joined = s.alias("full").join(
        sub.alias("sub").withColumnRenamed("split", "split_sub"),
        ["grp", "doc_id", "v"],
    )
    assert joined.filter(F.col("split") != F.col("split_sub")).count() == 0
    with pytest.raises(ValueError, match="test_frac"):
        hash_split(corpus, id_col="doc_id", test_frac=1.5)


def test_pack_sequences_budget_and_coverage(spark):
    from feast_spark.operators.sampling import pack_sequences

    rows = [Row(doc_id=i, n_tok=(i * 37) % 900 + 50) for i in range(500)]
    rows.append(Row(doc_id=9999, n_tok=5000))  # oversize
    df = spark.createDataFrame(rows)
    out = pack_sequences(
        df, id_col="doc_id", size_col="n_tok", budget=2048, n_shards=8
    ).toPandas()

    # every doc assigned exactly once
    assert sorted(out["doc_id"]) == sorted(r.doc_id for r in rows)
    # no pack exceeds budget except oversize singletons
    agg = out.groupby("pack_id").agg(
        tot=("n_tok", "sum"), n=("n_tok", "size"), over=("oversize", "max")
    )
    bad = agg[(agg["tot"] > 2048) & ~agg["over"]]
    assert bad.empty, bad
    over = out[out["oversize"]]
    assert list(over["doc_id"]) == [9999]
    assert int(agg.loc[over["pack_id"].iloc[0], "n"]) == 1  # singleton
    # packing efficiency: pack count within 2x of the lower bound
    lower = (out[~out["oversize"]]["n_tok"].sum() + 2047) // 2048
    assert out[~out["oversize"]]["pack_id"].nunique() <= 2 * lower
    # deterministic under repartitioning
    out2 = pack_sequences(
        df.repartition(17), id_col="doc_id", size_col="n_tok",
        budget=2048, n_shards=8,
    ).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a["pack_id"].values == b["pack_id"].values).all()


@pytest.fixture(scope="module")
def crawl(spark):
    """Skewed synthetic crawl: one hot domain (60%), 7 tail domains,
    a single-label host, and an unparseable URL (NULL domain)."""
    rows = []
    for i in range(400):
        if i % 10 < 6:
            url = f"https://Hot.Example.COM/p/{i}"
        else:
            url = f"https://www.Site{i % 7}.NET/d/{i}"
        rows.append(Row(doc_id=i, url=url))
    rows.append(Row(doc_id=400, url="http://localhost/x"))
    rows.append(Row(doc_id=401, url="not a url at all"))
    return spark.createDataFrame(rows).cache()


def test_registrable_domain_parsing(spark, crawl):
    from feast_spark.operators.sampling import registrable_domain

    got = {
        r["doc_id"]: r["d"]
        for r in crawl.select(
            "doc_id", registrable_domain("url").alias("d")
        ).collect()
    }
    assert got[0] == "example.com"          # case + subdomain stripped
    assert got[6] == "site6.net"            # www. stripped, lowered
    assert got[400] == "localhost"          # single-label passthrough
    assert got[401] is None                 # unparseable → NULL stratum
    # r04 review: trailing-dot FQDN spellings fold into the same domain
    # (else a blocklisted/quota'd site escapes under 'example.com.')
    fqdn = spark.createDataFrame(
        [
            Row(doc_id=0, url="https://blocked.example.com./x"),
            Row(doc_id=1, url="https://host./y"),
            Row(doc_id=2, url="https://.../z"),
        ]
    )
    got2 = {
        r["doc_id"]: r["d"]
        for r in fqdn.select(
            "doc_id", registrable_domain("url").alias("d")
        ).collect()
    }
    assert got2[0] == "example.com"
    assert got2[1] == "host"
    assert got2[2] is None


def test_domain_quota_caps_hot_domain(spark, crawl):
    from feast_spark.operators.sampling import domain_quota_sample

    out = domain_quota_sample(
        crawl, url_col="url", id_col="doc_id", quota=15
    ).cache()
    sizes = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes["example.com"] == 15       # 240 hot rows → capped
    for k in range(7):                      # tails: min(quota, ~23)=15
        assert sizes[f"site{k}.net"] == 15
    assert sizes["localhost"] == 1          # n < quota kept whole
    assert sizes[None] == 1                 # NULL stratum capped too
    # threshold (default) and window strategies pick identical rows
    w = domain_quota_sample(
        crawl, url_col="url", id_col="doc_id", quota=15,
        strategy="window",
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in w.collect()
    )


def test_weighted_mix_epochs(spark):
    from feast_spark.operators.sampling import weighted_mix

    rows = [Row(doc_id=i, source=f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows)
    out = weighted_mix(
        df, source_col="source", id_col="doc_id",
        weights={"s0": 2.5, "s1": 0.25, "s2": 0.0},
    ).cache()
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert "s2" not in per                      # weight 0 drops the source
    assert per["s3"] == 100                     # default 1.0 → exactly 1 copy
    assert 200 <= per["s0"] <= 300              # 2.5× → 2 or 3 copies each
    assert 10 <= per["s1"] <= 45                # 0.25 of 100, hash-chosen
    # integer part is guaranteed: every s0 doc appears at least twice
    mins = out.filter(F.col("source") == "s0").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("c"))
    assert mins.filter(F.col("c") < 2).count() == 0
    # epochs are 0..n-1 per doc
    eps = out.filter(F.col("source") == "s0").groupBy("doc_id").agg(
        F.min("epoch").alias("lo"), F.max("epoch").alias("hi"),
        F.count(F.lit(1)).alias("c"))
    bad = eps.filter((F.col("lo") != 0) | (F.col("hi") != F.col("c") - 1))
    assert bad.count() == 0
    # deterministic under repartitioning
    out2 = weighted_mix(
        df.repartition(17), source_col="source", id_col="doc_id",
        weights={"s0": 2.5, "s1": 0.25, "s2": 0.0},
    )
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


# ----------------------------------------- DSIR importance resampling ------


def test_hashed_feature_histogram_total(spark):
    from feast_spark.operators.sampling import hashed_feature_histogram

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    hist = hashed_feature_histogram(df, dim=64)
    # unigrams + adjacent bigrams: (3 + 2) + (2 + 1) = 8 features
    assert sum(hist) == 8 and len(hist) == 64
    uni_only = hashed_feature_histogram(df, dim=64, include_bigrams=False)
    assert sum(uni_only) == 5


def test_dsir_log_ratios_guard():
    import pytest as _pt

    from feast_spark.operators.sampling import dsir_log_ratios

    with _pt.raises(ValueError, match="dim"):
        dsir_log_ratios([1, 2], [1, 2, 3])


def test_dsir_logweights_prefer_target_like_docs(spark):
    from feast_spark.operators.sampling import (
        dsir_log_ratios, dsir_logweights, hashed_feature_histogram,
    )

    sci = "quantum theory energy physics experiment measurement result"
    spam = "click here buy now free offer winner prize deal"
    corpus = spark.createDataFrame(
        [(i, sci if i % 2 == 0 else spam) for i in range(40)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100 + i, sci) for i in range(5)], "doc_id long, text string"
    )
    lr = dsir_log_ratios(
        hashed_feature_histogram(target, dim=512),
        hashed_feature_histogram(corpus, dim=512),
    )
    w = dsir_logweights(corpus, log_ratios=lr).toPandas()
    sci_w = w[w.doc_id % 2 == 0]["dsir_logw"]
    spam_w = w[w.doc_id % 2 == 1]["dsir_logw"]
    assert sci_w.min() > spam_w.max(), (sci_w.min(), spam_w.max())


def test_dsir_select_deterministic_and_enriched(spark):
    from feast_spark.operators.sampling import dsir_select

    sci = "quantum theory energy physics experiment measurement result"
    spam = "click here buy now free offer winner prize deal"
    corpus = spark.createDataFrame(
        [(i, sci if i % 4 == 0 else spam) for i in range(80)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(900 + i, sci) for i in range(5)], "doc_id long, text string"
    )
    a = dsir_select(corpus, target, k=15, dim=512, seed=7)
    b = dsir_select(corpus, target, k=15, dim=512, seed=7)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b and len(ids_a) == 15
    # corpus is 25% sci; the DSIR-selected set must be strongly enriched
    sci_frac = sum(1 for i in ids_a if i % 4 == 0) / 15
    assert sci_frac >= 0.8, sci_frac
    # different seed -> same enrichment, (almost surely) different draw
    c = dsir_select(corpus, target, k=15, dim=512, seed=8)
    ids_c = sorted(r["doc_id"] for r in c.collect())
    assert ids_c != ids_a
