"""End-to-end LLM training-data curation pipeline: the components are
individually oracle-checked; this test pins that they COMPOSE — the flow
a real user would run over 100 TB, exercised at test scale:

raw docs → URL blocklist + banned phrases → per-domain quota →
quality filter (Gopher rules) → PII redaction → normalize →
exact dedup → cross-doc span dedup → near-dup clustering (keep one per
cluster) → stratified sample per language → token-budget sequence
packing → deterministic train/test split → source-weighted mix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.dedupe import exact_dedup, near_dup_keepers, ngram_jaccard_pairs
from feast_spark.operators.sampling import hash_split, pack_sequences, stratified_sample
from feast_spark.operators.text import dedup_spans, gopher_quality_features, redact_pii


@pytest.fixture(scope="module")
def raw_docs(spark):
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant the pathologies each stage must catch
    exact_copies = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    near_dups = base.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, size(split(text, ' ')) - 1))"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    pii = spark.createDataFrame(
        [Row(doc_id=30_000,
             text="contact bob@example.com or 192.168.0.1 " + "word " * 60,
             lang="en", source="web", n_chars=100)]
    )
    junk = spark.createDataFrame(
        [Row(doc_id=40_000, text="a a a a", lang="en", source="web",
             n_chars=7)]  # fails Gopher min-length
    )
    # a 30-page mirror farm on one domain (domain quota's prey), one doc
    # carrying a banned phrase, and a whitespace-variant of doc 0's text
    # that only normalization makes exact-dedup-able
    farm = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 50_000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    banned = spark.createDataFrame(
        [Row(doc_id=60_000, text="an otherwise fine page zzyzx " + "w " * 80,
             lang="en", source="web", n_chars=100)]
    )
    ws_variant = base.filter(F.col("doc_id") == 0).select(
        F.lit(70_000).cast("long").alias("doc_id"),
        F.concat(F.lit("  "), F.regexp_replace("text", " ", "  "),
                 F.lit("\t")).alias("text"),
        "lang", "source", "n_chars",
    )
    docs = (
        base.unionByName(exact_copies).unionByName(near_dups)
        .unionByName(pii).unionByName(junk).unionByName(farm)
        .unionByName(banned).unionByName(ws_variant)
    )
    # crawl URLs: every doc its own domain except the mirror farm
    return docs.withColumn(
        "url",
        F.when(
            (F.col("doc_id") >= 50_000) & (F.col("doc_id") < 60_000),
            F.concat(F.lit("https://Mirror.FARM/p/"), F.col("doc_id")),
        ).otherwise(
            F.concat(F.lit("https://site"), F.col("doc_id"),
                     F.lit(".org/p/"), F.col("doc_id"))
        ),
    ).cache()


def test_full_curation_pipeline(spark, raw_docs):
    from feast_spark.operators.sampling import domain_quota_sample, weighted_mix
    from feast_spark.operators.text import blocklist_filter, normalize_text

    n0 = raw_docs.count()

    # 0a. URL blocklist + banned phrases (crawl-level)
    unblocked = blocklist_filter(
        raw_docs, blocked_domains=["blocked.example"],
        banned_phrases=["zzyzx"],
    )
    assert unblocked.filter(F.col("doc_id") == 60_000).count() == 0
    assert unblocked.count() == n0 - 1

    # 0b. per-domain quota: the 30-page mirror farm collapses to 5;
    # every other domain has one page and is untouched
    quotad = domain_quota_sample(
        unblocked, url_col="url", id_col="doc_id", quota=5
    ).drop("domain", "url")
    assert quotad.filter(
        (F.col("doc_id") >= 50_000) & (F.col("doc_id") < 60_000)
    ).count() == 5
    assert quotad.count() == unblocked.count() - 25

    # 1. quality filter (Gopher rules)
    flagged = gopher_quality_features(quotad, text_col="text")
    clean = flagged.filter(F.col("gopher_keep")).select(*quotad.columns)
    n1 = clean.count()
    assert n1 < n0  # the junk doc (at least) dropped
    assert clean.filter(F.col("doc_id") == 40_000).count() == 0

    # 2. PII redaction
    redacted = clean.withColumn("text", redact_pii(F.col("text")))
    leaked = redacted.filter(
        F.col("text").contains("bob@example.com")
        | F.col("text").contains("192.168.0.1")
    )
    assert leaked.count() == 0
    assert redacted.count() == n1  # redaction never drops rows

    # 2b. normalize before hashing: the whitespace variant of doc 0
    # becomes byte-identical to it
    normed = redacted.withColumn("text", normalize_text("text"))
    assert normed.count() == n1

    # 3. exact dedup on normalized text: 5 planted exact copies AND the
    # normalize-exposed variant collapse
    exact = exact_dedup(normed, ["text"])
    n3 = exact.count()
    assert n3 <= n1 - 6
    merged = normed.count() - normed.dropDuplicates(["text"]).count()
    pre_norm = redacted.count() - redacted.dropDuplicates(["text"]).count()
    assert merged == pre_norm + 1  # exactly one extra merge from normalize

    # 4. cross-doc span dedup (keep docs, count surviving spans)
    spans_kept = dedup_spans(exact, span_tokens=20, rebuild=True)
    assert spans_kept.count() <= n3

    # 5. near-dup clustering: keep one doc per cluster
    pairs = ngram_jaccard_pairs(exact, threshold=0.7, shingle_k=3)
    keepers = near_dup_keepers(exact.select("doc_id"), pairs)
    survivors = exact.join(
        keepers.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    n5 = survivors.count()
    assert n5 < n3  # planted near-dups collapsed
    # the planted near-dup clones collapse (originals = smaller ids =
    # keepers); allow one stray for a very short doc whose one-token
    # mutation drops Jaccard below threshold. (Band-limited to the clone
    # ids: exact dedup may legitimately keep a farm COPY of an original
    # — identical text, arbitrary keeper — so ≥50k ids can survive.)
    assert survivors.filter(
        (F.col("doc_id") >= 20_000) & (F.col("doc_id") < 30_000)
    ).count() <= 1

    # 6. stratified sample per language (deterministic)
    sampled = stratified_sample(
        survivors, group_col="lang", id_col="doc_id", k=50
    )
    sizes = {r["lang"]: r["n"] for r in sampled.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v <= 50 for v in sizes.values())

    # 7. token-budget packing
    with_tokens = sampled.withColumn(
        "n_tok", F.size(F.split("text", r"\s+")).cast("long")
    )
    packed = pack_sequences(
        with_tokens.select("doc_id", "n_tok"),
        id_col="doc_id", size_col="n_tok", budget=4096, n_shards=4,
    )
    assert packed.count() == sampled.count()  # every doc assigned
    over = packed.groupBy("pack_id").agg(
        F.sum("n_tok").alias("t"), F.max("oversize").alias("o")
    ).filter((F.col("t") > 4096) & ~F.col("o"))
    assert over.count() == 0

    # 8. split — stable across the pipeline
    split = hash_split(sampled, id_col="doc_id", test_frac=0.2)
    assert split.filter(F.col("split") == "test").count() > 0
    assert split.count() == sampled.count()

    # 9. source-weighted mix over the training split: 2× one source,
    # exact expected cardinality (integer weights are deterministic)
    train = split.filter(F.col("split") == "train").cache()
    mixed = weighted_mix(
        train, source_col="source", id_col="doc_id",
        weights={"src0": 2.0},
    )
    n_src0 = train.filter(F.col("source") == "src0").count()
    assert mixed.count() == train.count() + n_src0


def test_daily_append_curation_pipeline(spark, tmp_path):
    """The INCREMENTAL composition (round 4): day 0 builds state — a
    MinHash band index + component table + perplexity LM; each later
    day hashes only its batch, joins the index, folds new pairs into
    the clustering, appends the index, and scores quality with the
    frozen day-0 LM. End state must match a from-scratch batch run
    over the full corpus — the correctness contract that makes the
    incremental path trustworthy at 100 TB."""
    from feast_spark.operators.dedupe import (
        append_minhash_index,
        build_minhash_index,
        connected_components,
        connected_components_incremental,
        minhash_incremental_pairs,
        minhash_near_dup_pairs,
    )
    from feast_spark.operators.text import char_ngram_lm, perplexity_score

    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
        .cache()
    )
    def mutate(src, offset):
        return src.select(
            (F.col("doc_id") + offset).alias("doc_id"),
            F.expr(
                "concat_ws(' ', slice(split(text, ' '), 1, "
                "size(split(text, ' ')) - 1))"
            ).alias("text"),
        )
    day1 = mutate(base.filter(F.col("doc_id") < 40), 1_000_000)
    day2 = mutate(base.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80)),
                  2_000_000).unionByName(mutate(day1.limit(10), 3_000_000))

    cfg = dict(num_hashes=32, bands=8, shingle_k=3)
    root = str(tmp_path / "mh_idx")
    build_minhash_index(base, root, **cfg)
    comp = connected_components(
        minhash_near_dup_pairs(base, threshold=0.8, **cfg), max_iter=60
    ).localCheckpoint()
    lm = char_ngram_lm(base, order=3)

    seen = base
    for day in (day1, day2):
        pairs = minhash_incremental_pairs(
            day, root, threshold=0.8, verify="exact", old_docs=seen
        ).localCheckpoint()
        comp = connected_components_incremental(comp, pairs, max_iter=60) \
            .localCheckpoint()
        append_minhash_index(day, root)
        seen = seen.unionByName(day).localCheckpoint()

    incr_cc = {r["id"]: r["component"] for r in comp.collect()}
    full_cc = {
        r["id"]: r["component"]
        for r in connected_components(
            minhash_near_dup_pairs(seen, threshold=0.8, **cfg), max_iter=60
        ).collect()
    }
    assert incr_cc == full_cc and len(incr_cc) > 0

    # quality scoring with the frozen day-0 LM is stable across days:
    # a doc present on day 0 scores identically when rescored later
    h0 = {r["doc_id"]: r["h"]
          for r in perplexity_score(base.limit(20), lm).collect()}
    h2 = {r["doc_id"]: r["h"]
          for r in perplexity_score(
              seen.filter(F.col("doc_id") < 20), lm).collect()}
    assert all(abs(h0[d] - h2[d]) < 1e-12 for d in h2)
