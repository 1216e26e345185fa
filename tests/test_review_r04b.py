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
