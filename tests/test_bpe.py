"""Trained BPE: Sennrich merge semantics, encode/reference identity,
determinism, and the histogram's partition invariance."""

import pyspark.sql.functions as F
import pytest

from feast_spark.operators import bpe


# ---------------------------------------------------------- reference --


def ref_train(word_counts, num_merges):
    """Textbook O(merges × corpus) Sennrich loop (no incremental
    maintenance) — the oracle for the indexed trainer."""
    seqs = {w: list(bpe._word_symbols(w)) for w, _ in word_counts}
    counts = dict(word_counts)
    merges = []
    for _ in range(num_merges):
        pair_n = {}
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_n[p] = pair_n.get(p, 0) + counts[w]
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_trainer_matches_textbook_reference():
    for n in (1, 5, 10, 40):
        got = bpe.train_bpe_from_histogram(SENNRICH, n).merges
        assert list(got) == ref_train(SENNRICH, n)


def test_sennrich_first_merges():
    # the worked example from the paper, under the attached-end-marker
    # convention: 'es' (9 = newest 6 + widest 3), then 'est</w>' (9)
    m = bpe.train_bpe_from_histogram(SENNRICH, 3).merges
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t" + bpe.END)
    assert m[2] == ("l", "o")  # lowest (5+2=7) beats everything left


def test_train_is_deterministic_and_tiebreaks_lexicographically():
    # two pairs with equal count -> lexicographically smaller merges first
    hist = [("ab", 3), ("cd", 3)]
    m = bpe.train_bpe_from_histogram(hist, 2).merges
    assert m[0] == ("a", "b" + bpe.END)
    assert bpe.train_bpe_from_histogram(hist, 2) == bpe.train_bpe_from_histogram(
        hist, 2
    )


def test_encode_word_respects_merge_priority():
    model = bpe.BPEModel.from_merges(
        [("e", "s"), ("es", "t</w>"), ("l", "o"), ("lo", "w")]
    )
    assert bpe.encode_word("newest", model.ranks) == ["n", "e", "w", "est</w>"]
    assert bpe.encode_word("low", model.ranks) == ["lo", "w</w>"]
    # unseen word falls back to chars + end marker
    assert bpe.encode_word("zq", model.ranks) == ["z", "q</w>"]


def test_roundtrip_tokens_reassemble_pretokens():
    text = "The 42 lowest estimates, newest & widest!"
    model = bpe.train_bpe_from_histogram(SENNRICH, 10)
    toks = bpe.encode_text(text, model.ranks)
    rebuilt = "".join(toks).replace(bpe.END, "")
    assert rebuilt == "".join(bpe._PRETOKEN.findall(text))


def test_model_json_roundtrip(tmp_path):
    model = bpe.train_bpe_from_histogram(SENNRICH, 7)
    p = str(tmp_path / "bpe.json")
    bpe.save_bpe(model, p)
    loaded = bpe.load_bpe(p)
    assert loaded == model
    assert loaded.ranks == model.ranks


# -------------------------------------------------------- spark paths --


CORPUS = [
    "the lowest estimates are the newest estimates",
    "a wider test of the widest low bar",
    "low low lower lowest",
    None,
    "",
    "newest newest newest 123 :: 456",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "id int, text string"
    )


def test_word_histogram_matches_python_and_is_partition_invariant(
    spark, corpus_df
):
    from collections import Counter

    c = Counter()
    for t in CORPUS:
        if t:
            c.update(bpe._PRETOKEN.findall(t))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["word"], r["n"])
        for r in bpe.word_histogram(corpus_df, max_words=10).collect()
    ]
    got2 = [
        (r["word"], r["n"])
        for r in bpe.word_histogram(corpus_df.repartition(7), max_words=10).collect()
    ]
    assert got == exp
    assert got2 == exp


def test_spark_encode_matches_reference_encoder(spark, corpus_df):
    model = bpe.train_bpe(corpus_df, num_merges=30)
    got = {
        r["id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(corpus_df, model).collect()
    }
    for i, t in enumerate(CORPUS):
        if t is None:
            assert got[i] is None
        else:
            assert got[i] == bpe.encode_text(t, model.ranks)


def test_token_count_column(spark, corpus_df):
    model = bpe.train_bpe(corpus_df, num_merges=30)
    rows = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_count(corpus_df, model).collect()
    }
    for i, t in enumerate(CORPUS):
        if t is None:
            assert rows[i] is None
        else:
            assert rows[i] == len(bpe.encode_text(t, model.ranks))
    # trained-BPE counts never exceed the char-level upper bound and
    # compress relative to no-merges for seen words
    assert rows[0] < sum(len(w) for w in bpe._PRETOKEN.findall(CORPUS[0]))


def test_more_merges_never_increase_token_count(spark, corpus_df):
    m10 = bpe.train_bpe(corpus_df, num_merges=10)
    m50 = bpe.train_bpe(corpus_df, num_merges=50)
    t = "the lowest newest estimates of the widest low test"
    assert len(bpe.encode_text(t, m50.ranks)) <= len(
        bpe.encode_text(t, m10.ranks)
    )
