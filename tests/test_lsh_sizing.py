"""Scale-aware LSH bucket sizing (VERDICT r03 next #2).

The fixed defaults (SimHash 4x16-bit chunks = 65,536 buckets; embedding
n_bits=6 = 64 buckets) were fixture-tuned: at 1e9+ docs the per-bucket
candidate self-join goes quadratic in bucket occupancy. Both near-dup
paths now size their key width from a caller-supplied corpus count
(a manifest stat — no plan-time count), with OR-amplification (more
tables) paying back the recall that wider keys cost:

- SimHash: Manku et al. WWW'07 block-combination tables. Recall stays
  EXACTLY 1.0 at every block count (pigeonhole), so wide and narrow
  configs must return identical verified pair sets.
- Embedding: choose_lsh_params solves bits from occupancy and tables
  from the hyperplane collision model 1-(1-p^bits)^tables.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.dedupe import (
    _simhash_block_bounds,
    choose_simhash_blocks,
    simhash64,
    simhash_near_dup_pairs,
)
from feast_spark.operators.similarity import (
    choose_lsh_params,
    embedding_near_dup_pairs,
)


class TestChooseSimhashBlocks:
    def test_small_corpus_keeps_compact_config(self):
        # 1e4 docs / 65,536 buckets ≈ 0.15 occupancy — h+1 blocks suffice
        assert choose_simhash_blocks(10_000) == 4

    def test_web_scale_widens_key(self):
        # 1e12 docs need ≥ ~30-bit keys for 1k occupancy: b=6 → 3 blocks
        # of ~10.67 bits ≈ 32-bit keys (the Manku configuration)
        assert choose_simhash_blocks(10**12) >= 6

    def test_monotone_in_corpus_size(self):
        sizes = [10**3, 10**6, 10**9, 10**12]
        blocks = [choose_simhash_blocks(n) for n in sizes]
        assert blocks == sorted(blocks)

    def test_occupancy_bound_met_where_reachable(self):
        # for 1e9 docs the chosen config's expected uniform occupancy
        # must be within the 1024 target
        b = choose_simhash_blocks(10**9)
        key_bits = (b - 3) * (64 // b)
        assert 10**9 / 2.0**key_bits <= 1024

    def test_block_bounds_cover_64_bits(self):
        for b in (4, 5, 6, 7):
            bounds = _simhash_block_bounds(b)
            assert sum(w for _, w in bounds) == 64
            assert bounds[0][0] == 0
            for (o1, w1), (o2, _) in zip(bounds, bounds[1:]):
                assert o1 + w1 == o2


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """60 distinct docs + 12 near-dup mutations (one appended token)."""
    rng = np.random.default_rng(17)
    words = [f"tok{n}" for n in range(400)]
    base = [
        " ".join(rng.choice(words, size=80, replace=True)) for _ in range(60)
    ]
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(base)]
    rows += [
        Row(doc_id=i + 10_000, text=base[i] + " extraword")
        for i in range(12)
    ]
    return spark.createDataFrame(rows).cache()


class TestSimhashWideConfig:
    def test_wide_equals_narrow_pair_set(self, spark, near_dup_docs):
        """Pigeonhole recall is exact at EVERY block count, so the
        verified pair set of the Manku b=6 config must equal the compact
        b=4 config — planted near-dups included."""
        narrow = simhash_near_dup_pairs(near_dup_docs, n_blocks=4).toPandas()
        wide = simhash_near_dup_pairs(near_dup_docs, n_blocks=6).toPandas()
        key = lambda df: {(a, b) for a, b in zip(df.id_a, df.id_b)}
        assert key(narrow) == key(wide)
        # the planted hamming-0/low mutations must be present
        sigs = {
            r.doc_id: r.s
            for r in near_dup_docs.select(
                "doc_id", simhash64(F.col("text")).alias("s")
            ).collect()
        }
        planted = {
            (i, i + 10_000)
            for i in range(12)
            if bin(sigs[i] ^ sigs[i + 10_000]).count("1") <= 3
        }
        assert planted  # fixture sanity: some mutations stay within h=3
        assert planted <= key(wide)

    def test_max_hamming_zero_exact_signature_match(self, spark, near_dup_docs):
        """r04 review: max_hamming=0 makes every combo cover ALL blocks
        (64-bit keys); the old multiply+add packing overflowed signed
        long for any signature with the top bit set and Spark 4's
        default ANSI mode threw ARITHMETIC_OVERFLOW. shift+OR packing
        must return exactly the hamming-0 (identical-signature) pairs."""
        got = simhash_near_dup_pairs(
            near_dup_docs, max_hamming=0, n_blocks=4
        ).toPandas()
        sigs = {
            r.doc_id: r.s
            for r in near_dup_docs.select(
                "doc_id", simhash64(F.col("text")).alias("s")
            ).collect()
        }
        ids = sorted(sigs)
        want = {
            (a, b)
            for ai, a in enumerate(ids)
            for b in ids[ai + 1:]
            if sigs[a] == sigs[b]
        }
        assert {(a, b) for a, b in zip(got.id_a, got.id_b)} == want
        assert (got.hamming == 0).all()
        # fixture sanity: some signature has the top bit set (negative
        # as a signed long) — the exact overflow trigger — otherwise
        # this test wouldn't have exercised the old failure
        assert any(s < 0 for s in sigs.values())

    def test_corpus_count_hint_autosizes(self, spark, near_dup_docs):
        """A web-scale corpus_count hint must produce the same verified
        pairs through the auto-chosen wide config."""
        auto = simhash_near_dup_pairs(
            near_dup_docs, corpus_count=10**12
        ).toPandas()
        narrow = simhash_near_dup_pairs(near_dup_docs, n_blocks=4).toPandas()
        assert {(a, b) for a, b in zip(auto.id_a, auto.id_b)} == {
            (a, b) for a, b in zip(narrow.id_a, narrow.id_b)
        }

    def test_skewed_corpus_occupancy_shrinks(self, spark):
        """Docs engineered to collide on one 16-bit chunk (shared low
        bits) flood a single b=4 bucket; the wider b=6 keys must spread
        them. Occupancy measured on the actual bucket keys."""
        from itertools import combinations

        rng = np.random.default_rng(23)
        words = [f"w{n}" for n in range(300)]
        docs = spark.createDataFrame(
            [
                Row(doc_id=i, text=" ".join(rng.choice(words, size=60)))
                for i in range(400)
            ]
        )
        sigs = docs.select(
            "doc_id", simhash64(F.col("text")).alias("sig")
        ).toPandas()
        u = sigs.sig.to_numpy().astype(np.uint64)
        # force chunk-0 (low 16 bits) identical across the corpus —
        # the adversarial case for the compact config
        u = (u & np.uint64(0xFFFFFFFFFFFF0000)) | np.uint64(0xBEEF)

        def max_occupancy(n_blocks: int) -> int:
            bounds = _simhash_block_bounds(n_blocks)
            worst = 0
            for combo in combinations(range(n_blocks), n_blocks - 3):
                keys = np.zeros_like(u)
                for i in combo:
                    off, w = bounds[i]
                    keys = keys * np.uint64(1 << w) + (
                        (u >> np.uint64(off)) & np.uint64((1 << w) - 1)
                    )
                _, counts = np.unique(keys, return_counts=True)
                worst = max(worst, int(counts.max()))
            return worst

        assert max_occupancy(4) == 400  # the planted flood
        assert max_occupancy(6) < 40  # wide keys disperse it


class TestChooseLshParams:
    def test_bits_track_corpus_size(self):
        b1, _ = choose_lsh_params(10**6)
        b2, _ = choose_lsh_params(10**9)
        b3, _ = choose_lsh_params(10**12)
        assert b1 <= b2 <= b3
        assert b3 <= 24  # capped

    def test_small_corpus_floor(self):
        bits, tables = choose_lsh_params(100)
        # bits floor at 4; 0.955^4 ≈ 0.83 single-table recall, so the
        # model asks for one extra OR-table to clear 0.95
        assert bits == 4 and tables <= 2

    def test_recall_model_met(self):
        import math

        for n in (10**8, 10**10, 10**12):
            bits, tables = choose_lsh_params(
                n, threshold=0.99, target_recall=0.95
            )
            p = 1.0 - math.acos(0.99) / math.pi
            recall = 1.0 - (1.0 - p**bits) ** tables
            assert recall >= 0.95 or tables == 32  # met, or at the cap

    def test_occupancy_target(self):
        bits, _ = choose_lsh_params(10**9, target_occupancy=1024)
        assert 10**9 / 2.0**bits <= 1024 * 2  # within 2x (integer bits)


class TestEmbeddingWideConfig:
    def test_multi_table_recall_on_planted_dups(self, spark):
        """corpus_count hint forces wide keys + OR-amplification; the
        planted exact-duplicate pairs (cosine 1.0 — collide in every
        table) must ALL survive, and noisy near-dups must keep high
        recall vs the exact baseline."""
        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((150, 32)).astype("float64")
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
        # 30 planted near-identical copies (tiny noise, cosine > 0.999)
        for i in range(30):
            noisy = vecs[i] + 0.001 * rng.standard_normal(32)
            rows.append((i + 1000, (noisy / np.linalg.norm(noisy)).tolist()))
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        exact = embedding_near_dup_pairs(
            corpus, threshold=0.999, exact=True
        ).toPandas()
        lsh = embedding_near_dup_pairs(
            corpus, threshold=0.999, dim=32, corpus_count=10**10
        ).toPandas()
        ex = {(a, b) for a, b in zip(exact.id_a, exact.id_b)}
        got = {(a, b) for a, b in zip(lsh.id_a, lsh.id_b)}
        assert got <= ex  # verify step: no false positives ever
        assert len(ex) >= 30
        assert len(got & ex) / len(ex) >= 0.9  # seed-pinned recall

    def test_explicit_bits_override_hint(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((40, 16))
        rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
        rows += [(i + 500, vecs[i].tolist()) for i in range(10)]
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        # pinned 6-bit single-table (old default) must equal the no-hint
        # call — identical vectors share every sign bucket
        a = embedding_near_dup_pairs(
            corpus, threshold=0.9999, dim=16
        ).toPandas()
        b = embedding_near_dup_pairs(
            corpus,
            threshold=0.9999,
            dim=16,
            n_bits=6,
            n_tables=1,
            corpus_count=10**12,
        ).toPandas()
        assert set(zip(a.id_a, a.id_b)) == set(zip(b.id_a, b.id_b))
        assert len(a) == 10
