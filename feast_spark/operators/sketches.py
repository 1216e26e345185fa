"""Mergeable sketches (SURVEY §2 A4 extended; Apache DataSketches HLL +
Count-Min, exposed by Spark ≥3.5 as ``hll_sketch_agg`` /
``hll_union_agg`` / ``count_min_sketch``).

Why this matters at 100 TB: an exact ``COUNT(DISTINCT)`` over a year of
data rescans the year. Sketches are MERGEABLE — build one small binary
sketch per partition (day/bucket) ONCE at ingest, persist it in a rollup
table, then answer any date-range distinct query by unioning the range's
sketches: O(range) tiny-blob reads, zero rescans. HLL registers are
max-merged, so a union of per-partition sketches is EXACTLY the sketch
of the union (not approximately — the estimate is identical to
single-pass construction; tests pin this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    col: str,
    *,
    by: list[str] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """Approximate distinct count of ``col`` (per ``by`` group when
    given) via one map-side-combinable HLL aggregation. ~0.8% relative
    stderr at lgk=12 for a 2^12-register sketch."""
    agg = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(col), F.lit(lgk))
    ).alias(f"approx_n_{col}")
    return df.groupBy(*(by or [])).agg(agg) if by else df.agg(agg)


def hll_rollup(
    df: DataFrame,
    col: str,
    *,
    part_col: str,
    lgk: int = 12,
) -> DataFrame:
    """The persistable sketch-rollup table: one (partition, sketch) row
    per ``part_col`` value. Write this once per ingest; range queries
    then union the covered partitions' sketches via ``hll_union_rows``
    without touching the raw data."""
    return df.groupBy(part_col).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("hll_sketch")
    )


def hll_union_rows(
    rollup: DataFrame,
    *,
    sketch_col: str = "hll_sketch",
    by: list[str] | None = None,
) -> DataFrame:
    """Union pre-built sketches (optionally per ``by`` group) and
    estimate. Register-max merge ⇒ the estimate equals single-pass
    construction over the union of the underlying rows."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))
    ).alias("approx_distinct")
    return rollup.groupBy(*(by or [])).agg(agg) if by else rollup.agg(agg)


# ----------------------------------------------------------- Bloom ---------
#
# A distributed, mergeable Bloom filter as a (word, bits) DataFrame —
# the membership companion to HLL (distinct) and Count-Min (frequency).
# The pipeline use: build one sketch per ingested crawl batch, persist
# the ~m/63-row table, then screen a NEW batch for "seen before" via one
# bucket-local join instead of a join against the 10^12-row corpus
# (false positives re-checked exactly; false negatives impossible).
#
# Bit positions come from the PORTABLE md5-prefix hash (the sampling
# module's convention), not xxhash64, so an oracle engine (DuckDB) or a
# non-Spark producer reconstructs the EXACT same table. Words hold 63
# bits, not 64: a set bit 63 needs 1<<63, which overflows signed
# BIGINT in DuckDB and goes negative in Spark — 63 keeps every mask
# positive and the table portable.

BLOOM_WORD_BITS = 63


#: 15 hex digits = 60 bits of hash per position draw. 8 digits (32 bits)
#: silently clipped any m_bits above 2^32 — at the docstring's n=10^9
#: sizing (m ≈ 10^10) over half the configured bits could never be set
#: and the real fp rate blew past the formula (r04 review). 60 bits
#: stays below signed-BIGINT range in both Spark and DuckDB.
_BLOOM_HASH_HEX = 15
BLOOM_MAX_BITS = 1 << (4 * _BLOOM_HASH_HEX)


def _bloom_positions(c: Column, m_bits: int, k: int, seed: int) -> Column:
    """Array of ``k`` bit positions in [0, m_bits) for one value —
    independent draws via md5(value|seed|i)."""
    if not 0 < m_bits <= BLOOM_MAX_BITS:
        raise ValueError(
            f"m_bits must be in (0, 2^{4 * _BLOOM_HASH_HEX}]; got {m_bits}"
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", c.cast("string"), F.lit(str(seed)),
                        i.cast("string"),
                    )
                ),
                1, _BLOOM_HASH_HEX,
            ),
            16, 10,
        ).cast("long") % F.lit(m_bits),
    )


def bloom_sketch(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = 63 * 4096,
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Build the Bloom sketch of ``col``: a DataFrame (word long,
    bits long) with one row per 63-bit word that has any bit set —
    sparse, so an underfilled filter costs less than m/63 rows.

    ONE map-side-combinable shuffle of ≤ m/63 groups (bit_or partials
    combine on the map side); the corpus itself is never shuffled.
    Merging sketches built with the same (m_bits, k, seed) is
    ``bloom_merge`` — bit_or is associative/commutative/idempotent, so
    the merge EXACTLY equals single-pass construction over the unioned
    rows (tests pin this), the same property the HLL rollup leans on.

    Size m_bits for the false-positive budget: fp ≈ (1-e^{-kn/m})^k;
    the classic m ≈ 1.44·k·n/ln2 bits for the optimum. At n=10^9 keys,
    k=3, fp≈1%: m ≈ 10^10 bits ≈ 19 MB of (word, bits) rows — a small
    table, broadcastable to probes."""
    pos = df.select(
        F.explode(_bloom_positions(F.col(col), m_bits, k, seed)).alias("__p")
    )
    return (
        pos.select(
            # word index is LONG: at m_bits near the 2^60 cap it exceeds
            # int32 range, and ANSI-mode cast("int") would throw
            (F.col("__p") / F.lit(BLOOM_WORD_BITS)).cast("long").alias("word"),
            # pyspark's F.shiftleft only takes a Python-int bit count;
            # the SQL form shifts by a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(__p % {BLOOM_WORD_BITS} AS INT))"
            ).alias("__m"),
        )
        .groupBy("word")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union Bloom sketches built with identical (m_bits, k, seed):
    bit_or per word. Exactly equals building over the unioned inputs."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    m_bits: int = 63 * 4096,
    k: int = 3,
    seed: int = 42,
    out: str = "contained",
) -> DataFrame:
    """Membership screen: one row per DISTINCT probe value with
    ``out`` = true iff every one of its k bits is set. No false
    negatives; false-positive rows are the caller's to re-check exactly
    (that re-check touches only the screened-in sliver, which is the
    whole point at corpus scale). The sketch side is broadcast — it is
    at most m/63 rows by construction."""
    vals = probes.select(F.col(col)).where(F.col(col).isNotNull()).distinct()
    pos = vals.select(
        col,
        F.explode(_bloom_positions(F.col(col), m_bits, k, seed)).alias("__p"),
    ).select(
        col,
        (F.col("__p") / F.lit(BLOOM_WORD_BITS)).cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(__p % {BLOOM_WORD_BITS} AS INT))"
        ).alias("__m"),
    )
    hit = (
        pos.join(F.broadcast(sketch), "word", "left")
        .withColumn(
            "__ok",
            F.coalesce(
                F.col("bits").bitwiseAND(F.col("__m")) == F.col("__m"),
                F.lit(False),
            ),
        )
        .groupBy(col)
        .agg(F.bool_and("__ok").alias(out))
    )
    return hit


def freq_sketch(
    df: DataFrame,
    col: str,
    *,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> Column | DataFrame:
    """Count-Min frequency sketch of ``col`` (binary, mergeable) — the
    heavy-hitter companion to HLL: ship one small sketch to the driver
    and probe any value's approximate frequency without a groupBy over
    the full key space."""
    return df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )
