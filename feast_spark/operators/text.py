"""Vectorized text kernels (SURVEY.md §2.9; binding: "vectorized
pandas/Arrow UDFs (no per-row Python)").

V1 (extraction) runs the frozen spec in ``extract_spec`` over Arrow
batches via ``mapInPandas`` — the engine-side twin of the serial golden
path, byte-identical by construction (same pure function) and verified by
tests/test_extract.py. The other kernels are JVM-built-in-first: language
ID, quality scoring, token counting, and fingerprinting are expressed in
``pyspark.sql.functions`` where possible and fall back to ``pandas_udf``
(Arrow-batched) where regex/numpy is genuinely needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_spark.extract_spec import extract_text

# ------------------------------------------------------------ V1 --------


def extract_text_col(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """HTML→text extraction over Arrow batches (mapInPandas).

    Keeps ALL input columns and appends ``out_col``. Arrow batch size is
    bounded by session config (session.ARROW_MAX_RECORDS_PER_BATCH) since
    html rows are KiB-to-MiB scale.
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.StringType(), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf[out_col] = [
                extract_text(h) if h is not None else None for h in pdf[html_col]
            ]
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


# single source of truth for both kernels: the fused pandas path
# (_STOP_SET lookups) and the JVM expression path (STOPWORDS literal
# array) are cross-checked result-identical in tests/test_extract.py
STOPWORDS = (
    "the of and to in a is that it for on with as are was be this at by an"
).split()
_STOP_SET = frozenset(STOPWORDS)


def extract_features_col(
    df: DataFrame,
    html_col: str = "html",
    *,
    include_text: bool = False,
) -> DataFrame:
    """Fused extraction + per-doc feature kernel (the 100 TB hot path).

    One Arrow batch pass: html → text (frozen spec) → numeric features,
    shipping ONLY compact numerics back to the JVM. The unfused
    alternative (extract_text_col then JVM expressions) Arrow-transfers
    the full extracted text and re-scans it with several JVM regex
    passes — measured 5× more CPU + GC pressure at 32 threads on this
    box. Features use pandas vectorized str ops (C fast-path) identical
    in result to the ``quality_features`` JVM expressions (cross-checked
    in tests/test_extract.py).

    ``include_text=True`` additionally emits the extracted text (for the
    byte-identity golden path); leave False in throughput jobs.
    """
    keep = [f for f in df.schema.fields if f.name != html_col]
    out_fields = list(df.schema.fields) if include_text else keep
    schema = T.StructType(
        out_fields
        + ([T.StructField("extracted_text", T.StringType())] if include_text else [])
        + [
            T.StructField("q_n_chars", T.LongType()),
            T.StructField("q_n_tokens", T.LongType()),
            T.StructField("q_punct_ratio", T.DoubleType()),
            T.StructField("q_digit_ratio", T.DoubleType()),
            T.StructField("q_upper_ratio", T.DoubleType()),
            T.StructField("q_stopword_ratio", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pd.Series(
                [extract_text(h) if h is not None else None for h in pdf[html_col]],
                index=pdf.index,
                dtype="object",
            )
            if not include_text:
                pdf = pdf.drop(columns=[html_col])
            n = texts.str.len()
            safe_n = n.clip(lower=1).astype("float64")
            tok_lists = texts.str.split()
            toks = tok_lists.str.len().fillna(0)
            safe_t = toks.clip(lower=1).astype("float64")
            if include_text:
                pdf["extracted_text"] = texts
            pdf["q_n_chars"] = n.astype("Int64")
            pdf["q_n_tokens"] = toks.astype("Int64")
            pdf["q_punct_ratio"] = texts.str.count(r"[.,;:!?]") / safe_n
            pdf["q_digit_ratio"] = texts.str.count(r"[0-9]") / safe_n
            pdf["q_upper_ratio"] = texts.str.count(r"[A-Z]") / safe_n
            pdf["q_stopword_ratio"] = (
                tok_lists.map(
                    lambda ts: sum(t.lower() in _STOP_SET for t in ts)
                    if ts is not None
                    else 0
                )
                / safe_t
            )
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# ------------------------------------------------------------ V2 --------
# JVM-side text features (no Python at all — preferred)


def n_chars(col: str | Column = "text") -> Column:
    return F.length(col).cast("long")


def n_tokens_ws(col: str | Column = "text") -> Column:
    """Whitespace token count, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    ).cast("long")


def n_tokens_bpe_ish(col: str | Column = "text") -> Column:
    """BPE-ish token count: words, numbers, and single punctuation marks
    each count as one token (a regex approximation of byte-pair units)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^\sA-Za-z0-9])"), 1)
    return F.size(arr).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punctuation / digit
    / uppercase / stopword ratios — all built-in expressions, fully
    codegen'd, zero Python."""
    c = F.col(text_col)
    length = F.length(c).cast("double")
    safe_len = F.greatest(length, F.lit(1.0))
    toks = n_tokens_ws(text_col).cast("double")
    safe_toks = F.greatest(toks, F.lit(1.0))
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(c), r"\s+"),
            lambda t: F.array_contains(F.lit(STOPWORDS), t),
        )
    ).cast("double")
    return (
        df.withColumn("q_n_chars", length.cast("long"))
        .withColumn("q_n_tokens", toks.cast("long"))
        .withColumn(
            "q_mean_token_len",
            (length - (toks - F.lit(1.0))) / safe_toks,
        )
        .withColumn(
            "q_punct_ratio",
            F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / safe_len,
        )
        .withColumn(
            "q_digit_ratio", F.length(F.regexp_replace(c, r"[^0-9]", "")) / safe_len
        )
        .withColumn(
            "q_upper_ratio",
            F.length(F.regexp_replace(c, r"[^A-Z]", "")) / safe_len,
        )
        .withColumn("q_stopword_ratio", stop_hits / safe_toks)
    )


# language-ID: tiny per-language stopword/ngram profiles; the score is the
# hit-rate of each profile's marker words — a deterministic heuristic, not
# a model (the real model would be a broadcast fastText-style table).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por"],
}


def lang_id(col: str | Column = "text") -> Column:
    """Heuristic language ID: argmax over marker-word hit counts; ties and
    zero-hit rows → 'zz' (unknown). Pure JVM expressions."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(c), r"[^a-zäöüéèàç]+")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(
            F.filter(words, lambda t: F.array_contains(F.lit(markers), t))
        )
        scores.append((lang, hits))
    best = F.lit("zz")
    best_n = F.lit(0)
    for lang, hits in scores:
        take = hits > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, hits).otherwise(best_n)
    return best


def doc_fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: xxhash64 of whitespace-normalized lowercase
    text — a rolling-hash-grade exact-dup key, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(c), r"\s+", " "))


def char_class_ratios_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """V2 demonstration kernel as a scalar pandas UDF (Arrow-batched):
    same ratios as quality_features but computed in numpy — used in tests
    to cross-check the JVM expressions."""
    import numpy as np

    @F.pandas_udf("double")
    def punct_ratio(s: pd.Series) -> pd.Series:
        out = s.str.count(r"[.,;:!?]") / s.str.len().clip(lower=1)
        return out.astype("float64")

    return df.withColumn("q_punct_ratio_py", punct_ratio(F.col(text_col)))
