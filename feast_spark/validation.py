"""Expectation-based data validation (SURVEY.md §8 round-3; upstream
Feast pairs retrieval with dataset validation — feast's SavedDataset
validation hooks / dbt-tests-style checks re-expressed Spark-first).

``validate_table(df, expectations)`` evaluates every expectation in ONE
aggregation pass over the table (all measures are map-side-combinable
aggregates; ``unique`` adds exact distinct counts, the only
shuffle-heavier measure) and returns one row per expectation:
``(kind, column, passed, observed)``. ``observed`` is the measured
quantity the check compared against (null fraction, violation count,
row count, …) so failures are diagnosable without a second scan.

Expectation dicts (dbt-test vocabulary):

- ``{"kind": "row_count_min", "value": n}``
- ``{"kind": "not_null", "column": c[, "max_null_frac": f]}``
- ``{"kind": "unique", "columns": [c, ...]}`` — no duplicate tuples
- ``{"kind": "accepted_range", "column": c[, "min": lo][, "max": hi]}``
- ``{"kind": "accepted_values", "column": c, "values": [...]}``

At 100 TB this stays a single scan + one reduce; nothing is collected
but the per-expectation summary row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = {"row_count_min", "not_null", "unique", "accepted_range", "accepted_values"}


def _c(name: str) -> Column:
    # backticked: dotted column names must not parse as struct access
    return F.col("`" + name + "`")


def validate_table(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """One row per expectation: (kind, column, passed, observed)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, exp in enumerate(expectations):
        kind = exp.get("kind")
        if kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {kind!r}")
        if kind == "row_count_min":
            continue  # __n covers it
        if kind == "not_null":
            aggs.append(
                F.sum(_c(exp["column"]).isNull().cast("long")).alias(f"__m{i}")
            )
        elif kind == "unique":
            cols = [_c(c) for c in exp["columns"]]
            # struct(...) is never NULL (even with null fields), so the
            # distinct count covers every row — dupes = n − distinct
            aggs.append(F.count_distinct(F.struct(*cols)).alias(f"__m{i}"))
        elif kind == "accepted_range":
            c = _c(exp["column"])
            viol = F.lit(False)
            if exp.get("min") is not None:
                viol = viol | (c < F.lit(exp["min"]))
            if exp.get("max") is not None:
                viol = viol | (c > F.lit(exp["max"]))
            aggs.append(F.sum(viol.cast("long")).alias(f"__m{i}"))
        elif kind == "accepted_values":
            c = _c(exp["column"])
            viol = c.isNotNull() & ~c.isin(exp["values"])
            aggs.append(F.sum(viol.cast("long")).alias(f"__m{i}"))
    row = df.agg(*aggs)

    out_rows: list[Column] = []
    for i, exp in enumerate(expectations):
        kind = exp["kind"]
        col_name = exp.get("column") or ",".join(exp.get("columns", [])) or None
        if kind == "row_count_min":
            observed = F.col("__n").cast("double")
            passed = F.col("__n") >= F.lit(int(exp["value"]))
        elif kind == "not_null":
            # coalesce: sum() over an empty table is NULL — an empty
            # table has a 0.0 null fraction, not an undefined one
            observed = F.coalesce(F.col(f"__m{i}"), F.lit(0)) / F.greatest(
                F.col("__n"), F.lit(1)
            )
            passed = observed <= F.lit(float(exp.get("max_null_frac", 0.0)))
        elif kind == "unique":
            dupes = F.col("__n") - F.col(f"__m{i}")
            observed = dupes.cast("double")
            passed = dupes <= 0
        else:  # accepted_range / accepted_values: violation count
            observed = F.coalesce(F.col(f"__m{i}"), F.lit(0)).cast("double")
            passed = observed == 0
        out_rows.append(
            F.struct(
                F.lit(kind).alias("kind"),
                F.lit(col_name).cast("string").alias("column"),
                passed.alias("passed"),
                observed.alias("observed"),
            )
        )
    return row.select(F.explode(F.array(*out_rows)).alias("e")).select("e.*")


def expect(df: DataFrame, expectations: list[dict]) -> None:
    """Raise ``ValueError`` listing every failed expectation (the CI /
    pipeline-gate form of ``validate_table``)."""
    failed = [
        (r["kind"], r["column"], r["observed"])
        for r in validate_table(df, expectations).collect()
        if not r["passed"]
    ]
    if failed:
        msgs = ", ".join(
            f"{k}({c}) observed={o}" for k, c, o in failed
        )
        raise ValueError(f"{len(failed)} expectation(s) failed: {msgs}")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    min_frac: float = 1e-4,
) -> DataFrame:
    """Population Stability Index drift between a reference slice and the
    current slice of ``column`` — the standard "did this crawl's
    distribution move?" gate (PSI < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted; the credit-scoring convention).

    Fixed-width bins over the EXPLICIT ``[lo, hi)`` (values clamp into
    the edge bins, so outliers register as tail mass rather than
    vanishing; pass bounds from domain knowledge or a prior profile —
    computing them here would add a scan and make two runs' bins
    incomparable). NULLs are excluded from both sides. Bin fractions are
    floored at ``min_frac`` before the log ratio (the standard guard:
    an empty bin contributes large-but-finite drift instead of ±inf).

    One map-side-combinable aggregation per side (≤``bins`` keys), an
    outer join on the bin id, arithmetic — nothing driver-side. Returns
    one row per bin: (bin, p_ref, p_cur, psi) — ``sum(psi)`` is the
    index; keeping per-bin terms makes the drift diagnosable (WHICH part
    of the distribution moved) without a second scan."""
    if bins < 1 or hi <= lo:
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.floor((_c(column).cast("double") - F.lit(lo)) / F.lit(width))
        b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
        return (
            df.filter(_c(column).isNotNull())
            .groupBy(b.cast("int").alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    r = binned(ref, "__nr")
    c = binned(cur, "__nc")
    joined = r.join(c, "bin", "full_outer").select(
        "bin",
        F.coalesce(F.col("__nr"), F.lit(0)).alias("__nr"),
        F.coalesce(F.col("__nc"), F.lit(0)).alias("__nc"),
    )
    tot = joined.select(
        F.sum("__nr").alias("tr"), F.sum("__nc").alias("tc")
    )
    p_ref = F.greatest(
        F.col("__nr") / F.greatest(F.col("tr"), F.lit(1)), F.lit(min_frac)
    )
    p_cur = F.greatest(
        F.col("__nc") / F.greatest(F.col("tc"), F.lit(1)), F.lit(min_frac)
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            p_ref.alias("p_ref"),
            p_cur.alias("p_cur"),
            ((p_cur - p_ref) * (F.log(p_cur) - F.log(p_ref))).alias("psi"),
        )
        .orderBy("bin")
    )


def expect_no_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    threshold: float = 0.25,
) -> float:
    """Pipeline-gate form of :func:`psi_drift`: returns the total PSI,
    raising ``ValueError`` (with the worst bins named) when it exceeds
    ``threshold``."""
    rows = psi_drift(ref, cur, column, lo=lo, hi=hi, bins=bins).collect()
    total = sum(r["psi"] for r in rows)
    if total > threshold:
        worst = sorted(rows, key=lambda r: -r["psi"])[:3]
        detail = ", ".join(
            f"bin {r['bin']}: {r['p_ref']:.4f}->{r['p_cur']:.4f}"
            for r in worst
        )
        raise ValueError(
            f"PSI drift {total:.4f} > {threshold} on {column!r} ({detail})"
        )
    return total
