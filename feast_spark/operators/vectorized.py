"""Vectorized-UDF operator surface (SURVEY.md §2.9 V3/V4/V5): the three
Arrow-batched shapes beyond mapInPandas — grouped-map (applyInPandas),
grouped-agg (pandas_udf GROUPED_AGG), and mapInArrow — each exposed as a
reusable operator with a SQL-checkable semantic so the driver harness
verifies them against DuckDB, not just "it ran".
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def znorm_per_key(
    df: DataFrame,
    value_col: str,
    *,
    key: str,
    out_col: str = "z",
    ddof: int = 1,
) -> DataFrame:
    """V3 grouped-map: per-key z-score via ``applyInPandas`` — the
    canonical "per-entity normalization" feature transform. Semantically
    identical to ``(x - avg) / stddev`` window expressions (the DuckDB
    oracle), but computed vectorized per group; groups with stddev 0 or a
    single row yield NULL."""
    fields = list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    schema = T.StructType(fields)

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=ddof)
        pdf[out_col] = (v - v.mean()) / sd if sd and sd > 0 else None
        return pdf

    return df.groupBy(key).applyInPandas(norm, schema=schema)


def grouped_quantile(
    df: DataFrame,
    value_col: str,
    *,
    key: str,
    q: float = 0.5,
    out_col: str = "q_value",
) -> DataFrame:
    """V4 grouped-agg: numpy linear-interpolated quantile as a
    ``pandas_udf(GROUPED_AGG)`` — matches DuckDB's ``quantile_cont``
    exactly (same interpolation), so it is oracle-checkable unlike
    Spark's own ``percentile_approx``."""
    import numpy as np

    @F.pandas_udf("double")
    def quant(v: pd.Series) -> float:
        arr = v.dropna().to_numpy(dtype="float64")
        if arr.size == 0:
            return None
        return float(np.quantile(arr, q))

    return df.groupBy(key).agg(quant(F.col(value_col)).alias(out_col))


def arrow_byte_stats(
    df: DataFrame,
    bin_col: str = "payload",
    *,
    prefix: str = "b",
) -> DataFrame:
    """V5 mapInArrow: zero-copy per-row byte statistics over a binary
    column using pyarrow compute only — no pandas conversion. The shape
    to use when the pandas hop itself is the bottleneck (MB-scale
    payloads). Emits byte length and first/last byte values."""
    fields = list(df.schema.fields) + [
        T.StructField(f"{prefix}_len", T.LongType()),
        T.StructField(f"{prefix}_first", T.IntegerType()),
        T.StructField(f"{prefix}_last", T.IntegerType()),
    ]
    schema = T.StructType(fields)

    def kernel(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in it:
            col = batch.column(batch.schema.get_field_index(bin_col))
            lens = pc.binary_length(col).cast(pa.int64())
            firsts, lasts = [], []
            for v in col:
                b = v.as_py()
                if b is None or len(b) == 0:
                    firsts.append(None)
                    lasts.append(None)
                else:
                    firsts.append(b[0])
                    lasts.append(b[-1])
            arrays = list(batch.columns) + [
                lens,
                pa.array(firsts, pa.int32()),
                pa.array(lasts, pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in fields]
            )

    return df.mapInArrow(kernel, schema=schema)


def on_demand_transform(
    df: DataFrame,
    fn,
    out_schema: list[tuple[str, str]],
) -> DataFrame:
    """On-demand feature view engine (upstream feast
    ``on_demand_feature_view.py``: a pandas row-transform applied at
    retrieval time on top of retrieved features). ``fn`` maps a pandas
    DataFrame of the input features to a DataFrame of the new feature
    columns; applied per Arrow batch, appended to the input columns."""
    fields = list(df.schema.fields) + [
        T.StructField(n, getattr(T, "_parse_datatype_string")(t))
        for n, t in out_schema
    ]
    schema = T.StructType(fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            extra = fn(pdf)
            for c in extra.columns:
                pdf[c] = extra[c].values
            yield pdf

    return df.mapInPandas(batches, schema=schema)
