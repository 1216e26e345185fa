"""Plan-time cardinality estimation with ZERO Spark jobs (VERDICT r03
next #5: the planner's ``probes.count()`` / ``queries.count()``
fallbacks were one extra job per retrieval/ANN call).

Sources, in order of trust:

1. Catalyst ``maxRows`` on the optimized plan — EXACT upper bound when
   defined (Range, LocalRelation, Limit, and projections/filters over
   them). This keeps plan-derived knees (e.g. the 100k broadcast
   threshold) exact for ``spark.range``/local inputs.
2. Parquet footer row counts over the scan's ``inputFiles()`` — exact
   for an unfiltered scan, an UPPER bound under filters/joins (safe for
   broadcast-vs-shuffle routing: overestimating rows routes to the
   unbounded-safe strategy). Footer reads are driver-side metadata-only;
   above ``_FOOTER_SAMPLE`` files a sample extrapolates so a 100 TB
   table costs ~32 footer reads, not millions.
3. Catalyst ``sizeInBytes`` divided by a schema-derived row width —
   rough, but available for any file-backed plan. Arrow-backed
   ``createDataFrame`` yields LogicalRDD with sentinel MaxValue stats
   (measured on this Spark 4.1 build), which is rejected.

Returns None when the plan exposes nothing usable — callers fall back
to the strategy that is safe at unbounded cardinality, or run an
explicit count only when the caller opted in.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_FOOTER_SAMPLE = 32
# Plan nodes whose output row count is NOT bounded by the sum of their
# inputs' rows (Join/Generate/Expand multiply; the Python-eval nodes and
# Union hide arbitrary or non-file children). Footer sums and
# sizeInBytes/row-width are only upper bounds for linear plans
# (scan/filter/project/aggregate/window), so any of these in the
# optimized plan disqualifies sources 2 and 3 — estimate_rows returns
# None and callers take the unbounded-safe strategy. Word-bounded match
# against the plan tree string; a false positive (e.g. a column literally
# named "Join") only errs in the safe direction.
_FANOUT_NODES = re.compile(
    r"\b(Join|Generate|Expand|CoGroup|FlatMap\w*|MapInPandas|"
    r"PythonMapInArrow|MapPartitions|MapElements|Union)\b"
)
# conservative in-memory bytes per value by Spark type (used only to
# turn sizeInBytes into a row-count order of magnitude)
_TYPE_WIDTH = {
    "boolean": 1,
    "byte": 1,
    "short": 2,
    "integer": 4,
    "long": 8,
    "float": 4,
    "double": 8,
    "date": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
    "string": 20,
    "binary": 40,
}


def _local_path(uri: str) -> str:
    if uri.startswith("file:"):
        from urllib.parse import urlparse
        from urllib.request import url2pathname

        return url2pathname(urlparse(uri).path)
    return uri


def estimate_rows(df: DataFrame) -> int | None:
    """Best-effort row-count estimate for ``df`` WITHOUT running a job.
    Exact for plan-bounded inputs (range/local/limit) and unfiltered
    parquet scans; an upper bound under filters; None when nothing in
    the plan is usable (e.g. Arrow/RDD-backed data, whose Catalyst
    stats are a MaxValue sentinel)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        mr = plan.maxRows()
        if mr.isDefined():
            return int(mr.get())
    except Exception:
        return None
    # Past this point estimates derive from the LEAVES (file footers /
    # total byte size), which only upper-bound the output of linear
    # plans. A join/explode/Python-eval node can fan one input row out
    # to millions — give up rather than report a bound that isn't one.
    try:
        if _FANOUT_NODES.search(plan.toString()):
            return None
    except Exception:
        return None
    files = [f for f in df.inputFiles() if f.endswith(".parquet")]
    if files:
        try:
            import pyarrow.parquet as pq

            def rows(path: str) -> int:
                return pq.ParquetFile(_local_path(path)).metadata.num_rows

            if len(files) <= _FOOTER_SAMPLE:
                return sum(rows(f) for f in files)
            # deterministic stride sample, extrapolated by file count
            step = len(files) // _FOOTER_SAMPLE
            sampled = files[::step][:_FOOTER_SAMPLE]
            avg = sum(rows(f) for f in sampled) / len(sampled)
            return int(avg * len(files))
        except Exception:
            pass
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes())
    except Exception:
        return None
    if not 0 < size < (1 << 62):  # MaxValue sentinel / empty
        return None
    width = sum(
        _TYPE_WIDTH.get(f.dataType.typeName(), 24) for f in df.schema.fields
    )
    return max(1, size // max(width, 1))
