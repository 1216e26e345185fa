"""Point-in-time-correct as-of join — THE core operator (SURVEY.md §2.3).

Semantics (upstream Feast get_historical_features / the
MULTIPLE_FEATURE_VIEW_POINT_IN_TIME_JOIN SQL template in
offline_utils.py; local reference is a stub — SURVEY.md §0.1):

For each probe row ``(by, ts)`` return the feature values of the LATEST
feature row with ``event_ts <= ts`` (at-or-before; equality matches) and,
if a TTL is given, ``event_ts >= ts - ttl``. Ties on event_ts break by max
``created_ts``, then by a deterministic hash (our strengthening — upstream
leaves sub-created ties unspecified). Left semantics: a probe with no
qualifying feature row keeps NULL features. Zero temporal leakage: no
value from an event after the probe ts, ever.

PySpark 4.1.2 has no native asOfJoin (verified), so four strategies:

- ``union``  (J1): union probes+events, one window per url, forward-fill a
  payload struct. One shuffle on ``by``; scales to any probe cardinality;
  the default.
- ``broadcast`` (J2): broadcast the (distinct) probe set, equi-join on
  ``by`` with the TTL range as join condition, keep row_number()==1 per
  probe. Best when probes are small; zero shuffle of the big side beyond
  the scan.
- ``cogroup`` (J3): hash-bucket both sides on ``by``, per-bucket pandas
  ``merge_asof`` (vectorized, no per-row Python). This is the
  "sort-merge over url-hash-partitioned partitions" path of the north
  rule — when both sides are already bucket-laid-out (sources.layout),
  the shuffle is a cheap B-way repartition on a precomputed bucket id.
- ``sliced`` (J1-hot): union+window partitioned by (key, time-slice)
  with per-slice carry-ins — the segmented-scan parallelization of the
  forward fill. The ONLY strategy whose per-task state is bounded for a
  single hot key (buckets and salts can't split one key; its timeline
  can). The planner routes manifest-detected hot keys here.

All strategies forward-fill/select a STRUCT of the full feature payload,
not per-column fills — so a legitimately-NULL feature value in the latest
row stays NULL instead of leaking an older value.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ETS = "__asof_event_ts"


def _ttl_seconds(ttl: timedelta | int | float | None) -> float | None:
    if ttl is None:
        return None
    if isinstance(ttl, timedelta):
        return ttl.total_seconds()
    return float(ttl)


def _tiebreak_hash(features: DataFrame, cols: list[str]) -> Column:
    """Deterministic total-order tiebreak for rows sharing (by, event_ts,
    created_ts) — required so window/merge results are permutation-
    invariant (SURVEY.md §7.3.2)."""
    return F.xxhash64(*[F.col(c) for c in cols])


def asof_join(
    probes: DataFrame,
    features: DataFrame,
    *,
    by: str | list[str] = "url",
    left_on: str = "ts",
    right_on: str = "warc_ts",
    ttl: timedelta | int | None = None,
    created_col: str | None = None,
    feature_cols: list[str] | None = None,
    strategy: str = "union",
    include_event_ts: bool = False,
    event_ts_name: str = "event_ts",
    n_buckets: int | None = None,
    slice_s: float | None = None,
) -> DataFrame:
    """Dispatch to a PIT-join strategy. Output = all probe columns +
    ``feature_cols`` (+ the matched event ts if ``include_event_ts``).

    ``by`` may be a list for composite entity keys (upstream: a view
    referencing several entities joins on all their keys); every
    strategy treats the tuple as one logical key. An EMPTY list is the
    entity-less (global) view (upstream's DUMMY_ENTITY): every probe
    matches the one global feature timeline — implemented by injecting a
    constant key on both sides, so the whole timeline lands in one
    window partition (global tables are small by construction; a large
    one should be given a real entity)."""
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        dummy = "__feast_dummy_entity__"
        out = asof_join(
            probes.withColumn(dummy, F.lit(1)),
            features.withColumn(dummy, F.lit(1)),
            by=dummy, left_on=left_on, right_on=right_on, ttl=ttl,
            created_col=created_col, feature_cols=feature_cols,
            strategy=strategy, include_event_ts=include_event_ts,
            event_ts_name=event_ts_name, n_buckets=n_buckets,
            slice_s=slice_s,
        )
        return out.drop(dummy)
    if feature_cols is None:
        skip = {*by, right_on}
        if created_col:
            skip.add(created_col)
        feature_cols = [c for c in features.columns if c not in skip]
    clash = (set(feature_cols) | {event_ts_name} if include_event_ts else set(feature_cols)) & set(
        probes.columns
    )
    if clash:
        raise ValueError(f"probe/feature column collision: {sorted(clash)}")

    # normalize event-time columns: parquet timestamp[us] loads as
    # TIMESTAMP_NTZ in Spark 4 and breaks interval/epoch arithmetic
    probes = probes.withColumn(left_on, F.col(left_on).cast("timestamp"))
    features = features.withColumn(right_on, F.col(right_on).cast("timestamp"))
    if created_col:
        features = features.withColumn(created_col, F.col(created_col).cast("timestamp"))

    kw = dict(
        by=by, left_on=left_on, right_on=right_on, ttl=_ttl_seconds(ttl),
        created_col=created_col, feature_cols=feature_cols,
        include_event_ts=include_event_ts, event_ts_name=event_ts_name,
    )
    if strategy == "union":
        return _asof_union_window(probes, features, **kw)
    if strategy == "broadcast":
        return _asof_broadcast(probes, features, **kw)
    if strategy == "cogroup":
        return _asof_cogroup(probes, features, n_buckets=n_buckets, **kw)
    if strategy == "sliced":
        return _asof_union_sliced(probes, features, slice_s=slice_s, **kw)
    raise ValueError(f"unknown asof strategy: {strategy!r}")


# ---------------------------------------------------------------- J1 ----
def _asof_union_window(
    probes: DataFrame,
    features: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    ttl: float | None,
    created_col: str | None,
    feature_cols: list[str],
    include_event_ts: bool,
    event_ts_name: str,
) -> DataFrame:
    """Union+window: the Feast-0.9 PySpark strategy (upstream
    historical_feature_retrieval_job.py), re-derived. Single shuffle
    (window partitionBy ``by``); probes and events sort together so the
    at-or-before boundary falls out of the sort order (events sort BEFORE
    probes at equal ts → equality matches; after → leakage impossible)."""
    payload = F.struct(
        F.col(right_on).alias(_ETS),
        *[F.col(c).alias(c) for c in feature_cols],
    )
    created = (
        F.col(created_col) if created_col else F.lit(None).cast("timestamp")
    )
    ev = features.select(
        *[F.col(c).alias(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_probe"),
        created.alias("__created"),
        _tiebreak_hash(features, feature_cols).alias("__tb"),
        payload.alias("__payload"),
    )
    pr = probes.select(
        *[F.col(c) for c in probes.columns],
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_probe"),
    )
    u = pr.unionByName(ev, allowMissingColumns=True)

    # within a url: order by ts; at equal ts events (0) precede probes (1);
    # among equal-ts events ascending (created, hash) so last-wins = max
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_probe").asc(),
            F.col("__created").asc_nulls_first(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__fill", F.last("__payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("__is_probe") == 1)

    valid = F.col("__fill").isNotNull()
    if ttl is not None:
        # epoch-double comparison: interval literals don't take float
        # seconds, and TIMESTAMP_NTZ can't cast straight to long (§0.3)
        valid = valid & (
            F.col("__fill")[_ETS].cast("double")
            >= F.col(left_on).cast("double") - F.lit(ttl)
        )
    sel: list[Column] = [F.col(c) for c in probes.columns]
    for c in feature_cols:
        sel.append(F.when(valid, F.col("__fill")[c]).alias(c))
    if include_event_ts:
        sel.append(F.when(valid, F.col("__fill")[_ETS]).alias(event_ts_name))
    return out.select(*sel)


# ------------------------------------------------------------ J1-hot ----
def _asof_union_sliced(
    probes: DataFrame,
    features: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    ttl: float | None,
    created_col: str | None,
    feature_cols: list[str],
    include_event_ts: bool,
    event_ts_name: str,
    slice_s: float | None,
) -> DataFrame:
    """Time-sliced union+window for HOT keys — the segmented-scan
    parallelization of the as-of forward fill (r02 review: no bucket or
    salt bound helps a single key bigger than one task; only slicing its
    TIMELINE does).

    1. Partition probes+events by (key, slice = floor(ts / W)) and
       forward-fill within each slice — per-task state is one slice of
       one key, regardless of how hot the key is.
    2. Per (key, slice), take the LATEST event payload (map-side
       combinable max_by); a tiny per-slice table.
    3. Carry-in for slice w = last payload over slices < w — a window
       over the per-slice table (O(#slices) rows per key, not O(rows)).
    4. A probe's match = within-slice fill, else its slice's carry-in.
       TTL applies afterwards on the payload's true event ts, exactly as
       in plain union.

    Cost: two extra small shuffles vs plain union; identical results
    (property-tested against union in tests/test_asof.py)."""
    if slice_s is None:
        slice_s = ttl if ttl else 30 * 86400.0
    payload = F.struct(
        F.col(right_on).alias(_ETS),
        *[F.col(c).alias(c) for c in feature_cols],
    )
    created = (
        F.col(created_col) if created_col else F.lit(None).cast("timestamp")
    )
    w_of = lambda c: F.floor(F.col(c).cast("double") / F.lit(float(slice_s)))  # noqa: E731

    ev = features.select(
        *[F.col(c).alias(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_probe"),
        created.alias("__created"),
        _tiebreak_hash(features, feature_cols).alias("__tb"),
        payload.alias("__payload"),
    ).withColumn("__w", w_of("__t"))
    pr = probes.select(
        *[F.col(c) for c in probes.columns],
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__is_probe"),
    ).withColumn("__w", w_of("__t"))
    u = pr.unionByName(ev, allowMissingColumns=True)

    in_slice = (
        Window.partitionBy(*by, "__w")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_probe").asc(),
            F.col("__created").asc_nulls_first(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__fill", F.last("__payload", ignorenulls=True).over(in_slice))

    # per-(key, slice) latest event payload → carry-in per slice.
    # max_by's struct ordering (nulls smallest) matches the fill's
    # asc_nulls_first tie-break, so slice boundaries are seamless. The
    # slice index spans PROBE slices too — a probe slice with no events
    # still needs the carry from earlier slices.
    ev_last = ev.groupBy(*by, "__w").agg(
        F.max_by(
            F.col("__payload"),
            F.struct(F.col("__t"), F.col("__created"), F.col("__tb")),
        ).alias("__last")
    )
    slice_last = (
        u.select(*by, "__w").distinct()
        .join(ev_last, on=[*by, "__w"], how="left")
    )
    over_slices = (
        Window.partitionBy(*by)
        .orderBy("__w")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = slice_last.withColumn(
        "__carry", F.last("__last", ignorenulls=True).over(over_slices)
    ).select(*by, "__w", "__carry")

    out = (
        filled.filter(F.col("__is_probe") == 1)
        .join(carry, on=[*by, "__w"], how="left")
        .withColumn("__best", F.coalesce(F.col("__fill"), F.col("__carry")))
    )
    valid = F.col("__best").isNotNull()
    if ttl is not None:
        valid = valid & (
            F.col("__best")[_ETS].cast("double")
            >= F.col(left_on).cast("double") - F.lit(ttl)
        )
    sel: list[Column] = [F.col(c) for c in probes.columns]
    for c in feature_cols:
        sel.append(F.when(valid, F.col("__best")[c]).alias(c))
    if include_event_ts:
        sel.append(F.when(valid, F.col("__best")[_ETS]).alias(event_ts_name))
    return out.select(*sel)


# ---------------------------------------------------------------- J2 ----
def _asof_broadcast(
    probes: DataFrame,
    features: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    ttl: float | None,
    created_col: str | None,
    feature_cols: list[str],
    include_event_ts: bool,
    event_ts_name: str,
) -> DataFrame:
    """Broadcast the distinct probe set; range-join + keep latest per
    probe. The big (features) side is scanned once, never shuffled on a
    new key: the window partitions by (by, ts) which the join already
    co-located."""
    p = probes.select(*by, left_on).distinct().alias("p")
    f = features.alias("f")
    cond = F.col(f"f.{right_on}") <= F.col(f"p.{left_on}")
    for k in by:
        cond = cond & (F.col(f"p.{k}") == F.col(f"f.{k}"))
    if ttl is not None:
        cond = cond & (
            F.col(f"f.{right_on}").cast("double")
            >= F.col(f"p.{left_on}").cast("double") - F.lit(ttl)
        )
    j = F.broadcast(p).join(f, cond, "inner")
    created = (
        F.col(f"f.{created_col}") if created_col else F.lit(None).cast("timestamp")
    )
    w = Window.partitionBy(
        *[F.col(f"p.{k}") for k in by], F.col(f"p.{left_on}")
    ).orderBy(
        F.col(f"f.{right_on}").desc(),
        created.desc_nulls_last(),
        _tiebreak_hash(f, [f"f.{c}" for c in feature_cols]).desc_nulls_last(),
    )
    # internal alias when the caller doesn't want the matched event ts:
    # dropping by the public name would also delete a probe column that
    # happens to share it (probes keep ALL their columns in the output)
    ets_alias = event_ts_name if include_event_ts else "__asof_ets_tmp"
    best = (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"p.{k}").alias(k) for k in by],
            F.col(f"p.{left_on}").alias(left_on),
            *[F.col(f"f.{c}").alias(c) for c in feature_cols],
            F.col(f"f.{right_on}").alias(ets_alias),
        )
    )
    out = probes.join(F.broadcast(best), on=[*by, left_on], how="left")
    if not include_event_ts:
        out = out.drop("__asof_ets_tmp")
    return out


# ---------------------------------------------------------------- J3 ----
def _asof_cogroup(
    probes: DataFrame,
    features: DataFrame,
    *,
    by: list[str],
    left_on: str,
    right_on: str,
    ttl: float | None,
    created_col: str | None,
    feature_cols: list[str],
    include_event_ts: bool,
    event_ts_name: str,
    n_buckets: int | None,
) -> DataFrame:
    """Bucketed cogroup + pandas ``merge_asof`` per bucket — the explicit
    sort-merge path of the north rule. Both sides repartition on
    ``pmod(xxhash64(by), B)`` (the SAME transform sources.layout writes
    with, so layout-aligned inputs shuffle minimally), then one vectorized
    merge per bucket."""
    import pandas as pd

    spark = probes.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "64"))

    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in by]), F.lit(n_buckets)
    ).alias("__b")
    pb = probes.withColumn("__b", bucket)
    fsel = [*by, right_on, *feature_cols] + ([created_col] if created_col else [])
    # tiebreak hash computed JVM-side with the SAME xxhash64 as J1/J2 so
    # all three strategies are bit-identical on (ts, created) ties.
    # Columns are re-aliased: when probes and features share lineage,
    # cogroup silently DROPS right-side columns whose attribute exprId
    # also appears on the left (observed on Spark 4.1.2) — a fresh Alias
    # per column breaks the shared ids.
    fb = (
        features.select(*[F.col(c).alias(c) for c in fsel])
        .withColumn("__tb", _tiebreak_hash(features, feature_cols))
        .withColumn("__b", bucket)
    )

    probe_fields = [f for f in probes.schema.fields]
    feat_fields = [features.schema[c] for c in feature_cols]
    out_schema_parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in probe_fields]
    out_schema_parts += [f"`{f.name}` {f.dataType.simpleString()}" for f in feat_fields]
    if include_event_ts:
        out_schema_parts.append(f"`{event_ts_name}` timestamp")
    out_schema = ", ".join(out_schema_parts)

    probe_cols = [f.name for f in probe_fields]
    int_like = {
        f.name
        for f in feat_fields
        if f.dataType.simpleString() in ("bigint", "int", "smallint", "tinyint")
    }
    tol = pd.Timedelta(seconds=ttl) if ttl is not None else None
    ets_out = event_ts_name if include_event_ts else None

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.drop(columns="__b")
        right = right.drop(columns="__b")
        out_cols = probe_cols + feature_cols + ([ets_out] if ets_out else [])

        def _nullfeat(rows: pd.DataFrame) -> pd.DataFrame:
            res = rows.copy()
            for c in feature_cols:
                res[c] = None
            if ets_out:
                res[ets_out] = pd.NaT
            return res[out_cols]

        if len(left) == 0:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        # NULL probe ts rows: merge_asof rejects unsorted NaT keys; J1/J2
        # give them NULL features — match that (strategy equivalence)
        null_ts = left[left[left_on].isna()]
        left = left[left[left_on].notna()]
        if len(right) == 0 or len(left) == 0:
            return pd.concat(
                [_nullfeat(left), _nullfeat(null_ts)], ignore_index=True
            )
        sort_rhs = [right_on] + ([created_col] if created_col else [])
        # na_position="first" matches J1's asc_nulls_first: a NULL
        # created_ts loses ties against any non-NULL one
        right = right.sort_values(
            sort_rhs + ["__tb"], kind="mergesort", na_position="first"
        ).reset_index(drop=True)
        right = right.rename(columns={right_on: "__rts"})
        left = left.sort_values(left_on, kind="mergesort").reset_index(drop=True)
        merged = pd.merge_asof(
            left,
            right.drop(columns=["__tb"] + ([created_col] if created_col else [])),
            left_on=left_on,
            right_on="__rts",
            by=by,
            direction="backward",
            allow_exact_matches=True,
            tolerance=tol,
        )
        for c in int_like:
            merged[c] = merged[c].astype("Int64")
        if ets_out:
            merged[ets_out] = merged["__rts"]
        merged = merged[out_cols]
        if len(null_ts):
            merged = pd.concat([merged, _nullfeat(null_ts)], ignore_index=True)
        return merged

    return (
        pb.groupBy("__b")
        .cogroup(fb.groupBy("__b"))
        .applyInPandas(merge, schema=out_schema)
    )


# ---------------------------------------------------------------- J4 ----
def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Key-salted equi-join for hot keys (north rule: "key-salting for hot
    domains"). The big side gets a random-ish-but-deterministic salt from
    xxhash64 of its other columns; the small side is exploded ``salt``
    ways so every (key, salt) pair finds its match. AQE skew-join is the
    runtime backstop; this is the explicit control for when stats are
    known up front.

    Only inner/left (big-side-preserving) joins: outer semantics on the
    exploded small side would emit ``salt`` null-padded copies of every
    unmatched small-side key."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}"
        )
    other = [c for c in big.columns if c != on] or [on]
    bigs = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in other]), F.lit(salt))
    )
    smalls = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = bigs.join(smalls, on=[on, "__salt"], how=how)
    return out.drop("__salt")
