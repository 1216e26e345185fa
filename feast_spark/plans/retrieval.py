"""Historical-retrieval planner (SURVEY.md §3.1, §4.2.1).

Resolves ``"view:feature"`` refs against the registry and chains one
PIT/as-of join per feature view onto the entity dataframe — the upstream
get_historical_features lifecycle (feature_store.py → offline store PIT
template), re-expressed as DataFrame composition.

Strategy policy (``strategy=None`` → auto):

- probes estimated ≤ BROADCAST_PROBE_ROWS → ``broadcast`` (J2): the big
  feature table is scanned once and never re-shuffled;
- both sides carry our layout's bucket metadata (sources.layout) with the
  same bucket count → ``cogroup`` (J3): per-bucket sort-merge, minimal
  shuffle;
- else ``union`` (J1): one shuffle on the entity key, unbounded probe
  cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from feast_spark.operators.asof import asof_join

# measured knee on the 2.1M-row pages table (local[32], BASELINE.md):
# broadcast ~3s up to 100k probes but 45s at 600k (the range-join output
# approaches the full feature table and the per-probe row_number window
# dominates); union stays ~3-5s throughout, cogroup 3.6s. Broadcast also
# costs driver/executor memory proportional to the probe set.
BROADCAST_PROBE_ROWS = 100_000

# probe sets at/below this size additionally prune layout BUCKETS: the
# distinct probe keys are collected (bounded) and only their
# pmod(xxhash64(key), B) buckets are scanned — a point-lookup-shaped
# retrieval reads ~|buckets|/B of the table instead of all of it
BUCKET_PRUNE_PROBE_ROWS = 10_000

# cogroup materializes one bucket at a time in a Python worker; when the
# manifest says the biggest bucket exceeds this many bytes, the planner
# multiplies the repartition count so every pandas merge stays bounded
# (trades the layout-aligned cheap shuffle for worker-memory safety)
COGROUP_BUCKET_BYTES = 256 << 20

# a single entity key with ≥ this many feature rows (manifest lower
# bound) flips ANY auto-chosen plan to the time-sliced strategy: union's
# partitionBy(key) window makes the hot key one giant JVM sort task,
# broadcast fans out hot_rows × probes-of-that-key, and cogroup hashes
# the whole key into ONE pandas bucket no matter how large B grows —
# only slicing the hot key's TIMELINE bounds the per-task work
# (SURVEY §4.2.2)
HOT_KEY_MIN_ROWS = 1_000_000


def choose_strategy(
    probes: DataFrame,
    probe_count_hint: int | None = None,
    *,
    layout_backed: bool = False,
    allow_count: bool = False,
) -> str:
    """DataFrame-level strategy policy (§4.2.1): small probe set →
    broadcast; large probes over a layout-backed view → cogroup (the
    bucket-aligned sort-merge — repartitions on the SAME xxhash64 bucket
    transform the table was written with); else union+window.

    Probe cardinality comes from the hint, else a zero-job plan-time
    estimate (parquet footers / Catalyst stats — VERDICT r03 next #5:
    no more implicit ``probes.count()`` job per retrieval). When neither
    yields a number the policy picks the strategy that is safe at
    unbounded cardinality; pass ``allow_count=True`` to opt back into
    the counting fallback (fine for interactive use)."""
    n = probe_count_hint
    if n is None:
        from feast_spark.estimate import estimate_rows

        n = estimate_rows(probes)
    if n is None and allow_count:
        n = probes.count()
    if n is None:
        return "cogroup" if layout_backed else "union"
    if n <= BROADCAST_PROBE_ROWS:
        return "broadcast"
    return "cogroup" if layout_backed else "union"


def plan_retrieval(
    store,
    entity_df: DataFrame,
    features: list[str],
    *,
    full_feature_names: bool = False,
    strategy: str | None = None,
    probe_count_hint: int | None = None,
    hot_key_min_rows: int = HOT_KEY_MIN_ROWS,
    cogroup_bucket_bytes: int = COGROUP_BUCKET_BYTES,
    decisions: list | None = None,
) -> DataFrame:
    """Build the retrieval DataFrame: entity_df + one PIT join per view.

    ``decisions``, when given, collects one dict per view with the chosen
    strategy and any manifest-detected hot keys — the skew decision is
    visible in the job log / tests, not hidden planner magic."""
    # group refs by view, preserving order
    by_view: dict[str, list[str]] = {}
    for ref in features:
        view, _, feat = ref.partition(":")
        if not feat:
            raise ValueError(f"feature ref must be 'view:feature', got {ref!r}")
        by_view.setdefault(view, []).append(feat)

    out = entity_df
    probe_n = None
    if strategy is None:
        probe_n = probe_count_hint
        if probe_n is None:
            # zero-job estimate computed ONCE and shared across views
            # (VERDICT r03 next #5: the old fallback was an
            # entity_df.count() job per unhinted retrieval). None simply
            # flows to choose_strategy's unbounded-safe default.
            from feast_spark.estimate import estimate_rows

            probe_n = estimate_rows(entity_df)
    probe_bounds = None
    # probe keys are join-key-specific: views may join on different
    # entity columns, so cache per column name
    probe_keys_by_col: dict[str, list] = {}
    for view_name, feats in by_view.items():
        fv = store.get_view(view_name)
        snap = None
        if fv.layout_root:
            # the pinned ref's snapshot when the view carries one — the
            # manifest used for pruning/skew stats must describe the
            # same files the scan reads
            snap = fv.layout_snapshot()
        chosen = strategy or choose_strategy(
            entity_df, probe_n, layout_backed=fv.layout_root is not None
        )
        hot_keys: list = []
        if strategy is None and snap is not None:
            # skew probe (SURVEY §4.2.2): manifest stats are already on
            # the driver — zero extra scans. A hot entity key makes the
            # union window's partitionBy(key) one giant sort task, blows
            # up broadcast's range-join fanout (hot_rows × probes of
            # that key), and lands in ONE cogroup pandas bucket however
            # large B grows (same hash → same bucket). The sliced
            # strategy partitions the hot key's TIMELINE, the only bound
            # that holds when one key exceeds a task (r02 review;
            # cogroup/salting only bound aggregates) — so the probe runs
            # for every auto-chosen strategy, cogroup included.
            from feast_spark.operators.skew import detect_hot_keys_from_manifest

            hot_keys = detect_hot_keys_from_manifest(
                snap, min_rows=hot_key_min_rows
            )
            if hot_keys:
                chosen = "sliced"
        src_kw: dict = {}
        n_buckets = None
        if fv.layout_root:
            # manifest pruning by probe time range + TTL: files wholly
            # outside [min(ts) - ttl, max(ts)] never reach Spark — the
            # Iceberg-planning analogue for retrieval (SURVEY.md S2)
            if probe_bounds is None:
                from pyspark.sql import functions as F

                b = entity_df.agg(
                    F.min(F.col("ts").cast("timestamp")).alias("lo"),
                    F.max(F.col("ts").cast("timestamp")).alias("hi"),
                ).first()
                probe_bounds = (b["lo"], b["hi"])
            lo, hi = probe_bounds
            if hi is not None:
                import datetime as _dt

                # With no TTL the as-of lookback is unbounded: a key whose
                # latest feature row predates the earliest probe is still a
                # valid PIT match, so only the upper bound may prune.
                src_kw = {"end": hi + _dt.timedelta(seconds=1)}
                if lo is not None and fv.ttl is not None:
                    src_kw["start"] = lo - fv.ttl
                    if fv.aggregations:
                        # trailing window aggregates at the TTL horizon's
                        # first events need their full window of history;
                        # an unbounded (lifetime) agg window forbids any
                        # lower scan bound
                        w = fv.max_agg_window
                        if w is None:
                            del src_kw["start"]
                        else:
                            src_kw["start"] -= w
            from feast_spark.sources.pages import buckets_of_keys

            layout_buckets = snap["n_buckets"]
            n_buckets = layout_buckets
            if chosen == "cogroup":
                # bucket-size policy (VERDICT r01 plan audit): cogroup
                # materializes one bucket per Python worker, so B must
                # grow with data volume or a bucket overflows worker
                # memory. Manifest byte stats give max bucket size for
                # free; splitting costs layout alignment (a real shuffle
                # instead of a B-way repartition on the precomputed id) —
                # the right trade once a bucket won't fit. NOTE the bound
                # holds for aggregate volume, not a single hot key: one
                # key always hashes to one bucket, so a key larger than
                # worker memory needs time-sliced handling regardless of
                # B — which is why AUTO-detected hot keys route to the
                # sliced strategy, not here; this path serves explicit
                # strategy="cogroup" and large-probe layout retrievals.
                per_bucket: dict = {}
                for fs in snap["files"]:
                    per_bucket[fs["bucket"]] = (
                        per_bucket.get(fs["bucket"], 0) + fs.get("bytes", 0)
                    )
                biggest = max(per_bucket.values(), default=0)
                if biggest > cogroup_bucket_bytes:
                    import math

                    n_buckets *= math.ceil(biggest / cogroup_bucket_bytes)
        if decisions is not None:
            decisions.append(
                {
                    "view": view_name,
                    "strategy": chosen,
                    "hot_keys": hot_keys,
                    "n_buckets": n_buckets if chosen == "cogroup" else None,
                }
            )
        if fv.layout_root:
            # bucket pruning for small probe sets (point-lookup shape);
            # the layout buckets on ONE column — prune only when that
            # column is among the view's join keys (always true for
            # single-entity views)
            kcol = snap["key_col"]
            if kcol in fv.join_keys and kcol not in probe_keys_by_col:
                sample = (
                    entity_df.select(kcol).distinct()
                    .limit(BUCKET_PRUNE_PROBE_ROWS + 1).collect()
                )
                probe_keys_by_col[kcol] = (
                    [r[kcol] for r in sample]
                    if len(sample) <= BUCKET_PRUNE_PROBE_ROWS
                    else []  # too many: skip bucket pruning
                )
            if probe_keys_by_col.get(kcol):
                import json as _json

                from pyspark.sql import types as _T

                key_type = None
                tbl_schema = _T.StructType.fromJson(_json.loads(snap["schema"]))
                if kcol in tbl_schema.fieldNames():
                    key_type = tbl_schema[kcol].dataType.simpleString()
                # manifest pruning always uses the LAYOUT's modulus, not
                # the (possibly grown) cogroup repartition count
                src_kw["buckets"] = buckets_of_keys(
                    store.spark, probe_keys_by_col[kcol], layout_buckets,
                    key_type=key_type,
                )
        src = fv.derived_frame(fv.load(store.spark, **src_kw))
        declared = {s.name for s in fv.features}
        unknown = [f for f in feats if f not in declared]
        if unknown:
            raise ValueError(f"view {view_name!r} has no features {unknown}")
        joined = asof_join(
            out,
            src,
            by=fv.join_keys,
            left_on="ts",
            right_on=fv.timestamp_field,
            ttl=fv.ttl,
            created_col=fv.created_timestamp_column,
            feature_cols=feats,
            strategy=chosen,
            # layout-aligned bucket count: the cogroup strategy then
            # repartitions on the SAME pmod(xxhash64(url), B) the table
            # was written with (SURVEY.md §4.2.3)
            n_buckets=n_buckets if chosen == "cogroup" else None,
        )
        if full_feature_names:
            joined = joined.withColumnsRenamed(
                {f: f"{view_name}__{f}" for f in feats}
            )
        out = joined
    return out
