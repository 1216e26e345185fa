"""Materialization runner (SURVEY.md §3.2; upstream
``feature_store.materialize → pull_latest_from_table_or_query →
online_write_batch``, re-expressed Spark-first).

For a time range ``[start, end)``: scan the feature source, compute the
**latest feature row per entity key** (A1: event_ts DESC, created_ts
DESC, deterministic hash), and upsert it into a url-hash-bucketed serving
store — one row per key per bucket directory.

**Checkpoint grain = bucket** (the url-hash partition of the north
rule): each bucket batch is one Spark action whose completion commits a
per-partition lineage manifest ``{partition_id, input_snapshot,
start, end, rows_in, rows_out, max_event_ts, wall_ms}`` via atomic
rename. A re-run skips buckets whose lineage already matches the same
(input snapshot, range) — kill the job after k buckets and the next run
resumes at bucket k+1 with byte-identical output (tests/test_materialize).

Scale shape: B buckets → ceil(B / bucket_batch) driver-sequential Spark
jobs, each fully parallel across that batch's files/partitions. At 100 TB
with B=1024, bucket_batch=64 gives 16 jobs of ~6 % of the data each —
bounded failure blast radius and bounded shuffle state per job, while
keeping executors saturated. Incremental upsert merges the existing
serving rows for JUST the touched buckets (read-modify-write per bucket
dir, never a full-store rewrite).
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.windows import latest_per_key
from feast_spark.sources import fileio
from feast_spark.sources import pages as layout


class MaterializeJob:
    def __init__(
        self,
        spark: SparkSession,
        view,
        dest: str,
        *,
        n_buckets: int | None = None,
        bucket_batch: int = 8,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        fail_after_batches: int | None = None,
        lineage_tag: str | None = None,
    ) -> None:
        self.spark = spark
        self.view = view
        self.dest = dest
        self.bucket_batch = bucket_batch
        self.transform = transform
        self.fail_after_batches = fail_after_batches  # test hook (resume)
        # disambiguates lineage records from distinct logical runs that
        # may share (input_snapshot, start, end) — e.g. streaming
        # micro-batches whose event-time bounds collide
        self.lineage_tag = lineage_tag

        src = view.source
        self._layout_root = (
            str(src)
            if isinstance(src, str) and layout.is_table(str(src))
            else None
        )
        self._layout_key: str | None = None
        if n_buckets is None:
            if self._layout_root:
                n_buckets = self._layout_snap()["n_buckets"]
            else:
                n_buckets = layout.DEFAULT_BUCKETS
        self.n_buckets = n_buckets
        if self._layout_root:
            self._layout_key = self._layout_snap()["key_col"]

    def _layout_snap(self) -> dict:
        """The layout snapshot this job reads: the view's pinned ref when
        set (reproducible re-materialization of a corpus release), else
        the current HEAD."""
        ref = getattr(self.view, "ref", None)
        if ref:
            return layout.load_snapshot(
                self._layout_root, layout.resolve_tag(self._layout_root, ref)
            )
        return layout.current_snapshot(self._layout_root)

    #: constant key column injected for entity-less (global) views —
    #: upstream's DUMMY_ENTITY; the whole view serves one latest row
    DUMMY_KEY = "__feast_dummy_entity__"

    def _key_cols(self) -> list[str]:
        # a one-element entity LIST is a legal view shape; dereference
        # via join_keys so it doesn't crash on .join_key (round-2 review).
        # A multi-element list = composite entity key: the store buckets
        # on xxhash64(k1, k2, …) and serves one row per key TUPLE. An
        # EMPTY list = entity-less view, keyed by an injected constant.
        keys = getattr(self.view, "join_keys", None)
        if keys is not None and len(keys) == 0:
            return [self.DUMMY_KEY]
        return list(keys) if keys else [self.view.entity.join_key]

    def _key_types(self) -> list[str] | None:
        """Spark simpleStrings of the key columns' source dtypes, recorded
        in store.json so ``read_online`` hashes probe keys with the
        writer's dtypes without a parquet-footer read on the serving hot
        path (ADVICE r02). Layout-backed sources resolve them from the
        snapshot schema (no Spark job); others from the lazy view schema."""
        keys = self._key_cols()
        try:
            if self._layout_root:
                import json

                from pyspark.sql import types as T

                snap = self._layout_snap()
                schema = T.StructType.fromJson(json.loads(snap["schema"]))
            else:
                schema = self.view.load(self.spark).schema
            have = {f.name: f.dataType.simpleString() for f in schema.fields}
            have[self.DUMMY_KEY] = "int"  # injected constant
            if all(k in have for k in keys):
                return [have[k] for k in keys]
        except Exception:
            return None
        return None

    # -- source ----------------------------------------------------------
    def _input_snapshot(self) -> int | None:
        if self._layout_root:
            return self._layout_snap()["snapshot_id"]
        return None

    def _coverage_complete(self, snap_id, start, end) -> bool | None:
        """Is the store latest-per-key COMPLETE as of ``snap_id`` after a
        run over [start, end)? True when the range covers the snapshot's
        whole event-time span (footer stats, no Spark job), or — the
        incremental induction — when a prior lineage record is complete
        at an ancestor snapshot and this range covers every file APPENDED
        since it. Recorded in lineage; ``materialize_delta`` refuses a
        baseline without a complete record, because a time-bounded run
        records input_snapshot=HEAD while leaving out-of-range rows
        unmaterialized (r04 review: those rows were silently unservable
        forever). None = non-layout source (coverage unknowable)."""
        import datetime as _dt

        if snap_id is None:
            return None

        def _as_dt(v):
            d = _dt.datetime.fromisoformat(v) if isinstance(v, str) else v
            if d.tzinfo is not None:
                # footer stats of UTC-flagged parquet timestamps parse
                # tz-aware; the engine's timeline is naive-UTC throughout
                d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return d

        def _span(files) -> tuple | None:
            mins = [f.get("min_ts") for f in files]
            maxs = [f.get("max_ts") for f in files]
            if any(m is None for m in mins) or any(m is None for m in maxs):
                return None  # footer ts stats missing: unverifiable
            return (_as_dt(min(mins)), _as_dt(max(maxs)))

        s, e = _as_dt(start), _as_dt(end)
        files = layout.load_snapshot(self._layout_root, snap_id)["files"]
        if not files:
            return True
        span = _span(files)
        if span is not None and s <= span[0] and e > span[1]:
            return True
        priors = sorted(
            (
                r for r in layout.list_lineage(self.dest)
                if r.get("complete") and r.get("input_snapshot") is not None
                and r["input_snapshot"] < snap_id
                # mirror materialize_delta's guard: a "buckets" key marks a
                # legacy PER-BATCH record, whose complete flag could
                # survive a crashed multi-batch run — only run-level/delta
                # markers may seed the induction (ADVICE r04)
                and "buckets" not in r
            ),
            key=lambda r: -r["input_snapshot"],
        )
        for r in priors:
            try:
                _, added = layout.added_files(
                    self._layout_root, r["input_snapshot"], snap_id
                )
            except Exception:
                continue  # not an ancestor (rollback/branch history)
            if not added:
                return True
            aspan = _span(added)
            if aspan is not None and s <= aspan[0] and e > aspan[1]:
                return True
        return False

    def _scan(self, start, end, buckets: list[int]) -> DataFrame:
        ts = self.view.timestamp_field
        keys = self._key_cols()
        aggs = getattr(self.view, "aggregations", []) or []
        scan_start = start
        if aggs:
            # trailing-window aggregates at the range's first events need
            # their full window of history below ``start``; an unbounded
            # (lifetime) window forbids any lower scan bound
            w = self.view.max_agg_window
            if w is None:
                scan_start = None
            else:
                import datetime as _dt

                s = (
                    _dt.datetime.fromisoformat(start)
                    if isinstance(start, str)
                    else start
                )
                scan_start = s - w
        if self._layout_root:
            # manifest-pruned read: only files overlapping the range AND
            # belonging to this bucket batch ever reach Spark. File-level
            # bucket pruning is valid only when the store's bucket
            # transform IS the layout's (same single key column) — a
            # composite or remapped key hashes differently, so those
            # scans prune on time range alone and filter below.
            prunable = keys == [self._layout_key]
            ref = getattr(self.view, "ref", None)
            df = layout.read_table(
                self.spark,
                self._layout_root,
                snapshot=self._layout_snap()["snapshot_id"] if ref else None,
                start=scan_start,
                end=end,
                buckets=set(buckets) if prunable else None,
            )
        else:
            df = self.view.load(self.spark)
        df = df.withColumn(ts, F.col(ts).cast("timestamp"))
        if aggs:
            # derived BEFORE the range filter: bucket pruning keeps whole
            # keys, and the widened scan supplies the window history
            df = self.view.derived_frame(df)
        df = df.filter(
            (F.col(ts) >= F.lit(start).cast("timestamp"))
            & (F.col(ts) < F.lit(end).cast("timestamp"))
        )
        b = layout.bucket_expr(keys, self.n_buckets)
        # bucket membership is a pure filter here; the write recomputes the
        # bucket id (cheap hash) AFTER the user transform, which may
        # project columns freely
        if keys == [self.DUMMY_KEY]:
            # entity-less view: inject the constant key just for the
            # filter (all rows share one bucket), keep the user schema
            return (
                df.withColumn(self.DUMMY_KEY, F.lit(1))
                .filter(b.isin(buckets))
                .drop(self.DUMMY_KEY)
            )
        return df.filter(b.isin(buckets))

    # -- one bucket batch ------------------------------------------------
    def _run_batch(self, start, end, buckets: list[int], snap_id) -> dict:
        ts = self.view.timestamp_field
        keys = self._key_cols()
        t0 = time.monotonic()

        df = self._scan(start, end, buckets)
        if self.transform is not None:
            df = self.transform(df)
        if keys == [self.DUMMY_KEY]:
            df = df.withColumn(self.DUMMY_KEY, F.lit(1))
        latest = latest_per_key(
            df,
            key=keys,
            order=ts,
            created_col=self.view.created_timestamp_column,
        )

        # upsert: merge with existing serving rows of the touched buckets
        existing_dirs = [
            os.path.join(self.dest, layout.DATA_DIR, f"bucket={b}")
            for b in buckets
        ]
        existing_dirs = [d for d in existing_dirs if os.path.isdir(d)]
        if existing_dirs:
            old = self.spark.read.parquet(*existing_dirs)
            old = old.withColumn(ts, F.col(ts).cast("timestamp"))
            # incoming rows outrank served rows at equal (key, ts,
            # created): re-materialization is a CORRECTION (late-event
            # aggregate fixes, transform changes) and must overwrite
            merged = latest.withColumn("__fresh", F.lit(1)).unionByName(
                old.withColumn("__fresh", F.lit(0)),
                allowMissingColumns=False,
            )
            latest = latest_per_key(
                merged, key=keys, order=ts,
                created_col=self.view.created_timestamp_column,
                precedence_col="__fresh",
            ).drop("__fresh")
        latest = latest.withColumn(
            "__bucket", layout.bucket_expr(keys, self.n_buckets)
        )

        obs = Observation()
        latest = latest.observe(
            obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.max(F.col(ts)).alias("max_event_ts"),
        )
        out_tmp = os.path.join(self.dest, "_staging", f"batch-{buckets[0]}")
        (
            latest.repartition("__bucket")
            .sortWithinPartitions("__bucket", *keys)
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(out_tmp)
        )
        metrics = obs.get
        # swap each bucket dir into the serving store through the FileIO
        # seam (object-store impls replace the rename pair with prefix
        # versioning — fileio.py docstring)
        io = fileio.get_io()
        for b in buckets:
            src_dir = os.path.join(out_tmp, f"__bucket={b}")
            dst_dir = os.path.join(self.dest, layout.DATA_DIR, f"bucket={b}")
            os.makedirs(os.path.dirname(dst_dir), exist_ok=True)
            if os.path.isdir(src_dir):
                io.swap_dir(src_dir, dst_dir)
        wall_ms = int((time.monotonic() - t0) * 1000)
        max_ts = metrics["max_event_ts"]
        return {
            "input_snapshot": snap_id,
            "start": str(start),
            "end": str(end),
            "buckets": buckets,
            "rows_out": metrics["rows_out"],
            "max_event_ts": max_ts.isoformat() if max_ts else None,
            "wall_ms": wall_ms,
        }

    # -- driver loop -----------------------------------------------------
    def run(self, start, end) -> dict:
        """Materialize [start, end). Returns summary metrics. Resumable:
        bucket batches with matching lineage are skipped."""
        snap_id = self._input_snapshot()
        complete = self._coverage_complete(snap_id, start, end)
        write_store_meta(
            self.dest,
            n_buckets=self.n_buckets,
            key_cols=self._key_cols(),
            key_types=self._key_types(),
            ts_col=self.view.timestamp_field,
        )
        batches = [
            list(range(b, min(b + self.bucket_batch, self.n_buckets)))
            for b in range(0, self.n_buckets, self.bucket_batch)
        ]
        done = skipped = 0
        total_rows = 0
        t0 = time.monotonic()
        for i, buckets in enumerate(batches):
            pid = f"b{buckets[0]:04d}-{buckets[-1]:04d}"
            if self.lineage_tag:
                pid = f"{self.lineage_tag}-{pid}"
            prior = layout.read_lineage(self.dest, pid)
            if (
                prior
                and prior.get("input_snapshot") == snap_id
                and prior.get("start") == str(start)
                and prior.get("end") == str(end)
            ):
                skipped += 1
                total_rows += prior["rows_out"]
                continue
            if (
                self.fail_after_batches is not None
                and done >= self.fail_after_batches
            ):
                raise RuntimeError(f"injected failure before batch {pid}")
            record = self._run_batch(start, end, buckets, snap_id)
            layout.write_lineage(self.dest, pid, record)
            done += 1
            total_rows += record["rows_out"]
        if complete and snap_id is not None:
            # the completeness marker is written ONLY after every bucket
            # batch has committed (r04 review batch 3: a per-batch flag
            # let a crashed multi-batch run pass materialize_delta's
            # baseline check with half its buckets unmaterialized), and
            # ONLY when True — a later bounded run at the same snapshot
            # must not clobber a verified marker with False
            tag = f"{self.lineage_tag}-" if self.lineage_tag else ""
            layout.write_lineage(
                self.dest,
                f"{tag}complete-{snap_id:06d}",
                {
                    "input_snapshot": snap_id,
                    "start": str(start),
                    "end": str(end),
                    "rows_out": total_rows,
                    "complete": True,
                },
            )
        wall_s = time.monotonic() - t0
        return {
            "batches_run": done,
            "batches_skipped": skipped,
            "rows": total_rows,
            "wall_s": round(wall_s, 3),
            "rows_per_sec": round(total_rows / max(wall_s, 1e-9), 1),
            "input_snapshot": snap_id,
        }


def _store_meta_path(dest: str) -> str:
    return os.path.join(dest, layout.META_DIR, "store.json")


def write_store_meta(
    dest: str,
    *,
    n_buckets: int,
    key_col: str | None = None,
    key_type: str | None = None,
    key_cols: list[str] | None = None,
    key_types: list[str] | None = None,
    ts_col: str | None = None,
) -> None:
    """Persist the store's bucket modulus (ADVICE r01: inferring it from
    ``1+max(bucket dirs)`` is wrong when the top bucket was never written —
    point lookups then hash keys with a different modulus than the writer
    used and silently miss). Atomic tmp+rename; refuses to change the
    modulus of an existing store.

    ``key_cols``/``key_types`` (lists) are the canonical form; the scalar
    ``key_col``/``key_type`` params and json fields are kept for
    single-key stores written before composite support."""
    import json

    if key_cols is None:
        key_cols = [key_col] if key_col else []
    if key_types is None and key_type:
        key_types = [key_type]

    path = _store_meta_path(dest)
    prior = read_store_meta(dest)
    if prior is not None:
        if prior["n_buckets"] != n_buckets:
            raise ValueError(
                f"store {dest} was written with n_buckets="
                f"{prior['n_buckets']}, cannot re-materialize with "
                f"{n_buckets}"
            )
        prior_cols = prior.get("key_cols") or (
            [prior["key_col"]] if prior.get("key_col") else None
        )
        if prior_cols and key_cols and prior_cols != key_cols:
            raise ValueError(
                f"store {dest} is keyed on {prior_cols}, cannot "
                f"re-materialize keyed on {key_cols}"
            )
        changed = False
        if key_types and not prior.get("key_types") and not prior.get("key_type"):
            # backfill dtypes for older stores
            prior["key_types"] = key_types
            if len(key_types) == 1:
                prior["key_type"] = key_types[0]
            changed = True
        if ts_col and not prior.get("ts_col"):
            prior["ts_col"] = ts_col  # backfill for pre-TTL stores
            changed = True
        if changed:
            fileio.get_io().write_atomic(path, json.dumps(prior))
        return
    meta = {
        "n_buckets": n_buckets,
        "key_cols": key_cols,
        "key_types": key_types,
        "ts_col": ts_col,
    }
    if len(key_cols) == 1:  # scalar aliases for pre-composite readers
        meta["key_col"] = key_cols[0]
        meta["key_type"] = key_types[0] if key_types else None
    fileio.get_io().write_atomic(path, json.dumps(meta))


def read_store_meta(dest: str) -> dict | None:
    import json

    path = _store_meta_path(dest)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def last_materialized_end(dest: str) -> str | None:
    """The latest ``end`` across lineage records — where the next
    incremental run resumes (upstream: the registry's materialized-range
    tracking in materialize_incremental)."""
    records = layout.list_lineage(dest)
    ends = [r["end"] for r in records if r.get("end")]
    return max(ends) if ends else None


def materialize_incremental(
    spark: SparkSession, view, dest: str, end, *, start_default=None, **kw
) -> dict:
    """Upstream ``materialize_incremental``: resume from the last
    materialized end (or ``start_default`` on first run) up to ``end``.
    No-ops when the store is already caught up."""
    start = last_materialized_end(dest) or start_default
    if start is None:
        raise ValueError("first incremental run needs start_default")
    if str(start) >= str(end):
        return {"batches_run": 0, "batches_skipped": 0, "rows": 0,
                "wall_s": 0.0, "rows_per_sec": 0.0, "caught_up": True}
    return MaterializeJob(spark, view, dest, **kw).run(start, end)


def last_input_snapshot(dest: str) -> int | None:
    """Highest layout snapshot any lineage record of this store has
    consumed — the resume point for snapshot-delta materialization."""
    snaps = [
        r.get("input_snapshot")
        for r in layout.list_lineage(dest)
        if r.get("input_snapshot") is not None
    ]
    return max(snaps) if snaps else None


def materialize_delta(
    spark: SparkSession, view, dest: str, *, to_snapshot: int | None = None
) -> dict:
    """Snapshot-delta materialization: read ONLY the layout files
    appended since the store's last consumed snapshot (the incremental
    append scan) and merge their latest rows into the serving buckets
    via the push path. Where ``materialize_incremental`` resumes by
    TIME (rescanning the resumed window), this resumes by SNAPSHOT —
    the scan is proportional to the delta however wide its event-time
    spread, the daily-delta shape that never rescans 100 TB. Correct
    because the store already holds latest-per-key as of the previous
    snapshot and the source is append-only between snapshots (enforced
    by ``added_files``): latest(store ∪ delta) = latest(all).

    Requires a layout-backed view without windowed aggregations
    (those need history beneath each anchor — use the time-based path)
    and a prior full materialization (the first lineage record pins
    the baseline snapshot). No-ops when caught up. Records its own
    lineage (`delta-{snapshot}`), so runs chain and crash-retries
    resume."""
    root = view.layout_root
    if root is None:
        raise ValueError("materialize_delta needs a layout-backed view")
    if getattr(view, "aggregations", None):
        raise ValueError(
            "views with windowed aggregations need event-time history; "
            "use materialize_incremental"
        )
    last = last_input_snapshot(dest)
    if last is None:
        raise ValueError(
            f"no lineage at {dest}: run a full MaterializeJob first "
            "(it pins the baseline snapshot)"
        )
    # the baseline must be latest-per-key COMPLETE as of `last`: a
    # time-bounded run also records input_snapshot=HEAD but leaves
    # out-of-range rows unmaterialized — resuming by snapshot from it
    # would make those rows silently unservable forever (r04 review)
    # only RUN-LEVEL markers count ("buckets" identifies a legacy
    # per-batch record, whose complete flag could survive a crashed
    # multi-batch run — r04 review batch 4)
    if not any(
        r.get("complete") and "buckets" not in r
        for r in layout.list_lineage(dest)
        if r.get("input_snapshot") == last
    ):
        raise ValueError(
            f"store at {dest} is not verifiably complete as of snapshot "
            f"{last}: its lineage there is time-bounded (or predates "
            "completeness tracking) — run a MaterializeJob whose range "
            "covers the table's full event-time span first"
        )
    # a ref-pinned view delta-materializes only up to its pin — the same
    # reproducible-release contract MaterializeJob._scan and retrieval
    # honor; an explicit to_snapshot past the pin is a caller error, not
    # a silent unpin (ADVICE r04)
    ref = getattr(view, "ref", None)
    pin = layout.resolve_tag(root, ref) if ref else None
    head = (
        to_snapshot
        if to_snapshot is not None
        else (pin if pin is not None
              else layout.current_snapshot(root)["snapshot_id"])
    )
    if pin is not None and head > pin:
        raise ValueError(
            f"view is pinned to ref {ref!r} (snapshot {pin}) but "
            f"to_snapshot={head} exceeds it — unpin the view or lower "
            "to_snapshot"
        )
    if head <= last:
        return {"rows_pushed": 0, "buckets_touched": [],
                "from_snapshot": last, "to_snapshot": head,
                "caught_up": True}
    delta = layout.read_table_incremental(spark, root, last, head)
    for src, dst in (view.field_mapping or {}).items():
        delta = delta.withColumnRenamed(src, dst)
    cols = list(
        dict.fromkeys(
            view.join_keys
            + [view.timestamp_field]
            + ([view.created_timestamp_column]
               if view.created_timestamp_column else [])
            + [s.name for s in view.features]
        )
    )
    delta = delta.select(*cols)
    stats = push_to_online(
        spark, dest, delta,
        ts_col=view.timestamp_field,
        created_col=view.created_timestamp_column,
    )
    layout.write_lineage(
        dest,
        f"delta-{head:06d}",
        {
            "input_snapshot": head,
            "from_snapshot": last,
            "rows_out": stats["rows_pushed"],
            "end": None,
            # complete by induction: baseline verified above, and the
            # delta merged every row appended since it
            "complete": True,
        },
    )
    return {**stats, "from_snapshot": last, "to_snapshot": head,
            "caught_up": False}


def push_to_online(
    spark: SparkSession,
    dest: str,
    df: DataFrame,
    *,
    ts_col: str,
    created_col: str | None = None,
) -> dict:
    """Upstream PushSource write path: merge fresh feature rows straight
    into the serving store (stream ingestion's terminal step), no batch
    materialization pass.

    Scale shape: latest-per-key on the pushed batch (small), then a
    read-modify-write of ONLY the buckets containing pushed keys — the
    touched-bucket set is bounded by the store modulus, and unaffected
    buckets are never opened. Swaps go through the FileIO seam like
    every other commit. Returns {rows_pushed, buckets_touched}."""
    meta = read_store_meta(dest)
    if meta is None:
        raise FileNotFoundError(f"no serving store at {dest} (store.json)")
    key_cols = meta.get("key_cols") or [meta["key_col"]]
    n_buckets = meta["n_buckets"]

    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if key_cols == [MaterializeJob.DUMMY_KEY] and (
        MaterializeJob.DUMMY_KEY not in df.columns
    ):
        # entity-less store: inject the constant key like materialize
        df = df.withColumn(MaterializeJob.DUMMY_KEY, F.lit(1))
    latest = latest_per_key(
        df, key=key_cols, order=ts_col, created_col=created_col
    )
    # observe the deduped PUSHED batch here, before the union with
    # pre-existing bucket residents — rows_pushed must report the batch
    # size, not everything rewritten into touched buckets (ADVICE r03).
    # The observation rides the final write (no extra action).
    obs = Observation()
    latest = latest.observe(obs, F.count(F.lit(1)).alias("rows"))
    touched = sorted(
        r["b"]
        for r in df.select(
            layout.bucket_expr(key_cols, n_buckets).alias("b")
        ).distinct().collect()
    )
    if not touched:  # empty push batch: nothing to merge or swap
        return {"rows_pushed": 0, "buckets_touched": []}
    existing_dirs = [
        os.path.join(dest, layout.DATA_DIR, f"bucket={b}") for b in touched
    ]
    existing_dirs = [d for d in existing_dirs if os.path.isdir(d)]
    if existing_dirs:
        old = spark.read.parquet(*existing_dirs)
        old = old.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        # pushed rows outrank served rows at equal (key, ts, created) —
        # same new-wins correction rule as the materialize merge
        latest = latest_per_key(
            latest.withColumn("__fresh", F.lit(1)).unionByName(
                old.withColumn("__fresh", F.lit(0)),
                allowMissingColumns=False,
            ),
            key=key_cols, order=ts_col, created_col=created_col,
            precedence_col="__fresh",
        ).drop("__fresh")
    latest = latest.withColumn(
        "__bucket", layout.bucket_expr(key_cols, n_buckets)
    )
    out_tmp = os.path.join(dest, "_staging", f"push-{touched[0]}")
    (
        latest.repartition("__bucket")
        .sortWithinPartitions("__bucket", *key_cols)
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(out_tmp)
    )
    rows = obs.get["rows"]
    io = fileio.get_io()
    for b in touched:
        src_dir = os.path.join(out_tmp, f"__bucket={b}")
        dst_dir = os.path.join(dest, layout.DATA_DIR, f"bucket={b}")
        os.makedirs(os.path.dirname(dst_dir), exist_ok=True)
        if os.path.isdir(src_dir):
            io.swap_dir(src_dir, dst_dir)
    io.rmtree(out_tmp)
    return {"rows_pushed": rows, "buckets_touched": touched}


def infer_store_ts_col(
    spark: SparkSession, dest: str, *, meta: dict | None = None
) -> str | None:
    """Event-time column of a serving store: ``store.json``'s recorded
    ``ts_col``; for stores materialized before it was recorded (r04
    review), resolve from the STORE's own parquet schema — ``warc_ts``
    if present, else the single timestamp-typed column. ``None`` when
    absent or ambiguous (callers that NEED it, like ttl expiry, must
    refuse rather than guess). One shared inference for the Python API
    and the HTTP server (r05 review batch 2 — the server's copy ran
    over the post-ODFV schema, so derived timestamp columns changed
    the answer)."""
    if meta is None:
        meta = read_store_meta(dest)
    ts_col = (meta or {}).get("ts_col")
    if ts_col:
        return ts_col
    from pyspark.sql import types as T

    data = os.path.join(dest, layout.DATA_DIR)
    fields = spark.read.parquet(data).schema.fields
    ts_like = [
        f.name for f in fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    ]
    if "warc_ts" in ts_like:
        return "warc_ts"
    if len(ts_like) == 1:
        return ts_like[0]
    return None


def read_online(
    spark: SparkSession,
    dest: str,
    keys: list | None = None,
    *,
    key_col: str = "url",
    key_cols: list[str] | None = None,
    ttl=None,
    now=None,
):
    """Read the serving store (one row per entity key). With ``keys``,
    prunes to just those keys' bucket directories before scanning — a KV
    point-lookup's batch equivalent.

    Composite-key stores: pass ``key_cols=[k1, k2, …]`` and ``keys`` as a
    list of tuples; pruning hashes the tuples with the writer's
    transform, and the residual filter is a broadcast semi-join against
    the (tiny) probe set.

    ``ttl`` (a timedelta) + ``now``: online-store TTL expiry (upstream
    online stores evict rows older than the view's ttl) — rows whose
    event time predates ``now - ttl`` are filtered out, the read-side
    equivalent of eviction. ``now`` is EXPLICIT (no wall-clock read
    here) so lookups are reproducible; the event-time column comes from
    store.json (recorded at materialization)."""
    import datetime as _dt

    data = os.path.join(dest, layout.DATA_DIR)
    meta = read_store_meta(dest)
    if key_cols is None:
        key_cols = (meta or {}).get("key_cols") or [key_col]
    expire = None
    if ttl is not None:
        if now is None:
            raise ValueError("ttl expiry needs an explicit `now`")
        ts_col = infer_store_ts_col(spark, dest, meta=meta)
        if ts_col is None:
            raise ValueError(
                f"cannot infer the event-time column of {dest} for "
                "ttl expiry; re-materialize to record ts_col in "
                "store.json"
            )
        if isinstance(now, str):
            now = _dt.datetime.fromisoformat(now)
        cutoff = now - ttl

        def expire(df):  # noqa: E731 — applied to every return path
            return df.filter(
                F.col(ts_col).cast("timestamp") > F.lit(cutoff)
            )

    if keys is None:
        out = spark.read.parquet(data)
        return expire(out) if expire else out
    dirs = sorted(d for d in os.listdir(data) if d.startswith("bucket="))
    if meta is not None:
        n_buckets = meta["n_buckets"]
    else:  # legacy store without metadata: best-effort inference
        n_buckets = 1 + max(int(d.split("=")[1]) for d in dirs)
    # hash probe keys with the STORE's key dtypes (int vs bigint vs string
    # all hash differently under xxhash64 — r02 review). Persisted in
    # store.json; fall back to ONE bucket dir's footer, never a
    # full-store listing (hot serving path).
    key_types = (meta or {}).get("key_types")
    if not key_types and (meta or {}).get("key_type"):
        key_types = [meta["key_type"]]
    if not key_types:
        sch = spark.read.parquet(os.path.join(data, dirs[0])).schema
        key_types = [sch[c].dataType.simpleString() for c in key_cols]
    if len(key_cols) == 1:
        wanted = layout.buckets_of_keys(
            spark, keys, n_buckets, key_type=key_types[0]
        )
    else:
        wanted = layout.buckets_of_key_tuples(
            spark, keys, n_buckets, key_types=key_types
        )
    paths = [
        os.path.join(data, d)
        for d in dirs
        if int(d.split("=")[1]) in wanted
    ]
    if not paths:
        empty = spark.read.parquet(os.path.join(data, dirs[0])).limit(0)
        return empty
    out = spark.read.parquet(*paths)
    if len(key_cols) == 1:
        out = out.filter(F.col(key_cols[0]).isin(keys))
    else:
        schema = ", ".join(f"{c} {t}" for c, t in zip(key_cols, key_types))
        probe = spark.createDataFrame(
            [tuple(k) for k in keys], schema
        ).distinct()
        out = out.join(F.broadcast(probe), on=key_cols, how="left_semi")
    return expire(out) if expire else out
