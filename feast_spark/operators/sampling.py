"""Deterministic corpus sampling / splitting (SURVEY.md §8 round-3;
task-spec training-data-pipeline components beyond the reference).

A 100 TB pipeline needs reproducible subsetting: the same inputs must
yield byte-identical samples on any cluster size, any partitioning, any
retry — so nothing here uses ``rand()`` (nondeterministic under task
retry, the SPARK-23207 hazard) or driver-side state. Every choice is a
pure function of row content via a portable hash (md5 — identical output
in Spark, DuckDB, Python; xxhash64 deliberately avoided here because
oracle engines don't ship it).

- ``stratified_sample``: k rows per stratum, rank-by-hash. ``window``
  strategy is the exact default; ``threshold`` is the scale path for hot
  strata — hash-threshold prefilter (≈k/n·oversample survival) bounds
  the per-stratum window input, with a guarantee check that falls back
  loudly rather than silently under-sampling.
- ``hash_split``: train/test split by hash prefix — stable across runs,
  new rows land in a split independently of old rows (the property
  ``rand() < frac`` lacks).
- ``domain_quota_sample``: RefinedWeb-style per-domain document cap
  (Penedo et al. 2023 §3.1 apply a per-domain limit to stop a handful
  of mega-sites dominating the corpus) — a stratified sample whose
  stratum is the registrable domain parsed from the URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(id_col: str | Column, seed: int) -> Column:
    """Portable deterministic ranking key: md5 over ``id|seed``.
    Lowercase hex compares lexicographically == numerically."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat_ws("|", c.cast("string"), F.lit(str(seed))))


def _hex_cut(frac: Column) -> Column:
    """8-hex-digit survival cut: rows whose first 8 md5 hex chars
    compare < this survive with probability ≈ ``frac``. conv() emits
    UPPERCASE hex while md5() is lowercase — the lower() is load-bearing
    for the lexicographic compare ('a' > 'F'). Callers must handle the
    frac ≥ 1.0 edge themselves (the cut would need 9 digits)."""
    return F.lpad(
        F.lower(
            F.conv(
                F.floor(frac * F.lit(float(16**8))).cast("long").cast("string"),
                10, 16,
            )
        ),
        8, "0",
    )


def stratified_sample(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    k: int,
    seed: int = 42,
    strategy: str = "window",
    oversample: float = 4.0,
    guard: str = "eager",
) -> DataFrame:
    """Up to ``k`` rows per ``group_col`` stratum, chosen as the k
    smallest ``md5(id|seed)`` values — a uniform-without-replacement
    sample that is reproducible everywhere.

    ``window`` ranks every row (one shuffle on the stratum key; a hot
    stratum = one big task). ``threshold`` first keeps only rows whose
    hash falls below ≈``oversample·k/n`` of the hash space per stratum
    (pure filter after a map-side-combinable count), then ranks the
    survivors — the window input shrinks from n to ~oversample·k per
    stratum, which is what makes a 10^9-row stratum tractable. Both
    strategies return the SAME rows; if the prefilter ever catches fewer
    than min(k, n) survivors for a stratum (hash-tail bad luck at tiny
    oversample), it raises rather than silently under-sampling.

    ``guard`` controls HOW the guarantee is checked (the window
    strategy satisfies it by construction — its ``observe`` guard is a
    trivially-passing one so callers can check uniformly): ``"eager"`` runs a bounded extra action at call time and
    raises immediately — simple, but re-executes the (prefiltered)
    survivor plan. ``"observe"`` folds the check into CollectMetrics
    nodes riding the caller's OWN first action (the CC pattern,
    VERDICT r03 next #5: zero extra jobs) — call
    :func:`check_sample_guard` on the returned DataFrame after that
    action to raise on shortfall."""
    if guard not in ("eager", "observe"):
        raise ValueError(f"unknown guard {guard!r}")
    h = _hash_key(id_col, seed).alias("__h")
    if strategy == "window":
        w = Window.partitionBy(group_col).orderBy(F.col("__h"), F.col(id_col))
        out = (
            df.withColumn("__h", h)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__h", "__rn")
        )
        if guard == "observe":
            # the window path ranks EVERY row, so min(k, n) per stratum
            # holds by construction — but a caller that asked for the
            # observe guard still gets one to hand to
            # check_sample_guard (r04 review batch 2: it was silently
            # ignored and the contractual check then raised)
            from pyspark.sql import Observation

            obs = Observation()
            out = out.observe(
                obs,
                F.count(F.lit(1)).alias("expected"),
                F.count(F.lit(1)).alias("actual"),
            )
            out._feast_sample_guard = (obs, obs, oversample)
        return out
    if strategy != "threshold":
        raise ValueError(f"unknown strategy {strategy!r}")

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    hashed = df.withColumn("__h", h)
    # survival threshold as a hex-string prefix bound: keep rows whose
    # first 8 hex chars < cut, cut/16^8 ≈ oversample*k/n (clamped to 1)
    frac = F.least(
        F.lit(1.0), F.lit(float(oversample) * k) / F.col("__n")
    )
    cut = _hex_cut(frac)
    # eqNullSafe: a NULL stratum must survive the prefilter join too —
    # the window strategy samples it, so both strategies must agree on
    # nullable group columns (ADVICE r03 low).
    # NO forced broadcast (r04 review): stratum cardinality is
    # data-dependent — domain_quota_sample feeds tens of millions of
    # registrable domains at crawl scale, several GB as a broadcast.
    # AQE sees counts' ACTUAL post-aggregation size at runtime and
    # converts to broadcast when it fits the threshold; when it doesn't,
    # the shuffle join co-partitions on the stratum key, which the
    # per-stratum window below reuses anyway.
    cdf = counts.withColumnRenamed(group_col, "__g")
    joined = hashed.join(
        cdf, F.col(group_col).eqNullSafe(F.col("__g"))
    ).drop("__g")
    survivors = joined.filter(
        # saturated strata (n ≤ oversample·k) keep everything — also
        # dodges the frac=1.0 edge where the hex cut would be 9 digits
        (frac >= F.lit(1.0))
        | (F.substring("__h", 1, 8) < cut)
    )
    w = Window.partitionBy(group_col).orderBy(F.col("__h"), F.col(id_col))
    if guard == "observe":
        # zero-extra-job guard: expected output size Σ_strata min(k, n)
        # is accumulated on the main data path pre-filter (each joined
        # row contributes min(k, __n)/__n — exactly min(k, n) per
        # stratum after summing its n rows), the actual output size on
        # the returned node. Both metrics ride the caller's first
        # action; check_sample_guard() compares them. A vanished
        # stratum (all rows hashed above the cut) still contributes to
        # `expected` because the observation sits BEFORE the prefilter.
        from pyspark.sql import Observation

        obs_in, obs_out = Observation(), Observation()
        joined_obs = joined.observe(
            obs_in,
            F.sum(
                F.least(F.lit(float(k)), F.col("__n").cast("double"))
                / F.col("__n")
            ).alias("expected"),
        )
        survivors_obs = joined_obs.filter(
            (frac >= F.lit(1.0)) | (F.substring("__h", 1, 8) < cut)
        )
        out = (
            survivors_obs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__h", "__rn", "__n")
            .observe(obs_out, F.count(F.lit(1)).alias("actual"))
        )
        out._feast_sample_guard = (obs_in, obs_out, oversample)
        return out
    ranked = survivors.withColumn("__rn", F.row_number().over(w))
    # guarantee check: each stratum must keep min(k, n) survivors. The
    # check is anchored on `counts` (every stratum in the INPUT), not on
    # the survivors — a stratum whose every row hashed above the cut
    # vanishes from `ranked` entirely and an agg over survivors would
    # miss it, silently under-sampling (ADVICE r03 medium). Absent
    # strata count as 0 via the left join. NOTE this is a second action
    # that re-executes the survivor plan (documented trade; the prefilter
    # makes the re-run ~oversample·k rows per stratum, not n).
    got = ranked.groupBy(group_col).agg(F.max("__rn").alias("__got"))
    short = (
        counts.join(
            got.withColumnRenamed(group_col, "__g"),
            F.col(group_col).eqNullSafe(F.col("__g")),
            "left",
        )
        .withColumn("__got", F.coalesce(F.col("__got"), F.lit(0)))
        .filter(F.col("__got") < F.least(F.lit(k), F.col("__n")))
        .limit(1)
        .collect()
    )
    if short:
        r = short[0]
        raise RuntimeError(
            f"stratum {r[group_col]!r} kept {r['__got']}/{min(k, r['__n'])} "
            f"rows at oversample={oversample}; retry with a larger "
            "oversample"
        )
    return ranked.filter(F.col("__rn") <= k).drop("__h", "__rn", "__n")


def check_sample_guard(df: DataFrame) -> int:
    """Raise if a ``stratified_sample(..., guard="observe")`` result
    under-sampled any stratum. Call AFTER the first action on ``df``
    (write/collect/count — the observations ride that action; this call
    blocks until they materialize but runs no job of its own). Returns
    the sampled row count on success."""
    try:
        obs_in, obs_out, oversample = df._feast_sample_guard
    except AttributeError:
        raise ValueError(
            "DataFrame carries no sample guard — produced by "
            'stratified_sample(strategy="threshold", guard="observe")?'
        ) from None
    expected = obs_in.get["expected"] or 0.0
    actual = obs_out.get["actual"]
    # `expected` sums n per-row doubles per stratum; 0.5 absorbs the
    # float accumulation error (≪ 1 row for any real k/n)
    if actual + 0.5 < expected:
        raise RuntimeError(
            f"stratified sample kept {actual} rows but the input's "
            f"strata required ~{round(expected)} at oversample="
            f"{oversample}; retry with a larger oversample"
        )
    return actual


def registrable_domain(url_col: str | Column) -> Column:
    """Lower-cased registrable domain of a URL: the last two dot-labels
    of the host (``www.Site7.NET/x`` → ``site7.net``). A public-suffix
    list would split ``co.uk``-style hosts correctly; none ships in this
    container, so last-two-labels is the documented approximation (the
    same one C4's original corpus tooling used before PSL adoption).
    Hosts with a single label (``localhost``) pass through whole; URLs
    with no parseable host yield NULL (``try_parse_url`` — a crawl
    always contains malformed URLs; a throwing parse would kill the
    whole job for one bad row)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    # strip trailing dot(s): 'example.com.' is a legal FQDN spelling of
    # 'example.com' and real crawls contain both — without this, the
    # two-label regex can't match a dot-final host, the whole host falls
    # through, and a blocklisted/quota'd domain escapes under its FQDN
    # alias (r04 review). An all-dots host normalizes to NULL.
    host = F.nullif(
        F.regexp_replace(
            F.lower(F.try_parse_url(c, F.lit("HOST"))), r"\.+$", ""
        ),
        F.lit(""),
    )
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(host.isNull(), F.lit(None)).otherwise(
        F.when(two == "", host).otherwise(two)
    )


def domain_quota_sample(
    df: DataFrame,
    *,
    url_col: str,
    id_col: str,
    quota: int,
    seed: int = 42,
    strategy: str = "threshold",
    oversample: float = 4.0,
    guard: str = "eager",
    domain_out: str = "domain",
) -> DataFrame:
    """Cap the corpus at ``quota`` documents per registrable domain —
    the RefinedWeb / Dolma curation step that stops patent mirrors and
    link farms from dominating a crawl-derived training set.

    Semantics: exactly :func:`stratified_sample` with the stratum
    derived per-row from ``url_col`` via :func:`registrable_domain`
    (kept in the output as ``domain_out`` for auditability). Kept rows
    are the ``quota`` smallest ``md5(id|seed)`` per domain —
    deterministic on any cluster size, partitioning, or retry.

    Scale shape: domains are quota-capped precisely BECAUSE they are
    hot, so the default is the ``threshold`` strategy — the hash
    prefilter shrinks a 10^9-page domain to ~``oversample*quota`` rows
    before the per-domain window ranks them; the window strategy would
    put the whole hot domain in one task. NULL domains (unparseable
    URLs) form their own stratum and are capped like any other
    (eqNullSafe plumbing in stratified_sample).
    """
    tagged = df.withColumn(domain_out, registrable_domain(url_col))
    return stratified_sample(
        tagged,
        group_col=domain_out,
        id_col=id_col,
        k=quota,
        seed=seed,
        strategy=strategy,
        oversample=oversample,
        guard=guard,
    )


def weighted_mix(
    df: DataFrame,
    *,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    epoch_col: str = "epoch",
    seed: int = 42,
) -> DataFrame:
    """Deterministic source-weighted resampling — the pretraining data-mix
    step (LLaMA's per-source epoch counts; DoReMi's domain weights):
    weight ``w`` for a source means every document of that source appears
    ``floor(w)`` times, plus once more iff its portable hash falls under
    ``frac(w)`` — so a 2.5× source yields exactly 2 or 3 copies per doc
    with the fractional epoch a uniform-without-replacement subset,
    reproducible on any cluster size / partitioning / retry. Weight 0
    drops the source; sources absent from ``weights`` get
    ``default_weight``.

    Output adds ``epoch_col`` (0-based copy index) so downstream packing
    or a hash-shuffle can interleave epochs instead of concatenating
    them. Scale shape: the weight table compiles into ONE chained CASE
    expression (no join, whole-stage codegen) and the copy fan-out is a
    map-side ``explode`` — zero shuffles; output size is exactly
    Σ_source w·n as the mix intends.
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}")
    if default_weight < 0:
        raise ValueError("negative default_weight")

    src = F.col(source_col)
    w_expr: Column = F.lit(float(default_weight))
    for s, w in sorted(weights.items()):
        w_expr = F.when(src == s, F.lit(float(w))).otherwise(w_expr)
    base = F.floor(w_expr).cast("int")
    frac = w_expr - F.floor(w_expr)
    # same hex-prefix-vs-cut comparison as hash_split, but the cut is a
    # per-row expression (frac varies by source); 16^8 buckets of the
    # md5 prefix ≈ 2.3e-10 quantization, dwarfed by corpus variance.
    # frac is always < 1.0 here (w − floor(w)), so _hex_cut's 8-digit
    # domain holds.
    cut = _hex_cut(frac)
    extra = (
        F.substring(_hash_key(id_col, seed), 1, 8) < cut
    ).cast("int")
    n = (base + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)),
        )
        .drop("__n")
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Greedy sequence packing — the LLM-pretraining batch-construction
    step: group documents into packs whose total ``size_col`` (token
    count) stays ≤ ``budget``, so downstream training reads fixed-size
    concatenated sequences with minimal padding.

    Scale shape: docs hash-shard into ``n_shards`` independent groups
    (content-derived, deterministic); each shard packs SEQUENTIALLY in
    one ``applyInPandas`` task — packing is inherently order-dependent,
    so the parallelism unit is the shard, not the row. Within a shard,
    docs are ordered by the portable content hash (reproducible under
    any input partitioning) and packed first-fit-sequentially; a doc
    larger than the budget gets a singleton pack (flagged
    ``oversize=true``) rather than being silently dropped. Pack ids are
    globally unique: ``shard * 2^40 + local``. At 10^12 docs, pick
    n_shards ≈ docs/10^6 so each task's Python loop stays ~seconds.

    Returns (id_col, size_col, shard, pack_id, oversize). No SQL oracle
    (sequential dependency); semantics pinned by tests/test_sampling.py.
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError("budget must be positive")

    id_type = df.schema[id_col].dataType.simpleString()
    size_type = df.schema[size_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, {size_col} {size_type}, "
        "shard int, pack_id long, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__h", kind="mergesort")
        shard = int(pdf["__shard"].iloc[0])
        sizes = pdf[size_col].to_numpy()
        pack_local = []
        cur_id, cur_fill = 0, 0
        for s in sizes:
            s = int(s)
            if cur_fill > 0 and cur_fill + s > budget:
                cur_id += 1
                cur_fill = 0
            pack_local.append(cur_id)
            cur_fill += s
            if s > budget:  # oversize singleton: close it immediately
                cur_id += 1
                cur_fill = 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                size_col: sizes,
                "shard": shard,
                "pack_id": [shard * (1 << 40) + p for p in pack_local],
                "oversize": sizes > budget,
            }
        )

    hashed = df.select(
        id_col,
        size_col,
        _hash_key(id_col, seed).alias("__h"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        .cast("int").alias("__shard"),
    )
    return hashed.groupBy("__shard").applyInPandas(pack, out_schema)


def hash_split(
    df: DataFrame,
    *,
    id_col: str,
    test_frac: float,
    seed: int = 42,
) -> DataFrame:
    """Adds a ``split`` column ('test' iff the row's hash prefix falls in
    the first ``test_frac`` of the hash space). Stable: a row's split
    never changes as the corpus grows — the property that keeps eval
    sets leak-free across corpus versions."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac must be in [0, 1]")
    if test_frac == 1.0:  # the hex cut would be 9 digits and mis-compare
        return df.withColumn("split", F.lit("test"))
    cut = format(int(test_frac * 16**8), "08x")
    h8 = F.substring(_hash_key(id_col, seed), 1, 8)
    return df.withColumn(
        "split",
        F.when(h8 < F.lit(cut), F.lit("test")).otherwise(F.lit("train")),
    )


# ------------------------------------------ DSIR importance resampling -----


def hashed_feature_histogram(
    df: DataFrame,
    *,
    text_col: str = "text",
    dim: int = 4096,
    include_bigrams: bool = True,
    seed_salt: str | None = None,
) -> "list[int]":
    """Bucket histogram of DSIR hashed n-gram features over a corpus:
    ONE map-side-combinable shuffle to ≤``dim`` keys, then a
    dim-bounded collect (the histogram IS the model — it must fit on
    the driver to ship inside the scoring expression, exactly like the
    classifier weight table). Returns a dense length-``dim`` count
    list."""
    from feast_spark.operators.text import hashed_ngram_buckets

    rows = (
        df.select(
            F.explode(
                hashed_ngram_buckets(
                    F.col(text_col), dim=dim,
                    include_bigrams=include_bigrams, seed_salt=seed_salt,
                )
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    hist = [0] * dim
    for r in rows:
        hist[r["b"]] = r["count"]
    return hist


def dsir_log_ratios(
    target_hist: "list[int]",
    raw_hist: "list[int]",
    *,
    alpha: float = 1.0,
) -> "list[float]":
    """Per-bucket smoothed log importance ratio
    ``ln p_target(b) − ln p_raw(b)`` with add-``alpha`` smoothing over
    ``dim`` buckets (Xie et al. 2023 eq. 2's hashed-n-gram estimator)."""
    import math

    dim = len(target_hist)
    if len(raw_hist) != dim:
        raise ValueError("histograms must share dim")
    t_tot = sum(target_hist) + alpha * dim
    r_tot = sum(raw_hist) + alpha * dim
    return [
        math.log((t + alpha) / t_tot) - math.log((r + alpha) / r_tot)
        for t, r in zip(target_hist, raw_hist)
    ]


def dsir_logweights(
    corpus: DataFrame,
    *,
    log_ratios: "list[float]",
    text_col: str = "text",
    include_bigrams: bool = True,
    seed_salt: str | None = None,
    out_col: str = "dsir_logw",
) -> DataFrame:
    """Per-document DSIR log importance weight: the sum of
    ``log_ratios[bucket]`` over the doc's hashed n-gram features
    (counts enter by repetition — a feature occurring c times adds
    c·lr[b], eq. 3). The ratio table ships as ONE array literal
    (classifier-weight pattern, fine to ~10^5 buckets); scoring is a
    pure JVM fold over the feature array — zero shuffle, zero Python.
    NULL text → NULL weight."""
    from feast_spark.operators.text import hashed_ngram_buckets

    lr = F.array(*[F.lit(float(x)) for x in log_ratios])
    feats = hashed_ngram_buckets(
        F.col(text_col), dim=len(log_ratios),
        include_bigrams=include_bigrams, seed_salt=seed_salt,
    )
    score = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(lr, b + F.lit(1)),
    )
    return corpus.withColumn(out_col, score)


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    alpha: float = 1.0,
    include_bigrams: bool = True,
    seed: int = 42,
    seed_salt: str | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023): pick
    ``k`` corpus docs distributed like ``target`` by Gumbel-top-k over
    the DSIR log weights — sampling without replacement ∝ softmax(logw),
    derandomized the repo way: the Gumbel noise comes from the portable
    md5 hash of (id|seed), so the SAME rows are selected on any cluster
    size, partitioning, or retry (no ``rand()``).

    Plan shape: two histogram aggregations (map-side-combinable, ≤dim
    keys each), then one corpus scan scoring against the literal ratio
    table and a global top-k (TakeOrderedAndProject) — no corpus-wide
    sort materializes. Returns the selected rows with ``dsir_logw``."""
    raw_hist = hashed_feature_histogram(
        corpus, text_col=text_col, dim=dim,
        include_bigrams=include_bigrams, seed_salt=seed_salt,
    )
    tgt_hist = hashed_feature_histogram(
        target, text_col=text_col, dim=dim,
        include_bigrams=include_bigrams, seed_salt=seed_salt,
    )
    lr = dsir_log_ratios(tgt_hist, raw_hist, alpha=alpha)
    scored = dsir_logweights(
        corpus, log_ratios=lr, text_col=text_col,
        include_bigrams=include_bigrams, seed_salt=seed_salt,
    )
    # Gumbel(0,1) from a portable uniform: u = (h + 0.5) / 2^32 ∈ (0,1)
    u = (
        F.conv(F.substring(_hash_key(F.col(id_col), seed), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    gumbel = -F.log(-F.log(u))
    return (
        scored.withColumn("__key", F.col("dsir_logw") + gumbel)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key")
    )
