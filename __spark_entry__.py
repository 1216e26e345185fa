"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the feast_spark engine; ``oracle_sql()`` gives the DuckDB-ANSI
equivalent over the same parquet views. Rows-only entries (no oracle) are
the genuinely non-SQL-expressible ops (MinHash-LSH, SimHash, approx
sketches) — SURVEY.md marks them `rows`.

Column-name discipline: every computed column is aliased identically in
Spark and SQL (driver hashes values after sorting columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

PIT_TTL_S = 7 * 86400


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events_pit_inputs(spark: SparkSession, sf_dir: str):
    """Probes = every 5th event shifted +30min; features = all events.

    events(user_id, ts, value) stands in for (url, warc_ts, feature) —
    TESTDATA.md role mapping. (user_id, ts) is unique in the driver data
    (verified), so ASOF oracles are tie-free.
    """
    ev = _t(spark, sf_dir, "events")
    probes = (
        ev.filter(F.col("event_id") % 5 == 0)
        .select(
            "user_id",
            (F.col("ts").cast("timestamp") + F.expr("INTERVAL 30 MINUTES")).alias("ts"),
        )
    )
    feats = ev.select("user_id", F.col("ts").alias("ets"), "value")
    return probes, feats


def _pit(spark: SparkSession, sf_dir: str, strategy: str) -> DataFrame:
    from feast_spark.operators.asof import asof_join

    probes, feats = _events_pit_inputs(spark, sf_dir)
    out = asof_join(
        probes,
        feats,
        by="user_id",
        left_on="ts",
        right_on="ets",
        ttl=timedelta(seconds=PIT_TTL_S),
        strategy=strategy,
        include_event_ts=True,
        event_ts_name="event_ts",
    )
    return out.select(
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        "event_ts",
    )


_PIT_ORACLE = f"""
WITH probes AS (
  SELECT user_id, ts + INTERVAL 30 MINUTES AS ts
  FROM events WHERE event_id % 5 = 0
),
j AS (
  SELECT p.user_id, p.ts, f.value, f.ts AS event_ts
  FROM probes p ASOF LEFT JOIN events f
    ON p.user_id = f.user_id AND p.ts >= f.ts
)
SELECT user_id, ts,
       CASE WHEN event_ts >= ts - INTERVAL {PIT_TTL_S} SECONDS
            THEN round(value, 6) END AS value,
       CASE WHEN event_ts >= ts - INTERVAL {PIT_TTL_S} SECONDS
            THEN event_ts END AS event_ts
FROM j
"""


# ---------------------------------------------------------------------
# individual queries
# ---------------------------------------------------------------------

def q_pit_asof_union(spark, sf_dir):
    return _pit(spark, sf_dir, "union")


def q_pit_asof_broadcast(spark, sf_dir):
    return _pit(spark, sf_dir, "broadcast")


def q_pit_asof_cogroup(spark, sf_dir):
    return _pit(spark, sf_dir, "cogroup")


def q_pit_no_ttl(spark, sf_dir):
    from feast_spark.operators.asof import asof_join

    probes, feats = _events_pit_inputs(spark, sf_dir)
    out = asof_join(
        probes, feats, by="user_id", left_on="ts", right_on="ets",
        ttl=None, strategy="union", include_event_ts=True,
        event_ts_name="event_ts",
    )
    return out.select("user_id", "ts", F.round("value", 6).alias("value"), "event_ts")


def q_lag_lead(spark, sf_dir):
    from feast_spark.operators.windows import key_window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        F.round(F.lag("value", 1).over(w), 6).alias("lag1_value"),
        F.round(F.lead("value", 1).over(w), 6).alias("lead1_value"),
    )


def _cents(col) -> F.Column:
    """Exact integer cents: driver values carry 2 decimals; summing longs
    sidesteps float-order nondeterminism so Spark and DuckDB agree to the
    last bit (a plain double sum rounds differently at .5 ulp boundaries)."""
    return F.round(F.col(col) * 100).cast("long")


def q_running_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        (F.sum(_cents("value")).over(w) / 100.0).alias("running_sum"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


def q_rolling_7d(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("double"))
        .rangeBetween(-PIT_TTL_S, 0)
    )
    cnt = F.count(F.lit(1)).over(w)
    csum = F.sum(_cents("value")).over(w)
    return ev.select(
        "event_id",
        cnt.alias("roll_count"),
        (csum / 100.0).alias("roll_sum"),
        F.round(csum / cnt / 100.0, 6).alias("roll_mean"),
        F.round(F.min("value").over(w), 6).alias("roll_min"),
        F.round(F.max("value").over(w), 6).alias("roll_max"),
    )


def q_sessionize(spark, sf_dir):
    from feast_spark.operators.windows import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(
        ev, key="user_id", order="ts", gap_seconds=1800
    ).select("user_id", "sess_id", "sess_start", "sess_end", "n_events")


def q_latest_per_key(spark, sf_dir):
    from feast_spark.operators.windows import latest_per_key

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    # event_id is unique → use it as the created/tiebreak column
    out = latest_per_key(ev, key="user_id", order="ts", created_col="event_id")
    return out.select("user_id", "ts", "event_id", F.round("value", 6).alias("value"))


def q_backfill_fill(spark, sf_dir):
    from feast_spark.operators.windows import backfill_fill

    ev = _t(spark, sf_dir, "events").withColumn(
        "v_sparse",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")),
    )
    out = backfill_fill(ev, ["v_sparse"], key="user_id", order="ts")
    # orderBy inside backfill uses (ts); ties impossible (unique user_id,ts)
    return out.select("event_id", F.round("v_sparse", 6).alias("v_filled"))


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(_cents("l_quantity")) / 100.0).alias("sum_qty"),
            (F.sum(_cents("l_extendedprice")) / 100.0).alias("sum_base_price"),
            (
                F.sum(_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
                / 10000.0
            ).alias("sum_disc_price"),
            F.round(F.sum(_cents("l_quantity")) / F.count(F.lit(1)) / 100.0, 6).alias(
                "avg_qty"
            ),
            F.round(F.sum(_cents("l_discount")) / F.count(F.lit(1)) / 100.0, 6).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("price"), "rn")
    )


def q_cube_lang_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .select("lang", "source", "n", "gid")
    )


def q_distinct_per_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(_cents("value")) / 100.0).alias("sum_value"),
    )


def q_quantiles_per_lang(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.median("n_chars"), 4).alias("med_chars"),
        F.round(F.percentile("n_chars", 0.25), 4).alias("p25"),
        F.round(F.percentile("n_chars", 0.75), 4).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


def q_star_join_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            (F.sum(_cents("o_totalprice")) / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def q_except_all(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return clicks.exceptAll(views)


def q_salted_join(spark, sf_dir):
    from feast_spark.operators.asof import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    j = salted_join(li, o, on="l_orderkey", salt=8, how="inner")
    return j.groupBy("o_orderstatus").agg(
        (
            F.sum(_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
            / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


def q_text_stats(spark, sf_dir):
    from feast_spark.operators.text import n_tokens_ws

    d = _t(spark, sf_dir, "documents")
    safe_len = F.greatest(F.length("text").cast("double"), F.lit(1.0))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_sp"),
        n_tokens_ws("text").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", r"[^.,;:!?]", "")) / safe_len, 6
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace("text", r"[^0-9]", "")) / safe_len, 6
        ).alias("digit_ratio"),
        F.upper(F.substring("text", 1, 10)).alias("head10"),
    )


def q_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def q_array_ops(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    head_sum = F.aggregate(
        F.slice("embedding", 1, 4),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(head_sum, 4).alias("head4_sum"),
        "label",
    )


def q_cosine_topk(spark, sf_dir):
    from feast_spark.operators.similarity import cosine_topk_to_query

    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk_to_query(e, query_vec_id=0, k=5, round_digits=4)


def q_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    dup = d.unionByName(
        d.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    return dup.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("keep_id", "n_copies")


def q_minhash_near_dup(spark, sf_dir):
    from feast_spark.operators.dedupe import minhash_near_dup_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # synth near-dups: copy with the last token dropped
    mutated = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, size(split(text, ' ')) - 1))"
        ).alias("text"),
    )
    corpus = d.unionByName(mutated)
    pairs = minhash_near_dup_pairs(
        corpus, id_col="doc_id", text_col="text", threshold=0.7,
        num_hashes=32, bands=8, shingle_k=3,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_simhash_buckets(spark, sf_dir):
    from feast_spark.operators.dedupe import simhash64

    d = _t(spark, sf_dir, "documents")
    out = d.select("doc_id", simhash64(F.col("text")).alias("simhash"))
    return out.groupBy("simhash").agg(F.count(F.lit(1)).alias("n"))


def q_approx_distinct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


def q_lang_id(spark, sf_dir):
    from feast_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id("text").alias("lang_pred"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIT as-of retrieval (union+window) on sf0.001 events."""
    return q_pit_asof_union(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pit_asof_union": q_pit_asof_union,
        "pit_asof_broadcast": q_pit_asof_broadcast,
        "pit_asof_cogroup": q_pit_asof_cogroup,
        "pit_no_ttl": q_pit_no_ttl,
        "lag_lead": q_lag_lead,
        "running_sum": q_running_sum,
        "rolling_7d": q_rolling_7d,
        "sessionize": q_sessionize,
        "latest_per_key": q_latest_per_key,
        "backfill_fill": q_backfill_fill,
        "pricing_summary": q_pricing_summary,
        "topk_per_group": q_topk_per_group,
        "cube_lang_source": q_cube_lang_source,
        "distinct_per_type": q_distinct_per_type,
        "quantiles_per_lang": q_quantiles_per_lang,
        "star_join_revenue": q_star_join_revenue,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "except_all": q_except_all,
        "salted_join": q_salted_join,
        "text_stats": q_text_stats,
        "json_extract": q_json_extract,
        "array_ops": q_array_ops,
        "cosine_topk": q_cosine_topk,
        "dedup_exact": q_dedup_exact,
        "minhash_near_dup": q_minhash_near_dup,
        "simhash_buckets": q_simhash_buckets,
        "approx_distinct": q_approx_distinct,
        "lang_id": q_lang_id,
    }


def oracle_sql() -> dict[str, str]:
    pit = _PIT_ORACLE
    return {
        "pit_asof_union": pit,
        "pit_asof_broadcast": pit,
        "pit_asof_cogroup": pit,
        "pit_no_ttl": """
            WITH probes AS (
              SELECT user_id, ts + INTERVAL 30 MINUTES AS ts
              FROM events WHERE event_id % 5 = 0
            )
            SELECT p.user_id, p.ts, round(f.value, 6) AS value, f.ts AS event_ts
            FROM probes p ASOF LEFT JOIN events f
              ON p.user_id = f.user_id AND p.ts >= f.ts
        """,
        "lag_lead": """
            SELECT user_id, ts, round(value, 6) AS value,
                   round(lag(value) OVER w, 6) AS lag1_value,
                   round(lead(value) OVER w, 6) AS lead1_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "running_sum": """
            SELECT event_id,
                   sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0
                     AS running_sum,
                   count(*) OVER w AS running_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "rolling_7d": f"""
            SELECT event_id,
                   count(*) OVER w AS roll_count,
                   sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0
                     AS roll_sum,
                   round(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                         / CAST(count(*) OVER w AS DOUBLE) / 100.0, 6)
                     AS roll_mean,
                   round(min(value) OVER w, 6) AS roll_min,
                   round(max(value) OVER w, 6) AS roll_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)/1000000.0
                         RANGE BETWEEN {PIT_TTL_S} PRECEDING AND CURRENT ROW)
        """,
        "sessionize": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_us(ts)/1000000.0
                               - lag(epoch_us(ts)/1000000.0)
                                 OVER (PARTITION BY user_id ORDER BY ts)
                               > 1800
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                          THEN 1 ELSE 0 END AS boundary
              FROM events
            ),
            s AS (
              SELECT user_id, ts,
                     sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sess_id
              FROM g
            )
            SELECT user_id, sess_id, min(ts) AS sess_start,
                   max(ts) AS sess_end, count(*) AS n_events
            FROM s GROUP BY user_id, sess_id
        """,
        "latest_per_key": """
            SELECT user_id, ts, event_id, round(value, 6) AS value
            FROM (
              SELECT user_id, ts, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "backfill_fill": """
            SELECT event_id,
                   round(last_value(
                     CASE WHEN event_type = 'error' THEN NULL ELSE value END
                     IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                     AS v_filled
            FROM events
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
                     AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                     AS sum_base_price,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     / 10000.0 AS sum_disc_price,
                   round(sum(CAST(round(l_quantity * 100) AS BIGINT))
                         / CAST(count(*) AS DOUBLE) / 100.0, 6) AS avg_qty,
                   round(sum(CAST(round(l_discount * 100) AS BIGINT))
                         / CAST(count(*) AS DOUBLE) / 100.0, 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price, rn
            FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "cube_lang_source": """
            SELECT lang, source, count(*) AS n,
                   2 * grouping(lang) + grouping(source) AS gid
            FROM documents GROUP BY CUBE(lang, source)
        """,
        "distinct_per_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events,
                   sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
            FROM events GROUP BY event_type
        """,
        "quantiles_per_lang": """
            SELECT lang,
                   round(median(n_chars), 4) AS med_chars,
                   round(quantile_cont(n_chars, 0.25), 4) AS p25,
                   round(quantile_cont(n_chars, 0.75), 4) AS p75,
                   count(*) AS n
            FROM documents GROUP BY lang
        """,
        "star_join_revenue": """
            SELECT r_name,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                     AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (
              SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        """,
        "except_all": """
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'view'
        """,
        "salted_join": """
            SELECT o_orderstatus,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                     / 10000.0 AS revenue,
                   count(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus
        """,
        "text_stats": r"""
            SELECT doc_id,
                   length(text) AS n_chars_sp,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         / greatest(CAST(length(text) AS DOUBLE), 1.0), 6)
                     AS punct_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         / greatest(CAST(length(text) AS DOUBLE), 1.0), 6)
                     AS digit_ratio,
                   upper(substr(text, 1, 10)) AS head10
            FROM documents
        """,
        "json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events
        """,
        "array_ops": """
            SELECT vec_id,
                   len(embedding) AS dim,
                   round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                     AS l2_norm,
                   round(list_sum(list_transform(embedding[1:4],
                     x -> CAST(x AS DOUBLE))), 4) AS head4_sum,
                   label
            FROM embeddings
        """,
        "cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT e.vec_id,
                     list_sum(list_transform(range(1, len(e.embedding) + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(q.qv[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(q.qv,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                     AS cos
              FROM embeddings e, q
              WHERE e.vec_id <> 0
            )
            SELECT vec_id, round(cos, 4) AS cosine
            FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 5
        """,
        "dedup_exact": """
            WITH dup AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
            )
            SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM dup GROUP BY text
        """,
        # minhash_near_dup / simhash_buckets / approx_distinct / lang_id:
        # hash- or sketch-based — not expressible in portable SQL; the
        # driver records rows-only checks (SURVEY.md §2 marks them `rows`).
    }
