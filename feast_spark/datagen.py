"""Deterministic synthetic Common-Crawl-style pages + probes generator.

Implements FIXTURES.md §1-2: the binding input shape is
``(url string, warc_ts timestamp[us], html binary, text string, lang string)``
(BASELINE.json input_hint). Generation is pure numpy + stdlib with a fixed
seed — identical output across runs and machines.

Design notes for scale: this generator itself is a test/bench utility and
runs on the driver (or, via ``generate_pages_distributed``, partitioned
across executors with a per-partition seed) — the *engine* never depends
on it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from feast_spark.extract_spec import extract_text

EPOCH_START_US = np.int64(1_700_000_000_000_000)  # 2023-11-14T22:13:20Z
DAY_US = np.int64(86_400_000_000)
RANGE_DAYS = 90

LANGS = np.array(["en", "de", "fr", "es", "zz"])
LANG_P = np.array([0.55, 0.15, 0.12, 0.10, 0.08])

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "dolore magna aliqua enim minim veniam quis nostrud exercitation "
    "data feature store spark parquet shuffle partition window session".split()
)


def _zipf_domain_ids(rng: np.random.Generator, n: int, n_domains: int) -> np.ndarray:
    """Zipf(a=1.3)-distributed domain ids in [0, n_domains) — a few hot
    domains, exercising key-salting (SURVEY.md §4.2.2)."""
    ranks = np.arange(1, n_domains + 1, dtype=np.float64)
    p = ranks ** -1.3
    p /= p.sum()
    return rng.choice(n_domains, size=n, p=p)


def _make_html(rng: np.random.Generator, title: str, n_paras: int) -> bytes:
    paras = []
    for _ in range(n_paras):
        n_words = int(rng.integers(5, 40))
        words = rng.choice(_WORDS, size=n_words)
        body = " ".join(words.tolist())
        # inject entities / nested tags / comments deterministically-ish
        r = int(rng.integers(0, 4))
        if r == 0:
            body += " &amp; snowman &#x2603;"
        elif r == 1:
            body = f"<b>{body}</b> <i>em</i>"
        elif r == 2:
            body += "<!-- hidden comment -->"
        paras.append(f"<p>{body}</p>")
    return (
        "<html><head>"
        f"<title>{title}</title>"
        "<style>body {color: #333;} .x > p {margin: 0;}</style>"
        "</head><body>"
        "<script>var x = '<p>not text</p>'; if (x < 3) { x++; }</script>"
        f"<h1>{title}</h1>"
        + "".join(paras)
        + "<noscript>enable js</noscript></body></html>"
    ).encode("utf-8")


def generate_pages(
    n_urls: int = 500,
    n_domains: int = 50,
    max_crawls: int = 6,
    seed: int = 42,
    dup_rate: float = 0.005,
) -> pa.Table:
    """Generate the pages table as a pyarrow Table.

    Each url is re-crawled 1..max_crawls times with increasing warc_ts;
    ~dup_rate of rows are exact (url, warc_ts) duplicates (tie-break /
    dedupe fixtures, SURVEY.md P6/A1).
    """
    rng = np.random.default_rng(seed)
    domain_ids = _zipf_domain_ids(rng, n_urls, n_domains)
    crawl_counts = rng.integers(1, max_crawls + 1, size=n_urls)

    urls: list[str] = []
    ts_us: list[int] = []
    htmls: list[bytes] = []
    langs: list[str] = []

    for i in range(n_urls):
        url = f"https://d{domain_ids[i]:03d}.example/p/{i}"
        lang = str(rng.choice(LANGS, p=LANG_P))
        k = int(crawl_counts[i])
        # increasing crawl times over the 90-day range
        offsets = np.sort(rng.integers(0, RANGE_DAYS * DAY_US, size=k))
        for j in range(k):
            t = int(EPOCH_START_US + offsets[j])
            title = f"Page {i} rev {j}"
            html = _make_html(rng, title, int(rng.integers(1, 12)))
            urls.append(url)
            ts_us.append(t)
            htmls.append(html)
            langs.append(lang)
            if rng.random() < dup_rate:
                # exact-duplicate row: same url + warc_ts, different html rev
                urls.append(url)
                ts_us.append(t)
                htmls.append(_make_html(rng, f"Page {i} rev {j} dup", 2))
                langs.append(lang)

    texts = [extract_text(h) for h in htmls]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_us, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_probes(pages: pa.Table, n_probes: int = 300, seed: int = 7) -> pa.Table:
    """Probe/entity table per FIXTURES.md §2: ~80% hits, ~10% before-first-
    crawl (leakage edge), ~10% never-seen urls; ts mixture includes the
    at-or-before equality boundary."""
    rng = np.random.default_rng(seed)
    url_arr = pages.column("url").to_numpy(zero_copy_only=False)
    ts_arr = pages.column("warc_ts").cast(pa.int64()).to_numpy()
    uniq_urls = np.unique(url_arr)

    p_urls: list[str] = []
    p_ts: list[int] = []
    for _ in range(n_probes):
        r = rng.random()
        if r < 0.10:
            p_urls.append(f"https://never-seen-{int(rng.integers(0, 10**6))}.example/x")
            p_ts.append(int(EPOCH_START_US + rng.integers(0, RANGE_DAYS * DAY_US)))
            continue
        url = str(rng.choice(uniq_urls))
        mask = url_arr == url
        ev = np.sort(ts_arr[mask])
        if r < 0.20:
            # probed before first crawl → must be NULL (zero leakage)
            p_ts.append(int(ev[0] - rng.integers(1, 5 * DAY_US)))
        elif r < 0.40:
            # exactly at an event: at-or-before boundary must match
            p_ts.append(int(rng.choice(ev)))
        elif r < 0.80:
            p_ts.append(int(rng.choice(ev) + rng.integers(0, 3 * DAY_US)))
        else:
            # after last event, possibly beyond TTL
            p_ts.append(int(ev[-1] + rng.integers(0, 45 * DAY_US)))
        p_urls.append(url)
    return pa.table(
        {
            "url": pa.array(p_urls, pa.string()),
            "ts": pa.array(p_ts, pa.timestamp("us")),
        }
    )


def write_parquet(table: pa.Table, path: str) -> None:
    pq.write_table(table, path)


def generate_pages_distributed(spark, n_urls: int, n_domains: int = 1000,
                               max_crawls: int = 6, seed: int = 42,
                               n_partitions: int | None = None):
    """Generate a large pages table ON THE EXECUTORS via mapInPandas —
    the bench-scale path (no driver-side materialization).

    Each partition derives its own rng seed from (seed, partition id), so
    output is deterministic for a fixed (n_urls, n_partitions).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism * 2
    per_part = -(-n_urls // n_partitions)  # ceil

    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def gen(iterator):
        for pdf in iterator:
            for pid in pdf["pid"]:
                start = int(pid) * per_part
                count = min(per_part, n_urls - start)
                if count <= 0:
                    continue
                rng = np.random.default_rng((seed, int(pid)))
                tbl = _gen_pages_block(rng, start, count, n_domains, max_crawls)
                yield tbl
        return

    pid_df = spark.range(n_partitions).toDF("pid").repartition(n_partitions, "pid")
    pdf_src = pid_df.select(F.col("pid").cast("long"))
    return pdf_src.mapInPandas(
        lambda it: (b for b in gen(it)), schema=schema
    )


def _gen_pages_block(rng, start: int, count: int, n_domains: int, max_crawls: int):
    """One partition's worth of pages rows as a pandas DataFrame."""
    import pandas as pd

    domain_ids = _zipf_domain_ids(rng, count, n_domains)
    urls, ts_us, htmls, langs = [], [], [], []
    for i in range(count):
        gid = start + i
        url = f"https://d{domain_ids[i]:03d}.example/p/{gid}"
        lang = str(rng.choice(LANGS, p=LANG_P))
        k = int(rng.integers(1, max_crawls + 1))
        offsets = np.sort(rng.integers(0, RANGE_DAYS * DAY_US, size=k))
        for j in range(k):
            urls.append(url)
            ts_us.append(int(EPOCH_START_US + offsets[j]))
            htmls.append(_make_html(rng, f"Page {gid} rev {j}", int(rng.integers(1, 12))))
            langs.append(lang)
    texts = [extract_text(h) for h in htmls]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(np.array(ts_us, dtype="int64"), unit="us"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )
