#!/usr/bin/env python
"""Generate the committed golden feature-vector fixture (FIXTURES.md §3,
BASELINE.json: "correctness verified ... against the reference
feature-vector fixtures").

The oracle here is an INDEPENDENT pandas/numpy implementation of the
whole retrieval pipeline — dedupe → window features → point-in-time
join — sharing no code with the engine except the frozen extractor spec
(which defines the data itself). tests/test_golden.py runs the engine
end-to-end and numpy-allcloses against this file.

Pipeline spec (both implementations must follow exactly):
1. pages = datagen.generate_pages(n_urls=300, n_domains=30,
   max_crawls=5, seed=42, dup_rate=0.01); probes =
   generate_probes(pages, 250, seed=7).
2. Dedupe exact (url, warc_ts) duplicates keeping the row with MAX
   n_chars (deterministic regardless of input order).
3. Per url ordered by warc_ts: n_chars = len(text);
   lag1_n_chars = previous row's n_chars;
   roll7d_count = rows in the CLOSED interval [t - 7d, t];
   sess_id = 1 + count of gaps > 7d strictly before/at this row.
4. PIT join probes (url, ts): latest feature row with warc_ts <= ts and
   warc_ts >= ts - 90d; miss → all-NULL features.

Run: python tests/golden/make_golden.py   (idempotent, fixed seeds)
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from feast_spark.datagen import generate_pages, generate_probes  # noqa: E402

SEVEN_D_US = 7 * 86400 * 10**6
NINETY_D_US = 90 * 86400 * 10**6


def build_features(pages: pd.DataFrame) -> pd.DataFrame:
    df = pages.copy()
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["ts_us"] = df["warc_ts"].astype("int64")
    # dedupe (url, warc_ts): keep max n_chars
    df = (
        df.sort_values(["url", "ts_us", "n_chars"])
        .groupby(["url", "ts_us"], as_index=False)
        .last()
    )
    out = []
    for url, g in df.groupby("url", sort=True):
        g = g.sort_values("ts_us").reset_index(drop=True)
        ts = g["ts_us"].to_numpy()
        n = g["n_chars"].to_numpy()
        lag1 = np.concatenate([[np.nan], n[:-1].astype("float64")])
        # closed [t-7d, t] interval == Spark rangeBetween(-7d, 0)
        lo = np.searchsorted(ts, ts - SEVEN_D_US, side="left")
        roll = np.arange(1, len(ts) + 1) - lo
        gaps = np.diff(ts) > SEVEN_D_US
        sess = np.concatenate([[1], 1 + np.cumsum(gaps)])
        out.append(
            pd.DataFrame(
                {
                    "url": url,
                    "ts_us": ts,
                    "n_chars": n,
                    "lag1_n_chars": lag1,
                    "roll7d_count": roll.astype("int64"),
                    "sess_id": sess.astype("int64"),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def pit_join(probes: pd.DataFrame, feats: pd.DataFrame) -> pd.DataFrame:
    feats = feats.sort_values(["url", "ts_us"])
    rows = []
    fcols = ["n_chars", "lag1_n_chars", "roll7d_count", "sess_id"]
    by_url = {u: g.reset_index(drop=True) for u, g in feats.groupby("url")}
    for _, p in probes.iterrows():
        t = int(pd.Timestamp(p["ts"]).value) // 1000  # ns -> us
        g = by_url.get(p["url"])
        rec = {"url": p["url"], "ts": p["ts"]}
        match = None
        if g is not None:
            idx = np.searchsorted(g["ts_us"].to_numpy(), t, side="right") - 1
            if idx >= 0 and g["ts_us"].iloc[idx] >= t - NINETY_D_US:
                match = g.iloc[idx]
        for c in fcols:
            rec[c] = float(match[c]) if match is not None and pd.notna(match[c]) else np.nan
        rows.append(rec)
    return pd.DataFrame(rows)


def main() -> None:
    pages = generate_pages(
        n_urls=300, n_domains=30, max_crawls=5, seed=42, dup_rate=0.01
    ).to_pandas()
    probes = generate_probes(
        generate_pages(n_urls=300, n_domains=30, max_crawls=5, seed=42, dup_rate=0.01),
        n_probes=250,
        seed=7,
    ).to_pandas()
    feats = build_features(pages)
    golden = pit_join(probes, feats)
    dest = os.path.join(os.path.dirname(__file__), "feature_vectors.parquet")
    golden.to_parquet(dest, index=False)
    print(f"wrote {dest}: {len(golden)} rows, "
          f"{golden['n_chars'].notna().sum()} hits")


if __name__ == "__main__":
    main()
