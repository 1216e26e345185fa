from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feast_spark.datagen import generate_pages, generate_probes  # noqa: E402
from feast_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("feast_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_tbl():
    return generate_pages(n_urls=300, n_domains=30, max_crawls=5, seed=42, dup_rate=0.01)


@pytest.fixture(scope="session")
def probes_tbl(pages_tbl):
    return generate_probes(pages_tbl, n_probes=250, seed=7)


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory, pages_tbl, probes_tbl):
    d = tmp_path_factory.mktemp("pit")
    pq.write_table(pages_tbl, str(d / "pages.parquet"))
    pq.write_table(probes_tbl, str(d / "probes.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def pages_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "pages.parquet"))


@pytest.fixture(scope="session")
def probes_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "probes.parquet"))
