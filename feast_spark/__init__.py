"""feast_spark — a from-scratch PySpark-native feature-engineering engine.

Re-implements the data-processing capabilities of the reference feature
store (reference checkout: /root/reference/README.md:1 — a stub identifying
the project as Feast; semantics per SURVEY.md and BASELINE.json):

- point-in-time-correct as-of join (``operators.asof``) — the engine behind
  ``FeatureStore.get_historical_features``
- windowed feature builders: lag/lead, gap sessionization, backfill-aware
  rolling aggregates (``operators.windows``)
- latest-per-key materialization with per-partition lineage + resume
  (``materialize``)
- Iceberg-style partitioned/sorted Parquet layout with snapshot manifests
  and manifest-pruned reads (``sources.layout``, ``sources.pages``)
- vectorized (Arrow/pandas) text extraction and feature kernels — no
  per-row Python (``operators.text``, ``extract_spec``)
- web-scale data hygiene: exact + MinHash-LSH + SimHash dedup, embedding
  similarity search (``operators.dedupe``, ``operators.similarity``)

Everything is built on the public PySpark DataFrame/SQL API; the physical
strategy is left to Catalyst/AQE wherever possible.
"""

__version__ = "0.1.0"

from feast_spark.registry import (  # noqa: F401
    Aggregation,
    Entity,
    FeatureService,
    FeatureSpec,
    FeatureStore,
    FeatureView,
    OnDemandFeatureView,
)
from feast_spark.server import FeatureServer  # noqa: F401
