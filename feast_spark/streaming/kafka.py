"""Kafka source plumbing (SURVEY.md §2.10 S5; upstream lineage: Feast's
``infra/contrib/spark_kafka_processor.py`` — Kafka → value decode →
transform → online writer; local reference is a stub, SURVEY.md §0.1).

No Kafka broker exists in this sandbox, so the module splits the path
into (a) ``stream_from_kafka`` — a thin reader builder that only a real
cluster can run, and (b) ``decode_kafka_records`` — a PURE DataFrame →
DataFrame transform over the standard Kafka record shape (key/value
binary + topic/partition/offset/timestamp) that behaves identically on
a batch DataFrame (how the tests drive it) and on
``readStream.format("kafka")`` output (production). All decoding is
JVM-side (``from_json`` / ``from_csv`` / ``from_avro``): no Python in
the per-record path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the fixed projection Spark's Kafka source emits — useful for building
# batch test fixtures with exactly the production shape
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def stream_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Build the Kafka stream reader (requires the spark-sql-kafka
    package on a real cluster; unprovable in this sandbox — the decode
    stage below is where the testable logic lives)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def decode_kafka_records(
    df: DataFrame,
    value_schema: str,
    *,
    value_format: str = "json",
    key_col: str | None = "kafka_key",
    include_meta: bool = True,
    event_ts_col: str | None = None,
) -> DataFrame:
    """Decode Kafka records into typed feature rows.

    - ``value_schema``: DDL string of the payload fields.
    - ``value_format``: ``json`` | ``csv`` (JVM built-ins) or ``avro``
      (requires the spark-avro package; raises NotImplementedError when
      absent rather than silently degrading).
    - ``key_col``: surface the record key as a string column (None drops).
    - ``include_meta``: keep (topic, partition, offset, kafka_timestamp)
      — the offset is the exactly-once bookkeeping handle.
    - ``event_ts_col``: payload column to cast to timestamp (event time
      for downstream watermarks); Kafka's own timestamp is broker time.

    Malformed payloads decode to all-NULL payload columns (PERMISSIVE
    semantics) instead of failing the batch — count them with
    ``F.col(<any payload col>).isNull()`` in a metrics observer.
    """
    if value_format == "json":
        parsed = F.from_json(F.col("value").cast("string"), value_schema)
    elif value_format == "csv":
        parsed = F.from_csv(F.col("value").cast("string"), value_schema)
    elif value_format == "avro":
        try:
            from pyspark.sql.avro.functions import from_avro  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - package-dependent
            raise NotImplementedError(
                "avro decoding needs the spark-avro package on the cluster"
            ) from e
        parsed = from_avro(F.col("value"), value_schema)
    else:
        raise ValueError(f"unsupported value_format: {value_format!r}")

    cols = []
    if key_col:
        cols.append(F.col("key").cast("string").alias(key_col))
    if include_meta:
        cols += [
            F.col("topic"),
            F.col("partition"),
            F.col("offset"),
            F.col("timestamp").alias("kafka_timestamp"),
        ]
    out = df.select(*cols, parsed.alias("__v")).select(*
        [F.col(c) for c in ([key_col] if key_col else [])]
        + ([F.col("topic"), F.col("partition"), F.col("offset"),
            F.col("kafka_timestamp")] if include_meta else [])
        + [F.col("__v.*")]
    )
    if event_ts_col:
        out = out.withColumn(event_ts_col, F.col(event_ts_col).cast("timestamp"))
    return out
