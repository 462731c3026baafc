"""Table catalog: loaders for the 10 driver tables + the canonical series view.

Schemas/domains: FIXTURES.md (measured from /root/testdata parquet).
The ``series`` view reproduces catena's exact row model
``(source STRING, metric STRING, ts TIMESTAMP, value DOUBLE)``
(SURVEY.md §1.1 [R point.go · Point/Row]) on the driver's events table:
user_id plays catena's *source*, event_type its *metric*. Every
time-series operator (operators/timeseries.py) is written against this
view, so the same code serves any conforming table.

Scale note: loaders are plain ``spark.read.parquet`` — at 100 TB the same
call reads a partitioned-directory dataset and Catalyst handles partition
pruning + row-group predicate pushdown; nothing here materializes or
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_conf

#: All tables the driver pre-registers as DuckDB views (__spark_entry__.py:33-35).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def parquet_path(sf_dir: str, name: str) -> str:
    """THE definition of the on-disk table layout. Shared by ``load``
    and by split-count estimators (operators/llm.py `_spread_input`)
    so the path convention cannot drift between the reader and an
    estimator that silently no-ops on a miss (ADVICE r17 item 2)."""
    return f"{sf_dir}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; applies parity conf (UTC tz) on the session.

    events.ts is TIMESTAMP(NANOS) in parquet, which Spark reads as raw
    nanos (legacy.parquet.nanosAsLong); convert to a µs TimestampType by
    integer-truncation — bit-identical to DuckDB's TIMESTAMP_NS->TIMESTAMP
    cast, so downstream ordering/formatting agree.
    """
    ensure_runtime_conf(spark)
    import os

    if os.environ.get("CATENA_SCHEMA_DRIFT_SAFE") == "1":
        # Opt-in drift-safe read (r15): pin the footer-derived superset
        # schema so part-files written by older writer generations
        # (missing columns, narrower integer types) surface NULLs /
        # widen on decode instead of vanishing columns or failing on
        # footer-sampling luck. Off by default — on undrifted data it
        # is schema- and plan-identical to the plain read below, but
        # costs a footer sweep per load. Doctrine + empirical matrix:
        # sources/encodings.py; exercised by the permute probe's
        # CATENA_PERMUTE_DRIFT axis.
        from .sources.encodings import read_drifted

        df = read_drifted(spark, parquet_path(sf_dir, name))
    else:
        df = spark.read.parquet(parquet_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Naive parquet timestamps (isAdjustedToUTC=false, read as
    # TIMESTAMP_NTZ since the round-3 testdata regen) are interpreted as
    # UTC instants — ensure_runtime_conf pins the session tz to UTC
    # before this cast, so the wall-clock digits are preserved exactly,
    # matching DuckDB reading the same column as TIMESTAMP.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` queries read
    identically to the DuckDB oracle SQL (SURVEY.md §3.2 entry point 2)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical catena row model over events (FIXTURES.md 'series' view)."""
    return load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("source"),
        F.col("event_type").alias("metric"),
        F.col("ts"),
        F.col("value"),
    )


#: DuckDB-side equivalent of ``series`` for embedding into oracle SQL CTEs.
SERIES_SQL = (
    "SELECT CAST(user_id AS VARCHAR) AS source, event_type AS metric, "
    "CAST(ts AS TIMESTAMP) AS ts, value FROM events"
)
