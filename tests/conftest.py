"""Shared fixtures: one warm SparkSession per test run (SURVEY.md §6 —
fixed JVM overhead dominates at test scale, so never rebuild sessions)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = os.environ.get("CATENA_TEST_SF", "/root/testdata/sf0.001")
SF_DRIVER = "/root/testdata/sf0.01"  # the driver's correctness scale


@pytest.fixture(scope="session")
def spark():
    from catena_spark.session import get_spark

    s = get_spark(
        app_name="catena-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the driver's 10 views on the small SF."""
    import duckdb

    from catena_spark import tables

    con = duckdb.connect()
    for t in tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()
