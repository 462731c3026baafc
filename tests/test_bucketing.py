"""Bucketed co-located fact-fact join (SCALE.md relational-core claim):
writing both facts bucketed on the join key removes the per-query
shuffle — the SortMergeJoin reads bucket files directly, no Exchange on
either side. This is the write-time knob that matters most at 100 TB,
so the claim is asserted against real bucketed tables, not prose.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from catena_spark import tables
from catena_spark.plans import formatted_plan
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark):
    wh = tempfile.mkdtemp(prefix="catena-bucketed-wh-")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{wh}'")
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            tables.load(spark, SF_SMALL, t)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bucketed.{t}")
        )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketed.orders")
    spark.sql("DROP TABLE IF EXISTS bucketed.lineitem")
    spark.sql("DROP DATABASE IF EXISTS bucketed")
    shutil.rmtree(wh, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o = spark.table("bucketed.orders")
    li = spark.table("bucketed.lineitem")
    # hint pins the strategy (tiny test tables would broadcast); the
    # claim under test is the absence of Exchange, not join selection
    j = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).select(
        "o_orderkey", "o_totalprice", "l_extendedprice"
    )
    plan = formatted_plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    # same join on plain parquet DOES shuffle (the thing bucketing buys)
    o2 = tables.load(spark, SF_SMALL, "orders")
    li2 = tables.load(spark, SF_SMALL, "lineitem")
    j2 = li2.join(
        o2.hint("merge"), li2.l_orderkey == o2.o_orderkey
    ).select("o_orderkey", "o_totalprice", "l_extendedprice")
    assert "Exchange" in formatted_plan(j2)


def test_bucketed_join_results_match_plain(spark, bucketed):
    o = spark.table("bucketed.orders")
    li = spark.table("bucketed.lineitem")
    n_bucketed = li.join(o, li.l_orderkey == o.o_orderkey).count()
    o2 = tables.load(spark, SF_SMALL, "orders")
    li2 = tables.load(spark, SF_SMALL, "lineitem")
    assert n_bucketed == li2.join(o2, li2.l_orderkey == o2.o_orderkey).count()


def test_bucketed_join_agg_pipeline_shuffle_free(spark):
    """The src_bucketed_join_no_shuffle driver key's whole plan — join
    AND aggregate-by-bucket-key — must contain zero Exchange operators:
    bucketing satisfies the join's distribution, and the SortMergeJoin's
    PartitioningCollection carries it through to the groupBy."""
    from catena_spark.sources.ingest import bucket_table_names, bucketed_join

    wh = tempfile.mkdtemp(prefix="catena-bucketed-key-")
    try:
        out = bucketed_join(spark, SF_SMALL, wh)
        plan = formatted_plan(out)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join+agg must be shuffle-free"
        # and it returns one row per order present in lineitem
        li = tables.load(spark, SF_SMALL, "lineitem")
        assert out.count() == li.select("l_orderkey").distinct().count()
    finally:
        for name in bucket_table_names():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(wh, ignore_errors=True)
