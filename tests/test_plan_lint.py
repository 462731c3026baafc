"""Unit tests for the plan lint (scripts/plan_lint.py): the r10 manual
window audit, made permanent. The lint must catch BOTH spellings of an
unpartitioned window (bare `Window.partitionBy()` and orderBy-only —
the shapes source greps miss), must not flag partitioned windows or
broadcast scalar cross joins, and must flag a true CartesianProduct.
Plus plan pins for the two operators converted off global windows in
r10 (llm_domain_mix, llm_bigram_lm_score)."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import Window, functions as F

from catena_spark.operators import llm
from catena_spark.plans import assert_in_plan, assert_not_in_plan
from tests.conftest import SF_SMALL

_spec = importlib.util.spec_from_file_location(
    "plan_lint",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_lint.py"),
)
plan_lint = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_lint)


def _base(spark):
    return spark.range(100).withColumn("g", F.col("id") % 7)


def test_flags_unpartitioned_window(spark):
    df = _base(spark).withColumn("t", F.sum("id").over(Window.partitionBy()))
    assert plan_lint.lint_df(df) == ["unpartitioned-window"]


def test_flags_orderby_only_window(spark):
    # the grep-resistant spelling: a partition spec that is empty
    # because only an ORDER BY was given (global row_number)
    df = _base(spark).withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert plan_lint.lint_df(df) == ["unpartitioned-window"]


def test_passes_partitioned_window_and_scalar_crossjoin(spark):
    w = Window.partitionBy("g").orderBy("id")
    df = _base(spark).withColumn("r", F.row_number().over(w))
    # the house global-scalar pattern must stay lint-clean
    df = df.crossJoin(F.broadcast(df.agg(F.count(F.lit(1)).alias("n"))))
    assert plan_lint.lint_df(df) == []


def test_flags_cartesian_product(spark):
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _base(spark).crossJoin(spark.range(50).withColumnRenamed("id", "j"))
        assert plan_lint.lint_df(df) == ["cartesian-product"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_domain_mix_no_single_partition_window(spark):
    df = llm.llm_domain_mix(spark, SF_SMALL)
    assert plan_lint.lint_df(df) == []
    assert_not_in_plan(df, "WindowExec")
    assert_not_in_plan(df, "Window ")
    assert_in_plan(df, "BroadcastNestedLoopJoin")


def test_bigram_lm_no_single_partition_window(spark):
    df = llm.llm_bigram_lm_score(spark, SF_SMALL)
    assert plan_lint.lint_df(df) == []
    assert_not_in_plan(df, "WindowExec")
    assert_in_plan(df, "BroadcastNestedLoopJoin")
