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


def test_flags_unguarded_value_dependent_explode(spark):
    # the gap-fill hazard shape: sequence bounds from DATA VALUES (two
    # longs can demand an arbitrarily large array), no fail-loud cap
    df = (
        _base(spark)
        .withColumn("hi", F.col("id") * 10)
        .select(F.explode(F.sequence(F.col("id"), F.col("hi"))).alias("x"))
    )
    assert plan_lint.lint_df(df) == ["unguarded-value-dependent-explode"]


def test_passes_capped_value_dependent_explode(spark):
    # the house guard: a CASE + raise_error on the bound constant-folds
    # into the generator expression, making the cap plan-visible
    hi = F.col("id") * 10
    capped = F.when(hi - F.col("id") > 1000, F.raise_error(F.lit("span blowup"))).otherwise(hi)
    df = _base(spark).select(
        F.explode(F.sequence(F.col("id"), capped)).alias("x")
    )
    assert plan_lint.lint_df(df) == []


def test_passes_length_bounded_explode(spark):
    # byte-linear fan-out: sequence over length(col) — fine at any SF
    df = spark.createDataFrame([("abc def",)], "t string").select(
        F.explode(F.sequence(F.lit(1), F.length("t"))).alias("i")
    )
    assert plan_lint.lint_df(df) == []


def test_passes_constant_sequence_explode(spark):
    # constant grids fold to literal arrays — no sequence( marker left
    df = _base(spark).select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("seed")
    )
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


def _hostile_thresholds(spark):
    """Both thresholds to -1 — the conf contract the broadcast check
    documents (only explicit hints survive as BroadcastExchange)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    for k in saved:
        spark.conf.set(k, "-1")
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None or v == "":
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_flags_pinned_broadcast_of_scaling_table(spark):
    """r10 broadcast audit, made permanent: an explicit F.broadcast of
    an SF-scaling table scan (here: supplier joined to lineitem) must
    be flagged — this exact shape caught join_q14_promo_share live."""
    saved = _hostile_thresholds(spark)
    try:
        from catena_spark import tables

        li = tables.load(spark, SF_SMALL, "lineitem").select("l_suppkey")
        s = tables.load(spark, SF_SMALL, "supplier").select("s_suppkey")
        df = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        assert plan_lint.lint_df(df) == ["pinned-broadcast-of-scaling-side"]
        # the allowlist escape hatch suppresses exactly this flag
        assert plan_lint.lint_df(df, allow_pinned_broadcast=True) == []
    finally:
        _restore(spark, saved)


def test_passes_global_aggregate_broadcast_of_scaling_table(spark):
    """A 1-row global aggregate OF a scaling table is the house
    global-scalar pattern — mechanically bounded, never flagged."""
    saved = _hostile_thresholds(spark)
    try:
        from catena_spark import tables

        li = tables.load(spark, SF_SMALL, "lineitem").select("l_suppkey")
        tot = li.agg(F.count(F.lit(1)).alias("n"))
        df = li.crossJoin(F.broadcast(tot))
        assert plan_lint.lint_df(df) == []
    finally:
        _restore(spark, saved)


def test_passes_hinted_nation_broadcast(spark):
    """nation/region are domain-bounded (25/5 rows at any SF): hinting
    them is the sanctioned pattern and must stay lint-clean."""
    saved = _hostile_thresholds(spark)
    try:
        from catena_spark import tables

        s = tables.load(spark, SF_SMALL, "supplier")
        n = tables.load(spark, SF_SMALL, "nation")
        df = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        assert plan_lint.lint_df(df) == []
    finally:
        _restore(spark, saved)


def test_flags_sequence_with_marker_outside_span(spark):
    # ADVICE r10 tightening: a length( marker in a SIBLING argument of
    # the surrounding transform must not whitelist a value-bounded
    # sequence — the guard has to sit inside sequence(...)'s own span
    df = (
        _base(spark)
        .withColumn("t", F.lit("abc"))
        .withColumn("hi", F.col("id") * 10)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(id, hi), x -> x + length(t))"
                )
            ).alias("x")
        )
    )
    assert plan_lint.lint_df(df) == ["unguarded-value-dependent-explode"]


def test_sequence_span_extraction():
    # balanced-paren matching: nested calls, several sequences, a
    # truncated tail
    spans = plan_lint._sequence_spans(
        "transform(sequence(a, f(g(b), c)), x -> sequence(1, length(t)))"
    )
    assert spans == ["a, f(g(b), c)", "1, length(t)"]
    assert plan_lint._sequence_spans("no generators here") == []
    assert plan_lint._sequence_spans("sequence(a, f(b") == ["a, f(b"]


def test_sequence_span_truncation_keeps_scanning():
    """ADVICE r11: a truncated toString must not stop the scan at the
    first unbalanced sequence( — a guarded first sequence riding in the
    tail span would otherwise mask a later UNGUARDED one (the tail span
    contains the guard marker, so the whole-string check passes). Every
    later sequence( gets its own span and its own marker check."""
    spans = plan_lint._sequence_spans(
        "sequence(a, least(hi, length(t)), sequence(lo, unbounded_hi"
    )
    # the second sequence must surface on its own so its missing guard
    # is checkable (and since r13 it is also EXCISED from the first
    # call's tail span — see the nested-call test below)
    assert len(spans) == 2
    assert "length(t)" in spans[0]
    assert spans[1] == "lo, unbounded_hi"
    assert not any(
        m in spans[1] for m in ("length(", "size(", "raise_error")
    )


def test_sequence_span_nested_calls_judged_on_own_arguments():
    """ADVICE r12: an unguarded OUTER sequence whose arguments contain
    a nested GUARDED sequence must not ride through on the inner call's
    length()/size() marker — nested sub-calls are excised from the
    parent's span and every nested call gets its own span, so each
    sequence is judged only on its own arguments (both directions: a
    guarded outer can't hide an unguarded inner either)."""
    marks = ("length(", "size(", "raise_error")
    # unguarded outer, guarded inner: the outer's own span must carry
    # NO marker after excision; the inner keeps its guard
    spans = plan_lint._sequence_spans(
        "sequence(lo, hi, element_at(sequence(1, length(t)), 1))"
    )
    assert spans == ["lo, hi, element_at(, 1)", "1, length(t)"]
    assert not any(m in spans[0] for m in marks)
    # dual: guarded outer, unguarded inner — the inner must surface
    # markerless instead of hiding inside the outer's guarded span
    spans = plan_lint._sequence_spans(
        "sequence(1, length(t), f(sequence(lo, hi)))"
    )
    assert spans == ["1, length(t), f()", "lo, hi"]
    assert not any(m in spans[1] for m in marks)
    # doubly-nested: the direct child's cut range contains the
    # grandchild's, and each of the three is judged on its own args
    spans = plan_lint._sequence_spans(
        "sequence(a, f(sequence(b, g(sequence(1, length(x))))))"
    )
    assert spans == ["a, f()", "b, g()", "1, length(x)"]
    # truncated nesting (r11 shape, r12 excision): the guarded tail
    # span no longer swallows the unguarded inner call's text
    spans = plan_lint._sequence_spans(
        "sequence(a, least(hi, length(t)), sequence(lo, unbounded_hi"
    )
    assert spans[0] == "a, least(hi, length(t)), "
