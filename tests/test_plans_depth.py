"""Plan-quality gates for the round-3 relational-depth keys (SURVEY.md
§4 posture): the properties that matter at 100 TB — dims broadcast, tiny
theta sides broadcast instead of going cartesian, per-group top-k pushed
into WindowGroupLimit, lateral explodes staying shuffle-free, windows
never collapsing to a single partition — asserted against the physical
plan, not prose."""

from __future__ import annotations

import re

from catena_spark import registry
from catena_spark.plans import formatted_plan
from tests.conftest import SF_SMALL

_Q = registry.queries()


def _plan(spark, key: str) -> str:
    return formatted_plan(_Q[key](spark, SF_SMALL))


def _n_ops(plan: str, op: str) -> int:
    """Count physical operators via the formatted detail list ("(3)
    Exchange"), which names each node exactly once (the tree section
    repeats them)."""
    return len(re.findall(rf"\(\d+\) {op}\b", plan))


def test_theta_range_join_broadcasts_tiny_side(spark):
    """The range-bucket theta join must broadcast its few-row bounds
    side (BroadcastNestedLoopJoin is the right physical op for a pure
    range predicate against a tiny side) — never a CartesianProduct of
    two big inputs."""
    plan = _plan(spark, "join_theta_range")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastExchange" in plan


def test_q2_min_cost_supplier_dims_broadcast(spark):
    """TPC-H Q2's 4-table dimension chain must broadcast every dim and
    keep aggregation partial-before-exchange; a cartesian anywhere means
    the correlated-min rewrite regressed."""
    plan = _plan(spark, "join_q2_min_cost_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_q20_dominant_suppliers_no_cartesian(spark):
    plan = _plan(spark, "join_q20_dominant_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_lateral_top2_uses_window_group_limit(spark):
    """The LATERAL top-2-orders-per-customer subquery must compile to
    WindowGroupLimit (rank pushed below the window sort, so each group
    keeps <= k rows before the full window evaluates) — the difference
    between shuffling k rows/group and shuffling every order at scale."""
    plan = _plan(spark, "subq_lateral_top2_orders")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_lateral_posexplode_is_shuffle_free(spark):
    """posexplode over an inline array is a narrow Generate: any
    Exchange here would mean the fan-out is being shuffled for no
    reason."""
    plan = _plan(spark, "fn_lateral_posexplode")
    assert "Generate" in plan
    assert "Exchange" not in plan


def test_regexp_suite_is_shuffle_free(spark):
    """Pure per-row string functions must stay a narrow scan+project
    pipeline."""
    plan = _plan(spark, "fn_regexp_suite")
    assert "Exchange" not in plan


def test_percent_rank_window_is_partitioned(spark):
    """r11 two-phase shape: the only window left is the LOCAL
    per-(range-partition, nation) row_number — every windowspec must
    include _pid (a window partitioned by c_nationkey alone puts 1/25
    of all customers on one task, the straggler grouped_positions
    exists to avoid), the per-group offsets must come back as a
    broadcast, and nothing may collapse to a single partition."""
    plan = _plan(spark, "win_percent_rank_cume")
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    # the local window runs BEFORE the localCheckpoint boundary, so the
    # final plan must contain the checkpoint scan and NO window at all —
    # a Window reappearing here would mean the two-phase shape regressed
    # to a live nation-partitioned window
    assert "windowspecdefinition" not in plan
    assert "ExistingRDD" in plan


def test_ntile_dense_uses_two_phase_positions(spark):
    """Same pin for win_ntile_dense: local _pid-partitioned window +
    broadcast offset join, no nation-only window, no single
    partition."""
    plan = _plan(spark, "win_ntile_dense")
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    assert "windowspecdefinition" not in plan
    assert "ExistingRDD" in plan


def test_pivot_multi_measures_partial_aggregates(spark):
    """The two-level pivot aggregate must stay partial-before-exchange
    on both levels and never shuffle more than twice."""
    plan = _plan(spark, "pivot_multi_measures")
    assert _n_ops(plan, "HashAggregate") >= 4
    assert _n_ops(plan, "Exchange") <= 2


def test_intersect_all_single_shuffle(spark):
    """INTERSECT ALL compiles to union -> count-min replicate: one
    aggregation shuffle total, no join of the two inputs."""
    plan = _plan(spark, "setop_intersect_all")
    assert "CartesianProduct" not in plan
    assert _n_ops(plan, "Exchange") <= 1


def test_q16_supplier_cnt_broadcasts_part_dim(spark):
    plan = _plan(spark, "agg_q16_supplier_cnt")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ngram_novelty_has_no_window(spark):
    """r11 window-skew fix: gram-first-occurrence attribution must be
    the doubly-reduced groupBy form (gram -> min(doc_id) -> count per
    first_doc, joined to per-doc gram counts) — no WindowExec anywhere
    (a gram-partitioned window puts a hot gram's whole posting list on
    one task), and no join of the fat (doc_id, gram) stream: both join
    inputs are per-doc aggregates."""
    plan = _plan(spark, "llm_ngram_novelty")
    assert "Window" not in plan
    # partial aggregation on the gram reduction (map-side combine is
    # what collapses hot grams before any exchange)
    assert _n_ops(plan, "HashAggregate") >= 4


def test_semdedup_argmin_has_no_window(spark):
    """r11 window-skew fix: the per-cluster representative must come
    from a groupBy(cluster_id) argmin broadcast back onto the
    assignment stream — no per-cluster ordered WindowExec (skewed
    cluster sizes would serialize on one task), and the join-back must
    be a broadcast (K rows), not a shuffle of the vectors. The only
    windows left are upstream llm_kmeans_assign's nearest-centroid rank
    PARTITIONED BY vec_id (<= K rows per key, skew-free by
    construction) — no window may partition on cluster_id."""
    plan = _plan(spark, "llm_semdedup_representatives")
    assert "BroadcastHashJoin" in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert spec.startswith("vec_id"), spec
        assert "cluster_id" not in spec and "cid" not in spec.split(",")[0], spec


def test_near_dup_guard_survives_optimizer(spark):
    """ADVICE r11: the near-dup O(n^2) cap must be anchored to
    something the optimizer cannot remove. The assert_true filter on
    the fat stream has to survive into the OPTIMIZED plan (a Filter
    determines cardinality, so column pruning / projection reordering
    cannot drop it the way it could a raise_error CASE riding a
    prunable column) — and it must sit on BOTH join inputs, i.e. every
    e-row passes the cap check before any pair forms."""
    from catena_spark.operators import llm

    df = llm.llm_embedding_near_dup(spark, SF_SMALL)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in optimized, optimized
    assert optimized.count("raise_error") >= 2  # both join sides
    # and the runtime behavior: over-cap raises (type-agnostic — the
    # JVM error surfaces as Py4JJavaError or the converted
    # SparkRuntimeException depending on session state, same reason
    # test_llm.py's guard tests match on Exception)
    import pytest

    with pytest.raises(Exception, match="recall oracle"):
        llm.llm_embedding_near_dup(spark, SF_SMALL, max_rows=10).count()
