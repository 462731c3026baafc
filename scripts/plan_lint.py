"""Plan lint: machine-audit EVERY registry key's query plan for the
scale anti-patterns this project bans (SCALE.md). The window and
cartesian checks have NO allowlist; the pinned-broadcast check names
its domain-bounded exceptions inline (_PINNED_BROADCAST_ALLOW).

Flags, per key:
  * unpartitioned-window  -- a logical Window node whose partitionSpec
    is empty. WindowExec then moves the node's ENTIRE input to one
    partition ("WindowExec: No Partition Defined"). This is the defect
    class the r10 manual audit caught in fn_null_semantics (and the
    latent form in llm_domain_mix): greps miss it because the offender
    can be spelled `Window.partitionBy()` with no keys, `OVER ()`, or
    an orderBy-only spec. The plan tree cannot lie. The sanctioned
    replacement is the house global-scalar pattern: 1-row aggregate
    broadcast-crossJoined (zero rows move to a single partition).
  * cartesian-product -- a CartesianProduct in the physical plan. Every
    intentional cross join in this repo is a broadcast 1-row scalar
    (BroadcastNestedLoopJoin), which is the pattern's point; a true
    cartesian means a join lost its keys or its broadcast hint.
  * unguarded-value-dependent-explode (r10, fourth session) -- a
    Generate node exploding a `sequence(...)` whose bounds come from
    DATA VALUES rather than string/array lengths. A length-derived
    sequence (`sequence(1, length(col))`) fans out linearly in bytes
    already read — peak memory per row is proportional to the doc the
    scan just decoded, fine at any scale. A value-derived sequence
    (the gap-fill grid's `sequence(mn, mx, 1h)`) can expand 16 input
    bytes into a 70M-element in-memory array on ONE executor when a
    corrupt timestamp stretches the span, so it must carry the house
    fail-loud cap (an inline CASE + raise_error on the bound, which
    constant-folds INTO the generator expression and is therefore
    visible right in the plan). Constant seed/band grids
    (`sequence(0, 29)`) constant-fold to literal arrays and never
    show a `sequence(` marker at all. No allowlist: length-bounded
    and raise_error-capped generators pass mechanically.
  * pinned-broadcast-of-scaling-side (r10) -- with auto-broadcast
    disabled (both thresholds -1), any BroadcastExchange left in the
    physical plan is an EXPLICIT F.broadcast hint. If its subtree scans
    an SF-scaling table (everything but nation/region) and contains no
    mechanical cardinality bound (global aggregate, limit, top-k), the
    hint pins a broadcast that fits at fixture scale and is a driver
    OOM at 100 TB — the defect class the r10 broadcast audit removed
    from 18 join sites (and which this check caught LIVE in
    join_q14_promo_share, a 19th site the manual sweep missed). Unlike
    the other two checks this one carries an allowlist: bounded-by-
    domain sides (K centroids, a 25-nation group, a benchmark set, a
    capped declared oracle) are not mechanically decidable, so each
    exception is named with its boundedness argument.

Detection walks the JVM plan trees (logical for Window, physical
string for CartesianProduct) rather than grepping source: it sees
through helper indirection, SQL-vs-DataFrame spelling, and future
refactors. Both checks are zero-tolerance -- as of r10 the repo has NO
legitimate unpartitioned window (llm_domain_mix and
llm_bigram_lm_score were converted to the global-scalar pattern, the
former because (source, lang) cardinality is web-scale-unbounded).

Usage:
    python scripts/plan_lint.py [sf_dir] [key ...]
Defaults to /root/testdata/sf0.001 (plan shape is SF-independent; the
smallest SF keeps the handful of eagerly-executing keys cheap) and all
registry keys. Prints one line per key; exits 1 with a failure list if
anything is flagged. Wired in as a check_all.sh stage.
"""

from __future__ import annotations

import os
import sys

# dirname-of-dirname, not string surgery on __file__: invoked as
# `python scripts/plan_lint.py` the latter yielded "" (= cwd) and only
# worked from the repo root by accident (ADVICE r10)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catena_spark import registry
from catena_spark.session import get_spark


#: Scan-location tokens of the SF-scaling tables: a pinned broadcast
#: whose subtree reads one of these grows with the data. nation/region
#: (25/5 rows at any SF) are the only base tables NOT listed.
_SCALING_TABLES = (
    "part.parquet",
    "supplier.parquet",
    "customer.parquet",
    "orders.parquet",
    "lineitem.parquet",
    "events.parquet",
    "documents.parquet",
    "embeddings.parquet",
)

#: Subtree markers that mechanically bound a broadcast side's
#: cardinality regardless of input size: a GLOBAL aggregate (keys=[] —
#: grouped aggregates do NOT qualify; Q2's min-cost-per-part taught
#: that a grouped agg can scale with its grouping key) or a limit/top-k.
_BOUNDED_MARKERS = (
    "HashAggregate(keys=[], ",
    "SortAggregate(keys=[], ",
    "ObjectHashAggregate(keys=[], ",
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
)

#: Hinted broadcasts of scaling-table subtrees whose boundedness is a
#: DOMAIN argument the plan tree cannot express. Every entry must name
#: it. Anything not listed here that trips the check is a bug.
_PINNED_BROADCAST_ALLOW = {
    "subq_corr_above_nation_avg": "per-nation averages: grouped on the 25-value nation domain",
    "stream_static_enrich": "caller-provided static dim; stream-static broadcast is the operator's documented contract",
    "llm_ann_ivf": "K coarse-quantizer centroids (grouped on cid <= K)",
    "llm_cosine_topk": "declared tiny query side (fixed query-id set)",
    "llm_embedding_near_dup": "declared O(n^2) recall oracle; input capped by NEAR_DUP_MAX_ROWS",
    "llm_contamination_check": "benchmark n-gram set: a benchmark stays small at any corpus scale",
    "llm_kmeans_assign": "K centroids",
    "llm_semdedup_representatives": (
        "K centroids; plus the K-row per-cluster (size, argmin) aggregate "
        "broadcast back onto the assignment stream (r11)"
    ),
    "llm_bm25_topk": "df restricted to the 3-term query set before aggregation",
}


def _sequence_spans(gen: str) -> list[str]:
    """The OWN-argument span of every ``sequence(...)`` call in a
    generator expression string: balanced-paren matched, one span per
    occurrence INCLUDING nested calls, with any nested sequence(...)
    sub-call's text EXCISED from its parent's span.

    Two masking shapes drove this design: (a) ADVICE r10 — a 'length('
    / 'raise_error' marker in a SIBLING argument of the surrounding
    transform must not guard the sequence, so only the call's own
    argument span is checked; (b) ADVICE r12 — an unguarded OUTER
    sequence whose arguments contain a nested GUARDED sequence must not
    ride through on the inner call's marker (and, dually, an unguarded
    INNER call must not hide inside a guarded outer's span), so each
    call is judged on its own arguments with nested calls cut out, and
    every nested call gets its own span. Truncated toString output
    (unbalanced parens, ADVICE r11) yields tail spans; the scan always
    restarts just past the 'sequence(' token so later calls are never
    masked."""
    # pass 1: locate every call — (tok_start, args_start, args_end,
    # call_end); truncated calls run to end-of-string
    calls: list[tuple[int, int, int, int]] = []
    i = 0
    while True:
        j = gen.find("sequence(", i)
        if j < 0:
            break
        a = j + len("sequence(")
        depth = 1
        args_end = call_end = len(gen)
        for k in range(a, len(gen)):
            if gen[k] == "(":
                depth += 1
            elif gen[k] == ")":
                depth -= 1
                if depth == 0:
                    args_end, call_end = k, k + 1
                    break
        calls.append((j, a, args_end, call_end))
        i = a  # restart past the token: nested calls get their own spans
    # pass 2: each call's own-argument span with nested calls excised
    # (doubly-nested cut ranges are contained in the direct child's, so
    # the max(pos, c1) advance handles overlap without interval-merging)
    spans: list[str] = []
    for j, a, args_end, call_end in calls:
        cuts = sorted(
            (j2, e2)
            for (j2, _, _, e2) in calls
            if j2 != j and a <= j2 and e2 <= call_end
        )
        pieces: list[str] = []
        pos = a
        for c0, c1 in cuts:
            if c0 > pos:
                pieces.append(gen[pos:c0])
            pos = max(pos, c1)
        if pos < args_end:
            pieces.append(gen[pos:args_end])
        spans.append("".join(pieces))
    return spans


def _iter_nodes(node):
    """Depth-first over a Catalyst TreeNode, including subquery plans.

    Physical trees under AQE hide everything below the
    AdaptiveSparkPlan root (children() is empty); descend into its
    initialPlan(), the post-EnsureRequirements tree where
    BroadcastExchange nodes exist (inputPlan() is pre-preparation and
    has no exchanges yet)."""
    if node.nodeName() == "AdaptiveSparkPlan":
        yield from _iter_nodes(node.initialPlan())
        return
    yield node
    ch = node.children()
    for i in range(ch.length()):
        yield from _iter_nodes(ch.apply(i))
    try:
        sub = node.subqueries()
        for i in range(sub.length()):
            yield from _iter_nodes(sub.apply(i))
    except Exception:
        pass  # not every node type exposes subqueries()


def lint_df(df, allow_pinned_broadcast: bool = False) -> list[str]:
    """Return the list of violations for one DataFrame's plans.

    The broadcast check requires the session to have BOTH
    spark.sql.autoBroadcastJoinThreshold and
    spark.sql.adaptive.autoBroadcastJoinThreshold at -1 (main() sets
    them): only then is every surviving BroadcastExchange an explicit
    hint rather than a size-based choice."""
    bad: list[str] = []
    qe = df._jdf.queryExecution()
    for node in _iter_nodes(qe.optimizedPlan()):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            bad.append("unpartitioned-window")
            break
    for node in _iter_nodes(qe.optimizedPlan()):
        if node.nodeName() == "Generate":
            gen = node.generator().toString()
            if any(
                "length(" not in span
                and "size(" not in span
                and "raise_error" not in span
                for span in _sequence_spans(gen)
            ):
                bad.append("unguarded-value-dependent-explode")
                break
    if "CartesianProduct" in qe.executedPlan().toString():
        bad.append("cartesian-product")
    if not allow_pinned_broadcast:
        for node in _iter_nodes(qe.executedPlan()):
            if node.nodeName() == "BroadcastExchange":
                s = node.toString()
                if any(t in s for t in _SCALING_TABLES) and not any(
                    b in s for b in _BOUNDED_MARKERS
                ):
                    bad.append("pinned-broadcast-of-scaling-side")
                    break
    return bad


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    keys = args or list(registry.queries())

    spark = get_spark()
    # Hostile broadcast threshold, always: with auto-broadcast ON, an
    # unhinted crossJoin over two small tables planizes as a benign
    # BroadcastNestedLoopJoin and the cartesian check can't see it; with
    # the threshold at -1 only EXPLICIT F.broadcast hints survive, so
    # any join that would degrade to CartesianProduct on a real cluster
    # (where "small" stops being true) is flagged at lint time. Runtime
    # conf — scoped to this lint process, never the test session.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    qs = registry.queries()
    failures: list[tuple[str, list[str]]] = []
    for key in keys:
        allowed = key in _PINNED_BROADCAST_ALLOW
        try:
            bad = lint_df(qs[key](spark, sf_dir), allow_pinned_broadcast=allowed)
        except Exception as e:  # a key that won't even build is a failure
            bad = [f"error: {type(e).__name__}: {e}"[:200]]
        status = "OK" if not bad else "FLAG " + ", ".join(bad)
        if allowed and not bad:
            status = "OK (broadcast allowlisted)"
        print(f"  {status:<40s} {key}", flush=True)
        if bad:
            failures.append((key, bad))

    print(f"PLAN LINT: {len(keys)} keys, {len(failures)} flagged")
    if failures:
        for key, bad in failures:
            print(f"  FLAGGED {key}: {', '.join(bad)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
