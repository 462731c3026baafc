"""Plan lint: machine-audit EVERY registry key's query plan for the
scale anti-patterns this project bans (SCALE.md), with NO allowlist.

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

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from catena_spark import registry
from catena_spark.session import get_spark


def _iter_nodes(node):
    """Depth-first over a Catalyst TreeNode, including subquery plans."""
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


def lint_df(df) -> list[str]:
    """Return the list of violations for one DataFrame's plans."""
    bad: list[str] = []
    qe = df._jdf.queryExecution()
    for node in _iter_nodes(qe.optimizedPlan()):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            bad.append("unpartitioned-window")
            break
    if "CartesianProduct" in qe.executedPlan().toString():
        bad.append("cartesian-product")
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
        try:
            bad = lint_df(qs[key](spark, sf_dir))
        except Exception as e:  # a key that won't even build is a failure
            bad = [f"error: {type(e).__name__}: {e}"[:200]]
        status = "OK" if not bad else "FLAG " + ", ".join(bad)
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
