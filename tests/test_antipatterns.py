"""Executable anti-pattern sweep — the checks the round judge performs
by hand (VERDICT r9 "Anti-pattern sweep"), pinned as tests so a
regression fails CI instead of waiting for the next judging pass.

Banned in catena_spark/ source:
  * row-at-a-time Python UDFs (`F.udf` / `@udf`): ~10-100x slower than
    pandas_udf and never the sanctioned slow path here.
  * driver-side `.collect()` outside the two documented sites:
    twophase.py (one fetched row per PARTITION — the two-phase
    global-window replacement) and api.py (client-facade scalar point
    reads, not in any `queries()` path).
  * `.rdd` access (the DataFrame-not-RDD rule).

These are source-text checks on purpose: the plan lint
(scripts/plan_lint.py) covers what plans can show; a Python UDF or
collect is visible only in source.
"""

from __future__ import annotations

import os
import re

SRC = os.path.join(os.path.dirname(__file__), "..", "catena_spark")

#: file -> max allowed .collect() occurrences (the documented sites)
#: twophase.py: global_running_sum's per-partition totals (1 row per
#: partition), grouped_positions' per-(partition x group) counts (r11),
#: and both helpers' opt-in total-order assertion probes (limit(1)) —
#: all driver-bounded metadata fetches, never data rows. api.py: two
#: single-row client-facade scalar reads outside every queries() path.
COLLECT_ALLOWED = {"twophase.py": 4, "api.py": 2}


def _py_files():
    for root, _dirs, files in os.walk(SRC):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_no_row_at_a_time_udfs():
    pat = re.compile(r"(?<!pandas_)\budf\s*\(")
    offenders = []
    for path in _py_files():
        src = open(path).read()
        for m in pat.finditer(src):
            # allow pandas_udf and the word inside comments/docstrings
            # mentioning it; flag real F.udf( / udf( call sites only
            line = src[: m.start()].rsplit("\n", 1)[-1] + src[m.start():].split("\n", 1)[0]
            stripped = line.lstrip()
            if stripped.startswith("#"):
                continue
            offenders.append(f"{os.path.basename(path)}: {line.strip()}")
    assert offenders == [], f"row-at-a-time UDF call sites: {offenders}"


def test_collect_only_at_documented_sites():
    offenders = []
    for path in _py_files():
        name = os.path.basename(path)
        n = open(path).read().count(".collect()")
        if n > COLLECT_ALLOWED.get(name, 0):
            offenders.append(f"{name}: {n} (allowed {COLLECT_ALLOWED.get(name, 0)})")
    assert offenders == [], f"undocumented .collect() sites: {offenders}"


def test_no_rdd_access():
    offenders = []
    for path in _py_files():
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            if ".rdd" in line and not line.lstrip().startswith("#"):
                offenders.append(f"{os.path.basename(path)}:{i}: {line.strip()}")
    assert offenders == [], f".rdd access: {offenders}"
