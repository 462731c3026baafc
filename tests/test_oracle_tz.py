"""Timezone-invariance of the oracle SQL (r5 hostile-conf finding).

The driver host's timezone is not part of the contract, so every
registered oracle must produce identical results regardless of the
process TZ / DuckDB ``TimeZone`` setting. Round 5's stress matrix
(scripts/stress_window.sh) found three streaming oracles whose
``to_timestamp(...)`` produced a TIMESTAMPTZ that ``strftime`` rendered
in the HOST timezone — green for four rounds only because the driver
box happens to run UTC. Fixed to the naive ``make_timestamp(µs)``;
these tests make the whole class of bug impossible to reintroduce:

1. a static lint over every registered oracle banning TZ-dependent
   DuckDB constructs (TIMESTAMPTZ producers and clock reads),
2. a static lint banning locale-sensitive strftime directives (%a/%b
   month/day names etc. — r6, VERDICT r5 item 4: the stress matrix's
   tr_TR axis found nothing, but nothing structurally prevented an
   oracle from adding a month-name rendering later), and
3. a dynamic sweep executing every oracle under ``TimeZone='UTC'`` +
   ``Calendar='gregorian'`` vs ``TimeZone='Asia/Kolkata'`` (the +05:30
   half-hour offset) + ``Calendar='japanese'`` (a non-Gregorian ICU
   calendar — flips era/year handling for any expression that consults
   the session calendar) and requiring exact-equal results.

The Spark side needs no twin test: the session-TZ axis of the stress
matrix (CATENA_SIM_TZ) plus the fixtures' NTZ timestamps already pin
it, and any Spark-side TZ drift would surface as a parity failure in
test_driver_parity under a shifted session TZ.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from catena_spark import registry, tables
from catena_spark.parity import norm_cell as _norm
from tests.conftest import SF_SMALL

_SPECS = registry.specs()
_WITH_ORACLE = [k for k, s in _SPECS.items() if s.oracle is not None]

#: TIMESTAMPTZ producers and clock reads whose rendering/value follows
#: the DuckDB TimeZone setting (i.e. the host TZ by default). Word-
#: boundary match; ``to_timestamp`` notably excludes the Spark-side
#: ``F.to_timestamp`` because oracles are plain SQL strings.
_TZ_DEPENDENT = re.compile(
    r"\b(to_timestamp|current_timestamp|current_date|current_localtime"
    r"|current_localtimestamp|now|today|get_current_timestamp|timezone)\s*\("
    r"|TIMESTAMPTZ|TIMESTAMP\s+WITH\s+TIME\s+ZONE",
    re.IGNORECASE,
)


@pytest.mark.parametrize("key", _WITH_ORACLE)
def test_oracle_has_no_tz_dependent_constructs(key):
    sql = _SPECS[key].oracle
    hit = _TZ_DEPENDENT.search(sql)
    assert hit is None, (
        f"{key}: oracle uses TZ-dependent DuckDB construct "
        f"{hit.group(0)!r} — use naive make_timestamp(µs) / epoch_us "
        f"arithmetic so results don't follow the driver host's timezone"
    )


#: strftime/strptime directives whose output follows the host locale in
#: ICU/libc implementations: abbreviated/full day+month names, locale
#: date/time renderings, AM/PM markers. Only meaningful inside an
#: strftime call — bare LIKE '%b%' patterns must not trip the lint.
_LOCALE_DIRECTIVE = re.compile(r"%-?([aAbBcpxX])")


def _strftime_arg_literals(sql: str) -> list[str]:
    """String literals appearing at argument depth of an strftime /
    strptime call (r7, ADVICE r6 item 2: the lint previously scanned
    EVERY literal in an oracle that contained strftime anywhere, so an
    unrelated ``LIKE '%brand%'`` in the same SQL false-positived on %b).
    Walks each call with a paren/quote-aware scan ('' is the SQL quote
    escape); literals nested inside a deeper call (e.g. an inner
    strftime's own argument) are picked up by that call's own scan.

    r9 (ADVICE r7 item 2): the walk also skips double-quoted
    identifiers ("" is the identifier-quote escape), so a '(' or a
    single quote inside a quoted column name can no longer corrupt the
    depth/literal tracking. The other half of that advice (a relaxed
    whole-SQL fallback for format strings assembled outside the call)
    is deliberately declined: every registry oracle passes its format
    as an in-call literal, and the old whole-SQL scan is exactly what
    produced the LIKE '%brand%' false positives the r7 rewrite removed."""
    out: list[str] = []
    for m in re.finditer(r"\bstr[fp]time\s*\(", sql, re.IGNORECASE):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            c = sql[i]
            if c in "'\"":
                j = i + 1
                while j < len(sql):
                    if sql[j] == c:
                        if j + 1 < len(sql) and sql[j + 1] == c:
                            j += 2
                            continue
                        break
                    j += 1
                if c == "'" and depth == 1:
                    out.append(sql[i : j + 1])
                i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
    return out


def test_strftime_lint_scopes_to_format_argument():
    """Pin the ADVICE r6 item 2 fix: a LIKE '%brand%'/'%avg%' pattern
    elsewhere in an strftime-bearing oracle must NOT reach the lint,
    while literals inside the call (either argument position) must."""
    sql = (
        "SELECT strftime(CAST(make_timestamp(us) AS TIMESTAMP), '%Y-%m') "
        "FROM part WHERE p_type LIKE '%brand%' AND p_name LIKE '%avg%'"
    )
    assert _strftime_arg_literals(sql) == ["'%Y-%m'"]
    assert _strftime_arg_literals("strftime(ts, '%a %b')") == ["'%a %b'"]
    assert _strftime_arg_literals("strptime('it''s %B', fmt)") == ["'it''s %B'"]
    assert _strftime_arg_literals("x LIKE '%b%'") == []
    # r9: double-quoted identifiers must not corrupt the walk — a '('
    # or a single quote inside one previously desynced depth/literal
    # tracking; the identifier itself is never linted as a format.
    assert _strftime_arg_literals('strftime("weird(col", \'%Y\')') == ["'%Y'"]
    assert _strftime_arg_literals('strftime("it\'s a col", \'%m\')') == ["'%m'"]
    assert _strftime_arg_literals('strftime("a""b(", \'%d\') || \'%a\'') == ["'%d'"]
    assert _strftime_arg_literals('SELECT "no(strftime here"') == []


@pytest.mark.parametrize("key", _WITH_ORACLE)
def test_oracle_has_no_locale_sensitive_strftime(key):
    sql = _SPECS[key].oracle
    for lit in _strftime_arg_literals(sql):
        hit = _LOCALE_DIRECTIVE.search(lit)
        assert hit is None, (
            f"{key}: oracle strftime uses locale-sensitive directive "
            f"{hit.group(0)!r} in {lit} — render month/day names "
            f"numerically so results don't follow the driver host locale"
        )


def _run_all(
    tz: str, calendar: str = "gregorian", threads: int | None = None
) -> dict[str, tuple]:
    duck = duckdb.connect()
    try:
        duck.execute(f"SET TimeZone='{tz}'")
        duck.execute(f"SET Calendar='{calendar}'")
        if threads is not None:
            duck.execute(f"SET threads={threads}")
        for t in tables.TABLES:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/{t}.parquet')"
            )
        out = {}
        for k in _WITH_ORACLE:
            cur = duck.execute(_SPECS[k].oracle)
            names = [d[0] for d in cur.description]
            order = sorted(range(len(names)), key=lambda i: names[i])
            rows = sorted(
                tuple(_norm(r[i]) for i in order) for r in cur.fetchall()
            )
            out[k] = (sorted(names), rows)
        return out
    finally:
        duck.close()


def test_every_oracle_is_timezone_invariant():
    utc = _run_all("UTC")
    ist = _run_all("Asia/Kolkata")
    diff = [k for k in _WITH_ORACLE if utc[k] != ist[k]]
    assert not diff, f"oracles change with DuckDB TimeZone: {diff}"


def test_every_oracle_is_thread_count_invariant():
    """r6: the integer-unit doctrine claims the oracles are
    accumulation-order-free — this pins it on the DuckDB side, where
    the driver box's thread default is unknown and parallel aggregation
    merges partials in nondeterministic order. threads=1 (fully
    sequential) vs threads=8 must produce exact-equal results for every
    oracle; a float-sum oracle would be the thing that breaks here."""
    seq = _run_all("UTC", threads=1)
    par = _run_all("UTC", threads=8)
    diff = [k for k in _WITH_ORACLE if seq[k] != par[k]]
    assert not diff, f"oracles change with DuckDB thread count: {diff}"


def test_every_oracle_is_calendar_invariant():
    """r6 (VERDICT r5 item 4): flip the ICU Calendar together with the
    timezone — a combined-hostile session config no driver box would
    ever run, catching any oracle expression that consults the session
    calendar (era-based year extraction etc.)."""
    base = _run_all("UTC", "gregorian")
    hostile = _run_all("Asia/Kolkata", "japanese")
    diff = [k for k in _WITH_ORACLE if base[k] != hostile[k]]
    assert not diff, f"oracles change with DuckDB Calendar/TimeZone: {diff}"
