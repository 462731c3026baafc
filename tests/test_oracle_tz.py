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
   DuckDB constructs (TIMESTAMPTZ producers and clock reads), and
2. a dynamic sweep executing every oracle under ``TimeZone='UTC'`` vs
   ``'Asia/Kolkata'`` (the +05:30 half-hour offset) and requiring
   exact-equal results.

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


def _run_all(tz: str) -> dict[str, tuple]:
    duck = duckdb.connect()
    try:
        duck.execute(f"SET TimeZone='{tz}'")
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
