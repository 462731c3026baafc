"""Oracle-parity conventions, centralized (SURVEY.md §7 step 2, FIXTURES.md).

The driver hash-compares Spark results against DuckDB exactly
(order-insensitive, columns sorted by name), so every driver-checked query
follows these rules — on BOTH sides:

1. UTC session timezone (session.ensure_runtime_conf) and timestamps
   **leave query outputs as strings** (``ts_str``/``DUCK_TS``) or epoch
   BIGINT — sidesteps Spark-µs vs DuckDB-ns representation entirely.
2. Alias every computed column identically in Spark and SQL.
3. Aggregated doubles are rounded before hashing — AT THE SCALE WHERE
   THE TRUE QUANTITY IS DECIMAL-EXACT, never coarser: a sum of 2dp
   values rounds at 2, price(2dp) x discount-complement(2dp) products
   at 4, x tax-complement at 6. Coarser scales hit REAL half-way ties
   (e.g. a true revenue of 753930.795 rounded at 2) that engines break
   differently; at the exact scale, float noise (~1e-9) can never reach
   a boundary and both engines land on the bit-identical double.
4. Division: Spark ``/`` is always double; DuckDB 1.0 ``/`` likewise, but
   integer-result intent must use explicit casts on both sides.
5. Any LIMIT/top-k carries a deterministic total ORDER BY (key tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spark: timestamp -> 'yyyy-MM-dd HH:mm:ss' string (UTC session tz).
def ts_str(col: Column | str) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def duck_ts(expr: str) -> str:
    """DuckDB: same formatting for a timestamp expression (ns-safe)."""
    return f"strftime(CAST(({expr}) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"


def rsum(col: Column, scale: int = 2) -> Column:
    """round(sum(x), 2) — parity rule #3."""
    return F.round(F.sum(col), scale)


def ravg(col: Column, scale: int = 6) -> Column:
    """round(avg(x), 6) — parity rule #3."""
    return F.round(F.avg(col), scale)


def norm_cell(v):
    """Canonicalize one result cell for exact cross-engine comparison —
    the single definition shared by the local mirror
    (tests/test_driver_parity.py) and the driver-gate rehearsal
    (scripts/preflight_driver.py), so a parity-rule change can never
    land in one and not the other.

    Floats use ``repr`` (exact bits — the parity rules above must make
    them identical, not merely close); -0.0 folds into 0.0; NaN is its
    own token; temporals use ISO format; lists/bytes get stable
    serializations.
    """
    import datetime
    import math

    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == 0.0:
            return repr(0.0)  # -0.0 == 0.0
        return repr(v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)
