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
