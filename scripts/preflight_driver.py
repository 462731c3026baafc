"""Driver-gate rehearsal: fresh plain SparkSession (as the driver builds
it, not our session.get_spark), __spark_entry__ import, run given keys at
sf0.01 and exact-compare against the DuckDB oracles.

Canonicalization comes from catena_spark.parity.norm_cell — the SAME
definition the local mirror (tests/test_driver_parity.py) uses, so a
parity-rule change can never make this rehearsal diverge from the gate
it rehearses.

Usage: python scripts/preflight_driver.py [key ...]   (default: all keys
with zero prior driver CORRECTNESS records; when none exist — true
since r6 — the driver's next 50-key rotation window)
"""
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
#: CATENA_TEST_SF override (r5): point the rehearsal at another scale
#: factor, e.g. sf0.1 where larger row counts surface round-boundary
#: float ties that sf0.01 never hits.
SF = os.environ.get("CATENA_TEST_SF", "/root/testdata/sf0.01")


def first_diff(rows, orows):
    """First row present on only one side (multiset difference — a
    zip() would pair unrelated rows as soon as one side has an extra)."""
    spark_only = Counter(rows) - Counter(orows)
    oracle_only = Counter(orows) - Counter(rows)
    return (
        next(iter(spark_only), None),
        next(iter(oracle_only), None),
    )


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("preflight-driver")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    import duckdb

    import __spark_entry__ as e
    from catena_spark import registry, tables
    from catena_spark.parity import norm_cell

    qs = e.queries()
    os_ = e.oracle_sql()
    want = sys.argv[1:]
    if not want:
        counts = registry._settled_counts()
        want = [k for k in qs if counts.get(k, 0) == 0]
    if not want:
        # every key has a settled record (true since r6): rehearse the
        # driver's NEXT 50-key rotation window instead. r9 (ADVICE r7
        # item 3): the window comes from registry.next_window, the
        # SAME helper stress_window.sh uses, so rehearsal and stress
        # matrix cover an identical window by construction.
        want = registry.next_window(50)
    con = duckdb.connect()
    for t in tables.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    fails = []
    for k in want:
        t0 = time.time()
        try:
            df = qs[k](spark, SF)
            cols = sorted(df.columns)
            rows = sorted(tuple(norm_cell(r[c]) for c in cols) for r in df.collect())
            detail = None
            if k in os_:
                cur = con.execute(os_[k])
                names = [d[0] for d in cur.description]
                order = sorted(range(len(names)), key=lambda i: names[i])
                orows = sorted(
                    tuple(norm_cell(r[i]) for i in order) for r in cur.fetchall()
                )
                ok = cols == sorted(names) and rows == orows
                status = "HASH-OK" if ok else "MISMATCH"
                if not ok:
                    fails.append(k)
                    s_only, o_only = first_diff(rows, orows)
                    detail = (
                        f"  cols {cols} vs {sorted(names)}; "
                        f"rows {len(rows)} vs {len(orows)}; "
                        f"spark-only {s_only}; oracle-only {o_only}"
                    )
            else:
                status = f"ROWS-ONLY ({len(rows)})"
            print(f"{k}: {status} [{time.time()-t0:.1f}s]")
            if detail:
                print(detail)
        except Exception as ex:
            fails.append(k)
            print(f"{k}: ERR {type(ex).__name__}: {ex}")
    print(
        f"\n{len(want)-len(fails)}/{len(want)} green"
        + (f"; FAILED: {fails}" if fails else "")
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
