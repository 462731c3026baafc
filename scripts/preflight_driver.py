"""Driver-gate rehearsal: fresh plain SparkSession (as the driver builds
it, not our session.get_spark), __spark_entry__ import, run given keys at
sf0.01 and exact-compare against the DuckDB oracles.

Usage: python scripts/preflight_driver.py [key ...]   (default: all keys
with zero prior driver CORRECTNESS records)
"""
import datetime, glob, json, math, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF = "/root/testdata/sf0.01"


def norm(v):
    if v is None: return "<null>"
    if isinstance(v, float):
        if math.isnan(v): return "<nan>"
        if v == 0.0: return repr(0.0)
        return repr(v)
    if isinstance(v, (bool, int)): return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if isinstance(v, (list, tuple)): return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes): return v.hex()
    return str(v)


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

    qs = e.queries()
    os_ = e.oracle_sql()
    want = sys.argv[1:]
    if not want:
        counts = registry._settled_counts()
        want = [k for k in qs if counts.get(k, 0) == 0]
    con = duckdb.connect()
    for t in tables.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    fails = []
    for k in want:
        t0 = time.time()
        try:
            df = qs[k](spark, SF)
            cols = sorted(df.columns)
            rows = sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())
            if k in os_:
                cur = con.execute(os_[k])
                names = [d[0] for d in cur.description]
                order = sorted(range(len(names)), key=lambda i: names[i])
                orows = sorted(tuple(norm(r[i]) for i in order) for r in cur.fetchall())
                ok = cols == sorted(names) and rows == orows
                status = "HASH-OK" if ok else "MISMATCH"
                if not ok:
                    fails.append(k)
                    diff = [(a, b) for a, b in zip(rows, orows) if a != b][:1]
                    print(f"  cols {cols} vs {sorted(names)}; rows {len(rows)} vs {len(orows)}; first diff {diff}")
            else:
                status = f"ROWS-ONLY ({len(rows)})"
            print(f"{k}: {status} [{time.time()-t0:.1f}s]")
        except Exception as ex:
            fails.append(k)
            print(f"{k}: ERR {type(ex).__name__}: {ex}")
    print(f"\n{len(want)-len(fails)}/{len(want)} green" + (f"; FAILED: {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
