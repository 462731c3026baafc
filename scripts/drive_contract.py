"""Driver simulation: foreign cwd, hostile session conf, entry smoke +
per-key Spark-vs-DuckDB parity at sf0.01 (row count, sorted column names,
order-insensitive value hash) — mirrors the real driver's gate.

Usage: cd /tmp && python drive_contract.py [key1 key2 ...]
No args => all oracle-backed keys.

Env overrides (r5 hostile-conf matrix — scripts/stress_window.sh): the
real driver's session conf is unknown, so the rehearsal must pass under
ANY reasonable conf, not just one. CATENA_SIM_TZ (session timezone,
default America/New_York; Asia/Kolkata exercises the +05:30 half-hour
offset), CATENA_SIM_MASTER (default local[8]), CATENA_SIM_SHUFFLE
(default 8), CATENA_SIM_ANSI (spark.sql.ansi.enabled, default false —
hostile on purpose: ensure_runtime_conf must repin true),
CATENA_SIM_EXTRA (k=v pairs applied to the session builder verbatim —
the open-ended hostile axis, e.g.
"spark.sql.caseSensitive=true,spark.sql.decimalOperations.allowPrecisionLoss=false").
Pairs split on ';' when one is present, else ',' — use ';' when a VALUE
itself contains a comma (e.g. extraJavaOptions with two -D flags); a
fragment without '=' aborts loudly instead of becoming a garbage conf
(r7, ADVICE r6 item 4).
"""
import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF_SMOKE = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# the ONE shared canonicalizer (ADVICE r4: a local copy here could
# desync this rehearsal from the gate on edge cells like -0.0 or NaN)
from catena_spark.parity import norm_cell as canon  # noqa: E402


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    focus = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master(
            os.environ.get("CATENA_SIM_MASTER", "local[8]")
        )
        .config(
            "spark.sql.session.timeZone",
            os.environ.get("CATENA_SIM_TZ", "America/New_York"),
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("CATENA_SIM_SHUFFLE", "8"),
        )
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("CATENA_SIM_ANSI", "false"),
        )
        .config("spark.ui.enabled", "false")
    )
    # CATENA_SIM_EXTRA: extra spark confs as separator-joined key=value
    # pairs. r9 (ADVICE r7 item 1): a LEADING ';' or ',' explicitly
    # declares the pair separator (and is stripped), so a value may
    # contain the other character — e.g. ";a=b;c=x,y" or ",a=b,c=x;y".
    # Without a declaration the old heuristic stands: ';' anywhere
    # selects ';', else ','.
    extra = os.environ.get("CATENA_SIM_EXTRA", "")
    if extra[:1] in (";", ","):
        sep, extra = extra[0], extra[1:]
    else:
        sep = ";" if ";" in extra else ","
    for kv in filter(None, extra.split(sep)):
        k, eq, v = kv.partition("=")
        if not eq or not k.strip():
            sys.exit(
                f"CATENA_SIM_EXTRA fragment {kv!r} lacks 'key=value' — "
                f"pairs split on {sep!r}; lead with ';' or ',' to pick "
                "the separator when a value contains the other"
            )
        spark = spark.config(k.strip(), v.strip())
    spark = spark.getOrCreate()
    import __spark_entry__ as E

    # entry smoke
    res = E.entry(spark)
    n = res.count()
    assert n >= 0 and res.schema is not None
    print(f"entry smoke OK rows={n}")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    keys = [k for k in qs if k in oracles and (not focus or k in focus)]
    bad = []
    for k in keys:
        try:
            sdf = qs[k](spark, SF).toPandas()
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.itertuples(index=False)]
            odf = duck.execute(oracles[k]).fetchdf()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False)]
            rm = len(srows) == len(orows)
            cm = sorted(scols) == sorted(ocols)
            hm = value_hash(srows, scols) == value_hash(orows, ocols)
            ok = rm and cm and hm
            print(f"{k}: rows={rm}({len(srows)}/{len(orows)}) cols={cm} hash={hm}")
            if not ok:
                bad.append(k)
        except Exception as ex:
            print(f"{k}: ERR {type(ex).__name__}: {ex}")
            bad.append(k)
    if bad:
        print(f"RESULT: MISMATCH {bad}")
        sys.exit(1)
    print("RESULT: ALL-MATCH")


if __name__ == "__main__":
    main()
