"""r18 cold-plan A/B for agg_pricing_summary (VERDICT r17 item 4): the
bench's ``queries_cold_plan`` path rebuilds the DataFrame every sample,
so it pays Catalyst analyze/optimize/physical-plan per run — ~1.2 s for
q1 vs 62 ms warm, dominated by the det_double limb kernel's expression
tree being inlined (and subtree-copied ~7x) into each of 7 aggregate
result expressions. The r18 rewrite names the raw decimal sums in
.agg() and applies det_double to plain column references in a separate
projection.

Old shape inlined below (verbatim from git HEAD at round start); new
imported from the registry. Interleaved rebuild+collect timings under
the bench's exact q1 conf, plus a warm-path sanity pair.

Usage: python scripts/r18_ab_coldplan.py [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from catena_spark import registry, tables
from catena_spark.parity import det_double
from catena_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_q1(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    qi = F.col("l_quantity").cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    tc = F.round(F.col("l_tax") * 100, 0).cast("long")
    dec = "decimal(38,0)"
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            det_double(F.sum(qi.cast(dec))).alias("sum_qty"),
            (det_double(F.sum(pc.cast(dec))) / F.lit(100.0)).alias("sum_base"),
            (det_double(F.sum((pc * (100 - dc)).cast(dec))) / F.lit(10000.0)).alias(
                "sum_disc_price"
            ),
            (
                det_double(F.sum((pc * (100 - dc) * (100 + tc)).cast(dec)))
                / F.lit(1000000.0)
            ).alias("sum_charge"),
            (det_double(F.sum(qi.cast(dec))) / cnt.cast("double")).alias("avg_qty"),
            (det_double(F.sum(pc.cast(dec))) / (cnt * 100).cast("double")).alias(
                "avg_price"
            ),
            (det_double(F.sum(dc.cast(dec))) / (cnt * 100).cast("double")).alias(
                "avg_disc"
            ),
            cnt.alias("cnt"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--json", default="/tmp/r18_ab_coldplan.json")
    args = ap.parse_args()

    # the bench's exact q1 profile (bench.py CONF_BY_QUERY + AQE off)
    spark = get_spark(
        app_name="r18-ab-coldplan",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions="16",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.locality.wait": "0s",
        },
    )
    new_q1 = registry.specs()["agg_pricing_summary"].fn

    # results must be identical (row sort then exact compare)
    rows_old = sorted(map(tuple, old_q1(spark, SF_DIR).collect()))
    rows_new = sorted(map(tuple, new_q1(spark, SF_DIR).collect()))
    print("results identical:", rows_old == rows_new)
    if rows_old != rows_new:
        for a, b in zip(rows_old, rows_new):
            if a != b:
                print("  old:", a)
                print("  new:", b)
        sys.exit(1)

    variants = {"old": old_q1, "new": new_q1}
    # cold path: rebuild + collect per sample (2 warmup passes like bench)
    for _ in range(2):
        for fn in variants.values():
            fn(spark, SF_DIR).collect()
    cold = {v: [] for v in variants}
    for r in range(args.repeats):
        order = ("old", "new") if r % 2 == 0 else ("new", "old")
        for v in order:
            spark.sparkContext.setJobDescription(f"cold:{v}:r{r}")
            t0 = time.perf_counter()
            variants[v](spark, SF_DIR).collect()
            cold[v].append(time.perf_counter() - t0)

    # warm path: prepared plan, collect only
    dfs = {v: fn(spark, SF_DIR) for v, fn in variants.items()}
    for df in dfs.values():
        for _ in range(8):
            df.collect()
    warm = {v: [] for v in variants}
    for r in range(args.repeats):
        order = ("old", "new") if r % 2 == 0 else ("new", "old")
        for v in order:
            spark.sparkContext.setJobDescription(f"warm:{v}:r{r}")
            t0 = time.perf_counter()
            dfs[v].collect()
            warm[v].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    out = {"repeats": args.repeats}
    for path, d in (("cold_plan", cold), ("warm_prepared", warm)):
        o, n = statistics.median(d["old"]), statistics.median(d["new"])
        out[path] = {
            "old_s": round(o, 4),
            "new_s": round(n, 4),
            "speedup": round(o / n, 3),
        }
        print(f"{path:14s} old={o:7.4f}s new={n:7.4f}s speedup={o / n:5.2f}x")
    with open(args.json, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
