"""r18 interleaved A/B: r17-committed ("old") vs r18-rewritten ("new")
shapes for the structural rewrites of this round, one Spark session,
alternating order per round (the repo's VM-drift doctrine: only
same-session interleaved medians adjudicate a change).

Variants measured (old code inlined below, copied verbatim from git
HEAD at the round's start; new code imported from the registry):
  - llm_minhash_pairs / llm_minhash_pairs_portable: size-bound filter
    below the candidate-distinct exchange + free token counts
  - join_q21_sole_blame_supplier: semi+anti self-joins -> per-order
    distinct-supplier aggregate
  - join_q8_market_share: ASIA-customer filter joined onto orders
    BEFORE the fact join

Each pair is also multiset-diffed (collect + Counter) at the bench SF
before timing, so a variant that changed results can never win an A/B.

Usage: python scripts/r18_ab_struct.py [--repeats N] [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from catena_spark import registry, tables
from catena_spark.operators.llm import _docs_norm, _portable_minhash_sigs
from catena_spark.functions.text import doc_tokens
from catena_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ------------------------------------------------------------ old shapes

def old_minhash_pairs(spark, sf_dir):
    d = _docs_norm(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(doc_tokens(F.col("t"), distinct=True)).alias("tok")
    )
    R, B = 6, 5
    th = toks.select(
        "doc_id",
        "tok",
        F.explode(F.sequence(F.lit(0), F.lit(R * B - 1))).alias("seed"),
    ).select(
        "doc_id",
        "seed",
        F.md5(
            F.concat(
                F.lit("m"), F.col("seed").cast("string"), F.lit(":"), F.col("tok")
            )
        ).alias("h"),
    )
    sig = th.groupBy("doc_id", "seed").agg(F.min("h").alias("mh"))
    band = sig.withColumn("band", F.expr(f"seed div {R}"))
    bsig = band.groupBy("doc_id", "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda s: s["mh"],
                ),
                ",",
            )
        ).alias("bucket")
    )
    a, b = bsig.alias("a"), bsig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    tok_arr = d.select("doc_id", doc_tokens(F.col("t"), distinct=True).alias("toks"))
    sz = tok_arr.select("doc_id", F.size("toks").alias("n"))
    cand = (
        cand.join(
            sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"),
            "doc_a",
        )
        .join(
            sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            "doc_b",
        )
        .where(F.expr("10 * least(na, nb) >= 9 * greatest(na, nb)"))
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.col("na") + F.col("nb") - inter
    verified = (
        cand.join(
            tok_arr.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "toks", "ta"
            ),
            "doc_a",
        )
        .join(
            tok_arr.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "toks", "tb"
            ),
            "doc_b",
        )
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .where(inter * 10 >= union * 9)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def old_minhash_pairs_portable(spark, sf_dir):
    d = _docs_norm(spark, sf_dir)
    sigs = _portable_minhash_sigs(d, 12)
    bands = sigs.select(
        "doc_id",
        "toks",
        F.md5(F.concat("mh0", "mh1", "mh2", "mh3")).alias("b0"),
        F.md5(F.concat("mh4", "mh5", "mh6", "mh7")).alias("b1"),
        F.md5(F.concat("mh8", "mh9", "mh10", "mh11")).alias("b2"),
    )
    exploded = bands.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.col("b0").alias("bucket")),
                F.struct(F.lit(1).alias("band"), F.col("b1").alias("bucket")),
                F.struct(F.lit(2).alias("band"), F.col("b2").alias("bucket")),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    tok = sigs.select("doc_id", "toks")
    sz = tok.select("doc_id", F.size("toks").alias("n"))
    cand = (
        cand.join(
            sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"),
            "doc_a",
        )
        .join(
            sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            "doc_b",
        )
        .where(F.expr("10 * least(na, nb) >= 9 * greatest(na, nb)"))
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter_i = F.size(F.array_intersect("ta", "tb"))
    union_i = F.col("na") + F.col("nb") - inter_i
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("jaccard", inter_i.cast("double") / union_i.cast("double"))
        .where(inter_i * 10 >= union_i * 9)
        .select("doc_a", "doc_b", "jaccard")
    )


def old_join_q21(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    s = tables.load(spark, sf_dir, "supplier")
    l1 = li.where(F.col("l_returnflag") == "R")
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    blamed = l1.join(
        l2,
        (l1.l_orderkey == F.col("o2")) & (l1.l_suppkey != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (l1.l_orderkey == F.col("o3")) & (l1.l_suppkey != F.col("s3")),
        "left_anti",
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def old_join_q8(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    r = tables.load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = tables.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    from catena_spark.parity import usum

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            usum(F.when(F.col("sn_name") == "NATION_5", rev).otherwise(0.0), 4).alias(
                "nation_rev"
            ),
            usum(rev, 4).alias("total_rev"),
        )
    )
    return base.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
    )


def old_join_q7(spark, sf_dir):
    from catena_spark.parity import usum

    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    n1 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = tables.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("n2_region"),
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .where(F.col("n1_region") != F.col("n2_region"))
    )
    return j.groupBy("cust_nation", "supp_nation").agg(
        F.count(F.lit(1)).alias("n_items"),
        usum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
    )


def old_agg_stats_suite(spark, sf_dir):
    from catena_spark.parity import det_double

    li = tables.load(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    qi = F.col("l_quantity").cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(qi.cast(dec)).alias("sq"),
        F.sum((qi * qi).cast(dec)).alias("sq2"),
        F.sum(dc.cast(dec)).alias("sdc"),
        F.sum((dc * dc).cast(dec)).alias("sdc2"),
        F.sum(pc.cast(dec)).alias("spc"),
        F.sum((pc * pc).cast(dec)).alias("spc2"),
        F.sum((qi * pc).cast(dec)).alias("sqp"),
    )
    n, sq, sq2 = F.col("n"), F.col("sq"), F.col("sq2")
    sdc, sdc2 = F.col("sdc"), F.col("sdc2")
    spc, spc2, sqp = F.col("spc"), F.col("spc2"), F.col("sqp")
    varq = det_double(n * sq2 - sq * sq) / det_double(n * (n - 1))
    return m.select(
        "l_returnflag",
        F.sqrt(varq).alias("sd_qty"),
        varq.alias("var_qty"),
        F.sqrt(
            det_double(n * sdc2 - sdc * sdc) / det_double(n * n * 10000)
        ).alias("sdp_disc"),
        (
            det_double(n * sqp - sq * spc)
            / (
                F.sqrt(det_double(n * sq2 - sq * sq))
                * F.sqrt(det_double(n * spc2 - spc * spc))
            )
        ).alias("corr_qty_price"),
        (
            det_double(n * sqp - sq * spc)
            / det_double(n * (n - 1))
            / F.lit(100.0)
        ).alias("covar_qty_price"),
    )


OLD = {
    "llm_minhash_pairs": old_minhash_pairs,
    "llm_minhash_pairs_portable": old_minhash_pairs_portable,
    "join_q21_sole_blame_supplier": old_join_q21,
    "join_q8_market_share": old_join_q8,
    "join_q7_nation_pairs": old_join_q7,
    "agg_stats_suite": old_agg_stats_suite,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--json", default="/tmp/r18_ab_struct.json")
    ap.add_argument("--skip-diff", action="store_true")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    keys = args.keys or list(OLD)

    spark = get_spark(
        app_name="r18-ab-struct",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    specs = registry.specs()
    dfs = {}
    for key in keys:
        dfs[key] = {
            "old": OLD[key](spark, SF_DIR),
            "new": specs[key].fn(spark, SF_DIR),
        }
        if not args.skip_diff:
            ca = Counter(map(tuple, dfs[key]["old"].collect()))
            cb = Counter(map(tuple, dfs[key]["new"].collect()))
            extra, missing = ca - cb, cb - ca
            print(
                f"{key}: multiset diff old-vs-new: "
                f"+{sum(extra.values())} -{sum(missing.values())} "
                f"({'MATCH' if not extra and not missing else 'MISMATCH'})"
            )
            if extra or missing:
                print("  sample extra:", list(extra)[:3])
                print("  sample missing:", list(missing)[:3])

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    samples = {k: {"old": [], "new": []} for k in keys}
    for key in keys:
        for v in ("old", "new"):
            spark.sparkContext.setJobDescription(f"warmup:{key}:{v}")
            noop(dfs[key][v])
    for r in range(args.repeats):
        for key in keys:
            order = ("old", "new") if r % 2 == 0 else ("new", "old")
            for v in order:
                spark.sparkContext.setJobDescription(f"{key}:{v}:r{r}")
                samples[key][v].append(noop(dfs[key][v]))
    spark.sparkContext.setJobDescription(None)

    probe = spark.range(0, 1, 1, 1)
    for _ in range(4):
        probe.collect()
    q = []
    for _ in range(7):
        t0 = time.perf_counter()
        probe.collect()
        q.append(time.perf_counter() - t0)
    quantum = round(statistics.median(q), 4)

    out = {"vm_quantum_1task": quantum, "repeats": args.repeats, "keys": {}}
    for key in keys:
        old_m = statistics.median(samples[key]["old"])
        new_m = statistics.median(samples[key]["new"])
        out["keys"][key] = {
            "old_s": round(old_m, 4),
            "new_s": round(new_m, 4),
            "speedup": round(old_m / new_m, 3) if new_m else None,
        }
        print(
            f"{key:32s} old={old_m:7.3f}s new={new_m:7.3f}s "
            f"speedup={old_m / new_m:5.2f}x"
        )
    print(f"vm_quantum_1task={quantum}")
    with open(args.json, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
