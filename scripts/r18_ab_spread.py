"""r18 interleaved A/B: _spread_input ON (committed tree) vs OFF
(identity patch) for the documents text keys VERDICT r17 item 1 flagged.

The r17 closing sweep hinted six cheap consumers got SLOWER after the
input-spread exchange, but cross-sweep deltas on this VM are quantum
drift; per the repo's measurement doctrine only an interleaved
same-session A/B settles it. For each key both variants' DataFrames are
built up front (variant B with llm._spread_input patched to identity),
warmed once, then timed with the noop sink in alternating order within
every round — a noise window shaves samples from both variants equally.

Usage: python scripts/r18_ab_spread.py [--repeats N] [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catena_spark import registry
from catena_spark.operators import llm
from catena_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the six keys whose closing-sweep medians regressed in r17 plus two
#: heavy consumers as positive controls (their spread win should
#: reproduce in the same session, or the session is not measuring).
DEFAULT_KEYS = [
    "llm_token_packing",
    "llm_bm25_topk",
    "llm_exact_dedup",
    "llm_tfidf_top_terms",
    "llm_inverted_index",
    "llm_dedup_remap",
    "llm_doc_fingerprint",
    "llm_winnowing_fingerprint",
]


def _quantum(spark) -> float:
    probe = spark.range(0, 1, 1, 1)
    for _ in range(4):
        probe.collect()
    t = []
    for _ in range(7):
        t0 = time.perf_counter()
        probe.collect()
        t.append(time.perf_counter() - t0)
    return round(statistics.median(t), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--json", default="/tmp/r18_ab_spread.json")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    keys = args.keys or DEFAULT_KEYS

    spark = get_spark(
        app_name="r18-ab-spread",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    specs = registry.specs()
    q_open = _quantum(spark)

    spread_orig = llm._spread_input
    dfs: dict[str, dict[str, object]] = {}
    for key in keys:
        fn = specs[key].fn
        df_on = fn(spark, SF_DIR)
        llm._spread_input = lambda df, sf_dir, name: df  # identity: no spread
        try:
            df_off = fn(spark, SF_DIR)
        finally:
            llm._spread_input = spread_orig
        dfs[key] = {"spread_on": df_on, "spread_off": df_off}

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    samples: dict[str, dict[str, list[float]]] = {
        k: {"spread_on": [], "spread_off": []} for k in keys
    }
    # warmup pass (both variants once)
    for key in keys:
        for v in ("spread_on", "spread_off"):
            spark.sparkContext.setJobDescription(f"warmup:{key}:{v}")
            noop(dfs[key][v])
    for r in range(args.repeats):
        for key in keys:
            order = (
                ("spread_on", "spread_off")
                if r % 2 == 0
                else ("spread_off", "spread_on")
            )
            for v in order:
                spark.sparkContext.setJobDescription(f"{key}:{v}:r{r}")
                samples[key][v].append(noop(dfs[key][v]))
    spark.sparkContext.setJobDescription(None)
    q_close = _quantum(spark)

    out = {
        "vm_quantum_1task_open": q_open,
        "vm_quantum_1task_close": q_close,
        "repeats": args.repeats,
        "keys": {},
    }
    for key in keys:
        on = statistics.median(samples[key]["spread_on"])
        off = statistics.median(samples[key]["spread_off"])
        out["keys"][key] = {
            "spread_on_s": round(on, 4),
            "spread_off_s": round(off, 4),
            "ratio_on_over_off": round(on / off, 3) if off else None,
        }
        print(
            f"{key:28s} on={on:7.3f}s off={off:7.3f}s "
            f"on/off={on / off:5.2f}x"
        )
    print(f"vm_quantum open={q_open} close={q_close}")
    with open(args.json, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
