"""r17 measurement harness (guide §1): time EVERY registry key with the
noop sink and capture its ``explain("formatted")`` plan.

The existing 10x sweep (sweep_scale.py) times ``.count()``, which lets
the optimizer prune columns and sometimes whole subtrees (guide §1.4),
so it understates keys whose cost lives in wide projections. This
harness times ``df.write.format("noop").mode("overwrite").save()`` —
every column of every row computed and discarded — which is the honest
per-operator cost the optimization rounds act on.

Usage:
    python scripts/measure_noop.py [sf_dir] [--plans DIR] [--json PATH] \
        [--repeats N] [--warmups N] [key ...]

Writes one plan file per key to --plans (default: skip) and a JSON
summary {key: {"median_s": .., "min_s": .., "rows_hint": null}} sorted
slowest-first to --json (default /tmp/measure_noop.json). Jobs are
labelled with the key (guide §1.5) so a live UI or event log maps
stages back to keys.
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
from catena_spark.session import get_spark

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=DEFAULT_SF_DIR)
    ap.add_argument("--plans", default=None, help="directory for per-key plan dumps")
    ap.add_argument("--json", default="/tmp/measure_noop.json")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    # Match bench.py's core-count contract: honor $SPARK_GRAFT_CPUS so
    # sweeps on smaller machines measure the configuration being tuned
    # (ADVICE r17) instead of oversubscribing a hard-coded 32.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="measure-noop", master=f"local[{cpus}]")
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    specs = registry.specs()
    out: dict[str, dict] = {}
    failed: list[str] = []
    for key, spec in specs.items():
        if args.keys and key not in args.keys:
            continue
        try:
            df = spec.fn(spark, args.sf_dir)
            if args.plans:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans, f"{key}{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            spark.sparkContext.setJobDescription(key)
            samples = []
            for i in range(args.warmups + args.repeats):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if i >= args.warmups:
                    samples.append(dt)
            spark.sparkContext.setJobDescription(None)
            med = statistics.median(samples)
            out[key] = {"median_s": round(med, 4), "min_s": round(min(samples), 4)}
            print(f"{med:8.2f}s  {key}", flush=True)
        except Exception as ex:
            failed.append(key)
            print(f"  FAIL    {key}  {type(ex).__name__}: {ex}", flush=True)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]["median_s"]))
    # vm_quantum stamp (same doctrine as bench.py): the zero-work job
    # floor measured in the SAME session, so two sweeps taken hours
    # apart can be compared honestly on a VM whose hypervisor neighbors
    # drift the per-job quantum 20-65 ms.
    import statistics as _st

    probe = spark.range(0, 1, 1, 1)
    for _ in range(4):
        probe.collect()
    q = []
    for _ in range(7):
        t0 = time.perf_counter()
        probe.collect()
        q.append(time.perf_counter() - t0)
    payload = {"vm_quantum_1task": round(_st.median(q), 4), "keys": ranked}
    with open(args.json, "w") as fh:
        json.dump(payload, fh, indent=1)
    total = sum(v["median_s"] for v in out.values())
    print(
        f"\nNOOP SWEEP: {len(out)} keys, {total:.0f}s total, "
        f"vm_quantum_1task={payload['vm_quantum_1task']}, failures={failed}"
    )
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
