"""10x scale-up sweep (SCALE.md evidence): execute EVERY registry key
end-to-end at a larger SF than the correctness gate and report per-key
wall time, sorted slowest-first.

Usage:
    python scripts/sweep_scale.py [sf_dir] [key ...]
Defaults to /root/testdata/sf0.1 (10x the driver's correctness SF) and
all keys. Prints one line per key and a tail summary with the count of
keys under 10 s — the statistic SCALE.md tracks round over round.

This is how the 'no super-linear scaler hides in the inventory' claim
stays measured instead of asserted: a key whose runtime blows up at 10x
the data shows up at the top of this report.

r6 growth guard (VERDICT r5 item 7): the near-dup pair keys' OUTPUT is
inherently ~quadratic at fixture similarity (duplicate clusters grow
linearly with n, so true pairs grow ~n^2 — sf0.01 -> sf0.1 observed
~80-107x for minhash/simhash/token-set), so a banding regression cannot
be caught from output rows: banding bounds the CANDIDATE set and hence
runtime, while verified output is identical by construction. The guard
therefore (a) pins the exact sf0.1 output counts (fixtures are
deterministic; any drift means a semantic change, not noise — refresh
the pins deliberately if TESTDATA is ever regenerated) and (b) asserts
the banded ANN path still demonstrably beats its declared exact
brute-force twin's runtime (observed ratio ~0.21 at sf0.1; the 0.6
bound leaves ~3x noise headroom). Failures land in the sweep's
failures list and the exit code.
"""

from __future__ import annotations

import os
import sys
import time

# dirname-of-dirname, not string surgery (same ADVICE r10 fix as
# plan_lint.py): works from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catena_spark import registry
from catena_spark.session import get_spark

#: exact sf0.1 output-row pins for the pair-enumeration keys (measured
#: r6 on the committed fixtures; deterministic — refresh deliberately
#: if TESTDATA is regenerated).
PAIR_ROW_PINS = {
    "llm_minhash_pairs": 953863,
    "llm_minhash_pairs_portable": 938592,
    "llm_simhash_near_pairs": 3529106,
    "llm_token_set_dup_pairs": 35606,
    "llm_ann_lsh": 899,
    "llm_embedding_near_dup": 920,
}
#: (banded key, exact brute-force twin, max runtime ratio): the banded
#: plan must keep a demonstrable speedup over its declared twin.
BANDING_SPEEDUP = [("llm_ann_lsh", "llm_embedding_near_dup", 0.6)]
DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    # r7 (ADVICE r6 item 3): gate the growth guard on the RESOLVED path,
    # so 'sf0.1/' or a relative spelling can't silently skip the pins
    guard = os.path.realpath(sf_dir) == os.path.realpath(DEFAULT_SF_DIR)
    focus = set(sys.argv[2:])
    spark = get_spark(app_name="sweep-scale", master="local[32]")
    specs = registry.specs()
    times: list[tuple[float, str]] = []
    by_key: dict[str, float] = {}
    failed: list[str] = []
    for key, spec in specs.items():
        if focus and key not in focus:
            continue
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times.append((dt, key))
            by_key[key] = dt
            print(f"{dt:8.2f}s  {key}  rows={n}", flush=True)
            if guard and PAIR_ROW_PINS.get(key, n) != n:
                failed.append(key)
                print(
                    f"  GROWTH-GUARD FAIL {key}: rows={n} != pinned "
                    f"{PAIR_ROW_PINS[key]} — pair output drifted",
                    flush=True,
                )
        except Exception as ex:
            failed.append(key)
            print(f"  FAIL    {key}  {type(ex).__name__}: {ex}", flush=True)
    if guard:
        for banded, twin, cap in BANDING_SPEEDUP:
            if banded in by_key and twin in by_key:
                ratio = by_key[banded] / by_key[twin]
                ok = ratio <= cap
                print(
                    f"banding speedup {banded}/{twin}: {ratio:.2f} "
                    f"(cap {cap}) {'ok' if ok else 'GROWTH-GUARD FAIL'}"
                )
                if not ok:
                    failed.append(banded)
    times.sort(reverse=True)
    total = sum(t for t, _ in times)
    under10 = sum(1 for t, _ in times if t < 10)
    # a key can fail both the row pin and the banding check — report once
    failed = sorted(set(failed))
    print("\n== slowest 10 ==")
    for t, k in times[:10]:
        print(f"{t:8.2f}s  {k}")
    print(
        f"\nSWEEP: {len(times)} keys, {total:.0f}s total, "
        f"{under10}/{len(times)} under 10s, failures={failed}"
    )
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
