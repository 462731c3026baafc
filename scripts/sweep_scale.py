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
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from catena_spark import registry
from catena_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    focus = set(sys.argv[2:])
    spark = get_spark(app_name="sweep-scale", master="local[32]")
    specs = registry.specs()
    times: list[tuple[float, str]] = []
    failed: list[str] = []
    for key, spec in specs.items():
        if focus and key not in focus:
            continue
        t0 = time.perf_counter()
        try:
            n = spec.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            times.append((dt, key))
            print(f"{dt:8.2f}s  {key}  rows={n}", flush=True)
        except Exception as ex:
            failed.append(key)
            print(f"  FAIL    {key}  {type(ex).__name__}: {ex}", flush=True)
    times.sort(reverse=True)
    total = sum(t for t, _ in times)
    under10 = sum(1 for t, _ in times if t < 10)
    print("\n== slowest 10 ==")
    for t, k in times[:10]:
        print(f"{t:8.2f}s  {k}")
    print(
        f"\nSWEEP: {len(times)} keys, {total:.0f}s total, "
        f"{under10}/{len(times)} under 10s, failures={failed}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
