#!/bin/bash
# Full pre-snapshot validation: everything the driver/judge will run.
#   scripts/check_all.sh          # ~15 min total
# Individual stages:
#   pytest tests/ -x -q                                   (unit+property+plan gates)
#   CATENA_TEST_SF=/root/testdata/sf0.01 pytest tests/test_driver_parity.py
#                                                         (exact-equality mirror at driver SF)
#   cd /tmp && python /root/repo/scripts/drive_contract.py (hostile-session driver sim)
#   python bench.py                                       (headline perf JSON)
set -e
set -o pipefail
cd "$(dirname "$0")/.."

echo "== 1/5 full test suite"
python -m pytest tests/ -x -q

echo "== 2/5 sf0.01 exact-parity mirror"
CATENA_TEST_SF=/root/testdata/sf0.01 python -m pytest tests/test_driver_parity.py -q

echo "== 3/5 driver-contract simulation (hostile session, foreign cwd)"
(cd /tmp && python /root/repo/scripts/drive_contract.py)

echo "== 4/5 bench"
# mktemp per run (ADVICE r9 item 2): a fixed path let two concurrent
# gate runs — or a stale file from an aborted one — feed bench_guard
# another run's numbers.
BENCH_OUT="$(mktemp /tmp/catena_bench_out.XXXXXX)"
trap 'rm -f "$BENCH_OUT"' EXIT
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" python bench.py | tee "$BENCH_OUT"

echo "== 5/5 per-query regression guard (vs trailing BENCH_r*.json medians)"
python scripts/bench_guard.py "$BENCH_OUT"

echo "== ALL GREEN"
