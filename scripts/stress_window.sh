#!/bin/bash
# r5 hostile-conf matrix over the driver's NEXT 50-key rotation window:
# the real driver's session conf (timezone, parallelism, shuffle count)
# is unknown, so every window key must hash-match DuckDB under ANY
# reasonable conf. Varies one axis at a time plus two combined-hostile
# profiles; Asia/Kolkata exercises the +05:30 half-hour offset, local[2]
# exercises low parallelism (different partition counts, merge orders),
# shuffle=1 exercises single-partition exchanges.
#
#   scripts/stress_window.sh          # ~50-60 min (44 cells: 28 confs
#                                     # + spill split + 15 probe cells)
#
# pipefail matters (ADVICE r5 item 1): every run pipes through
# `| tail -1`, and without it a parity MISMATCH exits 0 (tail's status)
# and the ALL GREEN banner lies.
set -eo pipefail
cd "$(dirname "$0")/.."

WINDOW=$(python - <<'EOF'
from catena_spark import registry
print(" ".join(registry.next_window(50)))
EOF
)
echo "window: $WINDOW"

run() {
  echo "== TZ=$1 MASTER=$2 SHUFFLE=$3"
  (cd /tmp && CATENA_SIM_TZ="$1" CATENA_SIM_MASTER="$2" CATENA_SIM_SHUFFLE="$3" \
    python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)
}

run America/New_York "local[8]"  8    # baseline (the committed sim conf)
run UTC              "local[8]"  8
run Asia/Kolkata     "local[8]"  8
run America/New_York "local[2]"  8
run America/New_York "local[8]"  1
run Asia/Kolkata     "local[2]"  1    # combined hostile, low parallelism
run UTC              "local[32]" 64   # combined hostile, high parallelism

# process-TZ axis: shifts the DuckDB TimeZone setting and pandas/python
# datetime rendering — the axis that caught the r5 to_timestamp oracle
# bug (tests/test_oracle_tz.py is the permanent guard)
echo "== process TZ=Asia/Kolkata"
(cd /tmp && TZ=Asia/Kolkata CATENA_SIM_TZ=Asia/Kolkata \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# ANSI axis (r6): the sim's default session is hostile (ansi=false,
# relying on ensure_runtime_conf to repin true); this run covers a
# driver that sets ansi=true itself — both states must hash-match
echo "== ANSI=true session"
(cd /tmp && CATENA_SIM_ANSI=true \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# open-ended extras axis (r6): case-sensitive resolution + strict
# decimal typing — two more semantics knobs a driver session could set
echo "== caseSensitive=true, allowPrecisionLoss=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.caseSensitive=true,spark.sql.decimalOperations.allowPrecisionLoss=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# JVM default-timezone axis (r6): user.timezone shifts java.util defaults
# UNDER the pinned session timeZone — verified to actually reach the JVM
# in local mode (TimeZone.getDefault() reads Asia/Kolkata)
echo "== JVM user.timezone=Asia/Kolkata"
(cd /tmp && CATENA_SIM_EXTRA="spark.driver.extraJavaOptions=-Duser.timezone=Asia/Kolkata" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Turkish process locale (r6): the lower/upper dotless-i trap for any
# locale-sensitive case-folding in Python/pandas/DuckDB rendering
echo "== LC_ALL=tr_TR.UTF-8"
(cd /tmp && LANG=tr_TR.UTF-8 LC_ALL=tr_TR.UTF-8 \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# ';'-separated extras with a comma INSIDE a value (r7, ADVICE r6
# item 4): two Catalyst rules disabled via a comma-separated
# excludedRules list — results must be plan-invariant, so hash-parity
# must hold even with constant folding and null propagation off — plus
# a space-separated two-flag extraJavaOptions shifting the JVM default
# TZ and country in the same session
echo "== ';' extras: excludedRules=ConstantFolding,NullPropagation + JVM tz+country"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.ConstantFolding,org.apache.spark.sql.catalyst.optimizer.NullPropagation;spark.driver.extraJavaOptions=-Duser.timezone=Asia/Kolkata -Duser.country=TR" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)
# Arrow batch-boundary axis (r7): 7-row Arrow batches force every
# mapInPandas/applyInPandas operator through many tiny batches — output
# must be batch-size-invariant (a cross-batch stateful bug shows here)
echo "== arrow maxRecordsPerBatch=7"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.execution.arrow.maxRecordsPerBatch=7" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# AQE axis (r7): adaptive re-planning OFF — correctness must never
# depend on AQE's coalescing/skew-splitting (they are speed paths)
echo "== adaptive.enabled=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.adaptive.enabled=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# 45-minute-offset process TZ (r7): Pacific/Chatham (+12:45/+13:45 DST)
# — the only named 45-minute zone; catches any remaining sub-hour
# TZ-grid assumption the +05:30 axis might alias
echo "== process TZ=Pacific/Chatham"
(cd /tmp && TZ=Pacific/Chatham CATENA_SIM_TZ=Pacific/Chatham \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# everything-at-once axis (r9, widened r10 fourth session): all the
# hostile knobs in ONE session — Chatham process+session TZ, Turkish
# locale, ANSI on, local[2]/shuffle=1, case-sensitive resolution,
# strict decimals, 7-row Arrow batches + strict Arrow conversion, AQE
# off, JVM default TZ Kolkata + country TR, no broadcast joins,
# shuffled-hash preference, NO_CODEGEN interpreter, bucketing off,
# parquet pushdown + vectorized reader off, legacy temporal types.
# Single-axis greens can mask a two-knob interaction (e.g. a
# locale-sensitive fold that only misrenders under a fractional-offset
# TZ); this conf closes that gap. First run r9 covered the FULL
# 166-key contract under this profile: ALL-MATCH.
echo "== combined max-hostile (all axes at once)"
(cd /tmp && TZ=Pacific/Chatham LANG=tr_TR.UTF-8 LC_ALL=tr_TR.UTF-8 \
  CATENA_SIM_TZ=Pacific/Chatham CATENA_SIM_MASTER="local[2]" \
  CATENA_SIM_SHUFFLE=1 CATENA_SIM_ANSI=true \
  CATENA_SIM_EXTRA=";spark.sql.caseSensitive=true;spark.sql.decimalOperations.allowPrecisionLoss=false;spark.sql.execution.arrow.maxRecordsPerBatch=7;spark.sql.execution.pandas.convertToArrowArraySafely=true;spark.sql.adaptive.enabled=false;spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.join.preferSortMergeJoin=false;spark.sql.codegen.factoryMode=NO_CODEGEN;spark.sql.codegen.wholeStage=false;spark.sql.sources.bucketing.enabled=false;spark.sql.parquet.filterPushdown=false;spark.sql.parquet.enableVectorizedReader=false;spark.sql.datetime.java8API.enabled=false;spark.driver.extraJavaOptions=-Duser.timezone=Asia/Kolkata -Duser.country=TR" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)
# Parquet decode-path axis (r10): the vectorized columnar reader and
# the row-at-a-time fallback are separate decode implementations
# (decimals, timestamps, dictionary pages) — results must not depend on
# which one the scan picks
echo "== parquet.enableVectorizedReader=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.parquet.enableVectorizedReader=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Codegen axis (r10): interpreted expression eval vs whole-stage
# codegen are two evaluators for every expression tree — the classic
# upstream-Spark divergence class (codegen-only folding bugs)
echo "== codegen.wholeStage=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.codegen.wholeStage=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Input-split axis (r10): 64 KiB maxPartitionBytes shatters every
# parquet file into many tiny scan splits — different scan
# parallelism, partial-agg boundaries, and merge orders than the
# one-split-per-file default (the SHUFFLE axis varies post-shuffle
# partitioning; this varies the scan side)
echo "== files.maxPartitionBytes=65536"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.files.maxPartitionBytes=65536" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Temporal-types axis (r10): java8API off swaps java.time.* for legacy
# java.sql.* in collected rows — the py4j/Arrow conversion boundary the
# TZ axes exercise semantically, here exercised at the type level
echo "== datetime.java8API.enabled=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.datetime.java8API.enabled=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Join-strategy axes (r10, fourth session): the same logical join has
# three physical executors — broadcast-hash, sort-merge, shuffled-hash
# — with independent code paths for null keys, duplicate keys, and
# build-side iteration order. autoBroadcast=-1 forbids the broadcast
# path entirely (every broadcast-eligible join re-executes as a
# shuffle join); preferSortMergeJoin=false steers eligible pairs onto
# the shuffled-hash executor instead of sort-merge
echo "== autoBroadcastJoinThreshold=-1 (no broadcast joins)"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.autoBroadcastJoinThreshold=-1" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

echo "== join.preferSortMergeJoin=false (shuffled-hash-join path)"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.join.preferSortMergeJoin=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Deep-interpreted axis (r10, fourth session): wholeStage=false still
# codegens individual unsafe projections/predicates via the expression
# factory; NO_CODEGEN forces the pure interpreter — the third and
# deepest evaluator for every expression tree
echo "== codegen.factoryMode=NO_CODEGEN (+ wholeStage off)"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.codegen.factoryMode=NO_CODEGEN;spark.sql.codegen.wholeStage=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Bucketed-scan fallback axis (r10, fourth session): with bucketing
# disabled the pre-bucketed join ingests as plain files and re-shuffles
# — the zero-Exchange fast path and the fallback must agree
echo "== sources.bucketing.enabled=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.sources.bucketing.enabled=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Scan-predicate axis (r10, fourth session): filterPushdown=false moves
# every predicate from the parquet reader's row-group/page pruning into
# post-scan Filter eval — two predicate implementations that must agree
# on nulls, NaN, and decimal comparisons
echo "== parquet.filterPushdown=false"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.parquet.filterPushdown=false" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Strict-Arrow axis (r10, fourth session): convertToArrowArraySafely
# makes every pandas-UDF return value convert under Arrow's safe=True
# (raise on overflow/truncation instead of silently wrapping) — a
# fail-loud tripwire on the three Python crossings, not just a
# different-path parity check
echo "== pandas.convertToArrowArraySafely=true"
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.execution.pandas.convertToArrowArraySafely=true" \
  python /root/repo/scripts/drive_contract.py $WINDOW | tail -1)

# Forced-spill axis (r10, fourth session): window buffers, sort-merge
# match buffers, and ObjectHashAggregate each carry a SEPARATE spill /
# sort-fallback implementation that fixture-scale runs never enter but
# 100 TB partitions live in — 64-row thresholds force every partition
# through them. Do NOT set these to 1: per-row spill bookkeeping OOMs
# the probe JVM itself (measured r10 — the probe artifact, not the
# operator, dies).
#
# Second harness-OOM artifact (r11, first window to combine this axis
# with the gap-fill grid keys): every spill READER/WRITER buffer has a
# 1 MB floor (spark.unsafe.sorter.spill.reader.buffer.size rejects
# anything smaller), so 64-ROW spill files cost ~16,000x their data in
# buffer memory; the grid keys run their window in ONE AQE-coalesced
# task (partition sizing happens on the 37 KB pre-explode bounds rows,
# so no advisory-size knob can spread the post-explode 462k rows), and
# ts_gapfill_linear / ts_gap_report use unbounded-FOLLOWING frames,
# where WindowFunctionFrame re-opens the spilled buffer PER ROW —
# reader churn quadratic in spill-file count; measured heap demand
# exceeded 14 GB. None of this is reachable in production: the
# per-series grid partitions are byte-bounded (<= span hours, 720 at
# this fixture) and real memory-pressure spill writes few LARGE files,
# not 64-row ones. So the axis runs in two parts: (a) the full window
# minus the three grid keys at the original 64-row thresholds, with
# read-ahead off + 6g headroom for the buffer-floor overhead; (b) the
# three grid keys with SMJ/OHA spill still forced at 64/16 and the
# window thresholds at 1024 — above their 720-row partition bound, the
# same no-window-spill regime any real conf gives them.
echo "== forced spill paths (window/SMJ buffers=64, OHA fallback=16; window-exempt keys split out)"
# Window-threshold-64 exemptions — each names its synthetic-OOM shape
# (the second run keeps SMJ=64/OHA=16 so those spill paths stay
# covered; the window threshold is raised above the key's per-partition
# row bound so WindowExec never spills, which is exactly the production
# regime for these keys — real thresholds are 4096 rows and spills are
# byte-bounded):
#   ts_gapfill_* / ts_gap_report — r11 forensics: 1 MB reader-buffer
#     floor x single-task explode x per-64-row window reopen; 1024 >
#     the 720-row per-series grid bound.
#   llm_winnowing_fingerprint — r12: two per-doc windows (rolling min +
#     count) over ~550 grams/doc; at threshold 64 each of ~500
#     sequentially-reopened doc partitions retains ~9 spill readers
#     whose buffer floor is 1 MB (UnsafeSorterSpillReader clamps to
#     >= 1 MB), ~4.5 GB of dead buffers in one AQE-coalesced task ->
#     OOM at 6g. 1024 > 550 so the window path never spills; per-doc
#     state is doc-length-bounded at any corpus scale. The production-
#     threshold argument is PINNED by tests/test_llm.py::
#     test_winnowing_window_state_is_doc_bounded_at_production_conf
#     (every Window partitions by doc_id; corpus-max grams/doc x 4 <
#     the production 4096-row in-memory threshold).
WINDOW_EXEMPT_KEYS="ts_gapfill_ffill ts_gapfill_linear ts_gap_report llm_winnowing_fingerprint"
WINDOW_SPILL64=$(python - <<EOF
keys = "$WINDOW".split()
exempt = set("$WINDOW_EXEMPT_KEYS".split())
print(" ".join(k for k in keys if k not in exempt))
EOF
)
(cd /tmp && CATENA_SIM_EXTRA="spark.sql.windowExec.buffer.spill.threshold=64;spark.sql.windowExec.buffer.in.memory.threshold=64;spark.sql.sortMergeJoinExec.buffer.spill.threshold=64;spark.sql.sortMergeJoinExec.buffer.in.memory.threshold=64;spark.sql.objectHashAggregate.sortBased.fallbackThreshold=16;spark.unsafe.sorter.spill.read.ahead.enabled=false;spark.driver.memory=6g" \
  python /root/repo/scripts/drive_contract.py $WINDOW_SPILL64 | tail -1)
EXEMPT_IN_WINDOW=$(python - <<EOF
keys = set("$WINDOW".split())
print(" ".join(k for k in "$WINDOW_EXEMPT_KEYS".split() if k in keys))
EOF
)
if [ -n "$EXEMPT_IN_WINDOW" ]; then
  echo "== forced spill paths, window-exempt keys (SMJ=64/OHA=16, window=1024 > per-partition row bounds)"
  (cd /tmp && CATENA_SIM_EXTRA="spark.sql.windowExec.buffer.spill.threshold=1024;spark.sql.windowExec.buffer.in.memory.threshold=1024;spark.sql.sortMergeJoinExec.buffer.spill.threshold=64;spark.sql.sortMergeJoinExec.buffer.in.memory.threshold=64;spark.sql.objectHashAggregate.sortBased.fallbackThreshold=16;spark.unsafe.sorter.spill.read.ahead.enabled=false;spark.driver.memory=6g" \
    python /root/repo/scripts/drive_contract.py $EXEMPT_IN_WINDOW | tail -1)
fi

# input-permutation invariance axis (r13, fifth probe class): every
# conf axis above preserves on-disk ROW ORDER, so an under-specified
# tie that happens to agree on today's layout (window order, argmin,
# top-k boundary) passes them all. permute_probe.py runs the window's
# keys on a seeded row-permuted copy of the tables vs the DuckDB
# oracle on the ORIGINAL files — identical multisets, so only a
# value-level dependence on scan order can flip the hash. Full-contract
# run is on-demand after any window/top-k/argmin/sampling kernel
# change (r13 first full run: 165/165 ALL-MATCH).
echo "== input-permutation invariance (seeded row-permuted tables)"
(cd /tmp && python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# splits sub-axis at varied N (r14, VERDICT r13 item 3): the axis that
# caught the r13 silent 0-row streaming bug on its first composed run.
# Each table becomes an N-part-file DIRECTORY; varying N moves every
# part-file boundary and scan-split assignment, so a dependence on file
# count or inter-file order can't hide behind one lucky N. Primes
# chosen so no N divides another's boundaries.
for N in 2 7 13; do
  echo "== input-permutation invariance, splits=$N (directory-shaped tables)"
  (cd /tmp && CATENA_PERMUTE_SPLITS=$N \
    python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)
done

# part-file layout sub-axis (r14): even slicing is the LUCKIEST layout
# a directory table can have — at production scale compaction
# remainders and predicate-filtered writes leave ZERO-ROW schema-only
# part-files (empty: first/middle/last files have no rows, hitting
# schema-from-first-file and empty-Arrow-batch paths) and wildly
# uneven ones (skew: ~90% of rows in one file, so one scan task
# carries nearly everything and the rest contribute empty partials).
# Same permuted multiset as the cells above — only boundaries move.
for L in empty skew; do
  echo "== input-permutation invariance, splits=7 layout=$L"
  (cd /tmp && CATENA_PERMUTE_SPLITS=7 CATENA_PERMUTE_LAYOUT=$L \
    python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)
done

# write-encoding sub-axis (r14): the same values in different parquet
# BYTES — zstd instead of the fixture's codec (a 100 TB lake mixes
# codecs across writer generations), 512-row row groups (every
# vectorized-reader batch boundary and row-group-pruning unit moves),
# deprecated INT96 timestamps (the legacy Hive/Impala/old-Spark
# physical type still ubiquitous in old partitions; nanosecond julian,
# lossless for microsecond data), dictionary encoding OFF (plain pages
# are a separate decode+pruning path from dictionary pages), 4 KiB
# data pages (page boundaries and page-index pruning units multiply),
# statistics OFF (stats-based pruning must degrade to full scans,
# never to wrong answers), and DataPage V2 (the separate page decode
# path newer writers emit). The DuckDB oracle keeps reading the
# ORIGINAL files, so any decode-path value drift flips the hash.
echo "== input-permutation invariance, splits=7 zstd+rg512+int96+nodict+ps4096+nostats+pv2"
(cd /tmp && CATENA_PERMUTE_SPLITS=7 CATENA_PERMUTE_CODEC=zstd \
  CATENA_PERMUTE_ROWGROUP=512 CATENA_PERMUTE_INT96=1 \
  CATENA_PERMUTE_NODICT=1 CATENA_PERMUTE_PAGESIZE=4096 \
  CATENA_PERMUTE_NOSTATS=1 CATENA_PERMUTE_PAGEV2=1 \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# BYTE_STREAM_SPLIT cell (r14 finding): the modern float encoding
# (Arrow/DuckDB/parquet-cpp writers). Spark 4.1.2's VECTORIZED reader
# rejects BSS pages outright — fail-LOUD ("Unsupported encoding"),
# never silent corruption — so the probe pins value parity through the
# row-based reader, which is also the production mitigation for
# BSS-bearing third-party partitions. Composed with nodict (BSS pages
# only materialize where dictionary encoding is off) and the rest.
# ADVICE r14: this cell pins the ROW-BASED reader only (main() disables
# the vectorized reader for BSS bytes); vectorized-reader coverage for
# the other seven encoding knobs rests ENTIRELY on the non-BSS cell
# above — the BSS cell must never replace it, only accompany it.
echo "== input-permutation invariance, BSS floats (row-based reader) + all encoding knobs"
(cd /tmp && CATENA_PERMUTE_SPLITS=7 CATENA_PERMUTE_CODEC=zstd \
  CATENA_PERMUTE_ROWGROUP=512 CATENA_PERMUTE_INT96=1 \
  CATENA_PERMUTE_NODICT=1 CATENA_PERMUTE_PAGESIZE=4096 \
  CATENA_PERMUTE_NOSTATS=1 CATENA_PERMUTE_PAGEV2=1 CATENA_PERMUTE_BSS=1 \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# column-order drift sub-axis (r14): part-files of the SAME table with
# alternating physical field orders — the schema-drift shape successive
# writer generations leave behind. Readers must resolve columns by
# NAME; any positional assumption in a scan, stream, or Arrow batch
# path flips values or errors.
echo "== input-permutation invariance, splits=7 colorder=mixed"
(cd /tmp && CATENA_PERMUTE_SPLITS=7 CATENA_PERMUTE_COLORDER=mixed \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# schema-drift sub-axis (r15, VERDICT r14 item 3): beyond field ORDER to
# the two drifts a multi-generation lake physically contains. widen =
# int32 part-files next to int64 ones (value-preserving; original
# oracle); missing = odd orders part-files written without
# o_orderpriority (null-fill parity: the oracle reads the SAME drifted
# bytes with union_by_name). Both run the MITIGATED contract — the probe
# sets CATENA_SCHEMA_DRIFT_SAFE=1 so tables.load pins the footer-derived
# superset schema; Spark's unmitigated fail-loud matrix is pinned by
# tests/test_sources.py::test_schema_drift_unmitigated_is_never_silently_wrong.
echo "== input-permutation invariance, splits=3 drift=widen"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=widen \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

echo "== input-permutation invariance, splits=3 drift=missing (null-fill parity)"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=missing \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# drift x BSS composed cell (r15): both mitigations at once — the
# footer-derived superset schema (drift) through the row-based reader
# (BSS). Evidenced at sf0.01 window + sf0.1 full contract in r15.
echo "== input-permutation invariance, splits=3 drift=widen,missing + BSS (row-based)"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=widen,missing \
  CATENA_PERMUTE_BSS=1 \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# nested-leaf drift cells (r16, VERDICT r15 item 4). widen_nested =
# list<float> part-files next to list<double> ones on
# embeddings.embedding (value-exact; original oracle). The missing-
# ARRAY cell drops embeddings.embedding itself from odd parts
# (ArrayType null-fill parity) — the cell that caught the NULL-vector
# engine divergence in centroid/kmeans/semdedup (NULLS FIRST vs LAST,
# ghost-row count(*) denominators) and forced the NOT-NULL entry-guard
# doctrine. Window-scoped like every cell; the embedding consumers
# rotate through with the window.
echo "== input-permutation invariance, splits=4 drift=widen_nested (list<float> -> list<double>)"
(cd /tmp && CATENA_PERMUTE_SPLITS=4 CATENA_PERMUTE_DRIFT=widen_nested \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

echo "== input-permutation invariance, splits=4 drift=missing ARRAY col (embeddings.embedding)"
(cd /tmp && CATENA_PERMUTE_SPLITS=4 CATENA_PERMUTE_DRIFT=missing \
  CATENA_PERMUTE_DRIFT_TABLE=embeddings CATENA_PERMUTE_DRIFT_COL=embedding \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# r17 standing cells (promoted from the round's ad-hoc runs so future
# rounds exercise them without re-derivation):
#
# unsigned = eligible small-int columns stored UNSIGNED same-width in
# odd parts (Arrow-pipeline generation mix; the silent bit-wrap hazard
# class the uint merge lattice closes). tzadjust = odd parts carry the
# UTC-adjusted timestamp annotation beside naive generations (the
# pandas-vs-Spark writer mix; lattice resolves tz-aware, naive-as-UTC).
# Both value-preserving -> original oracle.
echo "== input-permutation invariance, splits=3 drift=unsigned"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=unsigned \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

echo "== input-permutation invariance, splits=3 drift=tzadjust"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=tzadjust \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# rename (r17): Iceberg-style field-id generations with drift_col
# renamed in odd parts; read_drifted heals by field id so the healed
# read must equal the ORIGINAL bytes. One scalar cell (orders) and one
# ARRAY cell (embeddings.embedding, through every embedding consumer
# in the window).
echo "== input-permutation invariance, splits=3 drift=rename (orders, field-id healing)"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=rename \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

echo "== input-permutation invariance, splits=4 drift=rename ARRAY col (embeddings.embedding)"
(cd /tmp && CATENA_PERMUTE_SPLITS=4 CATENA_PERMUTE_DRIFT=rename \
  CATENA_PERMUTE_DRIFT_TABLE=embeddings CATENA_PERMUTE_DRIFT_COL=embedding \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# string-annotation drift (r17): every top-level string column stored
# as unannotated BYTE_ARRAY in odd parts — the ancient-writer shape
# behind binaryAsString; the lattice resolves the mix to string
# (doctrine class 5), so the original oracle applies.
echo "== input-permutation invariance, splits=3 drift=binstr (unannotated BYTE_ARRAY generations)"
(cd /tmp && CATENA_PERMUTE_SPLITS=3 CATENA_PERMUTE_DRIFT=binstr \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# legacy list layouts (r17, VERDICT r16 item 4): even part indices
# rewritten into TWO-level `repeated` and three-level bag layouts
# beside modern list<element> generations — all three decode exactly
# on both engines (empirical matrix in SCALE.md r17).
echo "== input-permutation invariance, splits=4 LIST2 (legacy 2-level + bag list layouts)"
(cd /tmp && CATENA_PERMUTE_SPLITS=4 CATENA_PERMUTE_LIST2=1 \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# DELTA encodings (r17): DELTA_BINARY_PACKED ints + DELTA_BYTE_ARRAY /
# DELTA_LENGTH_BYTE_ARRAY strings on v2 pages (auto-composes nodict —
# dictionary precedence would leave the cell vacuous).
echo "== input-permutation invariance, splits=7 DELTA encodings (v2 pages)"
(cd /tmp && CATENA_PERMUTE_SPLITS=7 CATENA_PERMUTE_DELTA=1 \
  CATENA_PERMUTE_PAGEV2=1 \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# bitrot NEGATIVE cell (r17, VERDICT r16 item 5): a CRC-bearing copy
# with one verified-effective mid-chunk byte flip must fail LOUD under
# enable_bitrot_detection (the cell replaces the parity run — corrupted
# bytes have no meaningful parity; exit 0 = the flip was caught loud).
echo "== bitrot negative cell (page-CRC copy, one flipped byte, must fail loud)"
(cd /tmp && CATENA_PERMUTE_BITROT=1 \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

# grand compositions (r17): every compatible axis at once — six writer
# generations and three encoding families in one directory. Two
# variants because missing and rename are mutually exclusive (both
# consume DRIFT_COL): (a) the missing-ARRAY composition that forced
# the NULL-vector doctrine; (b) the rename-ARRAY composition healing
# through the same consumers.
echo "== grand composition (a): drift=widen,missing,widen_nested,unsigned,tzadjust,binstr + LIST2 + DELTA + codec=mixed"
(cd /tmp && CATENA_PERMUTE_SPLITS=4 \
  CATENA_PERMUTE_DRIFT=widen,missing,widen_nested,unsigned,tzadjust,binstr \
  CATENA_PERMUTE_DRIFT_TABLE=embeddings CATENA_PERMUTE_DRIFT_COL=embedding \
  CATENA_PERMUTE_LIST2=1 CATENA_PERMUTE_DELTA=1 CATENA_PERMUTE_PAGEV2=1 \
  CATENA_PERMUTE_CODEC=mixed \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

echo "== grand composition (b): drift=widen,rename,widen_nested,unsigned,tzadjust,binstr + DELTA + codec=mixed + colorder=mixed"
(cd /tmp && CATENA_PERMUTE_SPLITS=4 \
  CATENA_PERMUTE_DRIFT=widen,rename,widen_nested,unsigned,tzadjust,binstr \
  CATENA_PERMUTE_DRIFT_TABLE=embeddings CATENA_PERMUTE_DRIFT_COL=embedding \
  CATENA_PERMUTE_DELTA=1 CATENA_PERMUTE_PAGEV2=1 \
  CATENA_PERMUTE_CODEC=mixed CATENA_PERMUTE_COLORDER=mixed \
  python /root/repo/scripts/permute_probe.py /root/testdata/sf0.01 $WINDOW | tail -1)

echo "== STRESS MATRIX ALL GREEN"
