"""Input-permutation invariance probe (new probe class, r13).

The house total-order doctrine says every operator's OUTPUT VALUES are
invariant to input row order: ties in any window / top-k / argmin /
first-last path are broken by keys proven unique (or by explicit
tie-break columns), two-phase offsets come from actual per-partition
totals, and sampling is hash-of-value, never row-position. Thirteen
rounds of driver records prove Spark(original) == DuckDB(original) —
but both engines read the SAME file layout there, so a latent
order-sensitivity that happens to agree on today's layout is invisible
to every existing probe class (hostile TZ/conf/SF mirrors all preserve
row order).

This probe breaks that blind spot: it writes a seeded row-PERMUTED
copy of every table (same multiset, new on-disk order, pyarrow
take()), runs every oracle-backed key's Spark plan on the PERMUTED
copy in a hostile plain session, and compares row count + sorted
column names + order-insensitive value hash against the DuckDB oracle
on the ORIGINAL directory. Identical input multisets mean a correct
deterministic operator must hash-match; any value-level dependence on
scan order in EITHER engine flips it.

Usage:
    CATENA_PERMUTE_SPLITS=N CATENA_PERMUTE_LAYOUT=even|empty|skew \
    CATENA_PERMUTE_CODEC=snappy|zstd|gzip|none|mixed \
    CATENA_PERMUTE_ROWGROUP=M CATENA_PERMUTE_INT96=1 \
    CATENA_PERMUTE_NODICT=1 CATENA_PERMUTE_PAGESIZE=B \
    CATENA_PERMUTE_NOSTATS=1 CATENA_PERMUTE_PAGEV2=1 \
    CATENA_PERMUTE_BSS=1 CATENA_PERMUTE_DELTA=1 \
    CATENA_PERMUTE_COLORDER=reversed|mixed \
    CATENA_PERMUTE_DRIFT=widen|missing|widen_nested|unsigned|tzadjust|... \
    CATENA_PERMUTE_DRIFT_TABLE=orders CATENA_PERMUTE_DRIFT_COL=... \
    CATENA_PERMUTE_LIST2=1 \
    CATENA_PERMUTE_BITROT=1 CATENA_PERMUTE_BITROT_TABLE=lineitem \
        python scripts/permute_probe.py [sf_dir] [key ...]
Defaults to /root/testdata/sf0.01, all oracle-backed keys, and a
single file per table; SPLITS > 1 writes each permuted table as N
part-files in a directory (file-count / scan-split-assignment /
inter-file-order independence, composed with the permutation). The
LAYOUT sub-axis (r14) varies how rows land in those part-files:
``empty`` interleaves ZERO-ROW schema-only part-files at the front,
middle, and end of every directory table (compaction remainders and
predicate-filtered writes leave exactly these at production scale;
empty files hit schema-inference-from-first-file and empty-Arrow-batch
paths), and ``skew`` puts ~90% of each table's rows in the first
part-file (one scan task carries nearly everything — partial-agg and
merge orders degenerate). The WRITE-ENCODING sub-axis (r14) varies how
the same values are encoded in the parquet bytes — CODEC picks the
compression (a 100 TB lake mixes codecs across writer generations),
ROWGROUP shrinks row groups so the vectorized reader's columnar-batch
boundaries move and page/row-group pruning sees many tiny units, and
INT96=1 writes timestamps as deprecated INT96 (the legacy Hive/
Impala/old-Spark physical type still ubiquitous in old partitions) —
any value drift in a decode path flips the hash because the DuckDB
oracle still reads the ORIGINAL files. The COLORDER sub-axis (r14)
writes the parquet files with a different PHYSICAL column order —
``reversed`` flips every file's field order, ``mixed`` alternates
original/reversed order between part-files of the SAME table (the
schema-drift shape successive writer generations leave behind);
parquet readers must match columns by NAME, so any positional
assumption in a scan or operator flips values or errors. The permuted copy is rebuilt
under /tmp/catena_permuted_<sf>_<seed>_s<N>[_<layout>][_<encoding>]/
per run (seeded numpy shuffle => byte-stable across runs; the permuted
ROW ORDER is identical across layouts and encodings, only the bytes
around it change). Exits 1 on any mismatch. Run from any cwd.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SEED = 20260815
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


LAYOUTS = ("even", "empty", "skew")


def _layout_slices(n: int, splits: int, layout: str) -> list[tuple[int, int]]:
    """(offset, length) of each part-file for one table of ``n`` rows.
    Contiguous and exhaustive in permuted-row order for every layout,
    so the multiset (and the sliced read-back order) is layout-
    invariant — only the part-file boundaries move:

    - ``even``: splits equal slices (the r13 behavior).
    - ``empty``: even slices with ZERO-ROW slices interleaved at the
      front, middle, and end — the schema-only part-files compaction
      remainders and predicate-filtered writes leave behind.
    - ``skew``: first slice ~90% of the rows, the rest split evenly
      over the remaining splits-1 files (tail slices may legitimately
      come out zero-row on small tables — skewed writes produce those
      too)."""
    import numpy as np

    k = splits if (splits > 1 and n >= splits) else 1
    if layout == "skew" and n > 1 and k > 1:
        head = max(1, int(n * 0.9))
        bounds = [0, head] + [int(b) for b in np.linspace(head, n, k)[1:]]
    else:
        bounds = [int(b) for b in np.linspace(0, n, k + 1)]
    slices = [
        (bounds[i], bounds[i + 1] - bounds[i]) for i in range(len(bounds) - 1)
    ]
    if layout == "empty":
        mid = len(slices) // 2
        mid_off = slices[mid][0] if mid < len(slices) else n
        slices = (
            [(0, 0)] + slices[:mid] + [(mid_off, 0)] + slices[mid:] + [(n, 0)]
        )
    return slices


COLORDERS = (None, "reversed", "mixed")

DRIFTS = (
    "widen", "missing", "widen_nested", "unsigned", "tzadjust",
    "rename", "binstr",
)


def _drift_modes(drift: str | None) -> set[str]:
    """Parse the drift knob (comma-joined subset of DRIFTS)."""
    modes = {m for m in (drift or "").replace(" ", "").split(",") if m}
    bad = modes - set(DRIFTS)
    if bad:
        raise ValueError(f"drift modes must be in {DRIFTS}, got {sorted(bad)}")
    if {"missing", "rename"} <= modes:
        # both consume DRIFT_TABLE/DRIFT_COL — dropping and renaming
        # the same column in the same odd parts is not a lake shape
        raise ValueError(
            "drift modes 'missing' and 'rename' are mutually exclusive "
            "(both target DRIFT_COL); run them as separate cells"
        )
    return modes


def _widen_nested_type(t):
    """The ``widen_nested`` drift target for one arrow type: every
    float32 (or float16) LEAF — at any nesting depth: list elements,
    struct fields, map keys/values — becomes float64; everything else
    is unchanged. float->double widening is value-EXACT (every binary32
    is representable in binary64), so the original-bytes oracle still
    applies; what drifts is only the physical storage width — the
    ``list<float>`` vs ``list<double>`` generation mix an embedding
    corpus accumulates when a writer upgrades its vector dtype
    (VERDICT r15 item 4)."""
    import pyarrow as pa

    if pa.types.is_float32(t) or pa.types.is_float16(t):
        return pa.float64()
    if pa.types.is_list(t):
        return pa.list_(_widen_nested_type(t.value_type))
    if pa.types.is_large_list(t):
        return pa.large_list(_widen_nested_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct(
            [(f.name, _widen_nested_type(f.type)) for f in t]
        )
    if pa.types.is_map(t):
        return pa.map_(
            _widen_nested_type(t.key_type), _widen_nested_type(t.item_type)
        )
    return t


def _bss_columns(schema) -> list[str]:
    """ALL floating-point leaf paths in this schema, in parquet dotted
    notation — ADVICE r14: the previous version matched only top-level
    float columns and list<float> leaves, so a float nested inside a
    struct/map would silently narrow the BSS cell's coverage if a
    fixture schema evolved. Now a full recursive walk: structs recurse
    as '{parent}.{child}', lists as '{name}.list.element', maps as
    '{name}.key_value.{key|value}' (the pyarrow writer accepts exactly
    these paths in use_byte_stream_split — pinned by teeth test).
    Restricted to floating point — the encoding's original target and
    the one every reader generation supports; BSS-on-INT is a newer
    spec addition not worth a false-positive risk in a parity gate."""
    import pyarrow as pa

    def walk(prefix: str, typ) -> list[str]:
        if pa.types.is_floating(typ):
            return [prefix]
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return walk(f"{prefix}.list.element", typ.value_type)
        if pa.types.is_struct(typ):
            out: list[str] = []
            for f in typ:
                out += walk(f"{prefix}.{f.name}", f.type)
            return out
        if pa.types.is_map(typ):
            return walk(f"{prefix}.key_value.key", typ.key_type) + walk(
                f"{prefix}.key_value.value", typ.item_type
            )
        return []

    cols: list[str] = []
    for f in schema:
        cols += walk(f.name, f.type)
    return cols


def _delta_columns(schema) -> dict[str, str]:
    """{dotted leaf path: parquet encoding} for the DELTA knob (r17):
    integer leaves get DELTA_BINARY_PACKED, string leaves get
    DELTA_BYTE_ARRAY except the LAST string leaf per table, which gets
    DELTA_LENGTH_BYTE_ARRAY so all three v2 encodings materialize
    (the fixtures carry no binary columns, DLBA's usual home).
    Timestamps are excluded (INT96-knob composition: the deprecated
    physical type takes no v2 encoding); floats stay the BSS knob's
    domain."""
    import pyarrow as pa

    def walk(prefix: str, typ) -> list[tuple[str, str]]:
        if pa.types.is_integer(typ):
            return [(prefix, "DELTA_BINARY_PACKED")]
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return [(prefix, "DELTA_BYTE_ARRAY")]
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return walk(f"{prefix}.list.element", typ.value_type)
        if pa.types.is_struct(typ):
            out: list[tuple[str, str]] = []
            for f in typ:
                out += walk(f"{prefix}.{f.name}", f.type)
            return out
        return []

    pairs: list[tuple[str, str]] = []
    for f in schema:
        pairs += walk(f.name, f.type)
    out = dict(pairs)
    last_str = [p for p, e in pairs if e == "DELTA_BYTE_ARRAY"]
    if last_str:
        out[last_str[-1]] = "DELTA_LENGTH_BYTE_ARRAY"
    return out


def permuted_copy(
    sf_dir: str,
    splits: int = 1,
    layout: str = "even",
    codec: str | None = None,
    rowgroup: int | None = None,
    int96: bool = False,
    colorder: str | None = None,
    nodict: bool = False,
    pagesize: int | None = None,
    nostats: bool = False,
    pagev2: bool = False,
    bss: bool = False,
    delta: bool = False,
    out_base: str = "/tmp",
    drift: str | None = None,
    drift_table: str = "orders",
    drift_col: str | None = None,
    list2: bool = False,
    bitrot: bool = False,
) -> str:
    """Seeded row-permuted copy of every table, same schema and values
    (pyarrow take over a shuffled index). ``splits`` > 1 writes each
    table as part-files inside a DIRECTORY named ``{t}.parquet``
    (Spark reads both layouts identically) — the multi-file axis
    additionally breaks any dependence on file count, scan-task
    assignment, or inter-file ordering; the permuted row order is
    sliced contiguously so the axes compose. ``layout`` picks how the
    slices land in the part-files (see _layout_slices); non-even
    layouts always write a directory so the empty/skewed part-files
    exist even for tables smaller than ``splits``.

    The write-encoding knobs change the parquet BYTES, never the
    values: ``codec`` sets the compression codec, ``rowgroup`` caps
    rows per row group (moves every columnar-batch boundary and
    multiplies the row-group-pruning units), ``int96`` writes
    timestamps as the deprecated INT96 physical type (nanosecond
    julian — lossless for microsecond data; the legacy layout old
    Hive/Impala/Spark writers produced); ``colorder`` changes the
    PHYSICAL field order in the files (``reversed`` everywhere;
    ``mixed`` alternates original/reversed between part-files of one
    table — successive writer generations do exactly this, and
    readers must resolve columns by NAME, never position; ``mixed``
    forces a directory layout so the drift actually exists within
    each table). Each knob lands in the output dir name so runs with
    different encodings never share bytes.

    The SCHEMA-DRIFT sub-axis (r15, VERDICT r14 item 3) goes beyond
    field ORDER to the two drifts a multi-generation lake physically
    contains, applied to ODD part-file indices so every affected table
    holds both writer generations:

    - ``drift='widen'``: every top-level int8/int16/int32 column (in
      any table that has one — the fixtures: lineitem.l_linenumber,
      customer.c_nationkey, embeddings.label) is physically widened to
      int64 in odd parts. VALUE-preserving, so the original DuckDB
      oracle still applies; what drifts is only the physical type.
    - ``drift='missing'``: odd part-files of ``drift_table`` (default
      orders) are written WITHOUT ``drift_col`` (default: the table's
      last column — o_orderpriority), the older-writer shape. NOT
      value-preserving (reads must surface NULLs), so main() compares
      Spark against DuckDB reading the SAME drifted bytes with
      union_by_name=true — engine-vs-engine null-fill parity. With
      DRIFT_TABLE=embeddings DRIFT_COL=embedding the dropped column is
      an ARRAY — superset NULL-fill on ArrayType (r16).
    - ``drift='unsigned'`` (r17): eligible small-int columns (every
      value >= 0; int8/16/32, minus any 'widen' columns) are stored
      UNSIGNED same-width in odd parts — the signed/unsigned
      generation mix Arrow pipelines leave. Value-preserving; the
      merge lattice resolves to the containing signed type (unsigned
      pages under a too-narrow signed schema silently bit-wrap — the
      r17 uint matrix in encodings.py / test_uint_parquet_generations).
    - ``drift='widen_nested'`` (r16, VERDICT r15 item 4): every
      float32 LEAF at any nesting depth is physically widened to
      float64 in odd parts — in the fixtures, embeddings.embedding
      becomes ``list<double>`` beside ``list<float>`` generations.
      Value-EXACT (binary32 ⊂ binary64), so the original oracle
      applies, like ``widen``.
    - ``drift='binstr'`` (r17): every top-level STRING column (any
      table) is stored as UNANNOTATED BYTE_ARRAY in odd parts — the
      ancient-writer shape behind spark.sql.parquet.binaryAsString /
      DuckDB binary_as_string (same bytes, no UTF8 annotation). The
      merge lattice resolves the mix to string (doctrine class 5), so
      the healed read equals the ORIGINAL bytes and the original
      oracle applies.
    - ``drift='rename'`` (r17): every part-file of ``drift_table`` is
      stamped with Iceberg-style parquet field ids (position-keyed per
      ORIGINAL column identity, consistent across parts), and odd
      parts carry ``drift_col`` RENAMED to ``{drift_col}_renamed`` —
      the rename-across-generations shape Iceberg/Delta writers leave
      in raw parquet. read_drifted heals it by field id back to the
      majority name (the original), so the healed read equals the
      ORIGINAL bytes exactly and the original oracle applies — a
      stronger check than null-fill parity. Mutually exclusive with
      ``missing`` (both consume drift_col). Doctrine + hazard matrix:
      encodings.py classes 3/4, tests/test_sources.py::
      test_rename_drift_heals_by_field_id.

    Drift-affected tables always get a directory with ≥2 part-files
    (else the drift cannot physically exist), which is why drift
    requires ``splits >= 2``. Spark 4.1.2's unmitigated behavior on
    these bytes is pinned in catena_spark/sources/encodings.py (the
    empirical matrix: fail-loud or silently-vanishing column on
    footer-sampling luck, never wrong values); the probe runs the
    MITIGATED contract — CATENA_SCHEMA_DRIFT_SAFE=1 routes tables.load
    through read_drifted's footer-derived superset schema.

    The output path is keyed by SOURCE dir basename + an 8-hex sha256
    of the ABSOLUTE source path + seed + every axis knob: an sf0.001
    teeth-test rebuild must never clobber an sf0.01 probe's live copy
    (r14 forensics: exactly that collision — the pytest suite rebuilt
    the splits=7/empty path with sf0.001 data while a full-contract
    sf0.01 probe was mid-run reading it — produced 17 spurious
    MISMATCHes that adjudicated in minutes only because rows=75/750
    made the wrong-scale read obvious). ADVICE r14 tightened the key:
    basename alone still collided for two DIFFERENT dirs with the same
    basename (/a/sf0.01 vs /b/sf0.01, or a tmp_path fixture named like
    a real SF) — the abs-path hash makes that impossible; and the
    pytest teeth now write under ``out_base=tmp_path`` so a teeth run
    on the SAME source with the same knobs can never rebuild a live
    probe's copy mid-read. Two CONCURRENT probes with identical
    (source, axes, out_base) still share a path by design; the
    contention doctrine already forbids concurrent Spark runs on this
    machine."""
    import hashlib
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if layout not in LAYOUTS:
        raise ValueError(f"layout must be one of {LAYOUTS}, got {layout!r}")
    if colorder not in COLORDERS:
        raise ValueError(
            f"colorder must be one of {COLORDERS}, got {colorder!r}"
        )
    suffix = "" if layout == "even" else f"_{layout}"
    wkw: dict = {}
    codec_cycle: list | None = None
    if codec == "mixed":
        # per-part codec drift (r15, widened r16): successive writer
        # generations compress differently — one directory, four
        # codecs. Parquet carries the codec per column chunk, so
        # readers must dispatch decode per chunk, never per table;
        # forces a directory. NOT brotli: Spark 4.1.2 has no
        # BrotliCodec on the classpath — page decode fails LOUD
        # (ClassNotFoundException) while count(*) silently SUCCEEDS
        # off footer metadata (r16 finding, teeth-pinned in
        # tests/test_sources.py::test_brotli_parquet_is_fail_loud) —
        # so brotli parity is unverifiable on this build, exactly like
        # BSS under the vectorized reader but with no conf mitigation.
        codec_cycle = ["snappy", "zstd", "gzip", "lz4"]
        suffix += "_cmixed"
    elif codec:
        wkw["compression"] = codec
        suffix += f"_c{codec}"
    if rowgroup:
        wkw["row_group_size"] = rowgroup
        suffix += f"_rg{rowgroup}"
    if int96:
        wkw["use_deprecated_int96_timestamps"] = True
        suffix += "_int96"
    if nodict:
        # PLAIN encoding everywhere — dictionary pages and plain pages
        # are separate decode paths in every reader (and dictionary
        # filtering is a separate pruning path)
        wkw["use_dictionary"] = False
        suffix += "_nodict"
    if pagesize:
        # tiny data pages multiply page boundaries and page-index
        # pruning units the same way rowgroup multiplies row groups
        wkw["data_page_size"] = pagesize
        suffix += f"_ps{pagesize}"
    if nostats:
        # no row-group/page statistics: every stats-based pruning path
        # (row-group skip, page index, pushed filters) must DEGRADE to
        # full scans, never to wrong answers — old writers and some
        # tools emit exactly these files
        wkw["write_statistics"] = False
        suffix += "_nostats"
    if pagev2:
        # DataPage V2 is a separate page decode path (levels stored
        # uncompressed ahead of the values) newer writers emit
        wkw["data_page_version"] = "2.0"
        suffix += "_pv2"
    if bss:
        # BYTE_STREAM_SPLIT on every floating-point leaf (incl. the
        # embeddings ARRAY<FLOAT> elements) — the modern float
        # encoding modern Arrow/DuckDB/parquet-cpp writers emit.
        # FINDING (r14, pinned by probe run + isolation test): Spark
        # 4.1.2's VectorizedColumnReader throws
        # SparkUnsupportedOperationException("Unsupported encoding:
        # BYTE_STREAM_SPLIT") — fail-LOUD, never silent corruption —
        # while the row-based reader decodes BSS correctly. main()
        # therefore pins enableVectorizedReader=false for BSS runs;
        # at 100 TB the ops mitigation for BSS-bearing third-party
        # partitions is the same conf (at scan-throughput cost) or
        # rewriting them. Column list is per-table (loop below) —
        # note BSS only materializes where dictionary encoding is off
        # or overflows, so compose with nodict to guarantee BSS pages.
        suffix += "_bss"
    if delta:
        # DELTA-encodings axis (r17): ints as DELTA_BINARY_PACKED,
        # strings as DELTA_BYTE_ARRAY / DELTA_LENGTH_BYTE_ARRAY — the
        # parquet v2 encodings modern writers emit. Unlike BSS these
        # decode EXACTLY on this build's BOTH readers (empirical matrix
        # in SCALE.md r17); the knob keeps the cell standing so a Spark
        # upgrade that regresses any of the three decode paths flips a
        # hash. Requires nodict (dictionary takes precedence) — main()
        # auto-enables, same as BSS. Column lists are per-table/per-
        # part (loop below), like BSS.
        suffix += "_delta"
    if bitrot:
        # BITROT cell (r17, VERDICT r16 item 5): the copy is written
        # WITH page checksums (pyarrow defaults to none — the writer
        # asymmetry half of the r16 doctrine) so that main()'s
        # one-byte flip is DETECTABLE: scans must fail LOUD under
        # enable_bitrot_detection and are documented-silent without
        # it. Own suffix: a corrupted copy must never share a path
        # with a parity run's bytes.
        wkw["write_page_checksum"] = True
        suffix += "_bitrot"
    if colorder:
        suffix += f"_co{colorder}"
    if list2:
        # LEGACY LIST LAYOUT axis (r17, VERDICT r16 item 4): even
        # part-file indices of every list-bearing table are REWRITTEN
        # post-copy into the legacy parquet list layouts old writers
        # (parquet-mr < 1.x configs, legacy Hive/Avro paths, Spark
        # writeLegacyFormat) produced — the true TWO-level
        # ``repeated <type> array`` and the three-level
        # ``bag { optional <type> array }`` — beside modern
        # ``list { element }`` generations in the same directory.
        # pyarrow cannot WRITE these layouts, so permuted_copy only
        # reserves the axis here (suffix + forced directory); the
        # caller owns the Spark session that does the rewrite
        # (legacy_list_rewrite) — main() wires both.
        if splits < 4:
            raise ValueError(
                "list2 requires splits >= 4 (even part-file indices 0 "
                "and 2 carry the TWO legacy layouts — 2-level and bag — "
                "beside modern odd parts)"
            )
        suffix += "_list2"
    drift_modes = _drift_modes(drift)
    if drift_modes:
        if splits < 2:
            raise ValueError(
                "drift requires splits >= 2 (odd part-files carry the "
                "drifted writer generation)"
            )
        suffix += "_dr" + "-".join(sorted(drift_modes))
        if {"missing", "rename"} & drift_modes:
            suffix += f"_{drift_table}"
            if drift_col:
                # ADVICE r15: two runs differing only in DRIFT_COL must
                # not share an output path (the start-of-run rmtree
                # covers staleness within one run; this removes the
                # cross-run hazard entirely)
                suffix += f"_{drift_col}"
    src_abs = os.path.abspath(os.path.normpath(sf_dir))
    src_tag = (
        f"{os.path.basename(src_abs)}_"
        f"{hashlib.sha256(src_abs.encode()).hexdigest()[:8]}"
    )
    out_dir = os.path.join(
        out_base, f"catena_permuted_{src_tag}_{SEED}_s{splits}{suffix}"
    )
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        # a stale dst from a previous run with a different layout or
        # split count would corrupt the multiset — always start clean
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        tbl = pq.read_table(src)
        perm = tbl.take(rng.permutation(tbl.num_rows))

        def _enc_kw(schema):
            # per-schema write kwargs: BSS float leaves and DELTA
            # int/string leaves are disjoint column sets, so the two
            # knobs compose in one writer call
            kw = wkw
            if bss:
                cols = _bss_columns(schema)
                if cols:
                    kw = dict(kw, use_byte_stream_split=cols)
            if delta:
                dcols = _delta_columns(schema)
                if dcols:
                    kw = dict(kw, column_encoding=dcols)
            return kw

        tkw = _enc_kw(perm.schema)
        rev_names = list(reversed(perm.column_names))
        if colorder == "reversed":
            perm = perm.select(rev_names)
        # which drifts apply to THIS table (odd part-file indices)
        widen_cols = (
            [
                f.name
                for f in perm.schema
                if str(f.type) in ("int8", "int16", "int32")
            ]
            if "widen" in drift_modes
            else []
        )
        # nested float leaves (embeddings.embedding list<float> in the
        # fixtures) physically widened to double in odd parts
        nested_cols = (
            {
                f.name: _widen_nested_type(f.type)
                for f in perm.schema
                if not _widen_nested_type(f.type).equals(f.type)
            }
            if "widen_nested" in drift_modes
            else {}
        )
        # 'unsigned' (r17): odd parts store eligible small-int columns
        # as the SAME-WIDTH UNSIGNED physical type (int32 -> uint32
        # etc.) — the generation mix an Arrow pipeline leaves behind.
        # Value-preserving (eligibility = every value >= 0, checked on
        # the full permuted column so all odd parts share one
        # generation type), so the original-bytes oracle still
        # applies; what drifts is the SIGNEDNESS, which the merge
        # lattice must reconcile to the containing signed type (the
        # silent-wrap hazard: unsigned pages under a too-narrow signed
        # schema bit-reinterpret). int64 is excluded: uint64's only
        # exact Spark mapping is DECIMAL(20,0), which would change
        # query output types, not just physical storage. When composed
        # with 'widen', widen wins the column (it already moves those
        # columns to int64 in odd parts).
        # 'tzadjust' (r17): odd parts carry the tz ANNOTATION the Spark
        # writer generation puts on timestamps (isAdjustedToUTC=true)
        # while even parts keep the naive pandas/pyarrow annotation —
        # same int64 ticks, different annotation. Value-preserving; the
        # merge lattice resolves to tz-aware (naive-as-UTC, matching
        # DuckDB's union choice and the package's pinned-UTC loader
        # normalization). ns timestamps excluded (nanosAsLong/INT96
        # lattice territory); composing with the INT96 knob makes this
        # cell vacuous (INT96 swallows annotations) — don't pair them.
        binstr_cols: dict = {}
        if "binstr" in drift_modes:
            binstr_cols = {
                f.name: pa.binary()
                for f in perm.schema
                if str(f.type) == "string"
            }
        tz_cols: dict = {}
        if "tzadjust" in drift_modes:
            for f in perm.schema:
                t = f.type
                if (
                    pa.types.is_timestamp(t)
                    and t.tz is None
                    and t.unit != "ns"
                ):
                    tz_cols[f.name] = pa.timestamp(t.unit, "UTC")
        unsigned_cols: dict = {}
        if "unsigned" in drift_modes:
            import pyarrow.compute as pc

            u_map = {
                "int8": pa.uint8(),
                "int16": pa.uint16(),
                "int32": pa.uint32(),
            }
            for f in perm.schema:
                if str(f.type) in u_map and f.name not in widen_cols:
                    mn = pc.min(perm.column(f.name)).as_py()
                    if mn is not None and mn >= 0:
                        unsigned_cols[f.name] = u_map[str(f.type)]
        drop_col = None
        if "missing" in drift_modes and t == drift_table:
            drop_col = drift_col or perm.column_names[-1]
            if drop_col not in perm.column_names:
                raise ValueError(
                    f"drift_col {drop_col!r} not in {t} columns "
                    f"{perm.column_names}"
                )
        rename_col = None
        fid_map: dict[str, int] = {}
        if "rename" in drift_modes and t == drift_table:
            rename_col = drift_col or perm.column_names[-1]
            if rename_col not in perm.column_names:
                raise ValueError(
                    f"drift_col {rename_col!r} not in {t} columns "
                    f"{perm.column_names}"
                )
            # field ids keyed by ORIGINAL column identity so every
            # part agrees regardless of colorder/rename — the uniform
            # Iceberg-writer stamping read_drifted requires to heal
            fid_map = {n: j + 1 for j, n in enumerate(perm.column_names)}
        drifted = (
            bool(widen_cols)
            or bool(nested_cols)
            or bool(unsigned_cols)
            or bool(tz_cols)
            or bool(binstr_cols)
            or drop_col is not None
            or rename_col is not None
        )
        has_list = any(
            pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
            for f in perm.schema
        )
        single_file = (
            layout == "even"
            and colorder != "mixed"
            and not drifted
            and not (list2 and has_list)
            and codec_cycle is None
            and (splits <= 1 or perm.num_rows < splits)
        )
        if single_file:
            pq.write_table(perm, dst, **tkw)
        else:
            os.makedirs(dst)
            # a drift-affected table smaller than ``splits`` still needs
            # >= 2 part-files or the second writer generation never
            # physically exists
            # a drift/codec/list2-affected table smaller than ``splits``
            # still needs enough part-files for every writer generation
            # to physically exist (list2: indices 0/2 carry the two
            # legacy layouts, so 4); a table too small even for that
            # degenerates to one file and the post-write layout assert
            # catches the vacuous cell
            if perm.num_rows < splits:
                if list2 and has_list:
                    eff_splits = 4
                elif drifted or codec_cycle is not None:
                    eff_splits = 2
                else:
                    eff_splits = splits
            else:
                eff_splits = splits
            for i, (off, ln) in enumerate(
                _layout_slices(perm.num_rows, eff_splits, layout)
            ):
                part = perm.slice(off, ln)
                if i % 2 == 1:
                    if (widen_cols or nested_cols or unsigned_cols
                            or tz_cols or binstr_cols):
                        part = part.cast(
                            pa.schema(
                                [
                                    (f.name, pa.int64())
                                    if f.name in widen_cols
                                    else (
                                        f.name,
                                        unsigned_cols.get(
                                            f.name,
                                            tz_cols.get(
                                                f.name,
                                                binstr_cols.get(
                                                    f.name,
                                                    nested_cols.get(
                                                        f.name, f.type
                                                    ),
                                                ),
                                            ),
                                        ),
                                    )
                                    for f in part.schema
                                ]
                            )
                        )
                    if drop_col is not None:
                        part = part.drop_columns([drop_col])
                    if colorder == "mixed":
                        part = part.select(
                            [n for n in rev_names if n in part.column_names]
                        )
                if rename_col is not None:
                    # rename drift: stamp field ids on EVERY part (ids
                    # are what make the rename healable); odd parts
                    # carry the renamed generation. cast() to a schema
                    # with field metadata preserves values and attaches
                    # the ids pyarrow writes as parquet field_id.
                    tgt = []
                    for fname in part.schema.names:
                        fld = part.schema.field(fname)
                        nm = (
                            f"{rename_col}_renamed"
                            if i % 2 == 1 and fname == rename_col
                            else fname
                        )
                        tgt.append(
                            pa.field(
                                nm,
                                fld.type,
                                fld.nullable,
                                {
                                    b"PARQUET:field_id": str(
                                        fid_map[fname]
                                    ).encode()
                                },
                            )
                        )
                    part = part.rename_columns(
                        [f.name for f in tgt]
                    ).cast(pa.schema(tgt))
                pkw = tkw
                if (bss or delta) and drifted:
                    # a drifted part's schema differs — recompute the
                    # encoding column lists so the writer never names a
                    # column the part no longer carries
                    pkw = _enc_kw(part.schema)
                if codec_cycle is not None:
                    pkw = dict(
                        pkw, compression=codec_cycle[i % len(codec_cycle)]
                    )
                pq.write_table(
                    part,
                    os.path.join(dst, f"part-{i:04d}.parquet"),
                    **pkw,
                )
    return out_dir


def _assert_bss_pages(out_dir: str) -> None:
    """ADVICE r14: CATENA_PERMUTE_BSS=1 without NODICT=1 was silently
    vacuous — pyarrow's dictionary encoding takes precedence, so no
    BYTE_STREAM_SPLIT pages materialize, yet a green run looked like
    BSS parity coverage. main() now auto-enables nodict AND calls this
    post-write check: at least one column chunk somewhere in the copy
    must physically carry the BYTE_STREAM_SPLIT encoding (lineitem's
    doubles and embeddings' list<float> guarantee eligible leaves in
    the driver fixtures), else fail loudly before any key runs."""
    import pyarrow.parquet as pq

    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        files = (
            [os.path.join(dst, p) for p in sorted(os.listdir(dst))]
            if os.path.isdir(dst)
            else [dst]
        )
        for fp in files:
            meta = pq.ParquetFile(fp).metadata
            for g in range(meta.num_row_groups):
                rg = meta.row_group(g)
                for i in range(rg.num_columns):
                    if "BYTE_STREAM_SPLIT" in rg.column(i).encodings:
                        return
    raise AssertionError(
        "BSS knob set but no BYTE_STREAM_SPLIT pages materialized in "
        "any table — the cell is vacuous (dictionary precedence or "
        "fixture schema drift); refusing to report BSS parity coverage"
    )


#: Non-null fill literals per Spark element type, used ONLY to flip an
#: ArrayType's containsNull to false ahead of a legacy 2-level write —
#: never evaluated on data (the rewrite verifies no NULL element exists
#: first, so the coalesce is a types-only no-op).
_LIST2_ZERO = {
    "float": "CAST(0.0 AS FLOAT)",
    "double": "CAST(0.0 AS DOUBLE)",
    "int": "0",
    "bigint": "CAST(0 AS BIGINT)",
    "smallint": "CAST(0 AS SMALLINT)",
    "tinyint": "CAST(0 AS TINYINT)",
    "string": "''",
}


def legacy_list_rewrite(spark, out_dir: str) -> list[str]:
    """Rewrite EVEN part-file indices of every list-bearing table under
    ``out_dir`` into the legacy parquet list layouts (r17, VERDICT r16
    item 4) — alternating between the TRUE two-level layout
    (``repeated <type> array`` directly under the LIST group; written
    by parquet-mr < 1.x configs and old Hive/Avro converter paths) and
    Spark's legacy three-level ``bag { optional <type> array }``.
    Values are preserved exactly (float bytes round-trip; verified by
    the digest compare every probe key performs); ODD indices keep the
    modern ``list { element }`` layout — and keep any drift-axis
    schema generation — so one directory holds three writer
    generations.

    The two-level layout cannot represent a NULL ELEMENT (the element
    field is ``repeated``, i.e. required); a part-file whose list
    column carries one falls back to the bag layout (which can). NULL
    top-level arrays survive both layouts. Spark is the writer
    (``spark.sql.parquet.writeLegacyFormat=true`` — pyarrow cannot
    emit these layouts); the two-level variant additionally needs
    containsNull=false, which a parquet READ cannot surface (Spark
    forces read-schema nullability), so the rewrite flips it with a
    types-only ``transform(x -> coalesce(x, <zero>))`` that never
    evaluates the fill (no NULL elements exist on that path).

    Returns the rewritten file paths. Zero-row part-files rewrite too
    (their footers still advertise the legacy layout — the
    schema-inference shape a compaction remainder from an old writer
    leaves behind)."""
    import glob as _glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    rewritten: list[str] = []
    old = spark.conf.get("spark.sql.parquet.writeLegacyFormat", "false")
    spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
    try:
        for t in TABLES:
            dst = os.path.join(out_dir, f"{t}.parquet")
            if not os.path.isdir(dst):
                continue
            parts = sorted(
                p for p in os.listdir(dst) if p.endswith(".parquet")
            )
            for i, p in enumerate(parts):
                if i % 2 == 1:
                    continue  # odd parts stay modern (and carry drift)
                fp = os.path.join(dst, p)
                sch = pq.read_schema(fp)
                if not any(
                    pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                    for f in sch
                ):
                    continue
                df = spark.read.parquet(fp)
                list_cols = [
                    f.name
                    for f in df.schema.fields
                    if f.dataType.typeName() == "array"
                ]
                if (i // 2) % 2 == 0:
                    # TRUE 2-level: needs containsNull=false on every
                    # list column; verify no NULL element exists (the
                    # coalesce must stay types-only), else this file
                    # falls back to the bag layout
                    elem_ok = all(
                        df.schema[c].dataType.elementType.simpleString()
                        in _LIST2_ZERO
                        for c in list_cols
                    )
                    null_pred = None
                    for c in list_cols:
                        pred = F.exists(F.col(c), lambda x: x.isNull())
                        null_pred = (
                            pred if null_pred is None else null_pred | pred
                        )
                    if elem_ok and df.where(null_pred).limit(1).count() == 0:
                        # closure factory, not a default arg: pyspark
                        # derives the HOF's lambda arity from the
                        # python signature, so a second parameter would
                        # be bound to the array index
                        def _fill(zero_sql):
                            return lambda x: F.coalesce(x, F.expr(zero_sql))

                        for c in list_cols:
                            zero = _LIST2_ZERO[
                                df.schema[c].dataType.elementType.simpleString()
                            ]
                            df = df.withColumn(c, F.transform(c, _fill(zero)))
                tmp = fp + ".legacy_tmp"
                shutil.rmtree(tmp, ignore_errors=True)
                df.coalesce(1).write.parquet(tmp)
                written = _glob.glob(os.path.join(tmp, "part-*.parquet"))
                assert len(written) == 1, (tmp, written)
                os.replace(written[0], fp)
                shutil.rmtree(tmp)
                rewritten.append(fp)
    finally:
        spark.conf.set("spark.sql.parquet.writeLegacyFormat", old)
    return rewritten


def _assert_legacy_list_layouts(
    out_dir: str, expect_modern: bool = True
) -> None:
    """Post-rewrite teeth (the _assert_bss_pages pattern): the copy must
    PHYSICALLY contain both legacy layouts — a descriptor path
    ``<col>.array`` (two-level: repeated element directly under the
    LIST group) and a ``<col>.bag.array`` path (legacy three-level) —
    plus a modern ``<col>.list.element`` generation, else the cell is
    vacuous and must fail before any key reports parity coverage.
    ``expect_modern=False`` waives only the modern generation — the
    missing-ARRAY drift composition legitimately drops the sole list
    column from every odd (modern) part, so no modern layout can
    physically exist there."""
    import pyarrow.parquet as pq

    shapes: set[str] = set()
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        files = (
            [os.path.join(dst, p) for p in sorted(os.listdir(dst))]
            if os.path.isdir(dst)
            else [dst]
        )
        for fp in files:
            desc = pq.ParquetFile(fp).metadata.schema
            for i in range(len(desc)):
                seg = desc.column(i).path.split(".")
                if len(seg) == 2 and seg[1] == "array":
                    shapes.add("two_level")
                elif len(seg) >= 3 and seg[-2] == "bag":
                    shapes.add("legacy_bag")
                elif len(seg) >= 3 and seg[-2:] == ["list", "element"]:
                    shapes.add("modern")
    required = {"two_level", "legacy_bag"}
    if expect_modern:
        required.add("modern")
    missing = required - shapes
    if missing:
        raise AssertionError(
            f"LIST2 knob set but the copy lacks layout(s) {sorted(missing)} "
            f"(found {sorted(shapes)}) — the legacy-list cell is vacuous; "
            "refusing to report parity coverage"
        )


def _assert_delta_pages(out_dir: str) -> None:
    """Post-write teeth (the _assert_bss_pages pattern): the copy must
    physically carry ALL THREE v2 encodings somewhere — DBP on an int
    chunk, DBA and DLBA on string chunks — else the DELTA cell is
    vacuous (dictionary precedence, or fixture schema drift)."""
    import pyarrow.parquet as pq

    want = {
        "DELTA_BINARY_PACKED",
        "DELTA_BYTE_ARRAY",
        "DELTA_LENGTH_BYTE_ARRAY",
    }
    seen: set[str] = set()
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        files = (
            [os.path.join(dst, p) for p in sorted(os.listdir(dst))]
            if os.path.isdir(dst)
            else [dst]
        )
        for fp in files:
            meta = pq.ParquetFile(fp).metadata
            for g in range(meta.num_row_groups):
                rg = meta.row_group(g)
                for i in range(rg.num_columns):
                    seen |= want & set(rg.column(i).encodings)
            if seen >= want:
                return
    raise AssertionError(
        f"DELTA knob set but encodings {sorted(want - seen)} never "
        "materialized in any table — the cell is vacuous; refusing to "
        "report DELTA parity coverage"
    )


def bitrot_flip(out_dir: str, table: str = "lineitem") -> tuple[str, int]:
    """Flip ONE byte in the MIDDLE of the first column chunk of
    ``table``'s first part-file under ``out_dir`` — mid-chunk lands in
    page DATA with overwhelming probability (a flip near the chunk
    start can hit the page header's thrift STATISTICS, which no full
    scan reads: an inert flip that made the first cut of this cell
    silently vacuous — the caller must still verify effectiveness
    against a pre-flip baseline). Returns (file path, offset).
    Deterministic, so a cell's corruption is reproducible
    byte-for-byte across runs of the same copy."""
    import pyarrow.parquet as pq

    dst = os.path.join(out_dir, f"{table}.parquet")
    fp = (
        os.path.join(
            dst,
            sorted(p for p in os.listdir(dst) if p.endswith(".parquet"))[0],
        )
        if os.path.isdir(dst)
        else dst
    )
    col = pq.ParquetFile(fp).metadata.row_group(0).column(0)
    start = (
        col.dictionary_page_offset
        if col.dictionary_page_offset is not None
        else col.data_page_offset
    )
    off = start + col.total_compressed_size // 2
    with open(fp, "r+b") as f:
        f.seek(off)
        b = f.read(1)
        f.seek(off)
        f.write(bytes([b[0] ^ 0xFF]))
    return fp, off


def _bitrot_cell(spark, out_dir: str, table: str = "lineitem") -> int:
    """The standing bitrot stress cell (r17, VERDICT r16 item 5): one
    flipped byte in a CRC-bearing permuted copy. The cell asserts the
    doctrine's ASYMMETRY, which is the whole point:

    - hook OFF (Spark default): the all-columns scan is DOCUMENTED,
      not asserted — outcomes are offset-dependent (silent wrong
      values, or a loud decode error if the flip broke page structure;
      both within doctrine, only silence-with-hook-ON is a defect);
    - hook ON (enable_bitrot_detection): the same scan MUST fail loud
      at the corrupted page — this is the assertion; rc 1 otherwise.

    The scan hashes EVERY column (column pruning means verification is
    per page READ — a pruned column's corruption cannot raise; the r16
    doctrine's audit clause)."""
    from pyspark.sql import functions as F

    from catena_spark.sources import encodings

    dst = os.path.join(out_dir, f"{table}.parquet")

    def scan():
        df = spark.read.parquet(dst)
        return df.select(
            F.sum(F.hash(*df.columns)).alias("h")
        ).collect()[0].h

    # pre-flip baseline on the CLEAN copy: the cell must prove its
    # flip is EFFECTIVE (changes decoded values or breaks decode) —
    # a flip landing in page-header statistics is inert for a full
    # scan and would report coverage that never occurred
    encodings.enable_bitrot_detection(spark, enabled=False)
    h0 = scan()
    fp, off = bitrot_flip(out_dir, table)
    print(f"bitrot cell: flipped byte at {fp}:{off}")
    try:
        h = scan()
        if h == h0:
            print(
                "BITROT CELL: FAIL — the flip was INERT (hash "
                f"unchanged, {h}): it landed outside decoded page "
                "data; the cell is vacuous"
            )
            return 1
        print(
            "bitrot cell: hook OFF -> scan SUCCEEDED with WRONG values"
            f" (hash {h} != clean {h0}) — the documented "
            "default-session silent-corruption hazard"
        )
    except Exception as ex:
        print(
            "bitrot cell: hook OFF -> scan failed loud anyway "
            f"({type(ex).__name__}) — offset broke page structure; "
            "within doctrine"
        )

    encodings.enable_bitrot_detection(spark, enabled=True)
    try:
        h = scan()
    except Exception as ex:
        tail = str(ex).strip().splitlines()[-1:] or [""]
        print(
            f"bitrot cell: hook ON -> LOUD-OK ({type(ex).__name__}: "
            f"{tail[0][-200:]})"
        )
        print("BITROT CELL: PASS (fail-loud under verification)")
        return 0
    print(
        f"BITROT CELL: FAIL — hook ON scan returned hash {h}: a "
        "corrupted CRC-bearing page decoded without an error; the "
        "bitrot doctrine in encodings.py is broken on this build"
    )
    return 1


#: 256-bit modulus for the commutative multiset digest below.
_DIGEST_MOD = 1 << 256


def _row_line(row, order, canon) -> str:
    """Canonical line for one result row: cells in sorted-column-name
    order, joined on \\x01 — byte-identical to the line layout inside
    drive_contract.value_hash, so the two gates canonicalize alike."""
    return "\x01".join(canon(row[i]) for i in order)


def digest_rows(rows, cols) -> tuple[int, str]:
    """(row_count, 64-hex multiset digest) of an iterable of result
    rows. The digest is the SUM mod 2**256 of sha256(canonical line)
    over rows — commutative and associative, so it is row-order
    insensitive AND can be computed as per-partition partials on
    executors then merged (VERDICT r13 item 5: the previous compare
    collected full result sets to hash on the driver, ~4.6M rows for
    the sf0.1 gap-fill grid, forcing a 4g driver heap; partials return
    one row per partition so the default heap suffices and the probe
    composes with bigger SFs). Accidental collision of summed sha256
    digests is negligible; this is a parity gate, not an adversarial
    commitment."""
    import hashlib

    from catena_spark.parity import norm_cell as canon

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cnt, acc = 0, 0
    for r in rows:
        line = _row_line(r, order, canon)
        acc = (
            acc + int.from_bytes(hashlib.sha256(line.encode()).digest(), "big")
        ) % _DIGEST_MOD
        cnt += 1
    return cnt, format(acc, "064x")


def spark_digest(df, repo: str = REPO) -> tuple[int, str]:
    """(row_count, multiset digest) of a DataFrame, computed
    EXECUTOR-SIDE: each partition folds its rows into a (count, hex)
    partial inside the Python worker (Row cells carry the same Python
    types collect() would, so canonicalization matches digest_rows
    exactly), and only the numPartitions partials reach the driver.
    Row-at-a-time Python is fine here — this is probe harness code, not
    an operator; the win is O(partitions) driver memory instead of
    O(rows) JVM heap."""
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def part(rows):
        import hashlib
        import sys

        if repo not in sys.path:
            sys.path.insert(0, repo)
        from catena_spark.parity import norm_cell as canon

        cnt, acc = 0, 0
        for r in rows:
            line = _row_line(r, order, canon)
            acc = (
                acc
                + int.from_bytes(
                    hashlib.sha256(line.encode()).digest(), "big"
                )
            ) % _DIGEST_MOD
            cnt += 1
        yield (cnt, format(acc, "064x"))

    parts = df.rdd.mapPartitions(part).collect()
    cnt = sum(c for c, _ in parts)
    acc = sum(int(h, 16) for _, h in parts) % _DIGEST_MOD
    return cnt, format(acc, "064x")


def duck_digest(cur, batch: int = 50_000) -> tuple[list, int, str]:
    """(column names, row_count, multiset digest) of an executed DuckDB
    cursor, streamed via fetchmany so the probe's Python memory is
    bounded by the batch size, not the result size."""
    import hashlib

    from catena_spark.parity import norm_cell as canon

    ocols = [d[0] for d in cur.description]
    order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    cnt, acc = 0, 0
    while True:
        rows = cur.fetchmany(batch)
        if not rows:
            break
        for r in rows:
            line = _row_line(r, order, canon)
            acc = (
                acc
                + int.from_bytes(
                    hashlib.sha256(line.encode()).digest(), "big"
                )
            ) % _DIGEST_MOD
            cnt += 1
    return ocols, cnt, format(acc, "064x")


def oracle_view_source(sf_dir: str, table: str) -> str:
    """read_parquet path for one original table — ADVICE r13: the
    original may itself be a part-file DIRECTORY named {t}.parquet (the
    only shape at production scale, and exactly the layout the r13
    streaming bug writeup names); a bare read_parquet('{dir}') errors
    in DuckDB, so glob inside directories."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    return f"{src}/*.parquet" if os.path.isdir(src) else src


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    splits = int(os.environ.get("CATENA_PERMUTE_SPLITS", "1"))
    layout = os.environ.get("CATENA_PERMUTE_LAYOUT", "even")
    codec = os.environ.get("CATENA_PERMUTE_CODEC") or None
    rowgroup = int(os.environ.get("CATENA_PERMUTE_ROWGROUP", "0")) or None
    int96 = os.environ.get("CATENA_PERMUTE_INT96", "") == "1"
    colorder = os.environ.get("CATENA_PERMUTE_COLORDER") or None
    nodict = os.environ.get("CATENA_PERMUTE_NODICT", "") == "1"
    pagesize = int(os.environ.get("CATENA_PERMUTE_PAGESIZE", "0")) or None
    nostats = os.environ.get("CATENA_PERMUTE_NOSTATS", "") == "1"
    pagev2 = os.environ.get("CATENA_PERMUTE_PAGEV2", "") == "1"
    bss = os.environ.get("CATENA_PERMUTE_BSS", "") == "1"
    delta = os.environ.get("CATENA_PERMUTE_DELTA", "") == "1"
    drift = os.environ.get("CATENA_PERMUTE_DRIFT") or None
    drift_modes = _drift_modes(drift)
    drift_table = os.environ.get("CATENA_PERMUTE_DRIFT_TABLE", "orders")
    drift_col = os.environ.get("CATENA_PERMUTE_DRIFT_COL") or None
    list2 = os.environ.get("CATENA_PERMUTE_LIST2", "") == "1"
    bitrot = os.environ.get("CATENA_PERMUTE_BITROT", "") == "1"
    bitrot_table = os.environ.get(
        "CATENA_PERMUTE_BITROT_TABLE", "lineitem"
    )
    if drift_modes and splits < 2:
        splits = 2
        print(
            "permute_probe: DRIFT auto-raises SPLITS to 2 (odd "
            "part-files carry the drifted writer generation)"
        )
    if list2 and splits < 4:
        splits = 4
        print(
            "permute_probe: LIST2 auto-raises SPLITS to 4 (even "
            "part-file indices 0/2 carry the two legacy list layouts)"
        )
    if (bss or delta) and not nodict:
        # ADVICE r14: dictionary encoding takes precedence over BSS
        # (and over the DELTA encodings, r17) in the pyarrow writer,
        # so either knob without NODICT writes zero such pages — a
        # green run would claim coverage that never occurred
        nodict = True
        print(
            "permute_probe: BSS/DELTA auto-enables NODICT=1 (dictionary "
            "encoding precedence would leave the cell vacuous)"
        )
    perm_dir = permuted_copy(
        sf_dir, splits, layout, codec, rowgroup, int96, colorder,
        nodict, pagesize, nostats, pagev2, bss, delta,
        drift=drift, drift_table=drift_table, drift_col=drift_col,
        list2=list2, bitrot=bitrot,
    )
    if bss:
        _assert_bss_pages(perm_dir)
    if delta:
        _assert_delta_pages(perm_dir)
    print(
        f"permuted copy: {perm_dir} "
        f"(seed {SEED}, splits {splits}, layout {layout}, "
        f"codec {codec or 'default'}, rowgroup {rowgroup or 'default'}, "
        f"int96 {int96}, colorder {colorder or 'original'}, "
        f"nodict {nodict}, pagesize {pagesize or 'default'}, "
        f"nostats {nostats}, pagev2 {pagev2}, bss {bss}, "
        f"delta {delta}, "
        f"drift {drift or 'none'}, list2 {list2}, bitrot {bitrot})"
    )
    if drift_modes:
        # the probe pins the MITIGATED contract: tables.load routes
        # through read_drifted's footer-derived superset schema (the
        # doctrine for multi-generation directories). Spark's
        # UNMITIGATED behavior on these bytes — fail-loud type
        # mismatch, or a column silently vanishing on footer-sampling
        # luck, never wrong values — is pinned by the unit matrix in
        # tests/test_sources.py instead.
        os.environ["CATENA_SCHEMA_DRIFT_SAFE"] = "1"
        print(
            "permute_probe: CATENA_SCHEMA_DRIFT_SAFE=1 (drift run — "
            "tables.load pins the footer-derived superset schema)"
        )
    if "rename" in drift_modes:
        # rename is value-preserving AFTER healing: read_drifted's
        # field-id resolution reads the renamed generation back under
        # the majority (original) name, so the healed Spark read must
        # equal the ORIGINAL bytes — the oracle below stays on the
        # original tables, a stronger check than null-fill parity.
        # Composing rename with LIST2 on a LIST-bearing drift_table is
        # unsupported-loud: the legacy rewrite strips field ids, so
        # read_drifted refuses the partially-stamped directory.
        print(
            "permute_probe: rename drift heals by field id — oracle "
            "stays on ORIGINAL bytes (healed read must equal ground "
            "truth)"
        )

    # Contention sentinel (r14): a foreign Spark JVM sharing the CPUs
    # can wedge streaming awaitTermination bounds and slow stages into
    # timeouts — spurious ERROR lines, not hash flips (the r14 first
    # composed sf0.1 run failed 6 keys while a preflight JVM overlapped
    # it; the idle re-run was 165/165). A PASS under contention is
    # still a pass (hash equality is load-independent); a FAILURE must
    # carry the contention context so it adjudicates without a re-run.
    from bench import _concurrent_spark_pids

    contended_pre = _concurrent_spark_pids()
    if contended_pre:
        print(
            f"permute_probe: WARNING {len(contended_pre)} concurrent "
            f"Spark JVM(s) (pids {contended_pre}) — failures below may "
            "be contention artifacts (timeouts/OOM), not "
            "order-sensitivity; re-run failed keys on an idle machine"
        )

    import duckdb
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("permute-probe")
        .config("spark.sql.shuffle.partitions", "8")
        # hostile on purpose, like drive_contract: the package must
        # repin parity conf itself
        .config("spark.sql.session.timeZone", "America/New_York")
    )
    # Executor-side digesting (spark_digest) keeps driver traffic at
    # one row per partition, so the DEFAULT heap suffices even for the
    # sf0.1 full contract (VERDICT r13 item 5 — this env override is
    # retained only as an escape hatch for debugging).
    if os.environ.get("CATENA_PERMUTE_DRIVER_MEM"):
        builder = builder.config(
            "spark.driver.memory", os.environ["CATENA_PERMUTE_DRIVER_MEM"]
        )
    if bss:
        # Spark 4.1.2's vectorized reader rejects BYTE_STREAM_SPLIT
        # pages outright (fail-loud; see the knob comment in
        # permuted_copy) — parity through BSS bytes is only checkable
        # via the row-based reader, which is also the production
        # mitigation for BSS-bearing third-party partitions
        builder = builder.config(
            "spark.sql.parquet.enableVectorizedReader", "false"
        )
    spark = builder.getOrCreate()

    if list2:
        # the rewrite needs a Spark writer (pyarrow cannot emit legacy
        # list layouts) — same JVM, before any key or oracle view reads
        # the copy's bytes
        files = legacy_list_rewrite(spark, perm_dir)
        # composed with the missing-ARRAY drift, odd (modern) parts
        # legitimately lack the list column, so no modern layout can
        # exist beside the legacy ones — waive exactly that shape
        dropped_list = False
        if "missing" in drift_modes:
            import glob as _glob

            import pyarrow as _pa
            import pyarrow.parquet as _pq

            _src = os.path.join(sf_dir, f"{drift_table}.parquet")
            if os.path.isdir(_src):
                _src = sorted(_glob.glob(os.path.join(_src, "*.parquet")))[0]
            _sch = _pq.read_schema(_src)
            _col = drift_col or _sch.names[-1]
            if _col in _sch.names:
                _t = _sch.field(_col).type
                dropped_list = _pa.types.is_list(_t) or _pa.types.is_large_list(_t)
        _assert_legacy_list_layouts(perm_dir, expect_modern=not dropped_list)
        print(
            f"permute_probe: LIST2 rewrote {len(files)} even part-"
            "file(s) into legacy list layouts (2-level + bag) — "
            "layout assert passed"
            + (" (modern waived: missing drift drops the list column "
               "from odd parts)" if dropped_list else "")
        )

    if bitrot:
        # the bitrot cell is a NEGATIVE test (the copy is deliberately
        # corrupted) — it replaces the parity run entirely; parity keys
        # on corrupted bytes would be meaningless
        return _bitrot_cell(spark, perm_dir, bitrot_table)

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    keys = args or [k for k in qs if k in oracles]
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"permute_probe: not registry keys: {unknown}")
    rows_only = [k for k in keys if k not in oracles]
    for k in rows_only:
        # a rows-only key (declared no-oracle) rotates through the
        # driver window like any other — it can't be hash-compared, so
        # note it rather than abort the stage or miscount a failure
        print(f"{k}: SKIP (rows-only key, no oracle to compare)")
    keys = [k for k in keys if k in oracles]

    con = duckdb.connect()
    if "missing" in drift_modes:
        # missing-column drift is NOT value-preserving (dropped cells
        # must surface as NULL) — the original-bytes oracle would
        # mismatch by construction. Point DuckDB at the SAME drifted
        # bytes with union_by_name=true (its superset-schema read):
        # the compare becomes engine-vs-engine null-fill parity, which
        # is exactly the semantics the axis exists to pin. widen-only
        # drift stays on the original oracle (values are preserved;
        # only the physical int width moves).
        # composed with binstr, odd parts carry unannotated BYTE_ARRAY
        # string columns — DuckDB's union binds them BLOB and every
        # string function in the oracle SQL throws BinderException
        # (caught live by the first sf0.1 missing+binstr capstone).
        # binary_as_string=true is DuckDB's OWN legacy knob for exactly
        # these bytes (doctrine class 5) — the oracle must read the
        # drifted copy the way the doctrine prescribes reading it.
        bas = ", binary_as_string=true" if "binstr" in drift_modes else ""
        print(
            "permute_probe: oracle reads the DRIFTED copy "
            f"(union_by_name=true{bas}) — null-fill parity mode"
        )
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{oracle_view_source(perm_dir, t)}', "
                f"union_by_name=true{bas})"
            )
    else:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{oracle_view_source(sf_dir, t)}')"
            )

    failures: list[str] = []
    for key in keys:
        try:
            df = qs[key](spark, perm_dir)
            cols = df.columns
            n, h = spark_digest(df)
            ocols, on, oh = duck_digest(con.execute(oracles[key]))
            ok_rows = n == on
            ok_cols = sorted(cols) == sorted(ocols)
            ok_hash = ok_cols and h == oh
            status = "HASH-OK" if (ok_rows and ok_hash) else (
                f"MISMATCH rows={n}/{on} "
                f"cols_ok={ok_cols} hash_ok={ok_hash}"
            )
        except Exception as ex:
            # ADVICE r13: truncating str(ex) to 200 chars cut off long
            # Python-side messages (the adjudication-without-re-run
            # problem the root-cause suffix solves for Py4J) — keep the
            # type name intact and take the LAST line of the message,
            # where Python tracebacks and Spark error classes put the
            # operative clause.
            tail = str(ex).strip().splitlines()[-1:] or [""]
            status = f"ERROR {type(ex).__name__}: {tail[0][-400:]}"
            # Py4J wraps the real failure ("Boxed Exception" futures,
            # broadcast timeouts) several causes deep — surface the
            # root so a probe log is adjudicable without a re-run
            je = getattr(ex, "java_exception", None)
            try:
                while je is not None and je.getCause() is not None:
                    je = je.getCause()
                if je is not None:
                    status += f" | root: {je.toString()}"[:300]
            except Exception:
                pass
        print(f"{key}: {status}", flush=True)
        if not status.startswith("HASH-OK"):
            failures.append(key)

    print(
        f"PERMUTE PROBE: {len(keys)} keys, {len(failures)} "
        f"order-sensitive/failed"
    )
    if failures:
        for k in failures:
            print(f"  ORDER-SENSITIVE {k}")
        contended = sorted(
            set(contended_pre) | set(_concurrent_spark_pids(exclude_own=True))
        )
        if contended:
            print(
                f"NOTE: {len(contended)} foreign Spark JVM(s) (pids "
                f"{contended}) shared this machine during the run — "
                "re-run the failed keys idle before treating them as "
                "order-sensitive"
            )
        return 1
    print("RESULT: ALL-MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
