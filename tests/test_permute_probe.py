"""The permutation probe's own teeth (scripts/permute_probe.py, r13).

The probe's premise is "same multiset, different on-disk order". If a
future edit broke either half, the probe would go silently vacuous
(order unchanged: it tests nothing new) or false-red (multiset
changed: every key 'fails'). Pin both halves, plus seed-determinism so
two runs of the probe compare the same permuted bytes (the playbook
rule: when a fixture exists to catch a bug class, assert the fixture's
own teeth inside a test)."""

from __future__ import annotations

import importlib.util
import os

import pyarrow.parquet as pq

from tests.conftest import SF_SMALL

_spec = importlib.util.spec_from_file_location(
    "permute_probe",
    os.path.join(
        os.path.dirname(__file__), "..", "scripts", "permute_probe.py"
    ),
)
permute_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(permute_probe)


# ADVICE r14: every teeth-test copy is written under pytest's tmp_path
# (permuted_copy(out_base=...)), so a teeth run on the SAME source with
# the same knobs can never rebuild a live /tmp probe copy mid-read —
# the second half of the r14 copy-path collision class.


def test_permuted_copy_preserves_multiset_and_changes_order(tmp_path):
    out_dir = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    changed_any = False
    for t in permute_probe.TABLES:
        src = pq.read_table(os.path.join(SF_SMALL, f"{t}.parquet"))
        dst = pq.read_table(os.path.join(out_dir, f"{t}.parquet"))
        assert src.schema.remove_metadata() == dst.schema.remove_metadata()
        assert src.num_rows == dst.num_rows
        srows = sorted(map(str, src.to_pylist()))
        drows = sorted(map(str, dst.to_pylist()))
        assert srows == drows, f"{t}: permutation changed the multiset"
        if src.num_rows > 1 and src.to_pylist() != dst.to_pylist():
            changed_any = True
    # the probe is vacuous if the permutation is (or collapses to) the
    # identity — with 500+-row tables a seeded shuffle landing on the
    # identity means the shuffle is broken, not unlucky
    assert changed_any, "permuted copy kept the original row order"


def test_permuted_copy_multifile_split_preserves_multiset(tmp_path):
    """splits > 1 writes each table as a part-file DIRECTORY; the
    multiset and the (sliced) permuted order must both survive, and
    the layout must actually be multi-file."""
    out_dir = permute_probe.permuted_copy(
        SF_SMALL, splits=7, out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(
        SF_SMALL, splits=1, out_base=str(tmp_path)
    )
    for t in ("lineitem", "documents", "region"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        ref = pq.read_table(os.path.join(single, f"{t}.parquet"))
        got = pq.read_table(dst)
        if ref.num_rows >= 7:
            assert os.path.isdir(dst) and len(os.listdir(dst)) == 7
        # contiguous slicing: the multi-file read-back in part order
        # equals the single-file permuted order exactly
        assert got.to_pylist() == ref.to_pylist()


def test_permuted_copy_empty_layout_interleaves_zero_row_parts(tmp_path):
    """layout=empty (r14): every table becomes a directory whose FIRST
    and LAST part-files are zero-row schema-only parquet (plus one in
    the middle) — the compaction-remainder shape; the multiset and the
    permuted read-back order must survive untouched."""
    out_dir = permute_probe.permuted_copy(
        SF_SMALL, splits=7, layout="empty", out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    for t in ("lineitem", "documents", "region"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        assert os.path.isdir(dst), f"{t}: empty layout must be a directory"
        parts = sorted(os.listdir(dst))
        sizes = [
            pq.read_table(os.path.join(dst, p)).num_rows for p in parts
        ]
        assert sizes[0] == 0 and sizes[-1] == 0 and sizes.count(0) >= 3, (
            f"{t}: expected zero-row parts at front/middle/end, got {sizes}"
        )
        ref = pq.read_table(os.path.join(single, f"{t}.parquet"))
        got = pq.read_table(dst)
        assert got.schema.remove_metadata() == ref.schema.remove_metadata()
        assert got.to_pylist() == ref.to_pylist(), (
            f"{t}: empty layout changed the multiset or the sliced order"
        )


def test_permuted_copy_skew_layout_front_loads_rows(tmp_path):
    """layout=skew (r14): the first part-file carries ~90% of the rows
    — one scan task sees nearly everything, the rest see crumbs (some
    legitimately zero-row); multiset and order must be layout-
    invariant."""
    out_dir = permute_probe.permuted_copy(
        SF_SMALL, splits=7, layout="skew", out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    for t in ("lineitem", "documents"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        assert os.path.isdir(dst)
        parts = sorted(os.listdir(dst))
        sizes = [
            pq.read_table(os.path.join(dst, p)).num_rows for p in parts
        ]
        total = sum(sizes)
        assert total > 7 and sizes[0] >= int(total * 0.85), (
            f"{t}: first part should hold ~90% of rows, got {sizes}"
        )
        ref = pq.read_table(os.path.join(single, f"{t}.parquet"))
        assert pq.read_table(dst).to_pylist() == ref.to_pylist()


def test_permuted_copy_write_encoding_changes_bytes_not_values(tmp_path):
    """Write-encoding sub-axis (r14): codec / row-group size / INT96
    timestamps must change the parquet BYTES only — values, schema
    LOGICAL types, and permuted order identical to the default-encoded
    copy; and the knobs must demonstrably take effect (else the axis
    is vacuous)."""
    import pyarrow as pa

    base = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    enc = permute_probe.permuted_copy(
        SF_SMALL, codec="zstd", rowgroup=64, int96=True,
        nodict=True, pagesize=1024, nostats=True, pagev2=True,
        bss=True, out_base=str(tmp_path),
    )
    # ADVICE r14: the post-write physical check must PASS on a real BSS
    # copy (its raising half is pinned separately below)
    permute_probe._assert_bss_pages(enc)
    assert enc != base, "encoded copy must not share the default dir"
    for t in ("events", "lineitem", "region"):
        ref = pq.read_table(os.path.join(base, f"{t}.parquet"))
        f = pq.ParquetFile(os.path.join(enc, f"{t}.parquet"))
        meta = f.metadata
        assert meta.row_group(0).column(0).compression == "ZSTD"
        # nodict: no dictionary pages anywhere — plain decode path
        assert not any(
            "DICTIONARY" in e
            for e in meta.row_group(0).column(0).encodings
        ), f"{t}: nodict knob did not take effect"
        # nostats: statistics physically absent from the chunk metadata
        assert meta.row_group(0).column(0).statistics is None, (
            f"{t}: nostats knob did not take effect"
        )
        if ref.num_rows > 64:
            assert meta.num_row_groups >= ref.num_rows // 64, (
                f"{t}: rowgroup cap did not take effect"
            )
        got = f.read()
        # INT96 round-trips to ns precision — compare at the logical
        # value level (cast back to the reference type)
        assert got.cast(ref.schema).to_pylist() == ref.to_pylist(), (
            f"{t}: write encoding changed values or order"
        )
    # bss: BYTE_STREAM_SPLIT physically present on a float leaf — both
    # a top-level double (lineitem) and the embeddings vector elements
    for t, leaf in (("lineitem", None), ("embeddings", ".list.element")):
        m = pq.ParquetFile(os.path.join(enc, f"{t}.parquet")).metadata
        rg = m.row_group(0)
        hits = [
            rg.column(i)
            for i in range(rg.num_columns)
            if (leaf is None or rg.column(i).path_in_schema.endswith(leaf))
            and "BYTE_STREAM_SPLIT" in rg.column(i).encodings
        ]
        assert hits, f"{t}: bss knob did not take effect"
    # the int96 knob actually produced INT96 on a timestamp column
    ev = pq.ParquetFile(os.path.join(enc, "events.parquet"))
    ts_idx = [
        i for i, fld in enumerate(ev.schema_arrow)
        if pa.types.is_timestamp(fld.type)
    ]
    assert ts_idx, "events fixture must have a timestamp column"
    assert ev.metadata.row_group(0).column(ts_idx[0]).physical_type == (
        "INT96"
    )


def test_permuted_copy_path_is_keyed_by_source_dir(tmp_path):
    """r14 forensics: the copy path must embed the SOURCE dir's name —
    a teeth-test rebuild at sf0.001 clobbered a live sf0.01 probe's
    copy mid-run (same seed/splits/layout => same path), producing 17
    spurious MISMATCHes. ADVICE r14 tightened it: two DIFFERENT dirs
    with the SAME basename must also never share a path (the key now
    includes a hash of the absolute source path)."""
    import pyarrow as pa

    def mk(d):
        d.mkdir(parents=True)
        for t in permute_probe.TABLES:
            pq.write_table(
                pa.table({"x": [1, 2, 3]}), str(d / f"{t}.parquet")
            )

    other = tmp_path / "sfX"
    mk(other)
    out = tmp_path / "out"
    p_small = permute_probe.permuted_copy(SF_SMALL, out_base=str(out))
    p_other = permute_probe.permuted_copy(str(other), out_base=str(out))
    assert p_small != p_other
    assert os.path.basename(os.path.normpath(SF_SMALL)) in p_small
    assert "sfX" in p_other
    # same basename, different parent dir — the ADVICE r14 collision
    twin = tmp_path / "twin" / "sfX"
    mk(twin)
    p_twin = permute_probe.permuted_copy(str(twin), out_base=str(out))
    assert p_twin != p_other, "same-basename sources must not share a path"
    # and out_base is honored, so pytest copies never land in /tmp
    assert p_small.startswith(str(out)) and p_twin.startswith(str(out))


def test_bss_columns_walks_nested_schemas():
    """ADVICE r14: _bss_columns must find EVERY floating-point leaf —
    floats nested inside structs, maps, and list<struct> included — in
    the dotted-path notation the pyarrow writer accepts, so a fixture
    schema evolving nested floats can never silently narrow the BSS
    cell's coverage. Round-trip through an actual write proves the
    paths are writer-valid, not just string-plausible."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("f", pa.float64()),
            ("i", pa.int64()),
            ("s", pa.struct([("a", pa.float32()),
                             ("b", pa.list_(pa.float64())),
                             ("t", pa.string())])),
            ("m", pa.map_(pa.string(), pa.float32())),
            ("ls", pa.list_(pa.struct([("x", pa.float64())]))),
            ("v", pa.list_(pa.float32())),
        ]
    )
    assert permute_probe._bss_columns(schema) == [
        "f",
        "s.a",
        "s.b.list.element",
        "m.key_value.value",
        "ls.list.element.x",
        "v.list.element",
    ]
    # no floats anywhere -> no paths (the all-string/int TPC-H tables)
    assert permute_probe._bss_columns(
        pa.schema([("k", pa.int64()), ("s", pa.string())])
    ) == []


def test_assert_bss_pages_raises_on_vacuous_copy(tmp_path):
    """ADVICE r14: BSS=1 without nodict wrote ZERO BSS pages (dictionary
    precedence) yet printed bss=True — the physical post-write check
    must catch exactly that: a copy whose float leaves are dictionary-
    encoded fails loudly."""
    import pyarrow as pa

    import pytest

    for t in permute_probe.TABLES:
        pq.write_table(
            pa.table({"v": pa.array([1.5, 2.5, 1.5] * 40, pa.float64())}),
            str(tmp_path / f"{t}.parquet"),
            use_dictionary=True,  # dictionary wins; no BSS pages
            use_byte_stream_split=["v"],
        )
    with pytest.raises(AssertionError, match="vacuous"):
        permute_probe._assert_bss_pages(str(tmp_path))


def test_permuted_copy_colorder_changes_physical_order_not_values(tmp_path):
    """COLORDER sub-axis (r14): reversed flips every file's physical
    field order; mixed alternates original/reversed between part-files
    of one table (writer-generation schema drift). Values and row
    order must be identical to the default copy once columns are
    matched BY NAME — and the drift must physically exist on disk."""
    base = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    rev = permute_probe.permuted_copy(
        SF_SMALL, colorder="reversed", out_base=str(tmp_path)
    )
    mix = permute_probe.permuted_copy(
        SF_SMALL, splits=4, colorder="mixed", out_base=str(tmp_path)
    )
    assert len({base, rev, mix}) == 3, "colorder dirs must not collide"
    for t in ("lineitem", "region"):
        ref = pq.read_table(os.path.join(base, f"{t}.parquet"))
        r = pq.read_table(os.path.join(rev, f"{t}.parquet"))
        assert r.column_names == list(reversed(ref.column_names))
        assert r.select(ref.column_names).to_pylist() == ref.to_pylist()
        mdst = os.path.join(mix, f"{t}.parquet")
        assert os.path.isdir(mdst), "mixed must force a directory"
        parts = sorted(os.listdir(mdst))
        orders = {
            tuple(pq.ParquetFile(os.path.join(mdst, p)).schema_arrow.names)
            for p in parts
            if pq.ParquetFile(os.path.join(mdst, p)).metadata.num_rows > 0
        }
        if len(parts) >= 2 and ref.num_rows >= 4:
            assert len(orders) == 2, (
                f"{t}: mixed layout should contain both field orders"
            )
        got = pq.read_table(mdst)
        assert got.select(ref.column_names).to_pylist() == ref.to_pylist()


def test_layout_slices_are_contiguous_and_exhaustive():
    """The slicing kernel itself: for every (n, splits, layout) cell the
    slices must tile [0, n) contiguously in order — that property IS
    what makes the probe's multiset claim layout-invariant."""
    for n in (0, 1, 5, 720, 60_175):
        for splits in (1, 2, 7, 13):
            for layout in permute_probe.LAYOUTS:
                slices = permute_probe._layout_slices(n, splits, layout)
                pos = 0
                for off, ln in slices:
                    assert ln >= 0 and off == pos, (
                        f"n={n} splits={splits} {layout}: gap at {off}"
                    )
                    pos += ln
                assert pos == n, (
                    f"n={n} splits={splits} {layout}: covers {pos}"
                )


def test_multiset_digest_is_order_insensitive_and_value_sensitive():
    """VERDICT r13 item 5 teeth: the executor-side digest must keep the
    probe's semantics — same multiset => same digest regardless of row
    order OR column order; any single cell change flips it."""
    rows = [(1, "a", 2.5), (2, "b", float("nan")), (None, "c", -0.0)]
    cols = ["k", "s", "v"]
    n, h = permute_probe.digest_rows(rows, cols)
    assert n == 3
    assert permute_probe.digest_rows(list(reversed(rows)), cols) == (n, h)
    # column order permuted WITH the cells: same logical rows
    swapped = [(r[1], r[0], r[2]) for r in rows]
    assert permute_probe.digest_rows(swapped, ["s", "k", "v"]) == (n, h)
    # -0.0 folds into 0.0 (norm_cell rule) — same digest
    folded = [rows[0], rows[1], (None, "c", 0.0)]
    assert permute_probe.digest_rows(folded, cols) == (n, h)
    # a single changed cell flips the digest but not the count
    mutated = [rows[0], rows[1], (None, "c", 1.0)]
    n2, h2 = permute_probe.digest_rows(mutated, cols)
    assert n2 == 3 and h2 != h
    assert permute_probe.digest_rows([], cols) == (0, "0" * 64)


def test_spark_and_duck_digests_agree_with_reference(spark):
    """The three digest paths (pure-python reference, executor-side
    partials, streamed DuckDB cursor) must produce identical (count,
    digest) for the same logical result — that identity IS the probe's
    compare, so pin it on a multi-partition DataFrame with the tricky
    cell types (null, float, timestamp-free)."""
    import duckdb

    rows = [(i, f"s{i % 3}", float(i) / 4 if i % 5 else None)
            for i in range(200)]
    cols = ["k", "s", "v"]
    ref = permute_probe.digest_rows(rows, cols)
    df = spark.createDataFrame(rows, "k int, s string, v double").repartition(7)
    assert df.rdd.getNumPartitions() > 1
    assert permute_probe.spark_digest(df) == ref
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k int, s varchar, v double)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ocols, on, oh = permute_probe.duck_digest(
        con.execute("SELECT * FROM t"), batch=32
    )
    assert ocols == cols and (on, oh) == ref


def test_oracle_view_source_handles_directory_tables(tmp_path):
    """ADVICE r13: an original table may be a part-file DIRECTORY named
    {t}.parquet — the production shape; the oracle view must glob
    inside it instead of erroring on every key."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "orders.parquet"
    d.mkdir()
    pq.write_table(pa.table({"x": [1, 2]}), str(d / "part-0.parquet"))
    pq.write_table(pa.table({"x": [3]}), str(d / "part-1.parquet"))
    f = tmp_path / "region.parquet"
    pq.write_table(pa.table({"x": [9]}), str(f))
    src_dir = permute_probe.oracle_view_source(str(tmp_path), "orders")
    src_file = permute_probe.oracle_view_source(str(tmp_path), "region")
    assert src_dir.endswith("/*.parquet") and src_file == str(f)
    con = duckdb.connect()
    assert con.execute(
        f"SELECT count(*) FROM read_parquet('{src_dir}')"
    ).fetchone()[0] == 3
    assert con.execute(
        f"SELECT count(*) FROM read_parquet('{src_file}')"
    ).fetchone()[0] == 1


def test_permuted_copy_widen_drift_widens_odd_parts_only(tmp_path):
    """DRIFT sub-axis (r15): drift='widen' must physically widen every
    top-level int8/16/32 column to int64 in ODD part-files only, leave
    even parts at the original width (both writer generations exist),
    and preserve the VALUE multiset exactly — the axis is vacuous
    without the physical split and false-red if a value moves."""
    import pyarrow as pa

    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="widen", out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    saw_drift = False
    for t, col in (("customer", "c_nationkey"), ("lineitem", "l_linenumber"),
                   ("embeddings", "label")):
        dst = os.path.join(out, f"{t}.parquet")
        assert os.path.isdir(dst), f"{t}: drift-affected must be a directory"
        parts = sorted(os.listdir(dst))
        assert len(parts) >= 2
        rows = []
        for i, p in enumerate(parts):
            pt = pq.read_table(os.path.join(dst, p))
            typ = pt.schema.field(col).type
            if i % 2 == 1:
                assert typ == pa.int64(), f"{t} part {i}: {col} not widened"
                saw_drift = True
            else:
                assert typ == pa.int32(), f"{t} part {i}: {col} drifted"
            rows += pt.to_pylist()
        ref = pq.read_table(os.path.join(single, f"{t}.parquet")).to_pylist()
        assert rows == ref, f"{t}: widen drift changed values or order"
    assert saw_drift
    # a table with no narrow ints is untouched by widen drift: every
    # part-file keeps the identical (unwidened) schema
    odir = os.path.join(out, "orders.parquet")
    oschemas = {
        str(pq.read_schema(os.path.join(odir, p)).remove_metadata())
        for p in sorted(os.listdir(odir))
    }
    assert len(oschemas) == 1 and "int64" in oschemas.pop()


def test_permuted_copy_missing_drift_drops_column_in_odd_parts(tmp_path):
    """drift='missing': odd part-files of the drift table are written
    WITHOUT the designated column (default: the last one) — the
    older-writer shape; even parts keep it; every other cell of every
    row survives; other tables are untouched."""
    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="missing", out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    ref = pq.read_table(os.path.join(single, "orders.parquet"))
    drop = ref.column_names[-1]
    assert drop == "o_orderpriority"  # FIXTURES.md orders schema
    dst = os.path.join(out, "orders.parquet")
    assert os.path.isdir(dst)
    parts = sorted(os.listdir(dst))
    rows, refrows = [], ref.to_pylist()
    for i, p in enumerate(parts):
        pt = pq.read_table(os.path.join(dst, p))
        if i % 2 == 1:
            assert drop not in pt.column_names, f"part {i} kept {drop}"
        else:
            assert drop in pt.column_names, f"part {i} lost {drop}"
        rows += pt.to_pylist()
    for got, want in zip(rows, refrows):
        want = dict(want)
        if drop not in got:
            want.pop(drop)
        assert got == want
    assert len(rows) == len(refrows)
    # only the drift table is affected: every events part keeps the
    # full column set
    edir = os.path.join(out, "events.parquet")
    ecols = {
        tuple(sorted(pq.read_schema(os.path.join(edir, p)).names))
        for p in sorted(os.listdir(edir))
    }
    assert len(ecols) == 1 and "props" in ecols.pop()


def test_permuted_copy_drift_validation_and_composition(tmp_path):
    """Drift knob hostility: bad modes / splits=1 / unknown column fail
    loudly; and the axis composes with skew layout + mixed colorder +
    bss without corrupting the multiset (the stress matrix runs exactly
    such composed cells)."""
    import pytest

    with pytest.raises(ValueError, match="drift modes"):
        permute_probe.permuted_copy(
            SF_SMALL, splits=2, drift="sideways", out_base=str(tmp_path)
        )
    with pytest.raises(ValueError, match="splits >= 2"):
        permute_probe.permuted_copy(
            SF_SMALL, splits=1, drift="widen", out_base=str(tmp_path)
        )
    with pytest.raises(ValueError, match="not in orders columns"):
        permute_probe.permuted_copy(
            SF_SMALL, splits=2, drift="missing", drift_col="nope",
            out_base=str(tmp_path),
        )
    out = permute_probe.permuted_copy(
        SF_SMALL, splits=5, layout="skew", colorder="mixed",
        nodict=True, bss=True, drift="widen,missing",
        out_base=str(tmp_path),
    )
    permute_probe._assert_bss_pages(out)
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    for t in ("orders", "lineitem"):
        ref = pq.read_table(os.path.join(single, f"{t}.parquet"))
        dst = os.path.join(out, f"{t}.parquet")
        got = []
        for p in sorted(os.listdir(dst)):
            got += pq.read_table(os.path.join(dst, p)).to_pylist()
        for g, w in zip(got, ref.to_pylist()):
            w = dict(w)
            if t == "orders" and "o_orderpriority" not in g:
                w.pop("o_orderpriority")
            assert g == w, f"{t}: composed drift changed a value"
        assert len(got) == ref.num_rows


def test_permuted_copy_is_seed_deterministic(tmp_path):
    """Two builds must produce identical bytes-level row orders, so a
    mismatch reported by the probe is reproducible, not a dice roll."""
    out_dir = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    first = pq.read_table(
        os.path.join(out_dir, "documents.parquet")
    ).to_pylist()
    out_dir2 = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    second = pq.read_table(
        os.path.join(out_dir2, "documents.parquet")
    ).to_pylist()
    assert first == second


def test_permuted_copy_mixed_codecs_within_one_table(tmp_path):
    """codec='mixed' (r15, widened to four codecs r16): part-files of
    ONE table cycle snappy/zstd/gzip/lz4 — the per-writer-generation
    compression drift a long-lived directory contains (parquet stores
    the codec per column chunk, so this must be a pure decode-dispatch
    concern). All four codecs must physically appear and the multiset
    survive exactly. Brotli is deliberately NOT in the cycle: Spark
    4.1.2 ships no BrotliCodec (fail-loud page decode, teeth-pinned in
    test_sources.py)."""
    out = permute_probe.permuted_copy(
        SF_SMALL, splits=8, codec="mixed", out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    for t in ("lineitem", "documents"):
        dst = os.path.join(out, f"{t}.parquet")
        assert os.path.isdir(dst), f"{t}: mixed codecs must force a dir"
        parts = sorted(os.listdir(dst))
        codecs, rows = [], []
        for p in parts:
            f = pq.ParquetFile(os.path.join(dst, p))
            codecs.append(f.metadata.row_group(0).column(0).compression)
            rows += f.read().to_pylist()
        assert {"SNAPPY", "ZSTD", "GZIP", "LZ4"} <= set(codecs), (
            f"{t}: expected all four codecs, got {codecs}"
        )
        ref = pq.read_table(os.path.join(single, f"{t}.parquet"))
        assert rows == ref.to_pylist(), f"{t}: codec mix changed values"
    # a table smaller than splits still gets >= 2 parts so the mix exists
    rdir = os.path.join(out, "region.parquet")
    assert os.path.isdir(rdir) and len(os.listdir(rdir)) >= 2


def test_permuted_copy_widen_nested_drift_widens_float_leaves(tmp_path):
    """drift='widen_nested' (r16, VERDICT r15 item 4): odd part-files
    must physically carry list<double> where even parts keep the
    original list<float> — the writer-dtype-upgrade generation mix an
    embedding corpus accumulates — with the value multiset preserved
    EXACTLY (float->double is binary-exact), and tables without a
    float32 leaf untouched."""
    import pyarrow as pa

    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="widen_nested", out_base=str(tmp_path)
    )
    single = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    dst = os.path.join(out, "embeddings.parquet")
    assert os.path.isdir(dst), "embeddings must be a drift directory"
    parts = sorted(os.listdir(dst))
    assert len(parts) >= 2
    rows = []
    saw_drift = False
    for i, p in enumerate(parts):
        pt = pq.read_table(os.path.join(dst, p))
        typ = pt.schema.field("embedding").type
        if i % 2 == 1:
            assert typ == pa.list_(pa.float64()), f"part {i} not widened"
            saw_drift = True
        else:
            assert typ.value_type == pa.float32(), f"part {i} drifted"
        # compare through a common (widened) schema — float->double cast
        # of the even parts must reproduce the odd-part representation
        rows += pt.cast(
            pa.schema(
                [
                    (f.name, permute_probe._widen_nested_type(f.type))
                    for f in pt.schema
                ]
            )
        ).to_pylist()
    assert saw_drift
    ref = (
        pq.read_table(os.path.join(single, "embeddings.parquet"))
        .cast(
            pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float64())),
                    ("label", pa.int32()),
                ]
            )
        )
        .to_pylist()
    )
    assert rows == ref, "widen_nested changed values or order"
    # no float32 leaf in lineitem: every part keeps one identical schema
    ldir = os.path.join(out, "lineitem.parquet")
    lschemas = {
        str(pq.read_schema(os.path.join(ldir, p)).remove_metadata())
        for p in sorted(os.listdir(ldir))
    }
    assert len(lschemas) == 1


def test_permuted_copy_missing_drift_on_array_column(tmp_path):
    """The r16 ArrayType null-fill target: drift='missing' with
    DRIFT_TABLE=embeddings DRIFT_COL=embedding drops the ARRAY column
    from odd parts — and the output path is keyed by drift_col
    (ADVICE r15: two runs differing only in DRIFT_COL must never share
    a copy path)."""
    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="missing", drift_table="embeddings",
        drift_col="embedding", out_base=str(tmp_path),
    )
    out_default = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="missing", drift_table="embeddings",
        out_base=str(tmp_path),
    )
    assert out != out_default, "copy path must be keyed by drift_col"
    dst = os.path.join(out, "embeddings.parquet")
    parts = sorted(os.listdir(dst))
    assert len(parts) >= 2
    for i, p in enumerate(parts):
        names = pq.read_schema(os.path.join(dst, p)).names
        if i % 2 == 1:
            assert "embedding" not in names, f"part {i} kept embedding"
        else:
            assert "embedding" in names, f"part {i} lost embedding"


def test_list2_legacy_layouts_roundtrip(spark, tmp_path):
    """r17 (VERDICT r16 item 4): the legacy parquet LIST layout axis.
    permuted_copy(list2=True) + legacy_list_rewrite must leave one
    directory holding all three list writer generations — TRUE
    two-level (``repeated float array`` directly under the LIST
    group), legacy three-level ``bag { optional float array }``, and
    modern ``list { element }`` — with the VALUES exactly preserved:
    Spark plain read, DuckDB union_by_name, and read_drifted's
    footer-derived superset schema must all equal the original table.
    If Spark or DuckDB ever stopped decoding a legacy layout exactly,
    or the merge lattice stopped reconciling ``list<array: float>``
    with ``list<element: float>``, this is the tripwire."""
    import duckdb

    from catena_spark.sources import encodings

    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, list2=True, out_base=str(tmp_path)
    )
    files = permute_probe.legacy_list_rewrite(spark, out)
    assert files, "no part-file was rewritten — vacuous cell"
    permute_probe._assert_legacy_list_layouts(out)

    d = os.path.join(out, "embeddings.parquet")

    def paths(part):
        desc = pq.ParquetFile(os.path.join(d, part)).metadata.schema
        return {desc.column(i).path for i in range(len(desc))}

    parts = sorted(os.listdir(d))
    assert "embedding.array" in paths(parts[0])  # TRUE 2-level (i=0)
    assert "embedding.list.element" in paths(parts[1])  # modern (i=1)
    assert "embedding.bag.array" in paths(parts[2])  # legacy bag (i=2)

    digest = (
        "sum(hash(vec_id, embedding, label)) AS h",
        "count(*) AS n",
        "sum(cast(element_at(embedding, 1) as double)) AS s",
    )
    orig = (
        spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))
        .selectExpr(*digest)
        .collect()[0]
    )
    got = spark.read.parquet(d).selectExpr(*digest).collect()[0]
    assert (got.h, got.n, got.s) == (orig.h, orig.n, orig.s)

    rd = encodings.read_drifted(spark, d).selectExpr(*digest).collect()[0]
    assert (rd.h, rd.n, rd.s) == (orig.h, orig.n, orig.s)

    con = duckdb.connect()
    q = (
        "SELECT count(*), sum(vec_id), "
        "round(sum(CAST(embedding[1] AS DOUBLE)), 9) "
        "FROM read_parquet('{}', union_by_name=true)"
    )
    assert con.execute(q.format(f"{d}/*.parquet")).fetchone() == con.execute(
        q.format(os.path.join(SF_SMALL, "embeddings.parquet"))
    ).fetchone()


def test_list2_null_element_falls_back_to_bag(spark, tmp_path):
    """The two-level layout cannot represent a NULL ELEMENT (the
    element field is ``repeated`` == required). A part-file whose list
    column carries one must fall back to the legacy BAG layout — and
    keep the NULL exactly — never silently substitute the fill value."""
    import pyarrow as pa

    src = tmp_path / "sf"
    src.mkdir()
    d = src / "embeddings.parquet"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array(
                [[1.0, None], [3.0, 4.0]], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 1], pa.int32()),
        }),
        str(d / "part-0000.parquet"),
    )
    files = permute_probe.legacy_list_rewrite(spark, str(src))
    assert files == [str(d / "part-0000.parquet")]
    desc = pq.ParquetFile(files[0]).metadata.schema
    paths = {desc.column(i).path for i in range(len(desc))}
    assert "embedding.bag.array" in paths, (
        "NULL element must force the bag fallback"
    )
    rows = sorted(
        (r.vec_id, r.embedding) for r in spark.read.parquet(str(d)).collect()
    )
    assert rows[0][1][0] == 1.0 and rows[0][1][1] is None
    assert rows[1][1] == [3.0, 4.0]


def test_bitrot_cell_passes_and_catches_inert_flips(spark, tmp_path):
    """r17 (VERDICT r16 item 5): the standing bitrot cell. On a
    CRC-bearing permuted copy (permuted_copy(bitrot=True) forces
    write_page_checksum) the cell must PASS: one mid-chunk flipped
    byte is silent (or structurally loud) with verification off and
    fail-LOUD with enable_bitrot_detection on. The cell must also
    self-police: it verifies the flip changed decoded values against a
    pre-flip baseline (the first cut flipped page-header STATISTICS —
    inert for a full scan — and would have reported coverage that
    never occurred)."""
    from catena_spark.sources import encodings

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    orig = hconf.get(encodings.PAGE_VERIFY_CONF)
    try:
        out = permute_probe.permuted_copy(
            SF_SMALL, bitrot=True, out_base=str(tmp_path)
        )
        assert out.endswith("_bitrot")
        assert permute_probe._bitrot_cell(spark, out, "lineitem") == 0
    finally:
        if orig is None:
            hconf.unset(encodings.PAGE_VERIFY_CONF)
        else:
            hconf.set(encodings.PAGE_VERIFY_CONF, orig)


def test_permuted_copy_unsigned_drift(tmp_path):
    """r17 'unsigned' drift: odd parts of every table store eligible
    small-int columns (all values >= 0, not widened) as the SAME-WIDTH
    UNSIGNED physical type; even parts keep the signed original. The
    multiset of VALUES is unchanged (the axis drifts signedness only),
    and a column with any negative value is never touched."""
    import pyarrow as pa

    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="unsigned", out_base=str(tmp_path)
    )
    saw_unsigned = False
    for t in permute_probe.TABLES:
        src = pq.read_table(os.path.join(SF_SMALL, f"{t}.parquet"))
        dst = os.path.join(out, f"{t}.parquet")
        parts = (
            [os.path.join(dst, p) for p in sorted(os.listdir(dst))]
            if os.path.isdir(dst)
            else [dst]
        )
        got = pa.concat_tables(
            [pq.read_table(p) for p in parts], promote_options="permissive"
        )
        assert got.num_rows == src.num_rows, t
        for i, p in enumerate(parts):
            sch = pq.read_schema(p)
            for f in sch:
                if pa.types.is_unsigned_integer(f.type):
                    saw_unsigned = True
                    assert i % 2 == 1, f"{t}.{f.name}: even part drifted"
                    import pyarrow.compute as pc

                    # the signed original must be all-non-negative
                    mn = pc.min(src.column(f.name)).as_py()
                    assert mn is not None and mn >= 0, f"{t}.{f.name}"
        # value multiset preserved per int column (cast back to compare)
        for f in src.schema:
            if str(f.type) in ("int8", "int16", "int32"):
                a = sorted(src.column(f.name).to_pylist(), key=str)
                b = sorted(
                    got.column(f.name)
                    .cast(f.type)
                    .to_pylist(),
                    key=str,
                )
                assert a == b, f"{t}.{f.name} multiset changed"
    assert saw_unsigned, (
        "no column drifted unsigned — fixtures lost their non-negative "
        "small ints; the axis is vacuous"
    )


def test_permuted_copy_delta_encodings(tmp_path):
    """r17 DELTA axis: the copy must physically carry all three v2
    encodings (DELTA_BINARY_PACKED on ints, DELTA_BYTE_ARRAY +
    DELTA_LENGTH_BYTE_ARRAY on strings) — _assert_delta_pages is the
    vacuity tripwire — with the value multiset unchanged. These decode
    exactly on both Spark readers and DuckDB (SCALE.md r17 matrix);
    the standing cell exists so an upgrade regression flips a hash."""
    out = permute_probe.permuted_copy(
        SF_SMALL, nodict=True, delta=True, out_base=str(tmp_path)
    )
    assert out.endswith("_delta")
    permute_probe._assert_delta_pages(out)
    # multiset spot-check on a table with int + string + timestamp
    src = pq.read_table(os.path.join(SF_SMALL, "orders.parquet"))
    dst = os.path.join(out, "orders.parquet")
    got = pq.read_table(dst)
    assert sorted(src.column("o_orderkey").to_pylist()) == sorted(
        got.column("o_orderkey").to_pylist()
    )
    assert sorted(src.column("o_orderpriority").to_pylist()) == sorted(
        got.column("o_orderpriority").to_pylist()
    )
    # vacuity tripwire actually trips: a dict-encoded copy has no
    # DELTA pages
    plain = permute_probe.permuted_copy(SF_SMALL, out_base=str(tmp_path))
    import pytest

    with pytest.raises(AssertionError, match="vacuous"):
        permute_probe._assert_delta_pages(plain)


def test_permuted_copy_tzadjust_drift(tmp_path):
    """r17 'tzadjust' drift: odd parts of every table carry the
    UTC-adjusted annotation on naive non-ns timestamp columns; even
    parts stay naive; the int64 ticks are unchanged (arrow's
    naive->tz cast is metadata-only)."""
    import pyarrow as pa

    out = permute_probe.permuted_copy(
        SF_SMALL, splits=4, drift="tzadjust", out_base=str(tmp_path)
    )
    saw = False
    for t in permute_probe.TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.isdir(dst):
            continue
        parts = sorted(os.listdir(dst))
        for i, p in enumerate(parts):
            sch = pq.read_schema(os.path.join(dst, p))
            for f in sch:
                if pa.types.is_timestamp(f.type) and f.type.unit != "ns":
                    if i % 2 == 1:
                        assert f.type.tz == "UTC", f"{t}.{f.name} part {i}"
                        saw = True
                    else:
                        assert f.type.tz is None, f"{t}.{f.name} part {i}"
        # tick preservation: epoch multiset equals the source's
        # (arrow refuses to concat naive beside tz-aware — exactly the
        # drift — so compare per-part int64 ticks instead)
        src = pq.read_table(os.path.join(SF_SMALL, f"{t}.parquet"))
        for f in src.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit != "ns":
                a = sorted(
                    src.column(f.name).cast(pa.int64()).to_pylist(),
                    key=str,
                )
                b = sorted(
                    (
                        v
                        for p in parts
                        for v in pq.read_table(os.path.join(dst, p))
                        .column(f.name)
                        .cast(pa.int64())
                        .to_pylist()
                    ),
                    key=str,
                )
                assert a == b, f"{t}.{f.name} ticks changed"
    assert saw, "no timestamp column drifted — axis vacuous on fixtures"
