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


def test_permuted_copy_preserves_multiset_and_changes_order():
    out_dir = permute_probe.permuted_copy(SF_SMALL)
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


def test_permuted_copy_multifile_split_preserves_multiset():
    """splits > 1 writes each table as a part-file DIRECTORY; the
    multiset and the (sliced) permuted order must both survive, and
    the layout must actually be multi-file."""
    out_dir = permute_probe.permuted_copy(SF_SMALL, splits=7)
    single = permute_probe.permuted_copy(SF_SMALL, splits=1)
    for t in ("lineitem", "documents", "region"):
        dst = os.path.join(out_dir, f"{t}.parquet")
        ref = pq.read_table(os.path.join(single, f"{t}.parquet"))
        got = pq.read_table(dst)
        if ref.num_rows >= 7:
            assert os.path.isdir(dst) and len(os.listdir(dst)) == 7
        # contiguous slicing: the multi-file read-back in part order
        # equals the single-file permuted order exactly
        assert got.to_pylist() == ref.to_pylist()


def test_permuted_copy_is_seed_deterministic():
    """Two builds must produce identical bytes-level row orders, so a
    mismatch reported by the probe is reproducible, not a dice roll."""
    out_dir = permute_probe.permuted_copy(SF_SMALL)
    first = pq.read_table(
        os.path.join(out_dir, "documents.parquet")
    ).to_pylist()
    out_dir2 = permute_probe.permuted_copy(SF_SMALL)
    second = pq.read_table(
        os.path.join(out_dir2, "documents.parquet")
    ).to_pylist()
    assert first == second
