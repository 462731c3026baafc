"""Local mirror of the driver's correctness gate (SURVEY.md §5 item 1).

For every registered query with oracle SQL: run the Spark callable and the
DuckDB SQL on the same parquet dir, then compare row count, sorted column
names, and the order-insensitive multiset of rows with EXACT value
equality — strictly at-least-as-strong as the driver's value hash.

Default SF is sf0.001 for speed; set CATENA_TEST_SF=/root/testdata/sf0.01
to rehearse at the driver's exact scale before committing a milestone.
"""

from __future__ import annotations

import pytest

from catena_spark import registry
from catena_spark.parity import norm_cell as _norm
from tests.conftest import SF_SMALL


def _spark_result(spark, spec, sf_dir):
    df = spec.fn(spark, sf_dir)
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows)


def _duck_result(duck, spec):
    cur = duck.execute(spec.oracle)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(names), sorted(rows)


_SPECS = registry.specs()
_WITH_ORACLE = [k for k, s in _SPECS.items() if s.oracle is not None]
_ROWS_ONLY = [k for k, s in _SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("key", _WITH_ORACLE)
def test_oracle_parity(spark, duck, key):
    spec = _SPECS[key]
    s_cols, s_rows = _spark_result(spark, spec, SF_SMALL)
    d_cols, d_rows = _duck_result(duck, spec)
    assert s_cols == d_cols, f"{key}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{key}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatch = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatch, f"{key}: {len(mismatch)} differing rows; first: {mismatch[0]}"


@pytest.mark.parametrize("key", _ROWS_ONLY)
def test_rows_only_runs(spark, key):
    """Rows-only specs must at least execute and return a stable schema."""
    spec = _SPECS[key]
    df = spec.fn(spark, SF_SMALL)
    assert df.columns
    assert df.count() >= 0


@pytest.mark.parametrize("key", list(_SPECS))
def test_no_complex_driver_output(spark, key):
    """No driver-facing query may emit array/map/struct columns: the
    driver's pandas-based hash canonicalization factorizes cell values
    and ndarray cells are unhashable (ADVICE r1 — fn_map_struct_suite /
    mm_feature_extract died there). Serialize with array_join/to_json
    instead; applies to rows-only specs too."""
    import pyspark.sql.types as T

    df = _SPECS[key].fn(spark, SF_SMALL)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{key}: complex-typed driver output {complex_cols}; "
        "serialize (array_join/to_json) for the driver's canonicalizer"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
