"""Direct pins for parity.norm_cell — the ONE shared canonicalizer
behind every Spark-vs-DuckDB value-hash comparison (the local mirror,
the preflight rehearsal, and the foreign-cwd drive_contract all import
it). These edge cells were previously covered only indirectly through
full-query hashes; a regression here would silently re-green or
re-redden every parity check at once, so each contract gets its own
explicit pin.
"""
import datetime
import math
from decimal import Decimal

from catena_spark.parity import norm_cell


def test_null_token():
    assert norm_cell(None) == "<null>"


def test_nan_is_its_own_token():
    assert norm_cell(float("nan")) == "<nan>"
    # and never leaks through repr ("nan" != "<nan>")
    assert norm_cell(float("nan")) != repr(float("nan"))


def test_negative_zero_folds_into_positive_zero():
    assert norm_cell(-0.0) == norm_cell(0.0) == "0.0"


def test_float_uses_exact_repr_not_rounding():
    # 0.1 + 0.2 must NOT normalize to "0.3" — parity rules upstream are
    # responsible for making engine floats bit-identical; the
    # canonicalizer must preserve the distinction, not paper over it.
    assert norm_cell(0.1 + 0.2) == "0.30000000000000004"
    assert norm_cell(0.1 + 0.2) != norm_cell(0.3)


def test_float_infinities_distinct():
    assert norm_cell(float("inf")) != norm_cell(float("-inf"))


def test_bool_renders_as_bool_not_int():
    # isinstance(True, int) is True in Python: the bool branch must stay
    # ahead of the int branch or True/False silently become "1"/"0" and
    # collide with genuine integer columns.
    assert norm_cell(True) == "True"
    assert norm_cell(False) == "False"
    assert norm_cell(True) != norm_cell(1)
    assert norm_cell(False) != norm_cell(0)


def test_int_repr_exact_past_2pow53():
    v = 2**63 + 1  # past BIGINT, past double-exact range
    assert norm_cell(v) == str(v)  # no float round-trip


def test_datetime_isoformat_microseconds_and_tz():
    naive = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    assert norm_cell(naive) == "2024-03-01T12:30:45.123456"
    aware = naive.replace(tzinfo=datetime.timezone.utc)
    assert norm_cell(aware) == "2024-03-01T12:30:45.123456+00:00"
    assert norm_cell(naive) != norm_cell(aware)


def test_date_isoformat():
    assert norm_cell(datetime.date(2024, 3, 1)) == "2024-03-01"


def test_list_and_tuple_recurse_identically():
    assert norm_cell([1, 2.5, None]) == norm_cell((1, 2.5, None))
    assert norm_cell([1, 2.5, None]) == "[1,2.5,<null>]"
    # nested lists recurse, and -0.0 folds inside arrays too
    assert norm_cell([[1, -0.0], []]) == "[[1,0.0],[]]"


def test_bytes_hex():
    assert norm_cell(b"\x00\xff") == "00ff"


def test_decimal_falls_through_to_str():
    # Decimal keeps its declared scale ("1.50" != "1.5"): oracles are
    # responsible for matching scales, the canonicalizer must not
    # quantize. Pinned so a future "helpful" normalization can't change
    # hashes behind the registry's back.
    assert norm_cell(Decimal("1.50")) == "1.50"
    assert norm_cell(Decimal("1.5")) == "1.5"


def test_string_passthrough_including_empty():
    assert norm_cell("") == ""
    assert norm_cell("a\x01b") == "a\x01b"


def test_math_nan_variants_all_fold():
    # every NaN bit-pattern Python can hand us is the same token
    assert norm_cell(math.nan) == norm_cell(float("nan")) == "<nan>"
