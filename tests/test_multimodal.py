"""Multimodal plumbing tests (SURVEY.md §2-E): schema, batch shape,
determinism, fan-out — with the stubbed decoder (no media libs here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from catena_spark.operators import multimodal as mm
from tests.conftest import SF_SMALL


def test_decode_stub_gating():
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"xyz", 4, 4)
    a = mm.decode_payload(b"xyz", 4, 3, allow_fake=True)
    b = mm.decode_payload(b"xyz", 4, 3, allow_fake=True)
    assert a.shape == (3, 4) and (a == b).all()  # deterministic
    assert (mm.decode_payload(b"other", 4, 3, allow_fake=True) != a).any()


def test_payload_table_schema(spark):
    t = mm.payload_table(spark, SF_SMALL)
    assert [f.simpleString() for f in t.schema.fields] == [
        "doc_id:bigint", "modality:string", "payload:binary",
        "n_bytes:bigint", "declared_w:int", "declared_h:int",
    ]
    assert t.where(~F.col("modality").isin(*mm.MODALITIES)).count() == 0


def test_extract_features_one_row_per_input(spark):
    t = mm.payload_table(spark, SF_SMALL)
    f = mm.extract_features(t)
    assert f.count() == t.count()
    row = f.first()
    assert len(row.feat) == mm.FEATURE_DIM
    # decoded dims match declared dims (stub honors metadata)
    j = f.join(t, "doc_id").where(
        (F.col("decoded_w") != F.col("declared_w"))
        | (F.col("decoded_h") != F.col("declared_h"))
    )
    assert j.count() == 0


def test_resize_shape(spark):
    t = mm.payload_table(spark, SF_SMALL)
    r = mm.resize_images(t, 8, 6)
    n_images = t.where(F.col("modality") == "image").count()
    assert r.count() == n_images
    assert r.where(F.size("pixels") != 48).count() == 0


def test_frame_sampling_fanout(spark):
    t = mm.payload_table(spark, SF_SMALL)
    fr = mm.sample_frames(t, n_frames=3)
    n_videos = t.where(F.col("modality") == "video").count()
    assert fr.count() == n_videos * 3
    assert fr.select("frame_idx").distinct().count() == 3


def test_fake_sample_stream_matches_sql_formula():
    """The SQL-mirrorable sample stream is defined in FOUR places (the
    Python generator + three oracle SQL strings); this cross-checks the
    Python implementation against an independent DuckDB evaluation of
    the documented formula, and that every oracle embeds the same
    constants — so an edit to one copy can't silently desync parity."""
    import re

    import duckdb

    from catena_spark import registry

    for doc_id, n_bytes, n, frame in (
        (0, 1, 7, None), (7, 123, 300, None), (41, 999, 64, 0),
        (500, 54321, 257, 2), (4999, 31, 1, 1),
    ):
        got = mm.fake_sample_stream(doc_id, n_bytes, n, frame_idx=frame).tolist()
        seed = f"({doc_id} * 40503 + {n_bytes} * 9973) % 65536"
        if frame is not None:
            seed = f"({seed} + ({frame} + 1) * 31337) % 65536"
        exp = [
            r[0]
            for r in duckdb.sql(
                f"SELECT ({seed} + i * 104729) % 65536 AS k "
                f"FROM generate_series(0, {n - 1}) t(i) ORDER BY i"
            ).fetchall()
        ]
        assert got == exp, (doc_id, n_bytes, n, frame)

    specs = registry.specs()
    for key in ("mm_feature_extract", "mm_frame_sample", "mm_audio_window_rms"):
        sql = specs[key].oracle
        for const in ("40503", "9973", "104729", "65536"):
            assert const in sql, f"{key} oracle lost constant {const}"
    assert "31337" in specs["mm_frame_sample"].oracle
