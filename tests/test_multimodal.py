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
