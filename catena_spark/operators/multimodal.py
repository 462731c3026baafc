"""Multimodal columns (SURVEY.md §2-E 'multimodal'): image/audio/video as
opaque BINARY payloads + typed metadata, with decode / feature-extract /
resize / frame-sample as Arrow-batched mapInPandas stages.

The container has no media libraries (task brief), so the *decoder* is
stubbed: `decode_payload` raises NotImplementedError unless
`allow_fake=True`, in which case it produces a deterministic fake
(seeded from the payload digest) with the declared dimensions. Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested (tests/test_multimodal.py).

Scale notes:
- Payloads stay in the JVM until the mapInPandas stage; select only
  (id, payload, meta) into that stage so Arrow moves no extra columns.
- Feature extraction emits fixed-width ARRAY<FLOAT> — downstream this
  feeds the E3/E5 vector operators unchanged.
- Frame sampling is a fan-out (1 row -> n frames): done inside
  mapInPandas so the expansion never materializes driver-side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables

#: modalities cycle deterministically over doc_id.
MODALITIES = ("image", "audio", "video")

FEATURE_DIM = 8

PAYLOAD_SCHEMA = (
    "doc_id bigint, modality string, payload binary, "
    "n_bytes bigint, declared_w int, declared_h int"
)


def payload_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal payload table from documents (the fixture
    has no real media): payload = utf-8 bytes, modality cycles by id,
    declared dims derive from doc_id. Deterministic by construction."""
    d = tables.load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
        ).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("declared_w"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("declared_h"),
    )


def decode_payload(
    payload: bytes, w: int, h: int, *, allow_fake: bool = False
) -> np.ndarray:
    """Decode a media payload to an (h, w) float32 array.

    STUB: real decoding needs PIL/ffmpeg/soundfile, not present in this
    container. With ``allow_fake`` the pixels are a deterministic
    function of the payload digest — stable across processes/executors,
    so every downstream stage is testable.
    """
    if not allow_fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg/soundfile (not in this "
            "container); pass allow_fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((h, w), dtype=np.float32)


def extract_features(df: DataFrame, *, allow_fake: bool = True) -> DataFrame:
    """mapInPandas feature extractor: payload -> FEATURE_DIM floats
    (mean/std/min/max of decoded array + byte stats). Arrow batches in,
    Arrow batches out; one output row per input row."""

    out_schema = (
        "doc_id bigint, modality string, "
        "feat array<float>, decoded_w int, decoded_h int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_payload(
                    bytes(r.payload), int(r.declared_w), int(r.declared_h),
                    allow_fake=allow_fake,
                )
                feat = np.array(
                    [
                        arr.mean(), arr.std(), arr.min(), arr.max(),
                        float(len(r.payload)),
                        float(r.payload[0]) if len(r.payload) else 0.0,
                        float(r.payload[-1]) if len(r.payload) else 0.0,
                        float(arr.shape[0] * arr.shape[1]),
                    ],
                    dtype=np.float32,
                )
                rows.append(
                    (r.doc_id, r.modality, feat.tolist(), arr.shape[1], arr.shape[0])
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "modality", "feat", "decoded_w", "decoded_h"]
            )

    return df.select(
        "doc_id", "modality", "payload", "declared_w", "declared_h"
    ).mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, w: int, h: int, *, allow_fake: bool = True) -> DataFrame:
    """mapInPandas resize: nearest-neighbor downsample of the decoded
    array to (h, w); emits the resized array flattened + new dims."""

    out_schema = "doc_id bigint, pixels array<float>, w int, h int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_payload(
                    bytes(r.payload), int(r.declared_w), int(r.declared_h),
                    allow_fake=allow_fake,
                )
                yi = (np.arange(h) * arr.shape[0] // h).clip(0, arr.shape[0] - 1)
                xi = (np.arange(w) * arr.shape[1] // w).clip(0, arr.shape[1] - 1)
                small = arr[np.ix_(yi, xi)]
                rows.append((r.doc_id, small.ravel().tolist(), w, h))
            yield pd.DataFrame(rows, columns=["doc_id", "pixels", "w", "h"])

    return df.where(F.col("modality") == "image").select(
        "doc_id", "payload", "declared_w", "declared_h"
    ).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4, *, allow_fake: bool = True) -> DataFrame:
    """mapInPandas frame sampler for video payloads: fan-out to
    ``n_frames`` rows per video, each a decoded 'frame' (stub varies the
    digest seed per frame index). 1->n expansion happens inside the
    executor batch, never driver-side."""

    out_schema = "doc_id bigint, frame_idx int, frame_mean float"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for i in range(n_frames):
                    arr = decode_payload(
                        bytes(r.payload) + i.to_bytes(4, "big"),
                        int(r.declared_w), int(r.declared_h),
                        allow_fake=allow_fake,
                    )
                    rows.append((r.doc_id, i, float(arr.mean())))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_mean"])

    return df.where(F.col("modality") == "video").select(
        "doc_id", "payload", "declared_w", "declared_h"
    ).mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------- driver-surface entries

from ..registry import query  # noqa: E402


@query("mm_feature_extract", "E-mm", oracle=None)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver entry for the mapInPandas feature pipeline:
    payload table -> decode stub -> FEATURE_DIM floats per row. The
    deterministic fake decoder makes the output stable across runs, so
    the driver's rows+schema check is meaningful.

    The feature vector is serialized to a fixed-precision string (and
    summarized by dim/norm): the driver's pandas-based canonicalization
    can't factorize ndarray cells (ADVICE r1), so no driver-facing query
    may emit a raw array column.
    """
    feats = extract_features(payload_table(spark, sf_dir), allow_fake=True)
    return feats.select(
        "doc_id",
        F.size("feat").alias("feat_dim"),
        F.round(
            F.sqrt(F.aggregate("feat", F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("feat_norm"),
        F.array_join(
            F.transform("feat", lambda x: F.format_string("%.4f", x)), ","
        ).alias("feat_csv"),
    )


@query("mm_frame_sample", "E-mm", oracle=None)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver entry for the video frame sampler: 1->n row
    fan-out inside mapInPandas batches (3 'frames' per video payload),
    per-frame decoded mean from the deterministic stub decoder. Scalar
    output columns only (driver canonicalizer contract, ADVICE r1)."""
    return sample_frames(payload_table(spark, sf_dir), n_frames=3, allow_fake=True)


def audio_window_rms(
    df: DataFrame, *, win: int = 256, allow_fake: bool = True
) -> DataFrame:
    """Windowed RMS over decoded audio (SURVEY.md §2-E-mm): decode the
    payload to a 1-D sample stream (stub decoder, flattened), split into
    fixed ``win``-sample windows, one output row per window with its RMS
    and peak — the fan-out shape of real audio feature pipelines
    (VAD, loudness normalization) with the decode stubbed.

    mapInPandas so the 1->n window expansion happens executor-side in
    Arrow batches; only (doc_id, payload, dims) enter the stage.
    """
    out_schema = "doc_id bigint, win_idx int, n_samples int, rms double, peak double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                samples = decode_payload(
                    bytes(r.payload), int(r.declared_w), int(r.declared_h),
                    allow_fake=allow_fake,
                ).ravel()
                for i in range(0, len(samples), win):
                    chunk = samples[i : i + win].astype(np.float64)
                    rows.append(
                        (
                            r.doc_id,
                            i // win,
                            len(chunk),
                            float(np.sqrt(np.mean(chunk * chunk))),
                            float(np.max(np.abs(chunk))),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "win_idx", "n_samples", "rms", "peak"]
            )

    return df.where(F.col("modality") == "audio").select(
        "doc_id", "payload", "declared_w", "declared_h"
    ).mapInPandas(run, out_schema)


@query("mm_audio_window_rms", "E-mm", oracle=None)
def mm_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only driver entry for the audio windowing stage: per audio
    payload, 256-sample window RMS/peak rows from the deterministic stub
    decoder. Scalar output columns only (driver canonicalizer
    contract)."""
    return audio_window_rms(payload_table(spark, sf_dir), win=256, allow_fake=True)
