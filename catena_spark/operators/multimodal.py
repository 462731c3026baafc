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

# Oracle-checkable fake sample stream (r3 VERDICT item 4). The codec
# decode stays gated (decode_payload raises without allow_fake); what the
# driver keys exercise is the REAL Spark plumbing — mapInPandas schema,
# Arrow batching, 1->n fan-out — over a stand-in sample stream that BOTH
# engines can derive exactly:
#
#   seed(doc)     = (doc_id*40503 + n_bytes*9973) % 65536
#   seed(frame f) = (seed(doc) + (f+1)*31337)     % 65536
#   sample k_i    = (seed + i*104729) % 65536,  i in [0, w*h)
#
# n_bytes is the UTF-8 payload length, so the stream still depends on the
# payload the UDF receives. All stats are exact int64 (k <= 2^16,
# sum(k^2) over <= 5k samples <= 2^44 < 2^53), and the derived doubles go
# through division-by-exact-integers + IEEE sqrt + division by 2^16 only
# — every step correctly rounded identically in numpy/Python and DuckDB,
# so the driver's value hash compares bit-identical floats (same
# integer-micro-unit parity rule as ts_gapfill_linear).

_SEED_A, _SEED_B, _FRAME_STEP, _SAMPLE_STEP = 40503, 9973, 31337, 104729


def fake_sample_stream(
    doc_id: int, n_bytes: int, n: int, frame_idx: int | None = None
) -> np.ndarray:
    """int64 sample stream in [0, 65536) — the deterministic stand-in
    for a decoded payload, mirrorable in ANSI SQL (see block comment)."""
    seed = (doc_id * _SEED_A + n_bytes * _SEED_B) % 65536
    if frame_idx is not None:
        seed = (seed + (frame_idx + 1) * _FRAME_STEP) % 65536
    i = np.arange(n, dtype=np.int64)
    return (seed + i * _SAMPLE_STEP) % 65536


@query(
    "mm_feature_extract",
    "E-mm",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1]
                   AS modality,
               octet_length(encode(text)) AS n_bytes,
               CAST(doc_id % 64 + 16 AS BIGINT) AS w,
               CAST(doc_id % 48 + 16 AS BIGINT) AS h
        FROM documents),
    e AS (
        SELECT doc_id, modality, w, h, n_bytes,
               unnest(generate_series(0, w * h - 1)) AS i
        FROM p),
    s AS (
        SELECT doc_id, modality, w, h,
               ((doc_id * 40503 + n_bytes * 9973) % 65536
                + i * 104729) % 65536 AS k
        FROM e)
    SELECT doc_id, modality,
           CAST(w AS INTEGER) AS decoded_w, CAST(h AS INTEGER) AS decoded_h,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(k * k) AS BIGINT) AS sumsq_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           sqrt(CAST(sum(k * k) AS DOUBLE)) / 65536 AS feat_norm
    FROM s GROUP BY doc_id, modality, w, h
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the payload table, hash-
    checked (upgraded from rows-only, r3 VERDICT item 4): one output row
    per payload with exact integer sample stats plus the L2 norm of the
    sample stream. The decode step uses the SQL-mirrorable fake stream
    (codec decode itself stays gated in decode_payload); the Spark-side
    shape — binary payload column into an Arrow-batched mapInPandas
    stage, scalar columns out — is the production pipeline's.
    """

    out_schema = (
        "doc_id bigint, modality string, decoded_w int, decoded_h int, "
        "n_samples bigint, sum_k bigint, sumsq_k bigint, "
        "min_k bigint, max_k bigint, feat_norm double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = int(r.declared_w), int(r.declared_h)
                k = fake_sample_stream(int(r.doc_id), len(bytes(r.payload)), w * h)
                sumsq = int((k * k).sum())
                rows.append(
                    (
                        int(r.doc_id), r.modality, w, h, w * h,
                        int(k.sum()), sumsq, int(k.min()), int(k.max()),
                        math.sqrt(sumsq) / 65536.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "modality", "decoded_w", "decoded_h",
                    "n_samples", "sum_k", "sumsq_k", "min_k", "max_k",
                    "feat_norm",
                ],
            )

    return (
        payload_table(spark, sf_dir)
        .select("doc_id", "modality", "payload", "declared_w", "declared_h")
        .mapInPandas(run, schema=out_schema)
    )


@query(
    "mm_frame_sample",
    "E-mm",
    oracle="""
    WITH p AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes,
               CAST(doc_id % 64 + 16 AS BIGINT) AS w,
               CAST(doc_id % 48 + 16 AS BIGINT) AS h
        FROM documents WHERE doc_id % 3 = 2),
    pf AS (
        SELECT doc_id, n_bytes, w, h, unnest([0, 1, 2]) AS frame_idx
        FROM p),
    e AS (
        SELECT doc_id, n_bytes, frame_idx,
               unnest(generate_series(0, w * h - 1)) AS i
        FROM pf),
    s AS (
        SELECT doc_id, frame_idx,
               (((doc_id * 40503 + n_bytes * 9973) % 65536
                 + (frame_idx + 1) * 31337) % 65536 + i * 104729) % 65536 AS k
        FROM e)
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(k) AS BIGINT) AS frame_sum_k,
           sqrt(CAST(sum(k * k) AS DOUBLE) / count(*)) / 65536 AS frame_rms
    FROM s GROUP BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampler, hash-checked (upgraded from rows-only): 1->3
    row fan-out per video payload inside mapInPandas batches (the
    expansion never materializes driver-side), each 'frame' a distinct
    SQL-mirrorable sample stream seeded by (doc, frame_idx). Exact
    integer stats + bit-identical RMS double per frame.
    """

    out_schema = (
        "doc_id bigint, frame_idx int, n_samples bigint, "
        "frame_sum_k bigint, frame_rms double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = int(r.declared_w), int(r.declared_h)
                for f in range(3):
                    k = fake_sample_stream(
                        int(r.doc_id), len(bytes(r.payload)), w * h, frame_idx=f
                    )
                    n = w * h
                    sumsq = int((k * k).sum())
                    rows.append(
                        (
                            int(r.doc_id), f, n, int(k.sum()),
                            math.sqrt(sumsq / n) / 65536.0,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_samples", "frame_sum_k", "frame_rms",
                ],
            )

    return (
        payload_table(spark, sf_dir)
        .where(F.col("modality") == "video")
        .select("doc_id", "payload", "declared_w", "declared_h")
        .mapInPandas(run, schema=out_schema)
    )


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


@query(
    "mm_audio_window_rms",
    "E-mm",
    oracle="""
    WITH p AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes,
               CAST(doc_id % 64 + 16 AS BIGINT) AS w,
               CAST(doc_id % 48 + 16 AS BIGINT) AS h
        FROM documents WHERE doc_id % 3 = 1),
    e AS (
        SELECT doc_id, n_bytes,
               unnest(generate_series(0, w * h - 1)) AS i
        FROM p),
    s AS (
        SELECT doc_id, i // 256 AS win_idx,
               ((doc_id * 40503 + n_bytes * 9973) % 65536
                + i * 104729) % 65536 AS k
        FROM e)
    SELECT doc_id, CAST(win_idx AS INTEGER) AS win_idx,
           CAST(count(*) AS BIGINT) AS n_samples,
           sqrt(CAST(sum(k * k) AS DOUBLE) / count(*)) / 65536 AS rms,
           CAST(max(k) AS DOUBLE) / 65536 AS peak
    FROM s GROUP BY doc_id, win_idx
    """,
)
def mm_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing stage, hash-checked (upgraded from rows-only):
    per audio payload, the SQL-mirrorable sample stream split into
    256-sample windows inside mapInPandas — one output row per window
    with exact count, bit-identical RMS (integer sumsq -> one IEEE
    division -> IEEE sqrt -> exact /2^16) and exact peak (max sample /
    2^16, a dyadic rational). The window fan-out happens executor-side
    in Arrow batches, the production audio-feature shape with the codec
    decode gated (decode_payload).
    """

    out_schema = (
        "doc_id bigint, win_idx int, n_samples bigint, rms double, peak double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = int(r.declared_w), int(r.declared_h)
                k = fake_sample_stream(int(r.doc_id), len(bytes(r.payload)), w * h)
                for wi in range(0, len(k), 256):
                    chunk = k[wi : wi + 256]
                    n = len(chunk)
                    sumsq = int((chunk * chunk).sum())
                    rows.append(
                        (
                            int(r.doc_id), wi // 256, n,
                            math.sqrt(sumsq / n) / 65536.0,
                            int(chunk.max()) / 65536.0,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "win_idx", "n_samples", "rms", "peak"]
            )

    return (
        payload_table(spark, sf_dir)
        .where(F.col("modality") == "audio")
        .select("doc_id", "payload", "declared_w", "declared_h")
        .mapInPandas(run, schema=out_schema)
    )
