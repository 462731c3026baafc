"""Streaming transformations (SURVEY.md §2-F2..F5). Every function takes
a (possibly streaming) events-schema DataFrame and returns a transformed
DataFrame — the same code path serves batch DataFrames, which is how the
parity tests compare micro-batched results against batch ground truth
(SURVEY.md §5 item 5).

Late-data contract (F1): callers attach ``withWatermark`` before the
stateful ops here; rows older than the watermark are dropped by the
state store exactly as catena rejects writes into rotated-out partitions
[SURVEY.md §1.1 — R db.go].
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(events: DataFrame, width: str = "6 hours") -> DataFrame:
    """F2 tumbling windows: per (window, event_type) count + value sum."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_v"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def sliding_avg(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """F2 sliding windows: overlapping per-type averages."""
    return (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_v"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "avg_v",
            "n",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """F3 session windows: gap-based sessions per user — the built-in
    twin of operators/timeseries.ts_sessionize_30m (C9); parity between
    the two is asserted in tests/test_streaming.py."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """F4 streaming dedup on event_id. State is bounded by the watermark
    (dropDuplicatesWithinWatermark), so at 100 TB/day the dedup store
    holds only the watermark horizon, not all history."""
    return events.dropDuplicatesWithinWatermark(["event_id"])


#: output/state schemas for streaming_ewma
_EWMA_OUT = "user_id bigint, event_type string, ts_us bigint, value double, ewma double"
_EWMA_STATE = "ewma double, n bigint"


def streaming_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """F5 custom stateful aggregation: per-series EWMA carried across
    micro-batches via applyInPandasWithState — state is one (ewma, n)
    pair per series, the minimal catena-like 'hot series' register.

    Batch twin: operators/timeseries.ts_ewma (C7); with time-ordered
    input files the streamed final EWMA equals the batch EWMA
    (tests/test_streaming.py::test_streaming_ewma_matches_batch).
    """

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (ewma, n) = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "value"])
            for r in pdf.itertuples(index=False):
                ewma = (
                    r.value if ewma is None else alpha * r.value + (1 - alpha) * ewma
                )
                n += 1
                out.append((key[0], key[1], r.ts_us, r.value, ewma))
        state.update((ewma, n))
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "ts_us", "value", "ewma"]
        )

    src = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    )
    return src.groupBy("user_id", "event_type").applyInPandasWithState(
        fold, _EWMA_OUT, _EWMA_STATE, "append", GroupStateTimeout.NoTimeout
    )
