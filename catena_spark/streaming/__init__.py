"""Structured-Streaming operators (SURVEY.md §2-F): catena's ingest
semantics recast — watermark as the late-data policy, checkpoint as the
WAL, windowed/session/stateful aggregation over the event stream."""

from .ops import (  # noqa: F401
    dedup_within_watermark,
    session_counts,
    sliding_avg,
    static_enrich_counts,
    streaming_ewma,
    user_tier_dim,
    windowed_counts,
)
