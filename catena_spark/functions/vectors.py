"""Vector math over ARRAY<FLOAT> columns via Spark higher-order functions
(SURVEY.md §2-E3/E5, §2-G: built-ins beat UDFs — these fold inside
whole-stage codegen, no Python crossing, no Arrow transfer).

Elements are cast to double BEFORE accumulation so the fold is a
deterministic IEEE sequence (oracle-parity requirement, and better
numerics than float32 accumulation anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors is the caller's job
    (fixture embeddings are non-zero by construction)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
