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


def micro_ints(a: Column | str) -> Column:
    """ARRAY<FLOAT> -> ARRAY<BIGINT> of exact micro-unit components
    (round(x * 1e6), half-away-from-zero — the same integers DuckDB's
    round() produces, proven bit-portable by the LSH sign bits since r2).

    Integer components make every downstream sum reduction-order-free,
    which is what makes a cosine computed from them bit-identical across
    engines (r4 VERDICT item 2: the ANN verify hardening)."""
    return F.transform(
        a, lambda x: F.round(x.cast("double") * 1000000.0, 0).cast("long")
    )


def dot_long(ia: Column | str, ib: Column | str) -> Column:
    """Exact BIGINT dot product of two micro-unit arrays. For 64-dim
    fixture vectors (|x| <= 0.58 -> |xi| <= 5.8e5) the sum is <= ~2.2e13,
    far inside int64; centroid sums stay <= ~4.3e16 (see llm_ann_ivf)."""
    return F.aggregate(
        F.zip_with(ia, ib, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_ge(
    dot_i: Column, n2a: Column, n2b: Column, num: int = 2, den: int = 5
) -> Column:
    """cos >= num/den as EXACT integer arithmetic (r5 — the one shared
    definition of the ANN/near-dup threshold): dot > 0 AND
    den^2*dot^2 >= num^2*n2a*n2b in DECIMAL(38,0), mirroring the
    oracles' HUGEINT comparison. Squaring is sound because both sides
    are non-negative once dot > 0. Headroom: |x| <= ~100 per component
    keeps den^2*dot^2 under 1e38 (pinned with boundary ties in
    tests/test_properties.py)."""
    dec = "decimal(38,0)"
    return (dot_i > 0) & (
        F.lit(den * den).cast(dec) * dot_i.cast(dec) * dot_i.cast(dec)
        >= F.lit(num * num).cast(dec) * n2a.cast(dec) * n2b.cast(dec)
    )


def cosine_micro(dot_i: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from exact integer sums: round(D / (sqrt(A)*sqrt(B)), 6).

    Every input is an order-independent integer, each cast and IEEE op
    is deterministic and correctly rounded in both Spark and DuckDB, so
    the resulting double — and therefore any rank/threshold decision on
    it — is bit-identical across engines. This replaces pairing Spark's
    fold-order dot/(sqrt*sqrt) against DuckDB's list_cosine_similarity
    (two independent float kernels, the one flake mechanism VERDICT r4
    identified)."""
    return F.round(
        dot_i.cast("double")
        / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))),
        6,
    )
