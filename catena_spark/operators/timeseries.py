"""Time-series operators (SURVEY.md §2-B: catena's read API; §2-C: the
analytics a catena-backed TSDB serves), over the canonical series view
``(source STRING, metric STRING, ts TIMESTAMP, value DOUBLE)`` —
catena's exact row model (SURVEY.md §1.1 [R point.go · Point/Row]).

Catena answers B1-B5 with a per-series iterator over time-partitioned
storage (SURVEY.md §3.1); here the same semantics are declarative:
predicate pushdown + partition pruning play the extent-index role
(SURVEY.md §4), and per-series ordering comes from window specs or
min/max-by aggregation instead of a cursor.

Scale invariants across this module:
- Per-series operators shuffle ONCE on (source, metric) and reuse that
  partitioning for every window function in the query.
- "Latest/first point" uses min_by/max_by-style struct aggregation — a
  partial-aggregatable reduction, never a global sort.
- Window tiebreaks are total ((source, ts) verified unique in fixtures;
  value added as a belt-and-braces tiebreak) so results are deterministic
  under any partitioning.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import tables
from ..registry import query
from ..session import env_int
from ..tables import SERIES_SQL

#: microseconds per second/hour — used for exact integer time arithmetic.
US = 1_000_000
HOUR_US = 3600 * US


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series view + exact integer timestamp (µs) for frame arithmetic."""
    return tables.series(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))


def _cte(body: str) -> str:
    return f"WITH series AS ({SERIES_SQL}), s AS (SELECT *, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM series)\n{body}"


# ---------------------------------------------------------------- B1: range scan

@query(
    "ts_range_scan",
    "B1",
    oracle=_cte("""
    SELECT source, metric, ts_us, value FROM s
    WHERE source = '7' AND metric = 'click'
      AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    """),
)
def ts_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catena ``NewIterator(source, metric)`` + time-bounded walk
    (SURVEY.md §2-B1): all points of one series in [a, b).

    Scale: the three predicates push to the parquet scan; with a dt
    partition layout the time bound prunes partitions — the declarative
    equivalent of catena touching only overlapping partitions.
    """
    return (
        _series(spark, sf_dir)
        .where(
            (F.col("source") == "7")
            & (F.col("metric") == "click")
            & (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
        )
        .select("source", "metric", "ts_us", "value")
    )


# ---------------------------------------------------------------- B2: seek

@query(
    "ts_seek_first_after",
    "B2",
    oracle=_cte("""
    SELECT source, metric, ts_us, value FROM (
        SELECT source, metric, ts_us, value,
               row_number() OVER (PARTITION BY source, metric
                                  ORDER BY ts_us, value) AS rn
        FROM s WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
    WHERE rn = 1
    """),
)
def ts_seek_first_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catena ``Iterator.Seek(ts)`` for every series at once: first point
    at-or-after the seek timestamp (SURVEY.md §2-B2).

    Scale: implemented as min(struct(ts, value)) per series — a partial
    aggregation, not a per-series sort; the oracle's row_number form is
    semantically identical given the total tiebreak.
    """
    s = _series(spark, sf_dir).where(
        F.col("ts") >= F.lit("2024-01-15").cast("timestamp")
    )
    first = s.groupBy("source", "metric").agg(
        F.min(F.struct("ts_us", "value")).alias("pt")
    )
    return first.select(
        "source", "metric", F.col("pt.ts_us").alias("ts_us"), F.col("pt.value").alias("value")
    )


# ---------------------------------------------------------------- B3: latest

@query(
    "ts_latest_per_series",
    "B3",
    oracle=_cte("""
    SELECT source, metric, ts_us, value FROM (
        SELECT source, metric, ts_us, value,
               row_number() OVER (PARTITION BY source, metric
                                  ORDER BY ts_us DESC, value DESC) AS rn
        FROM s)
    WHERE rn = 1
    """),
)
def ts_latest_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest point per series — the dashboard "now" read (SURVEY.md
    §2-B3). max(struct) partial aggregation; at 100 TB combine with
    partition pruning to the newest dt buckets."""
    s = _series(spark, sf_dir)
    latest = s.groupBy("source", "metric").agg(
        F.max(F.struct("ts_us", "value")).alias("pt")
    )
    return latest.select(
        "source", "metric", F.col("pt.ts_us").alias("ts_us"), F.col("pt.value").alias("value")
    )


# ---------------------------------------------------------------- B4: enumerate

@query(
    "ts_list_series",
    "B4",
    oracle=_cte("SELECT DISTINCT source, metric FROM s"),
)
def ts_list_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series enumeration (catena partition-metadata walk, SURVEY.md
    §2-B4): distinct (source, metric) pairs."""
    return _series(spark, sf_dir).select("source", "metric").distinct()


# ---------------------------------------------------------------- B5: bounds

@query(
    "ts_series_bounds",
    "B5",
    oracle=_cte("""
    SELECT source, metric, min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us,
           count(*) AS n_points
    FROM s GROUP BY source, metric
    """),
)
def ts_series_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series time bounds + cardinality (catena partition
    min/maxTimestamp, SURVEY.md §2-B5)."""
    return _series(spark, sf_dir).groupBy("source", "metric").agg(
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_points"),
    )


# ---------------------------------------------------------------- C1: resample

@query(
    "ts_resample_1h",
    "C1",
    oracle=_cte("""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
           metric, count(*) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / CAST(100 * count(*) AS DOUBLE)                      AS avg_v,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100.0                                               AS sum_v,
           min(value) AS min_v, max(value) AS max_v
    FROM s GROUP BY 1, 2
    """),
)
def ts_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window downsample to 1h buckets per metric (SURVEY.md
    §2-C1; BENCH headline `events_resample_1h`).

    Parity (r5 hardening — sf0.1 mirror caught 1391.13/32 = 43.4728125,
    a REAL 6-decimal tie the engines' round() broke differently): value
    is 2-decimal-exact, so sum/avg run in exact BIGINT cents — order-free
    — with one final division producing bit-identical doubles; no round.

    Scale: pure hash aggregate — partial aggregation collapses each
    map partition to |hours x metrics| rows before the shuffle.
    """
    s = _series(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    cnt = F.count(F.lit(1))
    # group directly on the formatted bucket: partial aggregation means
    # only |groups| rows reach the shuffle either way, and A/B medians
    # at sf0.1 put this form ~18% ahead of group-on-timestamp + post-agg
    # format (measured, not assumed — see commit history)
    return (
        s.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_s"
            ),
            "metric",
        )
        .agg(
            cnt.alias("n"),
            (F.sum(cents).cast("double") / (cnt * 100).cast("double")).alias("avg_v"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


# ---------------------------------------------------------------- C2: moving aggs

@query(
    "ts_moving_avg",
    "C2",
    oracle=_cte("""
    SELECT source, metric, ts_us, value,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER
                    (PARTITION BY source, metric ORDER BY ts_us, value
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(100 * count(*) OVER
                          (PARTITION BY source, metric ORDER BY ts_us, value
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                      AS DOUBLE) AS ma4,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER
                    (PARTITION BY source, metric ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE)
               / CAST(100 * count(*) OVER
                          (PARTITION BY source, metric ORDER BY ts_us
                           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                      AS DOUBLE) AS ma_1h
    FROM s
    """),
)
def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving averages per series: last-4-rows and trailing-1-hour
    (time-range frame over exact integer µs — SURVEY.md §2-C2).

    Parity (r5): windowed float sums are not order-identical across
    engines (DuckDB frames aggregate via segment trees), so both sides
    average exact integer CENTS over the frame — sum/(100*count), one
    bit-identical division, no round.

    Scale: both windows share one (source, metric) shuffle; frames are
    bounded so state per row is O(frame), not O(partition).
    """
    s = _series(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w_rows = (
        Window.partitionBy("source", "metric")
        .orderBy("ts_us", "value")
        .rowsBetween(-3, 0)
    )
    w_range = (
        Window.partitionBy("source", "metric")
        .orderBy("ts_us")
        .rangeBetween(-HOUR_US, 0)
    )
    return s.select(
        "source",
        "metric",
        "ts_us",
        "value",
        (
            F.sum(cents).over(w_rows).cast("double")
            / (F.count(F.lit(1)).over(w_rows) * 100).cast("double")
        ).alias("ma4"),
        (
            F.sum(cents).over(w_range).cast("double")
            / (F.count(F.lit(1)).over(w_range) * 100).cast("double")
        ).alias("ma_1h"),
    )


# ---------------------------------------------------------------- C3: delta / rate

@query(
    "ts_delta",
    "C3",
    oracle=_cte("""
    SELECT source, metric, ts_us, value,
           value - lag(value) OVER w AS delta,
           CASE WHEN value - lag(value) OVER w < 0 THEN value
                ELSE value - lag(value) OVER w END AS increase
    FROM s WINDOW w AS (PARTITION BY source, metric ORDER BY ts_us, value)
    """),
)
def ts_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-over-point delta + counter-reset-aware increase (SURVEY.md
    §2-C3): a reset (delta < 0) counts the new value, Prometheus-style.
    Single-op IEEE arithmetic — exact parity without rounding."""
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source", "metric").orderBy("ts_us", "value")
    delta = F.col("value") - F.lag("value").over(w)
    return s.select(
        "source",
        "metric",
        "ts_us",
        "value",
        delta.alias("delta"),
        F.when(delta < 0, F.col("value")).otherwise(delta).alias("increase"),
    )


@query(
    "ts_rate",
    "C3",
    oracle=_cte("""
    SELECT source, metric, ts_us, value,
           (value - lag(value) OVER w)
             / ((ts_us - lag(ts_us) OVER w) / 1000000.0) AS rate_per_s
    FROM s WINDOW w AS (PARTITION BY source, metric ORDER BY ts_us, value)
    """),
)
def ts_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-second rate between consecutive points of a series (SURVEY.md
    §2-C3). NULL on each series' first point, as in the oracle."""
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source", "metric").orderBy("ts_us", "value")
    dv = F.col("value") - F.lag("value").over(w)
    dt_s = (F.col("ts_us") - F.lag("ts_us").over(w)) / F.lit(1000000.0)
    return s.select(
        "source", "metric", "ts_us", "value", (dv / dt_s).alias("rate_per_s")
    )


# ---------------------------------------------------------------- C4: gap-fill

#: Gap-fill grid guard: ``sequence(mn, mx, 1h)`` materializes a series'
#: WHOLE span as one in-memory array on one executor before explode —
#: per-series spans are small for healthy data, but a single corrupt
#: timestamp (an epoch-0 sensor reset, a year-9999 parse artifact) makes
#: that one row's array 0.5 GB+ (1970→9999 ≈ 70M hourly buckets) and
#: OOMs the executor. 10^6 buckets ≈ 114 years hourly ≈ 8 MB — only
#: corrupt data crosses it. Same contract shape as llm.NEAR_DUP_MAX_ROWS
#: (VERDICT r9 item 5): env CATENA_GAPFILL_MAX_BUCKETS overrides, 0
#: disables.
GAPFILL_MAX_BUCKETS = 1_000_000


def _guarded_seq_start(start, mn, mx):
    """``start`` guarded by the series-span bucket cap: a CASE +
    raise_error that constant-folds INTO the sequence() generator
    expression (plan-lint's value-dependent-explode contract), firing
    loudly when the series' [mn, mx] span exceeds GAPFILL_MAX_BUCKETS.
    The ONE shared guard expression for every gap-fill grid generator,
    so the fail-loud contract cannot drift between callers."""
    cap = env_int("CATENA_GAPFILL_MAX_BUCKETS", GAPFILL_MAX_BUCKETS)
    if not cap:
        return start
    span = ((F.unix_micros(mx) - F.unix_micros(mn)) / F.lit(HOUR_US) + 1).cast(
        "long"
    )
    return F.when(
        span > cap,
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("ts_gapfill: series"),
                F.col("source"),
                F.col("metric"),
                F.lit("spans"),
                span.cast("string"),
                F.lit(
                    f"hourly buckets > cap {cap} — likely corrupt "
                    "timestamps; clean the series or raise "
                    "CATENA_GAPFILL_MAX_BUCKETS (0 disables)"
                ),
            )
        ).cast("timestamp"),
    ).otherwise(start)


def _hourly_grid(bounds: DataFrame) -> DataFrame:
    """Explode per-series ``[mn, mx]`` hourly grids from a
    (source, metric, mn, mx) bounds frame, failing loud on any series
    whose span exceeds the bucket cap (see GAPFILL_MAX_BUCKETS).

    The guard is an inline CASE on the bounds row (_guarded_seq_start)
    — no extra job, no extra scan, and the grid is bit-identical
    whenever every span is within the cap, so the driver hash cannot
    change on healthy data.
    """
    mn = _guarded_seq_start(F.col("mn"), F.col("mn"), F.col("mx"))
    return bounds.select(
        "source",
        "metric",
        F.explode(F.sequence(mn, F.col("mx"), F.expr("INTERVAL 1 HOUR"))).alias(
            "h"
        ),
    )


def _gapfill_intervals(b: DataFrame, extra_leads: dict | None = None) -> DataFrame:
    """r17 gap-fill kernel (guide §8: decide with small rows): from the
    observed hourly buckets ``b`` (source, metric, h, v), attach each
    bucket's NEXT observed bucket via lead() and explode the
    ``[h, nh)`` hourly sub-grid directly — the grid row count is
    unchanged (the union of half-open intervals plus the final bucket
    is exactly the [mn, mx] grid), but the fill inputs RIDE ALONG on
    every generated row, so the old shape's grid-vs-buckets left join
    (4.6M x 100k rows at sf0.1) and its full-grid window pass (another
    4.6M-row sort) disappear entirely. What remains on the full grid is
    pure projection. The lead/min/max window runs over the OBSERVED
    buckets only (<= |events| rows, two orders of magnitude smaller).

    Plan: Exchange(hashpartitioning(source, metric, h)) for the bucket
    aggregate -> Exchange(hashpartitioning(source, metric)) + one sort
    for the lead window -> Generate(explode) -> Project. Two exchanges
    total, versus four (buckets, bounds, grid join, window) before.

    ``extra_leads`` maps output column name -> source column, for
    callers needing the next bucket's values (linear interpolation).
    The span guard is the same shared _guarded_seq_start expression —
    per-series [mn, mx] span over the cap still fails loud, and the
    per-interval sequence arrays are additionally SMALLER than the old
    per-series ones (bounded by the largest single gap, not the whole
    span), shrinking the worst-case executor allocation the cap
    defends against.

    Output: b's columns + ``g`` (the grid bucket; g == h on observed
    rows, g > h on gap rows) + the extra lead columns + ``nh``.
    """
    w = Window.partitionBy("source", "metric").orderBy("h")
    wall = Window.partitionBy("source", "metric")
    cols = [
        F.lead("h").over(w).alias("nh"),
        F.min("h").over(wall).alias("mn"),
        F.max("h").over(wall).alias("mx"),
    ]
    for out_name, src in (extra_leads or {}).items():
        cols.append(F.lead(src).over(w).alias(out_name))
    obs = b.select("*", *cols)
    start = _guarded_seq_start(F.col("h"), F.col("mn"), F.col("mx"))
    end = F.coalesce(
        F.col("nh") - F.expr("INTERVAL 1 HOUR"), F.col("h")
    )
    return obs.select(
        "*",
        F.explode(F.sequence(start, end, F.expr("INTERVAL 1 HOUR"))).alias("g"),
    ).drop("mn", "mx")


@query(
    "ts_gapfill_ffill",
    "C4",
    oracle=_cte("""
    , b AS (SELECT source, metric, date_trunc('hour', ts) AS h,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                       / CAST(100 * count(*) AS DOUBLE) AS v
            FROM s GROUP BY 1, 2, 3),
    bounds AS (SELECT source, metric, min(h) AS mn, max(h) AS mx
               FROM b GROUP BY 1, 2),
    grid AS (SELECT source, metric,
                    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
             FROM bounds),
    j AS (SELECT g.source, g.metric, g.h, b.v
          FROM grid g LEFT JOIN b ON b.source = g.source
               AND b.metric = g.metric AND b.h = g.h)
    SELECT source, metric, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s,
           last_value(v IGNORE NULLS) OVER (PARTITION BY source, metric
               ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS v_filled,
           (v IS NULL) AS was_gap
    FROM j
    """),
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill: materialize every hourly bucket between each series' own
    first and last point, forward-filling missing buckets (SURVEY.md
    §2-C4 — catena has no NULL concept; absent buckets simply don't
    exist, so the grid must be generated).

    Scale: r17 interval-explode shape (guide §8; _gapfill_intervals) —
    the grid is generated per OBSERVED-bucket interval ``[h, nh)`` with
    the fill value riding along, so a gap bucket is born knowing its
    forward-fill value (the interval start's v) and the old
    grid-vs-buckets left join plus full-grid window pass are gone
    (4 exchanges -> 2; sf0.1 noop-sink 8.2 s -> ~2.5 s). Output size is
    still sum of per-series spans, never |series| x |global span|.
    Corrupt-timestamp span blowups fail loud via the shared
    _guarded_seq_start bucket cap.
    """
    s = _series(spark, sf_dir)
    _cents = F.round(F.col("value") * 100, 0).cast("long")
    # exact cents avg (r5): order-free, bit-identical across engines
    b = s.groupBy(
        "source", "metric", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(_cents).cast("double")
            / (F.count(F.lit(1)) * 100).cast("double")
        ).alias("v")
    )
    return _gapfill_intervals(b).select(
        "source",
        "metric",
        F.date_format("g", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        F.col("v").alias("v_filled"),
        (F.col("g") != F.col("h")).alias("was_gap"),
    )


# ---------------------------------------------------------------- C5: top-k series

@query(
    "ts_topk_series",
    "C5",
    oracle=_cte("""
    SELECT source, metric,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS total,
           count(*) AS n
    FROM s GROUP BY source, metric
    ORDER BY total DESC, source, metric LIMIT 5
    """),
)
def ts_topk_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 series by total value (SURVEY.md §2-C5). Aggregate then
    TakeOrderedAndProject on the exact cents total (r5, order-free)
    with key tiebreaks."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        _series(spark, sf_dir)
        .groupBy("source", "metric")
        .agg(
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.col("total").desc(), "source", "metric")
        .limit(5)
    )


# ---------------------------------------------------------------- C6: as-of join

@query(
    "ts_asof_join",
    "C6",
    oracle=_cte("""
    , c AS (SELECT source, ts_us, value FROM s WHERE metric = 'click'),
    p AS (SELECT source, ts_us, value FROM s WHERE metric = 'purchase')
    SELECT c.source, c.ts_us, c.value AS click_value,
           p.value AS last_purchase_value
    FROM c ASOF LEFT JOIN p
      ON c.source = p.source AND p.ts_us <= c.ts_us
    """),
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY.md §2-C6): each click gets the user's latest
    purchase value at-or-before it. Spark 4.1 has no native ASOF, so this
    is the union-and-fill pattern: tag both sides, sort once per source,
    forward-fill the purchase value, keep click rows.

    Scale: ONE shuffle on source and a bounded-state running window —
    strictly better than the naive range-join + rank (which explodes to
    |clicks x purchases| per user before pruning). The DuckDB oracle uses
    its native ASOF JOIN — a genuinely independent implementation.
    Ties: a same-µs purchase sorts before the click (side asc), matching
    ASOF's inclusive `<=`; (source, ts) is unique in fixtures so no
    further ambiguity.
    """
    s = _series(spark, sf_dir)
    clicks = s.where(F.col("metric") == "click").select(
        "source", "ts_us", F.col("value").alias("click_value"),
        F.lit(1).alias("is_click"), F.lit(None).cast("double").alias("pv"),
    )
    purchases = s.where(F.col("metric") == "purchase").select(
        "source", "ts_us", F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("is_click"), F.col("value").alias("pv"),
    )
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("source")
        .orderBy("ts_us", "is_click")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("last_purchase_value", F.last("pv", ignorenulls=True).over(w))
        .where(F.col("is_click") == 1)
        .select("source", "ts_us", "click_value", "last_purchase_value")
    )


# ---------------------------------------------------------------- C7: EWMA (rows-only)

#: WITH RECURSIVE prefix (the shared _cte() helper can't carry the
#: RECURSIVE keyword the EWMA oracle needs).
def _cte_recursive(body: str) -> str:
    from ..tables import SERIES_SQL

    return (
        f"WITH RECURSIVE series AS ({SERIES_SQL}), "
        "s AS (SELECT *, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM series)\n"
        + body
    )


@query(
    "ts_ewma",
    "C7",
    oracle=_cte_recursive("""
    , o AS (SELECT source, metric, ts_us, value,
                   row_number() OVER (PARTITION BY source, metric
                                      ORDER BY ts_us, value) AS rn
            FROM s),
    rec AS (
        SELECT source, metric, ts_us, value, rn, value AS ewma
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.source, o.metric, o.ts_us, o.value, o.rn,
               CAST(0.3 AS DOUBLE) * o.value + CAST(0.7 AS DOUBLE) * rec.ewma
        FROM o JOIN rec ON o.source = rec.source AND o.metric = rec.metric
                       AND o.rn = rec.rn + 1)
    SELECT source, metric, ts_us, value, ewma FROM rec
    """),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per series, alpha=0.3
    (SURVEY.md §2-C7). Not expressible with built-in window aggregates ->
    grouped-map Pandas UDF (Arrow-batched; one group per series) — the
    sanctioned slow path, and the only Python-crossing operator in this
    module.

    The recurrence ``e = 0.3*x + 0.7*e`` is written out explicitly (not
    pandas ``.ewm``, whose adjust=False path divides by ``0.7 + 0.3`` —
    which is NOT 1.0 in IEEE doubles and perturbs the last ulp) so the
    DuckDB recursive-CTE oracle runs the bit-identical float sequence
    and C7 is hash-checked, not rows-only.

    Scale (r5 restructure): the fixture — like catena's data model —
    has MANY SMALL series (7.5k series of ~13 points at sf0.1), where
    grouped-map applyInPandas pays per-GROUP Arrow/pandas overhead that
    dwarfed the fold (~8 s). The fold now runs per PARTITION: one hash
    repartition on the series key (the same single shuffle the grouped
    map did), sortWithinPartitions to make each series a contiguous
    (ts_us, value)-ordered run, then mapInPandas carrying (series key,
    ewma) state across Arrow batches — identical float sequence,
    per-batch instead of per-group Python crossing (~4x faster here,
    and the win grows with series count). Memory stays O(batch), and a
    pathological single-series skew splits by time bucket with chained
    state exactly as the streaming twin does.
    """
    s = _series(spark, sf_dir).select("source", "metric", "ts_us", "value")
    # NULLS LAST explicitly: Spark's bare ascending sort is NULLS FIRST,
    # but both the pandas sort this replaced (NaN last) and the DuckDB
    # oracle's ORDER BY (NULLS LAST) put nulls last — latent divergence
    # only, fixtures carry no nulls, but the orders must agree by
    # construction
    parts = s.repartition("source", "metric").sortWithinPartitions(
        "source", "metric", F.asc_nulls_last("ts_us"), F.asc_nulls_last("value")
    )

    def fold(batches):
        key = None
        e = 0.0
        for pdf in batches:
            src = pdf["source"].tolist()
            met = pdf["metric"].tolist()
            vals = pdf["value"].tolist()
            out = []
            for i in range(len(vals)):
                k = (src[i], met[i])
                if k != key:
                    key = k
                    e = vals[i]
                else:
                    e = 0.3 * vals[i] + 0.7 * e
                out.append(e)
            pdf = pdf.assign(ewma=out)
            yield pdf

    return parts.mapInPandas(
        fold, schema="source string, metric string, ts_us long, value double, ewma double"
    )


# ---------------------------------------------------------------- C8: z-score outliers

@query(
    "ts_zscore_outliers",
    "C8",
    oracle=_cte("""
    SELECT source, metric, ts_us, value, z FROM (
        SELECT source, metric, ts_us, value,
               CAST(n * c - sc AS DOUBLE)
                   / sqrt(CAST(n AS DOUBLE)
                          * CAST(n * sc2 - sc * sc AS DOUBLE)
                          / CAST(n - 1 AS DOUBLE)) AS z,
               n AS n_win,
               n * sc2 - sc * sc AS m2i,
               (n - 1) * (n * c - sc) * (n * c - sc) AS num2,
               4 * n * (n * sc2 - sc * sc) AS den2
        FROM (
            SELECT source, metric, ts_us, value,
                   CAST(round(value * 100, 0) AS BIGINT) AS c,
                   count(*) OVER w AS n,
                   sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS sc,
                   sum(CAST(round(value * 100, 0) AS BIGINT)
                       * CAST(round(value * 100, 0) AS BIGINT)) OVER w AS sc2
            FROM s
            WINDOW w AS (PARTITION BY source, metric ORDER BY ts_us, value
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)))
    WHERE n_win >= 5 AND m2i > 0 AND num2 > den2
    """),
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly flagging (SURVEY.md §2-C8): points >2 sigma from the
    trailing-20-point mean (current point excluded so it can't mask
    itself); needs >=5 trailing points.

    Parity (r5): NOT the engines' windowed stddev/avg — their moment
    merges differ beyond an ulp, and the old round(z, 4) + float
    thresholds carried a tie window. Both sides compute exact integer
    cents moments over the frame (window sums of BIGINTs are exact in
    any order), decide membership with PURE INTEGER predicates —
    sd > 0  <=>  n*sc2 - sc^2 > 0, and |z| > 2  <=>
    (n-1)*(n*c - sc)^2 > 4*n*(n*sc2 - sc^2) — and emit z as identical
    deterministic double arithmetic (cast / IEEE sqrt / divide) on
    those exact integers: bit-identical, no round, nothing can flip.
    """
    s = _series(spark, sf_dir)
    w = (
        Window.partitionBy("source", "metric")
        .orderBy("ts_us", "value")
        .rowsBetween(-20, -1)
    )
    c = F.round(F.col("value") * 100, 0).cast("long")
    n = F.count(F.lit(1)).over(w)
    sc = F.sum(c).over(w)
    sc2 = F.sum(c * c).over(w)
    m2i = n * sc2 - sc * sc
    dev = n * c - sc
    z = dev.cast("double") / F.sqrt(
        n.cast("double") * m2i.cast("double") / (n - 1).cast("double")
    )
    return (
        s.select(
            "source", "metric", "ts_us", "value",
            z.alias("z"),
            n.alias("n_win"),
            m2i.alias("m2i"),
            ((n - 1) * dev * dev).alias("num2"),
            (4 * n * m2i).alias("den2"),
        )
        .where(
            (F.col("n_win") >= 5)
            & (F.col("m2i") > 0)
            & (F.col("num2") > F.col("den2"))
        )
        .drop("n_win", "m2i", "num2", "den2")
    )


# ---------------------------------------------------------------- C9: sessionize

@query(
    "ts_sessionize_30m",
    "C9",
    oracle=_cte("""
    , flagged AS (
        SELECT source, ts_us, metric, value,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM s WINDOW w AS (PARTITION BY source ORDER BY ts_us, metric, value)),
    sessions AS (
        SELECT source, ts_us,
               sum(is_new) OVER (PARTITION BY source
                                 ORDER BY ts_us, metric, value
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged)
    SELECT source, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts_us) AS start_us,
           max(ts_us) AS end_us,
           (max(ts_us) - min(ts_us)) / 1000000.0 AS duration_s
    FROM sessions GROUP BY source, session_id
    """),
)
def ts_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (SURVEY.md §2-C9): per user, a >30-min gap
    starts a new session; emits one row per session. The classic
    lag-gap -> cumulative-sum-of-flags pattern; streaming twin is
    ``session_window`` (catena_spark.streaming).

    Scale: one shuffle on source; both windows and the final group-by
    reuse it. Integer µs arithmetic — exact parity.
    """
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("ts_us", "metric", "value")
    # the cumsum MUST run over the same total order as the flag window
    # (r5, self-review): ordering by ts_us alone left tied timestamps'
    # session_id dependent on arbitrary row order
    w_cum = (
        Window.partitionBy("source")
        .orderBy("ts_us", "metric", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = s.select(
        "source",
        "ts_us",
        "metric",
        "value",
        F.when(gap.isNull() | (gap > 1800 * US), 1).otherwise(0).alias("is_new"),
    )
    sessions = flagged.select(
        "source", "ts_us", F.sum("is_new").over(w_cum).cast("long").alias("session_id")
    )
    return sessions.groupBy("source", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        ((F.max("ts_us") - F.min("ts_us")) / F.lit(1000000.0)).alias("duration_s"),
    )


# ---------------------------------------------------------------- C10: percentiles

@query(
    "ts_percentiles",
    "C10",
    oracle=_cte("""
    SELECT metric,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           min(value) AS min_v, max(value) AS max_v, count(*) AS n
    FROM s GROUP BY metric
    """),
)
def ts_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per metric (SURVEY.md §2-C10).

    Exact `percentile` here for oracle parity; at 100 TB swap in
    `percentile_approx` (mergeable t-digest-style sketch, no sort) — the
    approx twin is asserted within tolerance in tests/test_timeseries.py.
    """
    return (
        _series(spark, sf_dir)
        .groupBy("metric")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------- C3 depth: counter increase

@query(
    "ts_increase_counter",
    "C3",
    oracle=_cte("""
    , d AS (
        SELECT source, metric, date_trunc('hour', ts) AS h, value,
               value - lag(value) OVER (PARTITION BY source, metric
                                        ORDER BY ts_us, value) AS delta
        FROM s WHERE metric IN ('click', 'view')
    )
    SELECT source, metric, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s,
           CAST(sum(CAST(round((CASE WHEN delta IS NULL THEN 0
                                     WHEN delta < 0 THEN value
                                     ELSE delta END) * 100, 0) AS BIGINT))
                AS DOUBLE) / 100.0 AS increase
    FROM d GROUP BY source, metric, h
    """),
)
def ts_increase_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-reset-aware hourly increase (SURVEY.md §2-C3, the
    Prometheus ``increase()`` shape): a drop in a monotonic counter means
    the process restarted, so the post-reset value itself is the growth.

    Scale: one shuffle on (source, metric) for the lag, then the hourly
    rollup reuses that partitioning (hour is a subkey of the sort) with
    map-side partial sums.
    """
    s = _series(spark, sf_dir).where(F.col("metric").isin("click", "view"))
    w = Window.partitionBy("source", "metric").orderBy("ts_us", "value")
    d = s.withColumn("delta", F.col("value") - F.lag("value").over(w))
    inc = (
        F.when(F.col("delta").isNull(), F.lit(0.0))
        .when(F.col("delta") < 0, F.col("value"))
        .otherwise(F.col("delta"))
    )
    # exact cents sum (r5): deltas of 2-dec values are 2-dec exact, so
    # the hourly increase is an order-free integer sum in both engines
    inc_cents = F.round(inc * 100, 0).cast("long")
    return (
        d.groupBy("source", "metric", F.date_trunc("hour", "ts").alias("h"))
        .agg((F.sum(inc_cents).cast("double") / F.lit(100.0)).alias("increase"))
        .select(
            "source",
            "metric",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            "increase",
        )
    )


# ---------------------------------------------------------------- C1 depth: seasonality profile

@query(
    "ts_hod_profile",
    "C1",
    oracle=_cte("""
    SELECT metric, CAST(extract(hour FROM ts) AS BIGINT) AS hod,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / CAST(100 * count(*) AS DOUBLE) AS avg_v,
           count(*) AS n
    FROM s GROUP BY metric, hod
    """),
)
def ts_hod_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per metric (SURVEY.md §2-C1
    variant): the aggregate dashboards draw diurnal baselines from.

    Scale: 5 metrics x 24 buckets — fully partial-aggregated, the
    shuffle carries 120 rows regardless of input size.
    """
    s = _series(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return s.groupBy("metric", F.hour("ts").cast("long").alias("hod")).agg(
        (
            F.sum(cents).cast("double") / (F.count(F.lit(1)) * 100).cast("double")
        ).alias("avg_v"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------- C4 depth: linear interpolation

@query(
    "ts_gapfill_linear",
    "C4",
    oracle=_cte("""
    , b AS (SELECT source, metric, date_trunc('hour', ts) AS h,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                       / CAST(100 * count(*) AS DOUBLE) AS v
            FROM s GROUP BY 1, 2, 3),
    bounds AS (SELECT source, metric, min(h) AS mn, max(h) AS mx
               FROM b GROUP BY 1, 2),
    grid AS (SELECT source, metric,
                    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
             FROM bounds),
    j AS (SELECT g.source, g.metric, g.h, b.v
          FROM grid g LEFT JOIN b ON b.source = g.source
               AND b.metric = g.metric AND b.h = g.h),
    f AS (SELECT source, metric, h,
                 CAST(round(v * 1000000, 0) AS BIGINT) AS v6,
                 CAST(round(last_value(v IGNORE NULLS) OVER wp * 1000000, 0)
                      AS BIGINT) AS pv6,
                 last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                     OVER wp AS ph,
                 CAST(round(first_value(v IGNORE NULLS) OVER wn * 1000000, 0)
                      AS BIGINT) AS nv6,
                 first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                     OVER wn AS nh
          FROM j
          WINDOW wp AS (PARTITION BY source, metric ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY source, metric ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    g2 AS (SELECT source, metric, h, v6, pv6, nv6,
                  date_diff('hour', ph, h)  AS dt_h,
                  date_diff('hour', ph, nh) AS span_h
           FROM f)
    SELECT source, metric, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s,
           CASE WHEN v6 IS NOT NULL THEN v6
                ELSE (2 * (pv6 * (span_h - dt_h) + nv6 * dt_h) + span_h)
                     // (2 * span_h)
           END AS v_interp_micro,
           (v6 IS NULL) AS was_gap
    FROM g2
    """),
)
def ts_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with linear interpolation (SURVEY.md §2-C4): hourly grid
    per series bounds (as ts_gapfill_ffill), gaps filled by interpolating
    between the bracketing observed buckets on the time axis.

    Grid endpoints are observed buckets by construction (bounds come from
    the data), so every gap has both brackets — no edge NULL branch.

    Values are carried as BIGINT micro-units (``round(v * 1e6)``) and the
    interpolation is exact integer arithmetic — ``(2*num + span) div
    (2*span)`` is round-half-up of num/span for the non-negative fixture
    domain — because double interpolation lands exactly on .xxxxxx5
    rounding ties (6-decimal inputs x dyadic time fractions) that Spark's
    BigDecimal HALF_UP and DuckDB's float rounding break differently.

    Scale: r17 interval-explode shape (guide §8; _gapfill_intervals).
    The old plan materialized the full grid, left-joined the observed
    buckets, and ran directional fills as window frames over the grid —
    and the backward fill was a SHRINKING frame
    (``first(...).over(rowsBetween(0, unboundedFollowing))``), which
    WindowExec evaluates by re-scanning the rest of the partition for
    EVERY row (UnboundedFollowingWindowFunctionFrame): O(rows^2) per
    series — 113.8 s at sf0.1 under the noop sink (~613-bucket grids x
    7,500 series). In the interval shape the bracketing pair is simply
    (v, lead(v)) on the OBSERVED buckets (<= |events| rows), the grid
    rows are generated already carrying it, and the full-grid work is
    pure projection: no join, no grid-sized sort, no quadratic frame.
    4 exchanges -> 2; sf0.1 noop-sink 113.8 s -> ~2.5 s. Corrupt
    timestamps fail loud via the shared _guarded_seq_start bucket cap.
    """
    s = _series(spark, sf_dir)
    _cents = F.round(F.col("value") * 100, 0).cast("long")
    # exact cents avg (r5): order-free, bit-identical across engines
    b = s.groupBy(
        "source", "metric", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(_cents).cast("double")
            / (F.count(F.lit(1)) * 100).cast("double")
        ).alias("v")
    )
    micro = lambda c: F.round(c * 1_000_000, 0).cast("long")  # noqa: E731
    g = _gapfill_intervals(b, extra_leads={"nv": "v"})
    # on gap rows (g > h): prev observed = interval start (h, v), next
    # observed = (nh, nv); identical to the old running/backward fills.
    dt_h = (F.unix_micros("g") - F.unix_micros("h")) / F.lit(HOUR_US)
    span_h = (F.unix_micros("nh") - F.unix_micros("h")) / F.lit(HOUR_US)
    g2 = g.select(
        "source",
        "metric",
        "g",
        (F.col("g") == F.col("h")).alias("obs"),
        micro(F.col("v")).alias("pv6"),
        micro(F.col("nv")).alias("nv6"),
        dt_h.cast("long").alias("dt_h"),
        span_h.cast("long").alias("span_h"),
    )
    return g2.select(
        "source",
        "metric",
        F.date_format("g", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        F.when(F.col("obs"), F.col("pv6"))
        .otherwise(
            F.expr("(2 * (pv6 * (span_h - dt_h) + nv6 * dt_h) + span_h) div (2 * span_h)")
        )
        .alias("v_interp_micro"),
        (~F.col("obs")).alias("was_gap"),
    )


# ---------------------------------------------------------------- C1 depth: OHLC bars

@query(
    "ts_ohlc_1h",
    "C1",
    oracle=_cte("""
    SELECT source, metric, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS hour_s,
           arg_min(value, ts_us) AS open_v,
           max(value)            AS high_v,
           min(value)            AS low_v,
           arg_max(value, ts_us) AS close_v,
           count(*)              AS n
    FROM s GROUP BY source, metric, date_trunc('hour', ts)
    """),
)
def ts_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per series (SURVEY.md §2-C1 depth) — the
    canonical TSDB downsample for anything chart-shaped.

    min_by/max_by give open/close as partial-aggregatable reductions —
    one hash aggregate, no window, no sort. (ts_us is unique per series
    in the fixtures, so arg_min/min_by agree without a tiebreak; raw
    values pass through unrounded, so parity is bit-exact.)
    """
    s = _series(spark, sf_dir)
    return (
        s.groupBy("source", "metric", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.min_by("value", "ts_us").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", "ts_us").alias("close_v"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "source",
            "metric",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "n",
        )
    )


# ---------------------------------------------------------------- C6 depth: as-of with tolerance

@query(
    "ts_asof_join_tolerance",
    "C6",
    oracle=_cte("""
    , c AS (SELECT source, ts_us, value FROM s WHERE metric = 'click'),
    p AS (SELECT source, ts_us, value FROM s WHERE metric = 'purchase')
    SELECT c.source, c.ts_us, c.value AS click_value,
           CASE WHEN c.ts_us - p.ts_us <= 86400000000
                THEN p.value END AS last_purchase_value,
           (p.ts_us IS NOT NULL AND c.ts_us - p.ts_us <= 86400000000)
               AS within_tolerance
    FROM c ASOF LEFT JOIN p
      ON c.source = p.source AND p.ts_us <= c.ts_us
    """),
)
def ts_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 24h tolerance (SURVEY.md §2-C6 depth): a match
    older than the tolerance is treated as no match — the pandas
    ``merge_asof(tolerance=...)`` semantic.

    Same single-shuffle union-and-fill as ts_asof_join, carrying the
    matched timestamp alongside the value (one struct fill, not two
    passes) so the tolerance is a post-filter, not a second join.
    """
    s = _series(spark, sf_dir)
    tol_us = 24 * HOUR_US
    clicks = s.where(F.col("metric") == "click").select(
        "source", "ts_us", F.col("value").alias("click_value"),
        F.lit(1).alias("is_click"),
        F.lit(None).cast("struct<ts_us:bigint,v:double>").alias("p"),
    )
    purchases = s.where(F.col("metric") == "purchase").select(
        "source", "ts_us", F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("is_click"),
        F.struct(F.col("ts_us").alias("ts_us"), F.col("value").alias("v")).alias("p"),
    )
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("source")
        .orderBy("ts_us", "is_click")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        u.withColumn("lp", F.last("p", ignorenulls=True).over(w))
        .where(F.col("is_click") == 1)
    )
    in_tol = (F.col("ts_us") - F.col("lp.ts_us")) <= tol_us
    return filled.select(
        "source",
        "ts_us",
        "click_value",
        F.when(in_tol, F.col("lp.v")).alias("last_purchase_value"),
        F.coalesce(in_tol, F.lit(False)).alias("within_tolerance"),
    )


# ---------------------------------------------------------------- C10 depth: value histogram

@query(
    "ts_value_histogram",
    "C10",
    oracle=_cte("""
    SELECT metric, CAST(floor(value / 25.0) * 25 AS BIGINT) AS bucket_lo,
           count(*) AS n
    FROM s GROUP BY 1, 2
    """),
)
def ts_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per metric (SURVEY.md §2-C10): the
    distribution companion to the percentile summary. Bucket index is
    exact integer math on 2dp values — no float-boundary ambiguity.

    Scale: |metrics x buckets| groups — partial aggregation collapses
    everything map-side; the shuffle is measured in dozens of rows.
    """
    s = _series(spark, sf_dir)
    return s.groupBy(
        "metric",
        (F.floor(F.col("value") / 25.0) * 25).cast("long").alias("bucket_lo"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------- C10/G3: MAD via grouped-agg pandas UDF

@query(
    "ts_mad_per_metric",
    "C10",
    oracle=_cte("""
    SELECT metric, round(mad(value), 6) AS mad_v, count(*) AS n
    FROM s GROUP BY metric
    """),
)
def ts_mad_per_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per metric (SURVEY.md §2-C10 depth;
    §2-G3's grouped-agg pandas UDF example): median(|x - median(x)|) is
    a nested median no built-in aggregate expresses, so it runs as a
    GROUPED_AGG pandas UDF — Arrow batches in, one scalar out per group.
    DuckDB's native mad() is the independent oracle kernel.

    Rounding at 6 is tie-free here: medians of 2dp values are true
    <=3dp decimals, which can never sit on a 7th-digit-5 boundary.

    Scale: grouped-agg shuffles once on the group key like any hash
    aggregate; per-group memory is the group's value vector (bounded by
    series cardinality design, same note as EWMA).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        return float((v - v.median()).abs().median())

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count rides along as a UDF
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    s = _series(spark, sf_dir)
    return s.groupBy("metric").agg(
        F.round(mad("value"), 6).alias("mad_v"),
        n_rows("value").alias("n"),
    )


# ---------------------------------------------------------------- C9 depth: funnel

@query(
    "ts_funnel_signup_purchase",
    "C9",
    oracle=_cte("""
    , su AS (SELECT source, min(ts_us) AS signup_us
             FROM s WHERE metric = 'signup' GROUP BY source),
    pu AS (SELECT source, min(ts_us) AS purchase_us
           FROM s WHERE metric = 'purchase' GROUP BY source)
    SELECT su.source, su.signup_us,
           pu.purchase_us,
           (pu.purchase_us IS NOT NULL AND pu.purchase_us >= su.signup_us
            AND pu.purchase_us - su.signup_us <= 604800000000) AS converted_7d
    FROM su LEFT JOIN pu ON su.source = pu.source
    """),
)
def ts_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (SURVEY.md §2-C9 depth): per user, first signup
    and first purchase, converted iff the purchase follows the signup
    within 7 days — the canonical product-analytics events query.

    Scale: two partial-aggregatable min()s + one equi-join on the user
    key; no window, no ordering. At 100 TB both aggregates collapse
    map-side to |users| rows before the shuffle.
    """
    s = _series(spark, sf_dir)
    su = (
        s.where(F.col("metric") == "signup")
        .groupBy("source")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    pu = (
        s.where(F.col("metric") == "purchase")
        .groupBy("source")
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    j = su.join(pu, "source", "left")
    week_us = 7 * 24 * HOUR_US
    return j.select(
        "source",
        "signup_us",
        "purchase_us",
        (
            F.col("purchase_us").isNotNull()
            & (F.col("purchase_us") >= F.col("signup_us"))
            & ((F.col("purchase_us") - F.col("signup_us")) <= week_us)
        ).alias("converted_7d"),
    )


# ---------------------------------------------------------------- C9 depth: cohort retention

@query(
    "ts_cohort_retention",
    "C9",
    oracle=_cte("""
    , firsts AS (SELECT source, date_trunc('week', min(ts)) AS cohort_week
                 FROM s GROUP BY source),
    active AS (SELECT DISTINCT source, date_trunc('week', ts) AS act_week FROM s)
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           count(DISTINCT f.source) AS n_users,
           count(DISTINCT CASE WHEN a.act_week = f.cohort_week + INTERVAL 7 DAY
                               THEN a.source END) AS n_retained_w1
    FROM firsts f JOIN active a ON f.source = a.source
    GROUP BY f.cohort_week
    """),
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (SURVEY.md §2-C9 depth): users grouped by
    first-activity week; how many were active again the following week.

    Scale: one aggregate for cohorts, one distinct for activity, one
    equi-join on the user key — every stage partial-aggregates on the
    same key, so the whole query is a single shuffle chain with
    |users|-bounded intermediates.
    """
    s = _series(spark, sf_dir)
    firsts = s.groupBy("source").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = s.select(
        "source", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    j = firsts.join(active, "source")
    next_week = F.col("cohort_week") + F.expr("INTERVAL 7 DAY")
    return j.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week")
    ).agg(
        F.countDistinct("source").alias("n_users"),
        F.countDistinct(
            F.when(F.col("act_week") == next_week, F.col("source"))
        ).alias("n_retained_w1"),
    )


# ---------------------------------------------------------------- C3 depth: instantaneous rate

@query(
    "ts_irate",
    "C3",
    oracle=_cte("""
    , r AS (SELECT source, metric, ts_us, value,
                   row_number() OVER (PARTITION BY source, metric
                                      ORDER BY ts_us DESC, value DESC) AS rn
            FROM s)
    SELECT a.source, a.metric,
           (a.value - b.value)
           / (CAST(a.ts_us - b.ts_us AS DOUBLE) / 1000000.0) AS irate
    FROM r a JOIN r b
      ON a.source = b.source AND a.metric = b.metric
     AND a.rn = 1 AND b.rn = 2
    """),
)
def ts_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instantaneous rate (SURVEY.md §2-C3 depth, Prometheus ``irate``):
    per-second delta of each series' LAST TWO points — the "current
    speed" read for dashboards, immune to long-range averaging.

    Scale: one (source, metric) window pass keeping rn <= 2, then a
    self-join on the two ranks — a single shuffle; one-point series drop
    out via the inner join. Unrounded: both engines divide the same two
    doubles by the same exact integer-derived denominator.
    """
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source", "metric").orderBy(
        F.col("ts_us").desc(), F.col("value").desc()
    )
    r = s.select(
        "source", "metric", "ts_us", "value", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 2)
    a = r.where(F.col("rn") == 1).select(
        "source", "metric", F.col("ts_us").alias("ts_a"), F.col("value").alias("va")
    )
    b = r.where(F.col("rn") == 2).select(
        "source", "metric", F.col("ts_us").alias("ts_b"), F.col("value").alias("vb")
    )
    return a.join(b, ["source", "metric"]).select(
        "source",
        "metric",
        (
            (F.col("va") - F.col("vb"))
            / ((F.col("ts_a") - F.col("ts_b")).cast("double") / F.lit(1000000.0))
        ).alias("irate"),
    )


# ---------------------------------------------------------------- C1 depth: hypertable rollup cascade

@query(
    "ts_rollup_cascade",
    "C1",
    oracle=f"""
    WITH s AS ({SERIES_SQL})
    SELECT metric,
           CASE WHEN GROUPING(date_trunc('day', ts)) = 0
                THEN strftime(date_trunc('day', ts), '%Y-%m-%d') END AS day_s,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
           END AS hour_s,
           CAST(GROUPING(date_trunc('day', ts)) * 2
                + GROUPING(date_trunc('hour', ts)) AS BIGINT) AS lvl,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM s
    GROUP BY ROLLUP (metric, date_trunc('day', ts), date_trunc('hour', ts))
    HAVING GROUPING(metric) = 0
    """,
)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade (SURVEY.md §2-C1 depth): hourly,
    daily, and per-metric totals in ONE pass via ROLLUP(metric, day,
    hour) — the batch equivalent of a TimescaleDB continuous-aggregate
    hierarchy, where each resolution is the partial-aggregate of the
    finer one.

    Scale: ROLLUP computes all three levels from a single shuffle of the
    finest grouping (Spark expands grouping sets BEFORE the exchange, so
    the map-side combine still applies); a naive 3-query cascade would
    scan+shuffle three times. Sums are exact integer cents (parity rule:
    no order-dependent float accumulation in hash-compared output).
    """
    s = tables.series(spark, sf_dir)
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    g = (
        s.select(
            "metric",
            day.alias("d"),
            hour.alias("h"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .rollup("metric", "d", "h")
        .agg(
            F.grouping("d").alias("gd"),
            F.grouping("h").alias("gh"),
            F.grouping("metric").alias("gm"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .where(F.col("gm") == 0)
    )
    return g.select(
        "metric",
        F.when(F.col("gd") == 0, F.date_format("d", "yyyy-MM-dd")).alias("day_s"),
        F.when(F.col("gh") == 0, F.date_format("h", "yyyy-MM-dd HH:mm:ss")).alias(
            "hour_s"
        ),
        (F.col("gd") * 2 + F.col("gh")).cast("long").alias("lvl"),
        "n",
        "sum_cents",
    )


# ---------------------------------------------------------------- C6 depth: forward as-of join

@query(
    "ts_asof_join_forward",
    "C6",
    oracle=_cte("""
    , c AS (SELECT source, ts_us, value FROM s WHERE metric = 'click'),
    p AS (SELECT source, ts_us, value FROM s WHERE metric = 'purchase')
    SELECT c.source, c.ts_us, c.value AS click_value,
           p.value AS next_purchase_value
    FROM c ASOF LEFT JOIN p
      ON c.source = p.source AND p.ts_us >= c.ts_us
    """),
)
def ts_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (SURVEY.md §2-C6 depth): each click gets the
    user's NEXT purchase value at-or-after it — the attribution
    direction (what did this click lead to), mirroring ts_asof_join's
    backward fill.

    Same union-and-fill shape, reversed: backward-fill via first(...,
    ignorenulls) over the FOLLOWING frame. Ties: a same-µs purchase
    sorts after the click (is_click desc at equal ts), matching ASOF's
    inclusive `>=`. One shuffle on source, bounded state.
    """
    s = _series(spark, sf_dir)
    clicks = s.where(F.col("metric") == "click").select(
        "source", "ts_us", F.col("value").alias("click_value"),
        F.lit(1).alias("is_click"), F.lit(None).cast("double").alias("pv"),
    )
    purchases = s.where(F.col("metric") == "purchase").select(
        "source", "ts_us", F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("is_click"), F.col("value").alias("pv"),
    )
    u = clicks.unionByName(purchases)
    # r17: same shrinking-frame fix as ts_gapfill_linear — the forward
    # lookup ran as ``first(...).over(rowsBetween(0,
    # unboundedFollowing))``, an O(rows^2)-per-partition frame. The
    # descending sort (exact reverse of the total order: (source,
    # ts_us) is unique in the series fixture, verified at sf0.01/sf0.1)
    # makes it ``last(..., ignorenulls)`` over a growing frame —
    # incremental O(rows), same single source shuffle, identical rows.
    # r18 (ADVICE r17 item 1): trailing pv/click_value tiebreaks make
    # the order TOTAL even off-fixture (duplicate purchase timestamps
    # per source would otherwise leave last(pv) partition-order-
    # dependent); a no-op wherever (source, ts_us, is_click) is already
    # unique, which the fixture verifies.
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("ts_us"), "is_click", "pv", "click_value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("next_purchase_value", F.last("pv", ignorenulls=True).over(w))
        .where(F.col("is_click") == 1)
        .select("source", "ts_us", "click_value", "next_purchase_value")
    )


# ---------------------------------------------------------------- C1 depth: time-weighted average

@query(
    "ts_time_weighted_avg",
    "C1",
    oracle=_cte("""
    , seg AS (SELECT source, metric,
                     CAST(round(value * 100, 0) AS BIGINT) AS cents,
                     lead(ts_us) OVER (PARTITION BY source, metric
                                       ORDER BY ts_us, value) - ts_us AS dt_us
              FROM s)
    SELECT source, metric,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(cents * dt_us) AS BIGINT) AS weighted_cents_us,
           CAST(sum(dt_us) AS BIGINT) AS span_us,
           CAST(sum(cents * dt_us) AS DOUBLE) / CAST(sum(dt_us) AS DOUBLE)
               / 100.0 AS twa
    FROM seg WHERE dt_us IS NOT NULL
    GROUP BY source, metric
    HAVING sum(dt_us) > 0
    """),
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series (SURVEY.md §2-C1 depth): each
    point's value is held until the next point (step interpolation) and
    weighted by that duration — the TSDB aggregate for irregular
    sampling, where a plain avg over-weights bursts.

    Parity: value-cents x duration-µs products and their sums are exact
    BIGINTs on both engines; the only float op is ONE final division of
    identical integers. Window tiebreak (ts_us, value) is total.

    Scale: one shuffle on the series key for the lead(), then a partial
    aggregate — same two-stage shape as ts_delta/ts_rate.
    """
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source", "metric").orderBy("ts_us", "value")
    seg = s.select(
        "source",
        "metric",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return (
        seg.groupBy("source", "metric")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.col("cents") * F.col("dt_us")).cast("long").alias(
                "weighted_cents_us"
            ),
            F.sum("dt_us").cast("long").alias("span_us"),
        )
        .where(F.col("span_us") > 0)
        .withColumn(
            "twa",
            F.col("weighted_cents_us").cast("double")
            / F.col("span_us").cast("double")
            / F.lit(100.0),
        )
    )


# ---------------------------------------------------------------- C1 depth: LTTB downsampling

def lttb(df: DataFrame, n_out: int = 64) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    standard visualization-grade reducer (keeps the visually dominant
    point per bucket; first/last always kept). The selection of bucket
    i's point depends on the point chosen in bucket i-1, an inherently
    sequential recurrence -> grouped-map Pandas UDF per series (the
    same sanctioned slow path as EWMA; everything else in this module
    is pure Catalyst).

    Scale: one shuffle on the series key; per-group work is O(len);
    memory O(largest series) per executor — bucket-split long series
    and chain edge points if a single series outgrows an executor.
    """
    import numpy as np

    schema = "source string, metric string, ts_us long, value double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "value"]).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[["source", "metric", "ts_us", "value"]]
        x = pdf["ts_us"].to_numpy(dtype="float64")
        y = pdf["value"].to_numpy(dtype="float64")
        # n_out-2 interior buckets over points 1..n-1
        edges = np.linspace(1, n - 1, n_out - 1).astype(int)
        chosen = [0]
        prev = 0
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nxt_lo, nxt_hi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
            ax, ay = x[prev], y[prev]
            cx, cy = x[nxt_lo:nxt_hi].mean(), y[nxt_lo:nxt_hi].mean()
            bx, by = x[lo:hi], y[lo:hi]
            area = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
            prev = lo + int(np.argmax(area))
            chosen.append(prev)
        chosen.append(n - 1)
        out = pdf.iloc[chosen]
        return out[["source", "metric", "ts_us", "value"]]

    return df.groupBy("source", "metric").applyInPandas(run, schema)


_LTTB_ORACLE = """
    WITH RECURSIVE
    s AS (SELECT event_type AS metric,
                 CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
                 CAST(round(value * 100, 0) AS BIGINT) AS cents
          FROM events),
    p AS (SELECT metric, ts_us, cents,
                 row_number() OVER (PARTITION BY metric
                                    ORDER BY ts_us, cents) - 1 AS idx,
                 count(*) OVER (PARTITION BY metric) AS n
          FROM s),
    ed AS (SELECT mn.metric, mn.n, t.i,
                  1 + (t.i * (mn.n - 2)) // 62 AS e
           FROM (SELECT DISTINCT metric, n FROM p WHERE n > 64) mn,
                range(63) t(i)),
    pb AS (SELECT p.metric, p.idx, p.ts_us, p.cents,
                  (SELECT max(e2.i) FROM ed e2
                   WHERE e2.metric = p.metric AND e2.e <= p.idx
                     AND e2.i <= 61) AS b
           FROM p WHERE p.idx >= 1 AND p.idx <= p.n - 2 AND p.n > 64),
    bs AS (SELECT metric, b,
                  CAST(sum(ts_us) AS HUGEINT) AS sx,
                  CAST(sum(cents) AS HUGEINT) AS sy,
                  CAST(count(*) AS HUGEINT) AS cnt
           FROM pb GROUP BY 1, 2),
    lastp AS (SELECT metric, ts_us, cents FROM p
              WHERE idx = n - 1 AND n > 64),
    nb AS (SELECT metric, b - 1 AS b, sx, sy, cnt FROM bs WHERE b >= 1
           UNION ALL
           SELECT metric, 61, CAST(ts_us AS HUGEINT),
                  CAST(cents AS HUGEINT), CAST(1 AS HUGEINT)
           FROM lastp),
    anch AS (SELECT metric, b + 1 AS b, idx AS a_idx, ts_us AS ax,
                    cents AS ay
             FROM pb WHERE b <= 60
             UNION ALL
             SELECT metric, 0, idx, ts_us, cents FROM p
             WHERE idx = 0 AND n > 64),
    trans AS (
      SELECT metric, b, a_idx, idx, ts_us, cents
      FROM (SELECT sc.*,
                   row_number() OVER (PARTITION BY sc.metric, sc.b, sc.a_idx
                                      ORDER BY sc.area DESC, sc.idx) AS rn
            FROM (SELECT an.metric, an.b, an.a_idx, c.idx, c.ts_us,
                         c.cents,
                         abs((CAST(an.ax AS HUGEINT) * nb.cnt - nb.sx)
                               * (CAST(c.cents AS HUGEINT) - an.ay)
                             - (CAST(an.ax AS HUGEINT) - c.ts_us)
                               * (nb.sy - nb.cnt * an.ay)) AS area
                  FROM anch an
                  JOIN pb c ON c.metric = an.metric AND c.b = an.b
                  JOIN nb ON nb.metric = an.metric AND nb.b = an.b) sc)
      WHERE rn = 1),
    chain AS (
      SELECT t.metric, t.b, t.idx, t.ts_us, t.cents
      FROM trans t WHERE t.b = 0
      UNION ALL
      SELECT t.metric, t.b, t.idx, t.ts_us, t.cents
      FROM chain c
      JOIN trans t ON t.metric = c.metric AND t.b = c.b + 1
                  AND t.a_idx = c.idx)
    SELECT metric, ts_us, cents FROM (
      SELECT metric, ts_us, cents FROM p WHERE n <= 64
      UNION ALL
      SELECT metric, ts_us, cents FROM p WHERE idx = 0 AND n > 64
      UNION ALL
      SELECT metric, ts_us, cents FROM chain
      UNION ALL
      SELECT metric, ts_us, cents FROM lastp
    )
    """


@query("ts_lttb_downsample", "C1", oracle=_LTTB_ORACLE)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsample to 64 points per metric — exact-integer variant
    (SURVEY.md §2-C1 depth). Selection is the true sequential LTTB
    recurrence (bucket i's pick anchors bucket i+1's triangles), run per
    metric (~2k points -> 64) so the recurrence genuinely executes on
    the fixture, unlike per-(source,metric) groups which are all <64
    points.

    Parity (upgraded from rows-only, r2 VERDICT item 2): timestamps in
    exact µs, values in integer cents, integer bucket edges
    ``1 + (i*(n-2)) div 62`` (no float linspace), and triangle areas as
    |(ax*cnt - sx)*(yb - ay) - (ax - xb)*(sy - cnt*ay)| in unbounded
    Python ints — mirrored bit-for-bit by a DuckDB recursive CTE
    (HUGEINT arithmetic) that precomputes per-(bucket, anchor) argmax
    transitions then path-follows the anchor chain. Ties break to the
    lowest index in both engines.

    Scale: one shuffle on the series key; per-group work is O(len) —
    same sanctioned grouped-pandas path as EWMA. The oracle's
    transition-table trick is oracle-only; Spark runs the linear scan.
    """
    s = _series(spark, sf_dir).select(
        "metric",
        "ts_us",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "cents"]).reset_index(drop=True)
        n = len(pdf)
        if n <= 64:
            return pdf[["metric", "ts_us", "cents"]]
        xs = [int(v) for v in pdf["ts_us"]]
        ys = [int(v) for v in pdf["cents"]]
        m = n - 2
        edges = [1 + (i * m) // 62 for i in range(63)]
        chosen = [0]
        prev = 0
        for b in range(62):
            lo, hi = edges[b], edges[b + 1]
            nlo = edges[b + 1]
            nhi = edges[b + 2] if b + 2 < 63 else n
            cnt = nhi - nlo
            sx = sum(xs[nlo:nhi])
            sy = sum(ys[nlo:nhi])
            ax, ay = xs[prev], ys[prev]
            best, best_area = lo, -1
            for i in range(lo, hi):
                area = abs(
                    (ax * cnt - sx) * (ys[i] - ay)
                    - (ax - xs[i]) * (sy - cnt * ay)
                )
                if area > best_area:
                    best_area, best = area, i
            chosen.append(best)
            prev = best
        chosen.append(n - 1)
        return pdf.iloc[chosen][["metric", "ts_us", "cents"]]

    return s.groupBy("metric").applyInPandas(
        run, "metric string, ts_us long, cents long"
    )


# ---------------------------------------------------------------- C10 depth: activity heatmap grid

@query(
    "ts_heatmap_dow_hour",
    "C10",
    oracle=f"""
    WITH s AS ({SERIES_SQL})
    SELECT metric,
           CAST(date_part('dow', ts) AS BIGINT) AS dow,
           CAST(date_part('hour', ts) AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM s
    GROUP BY 1, 2, 3
    """,
)
def ts_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap per metric (SURVEY.md
    §2-C10 depth): the weekly-seasonality grid every ops dashboard draws.
    Calendar convention trap: Spark ``dayofweek`` is 1=Sunday, DuckDB
    ``date_part('dow')`` is 0=Sunday — normalized to the DuckDB form.

    Scale: single hash aggregate to |metrics| x 168 cells; partial
    map-side combine makes the exchange carry only the tiny grid.
    """
    s = tables.series(spark, sf_dir)
    return (
        s.groupBy(
            "metric",
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias(
                "sum_cents"
            ),
        )
    )


# -------------------------------------- C10: cross-metric correlation matrix

@query(
    "ts_corr_metric_pairs",
    "C10",
    oracle=_cte("""
    , b AS (
      SELECT ts_us // 3600000000 AS hour_id, metric,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM s GROUP BY 1, 2
    ), p AS (
      SELECT a.metric AS metric_a, b.metric AS metric_b,
             a.cents AS x, b.cents AS y
      FROM b a JOIN b b ON a.hour_id = b.hour_id AND a.metric < b.metric
    ), g AS (
      SELECT metric_a, metric_b,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1, 2
    )
    SELECT metric_a, metric_b, n_buckets,
           CASE WHEN (n_buckets * sxx - sx * sx) = 0
                  OR (n_buckets * syy - sy * sy) = 0 THEN NULL
                ELSE
                  CAST(n_buckets * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n_buckets * sxx - sx * sx AS DOUBLE)
                         * CAST(n_buckets * syy - sy * sy AS DOUBLE))
           END AS pearson_r
    FROM g
    """),
)
def ts_corr_metric_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-metric Pearson correlation matrix (SURVEY.md §2-C10 depth):
    align every metric pair on tumbling hourly buckets (sum of values)
    and correlate the aligned series — the "which signals move together"
    primitive behind alert correlation and metric clustering in a
    catena-class TSDB.

    Parity: bucket sums are exact integer cents; all five co-moment
    sums (sx, sy, sxy, sxx, syy) stay BIGINT-exact on both engines, so
    the only float work is one identical cast/multiply/sqrt/divide
    expression over identical integers — bit-identical, emitted raw (r5).
    BIGINT headroom: at sf0.1 the co-moments peak ~1e17 of 9.2e18; for
    petabyte-scale deployments bucket sums would be carried in larger
    units (dollars, not cents) or Decimal(38).

    Scale: one shuffle to (hour, metric) bucket sums (partial agg
    collapses map-side), then the pair join runs on the tiny bucketed
    table (|hours| x |metrics| rows, e.g. 3.5k at sf0.1) — the classic
    pre-aggregate-before-self-join shape that keeps the O(m^2) pair
    blow-up off the raw-point table no matter how many points there are.
    """
    s = _series(spark, sf_dir)
    b = s.groupBy(
        F.expr("ts_us div 3600000000").alias("hour_id"),
        "metric",
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("cents")
    )
    a, bb = b.alias("a"), b.alias("b")
    pairs = a.join(
        bb,
        (F.col("a.hour_id") == F.col("b.hour_id"))
        & (F.col("a.metric") < F.col("b.metric")),
    ).select(
        F.col("a.metric").alias("metric_a"),
        F.col("b.metric").alias("metric_b"),
        F.col("a.cents").alias("x"),
        F.col("b.cents").alias("y"),
    )
    g = pairs.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    var_x = F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n_buckets") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")
    return g.select(
        "metric_a",
        "metric_b",
        "n_buckets",
        F.when((var_x == 0) | (var_y == 0), F.lit(None).cast("double"))
        .otherwise(
            # raw (r5): one identical float expression over exact ints is
            # bit-identical across engines; rounding it only added risk
            cov.cast("double")
            / F.sqrt(var_x.cast("double") * var_y.cast("double"))
        )
        .alias("pearson_r"),
    )


# ------------------------------------------ C3: seasonal-naive forecast error

@query(
    "ts_seasonal_naive_error",
    "C3",
    oracle=_cte("""
    , b AS (
      SELECT ts_us // 3600000000 AS hour_id, metric,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM s GROUP BY 1, 2
    ), f AS (
      SELECT a.metric, a.cents AS actual, p.cents AS forecast
      FROM b a JOIN b p ON a.metric = p.metric AND a.hour_id = p.hour_id + 24
    )
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS sum_abs_err_cents,
           CAST(sum(abs(actual - forecast)) AS BIGINT) // count(*) AS mae_cents,
           CAST(sum((2000000 * abs(actual - forecast))
                    // (actual + forecast)) AS BIGINT) // count(*) AS smape_ppm
    FROM f GROUP BY 1
    """),
)
def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest (SURVEY.md §2-C3 depth): predict
    each hourly bucket with the value 24 h earlier and score MAE and
    sMAPE per metric — the standard accuracy floor every real
    forecasting model must beat, and the cheapest drift detector (error
    spikes = regime change) a TSDB can serve.

    Parity: bucket sums are integer cents; |err| sums, floor-div MAE,
    and per-row ppm sMAPE (2e6*|a-f| // (a+f), positive-domain safe) are
    all BIGINT-exact on both engines — no floats anywhere.

    Scale: same pre-aggregate shape as the correlation matrix — one
    shuffle to hourly bucket sums, then a self-join keyed (metric,
    hour_id) over the small bucket table; the 24-row lag never touches
    raw points. The join key includes metric, so co-partitioning makes
    it shuffle-local when the bucket table is already hash-distributed.
    """
    s = _series(spark, sf_dir)
    b = s.groupBy(
        F.expr("ts_us div 3600000000").alias("hour_id"),
        "metric",
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("cents")
    )
    a, p = b.alias("a"), b.alias("p")
    f = a.join(
        p,
        (F.col("a.metric") == F.col("p.metric"))
        & (F.col("a.hour_id") == F.col("p.hour_id") + 24),
    ).select(
        F.col("a.metric").alias("metric"),
        F.col("a.cents").alias("actual"),
        F.col("p.cents").alias("forecast"),
    )
    abs_err = F.abs(F.col("actual") - F.col("forecast"))
    return f.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n_forecasts"),
        F.sum(abs_err).cast("long").alias("sum_abs_err_cents"),
        F.expr("sum(abs(actual - forecast)) div count(*)")
        .cast("long")
        .alias("mae_cents"),
        F.expr(
            "sum((2000000 * abs(actual - forecast)) div (actual + forecast))"
            " div count(*)"
        )
        .cast("long")
        .alias("smape_ppm"),
    )


# ---------------------------------------------- C1 depth: M4 pixel downsample

@query(
    "ts_m4_downsample",
    "C1",
    oracle=_cte("""
    , c AS (
      SELECT metric, ts_us,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             min(ts_us) OVER (PARTITION BY metric) AS lo,
             max(ts_us) OVER (PARTITION BY metric) AS hi
      FROM s
    ), px AS (
      SELECT metric, ts_us, cents,
             CAST(((ts_us - lo) * 64) // (hi - lo + 1) AS BIGINT) AS pixel
      FROM c
    )
    SELECT metric, pixel,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(arg_min(cents, ts_us) AS BIGINT) AS first_cents,
           CAST(arg_max(cents, ts_us) AS BIGINT) AS last_cents,
           CAST(min(ts_us) AS BIGINT) AS first_ts_us,
           CAST(max(ts_us) AS BIGINT) AS last_ts_us
    FROM px GROUP BY metric, pixel
    """),
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization downsampling (SURVEY.md §2-C1 depth): split each
    metric's own time span into 64 equal-width pixel buckets and emit
    min/max/first/last per bucket — the error-free line-chart reduction
    (Jugel et al., VLDB 2014) that complements the curvature-driven
    ts_lttb_downsample with a fully oracle-checkable aggregate.

    Parity: pixel ids derive from exact integer µs arithmetic (the span
    normalization is integer-scaled BEFORE the floor-div, no float
    rounding), values are integer cents, and first/last tie-break on the
    unique-per-metric ts_us via min_by/arg_min — every output column is
    BIGINT-exact.

    Scale: one window + one aggregate, both partitioned by metric, so
    the whole plan rides a single exchange; per-pixel state is four
    scalars regardless of how many raw points collapse into the pixel —
    exactly why M4 is the scan-side reduction you run BEFORE shipping
    points to a renderer at 100 TB.
    """
    s = _series(spark, sf_dir)
    wm = Window.partitionBy("metric")
    c = s.select(
        "metric",
        "ts_us",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).withColumn("lo", F.min("ts_us").over(wm)).withColumn(
        "hi", F.max("ts_us").over(wm)
    )
    px = c.withColumn(
        "pixel",
        F.expr("((ts_us - lo) * 64) div (hi - lo + 1)").cast("long"),
    )
    return px.groupBy("metric", "pixel").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        F.min_by("cents", "ts_us").cast("long").alias("first_cents"),
        F.max_by("cents", "ts_us").cast("long").alias("last_cents"),
        F.min("ts_us").cast("long").alias("first_ts_us"),
        F.max("ts_us").cast("long").alias("last_ts_us"),
    )


# ------------------------------------------- C8 depth: CUSUM changepoint scan

@query(
    "ts_cusum_changepoint",
    "C8",
    oracle=_cte("""
    , b AS (
      SELECT metric, ts_us // 3600000000 AS hour_id,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM s GROUP BY 1, 2
    ), t AS (
      SELECT metric, hour_id, cents,
             CAST(count(*) OVER (PARTITION BY metric) AS BIGINT) AS n,
             CAST(sum(cents) OVER (PARTITION BY metric) AS BIGINT) AS total
      FROM b
    ), cs AS (
      SELECT metric, hour_id, n,
             sum(n * cents - total) OVER (
               PARTITION BY metric ORDER BY hour_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_k
      FROM t
    ), r AS (
      SELECT metric, hour_id, n, s_k,
             row_number() OVER (PARTITION BY metric
                                ORDER BY abs(s_k) DESC, hour_id) AS rn
      FROM cs
    )
    SELECT metric,
           CAST(n AS BIGINT) AS n_buckets,
           CAST(hour_id AS BIGINT) AS changepoint_hour,
           CAST(abs(s_k) AS BIGINT) AS max_abs_cusum_scaled,
           CAST(CASE WHEN s_k > 0 THEN 1 WHEN s_k < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS direction
    FROM r WHERE rn = 1
    """),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan (SURVEY.md §2-C8 depth): per metric,
    cumulative sum of deviations from the series mean over hourly
    buckets; the bucket where |CUSUM| peaks is the single best
    level-shift changepoint (Page 1954 / binary-segmentation step 1) —
    the regime-change primitive behind alert "this metric moved" logic.

    Parity: deviations are scaled by n (S_k = Σ n·xᵢ − k·total) so the
    running sum is BIGINT-exact — no mean division ever happens; the
    argmax tie-breaks on (abs desc, hour_id asc) identically on both
    engines. Headroom: |S_k| ≤ n·Σ|x| ~ 1e13 at sf0.1, far under 2^63.

    Scale: bucket-sum shuffle collapses map-side; the three windows and
    the argmax all share the metric partitioning, so after the bucket
    aggregate the whole scan is a single per-metric pipeline over
    |hours| rows — the raw-point volume never enters a window frame.
    """
    s = _series(spark, sf_dir)
    b = s.groupBy(
        "metric", F.expr("ts_us div 3600000000").alias("hour_id")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("cents")
    )
    wm = Window.partitionBy("metric")
    t = b.withColumn("n", F.count(F.lit(1)).over(wm).cast("long")).withColumn(
        "total", F.sum("cents").over(wm).cast("long")
    )
    wcs = (
        Window.partitionBy("metric")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cs = t.withColumn(
        "s_k", F.sum(F.col("n") * F.col("cents") - F.col("total")).over(wcs)
    )
    wr = Window.partitionBy("metric").orderBy(F.abs("s_k").desc(), "hour_id")
    return (
        cs.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "metric",
            F.col("n").alias("n_buckets"),
            F.col("hour_id").cast("long").alias("changepoint_hour"),
            F.abs("s_k").cast("long").alias("max_abs_cusum_scaled"),
            F.when(F.col("s_k") > 0, 1)
            .when(F.col("s_k") < 0, -1)
            .otherwise(0)
            .cast("long")
            .alias("direction"),
        )
    )


# ------------------------------------- B1 depth: event-sequence Markov model

@query(
    "ts_markov_transitions",
    "C9",
    oracle=_cte("""
    , o AS (
      SELECT source, metric,
             lag(metric) OVER (PARTITION BY source
                               ORDER BY ts_us, metric) AS prev
      FROM s
    ), p AS (
      SELECT prev, metric AS next, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev, next, n,
           (n * 1000000)
             // CAST(sum(n) OVER (PARTITION BY prev) AS BIGINT) AS prob_ppm
    FROM p
    """),
)
def ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition model over event sequences
    (SURVEY.md §2-C9 depth): per user, consecutive event-type pairs in
    time order, aggregated into a corpus transition matrix with ppm
    probabilities — the "what do users do next" primitive behind funnel
    discovery and next-event prediction, built on the same per-source
    ordering contract as sessionization.

    Parity: the lag ordering tie-breaks on (ts_us, metric) so it is
    deterministic even under timestamp collisions; counts and floor-div
    ppm are integer-exact.

    Scale: one shuffle to order per source (the lag window), then the
    pair aggregate collapses map-side to |event_types|² rows; the prob
    normalization is a window over that tiny matrix. Per-user state in
    the window is a single previous row.
    """
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("ts_us", "metric")
    o = s.select("source", "metric", F.lag("metric").over(w).alias("prev"))
    p = (
        o.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("metric").alias("next"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wp = Window.partitionBy("prev")
    return p.select(
        "prev",
        "next",
        "n",
        F.expr("n * 1000000").cast("long").alias("_num"),
        F.sum("n").over(wp).cast("long").alias("_den"),
    ).select(
        "prev",
        "next",
        "n",
        F.expr("_num div _den").alias("prob_ppm"),
    )


# --------------------------------------------- C2/C8 depth: OLS trend per metric

@query(
    "ts_trend_ols",
    "C8",
    oracle=_cte("""
    , b AS (
      SELECT metric, ts_us // 3600000000 AS x,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM s GROUP BY 1, 2
    ), g AS (
      SELECT metric,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM b GROUP BY 1
    )
    SELECT metric, n AS n_buckets,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
             CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_cents_per_hour,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
             (CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE)
           END AS intercept_cents
    FROM g
    """),
)
def ts_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric OLS trend line (SURVEY.md §2-C8 depth): least-squares
    slope and intercept of hourly bucket sums against the hour index —
    the capacity-planning / drift primitive ("how fast is this metric
    growing per hour") that pairs with ts_cusum_changepoint's level-
    shift detector.

    Parity: all five co-moments are BIGINT-exact; slope and intercept
    are each ONE identical float expression over identical integers
    (cast, multiply, divide) — bit-identical on both engines, raw,
    same proof as ts_corr_metric_pairs. Fixture x,y magnitudes keep
    n*sxy well inside 2^63. A single-bucket metric (zero x-variance)
    yields NULL slope/intercept EXPLICITLY on both sides (r5,
    self-review): Spark's 0/0 is NULL but DuckDB's IEEE 0/0 is NaN, so
    the undefined case must be guarded, exactly as
    ts_corr_metric_pairs already does.

    Scale: the classic sufficient-statistics shape — one shuffle to
    hourly buckets (map-side partial), one tiny aggregate to 5 numbers
    per metric; the regression itself never sees raw points, so the
    cost is the bucket aggregate no matter the history length.
    """
    s = _series(spark, sf_dir)
    b = s.groupBy(
        "metric", F.expr("ts_us div 3600000000").alias("x")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("y")
    )
    g = b.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / varx.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return g.select(
        "metric",
        F.col("n").alias("n_buckets"),
        # raw (r5): identical float expressions over exact integer
        # moments are bit-identical across engines — no round needed
        F.when(varx != 0, slope).alias("slope_cents_per_hour"),
        F.when(varx != 0, intercept).alias("intercept_cents"),
    )


# ----------------------------------- A5 depth: Gorilla-style compressibility

@query(
    "ts_compression_stats",
    "A5",
    oracle=_cte("""
    , o AS (
      SELECT source, metric, ts_us,
             ts_us - lag(ts_us) OVER (PARTITION BY source, metric
                                      ORDER BY ts_us) AS delta
      FROM s
    ), dd AS (
      SELECT source, metric,
             delta - lag(delta) OVER (PARTITION BY source, metric
                                      ORDER BY ts_us) AS dod
      FROM o WHERE delta IS NOT NULL
    ), buck AS (
      SELECT metric,
             CASE WHEN dod = 0 THEN 0
                  WHEN abs(dod) < 64 THEN 7
                  WHEN abs(dod) < 256 THEN 9
                  WHEN abs(dod) < 2048 THEN 12
                  ELSE 32 END AS bits
      FROM dd WHERE dod IS NOT NULL
    )
    SELECT metric, CAST(bits AS BIGINT) AS bits,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(bits) AS BIGINT) AS total_bits
    FROM buck GROUP BY 1, 2
    """),
)
def ts_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla/catena-extent compressibility audit (SURVEY.md §2-A5
    depth): per series, delta-of-delta of the microsecond timestamps
    bucketed into the Gorilla paper's variable-width encoding classes
    (0 bits for regular cadence, 7/9/12-bit windows, 32-bit escape) —
    the storage-engine diagnostic that predicts how well a TSDB's
    timestamp compression will do on this workload, i.e. the Spark-side
    view of the compressed-extent design catena implements natively.

    Parity: deltas, delta-of-deltas, CASE bucketing, counts and bit
    sums are all integer-exact; the lag ordering is the unique-per-
    series ts_us.

    Scale: one shuffle to (source, metric) for the two stacked lags
    (same partition, pipelined), then the bucket aggregate collapses
    map-side to |metrics|x4 rows. This is a full-scan diagnostic you
    run per-partition at compaction time, not per-query.
    """
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source", "metric").orderBy("ts_us")
    o = s.select(
        "source",
        "metric",
        "ts_us",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("delta"),
    )
    dd = o.where(F.col("delta").isNotNull()).select(
        "metric",
        (F.col("delta") - F.lag("delta").over(w)).alias("dod"),
    )
    bits = (
        F.when(F.col("dod") == 0, 0)
        .when(F.abs("dod") < 64, 7)
        .when(F.abs("dod") < 256, 9)
        .when(F.abs("dod") < 2048, 12)
        .otherwise(32)
    )
    return (
        dd.where(F.col("dod").isNotNull())
        .select("metric", bits.cast("long").alias("bits"))
        .groupBy("metric", "bits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
    )


# ------------------------------------------------- C4 depth: gap detection

@query(
    "ts_gap_report",
    "C4",
    oracle=_cte("""
    , b AS (
      SELECT DISTINCT metric, ts_us // 3600000000 AS hour_id FROM s
    ), g AS (
      SELECT metric, hour_id,
             hour_id - lag(hour_id) OVER (PARTITION BY metric
                                          ORDER BY hour_id) AS step
      FROM b
    )
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n_present_hours,
           CAST(count(*) FILTER (WHERE step > 1) AS BIGINT) AS n_gaps,
           CAST(coalesce(max(step) FILTER (WHERE step > 1), 1) - 1 AS BIGINT)
               AS max_gap_hours,
           CAST(coalesce(sum(step - 1) FILTER (WHERE step > 1), 0) AS BIGINT)
               AS total_missing_hours
    FROM g GROUP BY metric
    """),
)
def ts_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap DETECTION report (SURVEY.md §2-C4 depth): per metric, how
    many hourly buckets are missing, the longest outage, and the total
    missing hours — the monitoring-side complement of the gap-FILLING
    operators (ts_gapfill_ffill/linear): before you interpolate, you
    alert on the hole.

    Parity: hour ids, lag steps, filtered counts/sums are all integer-
    exact; FILTER (WHERE ...) is spelled as conditional aggregation in
    Spark with identical semantics.

    Scale: the distinct collapses map-side to |metric|x|hours| rows
    before the single metric-keyed shuffle that serves both the lag
    window and the final aggregate — raw points never enter a window.
    """
    s = _series(spark, sf_dir)
    b = s.select(
        "metric", F.expr("ts_us div 3600000000").alias("hour_id")
    ).distinct()
    w = Window.partitionBy("metric").orderBy("hour_id")
    g = b.withColumn("step", F.col("hour_id") - F.lag("hour_id").over(w))
    is_gap = F.col("step") > 1
    return g.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n_present_hours"),
        # count(when(...)), not sum(cast): sum over an all-NULL step
        # column (single present hour) is NULL where the oracle's
        # FILTERed count(*) is 0 (r5 — caught by the degenerate-input
        # cross-engine test)
        F.count(F.when(is_gap, F.lit(1))).cast("long").alias("n_gaps"),
        (
            F.coalesce(F.max(F.when(is_gap, F.col("step"))), F.lit(1)) - 1
        ).cast("long").alias("max_gap_hours"),
        F.coalesce(F.sum(F.when(is_gap, F.col("step") - 1)), F.lit(0))
        .cast("long")
        .alias("total_missing_hours"),
    )


# ---------------------------------------------- C1 depth: SAX symbolization

@query(
    "ts_sax_symbolize",
    "C1",
    oracle=_cte("""
    , b AS (
      SELECT metric, ts_us // 3600000000 AS hour_id,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM s GROUP BY 1, 2
    ), q AS (
      SELECT metric, hour_id,
             ntile(4) OVER (PARTITION BY metric
                            ORDER BY cents, hour_id) AS quartile
      FROM b
    )
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n_hours,
           string_agg(chr(CAST(96 + quartile AS INTEGER)), '' ORDER BY hour_id) AS sax_word
    FROM q GROUP BY metric
    """),
)
def ts_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (SURVEY.md §2-C1 depth): each metric's hourly
    sums discretized into per-metric quartile letters a-d and
    concatenated in time order into one symbolic word — the
    dimensionality reduction behind symbolic motif/anomaly mining
    (Lin et al. 2003), with rank-based (empirical-quantile) breakpoints
    instead of the Gaussian ones so the discretization stays exact.

    Parity: ntile over (cents, hour_id) is deterministic-integer on
    both engines; the word is assembled in explicit hour order on both
    (string_agg ORDER BY / array_sort on (hour_id, letter) structs).
    The output is a flat STRING — driver-hash-safe.

    Scale: bucket shuffle collapses map-side; the ntile window and the
    word assembly share the metric partitioning. Word length = bucket
    count (720 here) — bounded by the downsample grain, not raw data.
    """
    s = _series(spark, sf_dir)
    b = s.groupBy(
        "metric", F.expr("ts_us div 3600000000").alias("hour_id")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("cents")
    )
    w = Window.partitionBy("metric").orderBy("cents", "hour_id")
    q = b.withColumn("quartile", F.ntile(4).over(w))
    return q.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("hour_id", F.chr(F.lit(96) + F.col("quartile")).alias("ch")))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("sax_word"),
    )
