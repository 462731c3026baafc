"""Time-series invariants beyond oracle parity (SURVEY.md §5 items 3-4):
gap-fill grid properties, sessionization properties, EWMA vs pandas
reference, approx-percentile tolerance."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from catena_spark import tables
from catena_spark.operators import timeseries as ts
from tests.conftest import SF_SMALL


def test_gapfill_grid_complete_and_conservative(spark):
    out = ts.ts_gapfill_ffill(spark, SF_SMALL).cache()
    try:
        # grid completeness: per series, hours = span/3600 + 1
        bounds = out.groupBy("source", "metric").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("hour_s").alias("mn"),
            F.max("hour_s").alias("mx"),
        )
        bad = bounds.where(
            F.col("n")
            != (
                F.unix_timestamp("mx", "yyyy-MM-dd HH:mm:ss")
                - F.unix_timestamp("mn", "yyyy-MM-dd HH:mm:ss")
            )
            / 3600
            + 1
        )
        assert bad.count() == 0, "hourly grid has holes or extras"
        # ffill never invents: filled values on non-gap rows are the raw avgs
        assert out.where(~F.col("was_gap") & F.col("v_filled").isNull()).count() == 0
        # first bucket of each series is never a gap (grid starts at first point)
        firsts = out.groupBy("source", "metric").agg(F.min("hour_s").alias("hour_s"))
        j = out.join(firsts, ["source", "metric", "hour_s"])
        assert j.where(F.col("was_gap")).count() == 0
    finally:
        out.unpersist()


def test_sessionize_properties(spark):
    out = ts.ts_sessionize_30m(spark, SF_SMALL)
    ev = tables.series(spark, SF_SMALL)
    # every event lands in exactly one session
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    # sessions of one source never overlap: next start > prev end + 30min
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("start_us")
    gaps = out.withColumn("prev_end", F.lag("end_us").over(w)).where(
        F.col("prev_end").isNotNull()
        & (F.col("start_us") - F.col("prev_end") <= 1800 * 1000000)
    )
    assert gaps.count() == 0


def test_ewma_matches_pandas_reference(spark):
    out = (
        ts.ts_ewma(spark, SF_SMALL)
        .where((F.col("source") == "3") & (F.col("metric") == "view"))
        .orderBy("ts_us")
        .toPandas()
    )
    assert len(out) > 5
    ref = out["value"].ewm(alpha=0.3, adjust=False).mean()
    assert (out["ewma"] - ref).abs().max() < 1e-9


def test_percentile_approx_close_to_exact(spark):
    s = tables.series(spark, SF_SMALL)
    both = s.groupBy("metric").agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
    )
    pdf = both.toPandas()
    rel = ((pdf["approx"] - pdf["exact"]).abs() / pdf["exact"].abs()).max()
    assert rel < 0.05, f"approx p50 off by {rel:.3%}"


def test_asof_join_never_future(spark):
    out = ts.ts_asof_join(spark, SF_SMALL)
    s = tables.series(spark, SF_SMALL).withColumn("ts_us", F.unix_micros("ts"))
    p = s.where(F.col("metric") == "purchase").select(
        "source", F.col("ts_us").alias("p_ts"), F.col("value").alias("pv")
    )
    # joined value must exist among that user's purchases at ts<=click ts
    j = out.where(F.col("last_purchase_value").isNotNull()).join(
        p,
        (out.source == p.source)
        & (out.last_purchase_value == p.pv)
        & (p.p_ts <= out.ts_us),
        "left_semi",
    )
    assert j.count() == out.where(F.col("last_purchase_value").isNotNull()).count()


def test_lttb_shape_invariants(spark):
    """LTTB contract: ≤64 points per metric, first/last retained, every
    output point is an input point of the same metric."""
    from catena_spark.operators.timeseries import ts_lttb_downsample

    s = ts._series(spark, SF_SMALL).select(
        "metric", "ts_us", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    inp = {(r["metric"], r["ts_us"], r["cents"]) for r in s.collect()}
    bounds = {
        r["metric"]: (r["lo"], r["hi"], r["n"])
        for r in s.groupBy("metric")
        .agg(
            F.min("ts_us").alias("lo"),
            F.max("ts_us").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    out = ts_lttb_downsample(spark, SF_SMALL).collect()
    per_metric: dict = {}
    for r in out:
        key = (r["metric"], r["ts_us"], r["cents"])
        assert key in inp, "LTTB fabricated a point"
        per_metric.setdefault(r["metric"], []).append((r["ts_us"], r["cents"]))
    assert set(per_metric) == set(bounds)
    for mk, pts in per_metric.items():
        lo, hi, n = bounds[mk]
        assert len(pts) == min(64, n)
        tss = sorted(t for t, _ in pts)
        assert tss[0] == lo and tss[-1] == hi, "first/last not retained"


def test_lttb_actually_downsamples_long_series(spark):
    """A 500-point synthetic series (fixture series are all <64 points)
    must reduce to exactly 64 points, keep endpoints, and preserve the
    global extremes' neighborhood (the peak bucket keeps its peak)."""
    import math

    from catena_spark.operators.timeseries import lttb

    pts = [
        ("s1", "m1", i * 1_000_000, math.sin(i / 7.0) * 100.0 + (1000.0 if i == 250 else 0.0))
        for i in range(500)
    ]
    df = spark.createDataFrame(pts, "source string, metric string, ts_us long, value double")
    out = sorted((r["ts_us"], r["value"]) for r in lttb(df, 64).collect())
    assert len(out) == 64
    assert out[0][0] == 0 and out[-1][0] == 499 * 1_000_000
    src = dict((p[2], p[3]) for p in pts)
    assert all(src[t] == v for t, v in out), "fabricated point"
    # the spiked global max at i=250 dominates its bucket's triangle area
    assert any(t == 250 * 1_000_000 for t, _ in out)
