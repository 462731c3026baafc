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
