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


def test_degenerate_inputs_cross_engine_parity(spark, tmp_path):
    """r5 self-review regression net: cases where Spark and DuckDB
    previously disagreed only OUTSIDE the fixtures' data shapes —
    a gapless metric (gap_report oracle returned -1), a constant
    trailing window (zscore: NULL-dropped vs inf-kept), a single-bucket
    metric (trend_ols: NULL vs NaN), and tied timestamps (sessionize
    cumsum tiebreak). Runs each key AND its oracle on a synthetic
    events table engineered to hit all four, comparing exactly."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from catena_spark import registry
    from catena_spark.parity import norm_cell

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # user 1 / 'click': dense hourly points (gapless metric), constant
    # values (constant trailing window), one lone burst value
    for i in range(30):
        rows.append((100 + i, t0 + dt.timedelta(hours=i), 1, "click", 5.0))
    rows.append((130, t0 + dt.timedelta(hours=30), 1, "click", 500.0))
    # user 2 / 'view': single hourly bucket (zero x-variance for OLS)
    rows.append((200, t0, 2, "view", 1.0))
    rows.append((201, t0 + dt.timedelta(minutes=5), 2, "view", 2.0))
    # user 3: tied timestamps across metrics (sessionize tiebreak) —
    # distinct event_types so they don't pollute click's gaplessness or
    # view's single bucket
    tied = t0 + dt.timedelta(days=2)
    rows.append((300, tied, 3, "signup", 1.0))
    rows.append((301, tied, 3, "purchase", 2.0))
    rows.append((302, tied + dt.timedelta(hours=2), 3, "signup", 3.0))
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    sf = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(f"{sf}/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    specs = registry.specs()
    for key in (
        "ts_gap_report",
        "ts_zscore_outliers",
        "ts_trend_ols",
        "ts_sessionize_30m",
    ):
        spec = specs[key]
        sdf = spec.fn(spark, sf)
        cols = sorted(sdf.columns)
        got = sorted(
            tuple(norm_cell(r[c]) for c in cols) for r in sdf.collect()
        )
        cur = con.execute(spec.oracle)
        names = [d[0] for d in cur.description]
        order = sorted(range(len(names)), key=lambda i: names[i])
        exp = sorted(
            tuple(norm_cell(r[i]) for i in order) for r in cur.fetchall()
        )
        assert sorted(names) == cols, key
        assert got == exp, f"{key}: spark={got[:4]} oracle={exp[:4]}"
    con.close()


def test_gapfill_grid_span_guard(spark, monkeypatch):
    """Grid-explosion guard (r10, the corrupt-timestamp hazard class):
    one epoch-0 outlier in a series must fail loud at the configured
    bucket cap instead of materializing a decades-long sequence() array
    on one executor — and healthy spans must be untouched by the guard."""
    import datetime

    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bounds = spark.createDataFrame(
        [
            (
                "web",
                "cpu",
                datetime.datetime(1970, 1, 1),
                datetime.datetime(2026, 1, 1),
            )
        ],
        "source string, metric string, mn timestamp, mx timestamp",
    )
    monkeypatch.setenv("CATENA_GAPFILL_MAX_BUCKETS", "1000")
    with pytest.raises(SparkRuntimeException, match="CATENA_GAPFILL_MAX_BUCKETS"):
        ts._hourly_grid(bounds).count()
    # cap=0 disables the guard: the same pathological span explodes fine
    monkeypatch.setenv("CATENA_GAPFILL_MAX_BUCKETS", "0")
    assert ts._hourly_grid(bounds).count() == 490_897
    # healthy span under the default cap: exact grid, guard invisible
    monkeypatch.delenv("CATENA_GAPFILL_MAX_BUCKETS")
    small = spark.createDataFrame(
        [
            (
                "web",
                "cpu",
                datetime.datetime(2024, 1, 1, 0),
                datetime.datetime(2024, 1, 2, 23),
            )
        ],
        "source string, metric string, mn timestamp, mx timestamp",
    )
    assert ts._hourly_grid(small).count() == 48
