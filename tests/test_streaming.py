"""Structured-Streaming parity + recovery tests (SURVEY.md §5 item 5):
the same transformation through micro-batches equals the batch result;
checkpoint restart applies each input exactly once (the WAL contract)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from catena_spark import tables
from catena_spark.operators import timeseries as ts
from catena_spark.sources.ingest import EVENTS_DDL, stream_ingest_events
from catena_spark.streaming import (
    dedup_within_watermark,
    session_counts,
    streaming_ewma,
    windowed_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def chunks(spark, tmp_path_factory):
    """events sf0.001 split into 4 time-ordered parquet chunk files with
    increasing mtimes (file-source processes them oldest-first)."""
    root = tmp_path_factory.mktemp("stream_src")
    ev = tables.load(spark, SF_SMALL, "events").orderBy("ts").cache()
    n = ev.count()
    rows = ev.collect()
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    paths = []
    for i in range(4):
        chunk = spark.createDataFrame(rows[bounds[i] : bounds[i + 1]], schema=ev.schema)
        p = str(root / f"chunk_{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    ev.unpersist()
    # single flat dir of files, mtime-ordered
    flat = tmp_path_factory.mktemp("stream_flat")
    import glob
    import shutil

    files = []
    for i, p in enumerate(paths):
        (src,) = glob.glob(f"{p}/*.parquet")
        dst = str(flat / f"{i:02d}.parquet")
        shutil.copy(src, dst)
        t = time.time() + i
        os.utime(dst, (t, t))
        files.append(dst)
    return str(flat), files


def _run_stream(df, mode="complete", name="q"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_ingest_exactly_once_and_restart(spark, chunks, tmp_path):
    src, files = chunks
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    # phase 1: only first 3 files visible (4th moved out of the dir)
    hidden = str(tmp_path / os.path.basename(files[3]))
    os.rename(files[3], hidden)
    try:
        q = stream_ingest_events(spark, src, dest, ckpt)
        q.awaitTermination(120)
        n1 = spark.read.parquet(dest).count()
        ev = tables.load(spark, SF_SMALL, "events")
        n_total = ev.count()
        assert 0 < n1 < n_total
    finally:
        os.rename(hidden, files[3])
    # phase 2: restart with same checkpoint — F6 exactly-once recovery
    q = stream_ingest_events(spark, src, dest, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(dest)
    assert out.count() == n_total
    assert out.select("event_id").distinct().count() == n_total  # no dups


def test_windowed_counts_stream_equals_batch(spark, chunks):
    src, _ = chunks
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    _run_stream(windowed_counts(stream), "complete", "win_counts")
    got = {tuple(r) for r in spark.sql("select * from win_counts").collect()}
    batch = tables.load(spark, SF_SMALL, "events")
    want = {tuple(r) for r in windowed_counts(batch).collect()}
    assert got == want


def test_session_window_builtin_matches_sessionize(spark):
    """F3 vs C9: built-in session_window (batch mode) agrees with the
    lag-gap sessionization on per-source session count + sizes."""
    ev = tables.load(spark, SF_SMALL, "events").withColumnRenamed("user_id", "uid")
    built = (
        session_counts(ev.withColumnRenamed("uid", "user_id"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .withColumn("source", F.col("user_id").cast("string"))
        .select("source", "n_sessions", "n_events")
    )
    custom = (
        ts.ts_sessionize_30m(spark, SF_SMALL)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    assert sorted(map(tuple, built.collect())) == sorted(map(tuple, custom.collect()))


def test_dedup_within_watermark(spark, chunks, tmp_path):
    src, files = chunks
    # duplicate one chunk into the source dir => stream sees dup event_ids
    import shutil

    dup_dir = str(tmp_path / "dup_src")
    os.makedirs(dup_dir)
    for f in files[:2]:
        shutil.copy(f, os.path.join(dup_dir, os.path.basename(f)))
    shutil.copy(files[0], os.path.join(dup_dir, "dup_of_00.parquet"))
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(dup_dir)
        .withWatermark("ts", "10 minutes")
    )
    _run_stream(dedup_within_watermark(stream), "append", "dedup_out")
    out = spark.sql("select * from dedup_out")
    n_distinct = out.select("event_id").distinct().count()
    assert out.count() == n_distinct  # dups collapsed


def test_streaming_ewma_matches_batch(spark, chunks):
    src, _ = chunks
    stream = spark.readStream.schema(EVENTS_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    _run_stream(streaming_ewma(stream), "append", "ewma_out")
    got = spark.sql("select * from ewma_out")
    # final ewma per series (state carried across 4 micro-batches)
    w_final = got.groupBy("user_id", "event_type").agg(
        F.max(F.struct("ts_us", "ewma")).alias("last")
    )
    stream_final = {
        (str(r.user_id), r.event_type): r.last.ewma for r in w_final.collect()
    }
    batch = ts.ts_ewma(spark, SF_SMALL)
    b_final = batch.groupBy("source", "metric").agg(
        F.max(F.struct("ts_us", "ewma")).alias("last")
    )
    batch_final = {(r.source, r.metric): r.last.ewma for r in b_final.collect()}
    assert stream_final.keys() == batch_final.keys()
    for k, v in batch_final.items():
        assert abs(stream_final[k] - v) < 1e-9, k


def test_streaming_ewma_rocksdb_state_store(spark, chunks):
    """The SCALE.md streaming claim made executable: the custom stateful
    operator (applyInPandasWithState EWMA) runs UNCHANGED on the RocksDB
    state store provider — the provider production deployments use so
    state spills to local disk instead of executor heap — with state
    still carried correctly across 4 micro-batches (same final-EWMA
    parity as the default-provider test above)."""
    src, _ = chunks
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(EVENTS_DDL).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        _run_stream(streaming_ewma(stream), "append", "ewma_rocks_out")
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = spark.sql("select * from ewma_rocks_out")
    w_final = got.groupBy("user_id", "event_type").agg(
        F.max(F.struct("ts_us", "ewma")).alias("last")
    )
    stream_final = {
        (str(r.user_id), r.event_type): r.last.ewma for r in w_final.collect()
    }
    batch = ts.ts_ewma(spark, SF_SMALL)
    b_final = batch.groupBy("source", "metric").agg(
        F.max(F.struct("ts_us", "ewma")).alias("last")
    )
    batch_final = {(r.source, r.metric): r.last.ewma for r in b_final.collect()}
    assert stream_final.keys() == batch_final.keys()
    for k, v in batch_final.items():
        assert abs(stream_final[k] - v) < 1e-9, k


def test_rate_source_pipeline(spark):
    """F7: the rate source drives the same transformation stack — proves
    the ops are source-agnostic (file, rate, or Kafka at deployment)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).cast("bigint").alias("user_id"),
            F.lit("tick").alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    q = (
        windowed_counts(stream, width="1 second")
        .writeStream.format("memory")
        .queryName("rate_out")
        .outputMode("complete")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select * from rate_out").count() > 0:
                break
            time.sleep(0.5)
        out = spark.sql("select * from rate_out")
        assert out.count() > 0
        assert set(out.columns) == {"win_start", "event_type", "n", "sum_v"}
    finally:
        q.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """F1 — catena's late-write rejection, recast. The eviction boundary
    IS the partition-rotation moment: a late row arriving while its
    window is still in state merges (catena: write into a still-writable
    memory partition succeeds); a late row arriving AFTER the window was
    finalized+evicted is dropped — it neither re-opens the window nor
    re-emits it (catena: write into a rotated-out partition rejected).
    Asserted via append-mode uniqueness: the finalized window appears
    exactly once, with only the on-time count."""
    import datetime as dt
    import glob
    import shutil

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def mk(name, rows, mtime):
        df = spark.createDataFrame(
            [(i, ts_, u, "click", 1.0, "{}") for i, ts_, u in rows],
            schema=EVENTS_DDL,
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_mk"))
        (f,) = glob.glob(str(tmp_path / "tmp_mk" / "*.parquet"))
        shutil.copy(f, f"{src}/{name}")
        os.utime(f"{src}/{name}", (mtime, mtime))

    now = time.time()
    h = dt.timedelta(hours=1)
    mk("00.parquet", [(1, t0, 1), (2, t0 + 6 * h, 1)], now)        # seed 12:00 + advance
    mk("01.parquet", [(5, t0 + 7 * h, 1)], now + 2)                # evict 12:00 (n=1 emits)
    mk("02.parquet", [(3, t0 + dt.timedelta(seconds=5), 1)], now + 4)  # VERY late
    mk("03.parquet", [(6, t0 + 8 * h, 1)], now + 6)                # force later evictions
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    _run_stream(windowed_counts(stream, width="1 hour"), "append", "late_out")
    rows = [
        (r["win_start"], r["n"])
        for r in spark.sql("select * from late_out").collect()
    ]
    noon = [x for x in rows if x[0] == "2024-03-01 12:00:00"]
    # exactly one finalized emission, counting only the on-time event:
    # the late row was dropped, not merged and not re-emitted
    assert noon == [("2024-03-01 12:00:00", 1)], rows


def test_foreachbatch_upsert_latest(spark, chunks, tmp_path):
    """foreachBatch upsert (the production sink escape hatch): each
    micro-batch merges its per-series latest values into a state table;
    the final table equals the batch ts_latest_per_series — proving the
    merge logic is idempotent-correct across batch boundaries."""
    src, _ = chunks
    state_dir = str(tmp_path / "latest_state")

    def upsert(batch_df, batch_id):
        batch_latest = (
            batch_df.groupBy("user_id", "event_type")
            .agg(F.max(F.struct(F.col("ts").alias("ts"), F.col("value").alias("v"))).alias("pt"))
            .select("user_id", "event_type", F.col("pt.ts").alias("ts"), F.col("pt.v").alias("value"))
        )
        try:
            prev = batch_df.sparkSession.read.parquet(state_dir)
        except Exception:
            merged = batch_latest
        else:
            merged = (
                prev.unionByName(batch_latest)
                .groupBy("user_id", "event_type")
                .agg(F.max(F.struct("ts", "value")).alias("pt"))
                .select("user_id", "event_type", F.col("pt.ts").alias("ts"), F.col("pt.value").alias("value"))
            )
        merged.cache().count()  # materialize before overwriting the input
        merged.write.mode("overwrite").parquet(state_dir + ".tmp")
        import shutil

        shutil.rmtree(state_dir, ignore_errors=True)
        shutil.move(state_dir + ".tmp", state_dir)
        merged.unpersist()

    stream = spark.readStream.schema(EVENTS_DDL).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {
        (str(r["user_id"]), r["event_type"]): (r["ts"], r["value"])
        for r in spark.read.parquet(state_dir).collect()
    }
    want = {
        (r["source"], r["metric"]): (r["ts_us"], r["value"])
        for r in ts.ts_latest_per_series(spark, SF_SMALL).collect()
    }
    assert got.keys() == want.keys()
    for k, (ts_got, v_got) in got.items():
        ts_us = int(ts_got.timestamp() * 1_000_000)
        assert abs(ts_us - want[k][0]) < 1000 and v_got == want[k][1], k


def test_stream_static_enrich_matches_batch(spark, chunks):
    """F2 depth: the stream-static dimension join through micro-batches
    equals the batch result — the static side re-broadcasts per batch
    with no state store involved."""
    from catena_spark.streaming import static_enrich_counts, user_tier_dim

    src, _ = chunks
    ev_batch = tables.load(spark, SF_SMALL, "events")
    dim = user_tier_dim(ev_batch).cache()
    expected = {
        (r["win_start"], r["tier"]): (r["n"], r["sum_cents"])
        for r in static_enrich_counts(ev_batch, dim).collect()
    }
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = _run_stream(
        static_enrich_counts(stream, dim), mode="complete", name="enrich"
    )
    got = {
        (r["win_start"], r["tier"]): (r["n"], r["sum_cents"])
        for r in spark.sql("select * from enrich").collect()
    }
    dim.unpersist()
    q.stop()
    assert got == expected


def test_stream_interval_join_matches_batch(spark):
    """The live stream-stream interval join key must equal the batch
    interval join of the same fixture (inner joins emit exactly the
    matched pairs; watermarks only bound state)."""
    from catena_spark.streaming.ops import stream_live_interval_join

    live = sorted(
        tuple(r) for r in stream_live_interval_join(spark, SF_SMALL).collect()
    )
    ev = tables.load(spark, SF_SMALL, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    batch = (
        s.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            F.unix_micros("s_ts").alias("signup_us"),
            F.unix_micros("p_ts").alias("purchase_us"),
            F.round(F.col("p_value") * 100, 0).cast("long").alias("purchase_cents"),
        )
        .collect()
    )
    assert live == sorted(tuple(r) for r in batch)
    assert len(live) > 0


def test_stream_interval_join_multi_batch_complete(spark):
    """The interval join must stay COMPLETE when the source arrives as
    multiple micro-batches in non-chronological order — the span-covering
    watermark delay means no still-needed state is evicted between
    batches (guards the r3 review finding on inter-batch watermark
    advancement)."""
    import tempfile

    from pyspark.sql import functions as F

    ev = tables.load(spark, SF_SMALL, "events")
    tmp = tempfile.mkdtemp(prefix="catena-ssj-multi-")
    # two time-interleaved files: odd event_ids first, even second
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{tmp}/f1")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{tmp}/f2")
    import glob as _glob
    import shutil as _shutil

    src_dir = f"{tmp}/src"
    os.makedirs(src_dir)
    for i, part in enumerate(sorted(_glob.glob(f"{tmp}/f*/part-*.parquet"))):
        _shutil.copy(part, f"{src_dir}/{i}.parquet")

    schema = ev.schema
    def side(df, et):
        out = df.where(F.col("event_type") == et)
        if et == "signup":
            return out.select("user_id", F.col("ts").alias("s_ts")).withWatermark(
                "s_ts", "45 days"
            )
        return out.select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        ).withWatermark("p_ts", "45 days")

    def joined(df_s, df_p):
        return df_s.join(
            df_p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select(
            "user_id",
            F.unix_micros("s_ts").alias("signup_us"),
            F.unix_micros("p_ts").alias("purchase_us"),
        )

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if dict(reader.dtypes).get("ts") == "timestamp_ntz":
        reader = reader.withColumn("ts", F.col("ts").cast("timestamp"))
    stream_out = joined(side(reader, "signup"), side(reader, "purchase"))
    import tempfile as _tf

    name = f"ssj_multi_{os.getpid()}"
    q = (
        stream_out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _tf.mkdtemp(prefix="catena-ssj-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table(name).collect())
    exp = sorted(tuple(r) for r in joined(side(ev, "signup"), side(ev, "purchase")).collect())
    assert got == exp and len(got) > 0


def test_events_fixture_is_single_file():
    """Layout detector for stream_live_ewma_state's fast path: a single
    parquet file means one AvailableNow micro-batch, so the O(1)-state
    fold is used. Since r5 a multi-file fixture no longer breaks the key
    (the batch-count-invariant replay fold takes over — see
    test_ewma_replay_multi_batch); this test now only flags the layout
    drift so the slower fallback being exercised is a conscious fact,
    not a surprise."""
    from tests.conftest import SF_DRIVER

    for sf_dir in {SF_SMALL, SF_DRIVER}:
        p = os.path.join(sf_dir, "events.parquet")
        assert os.path.isfile(p), (
            f"{p} is no longer a single parquet file; stream_live_ewma_state "
            "now runs its replay fallback there — expected but worth knowing"
        )


def test_ewma_replay_multi_batch(spark, tmp_path):
    """Batch-count invariance (VERDICT r4 item 3): stream_live_ewma_state
    over a 3-file events.parquet DIRECTORY whose files interleave
    timestamps (round-robin split of the time-sorted fixture, one file
    per micro-batch via maxFilesPerTrigger=1) must produce exactly the
    rows the oracle-proven single-file path produces. The old O(1)-state
    fold would fold batch 2's earlier timestamps after batch 1's later
    ones and diverge; the replay fold cannot."""
    import pyarrow.parquet as pq

    from catena_spark.streaming.ops import stream_live_ewma_state

    tbl = pq.read_table(os.path.join(SF_SMALL, "events.parquet"))
    # sort by raw ts then deal rows round-robin: every file spans the
    # whole time range => guaranteed cross-batch interleaving
    import pyarrow.compute as pc

    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
    sf = tmp_path / "sf"
    d = sf / "events.parquet"
    d.mkdir(parents=True)
    n = tbl.num_rows
    for i in range(3):
        pq.write_table(tbl.take(list(range(i, n, 3))), str(d / f"part-{i}.parquet"))

    got = sorted(
        tuple(r) for r in stream_live_ewma_state(spark, str(sf)).collect()
    )
    exp = sorted(
        tuple(r) for r in stream_live_ewma_state(spark, SF_SMALL).collect()
    )
    assert len(got) == len(exp) > 0
    assert got == exp


def test_live_keys_read_multifile_events_dir(spark, tmp_path):
    """r13 (found by the permutation probe's splits axis, a REAL silent
    bug): with events.parquet as a part-file DIRECTORY — the only shape
    that exists at production scale — _stream_events's default path
    used pathGlobFilter='events.parquet', which matches LEAF file
    names, so the stream matched nothing and three live keys returned
    0 rows SILENTLY. Pin the directory fixture end-to-end: each live
    key's rows on a 3-file round-robin split equal its single-file
    rows (their watermark delays exceed the fixture span and the
    tumbling agg runs complete-mode, so batching cannot move values —
    the invariance their docstrings argue)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from catena_spark.streaming.ops import (
        stream_live_dedup_watermark,
        stream_live_interval_join,
        stream_live_tumbling_agg,
    )

    tbl = pq.read_table(os.path.join(SF_SMALL, "events.parquet"))
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
    sf = tmp_path / "sf"
    d = sf / "events.parquet"
    d.mkdir(parents=True)
    n = tbl.num_rows
    for i in range(3):
        pq.write_table(
            tbl.take(list(range(i, n, 3))), str(d / f"part-{i}.parquet")
        )

    for key_fn in (
        stream_live_tumbling_agg,
        stream_live_dedup_watermark,
        stream_live_interval_join,
    ):
        got = sorted(tuple(r) for r in key_fn(spark, str(sf)).collect())
        exp = sorted(tuple(r) for r in key_fn(spark, SF_SMALL).collect())
        assert len(got) == len(exp) > 0, key_fn.__name__
        assert got == exp, key_fn.__name__
