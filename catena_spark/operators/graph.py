"""Graph analytics over engine tables (SURVEY.md §2-C9/E depth).

The duplicate-cluster connected components (label propagation) live in
operators/llm.py; this module holds graph ops whose input graph is
DERIVED from the relational tables — here the event-type transition
graph (nodes = event types, weighted edges = consecutive-event counts
per user, the same derivation as ts_markov_transitions).

Scale notes: iterative graph algorithms on Spark are driver-loop
DataFrame self-joins — each iteration is one shuffle keyed by vertex.
A fixed small iteration count (PageRank-3 here) keeps lineage bounded;
long-running iterative jobs would checkpoint every ~10 iterations to
cut lineage growth. The vertex set here is tiny (|event_types|), so
every join broadcasts; at web-graph scale the same code hash-joins with
both sides partitioned by vertex id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..twophase import global_running_sum
from .timeseries import _series

#: total PageRank mass in integer micro-micro units (1e12): keeps every
#: per-edge contribution an exact BIGINT floor-division on both engines.
_MASS = 10**12


@query(
    "graph_pagerank_transitions",
    "C9",
    oracle=f"""
    WITH series AS (SELECT CAST(user_id AS VARCHAR) AS source,
                           event_type AS metric,
                           CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    s AS (SELECT *, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM series),
    o AS (SELECT source, metric,
                 lag(metric) OVER (PARTITION BY source
                                   ORDER BY ts_us, metric) AS prev
          FROM s),
    e AS (SELECT prev AS u, metric AS v, CAST(count(*) AS BIGINT) AS n
          FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
    ow AS (SELECT u, CAST(sum(n) AS BIGINT) AS ow FROM e GROUP BY 1),
    nodes AS (SELECT DISTINCT metric AS v FROM s),
    c AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
    p0 AS (SELECT v, CAST({_MASS} // (SELECT nn FROM c) AS BIGINT) AS pr
           FROM nodes),
    f1 AS (SELECT e.v, CAST(sum((p.pr * e.n) // w.ow) AS BIGINT) AS inflow
           FROM e JOIN p0 p ON e.u = p.v JOIN ow w ON e.u = w.u GROUP BY e.v),
    p1 AS (SELECT nd.v,
                  CAST((15 * ({_MASS} // (SELECT nn FROM c))) // 100
                       + (85 * coalesce(f.inflow, 0)) // 100 AS BIGINT) AS pr
           FROM nodes nd LEFT JOIN f1 f ON nd.v = f.v),
    f2 AS (SELECT e.v, CAST(sum((p.pr * e.n) // w.ow) AS BIGINT) AS inflow
           FROM e JOIN p1 p ON e.u = p.v JOIN ow w ON e.u = w.u GROUP BY e.v),
    p2 AS (SELECT nd.v,
                  CAST((15 * ({_MASS} // (SELECT nn FROM c))) // 100
                       + (85 * coalesce(f.inflow, 0)) // 100 AS BIGINT) AS pr
           FROM nodes nd LEFT JOIN f2 f ON nd.v = f.v),
    f3 AS (SELECT e.v, CAST(sum((p.pr * e.n) // w.ow) AS BIGINT) AS inflow
           FROM e JOIN p2 p ON e.u = p.v JOIN ow w ON e.u = w.u GROUP BY e.v),
    p3 AS (SELECT nd.v,
                  CAST((15 * ({_MASS} // (SELECT nn FROM c))) // 100
                       + (85 * coalesce(f.inflow, 0)) // 100 AS BIGINT) AS pr
           FROM nodes nd LEFT JOIN f3 f ON nd.v = f.v)
    SELECT v AS metric, pr AS pagerank_micro,
           CAST(row_number() OVER (ORDER BY pr DESC, v) AS BIGINT) AS rank
    FROM p3
    """,
)
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 unrolled iterations, damping 0.85) over the
    event-type transition graph — "which state do user journeys
    gravitate to" — the canonical iterative-graph operator expressed as
    driver-looped DataFrame joins (SURVEY.md §2-C9 depth; same edge
    derivation as ts_markov_transitions).

    Parity: rank mass lives in integer 1e-12 units; every per-edge
    contribution is an exact BIGINT floor-division BEFORE the
    order-independent integer sum, and the damping mix is integer too —
    so three iterations stay bit-exact on both engines (the oracle
    unrolls the identical three steps). Headroom: pr*n peaks ~2e17 at
    sf0.1 of the 9.2e18 BIGINT range; larger corpora would drop to 1e9
    mass units.

    Scale: each iteration = one join keyed by source vertex + one
    aggregate keyed by target vertex. Here the vertex set broadcasts;
    at billions of edges both sides hash-partition by vertex and the
    iteration cost is 2 shuffles — with lineage checkpointing every ~10
    rounds. The driver-side .count() fetches ONE scalar (|V|) to fold
    the teleport constant, not data.
    """
    s = _series(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("ts_us", "metric")
    o = s.select("source", "metric", F.lag("metric").over(w).alias("prev"))
    e = (
        o.where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("u"), F.col("metric").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ow = e.groupBy("u").agg(F.sum("n").cast("long").alias("ow"))
    ej = e.join(ow, "u").localCheckpoint(eager=True)  # edges reused 3x
    nodes = s.select(F.col("metric").alias("v")).distinct().localCheckpoint(eager=True)
    nn = nodes.count()
    if nn == 0:
        # empty input: an empty result with the output schema, not a
        # driver-side ZeroDivisionError (r5, self-review); the oracle's
        # aggregate over zero rows is equally empty
        return spark.createDataFrame(
            [], "metric string, pagerank_micro long, rank long"
        )
    base = (15 * (_MASS // nn)) // 100
    pr = nodes.withColumn("pr", F.lit(_MASS // nn).cast("long"))
    for _ in range(3):
        inflow = (
            ej.join(pr.withColumnRenamed("v", "u"), "u")
            .select("v", F.expr("(pr * n) div ow").alias("contrib"))
            .groupBy("v")
            .agg(F.sum("contrib").cast("long").alias("inflow"))
        )
        pr = nodes.join(inflow, "v", "left").select(
            "v",
            (
                F.lit(base).cast("long")
                + F.expr("85 * coalesce(inflow, 0L) div 100")
            ).cast("long").alias("pr"),
        )
    # Two-phase global rank (r2 VERDICT nit — no single-partition
    # window at any scale): running sum of 1 over the total order
    # (pr desc, v) == global row_number; the only driver fetch is one
    # row per partition (twophase.global_running_sum).
    ranked = global_running_sum(
        pr, [F.col("pr").desc(), F.col("v")], F.lit(1), "rank"
    )
    return ranked.select(
        F.col("v").alias("metric"),
        F.col("pr").alias("pagerank_micro"),
        "rank",
    )
