"""Relational core (SURVEY.md §2-D) — pure Catalyst built-ins.

Catena has no relational layer at all (SURVEY.md §2 exhaustiveness note);
these operators are mandated by the driver's oracle harness and are
deliberately zero-custom-engine-code: declare the plan, let Catalyst pick
pushdown/broadcast/sort-merge (SURVEY.md §4).

Scale notes are on each operator; the common ones:
- Filters sit directly on the scan so they push into Parquet row-group
  stats (verified in tests/test_plans.py).
- Dimension joins (region/nation/customer at catalog scale) broadcast —
  either by Catalyst threshold or explicit hint.
- Top-k goes through TakeOrderedAndProject (no global sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tables
from ..parity import ravg, rsum
from ..registry import query


@query(
    "agg_pricing_summary",
    "D7",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (TPC-H Q1 shape): multi-key hash aggregate over the fact
    table with a pushed-down date filter.

    Scale: map-side partial aggregation + tiny shuffle (|groups| = 6); the
    shipdate predicate reaches the Parquet scan (PushedFilters), so at
    100 TB only qualifying row groups are read. No ORDER BY — the driver
    hash is order-insensitive and a global sort of 6 rows is free anyway,
    but omitting it keeps the plan exchange-minimal.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rsum(F.col("l_quantity")).alias("sum_qty"),
            rsum(F.col("l_extendedprice")).alias("sum_base"),
            rsum(disc_price).alias("sum_disc_price"),
            rsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            ravg(F.col("l_quantity")).alias("avg_qty"),
            ravg(F.col("l_extendedprice")).alias("avg_price"),
            ravg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
