"""Bucketed (co-located) fact-fact join — the shuffle-elimination lever for
orders ⋈ lineitem at 100 TB.

The reference's Postgres gets co-location for free on one node; Spark has to
plan an Exchange on both fact tables for every orderkey join UNLESS the
tables were written bucketed on the join key. Writing
``bucketBy(N, key).sortBy(key)`` once at ingest amortizes that shuffle
across every downstream join/aggregate on the key: the join plans as a
SortMergeJoin with ZERO Exchange operators (asserted in
tests/test_plans.py). At 100 TB this is the difference between re-shuffling
~100 TB per query and reading co-partitioned files.

The bucketed copies live in the Spark warehouse, keyed by scale-factor tag
so sf0.001 tests and the sf0.01 driver don't collide. Creation is lazy and
idempotent (re-created only when the catalog lost the table — e.g. a fresh
in-memory catalog over an old warehouse dir).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

N_BUCKETS = 8

_DEC = "decimal(28,6)"


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/lineitem bucketed+sorted by orderkey (once per sf)."""
    tag = _sf_tag(sf_dir)
    names = (f"bkt_{tag}_orders", f"bkt_{tag}_lineitem")
    for table, src_name, key in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        if not spark.catalog.tableExists(table):
            # a fresh in-memory catalog may have orphaned the previous
            # session's warehouse dir; clear it or saveAsTable refuses
            warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            stale = os.path.join(warehouse.removeprefix("file:"), table)
            if os.path.isdir(stale):
                import shutil

                shutil.rmtree(stale)
            (
                load_table(spark, sf_dir, src_name)
                .write.format("parquet")
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(table)
            )
    return names


def bucketed_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue totals per order priority from the co-located orders ⋈
    lineitem join. Both scans report the bucket layout, so the SortMergeJoin
    runs shuffle-free; the only Exchange left is the final 5-row
    aggregation."""
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    orders = spark.table(orders_t)
    li = spark.table(lineitem_t)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(revenue.cast(_DEC)).cast("double").alias("revenue"),
        )
    )
