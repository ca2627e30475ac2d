"""SparkSession factory.

Scale posture: these configs are tuned for the local[32] test harness but the
knobs are the ones that matter on a 1000-executor cluster too — AQE for
runtime re-planning (skew joins, partition coalescing), explicit shuffle
partition sizing, Arrow for any Python boundary, and UTC session time so
date semantics are engine-independent (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "airdatapipeline_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the session.

    On a real cluster, drop ``master`` and submit with spark-submit; every
    other config below is cluster-appropriate as-is.
    """
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # ~1 shuffle partition per core locally; on a cluster size to
        # (executors * cores) or rely on AQE coalescing from a higher start.
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce by target size, not parallelism: post-shuffle partitions
        # shrink to the advisory size (64MB), cutting task-scheduling
        # overhead on small intermediates (~15-20% on the bench set) while
        # leaving large-shuffle parallelism unchanged at scale.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Session TZ pinned to UTC so to_date()/date_trunc() over parquet
        # timestamps agree with the UTC-naive DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow on: fast toPandas()/createDataFrame and Pandas-UDF transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UI off by default (tests spin many short sessions); bench.py sets
        # SPARK_GRAFT_UI=1 to expose the status REST API it reads per-query
        # shuffle/input volumes from. retainedStages is raised alongside so
        # end-minus-start stage-total deltas never lose evicted stages
        # mid-suite (only consulted when the UI is on).
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        .config("spark.ui.retainedStages", "100000")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read nanos as long and convert in io.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
