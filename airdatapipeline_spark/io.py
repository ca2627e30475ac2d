"""Table loaders for the driver-provided synthetic parquet tables.

At 100 TB these reads stay exactly the same shape — `spark.read.parquet` on a
directory gives the vectorized reader, predicate pushdown, column pruning and
partition pruning for free; nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # The driver may hand us a session built without our configs, so pin
        # the two that correctness depends on at the one place that needs
        # them: (a) events.parquet stores TIMESTAMP(NANOS), which the reader
        # rejects unless nanosAsLong is set; (b) the nanos→NTZ conversion
        # below round-trips through an instant, so the session TZ must be
        # UTC for wall times to match the UTC-naive oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # epoch-nanos long → micros → NTZ. Integer division: epoch-nanos
            # (~1.7e18) exceeds double's 2^53 exact range, so a float divide
            # would be off by ~1μs.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive map parallelism for COMPUTE-HEAVY derivations
    (guide §2.5's unsplittable-input case): the sandbox's test tables are
    single-row-group parquet files, so a scan is ONE task and every
    per-row derivation chained onto it (64-dim dot products, md5 coord
    generation, sign packs) runs on one core of a 32-core cluster. When
    the source's split count is below the cluster's default parallelism,
    round-robin repartition first — the shuffle moves the raw scan rows
    once (tiny next to the derivation it parallelizes; guide §8: shuffle
    small rows, then compute the heavy columns). On a production table
    the scan already yields >= cores splits and this is a no-op — the
    decision adapts to the input, it is not a local-mode constant."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
