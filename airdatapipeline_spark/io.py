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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the parquet footer; with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos.
        # Truncate to micros (same as DuckDB's nanos→TIMESTAMP read) and
        # expose as TIMESTAMP_NTZ to match the other tables' semantics.
        from pyspark.sql import functions as F

        # integer division: epoch-nanos (~1.7e18) exceeds double's 2^53
        # exact-integer range, so a float divide would be off by ~1μs
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
