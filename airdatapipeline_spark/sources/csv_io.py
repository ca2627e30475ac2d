"""SRC2/SRC3/SRC4 + SNK1/SNK3/DDL1 — file and table sources/sinks.

The reference lands scraped rows in timestamped CSVs, picks the newest by
ctime, loads it with inferred dtypes, and drop-and-recreates the Bronze
table (/root/reference/dags/g1_scraping_dag.py:51-83). Spark-first:

- CSV sink → a per-run PARTITION DIRECTORY (run_id=...) instead of a
  filename timestamp: at scale "latest file" becomes "latest partition",
  which is listable, prunable and atomic-rename friendly.
- CSV source → explicit schema (never inferSchema: one bad row must not
  flip a column's type at 100 TB).
- Bronze full-replace → mode('overwrite') parquet; Silver is
  date-partitioned so every today/date-range predicate partition-prunes
  (the replacement for the reference's three b-tree indexes, SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BRONZE_SCHEMA

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_headlines_csv(df: DataFrame, out_dir: str, run_id: str) -> str:
    """SRC2 — CSV landing zone, one partition dir per run."""
    path = os.path.join(out_dir, f"run_id={run_id}")
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampNTZFormat", TS_FMT)
        .csv(path)
    )
    return path


def latest_run_dir(out_dir: str) -> str:
    """SRC3 — newest run partition (lexicographic run_id = newest; the
    reference's os.path.getctime scan is not distributed-safe)."""
    runs = sorted(d for d in os.listdir(out_dir) if d.startswith("run_id="))
    if not runs:
        raise FileNotFoundError(f"no run_id=* partitions under {out_dir}")
    return os.path.join(out_dir, runs[-1])


def read_headlines_csv(spark: SparkSession, path: str) -> DataFrame:
    """SRC4 — CSV source with the explicit Bronze schema."""
    return (
        spark.read.schema(BRONZE_SCHEMA)
        .option("header", True)
        .option("timestampNTZFormat", TS_FMT)
        .csv(path)
    )


def overwrite_bronze(df: DataFrame, warehouse: str) -> str:
    """SNK1 — full-replace Bronze load (the reference's documented strategy,
    dags/g1_scraping_dag.py:79-81)."""
    path = os.path.join(warehouse, "bronze", "raw_headlines")
    df.write.mode("overwrite").parquet(path)
    return path


def write_silver_partitioned(df: DataFrame, warehouse: str) -> str:
    """Silver sink, partitioned by processed_date: partition pruning serves
    the ubiquitous P5 today-predicate (replaces the processed_at index)."""
    path = os.path.join(warehouse, "silver", "silver_enriched_headlines")
    (
        df.withColumn("processed_date", F.to_date("processed_at"))
        .write.mode("overwrite")
        .partitionBy("processed_date")
        .parquet(path)
    )
    return path


def create_tables(spark: SparkSession, warehouse: str) -> None:
    """DDL1 — idempotent CREATE TABLE IF NOT EXISTS over parquet locations
    (mirrors dags/g1_scraping_dag.py:30-41 / g1_enrichement_dag.py:44-77;
    the reference's secondary indexes become partitioning + parquet
    min/max stats, SURVEY §4)."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS raw_headlines (
          doc_id BIGINT, title STRING, link STRING, source STRING,
          scraped_at TIMESTAMP_NTZ
        ) USING parquet LOCATION '{warehouse}/bronze/raw_headlines'
        """
    )
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS silver_enriched_headlines (
          id BIGINT, raw_link STRING, title STRING, link STRING, source STRING,
          scraped_at TIMESTAMP_NTZ, sentiment STRING, category STRING,
          confidence_score DOUBLE, processing_time_seconds DOUBLE,
          processed_at TIMESTAMP_NTZ, model_used STRING
        ) USING parquet PARTITIONED BY (processed_date DATE)
        LOCATION '{warehouse}/silver/silver_enriched_headlines'
        """
    )
