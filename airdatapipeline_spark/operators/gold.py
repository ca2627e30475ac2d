"""Gold-layer models (the reference's dbt models) + DAG quality-gate aggregates.

A1/A2/W1 are the repo's raison d'être: daily pivoted sentiment counts and
daily category counts with a window-function share-of-day.

Scale note: both are single-shuffle hash aggregates on (date[, category]);
at 100 TB the map-side partial aggregation collapses each partition to a few
hundred (date, category) rows before the shuffle, so the shuffle is tiny
regardless of input size. The W1 window re-partitions by date only over the
already-aggregated rows (thousands, not billions). Date-partitioned silver
storage additionally gives partition pruning for the ubiquitous
today/date-range predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_avg(col: str, scale: int = 6) -> Column:
    """Order-independent average of a double column.

    Floating sums are partition-order-dependent, which makes results
    nondeterministic on a cluster (and unmatchable against a SQL oracle).
    Accumulating in DECIMAL is exact and order-independent; the final
    decimal→double conversion and division are single IEEE ops, so the
    result is bit-identical across engines and partitionings. This is the
    posture a 100 TB engine needs anyway — retries/AQE re-partitioning must
    not change answers. (The reference's ROUND(AVG(x)::numeric, 3) is a
    display concern; we emit the exact value.)
    """
    dec = F.sum(F.col(col).cast(f"decimal(28,{scale})")).cast("double")
    return dec / F.count(col)


def daily_sentiment_analysis(stg: DataFrame) -> DataFrame:
    """A1 — pivoted conditional counts per day
    (/root/reference/dbt_project/models/gold/daily_sentiment_analysis.sql:8-27).

    Deliberately `count(when(...))` and NOT `.pivot()`: the contract is a
    fixed 3-column schema where 'Erro' rows count in total_headlines but in
    no sentiment column (SURVEY.md §1.4).
    """
    return (
        stg.groupBy(F.to_date("processed_timestamp").alias("analysis_date"))
        .agg(
            F.count(F.when(F.col("sentiment") == "Positiva", 1)).alias("positive_headlines"),
            F.count(F.when(F.col("sentiment") == "Negativa", 1)).alias("negative_headlines"),
            F.count(F.when(F.col("sentiment") == "Neutra", 1)).alias("neutral_headlines"),
            F.count("headline_link").alias("total_headlines"),
        )
    )


def daily_category_analysis(stg: DataFrame) -> DataFrame:
    """A2 + W1 — per-(day, category) counts with share-of-day window
    (/root/reference/dbt_project/models/gold/daily_category_analysis.sql:8-27).

    The reference's Postgres SQL divides bigint/bigint and silently truncates
    to 0 (a latent bug); we emit the true Double ratio (documented divergence,
    SURVEY.md §2.5 W1), rounded to 6 dp for cross-engine determinism.
    """
    counts = (
        stg.filter(F.col("category").isNotNull())
        .groupBy(
            F.to_date("processed_timestamp").alias("analysis_date"),
            F.col("category"),
        )
        .agg(F.count("headline_link").alias("category_count"))
    )
    day_total = Window.partitionBy("analysis_date")
    return counts.withColumn(
        "category_percentage",
        F.col("category_count") / F.sum("category_count").over(day_total),
    )


def sentiment_distribution_today(silver: DataFrame, today: str) -> DataFrame:
    """A3 — per-sentiment counts for 'today' (scripts/llm_enricher.py:337-342)."""
    return (
        silver.filter(F.to_date("processed_at") == F.lit(today).cast("date"))
        .groupBy("sentiment")
        .agg(F.count("*").alias("n"))
    )


def top_categories_today(silver: DataFrame, today: str, k: int = 5) -> DataFrame:
    """A4 — top-k categories for 'today' (scripts/llm_enricher.py:345-352).
    Plans as TakeOrderedAndProject over the aggregate — true top-k, no full
    sort. Ties broken by category name for determinism."""
    return (
        silver.filter(
            (F.to_date("processed_at") == F.lit(today).cast("date"))
            & F.col("category").isNotNull()
            & (F.col("category") != "Erro")
        )
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("category"))
        .limit(k)
    )


def scalar_counts(bronze_clean: DataFrame, silver: DataFrame, today: str) -> DataFrame:
    """A5 — the report's scalar COUNT(*) totals (scripts/llm_enricher.py:329-330,
    dags/g1_enrichement_dag.py:138-141)."""
    total_raw = bronze_clean.agg(F.count("*").alias("total_raw"))
    proc = silver.agg(
        F.count("*").alias("total_processed"),
        F.count(
            F.when(F.to_date("processed_at") == F.lit(today).cast("date"), 1)
        ).alias("processed_today"),
    )
    return total_raw.crossJoin(proc)


def avg_confidence_today(silver: DataFrame, today: str) -> DataFrame:
    """A6 — ROUND(AVG(confidence_score), 3) today, errors excluded
    (dags/g1_enrichement_dag.py:147-151)."""
    return (
        silver.filter(
            (F.to_date("processed_at") == F.lit(today).cast("date"))
            & (F.col("sentiment") != "Erro")
        )
        .agg(exact_avg("confidence_score").alias("avg_confidence"))
    )


def avg_processing_time_today(silver: DataFrame, today: str) -> DataFrame:
    """A7 — ROUND(AVG(processing_time_seconds), 3) today
    (dags/g1_enrichement_dag.py:217-221)."""
    return (
        silver.filter(F.to_date("processed_at") == F.lit(today).cast("date"))
        .agg(exact_avg("processing_time_seconds").alias("avg_processing_time"))
    )


def confidence_by_date_sentiment(silver: DataFrame) -> DataFrame:
    """A8 — AVG/MIN/MAX(confidence_score) by (date, sentiment)
    (streamlit_app/dashboard.py:128-138)."""
    return (
        silver.filter(F.col("sentiment") != "Erro")
        .groupBy(F.to_date("processed_at").alias("date"), "sentiment")
        .agg(
            exact_avg("confidence_score").alias("avg_confidence"),
            F.min("confidence_score").alias("min_confidence"),
            F.max("confidence_score").alias("max_confidence"),
        )
    )


def validation_gates(silver: DataFrame, today: str) -> DataFrame:
    """§2.12 — the DAG's quality-gate aggregates in one row
    (dags/g1_enrichement_dag.py:137-193): total today, error count today,
    avg confidence (errors excluded), plus the derived warn flags
    (error-rate > 10%, avg confidence < 0.7)."""
    is_today = F.to_date("processed_at") == F.lit(today).cast("date")
    ok_conf = F.when(is_today & (F.col("sentiment") != "Erro"), F.col("confidence_score"))
    agg = silver.agg(
        F.count(F.when(is_today, 1)).alias("total_today"),
        F.count(
            F.when(is_today & ((F.col("sentiment") == "Erro") | (F.col("category") == "Erro")), 1)
        ).alias("errors_today"),
        (F.sum(ok_conf.cast("decimal(28,6)")).cast("double") / F.count(ok_conf)).alias(
            "avg_confidence_today"
        ),
    )
    return agg.select(
        "*",
        (
            F.col("errors_today").cast("double")
            > 0.10 * F.col("total_today").cast("double")
        ).alias("warn_error_rate"),
        (F.col("avg_confidence_today") < 0.7).alias("warn_low_confidence"),
    )
