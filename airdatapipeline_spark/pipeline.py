"""End-to-end pipeline assembly (SURVEY.md §3 / §7.1).

Replays the reference's two daily DAGs as one declarative Spark plan:

  bronze (scraped headlines) → clean (P2/P3/D1/D2) → anti-join silver (J1)
    → mock-classify via mapInPandas (§2.9) → validate (P10)
    → idempotent append to silver (SNK2) → staging projection (P1)
    → daily sentiment Gold model (A1)

Everything before the classifier and everything after it is pure Catalyst
territory — filters/dedup/anti-join/aggregation are planned and executed
JVM-side; the one Python boundary is the Arrow-batched classifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import model
from .operators import enrichment, gold, relational


def run_scrape_job(
    spark: SparkSession, landing_dir: str, warehouse: str, run_id: str = "r0", scraper=None
) -> DataFrame:
    """DAG-1 replay (SURVEY §3.1): scrape → clean → CSV landing partition →
    explicit-schema read-back → Bronze overwrite. Returns the loaded Bronze."""
    from .sources import csv_io, scrape

    raw = scrape.scrape_to_dataframe(spark, scraper)
    clean = relational.clean_headlines(raw)
    path = csv_io.write_headlines_csv(clean, landing_dir, run_id)
    # read back the partition THIS run wrote — latest_run_dir() is for
    # consumers discovering new data, not for the producer, whose free-form
    # run_id need not sort last
    loaded = csv_io.read_headlines_csv(spark, path)
    csv_io.overwrite_bronze(loaded, warehouse)
    return spark.read.parquet(f"{warehouse}/bronze/raw_headlines")


def run_enrichment(spark: SparkSession, sf_dir: str, batch: int | None = None) -> DataFrame:
    """The enrichment job: returns the post-run silver table (existing rows
    plus newly classified pending rows)."""
    bronze_clean = relational.clean_headlines(model.bronze_headlines(spark, sf_dir))
    silver = model.silver_enriched(spark, sf_dir)

    pending = relational.pending_headlines(bronze_clean, silver, batch=batch)
    enriched = enrichment.enrich(pending, enrichment.MockClassifier())
    enriched = relational.validate_domains(enriched)

    new_silver_rows = enriched.select(
        F.col("doc_id").alias("id"),
        F.col("link").alias("raw_link"),
        "title",
        "link",
        "source",
        "scraped_at",
        "sentiment",
        "category",
        "confidence_score",
        "processing_time_seconds",
        F.col("scraped_at").alias("processed_at"),
        "model_used",
    )
    return enrichment.idempotent_append(new_silver_rows, silver, key="raw_link")


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end query: enrichment pipeline feeding the daily
    sentiment Gold model (the reference's raison d'être)."""
    silver_after = run_enrichment(spark, sf_dir)
    return gold.daily_sentiment_analysis(model.stg_enriched_headlines(silver_after)).orderBy(
        F.desc("analysis_date")
    )


def write_gold(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize both Gold models as date-partitioned parquet — the Spark
    replacement for the reference's Postgres indexes: partition pruning on
    analysis_date serves every today/date-range predicate."""
    silver_after = run_enrichment(spark, sf_dir)
    # SNK4 — cache the staging frame: both Gold models read it, and dbt's
    # view materialization recomputes it per model (SURVEY §4); one cached
    # pass here serves both writes.
    stg = model.stg_enriched_headlines(silver_after).cache()
    try:
        gold.daily_sentiment_analysis(stg).write.mode("overwrite").partitionBy(
            "analysis_date"
        ).parquet(f"{out_dir}/daily_sentiment_analysis")
        gold.daily_category_analysis(stg).write.mode("overwrite").partitionBy(
            "analysis_date"
        ).parquet(f"{out_dir}/daily_category_analysis")
    finally:
        stg.unpersist()
