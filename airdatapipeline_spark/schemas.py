"""Explicit StructType schemas (SURVEY.md §1.3: prefer explicit schema over
inference at every load boundary — the reference's one inference point,
pd.read_csv → to_sql at dags/g1_scraping_dag.py:69-82, is a documented
schema-drift hazard we close)."""

from __future__ import annotations

from pyspark.sql import types as T

# Bronze raw_headlines — production DDL dags/g1_scraping_dag.py:33-40
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("link", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampNTZType(), True),
    ]
)

# Silver silver_enriched_headlines — production DDL dags/g1_enrichement_dag.py:48-61
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("raw_link", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("link", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampNTZType(), True),
        T.StructField("sentiment", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("confidence_score", T.DoubleType(), True),
        T.StructField("processing_time_seconds", T.DoubleType(), True),
        T.StructField("processed_at", T.TimestampNTZType(), True),
        T.StructField("model_used", T.StringType(), True),
    ]
)

GOLD_SENTIMENT_SCHEMA = T.StructType(
    [
        T.StructField("analysis_date", T.DateType(), False),
        T.StructField("positive_headlines", T.LongType(), False),
        T.StructField("negative_headlines", T.LongType(), False),
        T.StructField("neutral_headlines", T.LongType(), False),
        T.StructField("total_headlines", T.LongType(), False),
    ]
)

GOLD_CATEGORY_SCHEMA = T.StructType(
    [
        T.StructField("analysis_date", T.DateType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("category_count", T.LongType(), False),
        T.StructField("category_percentage", T.DoubleType(), False),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)
