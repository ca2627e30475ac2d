"""Derived headline data model over the driver's `documents` table.

The reference (edu-data-dev/AirDataPipeline) processes news headlines through
a Bronze (`raw_headlines`, /root/reference/dags/g1_scraping_dag.py:33-40) →
Silver (`silver_enriched_headlines`, dags/g1_enrichement_dag.py:48-61) →
Gold (dbt models) pipeline. The driver's synthetic `documents` parquet plays
the role of the scraped headlines; this module derives, fully
deterministically (pure function of `doc_id`), the Bronze and Silver tables
from it so that every reference query is expressible BOTH as a PySpark
DataFrame program and as ANSI SQL a DuckDB oracle can run on the same parquet.

Derivation rules (mirrored exactly in `BRONZE_CTE` / `SILVER_CTE` below):

Bronze `raw_headlines(title, link, source, scraped_at)`:
  - 10% duplicate links (doc_id % 10 == 9 reuses previous doc's id) → D1 dedup.
  - ~6.7% duplicate titles (doc_id % 15 == 14) → D2 dedup.
  - ~7.7% short titles (doc_id % 13 == 0 truncates to 10 chars) → P2 filter.
  - link scheme: % 11 == 0 → non-http (dropped by P3); % 7 == 0 → relative
    path (absolutized by P3); else absolute https.
  - scraped_at spans 10 distinct days from BASE_SCRAPED.

Silver `silver_enriched_headlines(...)` — mock-enriched, per the reference's
deterministic round-robin test classifier
(/root/reference/scripts/llm_test_enricher.py:191-198), keyed on doc_id:
  - only docs with doc_id % 10 < 8 are "already processed" (so the J1
    incremental anti-join has a real 20% pending set).
  - sentiment: % 17 == 0 → 'Erro' else round-robin of 3 values (doc_id % 3).
  - category: % 23 == 0 → NULL (exercises P4); % 17 == 0 → 'Erro'; else
    round-robin of the 12-value taxonomy (doc_id % 12).
  - confidence_score: 0.0 for Erro rows else 0.5 + (doc_id % 50)/100.
  - processing_time_seconds: 0.05 + (doc_id % 20)/100.
  - processed_at spans 8 distinct days from BASE_PROCESSED; "today" for the
    reference's CURRENT_DATE predicates is pinned to TODAY (reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table

BASE_SCRAPED = "2025-08-01 08:00:00"
BASE_PROCESSED = "2025-08-01 09:00:00"
TODAY = "2025-08-05"  # == processed_at date for doc_id % 10 == 4

SENTIMENTS = ("Positiva", "Negativa", "Neutra")
CATEGORIES = (
    "Política",
    "Economia",
    "Esportes",
    "Tecnologia",
    "Cultura",
    "Saúde",
    "Internacional",
    "Justiça",
    "Educação",
    "Meio Ambiente",
    "Segurança",
    "Outros",
)
MODEL_TAG = "mock-v1"
URL_PREFIX = "https://g1.globo.com"


# ---------------------------------------------------------------------------
# Spark builders
# ---------------------------------------------------------------------------

def bronze_headlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived `raw_headlines` (+ internal `doc_id` for deterministic dedup)."""
    d = load_table(spark, sf_dir, "documents")
    link_id = F.when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    title = (
        F.when(
            F.col("doc_id") % 15 == 14,
            F.concat(F.lit("Manchete repetida numero "), (F.col("doc_id") % 3).cast("string")),
        )
        .when(F.col("doc_id") % 13 == 0, F.substring("text", 1, 10))
        .otherwise(F.col("text"))
    )
    link = (
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("ftp://invalid.example/"), link_id.cast("string")),
        )
        .when(F.col("doc_id") % 7 == 0, F.concat(F.lit("/noticia/"), link_id.cast("string")))
        .otherwise(F.concat(F.lit(URL_PREFIX + "/noticia/"), link_id.cast("string")))
    )
    scraped_at = F.timestamp_add(
        "DAY", (F.col("doc_id") % 10).cast("int"), F.lit(BASE_SCRAPED).cast("timestamp_ntz")
    )
    return d.select(
        F.col("doc_id"),
        title.alias("title"),
        link.alias("link"),
        F.col("source"),
        scraped_at.alias("scraped_at"),
    )


def _sentiment_expr(key):
    return (
        F.when(key % 17 == 0, F.lit("Erro"))
        .when(key % 3 == 0, F.lit(SENTIMENTS[0]))
        .when(key % 3 == 1, F.lit(SENTIMENTS[1]))
        .otherwise(F.lit(SENTIMENTS[2]))
    )


def _category_expr(key):
    cat = F.when(key % 12 == 0, F.lit(CATEGORIES[0]))
    for i in range(1, 12):
        cat = cat.when(key % 12 == i, F.lit(CATEGORIES[i]))
    return (
        F.when(key % 23 == 0, F.lit(None).cast("string"))
        .when(key % 17 == 0, F.lit("Erro"))
        .otherwise(cat)
    )


def silver_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived `silver_enriched_headlines` (80% of docs 'already processed')."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 < 8)
    key = F.col("doc_id")
    link = F.concat(F.lit(URL_PREFIX + "/noticia/"), key.cast("string"))
    processed_at = F.timestamp_add(
        "DAY", (key % 10).cast("int"), F.lit(BASE_PROCESSED).cast("timestamp_ntz")
    )
    scraped_at = F.timestamp_add(
        "DAY", (key % 10).cast("int"), F.lit(BASE_SCRAPED).cast("timestamp_ntz")
    )
    return d.select(
        key.alias("id"),
        link.alias("raw_link"),
        F.col("text").alias("title"),
        link.alias("link"),
        F.col("source"),
        scraped_at.alias("scraped_at"),
        _sentiment_expr(key).alias("sentiment"),
        _category_expr(key).alias("category"),
        F.when(key % 17 == 0, F.lit(0.0))
        .otherwise(F.lit(0.5) + (key % 50) / F.lit(100.0))
        .alias("confidence_score"),
        (F.lit(0.05) + (key % 20) / F.lit(100.0)).alias("processing_time_seconds"),
        processed_at.alias("processed_at"),
        F.lit(MODEL_TAG).alias("model_used"),
    )


def stg_enriched_headlines(silver: DataFrame) -> DataFrame:
    """P1 staging projection/rename
    (/root/reference/dbt_project/models/staging/stg_enriched_headlines.sql:5-13)."""
    return silver.select(
        F.col("link").alias("headline_link"),
        F.col("title").alias("headline_title"),
        F.col("sentiment"),
        F.col("category"),
        F.col("processed_at").alias("processed_timestamp"),
        F.col("scraped_at").alias("scraped_timestamp"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL CTEs (DuckDB dialect; `documents` is a pre-registered view)
# ---------------------------------------------------------------------------

def _sentiment_sql(key: str) -> str:
    return (
        f"CASE WHEN {key} % 17 = 0 THEN 'Erro' "
        f"WHEN {key} % 3 = 0 THEN '{SENTIMENTS[0]}' "
        f"WHEN {key} % 3 = 1 THEN '{SENTIMENTS[1]}' "
        f"ELSE '{SENTIMENTS[2]}' END"
    )


def _category_sql(key: str) -> str:
    whens = " ".join(f"WHEN {i} THEN '{c}'" for i, c in enumerate(CATEGORIES))
    return (
        f"CASE WHEN {key} % 23 = 0 THEN NULL "
        f"WHEN {key} % 17 = 0 THEN 'Erro' "
        f"ELSE CASE {key} % 12 {whens} END END"
    )


BRONZE_CTE = f"""
bronze AS (
  SELECT
    doc_id,
    CASE WHEN doc_id % 15 = 14
           THEN 'Manchete repetida numero ' || CAST(doc_id % 3 AS VARCHAR)
         WHEN doc_id % 13 = 0 THEN substr(text, 1, 10)
         ELSE text END AS title,
    CASE WHEN doc_id % 11 = 0
           THEN 'ftp://invalid.example/' || CAST(CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 ELSE doc_id END AS VARCHAR)
         WHEN doc_id % 7 = 0
           THEN '/noticia/' || CAST(CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 ELSE doc_id END AS VARCHAR)
         ELSE '{URL_PREFIX}/noticia/' || CAST(CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 ELSE doc_id END AS VARCHAR)
         END AS link,
    source,
    TIMESTAMP '{BASE_SCRAPED}' + (doc_id % 10) * INTERVAL 1 DAY AS scraped_at
  FROM documents
)
""".strip()

SILVER_CTE = f"""
silver AS (
  SELECT
    doc_id AS id,
    '{URL_PREFIX}/noticia/' || CAST(doc_id AS VARCHAR) AS raw_link,
    text AS title,
    '{URL_PREFIX}/noticia/' || CAST(doc_id AS VARCHAR) AS link,
    source,
    TIMESTAMP '{BASE_SCRAPED}' + (doc_id % 10) * INTERVAL 1 DAY AS scraped_at,
    {_sentiment_sql('doc_id')} AS sentiment,
    {_category_sql('doc_id')} AS category,
    CASE WHEN doc_id % 17 = 0 THEN 0.0 ELSE 0.5 + (doc_id % 50) / 100.0 END AS confidence_score,
    0.05 + (doc_id % 20) / 100.0 AS processing_time_seconds,
    TIMESTAMP '{BASE_PROCESSED}' + (doc_id % 10) * INTERVAL 1 DAY AS processed_at,
    '{MODEL_TAG}' AS model_used
  FROM documents
  WHERE doc_id % 10 < 8
)
""".strip()

STG_CTE = """
stg AS (
  SELECT link AS headline_link, title AS headline_title, sentiment, category,
         processed_at AS processed_timestamp, scraped_at AS scraped_timestamp
  FROM silver
)
""".strip()

# Mirrors operators.relational.clean_headlines exactly: P2 length filter →
# P3 URL normalization/drop → D1 dedup-by-link → D2 dedup-by-title, winner =
# min doc_id (SQL WHERE is evaluated before window functions, so each
# row_number sees only the previous stage's survivors).
BRONZE_CLEAN_CTE = f"""
bronze_clean AS (
  SELECT doc_id, title, link, source, scraped_at FROM (
    SELECT *, row_number() OVER (PARTITION BY title ORDER BY doc_id) AS rn_t FROM (
      SELECT *, row_number() OVER (PARTITION BY link ORDER BY doc_id) AS rn_l FROM (
        SELECT doc_id, title,
               CASE WHEN link LIKE '/%' THEN '{URL_PREFIX}' || link
                    WHEN link LIKE 'http%' THEN link END AS link,
               source, scraped_at
        FROM bronze
        WHERE length(title) >= 15
      ) WHERE link IS NOT NULL
    ) WHERE rn_l = 1
  ) WHERE rn_t = 1
)
""".strip()


def with_model_ctes(
    body: str,
    *,
    bronze: bool = False,
    bronze_clean: bool = False,
    silver: bool = False,
    stg: bool = False,
    extra: list[str] | None = None,
) -> str:
    """Prefix an oracle query body with the needed derived-model CTEs."""
    parts = []
    if bronze or bronze_clean:
        parts.append(BRONZE_CTE)
    if bronze_clean:
        parts.append(BRONZE_CLEAN_CTE)
    if silver or stg:
        parts.append(SILVER_CTE)
    if stg:
        parts.append(STG_CTE)
    parts.extend(extra or [])
    if not parts:
        return body
    return "WITH " + ",\n".join(parts) + "\n" + body
