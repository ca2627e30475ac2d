"""JDBC source (SRC5 variant): read the reference's Postgres tables through
Spark's JDBC data source.

The reference dashboard opens psycopg2 connections and pulls whole result
sets into pandas (streamlit_app/dashboard.py:57-181, four loader queries
over ``dbt_gold.daily_sentiment_analysis`` and
``silver_enriched_headlines``). The Spark-first equivalent is
``spark.read.format("jdbc")`` with:

- connection params from the same POSTGRES_* env vars the reference uses;
- partitioned reads (partitionColumn/lowerBound/upperBound/numPartitions)
  so a big table is pulled by many executors in parallel instead of one
  driver connection — the property that matters at scale;
- filter/aggregate shapes left to Catalyst: the dashboard queries
  themselves are already first-class registry queries (a1/a2, a8, category
  counts, t3 recent top-k) that run identically on a JDBC-backed
  DataFrame, so only the *source* changes, not the query code.

This container has no Postgres server and no Postgres driver jar, so the
Postgres contract is covered by option-construction tests — but the READ
PATH itself is executed live in CI against embedded Derby (the JDBC driver
Spark ships for its metastore): tests/test_sources.py round-trips a table
through ``df.write.jdbc`` + ``read_table(url=..., driver=...)`` and asserts
the partitioned scan really fans out. Swapping url/driver is the only
difference between that test and a production Postgres read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The reference's four dashboard loads (dashboard.py:57, :87, :128, :163),
# kept verbatim-equivalent as pushdown queries for parity documentation —
# though the idiomatic path is read_table() + the registry queries.
DASHBOARD_QUERIES = {
    "daily_sentiment": (
        "SELECT * FROM dbt_gold.daily_sentiment_analysis ORDER BY analysis_date ASC"
    ),
    "category_counts": (
        "SELECT CAST(processed_at AS DATE) AS date, category, COUNT(*) AS count "
        "FROM silver_enriched_headlines GROUP BY CAST(processed_at AS DATE), category"
    ),
    "confidence_by_date_sentiment": (
        "SELECT CAST(processed_at AS DATE) AS date, sentiment, "
        "AVG(confidence_score) AS avg_confidence, "
        "MIN(confidence_score) AS min_confidence, "
        "MAX(confidence_score) AS max_confidence "
        "FROM silver_enriched_headlines GROUP BY CAST(processed_at AS DATE), sentiment"
    ),
    "recent_headlines": (
        "SELECT title AS headline_title, link AS headline_link, sentiment, category, "
        "confidence_score, processed_at AS processed_timestamp "
        "FROM silver_enriched_headlines ORDER BY processed_at DESC LIMIT {limit}"
    ),
}


def jdbc_url(
    host: str | None = None,
    port: str | None = None,
    database: str | None = None,
) -> str:
    """Postgres JDBC URL from args or the reference's env vars."""
    host = host or os.environ.get("POSTGRES_HOST", "localhost")
    port = port or os.environ.get("POSTGRES_PORT", "5432")
    database = database or os.environ.get("POSTGRES_DB", "airflow")
    return f"jdbc:postgresql://{host}:{port}/{database}"


def jdbc_options(
    *,
    table: str | None = None,
    query: str | None = None,
    host: str | None = None,
    port: str | None = None,
    database: str | None = None,
    user: str | None = None,
    password: str | None = None,
    url: str | None = None,
    driver: str | None = None,
    partition_column: str | None = "id",
    lower_bound: int = 0,
    upper_bound: int = 1_000_000,
    num_partitions: int = 16,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Build the option map for spark.read.format('jdbc').

    Exactly one of `table`/`query` must be set. Partitioned-read options
    are only attached for `table` reads (Spark forbids them with `query`);
    at scale bounds come from a cheap MIN/MAX probe or the table's
    sequence, and num_partitions matches the executor count so the pull is
    cluster-parallel. `url`/`driver` default to the reference's Postgres;
    overriding both points the same read path at any JDBC backend (the
    embedded-Derby CI test does exactly this)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts: dict[str, str] = {
        "url": url or jdbc_url(host, port, database),
        "driver": driver or "org.postgresql.Driver",
        "user": user or os.environ.get("POSTGRES_USER", "airflow"),
        "password": password or os.environ.get("POSTGRES_PASSWORD", "airflow"),
        "fetchsize": str(fetch_size),
    }
    if table is not None:
        opts["dbtable"] = table
        if partition_column is not None:
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
    else:
        opts["query"] = query
    return opts


def read_table(spark: SparkSession, table: str, **kwargs) -> DataFrame:
    """Partitioned JDBC scan of a table. Catalyst pushes filters and column
    pruning into the generated SQL; the registry's dashboard queries run
    on this DataFrame unchanged."""
    return spark.read.format("jdbc").options(**jdbc_options(table=table, **kwargs)).load()


def read_query(spark: SparkSession, query: str, **kwargs) -> DataFrame:
    """Single-partition pushdown query (for small result sets like the
    dashboard's pre-aggregated gold reads)."""
    kwargs.setdefault("partition_column", None)
    return spark.read.format("jdbc").options(**jdbc_options(query=query, **kwargs)).load()
