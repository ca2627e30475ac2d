"""Reference §2 core: staging projections/filters (P), dedup/union (D/U),
incremental joins (J), aggregations (A), ordering/top-k (T), scalar display
functions, validation gates, the flagship pipeline, SQL-API twins, profiling
and expectations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .. import model
from ..model import TODAY, URL_PREFIX, with_model_ctes
from ..operators import analytics
from ..operators import gold
from ..operators import relational
from ..operators import profile
from ..operators import expectations
from .core import register
from ._shared import GOLD_S_CTE


GOLD_C_CTE = """
gold_c AS (
  SELECT analysis_date, category, category_count,
         category_count / CAST(SUM(category_count) OVER (PARTITION BY analysis_date) AS BIGINT)
           AS category_percentage
  FROM (
    SELECT CAST(processed_timestamp AS DATE) AS analysis_date, category,
           COUNT(headline_link) AS category_count
    FROM stg WHERE category IS NOT NULL GROUP BY 1, 2
  )
)
""".strip()

RANGE_START, RANGE_END = "2025-08-02", "2025-08-07"


def _gold_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.daily_sentiment_analysis(
        model.stg_enriched_headlines(model.silver_enriched(spark, sf_dir))
    )


def _gold_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.daily_category_analysis(
        model.stg_enriched_headlines(model.silver_enriched(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters
# ---------------------------------------------------------------------------

@register(
    "p1_staging_projection",
    with_model_ctes("SELECT * FROM stg", stg=True),
)
def p1(spark, sf_dir):
    return model.stg_enriched_headlines(model.silver_enriched(spark, sf_dir))


@register(
    "p2_p3_clean_links",
    with_model_ctes(
        f"""
        SELECT title, link, source, scraped_at FROM (
          SELECT title,
                 CASE WHEN link LIKE '/%' THEN '{URL_PREFIX}' || link
                      WHEN link LIKE 'http%' THEN link END AS link,
                 source, scraped_at
          FROM bronze WHERE length(title) >= 15
        ) WHERE link IS NOT NULL
        """,
        bronze=True,
    ),
)
def p2_p3(spark, sf_dir):
    df = relational.filter_min_title_length(model.bronze_headlines(spark, sf_dir))
    return relational.normalize_links(df).drop("doc_id")


@register(
    "p5_p6_today_ok_rows",
    with_model_ctes(
        f"""
        SELECT id, title, sentiment, category, confidence_score, processed_at
        FROM silver
        WHERE CAST(processed_at AS DATE) = DATE '{TODAY}' AND sentiment <> 'Erro'
        """,
        silver=True,
    ),
)
def p5_p6(spark, sf_dir):
    silver = model.silver_enriched(spark, sf_dir)
    df = relational.today_filter(silver, "processed_at", TODAY).filter(
        F.col("sentiment") != "Erro"
    )
    return df.select("id", "title", "sentiment", "category", "confidence_score", "processed_at")


@register(
    "p7_date_range_filter",
    with_model_ctes(
        f"SELECT * FROM gold_s WHERE analysis_date BETWEEN DATE '{RANGE_START}' AND DATE '{RANGE_END}'",
        stg=True,
        extra=[GOLD_S_CTE],
    ),
)
def p7(spark, sf_dir):
    return analytics.date_range_filter(_gold_sentiment(spark, sf_dir), RANGE_START, RANGE_END)


@register(
    "p9_top5_membership_filter",
    with_model_ctes(
        """
        SELECT g.* FROM gold_c g
        WHERE g.category IN (
          SELECT category FROM (
            SELECT category, SUM(category_count) AS total_count
            FROM gold_c GROUP BY 1
            ORDER BY total_count DESC, category LIMIT 5
          )
        )
        """,
        stg=True,
        extra=[GOLD_C_CTE],
    ),
)
def p9(spark, sf_dir):
    return analytics.filter_to_top_categories(_gold_category(spark, sf_dir), 5)


_DIRTY_CTE = f"""
dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 19 = 0 THEN 'muito bom' ELSE {model._sentiment_sql('doc_id')} END AS sentiment,
         CASE WHEN doc_id % 19 = 0 THEN 'Esporte' ELSE {model._category_sql('doc_id')} END AS category,
         CASE WHEN doc_id % 29 = 0 THEN 1.5
              WHEN doc_id % 31 = 0 THEN -0.25
              WHEN doc_id % 17 = 0 THEN 0.0
              ELSE 0.5 + (doc_id % 50) / 100.0 END AS confidence_score
  FROM documents
)
""".strip()


@register(
    "p10_validate_domains",
    "WITH "
    + _DIRTY_CTE
    + """
    SELECT doc_id,
           CASE WHEN sentiment IN ('Positiva','Negativa','Neutra') THEN sentiment ELSE 'Erro' END AS sentiment,
           CASE WHEN category IN ('Política','Economia','Esportes','Tecnologia','Cultura','Saúde',
                                  'Internacional','Justiça','Educação','Meio Ambiente','Segurança','Outros')
                THEN category ELSE 'Erro' END AS category,
           CASE WHEN confidence_score >= 0.0 AND confidence_score <= 1.0 THEN confidence_score ELSE 0.0 END
             AS confidence_score
    FROM dirty
    """,
)
def p10(spark, sf_dir):
    from ..io import load_table

    d = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id")
    dirty = d.select(
        key.alias("doc_id"),
        F.when(key % 19 == 0, F.lit("muito bom")).otherwise(model._sentiment_expr(key)).alias(
            "sentiment"
        ),
        F.when(key % 19 == 0, F.lit("Esporte")).otherwise(model._category_expr(key)).alias(
            "category"
        ),
        F.when(key % 29 == 0, F.lit(1.5))
        .when(key % 31 == 0, F.lit(-0.25))
        .when(key % 17 == 0, F.lit(0.0))
        .otherwise(F.lit(0.5) + (key % 50) / F.lit(100.0))
        .alias("confidence_score"),
    )
    return relational.validate_domains(dirty)


# ---------------------------------------------------------------------------
# §2.8 dedup / §2.7 set ops
# ---------------------------------------------------------------------------

@register(
    "d1_d2_dedup_headlines",
    with_model_ctes("SELECT * FROM bronze_clean", bronze_clean=True),
)
def d1_d2(spark, sf_dir):
    return relational.clean_headlines(model.bronze_headlines(spark, sf_dir))


@register(
    "u1_union_dedup",
    with_model_ctes(
        """
        SELECT doc_id, title, link, source, scraped_at FROM (
          SELECT *, row_number() OVER (PARTITION BY link ORDER BY doc_id) AS rn FROM (
            SELECT * FROM bronze WHERE doc_id % 2 = 0
            UNION ALL
            SELECT * FROM bronze WHERE doc_id % 3 = 0
          )
        ) WHERE rn = 1
        """,
        bronze=True,
    ),
)
def u1(spark, sf_dir):
    b = model.bronze_headlines(spark, sf_dir)
    return relational.union_dedup(
        [b.filter(F.col("doc_id") % 2 == 0), b.filter(F.col("doc_id") % 3 == 0)],
        "link",
        "doc_id",
    )


@register(
    "d4_distinct_dates",
    with_model_ctes(
        "SELECT DISTINCT analysis_date FROM gold_s", stg=True, extra=[GOLD_S_CTE]
    ),
)
def d4(spark, sf_dir):
    return analytics.distinct_dates(_gold_sentiment(spark, sf_dir))


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

_PENDING_SQL = """
SELECT b.doc_id, b.title, b.link, b.source, b.scraped_at
FROM bronze_clean b
WHERE NOT EXISTS (SELECT 1 FROM silver s WHERE s.raw_link = b.link)
""".strip()


@register("j1_pending_antijoin", with_model_ctes(_PENDING_SQL, bronze_clean=True, silver=True))
def j1(spark, sf_dir):
    bronze_clean = relational.clean_headlines(model.bronze_headlines(spark, sf_dir))
    silver = model.silver_enriched(spark, sf_dir)
    return relational.pending_headlines(bronze_clean, silver).select(
        "doc_id", "title", "link", "source", "scraped_at"
    )


@register(
    "j2_j3_pending_metrics",
    with_model_ctes(
        f"""
        SELECT (SELECT COUNT(*) FROM ({_PENDING_SQL})) AS pending_count,
               (SELECT COUNT(*) FROM bronze_clean) AS total_raw,
               (SELECT COUNT(*) FROM silver) AS total_processed,
               (SELECT COUNT(*) FROM bronze_clean) - (SELECT COUNT(*) FROM silver) AS pending
        """,
        bronze_clean=True,
        silver=True,
    ),
)
def j2_j3(spark, sf_dir):
    """J2 (gate count) + J3 (set-difference arithmetic) in one driver row:
    both are 1-row scalars over the same pending model, so the crossJoin is
    a broadcast of a single row."""
    bronze_clean = relational.clean_headlines(model.bronze_headlines(spark, sf_dir))
    silver = model.silver_enriched(spark, sf_dir)
    return relational.pending_count(bronze_clean, silver).crossJoin(
        relational.pending_arithmetic(bronze_clean, silver)
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations — Gold models first
# ---------------------------------------------------------------------------

@register(
    "a1_daily_sentiment_gold",
    with_model_ctes("SELECT * FROM gold_s", stg=True, extra=[GOLD_S_CTE]),
)
def a1(spark, sf_dir):
    return _gold_sentiment(spark, sf_dir)


@register(
    "a2_w1_daily_category_gold",
    with_model_ctes("SELECT * FROM gold_c", stg=True, extra=[GOLD_C_CTE]),
)
def a2(spark, sf_dir):
    return _gold_category(spark, sf_dir)


@register(
    "a3_sentiment_today",
    with_model_ctes(
        f"""
        SELECT sentiment, COUNT(*) AS n FROM silver
        WHERE CAST(processed_at AS DATE) = DATE '{TODAY}' GROUP BY 1
        """,
        silver=True,
    ),
)
def a3(spark, sf_dir):
    return gold.sentiment_distribution_today(model.silver_enriched(spark, sf_dir), TODAY)


@register(
    "a4_top_categories_today",
    with_model_ctes(
        f"""
        SELECT category, COUNT(*) AS n FROM silver
        WHERE CAST(processed_at AS DATE) = DATE '{TODAY}'
          AND category IS NOT NULL AND category <> 'Erro'
        GROUP BY 1 ORDER BY n DESC, category LIMIT 5
        """,
        silver=True,
    ),
)
def a4(spark, sf_dir):
    return gold.top_categories_today(model.silver_enriched(spark, sf_dir), TODAY, 5)


_EXACT_AVG = "CAST(SUM(CAST({col} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({col})"


@register(
    "a5_a6_a7_today_scalars",
    with_model_ctes(
        f"""
        SELECT (SELECT COUNT(*) FROM bronze_clean) AS total_raw,
               (SELECT COUNT(*) FROM silver) AS total_processed,
               (SELECT COUNT(*) FROM silver WHERE CAST(processed_at AS DATE) = DATE '{TODAY}')
                 AS processed_today,
               (SELECT {_EXACT_AVG.format(col='confidence_score')} FROM silver
                WHERE CAST(processed_at AS DATE) = DATE '{TODAY}' AND sentiment <> 'Erro')
                 AS avg_confidence,
               (SELECT {_EXACT_AVG.format(col='processing_time_seconds')} FROM silver
                WHERE CAST(processed_at AS DATE) = DATE '{TODAY}')
                 AS avg_processing_time
        """,
        bronze_clean=True,
        silver=True,
    ),
)
def a5_a6_a7(spark, sf_dir):
    """A5 (scalar counts) + A6 (avg confidence) + A7 (avg processing time)
    in one driver row — all 1-row dashboard scalars over the same silver
    scan; the crossJoins broadcast single rows."""
    bronze_clean = relational.clean_headlines(model.bronze_headlines(spark, sf_dir))
    silver = model.silver_enriched(spark, sf_dir)
    return (
        gold.scalar_counts(bronze_clean, silver, TODAY)
        .crossJoin(gold.avg_confidence_today(silver, TODAY))
        .crossJoin(gold.avg_processing_time_today(silver, TODAY))
    )


@register(
    "a8_confidence_by_date_sentiment",
    with_model_ctes(
        f"""
        SELECT CAST(processed_at AS DATE) AS date, sentiment,
               {_EXACT_AVG.format(col='confidence_score')} AS avg_confidence,
               MIN(confidence_score) AS min_confidence,
               MAX(confidence_score) AS max_confidence
        FROM silver WHERE sentiment <> 'Erro' GROUP BY 1, 2
        """,
        silver=True,
    ),
)
def a8(spark, sf_dir):
    return gold.confidence_by_date_sentiment(model.silver_enriched(spark, sf_dir))


@register(
    "a9_sentiment_distribution_pct",
    with_model_ctes(
        """
        SELECT sentiment, n, n / CAST(SUM(n) OVER () AS BIGINT) * 100.0 AS pct
        FROM (SELECT sentiment, COUNT(*) AS n FROM silver GROUP BY 1)
        """,
        silver=True,
    ),
)
def a9(spark, sf_dir):
    return analytics.sentiment_distribution_pct(model.silver_enriched(spark, sf_dir))


@register(
    "a10_period_kpis",
    with_model_ctes(
        f"""
        SELECT total, positive, negative, neutral,
               positive / total * 100.0 AS positive_pct,
               negative / total * 100.0 AS negative_pct,
               neutral / total * 100.0 AS neutral_pct
        FROM (
          SELECT CAST(SUM(total_headlines) AS BIGINT) AS total,
                 CAST(SUM(positive_headlines) AS BIGINT) AS positive,
                 CAST(SUM(negative_headlines) AS BIGINT) AS negative,
                 CAST(SUM(neutral_headlines) AS BIGINT) AS neutral
          FROM gold_s
          WHERE analysis_date BETWEEN DATE '{RANGE_START}' AND DATE '{RANGE_END}'
        )
        """,
        stg=True,
        extra=[GOLD_S_CTE],
    ),
)
def a10(spark, sf_dir):
    filtered = analytics.date_range_filter(_gold_sentiment(spark, sf_dir), RANGE_START, RANGE_END)
    return analytics.period_kpis(filtered)


@register(
    "a11_category_totals",
    with_model_ctes(
        """
        SELECT category, CAST(SUM(category_count) AS BIGINT) AS total_count
        FROM gold_c GROUP BY 1
        """,
        stg=True,
        extra=[GOLD_C_CTE],
    ),
)
def a11(spark, sf_dir):
    return analytics.category_totals(_gold_category(spark, sf_dir))


_PIVOT_COLS = ",\n".join(
    f"CAST(COALESCE(SUM(CASE WHEN category = '{c}' THEN category_count END), 0) AS BIGINT) AS \"{c}\""
    for c in model.CATEGORIES
)


@register(
    "a12_pivot_date_category",
    with_model_ctes(
        f"SELECT analysis_date, {_PIVOT_COLS} FROM gold_c GROUP BY 1",
        stg=True,
        extra=[GOLD_C_CTE],
    ),
)
def a12(spark, sf_dir):
    return analytics.pivot_date_category(_gold_category(spark, sf_dir))


@register(
    "a13_unpivot_sentiment_long",
    with_model_ctes(
        """
        SELECT analysis_date, 'Positivas' AS sentiment_type, positive_headlines AS headline_count FROM gold_s
        UNION ALL
        SELECT analysis_date, 'Negativas', negative_headlines FROM gold_s
        UNION ALL
        SELECT analysis_date, 'Neutras', neutral_headlines FROM gold_s
        """,
        stg=True,
        extra=[GOLD_S_CTE],
    ),
)
def a13(spark, sf_dir):
    return analytics.unpivot_sentiment_long(_gold_sentiment(spark, sf_dir))


@register(
    "a14_collect_confidences",
    with_model_ctes(
        """
        SELECT sentiment,
               array_to_string(list_sort(list(CAST(round(confidence_score * 100) AS BIGINT))), ',')
                 AS confidence_cents
        FROM silver WHERE sentiment <> 'Erro' GROUP BY 1
        """,
        silver=True,
    ),
)
def a14(spark, sf_dir):
    return analytics.collect_confidences(model.silver_enriched(spark, sf_dir))


@register(
    "a15_histogram_bins",
    with_model_ctes(
        """
        SELECT sentiment, CAST(floor(confidence_score / 0.05) AS INT) AS bin, COUNT(*) AS n
        FROM silver WHERE sentiment <> 'Erro' GROUP BY 1, 2
        """,
        silver=True,
    ),
)
def a15(spark, sf_dir):
    return analytics.histogram_bins(model.silver_enriched(spark, sf_dir))


@register(
    "a16_a19_summary_stats",
    with_model_ctes(
        """
        SELECT * FROM
          (SELECT AVG(total_headlines) AS avg_headlines_per_day FROM gold_s),
          (SELECT f.share AS first_half_pct, s.share AS second_half_pct,
                  s.share - f.share AS trend_delta_pp
           FROM (
             SELECT half, pos / tot * 100.0 AS share FROM (
               SELECT half, CAST(SUM(positive_headlines) AS BIGINT) AS pos,
                      CAST(SUM(total_headlines) AS BIGINT) AS tot
               FROM (SELECT *, ntile(2) OVER (ORDER BY analysis_date) AS half FROM gold_s)
               GROUP BY 1
             )
           ) f, (
             SELECT half, pos / tot * 100.0 AS share FROM (
               SELECT half, CAST(SUM(positive_headlines) AS BIGINT) AS pos,
                      CAST(SUM(total_headlines) AS BIGINT) AS tot
               FROM (SELECT *, ntile(2) OVER (ORDER BY analysis_date) AS half FROM gold_s)
               GROUP BY 1
             )
           ) s
           WHERE f.half = 1 AND s.half = 2),
          (SELECT analysis_date AS peak_positive_date, positive_headlines AS peak_positive_count
           FROM gold_s ORDER BY positive_headlines DESC, analysis_date LIMIT 1),
          (SELECT analysis_date AS peak_negative_date, negative_headlines AS peak_negative_count
           FROM gold_s ORDER BY negative_headlines DESC, analysis_date LIMIT 1),
          (SELECT MAX(positive_headlines) AS max_positive, MAX(negative_headlines) AS max_negative,
                  MAX(neutral_headlines) AS max_neutral, MAX(total_headlines) AS max_total
           FROM gold_s)
        """,
        stg=True,
        extra=[GOLD_S_CTE],
    ),
)
def a16_a19(spark, sf_dir):
    """A16 (avg headlines/day) + A17 (half-over-half trend) + A18 (peak
    days) + A19 (column maxes) in one driver row — four 1-row report
    scalars over the same Gold sentiment model; crossJoins broadcast
    single rows."""
    gold_s = _gold_sentiment(spark, sf_dir)
    return (
        analytics.avg_headlines_per_day(gold_s)
        .crossJoin(analytics.trend_split_halves(gold_s))
        .crossJoin(analytics.peak_days(gold_s))
        .crossJoin(analytics.column_maxes(gold_s))
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / top-k, §2.12 quality gates
# ---------------------------------------------------------------------------

@register(
    "t3_recent_headlines_topk",
    with_model_ctes(
        """
        SELECT id, title, sentiment, category, processed_at FROM silver
        ORDER BY processed_at DESC, id DESC LIMIT 20
        """,
        silver=True,
    ),
)
def t3(spark, sf_dir):
    return analytics.recent_headlines(model.silver_enriched(spark, sf_dir), 20)


@register(
    "q_validation_gates",
    with_model_ctes(
        f"""
        SELECT total_today, errors_today, avg_confidence_today,
               CAST(errors_today AS DOUBLE) > 0.10 * CAST(total_today AS DOUBLE) AS warn_error_rate,
               avg_confidence_today < 0.7 AS warn_low_confidence
        FROM (
          SELECT COUNT(CASE WHEN CAST(processed_at AS DATE) = DATE '{TODAY}' THEN 1 END) AS total_today,
                 COUNT(CASE WHEN CAST(processed_at AS DATE) = DATE '{TODAY}'
                             AND (sentiment = 'Erro' OR category = 'Erro') THEN 1 END) AS errors_today,
                 CAST(SUM(CASE WHEN CAST(processed_at AS DATE) = DATE '{TODAY}' AND sentiment <> 'Erro'
                               THEN CAST(confidence_score AS DECIMAL(28,6)) END) AS DOUBLE)
                   / COUNT(CASE WHEN CAST(processed_at AS DATE) = DATE '{TODAY}' AND sentiment <> 'Erro'
                                THEN confidence_score END) AS avg_confidence_today
          FROM silver
        )
        """,
        silver=True,
    ),
)
def qgates(spark, sf_dir):
    return gold.validation_gates(model.silver_enriched(spark, sf_dir), TODAY)


# ---------------------------------------------------------------------------
# Coverage completions: P8, T1/T2, T4/T5, scalar display functions, quantiles
# ---------------------------------------------------------------------------

@register(
    "p8_nulldrop_metric",
    with_model_ctes(
        """
        SELECT source, COUNT(*) AS n
        FROM silver WHERE category IS NOT NULL AND confidence_score IS NOT NULL
        GROUP BY 1
        """,
        silver=True,
    ),
)
def p8(spark, sf_dir):
    """P8 — na.drop on metric columns (streamlit_app/dashboard.py:465,506)."""
    silver = model.silver_enriched(spark, sf_dir)
    return (
        silver.na.drop(subset=["category", "confidence_score"])
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


@register(
    "t1_t2_gold_ordered",
    with_model_ctes(
        """
        SELECT * FROM gold_c
        ORDER BY analysis_date DESC, category_count DESC, category
        """,
        stg=True,
        extra=[GOLD_C_CTE],
    ),
)
def t1_t2(spark, sf_dir):
    """T1/T2 — multi-key presentation sort of the Gold output
    (dbt_project/models/gold/daily_category_analysis.sql:28-30). Spark
    tables don't persist order; the sort is the query's output order."""
    return _gold_category(spark, sf_dir).orderBy(
        F.desc("analysis_date"), F.desc("category_count"), F.asc("category")
    )


@register(
    "t4_t5_batch_limit",
    with_model_ctes(
        "SELECT id, title, sentiment, category FROM silver ORDER BY id LIMIT 50",
        silver=True,
    ),
)
def t4_t5(spark, sf_dir):
    """T4/T5 — stable-id sort + batch LIMIT (the enricher's batch_size=50
    fetch, scripts/llm_enricher.py:102; id sort scripts/llm_test_enricher.py:347)."""
    return (
        model.silver_enriched(spark, sf_dir)
        .orderBy("id")
        .limit(50)
        .select("id", "title", "sentiment", "category")
    )


@register(
    "q_scalar_display_functions",
    with_model_ctes(
        """
        SELECT id,
               strftime(processed_at, '%d/%m/%Y %H:%M') AS display_ts,
               printf('%.1f%%', confidence_score * 100) AS confidence_pct,
               substr(title, 1, 30) AS title_short,
               upper(trim(source)) AS source_norm
        FROM silver WHERE sentiment <> 'Erro'
        """,
        silver=True,
    ),
)
def q_scalar(spark, sf_dir):
    """§2.10 scalar-function surface: display timestamp format
    (dashboard.py:547), percent formatting (dashboard.py:561), truncation
    (llm_enricher.py:224), trim (scraper.py:102). confidence*100 is always
    integer-valued, so printf rounding (Java HALF_UP vs C half-even) can't
    diverge."""
    silver = model.silver_enriched(spark, sf_dir)
    return silver.filter(F.col("sentiment") != "Erro").select(
        "id",
        F.date_format("processed_at", "dd/MM/yyyy HH:mm").alias("display_ts"),
        F.format_string("%.1f%%", F.col("confidence_score") * 100).alias("confidence_pct"),
        F.substring("title", 1, 30).alias("title_short"),
        F.upper(F.trim("source")).alias("source_norm"),
    )


@register(
    "sql_api_daily_sentiment",
    with_model_ctes("SELECT * FROM gold_s", stg=True, extra=[GOLD_S_CTE]),
)
def sql_api_a1(spark, sf_dir):
    """A1 expressed through the spark.sql() surface over temp views —
    Catalyst produces the same plan as the DataFrame build (same oracle)."""
    model.stg_enriched_headlines(model.silver_enriched(spark, sf_dir)).createOrReplaceTempView(
        "stg_enriched_headlines_v"
    )
    return spark.sql(
        """
        SELECT CAST(processed_timestamp AS DATE) AS analysis_date,
               COUNT(CASE WHEN sentiment = 'Positiva' THEN 1 END) AS positive_headlines,
               COUNT(CASE WHEN sentiment = 'Negativa' THEN 1 END) AS negative_headlines,
               COUNT(CASE WHEN sentiment = 'Neutra' THEN 1 END) AS neutral_headlines,
               COUNT(headline_link) AS total_headlines
        FROM stg_enriched_headlines_v GROUP BY 1
        """
    )


@register(
    "flagship_enrichment_gold",
    with_model_ctes(
        """
        SELECT CAST(processed_at AS DATE) AS analysis_date,
               COUNT(CASE WHEN sentiment = 'Positiva' THEN 1 END) AS positive_headlines,
               COUNT(CASE WHEN sentiment = 'Negativa' THEN 1 END) AS negative_headlines,
               COUNT(CASE WHEN sentiment = 'Neutra' THEN 1 END) AS neutral_headlines,
               COUNT(headline_link) AS total_headlines
        FROM allrows GROUP BY 1
        """,
        bronze_clean=True,
        silver=True,
        extra=[
            """
            pend AS (
              SELECT bc.doc_id, bc.link, bc.scraped_at
              FROM bronze_clean bc
              LEFT JOIN (SELECT raw_link FROM silver) s ON bc.link = s.raw_link
              WHERE s.raw_link IS NULL
            )
            """.strip(),
            f"""
            newrows AS (
              SELECT link, {model._sentiment_sql('doc_id')} AS sentiment,
                     scraped_at AS processed_at
              FROM pend
            )
            """.strip(),
            """
            allrows AS (
              SELECT raw_link AS headline_link, sentiment, processed_at FROM silver
              UNION ALL
              SELECT link, sentiment, processed_at FROM newrows
            )
            """.strip(),
        ],
    ),
)
def flagship_q(spark, sf_dir):
    """The §2.9 enrichment operator END-TO-END as a hash-checked row: clean
    bronze → anti-join pending → mapInPandas mock-classify → validate →
    idempotent append → daily sentiment Gold. The oracle replays the
    pending set and the MockClassifier formulas in SQL (the classifier is
    a pure function of the row key by design — `enrichment.MockClassifier`),
    so the whole Python-crossing pipeline is value-verified, not just
    smoke-run. Same DataFrame as `entry(spark)`/bench's flagship."""
    from ..pipeline import flagship

    return flagship(spark, sf_dir)


def _profile_oracle(table: str, cols: list[str]) -> str:
    branches = []
    for c in cols:
        branches.append(
            f"""
            SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT {c}) AS n_distinct,
                   substr(CAST(MIN({c}) AS VARCHAR), 1, {profile.PROFILE_TRUNC}) AS min_value,
                   substr(CAST(MAX({c}) AS VARCHAR), 1, {profile.PROFILE_TRUNC}) AS max_value
            FROM {table}
            """.strip()
        )
    return " UNION ALL ".join(branches)


@register(
    "table_profile_documents",
    _profile_oracle("documents", ["doc_id", "text", "lang", "source", "n_chars"]),
)
def q_profile_documents(spark, sf_dir):
    """Per-column ANALYZE profile of the documents table (nulls, exact
    distincts, typed min/max) in one scan."""
    return profile.table_profile(spark, sf_dir, "documents")


@register(
    "q_expectations_report",
    """
    SELECT 'orders_key_not_null' AS rule_id, 'not_null' AS kind, 'orders' AS table_name,
           'o_orderkey' AS col_name, v AS n_violations, v = 0 AS passed
    FROM (SELECT COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS v FROM orders)
    UNION ALL
    SELECT 'orders_key_unique', 'unique', 'orders', 'o_orderkey', v, v = 0
    FROM (SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v FROM orders)
    UNION ALL
    SELECT 'orders_status_domain', 'accepted_values', 'orders', 'o_orderstatus', v, v = 0
    FROM (SELECT COUNT(CASE WHEN o_orderstatus IS NOT NULL
                             AND o_orderstatus NOT IN ('O', 'F') THEN 1 END) AS v FROM orders)
    UNION ALL
    SELECT 'orders_price_positive', 'in_range', 'orders', 'o_totalprice', v, v = 0
    FROM (SELECT COUNT(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0.0 THEN 1 END) AS v
          FROM orders)
    UNION ALL
    SELECT 'lineitem_qty_range', 'in_range', 'lineitem', 'l_quantity', v, v = 0
    FROM (SELECT COUNT(CASE WHEN l_quantity IS NOT NULL
                             AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 END) AS v
          FROM lineitem)
    UNION ALL
    SELECT 'lineitem_discount_cap', 'in_range', 'lineitem', 'l_discount', v, v = 0
    FROM (SELECT COUNT(CASE WHEN l_discount IS NOT NULL
                             AND (l_discount < 0.0 OR l_discount > 0.08) THEN 1 END) AS v
          FROM lineitem)
    UNION ALL
    SELECT 'customer_key_unique', 'unique', 'customer', 'c_custkey', v, v = 0
    FROM (SELECT COUNT(c_custkey) - COUNT(DISTINCT c_custkey) AS v FROM customer)
    UNION ALL
    SELECT 'customer_nation_not_null', 'not_null', 'customer', 'c_nationkey', v, v = 0
    FROM (SELECT COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END) AS v FROM customer)
    UNION ALL
    SELECT 'orders_customer_fk', 'foreign_key', 'orders', 'o_custkey', v, v = 0
    FROM (SELECT COUNT(*) AS v FROM orders o
          LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey
          WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
    UNION ALL
    SELECT 'lineitem_order_fk', 'foreign_key', 'lineitem', 'l_orderkey', v, v = 0
    FROM (SELECT COUNT(*) AS v FROM lineitem l
          LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
    """,
)
def q_expectations(spark, sf_dir):
    """Declarative data-quality suite over orders/lineitem/customer: all
    scalar rules per table fold into ONE scan; FK rules are key-pruned anti
    joins. Two rules are deliberately stricter than the data so the report
    carries non-zero violation counts."""
    return expectations.tpch_quality_report(spark, sf_dir)


_CASCADE_SQL = """
WITH RECURSIVE err AS (
  SELECT event_id, user_id, ts FROM {events} WHERE event_type = 'error'
),
nxt AS (
  SELECT cur_id, next_id FROM (
    SELECT c.event_id AS cur_id, n.event_id AS next_id,
           row_number() OVER (PARTITION BY c.event_id ORDER BY n.ts, n.event_id) AS rn
    FROM err c JOIN err n
      ON n.user_id = c.user_id AND n.ts > c.ts AND n.ts <= c.ts + INTERVAL 5 MINUTE
  ) WHERE rn = 1
),
heads AS (
  SELECT e.event_id FROM err e
  LEFT JOIN err p ON p.user_id = e.user_id AND p.ts < e.ts
                 AND p.ts >= e.ts - INTERVAL 5 MINUTE
  WHERE p.event_id IS NULL
),
chain(start_id, cur_id, depth) AS (
  SELECT event_id, event_id, 0 FROM heads
  UNION ALL
  SELECT c.start_id, n.next_id, c.depth + 1
  FROM chain c JOIN nxt n ON n.cur_id = c.cur_id
)
SELECT start_id, CAST(MAX(depth) + 1 AS BIGINT) AS chain_len
FROM chain GROUP BY start_id
""".strip()


@register(
    "sql_api_error_cascades",
    _CASCADE_SQL.format(events="events"),
)
def q_error_cascades(spark, sf_dir):
    """Failure-cascade chains via WITH RECURSIVE (Spark 4 recursive CTE —
    the SQL-surface twin of the iterative DataFrame CC loops): each error's
    unique successor is the same user's next error within 5 minutes; walks
    start at cascade heads (no error in the preceding 5 minutes) and
    recurse along strictly increasing event time, so the recursion is a
    DAG walk that terminates under UNION ALL with no depth knob. One path
    per head (successors are unique), so work is linear in cascade
    length. Identical SQL runs on DuckDB as the oracle."""
    from ..io import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_rcte_v")
    return spark.sql(_CASCADE_SQL.format(events="events_rcte_v"))
