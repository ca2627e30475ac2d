"""Dashboard analytic transforms (SURVEY.md §2.4 A9–A19, §2.5 W2, §2.6 T*).

The reference computes these in in-memory pandas over small Gold extracts
(/root/reference/streamlit_app/dashboard.py:261-660); here each is a
distributed DataFrame transform so the same analytics run over arbitrarily
large Gold/Silver tables. All inputs are already-aggregated Gold frames
(thousands of rows at any scale), so the plans are cheap by construction;
the ones over Silver (A9, recent_headlines) stay single-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import CATEGORIES

SENTIMENT_LABELS = {
    "positive_headlines": "Positivas",
    "negative_headlines": "Negativas",
    "neutral_headlines": "Neutras",
}


def date_range_filter(gold: DataFrame, start: str, end: str) -> DataFrame:
    """P7 — dashboard sidebar date-range filter (streamlit_app/dashboard.py:268-278)."""
    return gold.filter(
        F.col("analysis_date").between(F.lit(start).cast("date"), F.lit(end).cast("date"))
    )


def sentiment_distribution_pct(silver: DataFrame) -> DataFrame:
    """A9 + W2 — value_counts with percent-of-total
    (scripts/llm_test_enricher.py:371-383). The global total is a whole-frame
    window over the aggregate (rows = #sentiments, so the single-partition
    window is trivially small)."""
    counts = silver.groupBy("sentiment").agg(F.count("*").alias("n"))
    total = Window.partitionBy()
    # int/int → double division then *100: two IEEE ops on exact integers,
    # bit-identical across engines (no rounding — see gold.exact_avg note).
    return counts.withColumn("pct", F.col("n") / F.sum("n").over(total) * F.lit(100.0))


def period_kpis(gold_sentiment: DataFrame) -> DataFrame:
    """A10 — KPI sums + derived percentages over the filtered period
    (streamlit_app/dashboard.py:283-295)."""
    sums = gold_sentiment.agg(
        F.sum("total_headlines").alias("total"),
        F.sum("positive_headlines").alias("positive"),
        F.sum("negative_headlines").alias("negative"),
        F.sum("neutral_headlines").alias("neutral"),
    )
    return sums.select(
        "*",
        (F.col("positive") / F.col("total") * F.lit(100.0)).alias("positive_pct"),
        (F.col("negative") / F.col("total") * F.lit(100.0)).alias("negative_pct"),
        (F.col("neutral") / F.col("total") * F.lit(100.0)).alias("neutral_pct"),
    )


def category_totals(gold_category: DataFrame) -> DataFrame:
    """A11 — group-sum then sort: category totals over the period
    (streamlit_app/dashboard.py:377-379)."""
    return (
        gold_category.groupBy("category")
        .agg(F.sum("category_count").alias("total_count"))
        .orderBy(F.desc("total_count"), F.asc("category"))
    )


def top_k_categories(gold_category: DataFrame, k: int = 5) -> DataFrame:
    """T3/P9 helper — computed top-k category list (streamlit_app/dashboard.py:398)."""
    return category_totals(gold_category).limit(k)


def filter_to_top_categories(gold_category: DataFrame, k: int = 5) -> DataFrame:
    """P9 — membership filter against a computed top-k: a broadcast
    left-semi join (the top-k side is k rows, always broadcast)
    (streamlit_app/dashboard.py:398-399)."""
    top = top_k_categories(gold_category, k).select("category")
    return gold_category.join(F.broadcast(top), on="category", how="left_semi")


def pivot_date_category(gold_category: DataFrame) -> DataFrame:
    """A12 — (date × category → count) pivot, fill 0
    (streamlit_app/dashboard.py:401-407). Pivot values are pinned to the
    fixed 12-category taxonomy so the output schema is stable (and matches
    the SQL oracle's conditional-sum formulation)."""
    return (
        gold_category.groupBy("analysis_date")
        .pivot("category", list(CATEGORIES))
        .sum("category_count")
        .na.fill(0)
    )


def unpivot_sentiment_long(gold_sentiment: DataFrame) -> DataFrame:
    """A13 — melt wide sentiment columns → long (date, sentiment_type, count)
    with display-label remap (streamlit_app/dashboard.py:314-329)."""
    long = gold_sentiment.unpivot(
        ids=["analysis_date"],
        values=["positive_headlines", "negative_headlines", "neutral_headlines"],
        variableColumnName="sentiment_type",
        valueColumnName="headline_count",
    )
    label = F.col("sentiment_type")
    for src, dst in SENTIMENT_LABELS.items():
        label = F.when(F.col("sentiment_type") == src, F.lit(dst)).otherwise(label)
    return long.withColumn("sentiment_type", label)


def collect_confidences(silver: DataFrame) -> DataFrame:
    """A14 — group-collect of the confidence series per sentiment
    (streamlit_app/dashboard.py:509-510). sort_array pins element order so
    the result is deterministic under any partitioning; values are
    serialized as integer centi-units joined to a CSV string so the
    comparison is engine-portable (double→string formatting is not)."""
    cents = F.round(F.col("confidence_score") * 100).cast("long")
    return (
        silver.filter(F.col("sentiment") != "Erro")
        .groupBy("sentiment")
        .agg(F.sort_array(F.collect_list(cents)).alias("values"))
        .select(
            "sentiment",
            F.array_join(F.col("values").cast("array<string>"), ",").alias("confidence_cents"),
        )
    )


def histogram_bins(silver: DataFrame, bin_width: float = 0.05) -> DataFrame:
    """A15 — confidence histogram per sentiment, fixed-width bins
    (streamlit_app/dashboard.py:513-531)."""
    return (
        silver.filter(F.col("sentiment") != "Erro")
        .groupBy(
            "sentiment",
            F.floor(F.col("confidence_score") / F.lit(bin_width)).cast("int").alias("bin"),
        )
        .agg(F.count("*").alias("n"))
    )


def avg_headlines_per_day(gold_sentiment: DataFrame) -> DataFrame:
    """A16 — mean daily volume (streamlit_app/dashboard.py:616)."""
    # AVG over an integer column: exact integer accumulation + one double
    # division → deterministic and engine-portable without rounding.
    return gold_sentiment.agg(F.avg("total_headlines").alias("avg_headlines_per_day"))


def trend_split_halves(gold_sentiment: DataFrame) -> DataFrame:
    """A17 — split the period at its midpoint and compare the positive-share
    of each half (delta in percentage points)
    (streamlit_app/dashboard.py:618-630). ntile(2) over date order mirrors
    the pandas iloc midpoint split for even row counts."""
    halves = gold_sentiment.withColumn(
        "half", F.ntile(2).over(Window.orderBy("analysis_date"))
    )
    per_half = halves.groupBy("half").agg(
        F.sum("positive_headlines").alias("pos"), F.sum("total_headlines").alias("tot")
    )
    shares = per_half.select(
        "half", (F.col("pos") / F.col("tot") * F.lit(100.0)).alias("share")
    )
    first = shares.filter(F.col("half") == 1).select(F.col("share").alias("first_half_pct"))
    second = shares.filter(F.col("half") == 2).select(F.col("share").alias("second_half_pct"))
    return first.crossJoin(second).select(
        "first_half_pct",
        "second_half_pct",
        (F.col("second_half_pct") - F.col("first_half_pct")).alias("trend_delta_pp"),
    )


def peak_days(gold_sentiment: DataFrame) -> DataFrame:
    """A18 — argmax rows: the day with most positive / most negative
    headlines (streamlit_app/dashboard.py:632-640). Deterministic tie-break
    on earliest date; plans as TakeOrderedAndProject (no full sort)."""
    best_pos = (
        gold_sentiment.orderBy(F.desc("positive_headlines"), F.asc("analysis_date"))
        .limit(1)
        .select(
            F.col("analysis_date").alias("peak_positive_date"),
            F.col("positive_headlines").alias("peak_positive_count"),
        )
    )
    best_neg = (
        gold_sentiment.orderBy(F.desc("negative_headlines"), F.asc("analysis_date"))
        .limit(1)
        .select(
            F.col("analysis_date").alias("peak_negative_date"),
            F.col("negative_headlines").alias("peak_negative_count"),
        )
    )
    return best_pos.crossJoin(best_neg)


def column_maxes(gold_sentiment: DataFrame) -> DataFrame:
    """A19 — column-wise max of each sentiment column (styling highlight)
    (streamlit_app/dashboard.py:658-660)."""
    return gold_sentiment.agg(
        F.max("positive_headlines").alias("max_positive"),
        F.max("negative_headlines").alias("max_negative"),
        F.max("neutral_headlines").alias("max_neutral"),
        F.max("total_headlines").alias("max_total"),
    )


def recent_headlines(silver: DataFrame, k: int = 20) -> DataFrame:
    """T3 — most recent k headlines (streamlit_app/dashboard.py:169-180).
    TakeOrderedAndProject top-k; id tie-break because processed_at has
    day granularity."""
    return (
        silver.orderBy(F.desc("processed_at"), F.desc("id"))
        .limit(k)
        .select("id", "title", "sentiment", "category", "processed_at")
    )


def distinct_dates(gold_sentiment: DataFrame) -> DataFrame:
    """D4 — unique dates for the filter widget (streamlit_app/dashboard.py:197)."""
    return gold_sentiment.select("analysis_date").distinct().orderBy("analysis_date")
