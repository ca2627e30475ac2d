"""Text-mode twin of the reference's Streamlit dashboard
(/root/reference/streamlit_app/dashboard.py): same four data loads and
analytic transforms, rendered to the terminal. The display layer is thin by
design — every number comes from the distributed operators in
airdatapipeline_spark.operators.analytics, so the same code backs a real
Streamlit/BI front-end at any scale.

Usage: python tools/dashboard.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from airdatapipeline_spark import model
    from airdatapipeline_spark.operators import analytics, gold
    from airdatapipeline_spark.session import get_spark

    spark = get_spark("dashboard")
    silver = model.silver_enriched(spark, sf_dir)
    stg = model.stg_enriched_headlines(silver).cache()
    gold_s = gold.daily_sentiment_analysis(stg).cache()
    gold_c = gold.daily_category_analysis(stg)

    kpi = analytics.period_kpis(gold_s).collect()[0]
    print("=" * 64)
    print("G1 HEADLINES — SENTIMENT DASHBOARD (engine: PySpark)")
    print("=" * 64)
    print(
        f"Total: {kpi.total}   Positivas: {kpi.positive} ({kpi.positive_pct:.1f}%)   "
        f"Negativas: {kpi.negative} ({kpi.negative_pct:.1f}%)   "
        f"Neutras: {kpi.neutral} ({kpi.neutral_pct:.1f}%)"
    )

    print("\nDaily sentiment (latest 8 days):")
    for r in gold_s.orderBy("analysis_date", ascending=False).limit(8).collect():
        print(
            f"  {r.analysis_date}  pos={r.positive_headlines:<4} neg={r.negative_headlines:<4} "
            f"neu={r.neutral_headlines:<4} total={r.total_headlines}"
        )

    print("\nTop categories (period):")
    for r in analytics.top_k_categories(gold_c, 5).collect():
        print(f"  {r.category:<15} {r.total_count}")

    trend = analytics.trend_split_halves(gold_s).collect()[0]
    arrow = "↑" if trend.trend_delta_pp > 0 else ("↓" if trend.trend_delta_pp < 0 else "→")
    print(
        f"\nPositive-share trend: {trend.first_half_pct:.1f}% → "
        f"{trend.second_half_pct:.1f}%  ({arrow} {trend.trend_delta_pp:+.1f} pp)"
    )

    peaks = analytics.peak_days(gold_s).collect()[0]
    print(
        f"Peak positive day: {peaks.peak_positive_date} ({peaks.peak_positive_count})   "
        f"Peak negative day: {peaks.peak_negative_date} ({peaks.peak_negative_count})"
    )

    print("\nMost recent headlines:")
    for r in analytics.recent_headlines(silver, 5).collect():
        print(f"  [{r.sentiment:<8}] {r.title[:60]}")

    stg.unpersist()
    gold_s.unpersist()


if __name__ == "__main__":
    main()
