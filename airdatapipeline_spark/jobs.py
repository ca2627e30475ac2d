"""Operational entry points — the reference's two Airflow DAGs as runnable
jobs (orchestration stays out-of-engine per SURVEY §7.0: point Airflow's
SparkSubmitOperator, cron, or any scheduler at these).

    python -m airdatapipeline_spark.jobs scrape  --landing DIR --warehouse DIR
    python -m airdatapipeline_spark.jobs enrich  --sf-dir DIR [--batch N]
    python -m airdatapipeline_spark.jobs gold    --sf-dir DIR --out DIR
    python -m airdatapipeline_spark.jobs validate --sf-dir DIR
    python -m airdatapipeline_spark.jobs report  --sf-dir DIR

Task mapping to the reference (file:line in /root/reference/):
  scrape   = g1_scraping_pipeline (dags/g1_scraping_dag.py:86)
  enrich   = create_silver >> check_pending >> run_llm_enricher
             (dags/g1_enrichement_dag.py:264-271)
  gold     = dbt run (README.md:139-158)
  validate = validate_enriched_data (dags/g1_enrichement_dag.py:137-193)
  report   = generate_enrichment_report (dags/g1_enrichement_dag.py:197-262)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="airdatapipeline_spark.jobs")
    sub = p.add_subparsers(dest="job", required=True)

    s = sub.add_parser("scrape")
    s.add_argument("--landing", required=True)
    s.add_argument("--warehouse", required=True)
    s.add_argument("--run-id", default="manual")

    e = sub.add_parser("enrich")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.add_argument("--batch", type=int, default=None)

    g = sub.add_parser("gold")
    g.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    g.add_argument("--out", required=True)

    v = sub.add_parser("validate")
    v.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    r = sub.add_parser("report")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = p.parse_args(argv)

    from . import model, pipeline
    from .model import TODAY
    from .operators import gold as gold_ops
    from .session import get_spark

    spark = get_spark(f"job-{args.job}")

    if args.job == "scrape":
        bronze = pipeline.run_scrape_job(spark, args.landing, args.warehouse, args.run_id)
        print(json.dumps({"job": "scrape", "bronze_rows": bronze.count()}))
    elif args.job == "enrich":
        silver = pipeline.run_enrichment(spark, args.sf_dir, batch=args.batch)
        print(json.dumps({"job": "enrich", "silver_rows": silver.count()}))
    elif args.job == "gold":
        pipeline.write_gold(spark, args.sf_dir, args.out)
        n = spark.read.parquet(f"{args.out}/daily_sentiment_analysis").count()
        print(json.dumps({"job": "gold", "sentiment_days": n, "out": args.out}))
    elif args.job == "validate":
        row = gold_ops.validation_gates(model.silver_enriched(spark, args.sf_dir), TODAY).collect()[0]
        out = {"job": "validate", **row.asDict()}
        print(json.dumps(out, default=str))
        # reference semantics: warnings, not failures (dags/g1_enrichement_dag.py:176-193)
        return 0
    elif args.job == "report":
        from .operators import relational

        silver = model.silver_enriched(spark, args.sf_dir)
        bronze_clean = relational.clean_headlines(model.bronze_headlines(spark, args.sf_dir))
        totals = gold_ops.scalar_counts(bronze_clean, silver, TODAY).collect()[0]
        top = [
            r.asDict()
            for r in gold_ops.top_categories_today(silver, TODAY, 5).collect()
        ]
        avg_t = gold_ops.avg_processing_time_today(silver, TODAY).collect()[0][0]
        print(
            json.dumps(
                {"job": "report", **totals.asDict(), "avg_processing_time": avg_t, "top_categories": top},
                default=str,
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
