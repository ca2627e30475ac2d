"""Source/sink tests (SURVEY.md §2.1): scrape job, CSV round-trip, DDL,
partitioned silver + pruning."""

import tempfile

import pyspark.sql.functions as F
import pytest

from airdatapipeline_spark import model, pipeline
from airdatapipeline_spark.sources import csv_io, scrape

from conftest import SF_SMALL


def test_scrape_job_end_to_end(spark):
    land = tempfile.mkdtemp(prefix="land_")
    wh = tempfile.mkdtemp(prefix="wh_")
    bronze = pipeline.run_scrape_job(spark, land, wh, run_id="t1")
    pdf = bronze.toPandas()
    assert len(pdf) > 0
    assert pdf.link.str.startswith("http").all()  # cleaned before landing
    assert pdf.link.is_unique
    # SNK1 overwrite semantics: a second run replaces, not appends
    bronze2 = pipeline.run_scrape_job(
        spark, land, wh, run_id="t2", scraper=scrape.FakeScraper(n_rows=50)
    )
    assert bronze2.count() < len(pdf)


def test_playwright_scraper_is_stub():
    with pytest.raises(NotImplementedError):
        scrape.PlaywrightScraper().scrape()


def test_csv_roundtrip_lossless(spark):
    from airdatapipeline_spark.operators import relational

    clean = relational.clean_headlines(model.bronze_headlines(spark, SF_SMALL))
    land = tempfile.mkdtemp(prefix="csv_")
    csv_io.write_headlines_csv(clean, land, "r1")
    back = csv_io.read_headlines_csv(spark, csv_io.latest_run_dir(land))
    a = clean.orderBy("doc_id").toPandas()
    b = back.orderBy("doc_id").toPandas()
    assert a.equals(b)  # schema-pinned CSV round-trip is exact


def test_latest_run_dir_picks_newest(spark):
    from airdatapipeline_spark.operators import relational

    clean = relational.clean_headlines(model.bronze_headlines(spark, SF_SMALL))
    land = tempfile.mkdtemp(prefix="csv_")
    csv_io.write_headlines_csv(clean.limit(5), land, "r1")
    csv_io.write_headlines_csv(clean.limit(9), land, "r2")
    assert csv_io.latest_run_dir(land).endswith("run_id=r2")
    assert csv_io.read_headlines_csv(spark, csv_io.latest_run_dir(land)).count() == 9


def test_ddl_create_tables_idempotent(spark):
    wh = tempfile.mkdtemp(prefix="wh_")
    csv_io.create_tables(spark, wh)
    csv_io.create_tables(spark, wh)  # IF NOT EXISTS — no error
    tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {"raw_headlines", "silver_enriched_headlines"} <= tables
    spark.sql("DROP TABLE raw_headlines")
    spark.sql("DROP TABLE silver_enriched_headlines")


def test_partitioned_silver_prunes(spark):
    silver = model.silver_enriched(spark, SF_SMALL)
    wh = tempfile.mkdtemp(prefix="wh_")
    path = csv_io.write_silver_partitioned(silver, wh)
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("processed_date") == F.lit(model.TODAY).cast("date"))
    # the physical plan must contain a partition filter (pruned scan)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "processed_date" in plan
    assert pruned.count() == silver.filter(F.to_date("processed_at") == model.TODAY).count()
