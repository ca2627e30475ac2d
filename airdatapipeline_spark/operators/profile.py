"""Table profiling — the ANALYZE step a 100 TB ingest runs before anything
else: per-column null counts, exact distinct cardinality, and min/max, in
ONE pass over the table.

Plan shape: a single hash-aggregate over the scan. The exact
COUNT(DISTINCT) per column makes Catalyst plan an Expand (one input row
fans out to one row per distinct-aggregate), so the map-side feed is
n_columns x the scan — still a single pass over storage, and the only
shuffle carries partial aggregates (bytes ~ distinct values, not rows).
At extreme widths swap `F.countDistinct` for `F.approx_count_distinct`
(HLL, no Expand) — kept exact here so the DuckDB oracle hash-matches.

Min/max are computed on the NATIVE type (so bigint 9 < 10, not "10" < "9")
and cast to string only for the uniform report schema, truncated to 40
chars for wide text columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

PROFILE_TRUNC = 40


def table_profile(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    distinct_mode: str = "exact",
) -> DataFrame:
    """One row per column: (column_name, n_rows, n_nulls, n_distinct,
    min_value, max_value).

    ``distinct_mode='sketch'`` is the documented extreme-width swap made
    real: per-column HLL (`approx_count_distinct` — Spark's HLL++, the
    JVM-side sibling of the portable register sketch in
    operators/sketches.py) replaces the exact COUNT(DISTINCT), which
    removes the Expand from the plan entirely (plan-asserted in
    tests/test_sketches.py) — the map-side feed drops from
    n_columns × scan back to the scan, at the price of ~2% relative
    error (rsd dial below). The registered query stays exact so the
    DuckDB oracle hash-matches; the sketch mode is for the 1000-column
    ingest profile where Expand is the bottleneck."""
    df = load_table(spark, sf_dir, table)
    if distinct_mode not in ("exact", "sketch"):
        raise ValueError(f"distinct_mode must be exact|sketch, got {distinct_mode!r}")
    nd = (
        F.countDistinct
        if distinct_mode == "exact"
        else (lambda c: F.approx_count_distinct(c, rsd=0.02))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in df.columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            nd(c).alias(f"nd_{c}"),
            F.substring(F.min(c).cast("string"), 1, PROFILE_TRUNC).alias(f"mn_{c}"),
            F.substring(F.max(c).cast("string"), 1, PROFILE_TRUNC).alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in df.columns
    )
    return one.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
