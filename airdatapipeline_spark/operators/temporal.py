"""Temporal join operators over the events table: as-of join and range join.

The reference has no temporal joins (SURVEY §2.3 — its only join is the
incremental anti-join, `scripts/llm_enricher.py:97-103`); these are the
training-pipeline extensions a 100 TB event log needs. Both are expressed
so Spark never plans a cross/theta join:

- **As-of join** (last purchase at-or-before each click, per user): instead
  of a per-row correlated subquery, union the two tagged event streams and
  take `last(..., ignorenulls=True)` over a (user, time)-ordered window —
  ONE shuffle on user_id, linear scan per partition, no join at all. This
  is the standard massive-scale as-of strategy (union + ordered carry-
  forward); a sort-merge "ASOF JOIN" would also work but costs two sorted
  shuffles.
- **Range join** (events within ±W of each anchor event): bucket both
  sides to W-sized time buckets and explode the probe side into its three
  adjacent buckets, turning the inequality |Δt| ≤ W into an EQUI-join on
  (user_id, bucket) plus a residual filter. The plan is a plain shuffled
  hash join — no BroadcastNestedLoopJoin — and each row joins at most 3
  bucket copies regardless of data size. Because the output is an
  aggregate COUNT (not the matched pairs), the error side pre-aggregates
  to one (user, second, n) row per distinct second BEFORE the join — so
  a hot (user, bucket) cell joins at most clicks x (2W+1) rows no matter
  how many error events pile into the window (the classic
  quadratic-blowup-under-skew cell is bounded by WINDOW WIDTH, not by
  event count; tools/measured.py's interval-skew tier measures the bound
  engaging).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table

RANGE_WINDOW_SEC = 300  # ±5 minutes


def asof_last_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the most recent purchase by the same user at
    or before the click (ts and value), NULL when none. Purchase fields
    travel together in one struct so ts/value can never disagree even if a
    purchase has a NULL value. Ties at equal ts: purchases sort before
    clicks (inclusive as-of), then by event_id for determinism."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_purchase = F.col("event_type") == "purchase"
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(
            is_purchase, F.struct(F.col("ts").alias("pts"), F.col("value").alias("pval"))
        ).alias("p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.when(is_purchase, 0).otherwise(1).asc(), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("lp", F.last("p", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("lp.pts").alias("last_purchase_ts"),
            F.col("lp.pval").alias("last_purchase_value"),
        )
    )


def range_join_errors_near_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per click event: how many error events the same user produced within
    ±5 minutes. Bucketed equi-join (see module docstring); an error at
    bucket b can only match clicks in buckets b-1..b+1, so exploding the
    error side into those three buckets makes the equi-join complete.

    Skew bound (r11): the error side first collapses to (user, second,
    count) — a partial-aggregated groupBy — so a hot user who logs a
    million errors inside one window contributes at most 2W+1 distinct
    seconds to any click's join cell. The join's intermediate row count
    is clicks x min(errors, 2W+1) per cell instead of clicks x errors;
    the per-second counts ride the join and SUM back to the exact
    per-event count the oracle computes."""
    ev = load_table(spark, sf_dir, "events")
    # timestamp_ntz → epoch seconds; session TZ is pinned UTC (io.load_table)
    sec = F.col("ts").cast("timestamp").cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        sec.alias("c_sec"),
        F.expr(f"cast(cast(ts as timestamp) as bigint) div {RANGE_WINDOW_SEC}").alias("bucket"),
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), sec.alias("e_sec"))
        .groupBy("e_user", "e_sec")
        .agg(F.count(F.lit(1)).alias("e_n"))
        .withColumn("e_bucket", F.expr(f"e_sec div {RANGE_WINDOW_SEC}"))
        .withColumn("bucket", F.explode(F.expr("array(e_bucket - 1, e_bucket, e_bucket + 1)")))
    )
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (clicks["bucket"] == errors["bucket"])
        & (F.abs(F.col("c_sec") - F.col("e_sec")) <= RANGE_WINDOW_SEC),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.coalesce(F.sum("e_n"), F.lit(0)).alias("n_errors_5min")
    )
