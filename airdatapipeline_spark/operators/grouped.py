"""Grouped-map (applyInPandas) operators — the third UDF flavor.

Used when per-group logic genuinely needs the whole group as a pandas frame
(order statistics, per-group model fits). The shuffle is one hash exchange
on the group key; each group must fit one executor's memory — at 100 TB that
means grouping on a high-cardinality key (user_id: millions of small groups),
never on a low-cardinality one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def user_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median inter-event gap (microseconds) via applyInPandas.

    Median is an order statistic over the whole group — the canonical
    grouped-map case. Arithmetic is exact: gaps are int64 micros and the
    even-count median (mean of two ints < 2^52) is exact in float64, so the
    result matches DuckDB's quantile_cont bit-for-bit. Users with a single
    event have no gaps and emit nothing."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    df = ev.select("user_id", us.alias("t_us"))

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(pdf["t_us"].to_numpy())
        gaps = np.diff(t)
        if len(gaps) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "n_gaps": pd.Series(dtype="int64"),
                 "median_gap_us": pd.Series(dtype="float64")}
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(gaps)],
                "median_gap_us": [float(np.median(gaps))],
            }
        )

    return df.groupBy("user_id").applyInPandas(
        per_user, schema="user_id long, n_gaps long, median_gap_us double"
    )
