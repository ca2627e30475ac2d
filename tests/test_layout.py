"""Physical proof of the z-order layout claims (operators/layout.py):
the registered query simulates the layouts (value-hashed vs DuckDB); these
tests WRITE the real parquet layouts and show (a) per-file d2 spans are
narrow under z-order and corpus-wide under the d1 sort, and (b) Spark's
parquet rowgroup-stat pushdown actually skips most of the z-layout for a
d2 band filter while the d1-sorted layout decodes ~everything."""

import os
import tempfile

import pyspark.sql.functions as F

from airdatapipeline_spark.io import load_table
from airdatapipeline_spark.operators import layout

from conftest import SF_SMALL


def _scan_output_rows(df) -> int:
    """Sum of 'number of output rows' over the parquet scan nodes of the
    EXECUTED plan — rows decoded after rowgroup-stat skipping."""
    total = 0

    def walk(node):
        nonlocal total
        cls = node.getClass().getSimpleName()
        if node.nodeName().startswith("Scan parquet"):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._2().name().toString() == "Some(number of output rows)":
                    total += kv._2().value()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())
        else:
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return total


def test_zorder_physical_pruning(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_shipdate", "l_partkey", "l_quantity"
    )
    n_total = li.count()
    root = tempfile.mkdtemp(prefix="zorder_")
    zpath, lpath = os.path.join(root, "z"), os.path.join(root, "lin")
    layout.write_zorder_layout(li, zpath)
    layout.write_linear_layout(li, lpath)

    zback, lback = spark.read.parquet(zpath), spark.read.parquet(lpath)

    # (a) losslessness: both layouts hold exactly the source rows
    assert zback.count() == n_total and lback.count() == n_total

    # (b) physical clustering: per-FILE d2 span (what parquet footers see)
    def mean_d2_span(df) -> float:
        pdf = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg((F.max("d2") - F.min("d2")).alias("span"))
            .toPandas()
        )
        return float(pdf.span.mean())

    z_span, l_span = mean_d2_span(zback), mean_d2_span(lback)
    assert z_span < l_span / 2, (z_span, l_span)

    # (c) rowgroup-stat pushdown: a d2 band filter (1/16 of the domain)
    # decodes a fraction of the z-layout and ~all of the d1-sorted layout
    band = (F.col("d2") >= 32) & (F.col("d2") <= 47)
    zf, lf = zback.filter(band), lback.filter(band)
    z_rows_out = zf.collect()
    l_rows_out = lf.collect()
    # identical answers regardless of layout
    assert sorted(r["l_partkey"] for r in z_rows_out) == sorted(
        r["l_partkey"] for r in l_rows_out
    )
    z_scanned = _scan_output_rows(zf)
    l_scanned = _scan_output_rows(lf)
    # the d1-sorted layout cannot skip on d2 (every file spans the domain);
    # the z-layout decodes at most half the corpus for a 1/16 band
    assert l_scanned >= 0.9 * n_total, (l_scanned, n_total)
    assert z_scanned <= 0.5 * n_total, (z_scanned, n_total)
