"""Snapshot drift detection for training-data pipelines.

Extension family (no reference counterpart — the reference's ETL,
/root/reference/scripts/*.py, processes one day's headlines; a web-scale
corpus pipeline re-ingests continuously and must detect when a NEW
snapshot's distribution has drifted from the one the filters/mixers were
tuned on — the data-quality gate every production training pipeline runs
before retraining: "did the crawler/upstream change under us?").

Design (the repo's engine-parity + 100 TB rules):

- **Fixed-bin histograms, not quantile comparisons**: each per-document
  metric (token count, char length) is clamped into DRIFT_BINS fixed
  equi-width bins — per-snapshot state is <= metrics x DRIFT_BINS integer
  counters, mergeable by plain SUM (the quantile-sketch contract), built
  by ONE partial-aggregated groupBy over ONE corpus scan (both metrics
  ride a single stack() unpivot — no second scan).
- **ln-free divergence**: PSI's per-bin ln(pA/pB) would hang parity on
  libm rounding (the BM25/LM lesson). The drift statistic here is total
  variation distance, computed EXACTLY in integers before one final
  division: |cA*totB - cB*totA| summed order-free (no float accumulation
  hazard), TVD = that sum / (2*totA*totB) — a single deterministic IEEE
  division from exact integer state, bit-equal in both engines. Per-bin
  probability columns are likewise single divisions. The exact integer
  arithmetic runs in decimal(38,0) on the Spark side and HUGEINT (int128)
  in the DuckDB oracle (ADVICE-r10: BIGINT numerators overflow once a
  snapshot exceeds ~3e9 docs; both widened types are exact past 1e18 docs
  per side, i.e. unbounded at any realistic corpus). The reported
  `tvd_num` column is the exact value cast once to double — both engines
  round-to-nearest the same integer, so the cast is bit-equal too.
- **Thresholded decision**: the gate's yes/no is itself part of the
  contract — `retrain_alert` = (tvd > DRIFT_ALERT_TVD), NULL when TVD is
  undefined (one-sided snapshot). The threshold is a pinned module
  constant interpolated into the oracle, so online, offline, and oracle
  alert decisions are the same comparison on the same bit-equal double.
- **Deterministic snapshots**: A/B = doc_id parity (stands in for
  yesterday's vs today's ingest partition; at 100 TB the two sides are
  two date partitions and the histogram build prunes to them).

Empty-bin behavior: bins unseen in BOTH snapshots contribute nothing and
are absent from the output; a bin seen in only one contributes its full
mass to the TVD (|cA*totB - 0|), which is exactly the drift signal —
no +1 smoothing noise needed (the c-TF-IDF exactness argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .text import tokens_col

DRIFT_BINS = 16
DRIFT_TOKEN_WIDTH = 16  # documents run ~tens-to-hundreds of tokens
DRIFT_CHAR_WIDTH = 128
# Retrain-alert threshold on metric-level TVD (in [0,1]). 0.1 is the
# common "significant shift" bar from the PSI literature's 0.1/0.25
# bands, applied to TVD's comparable scale. Interpolated into the DuckDB
# oracle (registry/text.py) so both engines run the same comparison.
DRIFT_ALERT_TVD = 0.1


def _bin(col, width: int):
    return F.greatest(
        F.least(
            F.floor(col / F.lit(width)).cast("int"), F.lit(DRIFT_BINS - 1)
        ),
        F.lit(0),
    )


def drift_binned(docs_with_flag: DataFrame, keys: tuple = ()) -> DataFrame:
    """(*keys, is_a, metric, bin) rows from documents carrying an `is_a`
    snapshot flag — ONE scan for both metrics (the stack() unpivot), so
    the single downstream groupBy's partial aggregation collapses
    map-side to <= 2 x DRIFT_BINS x 2 counters per task (per key). SHARED
    by the batch query and the streaming gate so the two binnings cannot
    drift; the gate passes keys=("fpath",) to carry the per-file counter
    key through."""
    docs = docs_with_flag.select(
        *keys,
        "is_a",
        F.size(tokens_col()).alias("n_tok"),
        F.length("text").alias("n_chr"),
    )
    return (
        docs.withColumn("tok_bin", _bin(F.col("n_tok"), DRIFT_TOKEN_WIDTH))
        .withColumn("chr_bin", _bin(F.col("n_chr"), DRIFT_CHAR_WIDTH))
        .selectExpr(
            *keys,
            "is_a",
            "stack(2, 'tokens', tok_bin, 'chars', chr_bin) AS (metric, bin)",
        )
    )


def drift_histogram(binned: DataFrame, keys: tuple = ()) -> DataFrame:
    """(*keys, metric, bin, n_a, n_b) counter state — mergeable by plain
    SUM, which is what the streaming gate's merge-on-read exploits. With
    keys=("source",) the state is sources x metrics x DRIFT_BINS integer
    counters — still broadcast-sized for any realistic source count."""
    return binned.groupBy(*keys, "metric", "bin").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).cast("long").alias("n_b"),
    )


def drift_scores(hist: DataFrame, keys: tuple = ()) -> DataFrame:
    """TVD probe over histogram state (*keys, metric, bin, n_a, n_b) —
    SHARED verbatim by the batch queries and the streaming gate's read
    path so online and offline drift decisions cannot diverge.
    Exact-integer numerators in decimal(38,0) (module docstring: BIGINT
    cross-products overflow past ~3e9 docs/side; decimal(38,0) and the
    oracle's HUGEINT are exact past 1e18), one final IEEE division per
    float column, and the thresholded `retrain_alert` decision on the
    metric-level TVD."""
    from pyspark.sql import Window

    per_metric = Window.partitionBy(*keys, "metric")

    def dec(col):
        return col.cast("decimal(38,0)")

    scored = (
        hist.withColumn("tot_a", F.sum("n_a").over(per_metric))
        .withColumn("tot_b", F.sum("n_b").over(per_metric))
        .withColumn(
            "tvd_num_x",
            F.abs(dec(F.col("n_a")) * F.col("tot_b") - dec(F.col("n_b")) * F.col("tot_a")),
        )
        .withColumn("tvd_den", dec(F.lit(2)) * F.col("tot_a") * F.col("tot_b"))
    )
    # one-sided snapshots (a brand-new pipeline with no reference yet, or
    # zero arrivals) have no defined probability/TVD: NULL, not a
    # divide-by-zero crash (ANSI) — found by the drift differential fuzz;
    # mirrored as CASE WHEN in the oracle and as None in the pure-Python
    # reference
    return (
        scored.select(
            *keys,
            "metric",
            F.col("bin").cast("long").alias("bin"),  # BIGINT — matches the
            # oracle's DuckDB integer promotion through stack/union
            "n_a",
            "n_b",
            F.when(
                F.col("tot_a") > 0,
                F.col("n_a").cast("double") / F.col("tot_a").cast("double"),
            ).alias("p_a"),
            F.when(
                F.col("tot_b") > 0,
                F.col("n_b").cast("double") / F.col("tot_b").cast("double"),
            ).alias("p_b"),
            F.col("tvd_num_x").cast("double").alias("tvd_num"),
            F.when(
                (F.col("tot_a") > 0) & (F.col("tot_b") > 0),
                F.sum("tvd_num_x").over(per_metric).cast("double")
                / F.col("tvd_den").cast("double"),
            ).alias("tvd"),
        )
        .withColumn(
            "retrain_alert",
            F.when(
                F.col("tvd").isNotNull(), F.col("tvd") > F.lit(DRIFT_ALERT_TVD)
            ),
        )
        .orderBy(*keys, "metric", "bin")
    )


def snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two corpus snapshots, per metric:
    one row per (metric, bin) present in either snapshot, with the exact
    per-snapshot counts, single-division probabilities, the bin's exact
    integer TVD contribution, and the metric-level total variation
    distance repeated per row (so the oracle value-hashes the whole
    decision surface, not just the scalar).

    Columns: metric, bin, n_a, n_b, p_a, p_b, tvd_num (exact
    |cA*totB - cB*totA|, computed in decimal(38,0) and reported as
    double), tvd (metric-level, in [0,1]), retrain_alert
    (tvd > DRIFT_ALERT_TVD; NULL when tvd is undefined)."""
    docs = load_table(spark, sf_dir, "documents").select(
        ((F.col("doc_id") % 2) == 0).alias("is_a"), "text"
    )
    return drift_scores(drift_histogram(drift_binned(docs)))


def snapshot_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source snapshot drift — the production question behind the
    global check is "WHICH upstream changed under us": one global TVD can
    stay flat while a single crawler source shifts hard (its mass is
    diluted by the stable sources). Same one-scan build as
    `snapshot_drift` with `source` threaded through `keys` (the seam the
    streaming gate already uses for its per-file counter key), so the
    state is sources x metrics x DRIFT_BINS integer counters and the
    per-source decision surface — counts, probabilities, exact TVD
    numerators, metric-level TVD, and the thresholded retrain_alert — is
    value-hashed per (source, metric, bin).

    At 100 TB: the extra key multiplies counter state by the source
    count (tens to thousands), still a broadcast-sized probe table; the
    shuffle stays the single partial-aggregated groupBy. Skew-safe: a
    hot source concentrates mass in its own key's <= metrics x
    DRIFT_BINS rows, never in a hot shuffle partition (tools/measured.py's
    skewed-source tier measures the bound; bench.py's replica tier
    measures linear-scan scaling under fixed counter state).

    Snapshot flag: bit 16 of the Knuth multiplicative hash
    `(doc_id * 2654435761) div 65536 % 2` rather than the global check's
    parity — the synthetic corpora stripe source = doc_id mod n_sources
    (TESTDATA.md), so parity is CONSTANT within a source and every
    per-source comparison would be one-sided; an earlier `% 7` flag was
    only two-sided because 7 happened to be coprime to the striping
    (ADVICE-r11), while a mixed hash bit splits every source regardless
    of the stripe modulus (the carries from the odd multiplier reach bit
    16 from every input bit, so no residue class is constant). Same
    64-bit integer arithmetic in DuckDB (`//` = `div` for non-negative
    ids). doc_id is masked to 31 bits BEFORE the multiply: the raw
    product overflows BIGINT past doc_id ~3.4e9 under ANSI — found live
    by the r12 beyond-10x probe, whose x100 replica ids (copy x 1e8
    key offsets) crashed the unmasked flag — while (2^31-1) x
    2654435761 < 2^63 stays exact for ANY id, and the mask keeps all
    low bits so the striping-independence argument is unchanged. In
    production both flags are the same thing: the ingest date-partition
    column."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr("(((doc_id % 2147483648) * 2654435761) div 65536) % 2 = 0").alias("is_a"),
        "text",
    )
    keys = ("source",)
    return drift_scores(drift_histogram(drift_binned(docs, keys=keys), keys=keys), keys=keys)
