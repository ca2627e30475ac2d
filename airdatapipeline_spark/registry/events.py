"""Event-stream analytics: sessionization, funnels, cohort retention,
as-of/range temporal joins, anomaly and transition-matrix rollups."""

from __future__ import annotations

from pyspark.sql import functions as F
from ..operators import tpch
from ..operators import temporal
from .core import register
from ._shared import _DECSUM



@register(
    "events_daily_by_type",
    f"""
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
           {_DECSUM.format(expr='value')} AS total_value,
           {_DECSUM.format(expr='value')} / COUNT(value) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def ev_daily(spark, sf_dir):
    return tpch.events_daily_by_type(spark, sf_dir)


@register(
    "events_stratified_sample",
    f"""
    SELECT event_type, event_id, skey, CAST(srank AS INTEGER) AS srank FROM (
      SELECT event_type, event_id, skey,
             row_number() OVER (
               PARTITION BY event_type ORDER BY skey, event_id
             ) AS srank
      FROM (SELECT event_type, event_id,
                   CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 14))
                     AS BIGINT) % 72057594037927936 AS skey
            FROM events)
    ) WHERE srank <= {tpch.STRATA_K}
    """,
)
def ev_stratified(spark, sf_dir):
    """Exact class-balanced sampling: k rows per event_type by
    content-addressed md5 rank (reproducible across engines and
    partitionings, unlike seeded sample()); per-stratum top-k compiles
    to WindowGroupLimit so the shuffle carries ~tasks x types x k rows."""
    return tpch.events_stratified_sample(spark, sf_dir)


@register(
    "events_json_extract",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY 1
    """,
)
def ev_json(spark, sf_dir):
    return tpch.events_json_extract(spark, sf_dir)


@register(
    "events_sessionization",
    """
    WITH gapped AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS gap_us
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      FROM gapped
    ), sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, COUNT(*) AS events_in_session FROM sess GROUP BY 1, 2
    )
    SELECT user_id, COUNT(*) AS n_sessions, MAX(events_in_session) AS max_session_events,
           CAST(SUM(events_in_session) AS BIGINT) AS total_events
    FROM per_session GROUP BY 1
    """,
)
def ev_sessions(spark, sf_dir):
    return tpch.sessionize_events(spark, sf_dir)


@register(
    "ev_asof_last_purchase",
    """
    WITH t AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'purchase'
                  THEN struct_pack(pts := ts, pval := value) END AS p
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT *, last_value(p IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, CASE event_type WHEN 'purchase' THEN 0 ELSE 1 END, event_id
               ROWS UNBOUNDED PRECEDING) AS lp
      FROM t
    )
    SELECT event_id, user_id, ts AS click_ts,
           lp.pts AS last_purchase_ts, lp.pval AS last_purchase_value
    FROM w WHERE event_type = 'click'
    """,
)
def ev_asof(spark, sf_dir):
    return temporal.asof_last_purchase_before_click(spark, sf_dir)


@register(
    "ev_range_errors_near_clicks",
    """
    SELECT c.event_id, c.user_id, COUNT(e.ts) AS n_errors_5min
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
      AND abs(CAST(floor(epoch(e.ts)) AS BIGINT)
              - CAST(floor(epoch(c.ts)) AS BIGINT)) <= 300
    GROUP BY 1, 2
    """,
)
def ev_range(spark, sf_dir):
    return temporal.range_join_errors_near_clicks(spark, sf_dir)


@register(
    "events_multires_rollup",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_start, event_type, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(28,6))) AS val_dec
      FROM events GROUP BY 1, 2
    )
    SELECT '1h' AS resolution, bucket_start, event_type, n,
           CAST(val_dec AS DOUBLE) AS total_value
    FROM hourly
    UNION ALL
    SELECT '1d', date_trunc('day', bucket_start), event_type,
           CAST(SUM(n) AS BIGINT), CAST(SUM(val_dec) AS DOUBLE)
    FROM hourly GROUP BY 1, 2, 3
    """,
)
def ev_multires(spark, sf_dir):
    return tpch.events_multires_rollup(spark, sf_dir)


@register(
    "events_daily_anomalies",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT day, event_type, n,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days,
             SUM(n) OVER (PARTITION BY event_type) AS sum_n,
             SUM(n * n) OVER (PARTITION BY event_type) AS sumsq_n
      FROM daily
    )
    SELECT day, event_type, n,
           sum_n / n_days AS mean_n,
           (n - sum_n / n_days)
             / sqrt(sumsq_n / n_days - (sum_n / n_days) * (sum_n / n_days)) AS z_score,
           abs((n - sum_n / n_days)
             / sqrt(sumsq_n / n_days - (sum_n / n_days) * (sum_n / n_days))) > 2.0
             AS is_anomaly
    FROM stats
    WHERE sumsq_n / n_days - (sum_n / n_days) * (sum_n / n_days) > 0
    """,
)
def ev_anomalies(spark, sf_dir):
    """Daily volume z-score anomalies (exact integer sums -> single IEEE
    derivations)."""
    return tpch.events_daily_anomalies(spark, sf_dir)


@register(
    "events_cohort_retention",
    f"""
    WITH acts AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{tpch.COHORT_EPOCH}', CAST(ts AS DATE)) // 7 AS week_idx
      FROM events
    ),
    cohorts AS (SELECT user_id, MIN(week_idx) AS cohort_week FROM acts GROUP BY 1)
    SELECT c.cohort_week, a.week_idx - c.cohort_week AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active_users
    FROM acts a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def ev_cohort(spark, sf_dir):
    """Weekly cohort retention matrix (first-event cohorts, integer week
    arithmetic from a fixed epoch)."""
    return tpch.events_cohort_retention(spark, sf_dir)


@register(
    "events_funnel",
    """
    WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, MIN(us) AS view_us FROM base
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT b.user_id, MIN(b.us) AS click_us, MIN(v.view_us) AS view_us
          FROM base b JOIN v ON b.user_id = v.user_id
          WHERE b.event_type = 'click' AND b.us > v.view_us GROUP BY 1),
    p AS (SELECT b.user_id, MIN(b.us) AS purchase_us, MIN(c.view_us) AS view_us
          FROM base b JOIN c ON b.user_id = c.user_id
          WHERE b.event_type = 'purchase' AND b.us > c.click_us GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_full_funnel,
           (SELECT COUNT(*) FROM c) / (SELECT COUNT(*) FROM v) AS click_rate,
           (SELECT COUNT(*) FROM p) / (SELECT COUNT(*) FROM v) AS funnel_rate,
           ((SELECT SUM(purchase_us - view_us) FROM p)
              / (SELECT COUNT(*) FROM p)) / 1000000.0 AS avg_convert_sec
    """,
)
def ev_funnel(spark, sf_dir):
    """Ordered view → click → purchase conversion funnel with strict
    event-time ordering between stages."""
    return tpch.events_funnel(spark, sf_dir)


@register(
    "events_user_features",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def q_user_features(spark, sf_dir):
    """Per-user behavioral feature table — the feature-extraction step a
    training pipeline feeds to a model: one hash-agg shuffle on user_id,
    conditional counts for the type pivots, decimal-exact value sum, and
    the activity span. At 100 TB this is the canonical map-side-combine
    aggregation: the shuffle carries one partial row per (partition,
    user)."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.col("ts").cast("date")).alias("active_days"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
    )


@register(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    t AS (SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, n,
           n / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
    FROM t
    """,
)
def q_transition_matrix(spark, sf_dir):
    """Per-user event-transition (Markov) matrix: consecutive event pairs
    by event time (ties broken by event_id — deterministic), counted and
    normalized per source state. The full-path generalization of the
    fixed-path funnel: one user_id shuffle for the lead window + one
    (src,dst) agg; the normalizing window runs over the ~|types|² matrix,
    not the events."""
    from pyspark.sql import Window

    from ..io import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    per_src = Window.partitionBy("src")
    return t.select(
        "src",
        "dst",
        "n",
        (F.col("n") / F.sum("n").over(per_src).cast("double")).alias("p"),
    )


# --- histogram quantile sketch (operators/sketches.py) -----------------------

from ..operators import sketches as _sk  # noqa: E402

_HQ_W = repr(_sk.HQ_WIDTH)

# The sketch-build + probe CTE chain, shared VERBATIM by the batch oracle
# (agg_quantile_histogram_sketch, which adds the exact-rank verifier) and
# the streaming twin's oracle (stream_quantile_ingest_append in
# registry/streaming.py, which reads the probe directly — the drained
# merge-on-read estimate equals the batch sketch). The GREATEST(..., 0)
# lower clamp mirrors sketches.hq_bin_expr (ADVICE-r9: boundedness must
# hold for out-of-domain negative values too).
HQ_PROBE_CTES = f"""
    binned AS (
      SELECT event_type,
             CAST(GREATEST(LEAST(floor(value / {_HQ_W}),
                                 {float(_sk.HQ_BINS - 1)!r}), 0.0) AS INTEGER) AS bin,
             value
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    hist AS (SELECT event_type, bin, COUNT(*) AS cnt FROM binned GROUP BY 1, 2),
    totals AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_events
               FROM hist GROUP BY 1),
    cum AS (SELECT event_type, bin, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM hist),
    qs AS (SELECT unnest([{", ".join(repr(q) for q in _sk.HQ_QS)}]) AS q),
    pr AS (SELECT c.event_type, s.q, t.n_events, c.bin, c.cnt, c.cum,
                  CAST(ceil(s.q * t.n_events) AS BIGINT) AS r
           FROM cum c JOIN totals t USING (event_type) CROSS JOIN qs s),
    probe AS (SELECT event_type, q, n_events,
                     CAST(bin AS DOUBLE) * {_HQ_W}
                       + {_HQ_W} * (CAST(r - (cum - cnt) AS DOUBLE)
                                    / CAST(cnt AS DOUBLE)) AS est
              FROM pr WHERE cum >= r AND cum - cnt < r)"""


@register(
    "agg_quantile_histogram_sketch",
    f"""
    WITH {HQ_PROBE_CTES},
    ranked AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY value) AS rn
               FROM binned),
    exact AS (SELECT rk.event_type, s.q, rk.value AS exact
              FROM ranked rk JOIN totals t USING (event_type) CROSS JOIN qs s
              WHERE rk.rn = CAST(ceil(s.q * t.n_events) AS BIGINT))
    SELECT p.event_type, p.q, p.n_events, p.est, e.exact,
           abs(p.est - e.exact) AS abs_err
    FROM probe p JOIN exact e ON e.event_type = p.event_type AND e.q = p.q
    ORDER BY p.event_type, p.q
    """,
)
def ev_quantile_sketch(spark, sf_dir):
    """Mergeable 256-bin histogram quantile sketch per event type, graded
    against exact rank-select quantiles (sketches.quantile_histogram_sketch
    docstring) — completes the sketch triad (cardinality/frequency/
    quantiles); unlike Spark's approxQuantile the estimate is
    partitioning-independent and value-hashes in DuckDB."""
    return _sk.quantile_histogram_sketch(spark, sf_dir)
