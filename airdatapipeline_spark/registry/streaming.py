"""Structured Streaming extensions: windowed appends, stream-stream joins,
watermarked dedup, stateful counts, curated ingest."""

from __future__ import annotations

from ..operators import corpus
from ..operators import text
from ..streaming import events as streaming_events
from .core import register
from ._shared import _SQL_LIST, _TOKS, _langid_case



@register(
    "stream_tumbling_append",
    """
    WITH ev AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
    agg AS (
      SELECT (us // 3600000000) * 3600000000 AS hour_us, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      FROM ev GROUP BY 1, 2
    )
    SELECT make_timestamp(hour_us) AS window_start, event_type, n, total_value
    FROM agg
    WHERE hour_us + 3600000000 <= (SELECT MAX(us) - 600000000 FROM ev)
    """,
)
def st_tumbling_append(spark, sf_dir):
    """Append-mode + watermark-evicted tumbling windows to a FILE sink —
    the scale path (bounded state, no driver materialization). The oracle
    keeps only windows finalized by the terminal watermark:
    window_end <= max(event_time) - 10min (inclusive boundary, verified)."""
    return streaming_events.tumbling_counts_append(spark, sf_dir)


@register(
    "stream_session_append",
    """
    WITH gapped AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS gap_us
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN gap_us IS NULL OR gap_us >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
      FROM gapped
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, MIN(ts) AS session_start, MAX(epoch_us(ts)) AS end_us, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, n_events
    FROM sessions
    WHERE end_us + 1800000000 <= (SELECT MAX(epoch_us(ts)) - 3600000000 FROM events)
    """,
)
def st_sessions_append(spark, sf_dir):
    """Append-mode session windows: a session (end = last event + 30min gap)
    is emitted and evicted once the 1-hour watermark passes its end."""
    return streaming_events.session_counts_append(spark, sf_dir)


@register(
    "stream_stateful_user_counts",
    """
    SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1
    """,
)
def st_stateful(spark, sf_dir):
    """applyInPandasWithState running counter; final state ≡ batch count."""
    return streaming_events.stateful_user_counts(spark, sf_dir)


@register(
    "stream_sliding_append",
    """
    WITH ev AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
    expanded AS (
      SELECT (us // 1800000000 - o.k) * 1800000000 AS start_us, event_type, value
      FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS k) o
    ),
    agg AS (
      SELECT start_us, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      FROM expanded GROUP BY 1, 2
    )
    SELECT make_timestamp(start_us) AS window_start,
           make_timestamp(start_us + 3600000000) AS window_end,
           event_type, n, total_value
    FROM agg
    WHERE start_us + 3600000000 <= (SELECT MAX(us) - 600000000 FROM ev)
    """,
)
def st_sliding_append(spark, sf_dir):
    """Append-mode sliding windows (1h size / 30m slide): each event expands
    into its 2 containing windows JVM-side; only watermark-finalized windows
    are emitted to the file sink."""
    return streaming_events.sliding_counts_append(spark, sf_dir)


@register(
    "stream_dedup_append",
    """
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id, event_type FROM events
    """,
)
def st_dedup_append(spark, sf_dir):
    """Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark) to
    a file sink; single-replay output = DISTINCT keys."""
    return streaming_events.dedup_keys_append(spark, sf_dir)


@register(
    "stream_join_append",
    """
    SELECT c.user_id AS user_id, c.event_id AS click_id, e.event_id AS error_id,
           c.ts AS click_ts, e.ts AS error_ts
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 5 MINUTE
    WHERE c.event_type = 'click' AND e.event_type = 'error'
    """,
)
def st_join_append(spark, sf_dir):
    """Watermarked stream-stream interval inner join (bounded buffers on
    both sides); committed file output = the batch interval join."""
    return streaming_events.clicks_errors_join_append(spark, sf_dir)


@register(
    "stream_join_outer_append",
    """
    WITH ck AS (
      SELECT user_id AS c_user, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ),
    er AS (
      SELECT user_id AS e_user, ts AS error_ts, event_id AS error_id
      FROM events WHERE event_type = 'error'
    ),
    j AS (
      SELECT er.e_user AS user_id, er.error_id, ck.click_id, er.error_ts
      FROM er LEFT JOIN ck
        ON ck.c_user = er.e_user
       AND ck.click_ts <= er.error_ts
       AND ck.click_ts >= er.error_ts - INTERVAL 5 MINUTE
    ),
    wm AS (
      SELECT LEAST((SELECT MAX(ts) FROM events WHERE event_type = 'click'),
                   (SELECT MAX(ts) FROM events WHERE event_type = 'error'))
             - INTERVAL 10 MINUTE AS w
    )
    SELECT user_id, error_id, click_id, error_ts
    FROM j, wm
    WHERE click_id IS NOT NULL OR error_ts < wm.w
    """,
)
def q_stream_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join, append mode: matched pairs
    emit immediately; null-joined errors emit at state eviction (error_ts
    below the final global watermark) — the oracle replays exactly that
    emission rule."""
    return streaming_events.clicks_errors_left_join_append(spark, sf_dir)


@register(
    "stream_curated_ingest",
    f"""
    WITH scored AS (
      SELECT md5(text) AS fingerprint, len(t) AS word_count,
             length(text) AS char_count,
             {", ".join(
                 f"len(list_filter(t, x -> list_contains({_SQL_LIST(text.LANG_STOPWORDS[lg])}, x))) AS hits_{lg}"
                 for lg in text.LANG_PRIORITY
             )}
      FROM (SELECT text, {_TOKS} AS t FROM documents)
    ),
    gated AS (
      SELECT fingerprint, word_count,
             least(word_count / 100.0, 1.0) * 0.4 + (hits_en / word_count) * 0.4
               + least((char_count / word_count) / 8.0, 1.0) * 0.2 AS quality_score,
             {_langid_case()} AS predicted_lang
      FROM scored
    )
    SELECT DISTINCT fingerprint, word_count, quality_score, predicted_lang
    FROM gated
    WHERE quality_score >= 0.5 AND predicted_lang = 'en' AND word_count >= 20
    """,
)
def st_curated_ingest(spark, sf_dir):
    """The batch curation gate as continuous Structured Streaming ingest:
    quality + language ID + exact content dedup at the landing zone, append
    parquet sink. Every output column is a pure function of text, so the
    committed set equals the batch DISTINCT the oracle replays."""
    return streaming_events.curated_ingest_append(spark, sf_dir)


@register(
    "stream_shard_ingest",
    f"""
    WITH per AS (
      SELECT doc_id, len({_TOKS}) AS n_tok,
             CAST(concat('0x', substr(md5(text), 1, 14)) AS BIGINT) AS chash
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT doc_id) AS n_unique_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(chash) % {corpus.HASH_SUM_MOD} AS BIGINT) AS content_hash_sum,
           CAST(0 AS BIGINT) AS contiguity_violations
    FROM per
    """,
)
def st_shard_ingest(spark, sf_dir):
    """The r6 incremental shard lifecycle as CONTINUOUS ingest: three
    deterministic delta files stream through foreachBatch ->
    corpus.append_docs, growing one layout through three real appends.
    Shard placement depends on batch arrival order, so the checked surface
    is the batch-order-INVARIANT global contract: every document exactly
    once (counts + mod-prime content fingerprint), token mass conserved,
    and offsets contiguous (zero gaps/overlaps walking the layout in
    offset order — the oracle pins that count at literal 0, so a single
    misplaced append reds the row)."""
    return streaming_events.shard_ingest_append(spark, sf_dir)


from .text import _LM_SQL  # noqa: E402  (the batch filter's oracle, reused)


@register(
    "stream_lm_gated_ingest",
    f"""
    SELECT doc_id, source, n_bigrams, hapax_bigrams, cross_entropy
    FROM ({_LM_SQL}) WHERE keep
    """,
)
def st_lm_gated_ingest(spark, sf_dir):
    """Model-scoring-at-ingest: the offline-trained bigram LM applied to
    arriving documents per micro-batch (foreachBatch stream-static
    pattern), keep-survivors appended to a checkpointed parquet sink with
    a committed-ids anti-join for redelivery idempotency. The scoring
    path is byte-identical to the batch filter (lm_score_documents), so
    the committed set equals the batch keep set — the oracle is the batch
    filter's SQL restricted to keep."""
    return streaming_events.lm_gated_ingest_append(spark, sf_dir)


from ..operators import similarity as _sim  # noqa: E402
from .simsearch import km_assignment_oracle_sql  # noqa: E402


@register(
    "stream_kmeans_assign_ingest",
    km_assignment_oracle_sql(_sim.KM_K, _sim.KM_ITERS, _sim.EMB_DIM),
)
def st_kmeans_assign_ingest(spark, sf_dir):
    """Cluster-assignment-at-ingest: the offline-trained integer-lattice
    k-means centroids applied to arriving embeddings per micro-batch —
    the vector twin of stream_lm_gated_ingest's model-at-the-door
    contract. Assignment rides the SAME _km_assign path as the batch
    operator (byte-identical scoring; online/offline cannot drift) with
    a committed-vec_ids anti-join for redelivery idempotency, so the
    committed set equals the batch full-corpus assignment — the oracle
    replays exactly that final-assignment table."""
    return streaming_events.kmeans_assign_ingest_append(spark, sf_dir)


from ..operators import sketches as _sk  # noqa: E402
from .text import _SKETCH_SHINGLE_CTES  # noqa: E402


@register(
    "stream_hll_register_ingest",
    f"""
    WITH {_SKETCH_SHINGLE_CTES},
    rho AS (SELECT source, h % {_sk.HLL_M} AS j,
                   CASE WHEN h // {_sk.HLL_M} = 0 THEN {_sk.HLL_RHO_MAX}
                        ELSE {_sk.HLL_RHO_MAX} - length(bin(h // {_sk.HLL_M}))
                   END AS rho
            FROM hashed),
    regs_src AS (SELECT source AS scope, j, MAX(rho) AS m FROM rho GROUP BY 1, 2),
    regs AS (SELECT * FROM regs_src
             UNION ALL
             SELECT '{_sk.ALL_SCOPE}' AS scope, j, MAX(m) AS m
             FROM regs_src GROUP BY 2),
    stats AS (SELECT scope,
                     CAST(SUM(1::BIGINT << ({_sk.HLL_SCALE_BITS} - m)) AS BIGINT)
                       + ({_sk.HLL_M} - COUNT(*))
                         * (1::BIGINT << {_sk.HLL_SCALE_BITS}) AS s_int,
                     CAST({_sk.HLL_M} - COUNT(*) AS BIGINT) AS zero_registers
              FROM regs GROUP BY 1)
    SELECT scope, {_sk.HLL_EST_NUM!r} / CAST(s_int AS DOUBLE) AS hll_estimate,
           zero_registers
    FROM stats ORDER BY scope
    """,
)
def st_hll_register_ingest(spark, sf_dir):
    """Sketch-maintenance-at-ingest: each arriving micro-batch appends its
    PARTIAL HyperLogLog registers (byte-identical build to the batch
    query); the live estimate is the max-merge on read. Unlike the other
    ingest twins, redelivery needs NO committed-key anti-join — max-merge
    is commutative and idempotent (the CRDT argument; pytest redelivers a
    file and asserts bit-identical estimates), which is why sketches are
    the streaming cardinality primitive at 100 TB. The drained estimate
    equals the batch sketch over the same corpus — the oracle replays the
    batch formula."""
    return streaming_events.hll_register_ingest_append(spark, sf_dir)


from .events import HQ_PROBE_CTES  # noqa: E402  (the batch sketch's probe, reused)


@register(
    "stream_quantile_ingest_append",
    f"""
    WITH {HQ_PROBE_CTES}
    SELECT event_type, q, n_events, est FROM probe ORDER BY event_type, q
    """,
)
def st_quantile_ingest(spark, sf_dir):
    """Quantile-sketch-maintenance-at-ingest: each arriving micro-batch
    appends its PARTIAL 256-bin histogram counters (byte-identical build
    to the batch sketch) keyed by a content fingerprint of the source
    file; the live estimate is max-merge-per-fingerprint (absorbing
    redelivered content with no committed-key bookkeeping) then SUM across
    files on read, probed through the batch query's own
    hq_quantile_estimates path. The drained estimate equals the batch
    sketch over the same corpus — the oracle replays the batch probe."""
    return streaming_events.quantile_ingest_append(spark, sf_dir)


from .text import _DRIFT_SQL  # noqa: E402  (the batch drift oracle, reused)


@register("stream_drift_gate_ingest", _DRIFT_SQL)
def st_drift_gate_ingest(spark, sf_dir):
    """Drift-monitoring-at-ingest: the batch retrain gate evaluated
    continuously — the reference snapshot's histogram is the deployed
    model artifact (the LM/k-means/HLL pattern), each arriving
    micro-batch appends content-fingerprint-keyed partial counters for
    its NEW docs (max-merge absorbs redelivered content before the
    cross-file SUM, the quantile twin's idiom), and the read path scores
    reference+arriving state through the SAME drift_scores probe as the
    batch query. The drained result equals batch snapshot_drift over the
    same corpus — the oracle is that query's SQL, reused verbatim."""
    return streaming_events.drift_gate_ingest_append(spark, sf_dir)


from .text import _SKETCH_SHINGLE_CTES as _SH_CTES  # noqa: E402
from .text import KMV_SK_CTES, KMV_SK_SELECT  # noqa: E402


@register(
    "stream_kmv_register_ingest",
    f"""
    WITH {_SH_CTES},
    {KMV_SK_CTES}
    SELECT {KMV_SK_SELECT}
    FROM sk s ORDER BY s.source_a, s.source_b
    """,
)
def st_kmv_register_ingest(spark, sf_dir):
    """Overlap-sketch-maintenance-at-ingest: per micro-batch bottom-k
    candidates appended (byte-identical kmv_bottom_k build), the live
    pairwise estimates re-cut the appended union through the batch
    query's own kmv_pair_estimates path. Completes the streaming merge
    triad — HLL max-merge (keyless), quantile SUM-merge (content-keyed),
    KMV set-union + re-cut (keyless: dense_rank's duplicates-share-a-rank
    cut absorbs redelivered rows; the Beyer et al. superset property
    makes the union re-cut EXACTLY the batch sketch). The oracle replays
    the batch sketch columns verbatim (exact-Jaccard verifier columns
    stay with the batch query; sketch state cannot reproduce them)."""
    return streaming_events.kmv_register_ingest_append(spark, sf_dir)


@register(
    "stream_vt_ingest",
    "SELECT doc_id, source, md5(text) AS text_md5 FROM documents",
)
def st_vt_ingest(spark, sf_dir):
    """Streaming ingest into the VERSIONED table: each micro-batch commits
    one atomic manifest version (sources/versioned.py), content-
    fingerprint-keyed so a redelivered batch is a no-op instead of a
    duplicate version — the versioned twin of stream_curated_ingest's
    plain-append landing. Oracle = the drained table equals the batch
    corpus; the redelivery and per-batch-version properties are pinned in
    tests/test_sources.py::test_versioned_stream_ingest_*."""
    from pyspark.sql import functions as F

    out = streaming_events.versioned_ingest_append(spark, sf_dir)
    return out.select("doc_id", "source", F.md5("text").alias("text_md5"))
