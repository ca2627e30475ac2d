"""Invariants for the corpus-preparation operators (operators/corpus.py):
shard-layout conservation and determinism, temperature-mix normalization,
and head/tail equivalence of the Zipf-split frequency join."""

import pyspark.sql.functions as F
import pytest

from airdatapipeline_spark.io import load_table
from airdatapipeline_spark.operators import corpus
from airdatapipeline_spark.operators.text import tokens_col

SF = "/root/testdata/sf0.001"


def test_shard_manifest_conserves_corpus(spark):
    """Every document lands in exactly one shard: manifest doc and token
    totals equal the corpus totals, and shard ids are the contiguous range
    0..max (a cumulative layout cannot skip a budget window)."""
    d = load_table(spark, SF, "documents")
    n_docs, n_tok = d.select(
        F.count("*"), F.sum(F.size(tokens_col()).cast("long"))
    ).first()

    m = corpus.shard_manifest(spark, SF).toPandas()
    assert int(m.n_docs.sum()) == n_docs
    assert int(m.shard_tokens.sum()) == n_tok
    ids = sorted(m.shard_id)
    assert ids == list(range(len(ids))), "shard ids must be contiguous from 0"
    # each shard's hash span must sit strictly after the previous shard's:
    # the layout order is the hash order, so spans cannot interleave
    spans = m.sort_values("shard_id")[["shard_min_hkey", "shard_max_hkey"]]
    flat = [v for pair in spans.itertuples(index=False) for v in pair]
    assert flat == sorted(flat), "shard hash spans interleave — global order broken"


def test_shard_manifest_session_config_invariant(spark):
    """The two-level prefix sum must produce identical bits under different
    shuffle-partition settings (the compaction lesson: driver sessions run
    different configs than the test session)."""
    base = corpus.shard_manifest(spark, SF).toPandas().sort_values("shard_id").reset_index(drop=True)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            again = (
                corpus.shard_manifest(spark, SF)
                .toPandas()
                .sort_values("shard_id")
                .reset_index(drop=True)
            )
            assert base.equals(again), f"manifest changed with {parts} shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_shard_manifest_budget_bound(spark):
    """A shard holds the docs STARTING in its budget window, so its token
    mass is < budget + the largest single document (one doc may straddle
    the cut); with budget >> max doc this bounds shard skew."""
    d = load_table(spark, SF, "documents")
    max_doc = d.select(F.max(F.size(tokens_col()).cast("long"))).first()[0]
    m = corpus.shard_manifest(spark, SF).toPandas()
    assert (m.shard_tokens < corpus.SHARD_TOKENS + max_doc).all()


def test_temperature_mix_is_normalized_and_flattening(spark):
    """sample_prob sums to 1; τ=0.5 flattens: every source's sampling
    probability moves toward uniform relative to its raw token share
    (upsampled if below-average share, downsampled if above)."""
    m = corpus.temperature_mix_weights(spark, SF).toPandas()
    assert abs(m.sample_prob.sum() - 1.0) < 1e-12
    assert abs(m.target_tokens.sum() - m.src_tokens.sum()) < 1e-6
    mean_share = 1.0 / len(m)
    for _, r in m.iterrows():
        if r.token_share < mean_share:
            assert r.sample_prob >= r.token_share - 1e-12, "rare source must be upsampled"
        # epochs = how often the source is traversed; must stay positive
        assert r.epochs > 0


def test_token_rarity_head_split_matches_plain_join(spark):
    """The broadcast-head + shuffled-tail union must be value-identical to
    the naive single join (the split is a physical strategy, not a
    semantic change)."""
    d = load_table(spark, SF, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("tf"))
    plain = (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("tf").alias("sum_tf"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    split = (
        corpus.token_rarity_scores(spark, SF)
        .select("doc_id", "n_tok", "sum_tf")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert plain.equals(split)


def test_token_rarity_covers_every_document(spark):
    """No document is dropped by the explode/join round-trip."""
    d = load_table(spark, SF, "documents")
    total = d.count()
    assert corpus.token_rarity_scores(spark, SF).count() == total
