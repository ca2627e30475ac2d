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


def test_write_shards_layout_and_conservation(spark, tmp_path):
    """The shard WRITE materializes exactly the manifest's layout: one
    `shard_id=K/` dir per manifest shard, every document in exactly one
    dir, and no small-file spray (repartitionByRange aligns output tasks
    with shard boundaries, so each dir holds ~one file — a plain hash
    shuffle would scatter every shard across every reducer, here up to 32
    files per dir)."""
    import os

    out = str(tmp_path / "shards")
    stats = corpus.write_shards(spark, SF, out)
    m = corpus.shard_manifest(spark, SF).toPandas()
    assert stats["n_shards"] == len(m)

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == len(m)
    files_per_dir = [
        sum(f.endswith(".parquet") for f in os.listdir(os.path.join(out, d))) for d in dirs
    ]
    # equal range-partition keys share one task: exactly one file per shard
    assert files_per_dir == [1] * len(dirs), files_per_dir

    back = corpus.read_shards(spark, out)
    src = load_table(spark, SF, "documents")
    assert back.count() == src.count() == stats["n_docs"]
    assert back.select("doc_id").distinct().count() == src.count()
    # per-shard membership equals the manifest exactly
    got = (
        back.groupBy("shard_id").count().toPandas().sort_values("shard_id").reset_index(drop=True)
    )
    assert list(got["count"]) == list(m.sort_values("shard_id").n_docs)


def test_read_one_shard_prunes_partitions(spark, tmp_path):
    """A reader of one shard (e.g. a training job resuming shard K) must
    touch only that directory: the shard_id filter lands in the scan's
    PartitionFilters, not a post-scan Filter over all dirs."""
    out = str(tmp_path / "shards")
    corpus.write_shards(spark, SF, out)
    one = spark.read.parquet(out).filter(F.col("shard_id") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan.split("PartitionFilters", 1)[1][:200]
    # every surviving row comes from the one pruned directory (inputFiles()
    # would list the relation pre-pruning, so assert on actual provenance)
    srcs = [r[0] for r in one.select(F.input_file_name()).distinct().collect()]
    assert len(srcs) == 1 and "shard_id=3/" in srcs[0], srcs


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


def test_write_shards_staged_swap_is_crash_safe(spark, tmp_path):
    """A reshard must never destroy a serving layout: (a) re-running
    write_shards over an existing layout goes through staging + swap and
    leaves identical data; (b) a crash between the two swap renames (live
    path gone, previous layout parked at __old__) is healed by
    recover_shards; (c) the next write_shards heals such a crash itself
    via its own recover call before staging."""
    import os
    import shutil

    out = str(tmp_path / "shards")
    corpus.write_shards(spark, SF, out)
    before = sorted(
        map(tuple, corpus.read_shards(spark, out).select("doc_id", "shard_id").collect())
    )

    # (a) idempotent rewrite over the live layout
    corpus.write_shards(spark, SF, out)
    after = sorted(
        map(tuple, corpus.read_shards(spark, out).select("doc_id", "shard_id").collect())
    )
    assert before == after
    assert not os.path.exists(out + ".__old__")
    assert not os.path.exists(out + ".__resharding__")

    # (b) simulate a crash between rename #1 and rename #2
    os.rename(out, out + ".__old__")
    assert corpus.recover_shards(out) is True
    assert os.path.exists(out) and not os.path.exists(out + ".__old__")
    healed = sorted(
        map(tuple, corpus.read_shards(spark, out).select("doc_id", "shard_id").collect())
    )
    assert healed == before

    # (c) next write also self-heals via its own recover call
    os.rename(out, out + ".__old__")
    corpus.write_shards(spark, SF, out)
    assert os.path.exists(out) and not os.path.exists(out + ".__old__")


def test_content_hash_sum_never_wraps_int64(spark):
    """The conservation fingerprint must be exact at ANY group size: a raw
    BIGINT sum of 56-bit md5 hashes silently wraps int64 past ~256 docs per
    group (ADVICE-r5). 3000 copies of one hot doc would overflow 9.2e18;
    the decimal-accumulate + mod-(2^61-1) path must equal the Python big-int
    ground truth exactly."""
    import hashlib

    texts = [f"document body {i % 7} with shared boilerplate" for i in range(3000)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.agg(corpus.content_hash_sum().alias("s")).first()["s"]

    expected = (
        sum(int(hashlib.md5(t.encode()).hexdigest()[:14], 16) for t in texts)
        % corpus.HASH_SUM_MOD
    )
    # the raw int64 path would have wrapped: the true sum exceeds int64
    assert sum(int(hashlib.md5(t.encode()).hexdigest()[:14], 16) for t in texts) > 2**63
    assert got == expected


def test_write_shards_empty_corpus_fails_loud(spark, tmp_path):
    """An empty documents table must fail with a clear message, not an
    opaque TypeError from int(None) (ADVICE-r5)."""
    empty_dir = tmp_path / "empty_sf"
    empty_dir.mkdir()
    load_table(spark, SF, "documents").limit(0).write.parquet(
        str(empty_dir / "documents.parquet")
    )
    with pytest.raises(ValueError, match="no documents"):
        corpus.write_shards(spark, str(empty_dir), str(tmp_path / "out"))


def _append_fixture(spark, tmp_path):
    """Base layout from doc_id % 3 != 0, delta = the remaining third."""
    import os

    base_sf = str(tmp_path / "base_sf")
    out = str(tmp_path / "layout")
    load_table(spark, SF, "documents").filter(F.col("doc_id") % 3 != 0).write.mode(
        "overwrite"
    ).parquet(os.path.join(base_sf, "documents.parquet"))
    corpus.write_shards(spark, base_sf, out)
    return out


def test_append_shards_immutable_contiguous_exactly_once(spark, tmp_path):
    """The r6 lifecycle contract (VERDICT-r5 item 5): existing shard dirs
    are byte-untouched, delta docs land exactly once in NEW shards after
    the last base shard, and start offsets stay contiguous across the
    write-generation boundary."""
    import os

    out = _append_fixture(spark, tmp_path)
    before_files = {}
    for dirpath, _dirs, files in os.walk(out):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            before_files[p] = (st.st_size, st.st_mtime_ns, st.st_ino)
    base_ids = {
        r["shard_id"]
        for r in corpus.read_shards(spark, out).select("shard_id").distinct().collect()
    }

    res = corpus.append_shards(spark, SF, out)
    assert res["n_new_docs"] > 0 and res["n_new_shards"] > 0
    assert res["first_new_shard"] == max(base_ids) + 1

    # (1) old dirs byte-untouched (same inode, size, mtime)
    for p, sig in before_files.items():
        st = os.stat(p)
        assert (st.st_size, st.st_mtime_ns, st.st_ino) == sig, p

    back = corpus.read_shards(spark, out)
    full = load_table(spark, SF, "documents")
    # (2) exactly-once membership: layout == full corpus, no dup doc_ids
    assert back.count() == full.count()
    assert back.select("doc_id").distinct().count() == full.count()
    # (3) delta docs are all in NEW shards
    delta_in_old = back.filter(
        (F.col("doc_id") % 3 == 0) & (F.col("shard_id") <= max(base_ids))
    ).count()
    assert delta_in_old == 0
    # (4) offsets contiguous across the boundary: sorted by start_off,
    # every doc starts exactly where the previous one ended
    rows = back.select("start_off", "n_tok").orderBy("start_off").collect()
    pos = 0
    for r in rows:
        assert r["start_off"] == pos
        pos += r["n_tok"]


def test_append_shards_idempotent_under_redelivery(spark, tmp_path):
    """Re-appending the same batch is a no-op: the anti-join membership
    gate skips every redelivered doc and no new dirs appear."""
    import os

    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)
    dirs_before = sorted(os.listdir(out))
    res2 = corpus.append_shards(spark, SF, out)
    assert res2["n_new_docs"] == 0 and res2["n_new_shards"] == 0
    assert sorted(os.listdir(out)) == dirs_before


def test_append_shards_reentrant_after_partial_crash(spark, tmp_path):
    """A crash mid-move leaves a prefix of whole delta shards live; the
    next append must place only the missing docs, after the current last
    shard, leaving the layout complete and duplicate-free."""
    import os
    import shutil

    out = _append_fixture(spark, tmp_path)
    res = corpus.append_shards(spark, SF, out)
    # simulate the crash: drop the LAST appended shard dir (as if the move
    # loop died before it); docs of that dir are now missing from the layout
    last_dir = os.path.join(out, f"shard_id={res['first_new_shard'] + res['n_new_shards'] - 1}")
    shutil.rmtree(last_dir)
    missing = load_table(spark, SF, "documents").count() - corpus.read_shards(
        spark, out
    ).count()
    assert missing > 0

    res2 = corpus.append_shards(spark, SF, out)
    assert res2["n_new_docs"] == missing
    back = corpus.read_shards(spark, out)
    assert back.count() == load_table(spark, SF, "documents").count()
    assert back.select("doc_id").distinct().count() == back.count()


def test_append_shards_absent_layout_degenerates_to_full_write(spark, tmp_path):
    out = str(tmp_path / "fresh")
    res = corpus.append_shards(spark, SF, out)
    assert res["first_new_shard"] == 0 and res["n_new_docs"] > 0
    full = corpus.read_shards(spark, out)
    assert full.count() == load_table(spark, SF, "documents").count()


def test_stream_shard_ingest_redelivery_safe_without_checkpoint(spark, tmp_path):
    """The streaming shard ingest must stay exactly-once even when the
    CHECKPOINT is gone (a sink retry outside Spark's control): re-running
    the whole 3-batch stream against the same layout with a fresh
    checkpoint must change nothing — the append_docs membership gate, not
    the checkpoint, is the idempotency mechanism."""
    from airdatapipeline_spark.streaming import events as streaming_events

    out = str(tmp_path / "layout")
    audit1 = streaming_events.shard_ingest_append(spark, SF, out_path=out).first()
    assert audit1["contiguity_violations"] == 0
    assert audit1["n_docs"] == audit1["n_unique_docs"] == load_table(
        spark, SF, "documents"
    ).count()

    # full redelivery: fresh landing + fresh checkpoint, same layout
    audit2 = streaming_events.shard_ingest_append(spark, SF, out_path=out).first()
    assert audit2 == audit1


def test_compact_shards_merges_fragments_metadata_only(spark, tmp_path):
    """Compaction re-lays ONLY the under-full generation-boundary shards:
    membership conserved, at most one under-full shard remains (the new
    tail remainder), kept shard files are HARD-LINKED (same inode —
    metadata-only reuse, no data rewrite), and retired fragment ids are
    gone."""
    import os

    out = _append_fixture(spark, tmp_path)   # base gen: doc_id % 3 != 0
    corpus.append_shards(spark, SF, out)     # gen 2: the remaining third
    before = corpus.read_shards(spark, out)
    n_docs = before.count()
    sizes = before.groupBy("shard_id").agg(F.sum("n_tok").alias("tok")).collect()
    threshold = int(corpus.SHARD_TOKENS * 0.85)
    frag_ids = sorted(int(r["shard_id"]) for r in sizes if r["tok"] < threshold)
    assert len(frag_ids) >= 2, "fixture must produce >=2 fragment shards"
    kept_inodes = {}
    for entry in os.listdir(out):
        if entry.startswith("shard_id=") and int(entry.split("=")[1]) not in frag_ids:
            d = os.path.join(out, entry)
            kept_inodes[entry] = {f: os.stat(os.path.join(d, f)).st_ino for f in os.listdir(d)}

    res = corpus.compact_shards(spark, out, min_fill=0.85)
    assert res["n_compacted_shards"] == len(frag_ids)
    after = corpus.read_shards(spark, out)
    assert after.count() == n_docs
    assert after.select("doc_id").distinct().count() == n_docs
    after_sizes = after.groupBy("shard_id").agg(F.sum("n_tok").alias("tok")).collect()
    assert sum(1 for r in after_sizes if r["tok"] < threshold) <= 1
    live_ids = {int(r["shard_id"]) for r in after_sizes}
    assert not (set(frag_ids) & live_ids), "retired fragment ids still live"
    for entry, files in kept_inodes.items():
        d = os.path.join(out, entry)
        for f, ino in files.items():
            assert os.stat(os.path.join(d, f)).st_ino == ino, f"{entry}/{f} rewritten"
    # offsets remain strictly ordered and non-overlapping (density is gone
    # by design once spans retire)
    rows = after.select("start_off", "n_tok").orderBy("start_off").collect()
    pos = -1
    for r in rows:
        assert r["start_off"] > pos
        pos = r["start_off"] + r["n_tok"] - 1


def test_compact_shards_noop_below_two_fragments(spark, tmp_path):
    """A single fragment is left alone — re-labelling it would churn an id
    without reducing fragment count."""
    base_sf = str(tmp_path / "sf")
    out = str(tmp_path / "layout")
    load_table(spark, SF, "documents").write.parquet(
        str(tmp_path / "sf" / "documents.parquet")
    )
    corpus.write_shards(spark, base_sf, out)   # one generation: <=1 fragment
    import os

    dirs_before = sorted(os.listdir(out))
    res = corpus.compact_shards(spark, out)
    assert res["n_compacted_shards"] == 0 and res["n_moved_docs"] == 0
    assert sorted(os.listdir(out)) == dirs_before


def test_delete_from_shards_rewrites_only_affected(spark, tmp_path):
    """Right-to-be-forgotten on the layout: doomed docs vanish, survivors
    of affected shards keep their shard_id and offsets, UNAFFECTED shard
    files keep their inodes (hard-linked, not rewritten), and a re-delete
    of the same ids is a no-op."""
    import os

    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)
    before = corpus.read_shards(spark, out)
    n_docs = before.count()
    doomed_ids = load_table(spark, SF, "documents").filter(
        F.col("doc_id") % 7 == 0
    ).select("doc_id")
    n_doomed = doomed_ids.count()
    affected = {
        int(r["shard_id"])
        for r in before.join(doomed_ids, "doc_id", "left_semi")
        .select("shard_id").distinct().collect()
    }
    keep_pos = {
        (r["doc_id"], r["shard_id"], r["start_off"])
        for r in before.join(doomed_ids, "doc_id", "left_anti")
        .select("doc_id", "shard_id", "start_off").collect()
    }
    inodes = {}
    for entry in os.listdir(out):
        if entry.startswith("shard_id=") and int(entry.split("=")[1]) not in affected:
            d = os.path.join(out, entry)
            inodes[entry] = {f: os.stat(os.path.join(d, f)).st_ino for f in os.listdir(d)}

    res = corpus.delete_from_shards(spark, doomed_ids, out)
    assert res["n_deleted"] == n_doomed
    after = corpus.read_shards(spark, out)
    assert after.count() == n_docs - n_doomed
    assert after.join(doomed_ids, "doc_id", "left_semi").count() == 0
    # survivors keep shard_id AND offsets
    after_pos = {
        (r["doc_id"], r["shard_id"], r["start_off"])
        for r in after.select("doc_id", "shard_id", "start_off").collect()
    }
    assert after_pos == keep_pos
    for entry, files in inodes.items():
        d = os.path.join(out, entry)
        for f, ino in files.items():
            assert os.stat(os.path.join(d, f)).st_ino == ino, f"{entry}/{f} rewritten"
    # idempotent re-delete
    res2 = corpus.delete_from_shards(spark, doomed_ids, out)
    assert res2["n_deleted"] == 0 and res2["n_rewritten_shards"] == 0


def test_append_membership_gate_prunes_layout_scan(spark, tmp_path):
    """The membership gate must never shuffle the layout's full id column:
    (a) the batch-derived RANGE predicate reaches the layout's parquet
    scan as a pushed filter (row-group min/max skipping — under the
    high-water-mark id pattern the layout side dies at the scan), and
    (b) the semi+anti reformulation returns exactly the direct
    anti-join's rows."""
    out = _append_fixture(spark, tmp_path)
    existing = corpus.read_shards(spark, out)
    # a high-water-mark batch: ids past everything in the layout
    batch = load_table(spark, SF, "documents").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "source", "text"
    )
    delta = corpus._membership_delta(spark, batch, existing)
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(doc_id,1000000" in plan.replace(" ", ""), plan
    assert delta.count() == batch.count()  # nothing redelivered

    # equivalence on a genuinely overlapping batch
    docs = load_table(spark, SF, "documents")
    delta2 = corpus._membership_delta(spark, docs, existing)
    direct = docs.join(existing.select("doc_id"), "doc_id", "left_anti")
    assert sorted(r["doc_id"] for r in delta2.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in direct.select("doc_id").collect()
    )


def test_shard_lifecycle_scenario_append_compact_append_delete(spark, tmp_path):
    """Full lifecycle integration: bootstrap → append → compact → append →
    delete, asserting at the end that membership equals the set algebra of
    the operations, doc_ids are unique, and offsets remain strictly
    ordered and non-overlapping (density is not promised once spans
    retire). Also pins the bootstrap-via-append_docs path and that a
    crashed bootstrap cannot poison the root."""
    import os

    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "layout")

    # gen A: bootstrap through append_docs (absent layout)
    res = corpus.append_docs(spark, docs.filter(F.col("doc_id") % 5 <= 1), out)
    assert res["first_new_shard"] == 0
    # gen B: delta = %5 == 2
    corpus.append_docs(spark, docs.filter(F.col("doc_id") % 5 <= 2), out)
    # compact fragments (if ≥2), then another delta, then delete
    corpus.compact_shards(spark, out, min_fill=0.85)
    corpus.append_docs(spark, docs, out)  # delta = %5 in {3,4}
    doomed = docs.filter(F.col("doc_id") % 10 == 1).select("doc_id")
    corpus.delete_from_shards(spark, doomed, out)

    back = corpus.read_shards(spark, out)
    expect = docs.join(doomed, "doc_id", "left_anti")
    assert back.count() == expect.count()
    assert back.select("doc_id").distinct().count() == back.count()
    assert back.join(expect.select("doc_id"), "doc_id", "left_anti").count() == 0
    rows = back.select("start_off", "n_tok").orderBy("start_off").collect()
    end = -1
    for r in rows:
        assert r["start_off"] > end
        end = r["start_off"] + r["n_tok"] - 1

    # poisoned-bootstrap guard: an empty root left by a crash re-bootstraps
    empty = str(tmp_path / "empty_root")
    os.makedirs(empty)
    res2 = corpus.append_docs(spark, docs.limit(10), empty)
    assert res2["first_new_shard"] == 0 and res2["n_new_docs"] == 10


def test_manifest_verify_detects_corruption_and_staleness(spark, tmp_path):
    """The manifest/verify pair: (a) a fresh manifest verifies all-ok;
    (b) swapping one shard's parquet file for another shard's reds exactly
    the tampered shards (membership/hash-span/fingerprint columns flip);
    (c) a mutating op invalidates the manifest so a stale inventory can
    never silently verify."""
    import os
    import shutil

    out = _append_fixture(spark, tmp_path)
    corpus.write_layout_manifest(spark, out)
    rep = corpus.verify_shards(spark, out)
    assert rep.filter(~F.col("shard_ok")).count() == 0

    # (b) corrupt: overwrite shard 0's data file with shard 1's — including
    # the Hadoop .crc sidecar, so the swap is checksum-CONSISTENT (the
    # filesystem layer cannot catch it; only content fingerprints can)
    def data_file(sid):
        d = os.path.join(out, f"shard_id={sid}")
        return os.path.join(d, next(f for f in os.listdir(d) if f.endswith(".parquet")))

    src, dst = data_file(1), data_file(0)
    shutil.copyfile(src, dst)
    src_crc = os.path.join(os.path.dirname(src), "." + os.path.basename(src) + ".crc")
    dst_crc = os.path.join(os.path.dirname(dst), "." + os.path.basename(dst) + ".crc")
    if os.path.exists(src_crc):
        shutil.copyfile(src_crc, dst_crc)
    spark.catalog.refreshByPath(out)
    bad = corpus.verify_shards(spark, out)
    bad_rows = {r["shard_id"]: r for r in bad.collect()}
    assert not bad_rows[0]["shard_ok"], "tampered shard must red"
    assert not bad_rows[0]["content_hash_sum_ok"]
    assert bad_rows[2]["shard_ok"], "untouched shard must stay green"

    # (c) append invalidates the manifest
    out2 = _append_fixture(spark, tmp_path / "second")
    corpus.write_layout_manifest(spark, out2)
    corpus.append_shards(spark, SF, out2)
    assert not os.path.exists(os.path.join(out2, "_manifest"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        corpus.read_layout_manifest(spark, out2).collect()


def test_epoch_schedule_permutes_per_epoch(spark):
    """Each epoch visits every shard exactly once; different epochs visit
    them in different orders (the decorrelation the schedule exists for);
    epoch offsets are an exact prefix sum of the visited shards."""
    sched = corpus.epoch_schedule(spark, SF, n_epochs=3).collect()
    by_epoch = {}
    for r in sched:
        by_epoch.setdefault(r["epoch"], []).append(r)
    shard_ids = {r["shard_id"] for r in by_epoch[0]}
    orders = {}
    for e, rows in by_epoch.items():
        rows.sort(key=lambda r: r["order_rank"])
        assert {r["shard_id"] for r in rows} == shard_ids  # permutation
        assert [r["order_rank"] for r in rows] == list(range(1, len(rows) + 1))
        pos = 0
        for r in rows:
            assert r["epoch_start_off"] == pos
            pos += r["shard_tokens"]
        orders[e] = [r["shard_id"] for r in rows]
    assert orders[0] != orders[1] or orders[1] != orders[2], "epochs must differ"


def test_epoch_token_slice_covers_exactly_the_window(spark):
    """Slice invariants: the covering shards are contiguous in rank order,
    their union span contains [start, end), and shrinking the window
    never adds shards."""
    a, b = 1500, 9000
    s = corpus.epoch_token_slice(spark, SF, epoch=1, start_tok=a, end_tok=b).collect()
    s.sort(key=lambda r: r["order_rank"])
    ranks = [r["order_rank"] for r in s]
    assert ranks == list(range(ranks[0], ranks[0] + len(ranks)))  # contiguous
    assert s[0]["epoch_start_off"] <= a
    assert s[-1]["epoch_start_off"] + s[-1]["shard_tokens"] >= b
    for prev, cur in zip(s, s[1:]):  # schedule prefix sums are gapless
        assert cur["epoch_start_off"] == prev["epoch_start_off"] + prev["shard_tokens"]

    inner = corpus.epoch_token_slice(spark, SF, epoch=1, start_tok=a + 500, end_tok=b - 500)
    assert {r["shard_id"] for r in inner.collect()} <= {r["shard_id"] for r in s}


def test_compact_and_delete_read_only_affected_dirs(spark, tmp_path):
    """The lifecycle ops' IO claims, plan-pinned: compaction's re-lay input
    and deletion's survivor rewrite both read via shard_id partition
    filters (PartitionFilters in the scan, provenance limited to the
    affected dirs) — IO ∝ fragments/affected shards, never the corpus."""
    import os

    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)
    layout = corpus.read_shards(spark, out)
    sizes = layout.groupBy("shard_id").agg(F.sum("n_tok").alias("tok")).collect()
    frag_ids = [int(r["shard_id"]) for r in sizes if r["tok"] < int(corpus.SHARD_TOKENS * 0.85)]
    assert len(frag_ids) >= 2

    moved = layout.filter(F.col("shard_id").isin(frag_ids)).select("doc_id", "text")
    plan = moved._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan.split("PartitionFilters", 1)[1][:300]
    srcs = {r[0] for r in moved.select(F.input_file_name()).distinct().collect()}
    touched = {s.split("shard_id=")[1].split("/")[0] for s in srcs}
    assert touched == {str(i) for i in frag_ids}, (touched, frag_ids)


def test_append_dedups_within_batch(spark, tmp_path):
    """A doc redelivered twice WITHIN one batch must land exactly once —
    the membership gate screens only against the layout, so append itself
    dedups the batch on doc_id (code-review finding)."""
    docs = load_table(spark, SF, "documents").limit(20)
    doubled = docs.unionByName(docs)  # every doc twice in the same batch
    out = str(tmp_path / "layout")
    res = corpus.append_docs(spark, doubled, out)
    assert res["n_new_docs"] == 20
    back = corpus.read_shards(spark, out)
    assert back.count() == back.select("doc_id").distinct().count() == 20


def test_epoch_schedule_for_layout_matches_lived_layout(spark, tmp_path):
    """The written-artifact schedule must describe the layout as it exists
    after the lifecycle (generation-local ids), not the fresh-write plan:
    after base+append the plan-level schedule and the layout schedule
    disagree on shard ids, and the layout one matches read_shards exactly."""
    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)

    lay = corpus.epoch_schedule_for_layout(spark, out, n_epochs=2)
    real = {
        (int(r["shard_id"]), int(r["tok"]), int(r["n"]))
        for r in corpus.read_shards(spark, out)
        .groupBy("shard_id")
        .agg(F.sum("n_tok").alias("tok"), F.count("*").alias("n"))
        .collect()
    }
    got = {
        (int(r["shard_id"]), int(r["shard_tokens"]), int(r["n_docs"]))
        for r in lay.filter(F.col("epoch") == 0).collect()
    }
    assert got == real

    plan = {
        (int(r["shard_id"]), int(r["shard_tokens"]))
        for r in corpus.epoch_schedule(spark, SF, n_epochs=1).collect()
    }
    assert {(s, t) for s, t, _n in real} != plan, (
        "fixture should exercise a lived layout whose per-shard placement "
        "differs from the fresh-write plan"
    )

    # the layout-based slice covers its window against the REAL offsets
    s = corpus.epoch_token_slice_for_layout(spark, out, epoch=0, start_tok=100, end_tok=4000)
    rows = sorted(s.collect(), key=lambda r: r["order_rank"])
    assert rows[0]["epoch_start_off"] <= 100
    assert rows[-1]["epoch_start_off"] + rows[-1]["shard_tokens"] >= 4000


def test_compact_and_delete_heal_interrupted_swaps(spark, tmp_path):
    """The snapshot ops share write_shards' two-rename swap: a crash
    between rename #1 (live -> __old__) and rename #2 (staging -> live)
    leaves the live path missing and a stale staging dir. The next op (or
    recover_shards) must restore the parked layout and clear the staging
    leftovers, with the data bit-identical to pre-crash."""
    import os
    import shutil

    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)
    before = sorted(
        map(tuple, corpus.read_shards(spark, out).select("doc_id", "shard_id").collect())
    )

    # simulate the compact crash window
    os.rename(out, out + ".__old__")
    os.makedirs(out + ".__compacting__")
    res = corpus.compact_shards(spark, out, min_fill=0.85)  # self-heals first
    assert not os.path.exists(out + ".__old__")
    assert not os.path.exists(out + ".__compacting__")
    healed = corpus.read_shards(spark, out)
    assert healed.count() == len(before)

    # simulate the delete crash window on the (now compacted) layout
    current = sorted(
        map(tuple, healed.select("doc_id", "shard_id").collect())
    )
    os.rename(out, out + ".__old__")
    os.makedirs(out + ".__deleting__")
    assert corpus.recover_shards(out) is True
    shutil.rmtree(out + ".__deleting__")
    after = sorted(
        map(tuple, corpus.read_shards(spark, out).select("doc_id", "shard_id").collect())
    )
    assert after == current


def test_delete_tombstones_bar_readmission(spark, tmp_path):
    """The r7 seam close (VERDICT-r6 item 2): delete with tombstone=True
    records EVERY requested id (including ids not yet in the layout), and
    a later append that redelivers them admits nothing; honor_tombstones=
    False restores the old re-admission semantics explicitly."""
    out = _append_fixture(spark, tmp_path)  # members: doc_id % 3 != 0
    docs = load_table(spark, SF, "documents")
    requested = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    n_requested = requested.count()

    res = corpus.delete_from_shards(spark, requested, out)
    assert res["n_tombstoned"] == n_requested
    # tombstones hold the full request, not just the ids that were present
    tombs = corpus.read_tombstones(spark, out)
    assert tombs.distinct().count() == n_requested

    # redeliver the FULL corpus: layout gate blocks members, tombstone
    # gate blocks every multiple of 5 -> final membership {id % 5 != 0}
    corpus.append_docs(spark, docs, out)
    back = corpus.read_shards(spark, out)
    assert back.filter(F.col("doc_id") % 5 == 0).count() == 0
    expected = docs.filter(F.col("doc_id") % 5 != 0).count()
    assert back.count() == expected
    assert back.select("doc_id").distinct().count() == expected

    # explicit opt-out re-admits (takedown reversal path)
    corpus.append_docs(spark, docs, out, honor_tombstones=False)
    back2 = corpus.read_shards(spark, out)
    assert back2.count() == docs.count()
    # the tombstone record itself is untouched by the opt-out append
    assert corpus.read_tombstones(spark, out).distinct().count() == n_requested


def test_tombstones_survive_compact_and_delete_swaps(spark, tmp_path):
    """The `_deleted/` table is corpus metadata, not generation metadata:
    both snapshot-swap ops (compact, a second delete) must carry it into
    the new root file-by-file (hard-link: same inode), and a second delete
    appends to it rather than replacing it."""
    import os

    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)  # creates >=2 fragments to compact
    docs = load_table(spark, SF, "documents")
    first = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    corpus.delete_from_shards(spark, first, out)
    tomb_files = {
        f: os.stat(os.path.join(out, "_deleted", f)).st_ino
        for f in os.listdir(os.path.join(out, "_deleted"))
        if f.endswith(".parquet")
    }
    n_first = first.count()

    res = corpus.compact_shards(spark, out, min_fill=0.85)
    assert res["n_compacted_shards"] >= 2, "fixture must actually compact"
    after = {
        f: os.stat(os.path.join(out, "_deleted", f)).st_ino
        for f in os.listdir(os.path.join(out, "_deleted"))
        if f.endswith(".parquet")
    }
    assert after == tomb_files, "compaction must hard-link tombstones unchanged"
    assert corpus.read_tombstones(spark, out).distinct().count() == n_first

    second = docs.filter(F.col("doc_id") % 11 == 0).select("doc_id")
    corpus.delete_from_shards(spark, second, out)
    merged = corpus.read_tombstones(spark, out)
    want = docs.filter(
        (F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0)
    ).count()
    assert merged.distinct().count() == want
    # append-only: the first delete's files are still there (same inodes)
    now = {
        f: os.stat(os.path.join(out, "_deleted", f)).st_ino
        for f in os.listdir(os.path.join(out, "_deleted"))
        if f.endswith(".parquet")
    }
    assert set(tomb_files) <= set(now)
    assert all(now[f] == ino for f, ino in tomb_files.items())


def test_append_rejects_divergent_redelivery_content(spark, tmp_path):
    """ADVICE-r6: the at-least-once contract (redelivered doc_ids carry
    identical text) is asserted, not assumed — a batch where one doc_id
    arrives with two different texts fails loud instead of letting
    dropDuplicates keep an arbitrary survivor."""
    import pyspark.sql.types as T

    out = str(tmp_path / "layout")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    bad = spark.createDataFrame(
        [(1, "web", "the text"), (1, "web", "DIFFERENT text"), (2, "web", "ok")],
        schema,
    )
    with pytest.raises(ValueError, match="redelivery contract"):
        corpus.append_docs(spark, bad, out)
    import os

    assert not any(
        e.startswith("shard_id=") for e in os.listdir(out)
    ) if os.path.exists(out) else True, "failed batch must not create shards"

    # identical-content redelivery stays fine, and the check can be waived
    ok = spark.createDataFrame(
        [(1, "web", "the text"), (1, "web", "the text"), (2, "web", "ok")], schema
    )
    res = corpus.append_docs(spark, ok, out)
    assert res["n_new_docs"] == 2
    res2 = corpus.append_docs(spark, bad, out, check_redelivery_content=False)
    assert res2["n_new_docs"] == 0  # both ids already members


def test_compact_delete_noop_on_fully_retired_layout(spark, tmp_path):
    """ADVICE-r6: a root whose shards were ALL retired by a prior delete is
    a legal lifecycle state — compact and a re-delete must no-op gracefully
    (no schema-inference crash on a file-less read), and the re-delete
    still records its tombstones."""
    import os

    out = _append_fixture(spark, tmp_path)
    docs = load_table(spark, SF, "documents")
    all_ids = docs.select("doc_id")
    corpus.delete_from_shards(spark, all_ids, out)
    assert not any(e.startswith("shard_id=") for e in os.listdir(out))

    res_c = corpus.compact_shards(spark, out)
    assert res_c == {
        "path": out, "n_compacted_shards": 0, "n_new_shards": 0, "n_moved_docs": 0,
    }
    res_d = corpus.delete_from_shards(spark, all_ids, out)
    assert res_d["n_deleted"] == 0 and res_d["n_rewritten_shards"] == 0
    assert res_d["n_tombstoned"] == all_ids.count()

    # and the retired-but-tombstoned root still bars everything on append
    corpus.append_docs(spark, docs, out)
    assert not any(e.startswith("shard_id=") for e in os.listdir(out))


def test_tombstones_before_first_ingest_and_across_full_rewrite(spark, tmp_path):
    """The two r7 self-review seams: (1) a takedown arriving AHEAD of the
    first ingest still records its tombstones (creating the root), and the
    eventual bootstrap honors them; (2) a full write_shards over a
    tombstoned root filters the source AND carries _deleted/ forward —
    a rewrite is an admission path like any other."""
    import os

    out = str(tmp_path / "layout")
    docs = load_table(spark, SF, "documents")
    barred = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    n_barred = barred.count()

    # (1) delete before the layout exists: tombstones land, nothing else
    res = corpus.delete_from_shards(spark, barred, out)
    assert res["n_tombstoned"] == n_barred and res["n_deleted"] == 0
    assert corpus.read_tombstones(spark, out).distinct().count() == n_barred
    assert not any(e.startswith("shard_id=") for e in os.listdir(out))

    corpus.append_docs(spark, docs, out)  # bootstrap through the bar
    back = corpus.read_shards(spark, out)
    assert back.filter(F.col("doc_id") % 4 == 0).count() == 0
    assert back.count() == docs.filter(F.col("doc_id") % 4 != 0).count()

    # (2) full rewrite over the tombstoned root: bar survives and applies
    sf2 = str(tmp_path / "sf2")
    docs.write.mode("overwrite").parquet(os.path.join(sf2, "documents.parquet"))
    corpus.write_shards(spark, sf2, out)
    back2 = corpus.read_shards(spark, out)
    assert back2.filter(F.col("doc_id") % 4 == 0).count() == 0
    assert back2.count() == docs.filter(F.col("doc_id") % 4 != 0).count()
    assert corpus.read_tombstones(spark, out).distinct().count() == n_barred


def test_layout_write_lock_excludes_second_writer(spark, tmp_path):
    """The single-writer contract is ENFORCED, not just documented: while
    one writer holds the layout's advisory flock, every mutating op fails
    loud; the lock releases with the op (and with writer death — flock
    semantics), and composed ops (append_shards -> write_shards) re-enter
    the same process's hold rather than self-deadlocking."""
    import fcntl
    import os

    out = _append_fixture(spark, tmp_path)
    docs = load_table(spark, SF, "documents")

    # simulate a foreign writer: a raw flock on another fd is exactly what
    # a second driver process would hold
    fd = os.open(out + ".__lock__", os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        with pytest.raises(RuntimeError, match="locked by another"):
            corpus.append_docs(spark, docs, out)
        with pytest.raises(RuntimeError, match="locked by another"):
            corpus.compact_shards(spark, out)
        with pytest.raises(RuntimeError, match="locked by another"):
            corpus.delete_from_shards(spark, docs.limit(1).select("doc_id"), out)
    finally:
        os.close(fd)  # releases the foreign hold

    # lock is free again: ops proceed, and the composed append_shards
    # (which calls write_shards/append_docs under its own hold) re-enters
    res = corpus.append_shards(spark, SF, out)
    assert res["n_new_docs"] > 0
    # and the lock actually released after the op
    fd2 = os.open(out + ".__lock__", os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(fd2, fcntl.LOCK_EX | fcntl.LOCK_NB)  # would raise if held
    os.close(fd2)


def test_compact_merges_tombstone_files(spark, tmp_path):
    """Each delete appends one tombstone file; compaction is the
    designated merge point — after a real compaction the `_deleted/` dir
    holds ONE parquet file whose distinct ids are the union of every
    prior delete (the small-file problem solved at the metadata tier
    too)."""
    import os

    out = _append_fixture(spark, tmp_path)
    corpus.append_shards(spark, SF, out)  # >=2 fragments for a real compact
    docs = load_table(spark, SF, "documents")
    corpus.delete_from_shards(spark, docs.filter(F.col("doc_id") % 13 == 0).select("doc_id"), out)
    corpus.delete_from_shards(spark, docs.filter(F.col("doc_id") % 17 == 0).select("doc_id"), out)
    tomb_dir = os.path.join(out, "_deleted")
    assert sum(f.endswith(".parquet") for f in os.listdir(tomb_dir)) == 2

    res = corpus.compact_shards(spark, out, min_fill=0.85)
    assert res["n_compacted_shards"] >= 2, "fixture must actually compact"
    assert sum(f.endswith(".parquet") for f in os.listdir(tomb_dir)) == 1
    want = docs.filter(
        (F.col("doc_id") % 13 == 0) | (F.col("doc_id") % 17 == 0)
    ).count()
    assert corpus.read_tombstones(spark, out).distinct().count() == want


def test_write_shards_fully_tombstoned_source_yields_shardless_root(spark, tmp_path):
    """A full rewrite whose source is entirely barred must produce the
    same legal state a delete-everything leaves — a shard-less root still
    carrying the tombstones — not a misleading 'no documents' crash; and
    a fresh NESTED layout path must not trip on the lock file's parent
    dir."""
    import os

    # nested path whose parents don't exist yet (lock-file regression)
    out = str(tmp_path / "a" / "b" / "layout")
    docs = load_table(spark, SF, "documents")
    corpus.delete_from_shards(spark, docs.select("doc_id"), out)  # bar ALL
    sf2 = str(tmp_path / "sf2")
    docs.write.mode("overwrite").parquet(os.path.join(sf2, "documents.parquet"))

    res = corpus.write_shards(spark, sf2, out)
    assert res == {"path": out, "n_shards": 0, "n_docs": 0}
    assert not any(e.startswith("shard_id=") for e in os.listdir(out))
    assert corpus.read_tombstones(spark, out).distinct().count() == docs.count()

    # an empty source with NO tombstones still fails loud (old contract)
    empty_sf = str(tmp_path / "empty_sf")
    docs.limit(0).write.mode("overwrite").parquet(
        os.path.join(empty_sf, "documents.parquet")
    )
    with pytest.raises(ValueError, match="no documents"):
        corpus.write_shards(spark, empty_sf, str(tmp_path / "fresh"))


def test_reader_survives_swap_window(spark, tmp_path, monkeypatch):
    """The read-side swap contract (VERDICT-r7 item 3): the root swap's
    two renames open an ENOENT window the writer flock does NOT cover
    (it excludes only writers). A reader whose first attempt lands inside
    the window — provoked here by holding the window open via the
    `_between_swap_renames` test seam — must retry and return a complete
    generation, never a hole; the local analogue of Postgres MVCC, which
    gives the reference this for free."""
    import threading
    import time

    out = _append_fixture(spark, tmp_path)
    expected = corpus.read_shards(spark, out).count()

    window_open = threading.Event()
    got: list[int] = []
    err: list[BaseException] = []

    def reader():
        window_open.wait(timeout=30)
        try:
            got.append(corpus.read_shards(spark, out).count())
        except BaseException as e:  # noqa: BLE001 - surfaced by the assert
            err.append(e)

    def hook():
        window_open.set()
        time.sleep(0.6)  # hold the window across the reader's first attempt

    t = threading.Thread(target=reader)
    t.start()
    monkeypatch.setattr(corpus, "_between_swap_renames", hook)
    try:
        corpus.write_shards(spark, str(tmp_path / "base_sf"), out)
    finally:
        t.join(timeout=30)
    assert not err, f"reader died inside the swap window: {err[0]!r}"
    assert got == [expected]


def test_recover_sweeps_stray_lock_only_when_root_gone(spark, tmp_path):
    """Lock-file hygiene (VERDICT-r7 item 5): a `<out>.__lock__` sibling
    outliving its retired layout root is swept by recover_shards — but
    never while any writer holds the flock (including a bootstrapping
    write_shards' own recover call), so the sweep cannot reopen the
    single-writer contract."""
    import fcntl
    import os
    import shutil

    out = _append_fixture(spark, tmp_path)
    lock = os.path.realpath(out) + ".__lock__"
    assert os.path.exists(lock), "the fixture's write_shards creates the lock file"
    # root alive: not stray, sweep must not touch it
    assert corpus.recover_shards(out) is False
    assert os.path.exists(lock)
    # root retired: swept
    shutil.rmtree(out)
    corpus.recover_shards(out)
    assert not os.path.exists(lock)
    # a held lock is NEVER stray, even with the root gone (a writer may be
    # bootstrapping it right now)
    fd = os.open(lock, os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        corpus.recover_shards(out)
        assert os.path.exists(lock)
    finally:
        os.close(fd)
    # and the bootstrap path still works over the swept state: write_shards
    # takes the lock, its own recover call skips the sweep (flock held),
    # and the layout comes back
    res = corpus.write_shards(spark, str(tmp_path / "base_sf"), out)
    assert res["n_docs"] > 0 and os.path.exists(out)


def test_write_shards_empty_source_vs_fully_tombstoned(spark, tmp_path):
    """ADVICE-r7: zero admitted docs must distinguish its two causes. An
    EMPTY source over a tombstoned root is a misconfiguration (wrong
    --sf-dir) and must crash without touching the serving state — only a
    non-empty source whose every doc the tombstones barred may produce
    the shard-less root."""
    import os

    out = str(tmp_path / "layout")
    docs = load_table(spark, SF, "documents")
    # takedown ahead of first ingest: root exists, tombstones present
    corpus.delete_from_shards(spark, docs.limit(5).select("doc_id"), out)
    empty_sf = str(tmp_path / "empty_sf")
    docs.limit(0).write.mode("overwrite").parquet(
        os.path.join(empty_sf, "documents.parquet")
    )
    with pytest.raises(ValueError, match="no documents"):
        corpus.write_shards(spark, empty_sf, out)
    # the failed rewrite mutated nothing: the bar is intact
    assert corpus.read_tombstones(spark, out).distinct().count() == 5


def test_vacuum_tombstones_shrinks_bar_and_readmits(spark, tmp_path):
    """vacuum_tombstones is the ONE sanctioned tombstone shrink: vacuumed
    ids become re-admissible, every other id stays barred, and vacuuming
    the rest empties the bar entirely (read_tombstones -> None)."""
    out = _append_fixture(spark, tmp_path)
    docs = load_table(spark, SF, "documents")
    barred = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    corpus.delete_from_shards(spark, barred, out)
    n_barred = barred.count()

    vac = docs.filter(F.col("doc_id") % 8 == 0).select("doc_id")
    res = corpus.vacuum_tombstones(spark, vac, out)
    still = docs.filter(
        (F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 8 != 0)
    )
    assert res["n_remaining"] == still.count()
    assert res["n_vacuumed"] == n_barred - still.count()
    assert corpus.read_tombstones(spark, out).distinct().count() == still.count()

    # re-ingest: vacuumed ids re-admit, surviving tombstones still bar
    corpus.append_docs(spark, docs, out)
    back = corpus.read_shards(spark, out)
    n_vac_docs = docs.filter(F.col("doc_id") % 8 == 0).count()
    assert back.filter(F.col("doc_id") % 8 == 0).count() == n_vac_docs
    assert back.join(still, "doc_id", "left_semi").count() == 0

    # vacuum the remainder: the bar disappears entirely
    res2 = corpus.vacuum_tombstones(spark, still, out)
    assert res2["n_remaining"] == 0 and res2["n_vacuumed"] == still.count()
    assert corpus.read_tombstones(spark, out) is None
    # idempotent on an empty bar
    assert corpus.vacuum_tombstones(spark, still, out)["n_vacuumed"] == 0


def test_lock_key_collapses_symlinked_aliases(spark, tmp_path):
    """ADVICE-r7: two writers addressing ONE layout through different
    symlinked paths must contend on the SAME lock file (realpath key) —
    an abspath key would flock two different siblings and let their
    staged swaps interleave."""
    import fcntl
    import os

    out = _append_fixture(spark, tmp_path)
    alias_parent = tmp_path / "alias_parent"
    os.symlink(str(tmp_path), str(alias_parent))
    alias = str(alias_parent / "layout")
    assert os.path.realpath(alias) == os.path.realpath(out)

    # a foreign writer holds the canonical lock ...
    fd = os.open(os.path.realpath(out) + ".__lock__", os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        # ... so a mutating op THROUGH THE ALIAS must be excluded too
        docs = load_table(spark, SF, "documents")
        with pytest.raises(RuntimeError, match="locked by another"):
            corpus.append_docs(spark, docs, alias)
    finally:
        os.close(fd)
    # free again: the aliased op proceeds and lands in the real layout
    res = corpus.append_docs(spark, load_table(spark, SF, "documents"), alias)
    assert res["n_new_docs"] > 0
    assert corpus.read_shards(spark, out).count() == corpus.read_shards(spark, alias).count()


def test_retryable_swap_miss_evidence_shapes(tmp_path):
    """The reader-retry decision, unit-tested against both evidence
    shapes: window OPEN (__old__ parked), window CLOSED AGAIN (the root
    is back — the post-swap race where __old__ is already cleared before
    the reader's check runs), and genuinely-missing (neither): only the
    last fails fast. Non-PATH_NOT_FOUND errors never retry."""
    import os

    root = str(tmp_path / "layout")
    # genuinely missing: no retry
    assert not corpus._retryable_swap_miss("PATH_NOT_FOUND: x", root)
    # window open: parked previous generation exists
    os.mkdir(root + ".__old__")
    assert corpus._retryable_swap_miss("PATH_NOT_FOUND: x", root)
    os.rmdir(root + ".__old__")
    # window closed again: the root itself is back
    os.mkdir(root)
    assert corpus._retryable_swap_miss("PATH_NOT_FOUND: x", root)
    # wrong error class: never retried regardless of evidence
    assert not corpus._retryable_swap_miss("SOME_OTHER_ERROR", root)


def test_lifecycle_quartet_under_copy_layout_io(spark, tmp_path, monkeypatch):
    """The LayoutIO seam exercised by a SECOND implementation (VERDICT-r8
    stretch 7): CopyLayoutIO replaces hard links with byte copies — the
    object-storage semantics (S3 has no links; generation carry is data-
    file reuse by copy or manifest pointer) — and counts every call. The
    full append → compact → delete → verify quartet must pass unchanged
    through the alternate IO, and the layout must contain NO multi-link
    files afterwards: any lifecycle code path that bypassed the seam with
    a direct os.link would leave st_nlink >= 2, so the nlink sweep proves
    the seam is real, not decorative."""
    import os
    import shutil
    from collections import Counter

    class CopyLayoutIO(corpus.LocalLayoutIO):
        def __init__(self):
            self.calls = Counter()

        def link_file(self, src, dst):
            self.calls["link_file"] += 1
            shutil.copy2(src, dst)

        def link_dir(self, src, dst):
            self.calls["link_dir"] += 1
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(src):
                p = os.path.join(src, f)
                if os.path.isfile(p):
                    shutil.copy2(p, os.path.join(dst, f))

        def writer_lock(self, out_path):
            self.calls["writer_lock"] += 1
            return super().writer_lock(out_path)

        def atomic_swap(self, out_path, staging):
            self.calls["atomic_swap"] += 1
            super().atomic_swap(out_path, staging)

        def recover(self, out_path):
            self.calls["recover"] += 1
            return super().recover(out_path)

    io = CopyLayoutIO()
    monkeypatch.setattr(corpus, "LAYOUT_IO", io)

    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "layout")
    corpus.append_docs(spark, docs.filter(F.col("doc_id") % 5 <= 1), out)
    corpus.append_docs(spark, docs.filter(F.col("doc_id") % 5 <= 2), out)
    corpus.compact_shards(spark, out, min_fill=0.85)
    doomed = docs.filter(F.col("doc_id") % 10 == 1).select("doc_id")
    corpus.delete_from_shards(spark, doomed, out)
    corpus.write_layout_manifest(spark, out)
    report = corpus.verify_shards(spark, out).collect()
    assert report and all(r["shard_ok"] for r in report)

    # conservation through the alternate IO
    back = corpus.read_shards(spark, out)
    expect = docs.filter(F.col("doc_id") % 5 <= 2).join(doomed, "doc_id", "left_anti")
    assert back.count() == expect.count()
    assert back.join(expect.select("doc_id"), "doc_id", "left_anti").count() == 0

    # seam realness: copies only — a bypassing os.link would show nlink >= 2
    for root_, _dirs, files in os.walk(out):
        for f in files:
            st = os.stat(os.path.join(root_, f))
            assert st.st_nlink == 1, f"hard link bypassed the seam: {root_}/{f}"

    # every primitive actually flowed through the alternate instance
    assert io.calls["writer_lock"] >= 4  # one per lifecycle op
    assert io.calls["atomic_swap"] >= 2  # compact + delete publish via swap
    assert io.calls["link_file"] + io.calls["link_dir"] > 0  # generation carry
