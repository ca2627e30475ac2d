"""Text-analysis operators for a large-scale training-data pipeline.

Everything here is pure `pyspark.sql.functions` — tokenization, language ID,
quality scoring, token counting and fingerprinting all stay inside
whole-stage codegen (no Python UDFs), so they scan-scale linearly: at 100 TB
these are single-pass map-only plans (plus one small shuffle for the final
aggregates), and every expression is mirrored 1:1 in the DuckDB oracle.

All arithmetic follows the repo's determinism rules (see gold.exact_avg):
integer counts, single-division ratios, no floating accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# tiny public stopword samples per language (for the n-gram/stopword
# language-ID heuristic; real deployments would plug fastText/CLD3 in via a
# pandas UDF, but the heuristic keeps the operator JVM-side and oracle-able)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "los", "de", "y", "que", "en", "un", "es", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "zh": ["的", "是", "在", "了", "有", "和", "人", "这", "中", "大"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break order

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _hash_bucket(mod: int, salt: str = "", key: Column | None = None) -> Column:
    """Content-addressed bucket: conv(md5(salt + key)[0:14], 16, 10) mod
    `mod` — THE hash idiom for every reproducible selection/fingerprint
    (train/val split, mix sampling, pack bucketing, the build's doc-level
    split, the format-roundtrip content fingerprint). `key` defaults to
    doc_id; pass a Column for compound keys. One definition so the
    formula and its SQL oracle twins can never drift apart; changing it
    means changing every oracle in lockstep."""
    if key is None:
        key = F.col("doc_id").cast("string")
    if salt:
        key = F.concat(F.lit(salt), key)
    return F.conv(F.substring(F.md5(key), 1, 14), 16, 10).cast("long") % mod


def _stop_hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts, aggregated per source."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.size(tokens_col()).alias("ws_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH_PATTERN)).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("ws_tokens").cast("long")).alias("total_ws_tokens"),
        F.sum(F.col("bpe_tokens").cast("long")).alias("total_bpe_tokens"),
        F.avg(F.col("ws_tokens").cast("long")).alias("avg_ws_tokens"),
        F.sum(F.col("chars").cast("long")).alias("total_chars"),
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score (length, stopword
    density, word shape) — the length/punct/stopword-ratio heuristic family
    used to filter web corpora."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    df = d.select(
        "doc_id",
        "source",
        # counts as long to match the oracle's BIGINT (duckdb len()/length())
        F.size(t).cast("long").alias("word_count"),
        F.length("text").cast("long").alias("char_count"),
        _stop_hits(t, LANG_STOPWORDS["en"]).cast("long").alias("stop_hits"),
        F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast("long").alias("punct_count"),
    )
    wc = F.col("word_count")
    return df.select(
        "doc_id",
        "source",
        "word_count",
        "char_count",
        "punct_count",
        (F.col("stop_hits") / wc).alias("stopword_ratio"),
        (F.col("char_count") / wc).alias("avg_word_len"),
        (
            F.least(wc / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
            + (F.col("stop_hits") / wc) * F.lit(0.4)
            + F.least((F.col("char_count") / wc) / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
        ).alias("quality_score"),
    )


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID vs the labeled lang column → confusion
    counts. Prediction = argmax of per-language hits with a fixed priority
    tie-break (>= chain), so it is deterministic and SQL-expressible."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    hits = {lang: _stop_hits(t, words) for lang, words in LANG_STOPWORDS.items()}
    df = d.select("lang", *[hits[lg].alias(f"hits_{lg}") for lg in LANG_PRIORITY])

    predicted = None
    for i, lg in enumerate(LANG_PRIORITY):
        cond = None
        for other in LANG_PRIORITY[i + 1 :]:
            c = F.col(f"hits_{lg}") >= F.col(f"hits_{other}")
            cond = c if cond is None else (cond & c)
        branch = F.lit(lg)
        if predicted is None:
            predicted = F.when(cond, branch)
        elif cond is not None:
            predicted = predicted.when(cond, branch)
        else:
            predicted = predicted.otherwise(branch)
    return (
        df.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )


def fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of the sorted distinct token bag (a
    word-order-insensitive content fingerprint). Groups with >1 doc are
    near-dup clusters; keeper = min doc_id. One shuffle on the fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(tokens_col())), " "))
    return (
        d.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


def _predicted_lang() -> Column:
    """Argmax-of-stopword-hits language prediction with LANG_PRIORITY
    tie-break (expects hits_<lang> columns in scope)."""
    predicted = None
    for i, lg in enumerate(LANG_PRIORITY):
        cond = None
        for other in LANG_PRIORITY[i + 1 :]:
            c = F.col(f"hits_{lg}") >= F.col(f"hits_{other}")
            cond = c if cond is None else (cond & c)
        if predicted is None:
            predicted = F.when(cond, F.lit(lg))
        elif cond is not None:
            predicted = predicted.when(cond, F.lit(lg))
        else:
            predicted = predicted.otherwise(F.lit(lg))
    return predicted


def curated_documents(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = 0.5,
    min_words: int = 20,
    lang: str = "en",
) -> DataFrame:
    """End-to-end training-data curation in one declarative plan — the
    north-star composition: quality scoring + language ID + near-dup
    removal, the filter chain a 100 TB corpus goes through before training.

    Single documents scan computes tokens ONCE and derives word/char/stop
    counts, the composite quality score, and per-language stopword hits in
    the same projection (all JVM-side, no Python). Near-dup losers
    (cluster_id != doc_id from the MinHash-LSH connected components) are
    removed with a left-anti join on doc_id. Keeps docs that clear the
    quality threshold, are predicted `lang`, and have >= min_words."""
    from .dedup import cluster_assignments

    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    scored = d.select(
        "doc_id",
        "source",
        F.size(t).cast("long").alias("word_count"),
        F.length("text").cast("long").alias("char_count"),
        F.col("text"),
        *[
            _stop_hits(t, words).cast("long").alias(f"hits_{lg}")
            for lg, words in LANG_STOPWORDS.items()
        ],
    )
    wc = F.col("word_count")
    scored = scored.select(
        "doc_id",
        "source",
        "word_count",
        (
            F.least(wc / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
            + (F.col("hits_en") / wc) * F.lit(0.4)
            + F.least((F.col("char_count") / wc) / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
        ).alias("quality_score"),
        _predicted_lang().alias("predicted_lang"),
    )
    losers = (
        cluster_assignments(spark, sf_dir)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    return (
        scored.join(losers, "doc_id", "left_anti")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("predicted_lang") == lang)
            & (F.col("word_count") >= min_words)
        )
    )


def train_val_split_counts(
    spark: SparkSession, sf_dir: str, train_pct: int = 90
) -> DataFrame:
    """Deterministic train/val split for the documents corpus: bucket =
    md5(doc_id) mod 100 — content-addressed, so the assignment is stable
    across runs, engines, partitionings and cluster sizes (a seeded
    `sample()`/`sampleBy()` is none of those: Spark's RNG is
    partition-dependent and unreproducible elsewhere). This is how a 100 TB
    corpus holds out an eval slice: no shuffle, no state, just a hash
    filter any engine can replay. Returns per-(source, split) counts +
    token totals as the audit view."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(_hash_bucket(100) < train_pct, F.lit("train")).otherwise(F.lit("val"))
    return (
        d.select("source", split.alias("split"), F.size(tokens_col()).cast("long").alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters, per document: the fraction
    of word-bigrams taken by the single most frequent bigram, and the
    fraction of word-trigrams that are duplicates (surplus occurrences).
    Boilerplate / templated / looping text scores high on both and gets
    dropped before training.

    Deliberately ZERO-shuffle: the n-grams of a document live inside that
    document's row, so both metrics are computed by higher-order array
    functions (sort + run-length fold for the top-bigram count,
    size - distinct-size for the duplicate surplus) in a single map-only
    projection — at 100 TB this never materializes an exploded n-gram
    table. The DuckDB oracle takes the set-based route (unnest + GROUP BY)
    and must agree, which is exactly what makes the fold trustworthy.

    Reference quality-gate analogue: /root/reference/dbt_project/models
    staging tests (not_null/length gates); the repetition family extends
    them to corpus curation.
    """
    d = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    # guarded: sequence(1, size-2) on a <3-token doc DESCENDS (Spark
    # auto-steps -1 when start > stop) and element_at then crashes out of
    # bounds — short docs get an empty trigram set instead (fuzz finding)
    trigrams = F.expr(
        "if(size(t) >= 3,"
        " transform(sequence(1, size(t) - 2),"
        "  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))),"
        " cast(array() as array<string>))"
    )
    # run-length fold over the sorted bigram array: longest run == highest
    # frequency of any single bigram (ties collapse to the same max)
    top_bigram_n = F.expr(
        "aggregate(sort_array(bg),"
        " struct(cast('' as string) as prev, 0L as run, 0L as best),"
        " (acc, x) -> struct(x,"
        "   if(x = acc.prev, acc.run + 1L, 1L),"
        "   greatest(acc.best, if(x = acc.prev, acc.run + 1L, 1L))),"
        " acc -> acc.best)"
    )
    df = (
        d.select("doc_id", "source", tokens_col().alias("t"))
        .select("doc_id", "source", bigrams.alias("bg"), trigrams.alias("tg"))
        .select(
            "doc_id",
            "source",
            F.size("bg").cast("long").alias("n_bigrams"),
            top_bigram_n.alias("top_bigram_n"),
            F.size("tg").cast("long").alias("n_trigrams"),
            (F.size("tg") - F.size(F.array_distinct("tg"))).cast("long").alias("dup_trigram_n"),
        )
    )
    # a doc with no bigrams/trigrams has NO repetition evidence: fractions
    # are NULL (not a divide-by-zero crash — ANSI; fuzz finding) and the
    # filter KEEPS it (each threshold vacuously passes when undefined)
    top_frac = F.when(
        F.col("n_bigrams") > 0, F.col("top_bigram_n") / F.col("n_bigrams")
    )
    dup_frac = F.when(
        F.col("n_trigrams") > 0, F.col("dup_trigram_n") / F.col("n_trigrams")
    )
    return df.select(
        "doc_id",
        "source",
        "n_bigrams",
        "top_bigram_n",
        top_frac.alias("top_bigram_frac"),
        "n_trigrams",
        "dup_trigram_n",
        dup_frac.alias("dup_trigram_frac"),
        (
            F.coalesce(top_frac <= 0.18, F.lit(True))
            & F.coalesce(dup_frac <= 0.30, F.lit(True))
        ).alias("keep"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}-[0-9]{4}\b"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction over the documents corpus: count and mask
    emails, IPv4 addresses and phone-shaped digit runs, emitting per-doc
    hit counts and an md5 fingerprint of the redacted text (the fingerprint
    is what the oracle hash-checks, so the whole replace chain is verified
    byte-for-byte).

    The synthetic corpus is clean — it contains no PII by construction — so
    a deterministic contact line derived from doc_id is appended inside the
    query before scanning; the operator under test is the detect/redact
    expression chain, and every pattern is guaranteed non-zero hits. The
    patterns avoid constructs where Java regex and RE2 (DuckDB) diverge
    (no lookaround, no backrefs), so the same pattern strings run on both
    engines. Map-only, zero shuffle, fully inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 phone 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
    )
    df = d.select("doc_id", "source", blob.alias("blob"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("blob", F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(PII_PHONE),
        F.lit("<PHONE>"),
    )
    return df.select(
        "doc_id",
        "source",
        F.regexp_count("blob", F.lit(PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count("blob", F.lit(PII_IPV4)).cast("long").alias("n_ip"),
        F.regexp_count("blob", F.lit(PII_PHONE)).cast("long").alias("n_phone"),
        F.md5(redacted).alias("redacted_md5"),
        (F.length("blob") - F.length(redacted)).cast("long").alias("chars_removed"),
    )


PACK_BUDGET = 2048
PACK_BUCKETS = 8


def _pack_bucket() -> Column:
    """Content-addressed pack bucket: md5(doc_id) mod PACK_BUCKETS — the
    unit of packing parallelism. At 100 TB the bucket count is sized to the
    cluster (each bucket packs independently); membership is
    engine/partitioning-invariant like every hash split in this repo."""
    return _hash_bucket(PACK_BUCKETS)


def sequence_packing(spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET) -> DataFrame:
    """Sequence packing for LLM pretraining, concatenate-and-split flavor:
    docs are laid end-to-end in a deterministic order (doc_id) inside each
    hash bucket and cut every `budget` tokens — pack_id = the budget-window
    the document STARTS in (floor(start_offset / budget)), exactly how a
    packed pretraining shard maps documents to context windows.

    One window function over (bucket, doc_id) — a single shuffle by bucket,
    each bucket's running offset computed in one pass; the per-pack audit
    aggregate is a second small shuffle. SQL-expressible (cumulative SUM
    OVER), so the DuckDB oracle replays it exactly. The no-split first-fit
    variant (whole docs only, greedy) is `pack_greedy` below — stateful per
    bucket, applyInPandas, property-tested rather than oracle-checked."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        _pack_bucket().alias("bucket"),
        F.size(tokens_col()).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    packed = toks.select(
        "bucket",
        "doc_id",
        "n_tok",
        F.floor(start / F.lit(budget)).alias("pack_id"),
    )
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def pack_greedy(spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET) -> DataFrame:
    """First-fit greedy packing (whole documents, never split): within each
    hash bucket, walk docs in doc_id order and open a new pack whenever the
    next doc would overflow `budget`. The running-offset state makes this
    non-SQL (it is the classic applyInPandas-per-group stateful scan);
    grouping by bucket bounds the state to one counter per group and the
    Arrow batch to one bucket's docs. Oversized docs (> budget) get a pack
    of their own. Verified by property tests: every pack fits unless it is
    a single oversized doc, every doc lands exactly once, and the output is
    invariant under input repartitioning."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        _pack_bucket().alias("bucket"),
        F.size(tokens_col()).cast("long").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, pack_id, running = [], 0, 0
        for n in pdf["n_tok"]:
            if running > 0 and running + n > budget:
                pack_id += 1
                running = 0
            pack_ids.append(pack_id)
            running += n
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[["bucket", "doc_id", "n_tok", "pack_id"]]

    return toks.groupBy("bucket").applyInPandas(
        pack, "bucket long, doc_id long, n_tok long, pack_id long"
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware chunking: split each document into CHUNK_TOKENS-token
    windows advancing by CHUNK_STRIDE (8-token overlap) — the chunker in
    front of every pretraining/RAG embedding pass. One map-only projection
    computes the chunk count and explodes the chunk index; the chunk text
    itself stays executor-side (only its md5 fingerprint and token count
    are emitted — at 100 TB the chunk bodies go straight to the next
    operator or sink, never through a driver).

    Chunk i covers tokens [i*stride+1, i*stride+CHUNK] (1-based, clamped at
    the document end — Spark `slice` and DuckDB bracket slicing clamp
    identically, verified). Every token is covered; consecutive chunks
    share `CHUNK - stride` tokens."""
    return _chunk_df(load_table(spark, sf_dir, "documents"))


def _chunk_df(d: DataFrame) -> DataFrame:
    """Chunk expansion over any documents-shaped DataFrame (doc_id, source,
    text) — shared by the standalone chunker and the end-to-end build."""
    n_chunks = F.expr(
        f"1 + (greatest(size(t) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1}) div {CHUNK_STRIDE}"
    )
    chunked = (
        d.select("doc_id", "source", tokens_col().alias("t"))
        .select(
            "doc_id",
            "source",
            F.size("t").cast("long").alias("n_tokens"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
            F.col("t"),
        )
    )
    start = F.col("chunk_id") * CHUNK_STRIDE + 1
    chunk = F.slice(F.col("t"), start, CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def training_data_build(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET, train_pct: int = 90
) -> DataFrame:
    """The end-to-end training-data BUILD in one declarative plan — the
    composition every stage of this module exists for:

        curate (quality + language + near-dup removal)
          → chunk (overlapping token windows)
          → split (train/val at the DOCUMENT level — all chunks of a doc
            land in the same split, so no eval leakage through overlap)
          → pack (concatenate-and-split per hash bucket within each split)

    Returns the per-(split, bucket, pack) audit: chunk count and token
    mass. Catalyst sees ONE plan with two column-pruned documents scans
    (the curation metrics and the chunk source — the semi-join in between
    prevents scan reuse); at 100 TB the curated snapshot is persisted
    first (`jobs curate --out`) and the chunk side reads that pruned
    subset instead. The only iterative piece is the connected-components
    loop inside curation; packing is a window over the already-tiny chunk
    table. This is the query a corpus runs nightly to emit training
    shards."""
    curated_ids = curated_documents(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents").join(curated_ids, "doc_id", "semi")
    chunks = _chunk_df(docs).select("doc_id", "chunk_id", "chunk_tokens")

    split = F.when(_hash_bucket(100) < train_pct, F.lit("train")).otherwise(F.lit("val"))
    keyed = chunks.select(
        split.alias("split"),
        _pack_bucket().alias("bucket"),
        "doc_id",
        "chunk_id",
        "chunk_tokens",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("split", "bucket").orderBy("doc_id", "chunk_id")
    start = F.sum("chunk_tokens").over(w) - F.col("chunk_tokens")
    return (
        keyed.select(
            "split",
            "bucket",
            F.floor(start / F.lit(budget)).alias("pack_id"),
            "chunk_tokens",
        )
        .groupBy("split", "bucket", "pack_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_tokens").alias("pack_tokens"),
        )
    )


def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation triage (the RefinedWeb/C4-style domain audit):
    for each source — document count, exact-duplicate burden, low-quality
    share, and a source-level quality score — plus the keep/flag decision a
    curation pipeline would act on (drop or down-weight flagged sources
    before training).

    Determinism posture: every aggregate is an exact integer sum; the
    source-level score applies the per-doc quality formula to aggregate
    ratios (long sums -> a fixed sequence of IEEE divisions), never
    averaging per-doc floats, so result hashes are engine-exact. Duplicate
    burden = n_docs - distinct(text) inside the same hash-aggregate — no
    self-join, one scan + one 20-row shuffle at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    wc = F.size(t).cast("long")
    cc = F.length("text").cast("long")
    sh = _stop_hits(t, LANG_STOPWORDS["en"]).cast("long")
    doc_score = (
        F.least(wc / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (sh / wc) * F.lit(0.4)
        + F.least((cc / wc) / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
    )
    per_doc = d.select(
        "source",
        "text",
        wc.alias("wc"),
        cc.alias("cc"),
        sh.alias("sh"),
        # NULL score (wc=0) is not low-quality: when() falls through to 0
        F.when(doc_score < 0.5, F.lit(1)).otherwise(F.lit(0)).alias("low"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct("text")).alias("n_dup_excess"),
        F.sum("low").alias("n_low_quality"),
        F.sum("wc").alias("sum_wc"),
        F.sum("cc").alias("sum_cc"),
        F.sum("sh").alias("sum_sh"),
    )
    n = F.col("n_docs")
    src_score = (
        F.least((F.col("sum_wc") / n) / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (F.col("sum_sh") / F.col("sum_wc")) * F.lit(0.4)
        + F.least((F.col("sum_cc") / F.col("sum_wc")) / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
    )
    return agg.select(
        "source",
        "n_docs",
        "n_dup_excess",
        "n_low_quality",
        (F.col("n_dup_excess") / n).alias("dup_rate"),
        (F.col("n_low_quality") / n).alias("low_quality_rate"),
        src_score.alias("source_quality"),
        ((F.col("n_dup_excess") / n > 0.05) | (src_score < 0.5)).alias("flagged"),
    )


def training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for a training mix: each source
    gets its own keep-rate (here a rate schedule derived from the source
    index — src0 keeps 100%, each next source 4 points less — standing in
    for the usual 'wiki 100%, web 30%' mixture weights). Selection is the
    same content-addressed md5-bucket trick as train_val_split_counts,
    salted with a 'mix:' prefix so mix membership is independent of the
    train/val assignment. No shuffle for the selection itself — a 100 TB
    corpus is sampled by a hash filter at scan time; only the per-source
    audit aggregate shuffles (20 rows). Returns per-source totals: corpus
    docs, sampled docs, sampled token mass."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(100) - F.lit(4) * F.substring("source", 4, 10).cast("int")
    keep = (_hash_bucket(100, salt="mix:") < rate).cast("long")
    return (
        d.select(
            "source", keep.alias("keep"), F.size(tokens_col()).cast("long").alias("n_tok")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_sampled"),
            F.sum(F.col("keep") * F.col("n_tok")).alias("sampled_tokens"),
        )
    )


# --- hashed-feature linear quality model (model-based filtering tier) --------

MODEL_HASH_DIM = 64


def _model_weight(j: int) -> int:
    """Deterministic integer weight in [-50, 50] for hash bucket j (md5 of
    the bucket label — the same reproducible-constant idiom as the LSH
    hyperplanes, so the DuckDB oracle inlines identical literals)."""
    import hashlib

    return (int(hashlib.md5(f"w{j}".encode()).hexdigest()[:4], 16) % 101) - 50


MODEL_WEIGHTS: list[int] = [_model_weight(j) for j in range(MODEL_HASH_DIM)]


def quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a hashed-bag-of-words LINEAR model
    (the fastText-style classifier tier that replaces the heuristic
    `quality_scores` in mature corpus pipelines) applied entirely JVM-side.

    Each token hashes to one of MODEL_HASH_DIM buckets (feature hashing —
    Weinberger et al. ICML'09); the document score is the mean bucket
    weight. Weights here are deterministic stand-ins for trained ones
    (training is an offline concern; serving shape is what matters at
    scale): INTEGER weights summed exactly, so the score is
    order/partitioning-independent and the single final division is
    bit-identical across engines. One explode + one hash-agg shuffle —
    the same cost profile as token counting, nothing model-shaped at
    runtime (the 'model' is a 64-literal array in the plan, the degenerate
    broadcast join).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("tok"))
    j = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int") % MODEL_HASH_DIM
    w = F.element_at(F.array(*[F.lit(x) for x in MODEL_WEIGHTS]), j + 1)
    agg = tok.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tok"),
        F.sum(w).cast("long").alias("score_sum"),
    )
    mean_w = F.col("score_sum").cast("double") / F.col("n_tok")
    return agg.select(
        "doc_id",
        "n_tok",
        "score_sum",
        mean_w.alias("mean_weight"),
        (mean_w >= F.lit(0.0)).alias("keep"),
    )


# --- inverted index / postings search ----------------------------------------


def postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional postings: one row per (term, doc_id, position). The
    inverted index in its relational normal form — partitioned/shuffled by
    term, it IS the search index a Spark-side retrieval layer serves from
    (each term's postings list = one group, co-located for intersection
    joins)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "term")
    )
    return tok.select("term", "doc_id", "pos")


def conjunctive_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-term AND + adjacent-phrase search over the postings index. The
    query terms are the corpus's two highest-document-frequency terms
    (df desc, term asc tie-break) — data-derived, so the DuckDB oracle
    reproduces the exact same query; in production the terms arrive from
    the user and the plan below is unchanged.

    Shape: per-term postings are intersected by doc_id (equi-join on the
    index's own partitioning key), then phrase hits check pos_b = pos_a+1
    inside the matched doc — integer joins end to end, no scoring floats.
    Output per matching doc: occurrence counts of each term and the
    adjacent-phrase count."""
    from pyspark.sql import Window

    p = postings(spark, sf_dir)
    df_counts = p.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    top2 = (
        df_counts.orderBy(F.desc("df"), F.asc("term"))
        .limit(2)
        .withColumn("qrank", F.row_number().over(
            Window.orderBy(F.desc("df"), F.asc("term"))
        ))
    )
    q = F.broadcast(top2.select("term", "qrank"))
    qp = p.join(q, on="term")
    t1 = qp.filter(F.col("qrank") == 1).select("doc_id", F.col("pos").alias("pos1"))
    t2 = qp.filter(F.col("qrank") == 2).select("doc_id", F.col("pos").alias("pos2"))
    counts = (
        t1.groupBy("doc_id")
        .agg(F.count("*").alias("n_t1"))
        .join(t2.groupBy("doc_id").agg(F.count("*").alias("n_t2")), on="doc_id")
    )
    phrase = (
        t1.join(t2, on="doc_id")
        .filter(F.col("pos2") == F.col("pos1") + 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_phrase"))
    )
    return (
        counts.join(phrase, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_t1",
            "n_t2",
            F.coalesce(F.col("n_phrase"), F.lit(0)).cast("long").alias("n_phrase"),
        )
    )


MG_CAPACITY = 256  # per-partition Misra-Gries counters (bounded state)
HH_TOPK = 10


def misra_gries_summary(terms, capacity: int) -> dict[str, int]:
    """Single-pass Misra-Gries summary of a token stream: at most
    `capacity` counters; on overflow every counter decrements and zeros
    evict (the classic frequent-items sketch). Shared by the production
    operator below and its tests so the sketch logic cannot silently
    diverge between them. Guarantee (pigeonhole): any item with frequency
    > n/(capacity+1) over a stream of length n survives."""
    counters: dict[str, int] = {}
    for t in terms:
        if t in counters:
            counters[t] += 1
        elif len(counters) < capacity:
            counters[t] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def heavy_hitter_tokens(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = MG_CAPACITY,
    topk: int = HH_TOPK,
) -> DataFrame:
    """EXACT top-k most frequent tokens via the two-phase heavy-hitters
    pattern: per-partition Misra-Gries summaries (bounded state) propose a
    small candidate set, then a second scan exactly recounts ONLY the
    candidates. A naive groupBy's map-side partial-agg hashmaps hold one
    entry per distinct key per partition — on web-scale token streams
    (URLs, emails, typo space) that state is unbounded and spills; the MG
    sketch caps phase-1 state at `capacity` counters per partition, and
    phase 2's partial aggregation keeps only candidate terms, so the
    shuffle carries ≤ partitions × candidates rows at any corpus size.

    Exactness is GUARANTEED, not hoped: by the MG bound any term with
    global frequency > total/(capacity+1) survives phase 1 in at least one
    partition (pigeonhole over partitions). An in-plan integer guard
    raises if any reported top-k frequency fails freq*(capacity+1) >
    total — i.e. if the result could have depended on sketch luck — so a
    capacity too small for the distribution is loud, never silently
    wrong. Candidate SETS vary with partitioning/arrival order; the
    guarded top-k OUTPUT does not (partitioning-invariance pytest-pinned).
    The DuckDB oracle is the plain global count ORDER BY freq DESC LIMIT k
    — phase structure is Spark-side only, results must coincide.

    TWO corpus scans, not three (VERDICT-r8 item 4): the global token
    total the guard needs is a side-output of the MG pass (each partition
    emits one sentinel row carrying its token count alongside its counter
    rows), and the tiny summary frame — ≤ partitions × (capacity+1) rows
    by the sketch's state bound — is persisted so both its consumers
    (candidate set, total) read the cache instead of re-scanning the
    corpus. The total then rides into the guard as a broadcast 1-row
    cross-join column rather than a driver-collected literal, so building
    the DataFrame launches no eager job at all."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens_col()).alias("term"))

    def mg(batches):
        n = 0

        def counted():
            nonlocal n
            for pdf in batches:
                n += len(pdf)
                yield from pdf["term"]

        counters = misra_gries_summary(counted(), capacity)
        terms = list(counters.keys())
        yield pd.DataFrame(
            {"term": terms + [None], "part_n": [None] * len(terms) + [n]}
        )

    summary = toks.mapInPandas(mg, "term string, part_n long").persist()
    cands = summary.filter(F.col("term").isNotNull()).select("term").distinct()
    total_df = summary.groupBy().agg(
        F.sum("part_n").cast("long").alias("total")
    )
    exact = (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    topn = (
        exact.orderBy(F.desc("freq"), F.asc("term"))
        .limit(topk)
        .crossJoin(F.broadcast(total_df))
    )
    guard = F.when(
        F.col("freq") * (capacity + 1) > F.col("total"), F.col("freq")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "heavy-hitter guard: freq %s is not provably sketch-safe at "
                "capacity %s (total %s) — raise MG_CAPACITY",
                F.col("freq"),
                F.lit(capacity),
                F.col("total"),
            )
        )
    )
    from pyspark.sql import Window

    wr = Window.orderBy(F.desc("freq"), F.asc("term"))
    return topn.select(
        "term",
        guard.alias("freq"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QRANK_LO = 10  # query = df-rank 10..12: mid-frequency terms — present
BM25_N_TERMS = 3  # in many docs (the ranking has work to do) yet informative
BM25_TOPK = 20


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = BM25_TOPK,
    terms: list[str] | None = None,
) -> DataFrame:
    """BM25-ranked retrieval over the postings index — the scoring layer
    on top of `conjunctive_phrase_search`'s boolean layer. Default query
    terms are data-derived (document-frequency ranks 10–12, df desc /
    term asc total order) so the oracle reproduces the exact query; pass
    `terms` for a user query (the `jobs search` CLI path) — the plan is
    identical, only the 3-row query-planning collect changes (terms
    absent from the corpus contribute no candidates and drop out).

    Shape at scale: tf and df are each one shuffle over the postings
    (partial-aggregated map-side); the 3-term query is BROADCAST into the
    tf stream, so scoring touches only postings of the query terms — work
    ∝ matching postings, not corpus. The doc-length join-back is an
    equi-join whose filtered side AQE converts to broadcast at runtime;
    the final top-k is orderBy+limit = TakeOrderedAndProject (no global
    sort), with rank assigned by a window over the k surviving rows only.

    Numerics: the tf saturation is all rational double arithmetic spelled
    with identical literals, casts, and association in both engines. The
    Robertson idf ln(1 + (N - df + 0.5)/(df + 0.5)) is computed DRIVER-side
    with the platform libm and inlined as a per-term literal — idf is a
    query-COMPILE-time constant in any search engine (the planner reads
    index stats and bakes the weight into the scorer), and the JVM's
    Math.log differs from libm by 1 ulp on some arguments (measured at
    df=394, sf0.001), which the strict bit-equal parity gate correctly
    reds; Python's math.log and DuckDB's ln share libm and agree. The
    per-doc sum over query terms is pivoted to fixed columns and added in
    a FIXED order (q1 + q2 + q3) — a float SUM() would be
    partition-order-nondeterministic."""
    import math

    from pyspark.sql import Window

    p = postings(spark, sf_dir)
    tf = p.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    d = load_table(spark, sf_dir, "documents")
    dl = d.select("doc_id", F.size(tokens_col()).cast("long").alias("dl"))
    n_docs, total_dl = (
        dl.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).head()
    )
    # K-row collect (K = query terms) — the query-planning step, same
    # driver-side-by-nature justification as the IVF centroid collect in
    # similarity._ivf_assign. The df-rank cut is TakeOrdered
    # (orderBy+limit) FIRST, so the rank window runs over the 12 surviving
    # rows — a bare global row_number window here would single-partition
    # the whole vocabulary (the review-pass finding; phrase search's top-2
    # derivation at conjunctive_phrase_search already uses this shape).
    if terms is None:
        wq = Window.orderBy(F.desc("df"), F.asc("term"))
        qrows = (
            dfc.orderBy(F.desc("df"), F.asc("term"))
            .limit(BM25_QRANK_LO + BM25_N_TERMS - 1)
            .withColumn("dfrank", F.row_number().over(wq))
            .filter(F.col("dfrank") >= BM25_QRANK_LO)
            .select(
                "term", "df", (F.col("dfrank") - (BM25_QRANK_LO - 1)).alias("qrank")
            )
            .collect()
        )
    else:
        # dedupe preserving first-occurrence order: a repeated term must
        # not score twice (each qrank would re-join the same postings,
        # doubling hits and bm25 — review-pass finding, reproduced)
        uniq = list(dict.fromkeys(terms))
        want = spark.createDataFrame(
            [(t, i + 1) for i, t in enumerate(uniq)], "term string, qrank int"
        )
        qrows = (
            dfc.join(F.broadcast(want), "term").select("term", "df", "qrank").collect()
        )
    # dense 1..n_q ranks regardless of which input positions survived —
    # max(qrank) would size the pivot by the highest surviving position
    # and carry an all-null s_i column per absent-from-corpus term
    qrows = sorted(qrows, key=lambda r: r.qrank)
    n_q = len(qrows)
    if n_q == 0:
        return spark.createDataFrame(
            [], "doc_id long, hits int, bm25 double, rank int"
        )
    qterms = spark.createDataFrame(
        [
            (
                r.term,
                i + 1,
                math.log(
                    1.0 + ((float(n_docs) - float(r.df)) + 0.5) / (float(r.df) + 0.5)
                ),
            )
            for i, r in enumerate(qrows)
        ],
        "term string, qrank int, idf double",
    )
    score_t = (
        "idf * ((cast(tf as double) * 2.2D)"
        " / (cast(tf as double) + 1.2D * (0.25D + 0.75D"
        f" * (cast(dl as double) / (cast({total_dl} as double) / cast({n_docs} as double))))))"
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .select("doc_id", "qrank", F.expr(score_t).alias("score_t"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("hits"),
        *[
            F.max(F.when(F.col("qrank") == i, F.col("score_t"))).alias(f"s{i}")
            for i in range(1, n_q + 1)
        ],
    )
    bm25 = per_doc.select(
        "doc_id",
        "hits",
        sum(
            (F.coalesce(F.col(f"s{i}"), F.lit(0.0)) for i in range(2, n_q + 1)),
            F.coalesce(F.col("s1"), F.lit(0.0)),
        ).alias("bm25"),
    )
    topk = bm25.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(wr).cast("int"))


LM_CE_KEEP = 3.405  # nats: keep docs whose bigram cross-entropy is at or
# below the threshold (= corpus median at sf0.001 AND sf0.01, measured —
# so the flag exercises both branches at every test scale; production
# tunes this per-language the way CCNet buckets by KenLM perplexity)


def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity quality scoring — the CCNet/KenLM-style filter
    every web-scale curation pipeline runs: train an add-one-smoothed
    bigram model ON the corpus, score each document's cross-entropy under
    it, and flag the keep set. Emits per doc: bigram count, hapax-bigram
    count (bigrams occurring exactly once corpus-wide — the novelty
    signal), cross-entropy in nats, and the keep flag. Documents with
    fewer than two tokens have no bigrams and drop out (mirrored by the
    oracle's identical construction).

    Scale shape: unigram + bigram counts are each ONE partial-aggregated
    shuffle over the token stream; the bigram stream itself is built
    zero-shuffle per doc (zip_with over adjacent slices — no positional
    self-join); scoring joins the stream to the two count tables on their
    natural keys (equi-joins, work ∝ corpus tokens); the per-doc log-prob
    sum folds a position-sorted array (F.aggregate — explicit
    left-to-right order, so the float total is partitioning-independent,
    the same determinism discipline as BM25's fixed-order pivot sum).

    Numerics contract (the BM25 idf precedent, operators/text.py:907): ln
    is evaluated DRIVER-side with python's libm over the DISTINCT INTEGER
    args — ln(c_bigram+1) and ln(c_unigram+V) — and broadcast-joined back,
    because JVM Math.log and libm disagree by 1 ulp on some arguments
    while python math.log and DuckDB ln share libm. The distinct COUNT
    VALUES (not types!) are Zipf-collapsed — a few hundred at any corpus
    size that has a vocabulary — so the collect is driver-side-by-nature
    like the IVF centroid table. logp = ln_num - ln_den is then one exact
    double subtraction per position."""
    d = load_table(spark, sf_dir, "documents")
    return lm_score_documents(d, lm_model_tables(spark, sf_dir))


def _lm_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, source, pos, prev, cur) — the zero-shuffle bigram stream:
    zip_with over adjacent token slices, no positional self-join."""
    tok = docs.select("doc_id", "source", tokens_col().alias("toks"))
    pairs = F.expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),"
        " (a, b) -> struct(a AS prev, b AS cur))"
    )
    return tok.select(
        "doc_id", "source", F.posexplode(pairs).alias("pos", "pc")
    ).select("doc_id", "source", "pos", "pc.prev", "pc.cur")


def lm_model_tables(spark: SparkSession, sf_dir: str) -> dict:
    """The OFFLINE-trained bigram model as two persisted lookup tables:
    bic2 (prev, cur, cb, ln_num = ln(cb+1)) and uni2 (prev, ln_den =
    ln(cu+V)) — ln attached from the driver-side libm table over the
    Zipf-collapsed distinct integer args (see lm_perplexity_filter's
    numerics contract). This dict is the deployable model artifact: the
    batch filter and the streaming ingest gate score against the SAME
    tables, so offline and online decisions can never drift."""
    import math

    from pyspark import StorageLevel

    from .concurrency import parallel_run

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", tokens_col().alias("toks"))
    uni = (
        tok.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bic = (
        _lm_bigrams(d)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("cb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r12 (guide §1.2/§2.6): vocabulary size + the Zipf-collapsed distinct
    # count values come from ONE aggregate job per table (count +
    # collect_set in the same pass, which also materializes the persist),
    # and the two jobs — independent scans — run concurrently instead of
    # as three serial driver actions. The +1/+V shifts move driver-side
    # over the same integers, so the libm ln args are unchanged.
    uni_stats, cb_vals = parallel_run(
        lambda: uni.groupBy()
        .agg(F.count(F.lit(1)).alias("v"), F.collect_set("cu").alias("cus"))
        .collect()[0],
        lambda: bic.groupBy().agg(F.collect_set("cb").alias("cbs")).collect()[0],
    )
    vsz = int(uni_stats.v)  # vocabulary size
    args = {int(c) + 1 for c in cb_vals.cbs} | {int(c) + vsz for c in uni_stats.cus}
    lnt = F.broadcast(
        spark.createDataFrame(
            [(a, math.log(float(a))) for a in sorted(args)], "arg bigint, lnv double"
        )
    )
    bic2 = bic.join(lnt, (F.col("cb") + 1) == F.col("arg")).select(
        "prev", "cur", "cb", F.col("lnv").alias("ln_num")
    )
    uni2 = uni.join(lnt, (F.col("cu") + F.lit(vsz)) == F.col("arg")).select(
        F.col("w").alias("prev"), F.col("lnv").alias("ln_den")
    )
    return {"bic2": bic2, "uni2": uni2, "vsz": vsz}


def lm_score_documents(docs: DataFrame, model: dict) -> DataFrame:
    """Score any documents frame under a trained model (lm_model_tables):
    per-doc cross-entropy, hapax count, keep flag. Inner-join semantics —
    bigrams absent from the model contribute nothing (exact for in-corpus
    scoring, where absence is impossible; scoring genuinely NEW text adds
    the standard unseen-bigram smoothing via left joins + the ln(1)/ln(V)
    entries, the documented extension)."""
    scored = (
        _lm_bigrams(docs)
        .join(model["bic2"], ["prev", "cur"])
        .join(model["uni2"], "prev")
        .select(
            "doc_id",
            "source",
            "pos",
            (F.col("ln_num") - F.col("ln_den")).alias("logp"),
            (F.col("cb") == 1).cast("long").alias("hapax"),
        )
    )
    per = scored.groupBy("doc_id", "source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("hapax").cast("long").alias("hapax_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("ll"),
    )
    ce = -F.col("ll") / F.col("n_bigrams")
    return per.select(
        "doc_id",
        "source",
        "n_bigrams",
        "hapax_bigrams",
        ce.alias("cross_entropy"),
        (ce <= F.lit(LM_CE_KEEP)).alias("keep"),
    )


def adaptive_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE quality cutoff: keep each source's top half by
    composite quality (rank-based, not a fixed global threshold — sources
    differ systematically in style, so a global cutoff over- or
    under-prunes per source; rank cutoffs are also exactly deterministic
    where interpolated percentile thresholds invite float-boundary
    flapping). Decision = row_number ≤ ceil(n/2) within source, quality
    desc / doc_id asc — one quality-computation scan + one window on the
    source key."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    feats = d.select(
        "doc_id",
        "source",
        F.size(t).cast("long").alias("word_count"),
        F.length("text").cast("long").alias("char_count"),
        _stop_hits(t, LANG_STOPWORDS["en"]).cast("long").alias("stop_hits"),
    )
    wc = F.col("word_count")
    scored = feats.select(
        "doc_id",
        "source",
        (
            F.least(wc / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
            + (F.col("stop_hits") / wc) * F.lit(0.4)
            + F.least((F.col("char_count") / wc) / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
        ).alias("quality_score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality_score"), F.asc("doc_id"))
    n = Window.partitionBy("source")
    return scored.select(
        "doc_id",
        "source",
        "quality_score",
        (
            F.row_number().over(w) * 2 <= F.count("*").over(n) + 1
        ).alias("is_kept"),
    )


# --- distributed BPE tokenizer training (first-K merge rules) ----------------

BPE_N_MERGES = 4  # fixed K so the SQL oracle can unroll the iterations
BPE_VOCAB_TOPK = 20


def bpe_word_table(docs: DataFrame) -> DataFrame:
    """(word, wcount) — the distinct-word frequency table BPE trains on.
    This is the classic trainer trick (HuggingFace tokenizers does the
    same): the corpus is scanned ONCE to build a vocab-sized table, and
    every merge iteration thereafter is proportional to the DISTINCT
    vocabulary (Zipf: ~10^7 rows at any corpus size), not the corpus.
    Words = maximal [a-z]+ runs of the lowercased text, length >= 2 —
    ASCII-only on purpose so the Java-regex and RE2 oracles cannot
    diverge on Unicode class membership."""
    return (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcount"))
    )


def _bpe_pairs(seqs: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over (seq, wcount). The pair
    stream is built zero-shuffle per word (transform over an index
    sequence — no positional self-join); the only shuffle is the
    partial-aggregated groupBy on (l, r). `syms` is projected ONCE and the
    guard/transform read the column — the first cut re-derived
    split(trim(seq)) three times inside one expr (r9 review)."""
    staged = seqs.select(
        F.split(F.trim(F.col("seq")), " ").alias("syms"), "wcount"
    )
    pairs = F.when(
        F.size(F.col("syms")) >= 2,
        F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> struct(element_at(syms, i) AS l,"
            "             element_at(syms, i + 1) AS r))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))
    return (
        staged.select(F.explode(pairs).alias("p"), "wcount")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("wcount").alias("pair_count"))
    )


def _bpe_apply_merge(seq: Column, left: str, right: str) -> Column:
    """Apply one merge rule to a space-padded symbol sequence: two literal
    replace passes of ' l r ' -> ' lr '. A single pass misses every other
    occurrence in a chain (matches share their boundary space); the second
    pass catches those. Both Spark's and DuckDB's replace() do the same
    leftmost non-overlapping scan, so the two engines produce bit-equal
    sequences — the parity contract. (A pathological leftover adjacency
    after two passes simply re-enters the next iteration's pair counts;
    it is never silently lost.)"""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    return F.replace(F.replace(seq, pat, rep), pat, rep)


BPE_CHECKPOINT_EVERY = 32  # lineage-truncation cadence at production K


def bpe_iterate(
    wf: DataFrame,
    n_merges: int,
    keep_cache: bool = True,
    checkpoint_every: int | None = BPE_CHECKPOINT_EVERY,
    merge_times: list[float] | None = None,
) -> tuple[list[tuple], DataFrame]:
    """Run n_merges BPE iterations over a (word, wcount) table. Returns
    (merges, final_seqs): merges = [(rank, left, right, merged, count)],
    final_seqs = (word, seq, wcount) after all merges.

    Scale shape: wf is persisted once (vocab-sized); each iteration is one
    vocab-proportional pair-count aggregation plus a 1-ROW collect — the
    winning merge rule is a scalar model parameter, the same
    driver-side-by-nature justification as the IVF centroid table and
    BM25's K-term query plan (operators/text.py:920). The merge is then
    applied as a narrow map; lineage depth grows by one projection per
    merge, truncated by an eager localCheckpoint every `checkpoint_every`
    merges (VERDICT-r9 item 5: the cadence the docstring promised is now a
    real code path — inert at the oracle's K=4, exercised at production K
    by the bench tier and the lineage test). `merge_times`, when passed,
    receives each iteration's wall seconds (per-merge flatness is the
    vocab-bound design claim the bench records)."""
    import time as _time

    from pyspark import StorageLevel

    wf = wf.persist(StorageLevel.MEMORY_AND_DISK)
    seqs = wf.select(
        "word",
        F.concat(
            F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
        ).alias("seq"),
        "wcount",
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        t_it = _time.time()
        top = (
            _bpe_pairs(seqs)
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:  # corpus too small to support n_merges rules
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
        merges.append((rank, l, r, l + r, cnt))
        seqs = seqs.select(
            "word", _bpe_apply_merge(F.col("seq"), l, r).alias("seq"), "wcount"
        )
        if checkpoint_every and rank % checkpoint_every == 0:
            # truncate the K-deep projection chain: the checkpoint cost is
            # one vocab-sized materialization, attributed to this iteration
            seqs = seqs.localCheckpoint(eager=True)
        if merge_times is not None:
            merge_times.append(round(_time.time() - t_it, 3))
    if not keep_cache:
        # caller discards the sequence table (train_merges): release the
        # vocab cache instead of pinning it for the session (r9 review —
        # the repo convention unpersists when nothing returned depends on
        # the cache benefit)
        wf.unpersist(blocking=False)
    return merges, seqs


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """First-K BPE merge rules trained on the documents corpus — the
    tokenizer-training operator every LLM data pipeline runs before
    anything downstream can count a token. Output is the model artifact
    itself: (merge_rank, left_sym, right_sym, merged_sym, pair_count),
    built from the K per-iteration scalar collects (see bpe_iterate).
    Reference scope: the reference has no tokenizer trainer; this is part
    of the LLM-pipeline extension family the brief asks for."""
    merges, _ = bpe_iterate(
        bpe_word_table(load_table(spark, sf_dir, "documents")),
        n_merges,
        keep_cache=False,
    )
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string,"
        " merged_sym string, pair_count bigint",
    )


def bpe_vocab_top(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = BPE_N_MERGES,
    k: int = BPE_VOCAB_TOPK,
) -> DataFrame:
    """Top-k corpus symbols AFTER the K trained merges are applied:
    (symbol, sym_weight = corpus-weighted occurrences, n_word_occurrences
    = occurrences across the distinct-word table). End-to-end check of
    the merge APPLICATION path (bit-equal sequence evolution in both
    engines), not just the rule counts; top-k via orderBy+limit so the
    plan is TakeOrderedAndProject, never a global sort."""
    _, seqs = bpe_iterate(bpe_word_table(load_table(spark, sf_dir, "documents")), n_merges)
    return (
        seqs.select(
            F.explode(F.split(F.trim("seq"), " ")).alias("symbol"), "wcount"
        )
        .groupBy("symbol")
        .agg(
            F.sum("wcount").alias("sym_weight"),
            F.count("*").cast("long").alias("n_word_occurrences"),
        )
        .orderBy(F.desc("sym_weight"), F.asc("symbol"))
        .limit(k)
    )


VOCAB_TOP_N = 16  # closed vocabulary size; the synthetic corpus draws from a
# 31-word pool, so top-16 leaves a real Zipf tail OOV (top-64 would be
# degenerate all-covered at every sf)


def vocab_oov_rate(
    spark: SparkSession, sf_dir: str, top_n: int = VOCAB_TOP_N
) -> DataFrame:
    """Per-source OOV rate against the top-N corpus vocabulary — the
    tokenizer-coverage statistic run right after tokenizer training:
    if a source's token stream is mostly out-of-vocabulary, the trained
    vocab under-serves it (and its byte-per-token cost explodes).

    Output: (source, total_tokens, oov_tokens, oov_rate,
    distinct_oov_words). Vocabulary = top-N whitespace tokens by corpus
    frequency, ties broken token-asc (total order — deterministic under
    any partitioning, unlike a frequency-threshold cut that flaps on
    ties at the boundary).

    Scale shape: vocab selection is one partial-agg shuffle +
    TakeOrderedAndProject; the N-row vocab is BROADCAST back into the
    token stream, so the coverage pass is one scan + one map-side join +
    one per-source aggregation — no corpus-sized shuffle anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens_col()).alias("w"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(top_n)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    marked = toks.join(F.broadcast(vocab), "w", "left")
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").alias("total_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "oov_tokens"
            ),
            F.count_distinct(
                F.when(F.col("in_vocab").isNull(), F.col("w"))
            ).alias("distinct_oov_words"),
        )
        .select(
            "source",
            "total_tokens",
            "oov_tokens",
            (F.col("oov_tokens") / F.col("total_tokens")).alias("oov_rate"),
            "distinct_oov_words",
        )
    )


def bpe_compression_by_source(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_N_MERGES
) -> DataFrame:
    """Per-source compression of the TRAINED tokenizer — the measurement a
    tokenizer pipeline runs right after training: encode the corpus with
    the learned merges and report chars-per-token. A source whose
    chars_per_symbol stays near 1 is poorly served by the vocab (its text
    fragments into characters); the 'bytes-per-token budget' planners use
    exactly this table.

    Encoding rides the already-trained word table: per distinct word,
    symbols_after = the final sequence's symbol count; the corpus token
    stream then equi-joins back on the word key (work ∝ corpus tokens; at
    web scale the Zipf head of this join-back would broadcast, the rarity
    operator's head/tail split — cited there, operators/text.py rarity).
    chars_per_symbol = one exact int/int IEEE division per source."""
    _, seqs = bpe_iterate(
        bpe_word_table(load_table(spark, sf_dir, "documents")), n_merges
    )
    per_word = seqs.select(
        "word",
        F.length("word").cast("long").alias("chars"),
        F.size(F.split(F.trim("seq"), " ")).cast("long").alias("syms"),
    )
    stream = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .where(F.length("word") >= 2)
    )
    return (
        stream.join(per_word, "word")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("chars").alias("total_chars"),
            F.sum("syms").alias("total_symbols"),
        )
        .select(
            "source",
            "n_words",
            "total_chars",
            "total_symbols",
            (F.col("total_chars") / F.col("total_symbols")).alias(
                "chars_per_symbol"
            ),
        )
    )
