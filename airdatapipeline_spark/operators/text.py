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
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10).cast("long")
        % 100
    )
    split = F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val"))
    return (
        d.select("source", split.alias("split"), F.size(tokens_col()).cast("long").alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
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
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 14),
            16,
            10,
        ).cast("long")
        % 100
    )
    keep = (bucket < rate).cast("long")
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
