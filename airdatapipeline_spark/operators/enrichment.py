"""The LLM-enrichment operator (SURVEY.md §2.9) — Spark-first redesign.

The reference enriches headlines one row at a time through a blocking OpenAI
call inside a Python loop (~10 rows/s upper bound,
/root/reference/scripts/llm_enricher.py:222-254). Here the same operator is a
partition-parallel, Arrow-batched ``mapInPandas``: on a 1000-executor cluster
every partition classifies its batch concurrently, and the Python boundary is
crossed once per Arrow batch instead of once per row.

Contract preserved from the reference:
  - output schema: sentiment/category/confidence_score/processing_time_seconds
    + model_used tag (scripts/llm_enricher.py:124-137);
  - error semantics: any classifier failure yields a sentinel row
    ('Erro','Erro', 0.0) — never drop a headline (scripts/llm_enricher.py:256-270);
  - domain validation + clamp (scripts/llm_enricher.py:184-195) applied after;
  - rate limiting (scripts/llm_enricher.py:252-254) becomes a per-partition
    token bucket (only engaged for real external classifiers).

The default classifier is the deterministic mock modeled on the reference's
test harness (scripts/llm_test_enricher.py:191-198), keyed on a stable row
key instead of the pandas positional index so results are invariant to
partitioning (SURVEY.md §7.4).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from typing import Protocol

import pandas as pd

from pyspark.sql import DataFrame

from ..model import CATEGORIES, MODEL_TAG, SENTIMENTS

ENRICHED_COLS = "sentiment string, category string, confidence_score double, processing_time_seconds double, model_used string"


class Classifier(Protocol):
    """Pluggable classifier: (titles, keys) → DataFrame[sentiment, category,
    confidence_score]. `keys` is a stable int64 row key."""

    def classify(self, titles: pd.Series, keys: pd.Series) -> pd.DataFrame: ...


@dataclass
class MockClassifier:
    """Deterministic round-robin classifier (the reference's offline test
    mode). Keyed on the stable row key, so output is a pure function of the
    input row — reproducible under any partitioning, and expressible in SQL
    for oracle checks."""

    def classify(self, titles: pd.Series, keys: pd.Series) -> pd.DataFrame:
        k = keys.astype("int64")
        is_err = (k % 17) == 0
        sentiment = pd.Series(
            [SENTIMENTS[i] for i in (k % 3)], index=k.index, dtype="object"
        ).mask(is_err, "Erro")
        category = pd.Series(
            [CATEGORIES[i] for i in (k % 12)], index=k.index, dtype="object"
        ).mask((k % 23) == 0, None).mask(is_err, "Erro")
        confidence = (0.5 + (k % 50) / 100.0).mask(is_err, 0.0)
        return pd.DataFrame(
            {"sentiment": sentiment, "category": category, "confidence_score": confidence}
        )


@dataclass
class ExternalClassifier:
    """Adapter for a real (e.g. LLM-backed) classifier with the reference's
    retry/rate-limit posture. `call` maps one batch of titles to a DataFrame;
    failures produce sentinel rows instead of dropping data."""

    call: Callable[[pd.Series], pd.DataFrame]
    max_rows_per_sec: float | None = 10.0

    def classify(self, titles: pd.Series, keys: pd.Series) -> pd.DataFrame:
        start = time.monotonic()
        try:
            out = self.call(titles)
        except Exception:
            out = pd.DataFrame(
                {
                    "sentiment": ["Erro"] * len(titles),
                    "category": ["Erro"] * len(titles),
                    "confidence_score": [0.0] * len(titles),
                },
                index=titles.index,
            )
        if self.max_rows_per_sec:
            # token bucket: don't return the batch faster than the budget
            min_elapsed = len(titles) / self.max_rows_per_sec
            sleep = min_elapsed - (time.monotonic() - start)
            if sleep > 0:
                time.sleep(sleep)
        return out


def enrich(
    df: DataFrame,
    classifier: Classifier | None = None,
    *,
    key_col: str = "doc_id",
    title_col: str = "title",
    model_tag: str = MODEL_TAG,
) -> DataFrame:
    """Append enrichment columns via mapInPandas (one Python crossing per
    Arrow batch). Input must carry a stable int key column."""
    classifier = classifier or MockClassifier()
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {ENRICHED_COLS}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t0 = time.monotonic()
            try:
                res = classifier.classify(pdf[title_col], pdf[key_col])
            except Exception:
                res = pd.DataFrame(
                    {
                        "sentiment": ["Erro"] * len(pdf),
                        "category": ["Erro"] * len(pdf),
                        "confidence_score": [0.0] * len(pdf),
                    },
                    index=pdf.index,
                )
            elapsed = time.monotonic() - t0
            out = pdf.copy()
            out["sentiment"] = res["sentiment"].values
            out["category"] = res["category"].values
            out["confidence_score"] = res["confidence_score"].astype("float64").values
            out["processing_time_seconds"] = elapsed / max(len(pdf), 1)
            out["model_used"] = model_tag
            yield out

    return df.mapInPandas(run, schema=out_schema)


def idempotent_append(new_rows: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """SNK2 — the reference's `INSERT ... ON CONFLICT (raw_link) DO NOTHING`
    (scripts/llm_enricher.py:283-309) as an anti-join-then-union: rows whose
    key already exists are dropped, making re-runs idempotent. With a Delta/
    Iceberg table this becomes MERGE WHEN NOT MATCHED THEN INSERT; on plain
    parquet the caller writes the result with mode('append')."""
    fresh = new_rows.join(existing.select(key), on=key, how="left_anti")
    return existing.unionByName(fresh)
