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


_OPENAI_PROMPT = """
Analise a seguinte manchete de notícia brasileira e retorne APENAS um objeto JSON com estas chaves:
- 'sentiment': "Positiva", "Negativa" ou "Neutra"
- 'category': uma das opções: {categories}
- 'confidence': um número entre 0.0 e 1.0 indicando sua confiança na classificação

Seja preciso e considere o contexto brasileiro.

Manchete: "{headline}"
""".strip()


@dataclass
class OpenAIChatClassifier:
    """OpenAI-shape chat-completions adapter mirroring the reference's
    call contract (scripts/llm_enricher.py:148-211): one JSON-object
    response per headline, validated against the fixed sentiment/category
    vocabularies with confidence clamped to [0, 1]; any per-row failure
    yields the ('Erro', 'Erro', 0.0) sentinel — a bad row never drops a
    headline and never poisons its batch.

    `transport` maps a chat-completions request payload (dict) to the
    parsed response body (dict); it is injected so tests run against a
    fake and production wires the real HTTP call via `from_env()`.
    Transport failures retry with exponential backoff (the posture the
    reference approximates with its fixed 0.1 s sleep) before falling
    back to the sentinel. NEVER constructed implicitly: tests use the
    deterministic MockClassifier; this class only activates when the
    caller passes it explicitly (env-gated via from_env)."""

    transport: Callable[[dict], dict]
    model: str = "gpt-3.5-turbo-1106"
    max_retries: int = 3
    backoff_s: float = 0.5
    sleep: Callable[[float], None] = time.sleep

    def _request_payload(self, headline: str) -> dict:
        cats = ", ".join(f'"{c}"' for c in CATEGORIES)
        return {
            "model": self.model,
            "messages": [
                {
                    "role": "user",
                    "content": _OPENAI_PROMPT.format(categories=cats, headline=headline),
                }
            ],
            "response_format": {"type": "json_object"},
            "temperature": 0.1,
            "max_tokens": 150,
        }

    def _analyze(self, headline: str) -> tuple[str, str, float]:
        import json

        for attempt in range(self.max_retries):
            try:
                body = self.transport(self._request_payload(headline))
                result = json.loads(body["choices"][0]["message"]["content"])
                break
            except Exception:
                if attempt == self.max_retries - 1:
                    return ("Erro", "Erro", 0.0)
                self.sleep(self.backoff_s * (2**attempt))
        sentiment = result.get("sentiment", "Erro")
        category = result.get("category", "Erro")
        try:
            confidence = float(result.get("confidence", 0.0))
        except (TypeError, ValueError):
            confidence = 0.0
        if sentiment not in SENTIMENTS:
            sentiment = "Erro"
        if category not in CATEGORIES:
            category = "Erro"
        if not (0.0 <= confidence <= 1.0):
            confidence = 0.0
        return (sentiment, category, confidence)

    def classify(self, titles: pd.Series, keys: pd.Series) -> pd.DataFrame:
        rows = [self._analyze(t) for t in titles]
        return pd.DataFrame(
            {
                "sentiment": [r[0] for r in rows],
                "category": [r[1] for r in rows],
                "confidence_score": [float(r[2]) for r in rows],
            },
            index=titles.index,
        )

    @classmethod
    def from_env(cls, **kwargs) -> "OpenAIChatClassifier":
        """Build with a real HTTPS transport. Env-gated: requires
        OPENAI_API_KEY (never set in this repo's tests or CI). On a
        cluster each executor opens its own connection; combined with
        ExternalClassifier-style rate limiting the aggregate throughput
        is bounded per-partition, not per-driver."""
        import json
        import os
        import urllib.request

        api_key = os.environ.get("OPENAI_API_KEY")
        if not api_key:
            raise RuntimeError(
                "OpenAIChatClassifier.from_env requires OPENAI_API_KEY; "
                "use MockClassifier (default) for offline runs"
            )
        url = os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1") + "/chat/completions"

        def transport(payload: dict) -> dict:
            req = urllib.request.Request(
                url,
                data=json.dumps(payload).encode(),
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"Bearer {api_key}",
                },
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                return json.loads(resp.read())

        return cls(transport=transport, **kwargs)


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
