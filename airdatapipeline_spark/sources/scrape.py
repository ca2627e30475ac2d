"""SRC1 — the web-scrape source, Spark-first.

The reference drives headless Chromium over g1.globo.com and unions 8 CSS
selectors into a row list (/root/reference/scripts/scraper.py:18-195). A
scrape is inherently a driver/edge-side collector: the Spark-idiomatic
boundary is (rows out of the scraper) → `spark.createDataFrame(rows, schema)`
→ landing-zone files; at scale the scraper fleet writes files that a
Structured Streaming file source (streaming/events.py pattern) ingests.

`Scraper` is pluggable; `FakeScraper` generates deterministic rows with the
same shape and dirt profile (dup links, short titles, relative URLs) so the
full DAG-1 chain (scrape → clean → CSV land → bronze overwrite) is testable
offline — mirroring the reference's own offline test-mode strategy.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

from ..schemas import BRONZE_SCHEMA


class Scraper(Protocol):
    def scrape(self) -> list[dict]: ...


@dataclass
class FakeScraper:
    """Deterministic offline scraper: n rows with ~10% duplicate links,
    short titles and relative/invalid URLs, exercising P2/P3/D1/D2."""

    n_rows: int = 100
    base_time: str = "2025-08-01T08:00:00"

    def scrape(self) -> list[dict]:
        base = datetime.fromisoformat(self.base_time)
        rows = []
        for i in range(self.n_rows):
            link_id = i - 1 if i % 10 == 9 else i
            if i % 11 == 0:
                link = f"ftp://invalid.example/{link_id}"
            elif i % 7 == 0:
                link = f"/noticia/{link_id}"
            else:
                link = f"https://g1.globo.com/noticia/{link_id}"
            title = (
                f"curta {i}"
                if i % 13 == 0
                else f"Notícia de teste número {i} com título suficientemente longo"
            )
            rows.append(
                {
                    "doc_id": i,
                    "title": title,
                    "link": link,
                    "source": "G1",
                    "scraped_at": base + timedelta(days=i % 10),
                }
            )
        return rows


@dataclass
class PlaywrightScraper:
    """Real browser scraper stub — Playwright is not in this container.
    Contract identical to FakeScraper (same selectors→rows shape as
    scripts/scraper.py:73-167)."""

    url: str = "https://g1.globo.com"

    def scrape(self) -> list[dict]:
        raise NotImplementedError(
            "STUB: needs playwright + headless chromium; plug in via the "
            "Scraper protocol"
        )


def scrape_to_dataframe(spark: SparkSession, scraper: Scraper | None = None) -> DataFrame:
    """Driver-side collect → distributed DataFrame with the explicit Bronze
    schema (never inferred)."""
    scraper = scraper or FakeScraper()
    return spark.createDataFrame(scraper.scrape(), schema=BRONZE_SCHEMA)
