"""SRC1 at scale: a Spark 4 Python DataSource wrapping the scraper.

`scrape.scrape_to_dataframe` collects on the driver — fine for one front
page, wrong for a scraper fleet. This DataSource moves scraping INTO the
executors: each input partition runs its own scraper shard, so a
1000-partition read scrapes 1000 sources concurrently with no driver
bottleneck, and the result is a first-class `spark.read.format(...)` scan
that Catalyst can project/filter like any other source.

The deterministic FakeScraper backs it here (Playwright isn't in the
container); a real deployment swaps the per-partition row generator.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "doc_id bigint, title string, link string, source string, scraped_at timestamp_ntz"


class HeadlineScrapeDataSource(DataSource):
    """Usage:
        spark.dataSource.register(HeadlineScrapeDataSource)
        spark.read.format("headline_scrape")
             .option("n_rows", 200).option("n_partitions", 4).load()
    """

    @classmethod
    def name(cls) -> str:
        return "headline_scrape"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "HeadlineScrapeReader":
        return HeadlineScrapeReader(
            n_rows=int(self.options.get("n_rows", 100)),
            n_partitions=int(self.options.get("n_partitions", 4)),
        )


class HeadlineScrapeReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int):
        self.n_rows = n_rows
        self.n_partitions = n_partitions

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_partitions)]

    def read(self, partition):
        # Each partition scrapes its shard: rows where i % n_partitions == p.
        # Pure function of i — identical to sources.scrape.FakeScraper.
        base = datetime.fromisoformat("2025-08-01T08:00:00")
        p = partition.value
        for i in range(p, self.n_rows, self.n_partitions):
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
            yield (i, title, link, "G1", base + timedelta(days=i % 10))
