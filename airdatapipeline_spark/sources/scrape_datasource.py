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
        # Row construction delegates to FakeScraper so the formula lives in
        # exactly one Python place (the SQL oracle mirrors it separately).
        from .scrape import FakeScraper

        p = partition.value
        for row in FakeScraper(n_rows=self.n_rows).scrape():
            if row["doc_id"] % self.n_partitions == p:
                yield (
                    row["doc_id"],
                    row["title"],
                    row["link"],
                    row["source"],
                    row["scraped_at"],
                )
