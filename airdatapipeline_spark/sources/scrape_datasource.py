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



from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "doc_id bigint, title string, link string, source string, scraped_at timestamp_ntz"


class HeadlineScrapeDataSource(DataSource):
    """Usage (batch):
        spark.dataSource.register(HeadlineScrapeDataSource)
        spark.read.format("headline_scrape")
             .option("n_rows", 200).option("n_partitions", 4).load()

    Usage (stream — continuous scraping as a Structured Streaming source):
        spark.readStream.format("headline_scrape")
             .option("batch_rows", 50).option("max_rows", 200).load()
    each micro-batch scrapes the next `batch_rows` headlines; offsets are
    plain row counters checkpointed by the engine, and `readBetweenOffsets`
    replays any batch exactly (FakeScraper rows are a pure function of
    doc_id), giving exactly-once end-to-end with a file sink."""

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

    def simpleStreamReader(self, schema) -> "HeadlineScrapeStreamReader":
        return HeadlineScrapeStreamReader(
            batch_rows=int(self.options.get("batch_rows", 50)),
            max_rows=int(self.options.get("max_rows", 200)),
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


def _scrape_rows(lo: int, hi: int):
    """FakeScraper rows with doc_id in [lo, hi) as reader tuples — the pure
    replayable unit both stream read paths share. Generated directly for
    the range (O(hi-lo)), never scan-from-zero-and-filter: per-batch work
    must not grow with how much has already been scraped."""
    from .scrape import FakeScraper

    for row in FakeScraper(n_rows=hi).scrape_range(lo, hi):
        yield (
            row["doc_id"],
            row["title"],
            row["link"],
            row["source"],
            row["scraped_at"],
        )


class HeadlineScrapeStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"next": <first unscraped doc_id>}. `read` advances by
    batch_rows until max_rows, then reports no-new-data (same offset, empty
    batch) so processAllAvailable()/availableNow drains terminate. Because
    rows are a pure function of doc_id, `readBetweenOffsets` replays any
    committed range bit-identically after a restart — the property that
    makes the checkpointed file sink exactly-once."""

    def __init__(self, batch_rows: int, max_rows: int):
        self.batch_rows = batch_rows
        self.max_rows = max_rows

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        # list-backed iterator, not a lazy generator: the engine consumes it
        # into a pickled prefetch cache for replay-on-failure
        lo = int(start["next"])
        if lo >= self.max_rows:
            return iter(()), {"next": lo}
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter(list(_scrape_rows(lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(_scrape_rows(int(start["next"]), int(end["next"])))
