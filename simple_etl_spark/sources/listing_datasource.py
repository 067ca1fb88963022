"""Spark 4 Python Data Source for the paginated listing crawl (S1).

`http_source.crawl_listing` fetches index pages on the driver — fine
for tens of pages, but a first-class source does better: this wraps
the same pluggable fetcher in the Python Data Source API
(pyspark.sql.datasource), so a listing crawl is

    spark.dataSource.register(ListingDataSource)
    spark.read.format("news_listing")
         .option("pages", "500")
         .option("fetcher", "my_pkg.fetchers:cnn_listing")
         .load()

with ONE INPUT PARTITION PER PAGE — the fetch itself distributes
across the cluster, Catalyst sees a real relation (schema, pushdown
of projections), and the fetcher stays injectable as a module-path
option (executors import it; options are strings by API contract).

No network exists in the test environment: the default fetcher raises
loudly, and :func:`synthetic_listing_fetcher` is the deterministic
stand-in tests and demos point the option at.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = (
    "page int, title string, link string, image string, "
    "date_raw string, topic string"
)

DEFAULT_FETCHER = "simple_etl_spark.sources.http_source:default_listing_fetcher"


def _resolve(path: str):
    """Import ``module:attr`` — the executor-side fetcher lookup."""
    mod, _, attr = path.partition(":")
    if not attr:
        raise ValueError(f"fetcher option must be 'module:attr', got {path!r}")
    return getattr(importlib.import_module(mod), attr)


def synthetic_listing_fetcher(page: int) -> list[dict]:
    """Deterministic offline stand-in for a listing page fetch (five
    cards per page, stable content) — the test/demo twin of a real
    HTTP fetcher, exactly like http_source's injectable fakes."""
    return [
        {
            "title": f"Article {page}-{i}",
            "link": f"https://news.example/p{page}/a{i}",
            "image": f"https://img.example/p{page}/a{i}",
            "date_raw": f"2024-01-{(page % 27) + 1:02d}",
            "topic": ["politik", "ekonomi", "teknologi", "olahraga", "hukum"][i],
        }
        for i in range(5)
    ]


class ListingDataSource(DataSource):
    """format("news_listing"): options ``pages`` (int, default 1) and
    ``fetcher`` (module:attr path, default raises without network)."""

    @classmethod
    def name(cls) -> str:
        return "news_listing"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "_ListingReader":
        return _ListingReader(self.options)


class _ListingReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        # fail fast on the driver for a malformed fetcher path
        _resolve(options.get("fetcher", DEFAULT_FETCHER))

    def partitions(self) -> Sequence[InputPartition]:
        pages = int(self.options.get("pages", "1"))
        return [InputPartition(p) for p in range(1, pages + 1)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        fetcher = _resolve(self.options.get("fetcher", DEFAULT_FETCHER))
        page = partition.value
        for card in fetcher(page):
            yield (
                page,
                card.get("title"),
                card.get("link"),
                card.get("image"),
                card.get("date_raw"),
                card.get("topic"),
            )
