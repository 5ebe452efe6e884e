"""Paginated-listing source (S1) as a Spark 4 Python Data Source.

Reference behavior being re-expressed (SURVEY §2.1 S1): the scraper walks a
paginated movie listing page by page (``scraping/scraper.py:34-73`` —
``?page={n}`` loop, 50 titles per page) and yields ``"Title (year)"``
strings. SURVEY declared a file source as the stand-in; this module closes
the gap properly: a custom ``DataSource`` whose **partitions ARE the
pages**, so the pagination loop the reference runs serially on one machine
becomes N parallel executor tasks — the idiomatic Spark shape for any
paged/cursored upstream (HTTP listings, REST cursors, key-ranged APIs).

The container has no network, so the page fetch is a deterministic
synthesizer (same title grammar as the reference's listing). The REAL
integration point is ``_fetch_page``: swap it for an HTTP call and nothing
else changes — partition planning, schema, and the downstream P3 parse are
already production-shaped.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: listing geometry defaults (reference pages hold 50 titles).
PER_PAGE = 50


def _fetch_page(page: int, per_page: int) -> Iterator[tuple]:
    """One listing page -> (page, rank, raw_title) rows. Deterministic
    synthetic stand-in for the reference's HTTP GET ?page={page}; titles
    follow the same '"Title (year)"' grammar, with every 7th entry missing
    its year (the case P3 defaults to 1800)."""
    for rank in range(per_page):
        item = page * per_page + rank
        year = 1900 + (item * 37) % 126
        if item % 7 == 3:
            title = f"Untitled Project {item}"
        else:
            title = f"Movie {item} ({year})"
        yield (page, rank, title)


class ListingDataSource(DataSource):
    """`spark.read.format("cinegraph_listing").option("pages", N)`."""

    @classmethod
    def name(cls) -> str:
        return "cinegraph_listing"

    def schema(self) -> str:
        return "page int, rank int, raw_title string"

    def reader(self, schema) -> "ListingReader":
        return ListingReader(self.options)

    def simpleStreamReader(self, schema) -> "ListingStreamReader":
        return ListingStreamReader(self.options)


class ListingReader(DataSourceReader):
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", "10"))
        self.per_page = int(options.get("per_page", str(PER_PAGE)))

    def partitions(self) -> Sequence[InputPartition]:
        # one input split per listing page: the scraper's serial
        # `for page in range(...)` loop becomes `pages` parallel tasks
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return _fetch_page(partition.value, self.per_page)


class ListingStreamReader(SimpleDataSourceStreamReader):
    """The same paginated listing as a STREAMING source (Spark 4 Python
    streaming data source API): the offset is the next page number, so a
    restart resumes exactly where the checkpoint left off — the reference's
    'continue scraping from the last page' behavior with exactly-once
    delivery for free.

    ``read`` advances up to ``pages_per_batch`` pages per micro-batch
    (default 0 = all remaining); ``readBetweenOffsets`` replays a committed
    range deterministically after failure, which is what makes the source
    exactly-once rather than at-least-once.

    **Driver-prefetch bound (API contract, measured on Spark 4.1):**
    ``SimpleDataSourceStreamReader`` prefetches ``read()``'s rows on the
    DRIVER, and ``Trigger.AvailableNow`` consumes exactly ONE ``read()``
    batch per run. The two sane configurations are therefore:

    - ``pages_per_batch=0`` (default): one-shot availableNow drains see the
      whole listing, but the driver materializes every remaining page in
      one list — fine at the reference's scale (~2k pages × 25 rows), NOT
      at 100× listing depth.
    - ``pages_per_batch=N``: driver prefetch is bounded at ``N`` pages per
      micro-batch for continuous triggers, and an availableNow run consumes
      only the next ``N`` pages — drain the full listing by re-running
      against one checkpoint until the sink stops growing (pinned in
      ``tests/test_listing_source.py::test_bounded_batches_drain_resumes``).

    For unbounded full-listing scans prefer the BATCH ``ListingReader``
    (one executor task per page, no driver prefetch) — it is the scale
    path; the stream exists for incremental 'continue from the last page'
    consumption."""

    def __init__(self, options: dict):
        self.pages = int(options.get("pages", "10"))
        self.per_page = int(options.get("per_page", str(PER_PAGE)))
        self.pages_per_batch = int(options.get("pages_per_batch", "0"))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, start_page: int, end_page: int) -> list[tuple]:
        # concrete list, not a generator: the engine pickles prefetched
        # rows between driver and executors
        return [
            row
            for p in range(start_page, end_page)
            for row in _fetch_page(p, self.per_page)
        ]

    def read(self, start: dict):
        p = int(start["page"])
        if p >= self.pages:
            # MUST be an iterator, not a list: on a no-advance result the
            # engine probes exhaustion with next(it)
            # (pyspark/sql/datasource_internal.py::add_result_to_cache);
            # a plain [] raises TypeError there. Advancing batches below
            # stay concrete lists — those rows are pickled for prefetch.
            return iter(()), {"page": p}
        end = (
            min(p + self.pages_per_batch, self.pages)
            if self.pages_per_batch > 0
            else self.pages
        )
        return self._rows(p, end), {"page": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._rows(int(start["page"]), int(end["page"]))


def _register(spark) -> None:
    """Register the DataSource (idempotent), pickled BY VALUE: the
    streaming-source planner is a separate Python process spawned by the
    driver JVM that unpickles the DataSource class but does NOT see
    ``addPyFile`` includes or the driver's ``sys.path`` edits — from any
    cwd other than the repo root it dies with ModuleNotFoundError (found
    by the round-9 fresh-cwd driver simulation). ``register_pickle_by_value``
    embeds this module's code in the pickle, so neither the planner nor
    the executors need the package importable for the source itself.
    NB: must be pyspark's VENDORED cloudpickle — ``spark.dataSource``
    serializes with ``pyspark.cloudpickle``, whose by-value registry is
    separate from the standalone ``cloudpickle`` package's."""
    from pyspark import cloudpickle

    import cinegraph_spark.sources.listing as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(ListingDataSource)


def read_listing(spark, pages: int = 10, per_page: int = PER_PAGE):
    """Register (idempotent) and read the paginated listing."""
    _register(spark)
    return (
        spark.read.format("cinegraph_listing")
        .option("pages", str(pages))
        .option("per_page", str(per_page))
        .load()
    )


def read_listing_stream(
    spark,
    pages: int = 10,
    per_page: int = PER_PAGE,
    pages_per_batch: int = 0,
):
    """Register (idempotent) and open the paginated listing as a stream.

    ``pages_per_batch=0`` (default) returns all remaining pages in one
    micro-batch — required for one-shot availableNow drains, but the rows
    are prefetched driver-side, so at deep-listing scale pass a bound and
    drain incrementally (see :class:`ListingStreamReader` docstring)."""
    _register(spark)
    return (
        spark.readStream.format("cinegraph_listing")
        .option("pages", str(pages))
        .option("per_page", str(per_page))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )
