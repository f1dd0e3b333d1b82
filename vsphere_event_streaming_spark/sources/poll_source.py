"""Custom Structured Streaming source: polled event API (S1).

The reference polls the vCenter SOAP event API once per second, 50
events per page (/root/reference/cmd/server/main.go:24,:100-110),
starting from now−5m (:90-92). This is the same physical pattern as a
PySpark ``SimpleDataSourceStreamReader``: each micro-batch is one poll
page; the stream offset is the event Key cursor; `readBetweenOffsets`
replays a page deterministically after restart (the at-least-once
contract, reference README.md:27-29).

The upstream here is a deterministic synthetic generator playing the
role of vcsim (the simulated vCenter the reference's e2e tests use,
main_test.go:30-97) — the Spark-side machinery (offset management,
micro-batch planning, restart replay) is the real component under
test. A production vCenter client only replaces ``_generate_page``'s
body with a SOAP ``ReadNextEvents`` call — ``sources/soap_client.py``
implements exactly that adapter (VIM SOAP over stdlib HTTP,
constructed from the reference's documented VCENTER_* environment),
contract-tested through a canned transport because this sandbox has
no network.

Scale: one poll source instance feeds the driver; fan-out happens at
the sink (partitioned append). Poll sources are inherently
single-cursor — for multi-collector topologies, run one stream per
collector and union at the sink (reference runs one collector per
vCenter too).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

DEFAULT_PAGE_SIZE = 50  # reference poll page (main.go:107)
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

SCHEMA_DDL = (
    "key bigint, created_time timestamp, event_type string, "
    "user_name string, message string"
)

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _generate_event(key: int) -> tuple:
    """Deterministic synthetic vSphere-ish event for a given key.

    Stands in for one record of ``ReadNextEvents``; same key ⇒ same
    event, which is what makes restart replay testable.
    """
    ts = EPOCH + dt.timedelta(seconds=key)
    etype = _EVENT_TYPES[key % len(_EVENT_TYPES)]
    return (
        key,
        ts,
        etype,
        f"user{key % 16}",
        f"synthetic {etype} event {key}",
    )


def _generate_page(start_key: int, end_key: int) -> Iterator[tuple]:
    for k in range(start_key, end_key):
        yield _generate_event(k)


class VCenterPollDataSource(DataSource):
    """spark.readStream.format("vcenter_poll") source.

    Options:
      page_size   events per poll / micro-batch (default 50)
      start_key   first event key (default 0; reference seeds from the
                  first observed vSphere Key, main.go:113-125)
      max_key     upstream end (generator cap) — the synthetic
                  upstream stops producing here; a live API has none
    """

    @classmethod
    def name(cls) -> str:
        return "vcenter_poll"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return PollStreamReader(self.options)


class PollStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.start_key = int(options.get("start_key", 0))
        self.max_key = int(options.get("max_key", 2**62))

    def initialOffset(self) -> dict:
        return {"key": self.start_key}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        """One poll: up to page_size events from the cursor.

        Must return an iterator over a *materialized* list: Spark's
        prefetch cache calls ``copy.copy`` on it (a generator is
        neither copyable nor picklable; a list_iterator is both).
        """
        lo = int(start["key"])
        hi = min(lo + self.page_size, self.max_key)
        if hi <= lo:
            return iter([]), start
        return iter(list(_generate_page(lo, hi))), {"key": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay for restart recovery."""
        return iter(list(_generate_page(int(start["key"]), int(end["key"]))))


def register(spark) -> None:
    spark.dataSource.register(VCenterPollDataSource)


def read_poll_stream(
    spark,
    page_size: int = DEFAULT_PAGE_SIZE,
    start_key: int = 0,
    max_key: int | None = None,
):
    register(spark)
    reader = (
        spark.readStream.format("vcenter_poll")
        .option("page_size", page_size)
        .option("start_key", start_key)
    )
    if max_key is not None:
        reader = reader.option("max_key", max_key)
    return reader.load()
