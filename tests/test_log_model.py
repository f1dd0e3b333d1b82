"""Log-model unit tests replicating the reference's own fixtures.

Mirrors /root/reference/cmd/server/server_test.go: ``createData(n)``
records whose payload is the stringified index, truncation goldens,
pagination goldens, boundary errors (FIXTURES.md §A).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vsphere_event_streaming_spark.errors import (
    FutureOffsetError,
    InvalidOffsetError,
    OutOfRangeError,
)
from vsphere_event_streaming_spark.log import (
    EventLogService,
    assign_offsets,
    get_start,
    last_page,
    log_range,
    point_lookup,
    retention_filter,
)


def create_data(spark, n: int, start: int = 0):
    """Reference createData: payload == stringified index (server_test.go:512-523)."""
    return spark.range(n).select(
        (F.col("id") + start).alias("offset"),
        F.col("id").cast("string").alias("value"),
    )


# -- pagination goldens (server_test.go:418-501) -----------------------
@pytest.mark.parametrize(
    "earliest,latest,page,expect",
    [
        (0, 10, 50, 0),
        (0, 100, 50, 51),
        (99, 100, 50, 99),
        (151, 304, 50, 255),
        (151, 304, 10, 295),
        (-1, -1, 50, -1),
    ],
)
def test_get_start_goldens(earliest, latest, page, expect):
    assert get_start(earliest, latest, page) == expect


def test_range(spark):
    df = create_data(spark, 20)
    row = log_range(df).first()
    assert (row["earliest"], row["latest"]) == (0, 19)


def test_range_empty(spark):
    df = create_data(spark, 0)
    row = log_range(df).first()
    assert row["earliest"] is None


# -- truncation golden: segment 5, 20 writes ⇒ {10,19} -----------------
def test_retention_truncation_golden(spark):
    df = create_data(spark, 20)
    kept = retention_filter(df, max_segment_size=5)
    row = log_range(kept).first()
    assert (row["earliest"], row["latest"]) == (10, 19)


def test_point_lookup_content(spark):
    df = create_data(spark, 15, start=10)
    # id 11 at start 10 holds content "1" (server_test.go:105-174)
    assert point_lookup(df, 11).first()["value"] == "1"


def test_last_page(spark):
    df = create_data(spark, 120)
    rows = last_page(df, 50).collect()
    assert [r["offset"] for r in rows] == list(range(70, 120))
    assert rows[0]["value"] == "70"


def test_assign_offsets_dense_and_seeded(spark):
    df = spark.range(100).select(
        F.col("id").alias("key"),
        (F.col("id") * 2).alias("ts_like"),
    )
    out = assign_offsets(
        df, order_by=["ts_like", "key"], seed_col="key"
    ).orderBy("offset")
    rows = out.collect()
    offs = [r["offset"] for r in rows]
    assert offs == list(range(0, 100))  # dense, seeded at min(key)=0
    assert [r["key"] for r in rows] == list(range(100))  # order preserved


def test_assign_offsets_explicit_start(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    out = assign_offsets(df, order_by=["k"], start=100)
    assert sorted(r["offset"] for r in out.collect()) == list(range(100, 110))


# -- service layer: HTTP semantics ------------------------------------
def test_service_boundaries(spark):
    svc = EventLogService(create_data(spark, 15, start=10))
    assert svc.range() == {"earliest": 10, "latest": 24}
    assert svc.get_event(11) == "1"
    with pytest.raises(FutureOffsetError):
        svc.get_event(25)
    with pytest.raises(OutOfRangeError):
        svc.get_event(3)
    with pytest.raises(InvalidOffsetError):
        svc.get_event("abc")


def test_service_offset_parse_is_atoi_strict(spark):
    """Go's strconv.Atoi rejects what Python's int() accepts: padded
    whitespace, underscores, unicode digits — all 400 in the
    reference (server.go:272-276), so all InvalidOffsetError here."""
    svc = EventLogService(create_data(spark, 15, start=10))
    for bad in (" 5 ", "1_0", "５", "+ 5", "", None, 5.0, True):
        with pytest.raises(InvalidOffsetError):
            svc.get_event(bad)
    assert svc.get_event("11") == "1"  # plain digits still parse
    with pytest.raises(OutOfRangeError):
        svc.get_event("-1")  # parses fine, then fails the range check
    with pytest.raises(InvalidOffsetError):
        svc.replay("abc")


def test_service_replay_minus_one_is_now_sentinel(spark):
    """offset=-1 ≡ absent → tail from latest+1 (server.go:149-166):
    the replay slice over a static log is empty, exactly like
    replay(None); any other negative offset is out of range."""
    svc = EventLogService(create_data(spark, 15, start=10))
    assert svc.replay(-1).count() == 0
    assert svc.replay(None).count() == 0
    with pytest.raises(OutOfRangeError):
        svc.replay(-2)


def test_service_empty_log(spark):
    svc = EventLogService(create_data(spark, 0))
    assert svc.range() is None  # HTTP 204
    with pytest.raises(FutureOffsetError):
        svc.get_event(3)  # read id 3 from empty log ⇒ future offset


def test_service_stream_purged_start_errors(spark):
    # stream from offset 0 on truncated log ⇒ 400 (server_test.go:350-359)
    log = retention_filter(create_data(spark, 20), max_segment_size=5)
    svc = EventLogService(log)
    with pytest.raises(OutOfRangeError):
        svc.replay(0)
    # but replay from a valid offset works: 10..14 slice golden
    vals = [r["value"] for r in svc.replay(10).limit(5).collect()]
    assert vals == ["10", "11", "12", "13", "14"]


def test_sql_surface_over_views(spark, sf_dir):
    """The engine surface is also plain SQL: register the star schema
    as views and answer the reference range query via spark.sql."""
    from vsphere_event_streaming_spark.tables import register_views

    register_views(spark, sf_dir)
    row = spark.sql(
        "SELECT min(event_id) AS earliest, max(event_id) AS latest FROM events"
    ).first()
    assert row["earliest"] == 0 and row["latest"] > 0
    joined = spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 3
        """
    ).collect()
    assert len(joined) == 3 and all(r["n"] > 0 for r in joined)


def test_service_page(spark):
    svc = EventLogService(create_data(spark, 120))
    vals = svc.get_events()
    assert vals == [str(i) for i in range(70, 120)]
    assert svc.page_start() == 70
