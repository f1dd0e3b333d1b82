"""Event-time window queries (SURVEY §2.9 T6, batch-checkable analogs).

``window()`` / ``session_window`` in a batch groupBy compute exactly
what the streaming aggregation computes per watermark-complete window
— the same operators run under ``readStream`` in
``streaming/windows.py``; here they run on the batch events table so
the DuckDB oracle can replay them (epoch-bucket arithmetic: Spark
windows align to the 1970 epoch).

Window bounds are emitted as epoch microseconds (bigint) — engine-
neutral, no timestamp-timezone comparison hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import tune
from ..tables import load

_HOUR_US = 3_600_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load(spark, sf_dir, "events")


# -- T6a: tumbling window aggregate ------------------------------------
@query(
    "q_tumbling_agg",
    oracle=f"""
    SELECT CAST(floor(epoch_us(ts) / {6 * _HOUR_US}.0) AS BIGINT)
             * {6 * _HOUR_US} AS window_start_us,
           count(*) AS n,
           count(DISTINCT user_id) AS users
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1
    """,
)
def q_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n",
            "users",
        )
    )


# -- T6b: sliding window aggregate -------------------------------------
@query(
    "q_sliding_agg",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(epoch_us(ts) / {6 * _HOUR_US}.0) AS BIGINT)
               * {6 * _HOUR_US} AS b0, *
      FROM events WHERE ts IS NOT NULL
    ),
    x AS (
      SELECT unnest([b0, b0 - {6 * _HOUR_US}]) AS window_start_us, event_id
      FROM b
    )
    SELECT window_start_us, count(*) AS n
    FROM x GROUP BY window_start_us
    """,
)
def q_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding every 6h — each event lands in 2 windows;
    the oracle replays the window assignment with epoch arithmetic."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"), "n"
        )
    )


# -- T6c: session windows (gaps-and-islands) ---------------------------
@query(
    "q_session_window",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
               AS prev_us
      FROM events WHERE ts IS NOT NULL
    ),
    marked AS (
      SELECT *, CASE WHEN prev_us IS NULL
                      OR us - prev_us > {_HOUR_US} THEN 1 ELSE 0 END
                  AS new_session
      FROM o
    ),
    islands AS (
      SELECT *, sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(us) AS session_start_us,
           max(us) + {_HOUR_US} AS session_end_us,
           count(*) AS n
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=1h) per user — Spark's session end is
    last-event + gap; the oracle is the classic gaps-and-islands
    formulation of the same semantics."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n",
        )
    )
