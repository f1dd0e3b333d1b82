"""CloudEvents envelope transform chain (P1-P3, S6).

The reference transforms each vSphere event into a CloudEvents v1.0
envelope with a derived ``eventclass`` extension and a
``vmware.vsphere.<GoType>.v0`` type string, then JSON-encodes it
(/root/reference/cmd/server/main.go:127-134; observed shape
README.md:54-81). Here the transform is a pure column expression chain
— whole-stage-codegen'd, no Python in the loop.

Applied to the driver's synthetic ``events`` table, where ``event_id``
plays the vSphere Key, ``ts`` plays CreatedTime, ``event_type`` plays
the Go type name and ``props`` the per-type dynamic payload
(FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPEC_VERSION = "1.0"
DEFAULT_SOURCE = "https://vcenter.example.com/sdk"
CONTENT_TYPE = "application/json"

#: Classification of the synthetic event types into the reference's
#: three event classes (main.go:127, README.md:80: the GetDetails
#: category event|eventex|extendedevent).
_EVENTEX_TYPES = ("error",)
_EXTENDED_TYPES = ("purchase", "signup")


def type_name(event_type: Column) -> Column:
    """``vmware.vsphere.<T>.v0`` (P2; reference README.md:58)."""
    return F.concat(F.lit("vmware.vsphere."), event_type, F.lit(".v0"))


def event_class(event_type: Column) -> Column:
    """eventclass ∈ {event, eventex, extendedevent} (P3; main.go:127)."""
    return (
        F.when(event_type.isin(*_EVENTEX_TYPES), F.lit("eventex"))
        .when(event_type.isin(*_EXTENDED_TYPES), F.lit("extendedevent"))
        .otherwise(F.lit("event"))
    )


def to_envelope(events: DataFrame, source: str = DEFAULT_SOURCE) -> DataFrame:
    """events table → flat CloudEvents envelope columns (P1).

    Flat (not nested-struct) so the result is directly comparable
    across engines; ``as_cloudevent_json`` nests + serializes.
    """
    return events.select(
        F.lit(SPEC_VERSION).alias("specversion"),
        F.col("event_id").cast("string").alias("id"),
        F.lit(source).alias("source"),
        type_name(F.col("event_type")).alias("type"),
        F.lit(CONTENT_TYPE).alias("datacontenttype"),
        F.col("ts").alias("time"),
        event_class(F.col("event_type")).alias("eventclass"),
        F.col("event_id").alias("data_key"),
        F.col("user_id").alias("data_user_id"),
        F.col("value").alias("data_value"),
        F.col("props").alias("data_props"),
    )


def as_cloudevent_json(events: DataFrame, source: str = DEFAULT_SOURCE) -> DataFrame:
    """Envelope → canonical JSON string per record (S6 serialize side).

    The reference stores the JSON bytes once and serves them verbatim
    (main.go:134 + server.go:294-295); the engine's sink keeps this
    ``value`` column for the same serialize-once rule.
    """
    env = to_envelope(events, source)
    payload = F.struct(
        F.col("data_key").alias("Key"),
        F.col("data_user_id").alias("user_id"),
        F.col("data_value").alias("value"),
        F.col("data_props").alias("props"),
    )
    return env.select(
        F.col("data_key").alias("offset"),
        F.to_json(
            F.struct(
                "specversion",
                "id",
                "source",
                "type",
                "datacontenttype",
                "time",
                "eventclass",
                payload.alias("data"),
            )
        ).alias("value"),
    )


def decode_envelope_json(records: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON record → typed envelope (S6 decode side, server.go:244-249)."""
    schema = (
        "specversion string, id string, source string, type string, "
        "datacontenttype string, time timestamp, eventclass string, "
        "data struct<Key: bigint, user_id: bigint, value: double, props: string>"
    )
    return records.withColumn("event", F.from_json(F.col(value_col), schema))
