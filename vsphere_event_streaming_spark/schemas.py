"""Engine schemas (SURVEY.md §1.2, FIXTURES.md §C).

The reference's wire format is implicit (Go structs → JSON,
/root/reference/cmd/server/main.go:134); the engine declares it as
fixed StructTypes: a CloudEvents v1.0 envelope + a typed BaseEvent
``data`` struct, with per-type extras kept as a JSON string column
(schema-on-read via ``from_json``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Nullable managed-entity reference (reference README.md:66-72).
ENTITY_REF = StructType(
    [
        StructField("name", StringType()),
        StructField("moref", StringType()),
    ]
)

#: vSphere BaseEvent payload (reference README.md:54-81, main.go:113).
VSPHERE_EVENT = StructType(
    [
        StructField("Key", IntegerType(), False),
        StructField("ChainId", IntegerType()),
        StructField("CreatedTime", TimestampType()),
        StructField("UserName", StringType()),
        StructField("Datacenter", ENTITY_REF),
        StructField("ComputeResource", ENTITY_REF),
        StructField("Host", ENTITY_REF),
        StructField("Vm", ENTITY_REF),
        StructField("Ds", ENTITY_REF),
        StructField("Net", ENTITY_REF),
        StructField("Dvs", ENTITY_REF),
        StructField("FullFormattedMessage", StringType()),
        StructField("ChangeTag", StringType()),
        StructField("IpAddress", StringType()),
        StructField("UserAgent", StringType()),
        StructField("Locale", StringType()),
        StructField("SessionId", StringType()),
    ]
)

#: CloudEvents v1.0 envelope (reference README.md:54-81).
CLOUDEVENT = StructType(
    [
        StructField("specversion", StringType(), False),
        StructField("id", StringType(), False),
        StructField("source", StringType(), False),
        StructField("type", StringType(), False),
        StructField("datacontenttype", StringType()),
        StructField("time", TimestampType()),
        StructField("eventclass", StringType()),
        StructField("data", VSPHERE_EVENT),
    ]
)

#: Offset-addressed log record (reference server.go:177,227: memlog.Record).
LOG_RECORD = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("value", StringType(), False),
    ]
)

#: Driver synthetic `events` stand-in stream (TESTDATA.md / FIXTURES.md §B).
SYNTH_EVENT = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: Multimodal column: opaque payload + typed metadata (SURVEY §2.11 L5).
MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),  # png|jpeg|wav|mp4|...
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_RECORD = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

#: Embedding row (TESTDATA embeddings table).
EMBEDDING = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType()),
    ]
)
