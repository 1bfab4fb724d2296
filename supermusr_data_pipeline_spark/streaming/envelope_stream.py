"""S1/S2: the Kafka envelope as a streaming boundary.

In production the pipeline's front/back doors are Kafka
(``common/src/lib.rs:72-94`` consumer factory; buffered producer
``trace-to-events/src/main.rs:366-431``).  Spark's Kafka source/sink already
speak the envelope shape this module standardizes — ``(key binary, value
binary, topic string)`` — so every operator here works identically on:

- ``spark.readStream.format("kafka")`` with :func:`kafka_source_options`
  (production; broker not available in this environment), and
- a file/memory stream of the same columns (tests), rate-limited with
  ``maxFilesPerTrigger`` — the file-source analog of the Kafka source's
  ``maxOffsetsPerTrigger`` backpressure bound (≙ the reference's bounded
  1024-message producer buffer, trace-to-events/src/main.rs:81-84).

Graceful drain (T8): for stateless stages, ``trigger(availableNow=True)``
processes everything pending and stops — the analog of SIGINT → drain → exit
(digitiser-aggregator/src/main.rs:463-495).  For PROCESSING-TIME-stateful
stages (frame assembly), availableNow keeps scheduling state-cleanup batches
even after the state empties (observed on Spark 4.1; the timeout fires and
the state is removed, but the trigger never quiesces) — drain those with a
``processingTime`` trigger + ``query.stop()`` once the sink is quiescent;
checkpointing makes redelivery idempotent after a crash mid-drain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kafka.auth import build_jaas
from ..sources import messages as M

ENVELOPE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("topic", T.StringType(), False),
    ]
)


def kafka_source_options(
    brokers: str,
    topics: list[str],
    max_offsets_per_trigger: int | None = 10_000,
    starting_offsets: str = "latest",
    starting_timestamp_ms: int | None = None,
    username: str | None = None,
    password: str | None = None,
    group_id: str | None = None,
    ssl_ca_location: str | None = None,
    assign: dict[str, list[int]] | None = None,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")`` mirroring the
    reference consumer config (zstd transport, explicit group/topics —
    common/src/lib.rs:51-94).  ``maxOffsetsPerTrigger`` is the backpressure
    bound; ``starting_timestamp_ms`` emits ``startingTimestamp`` (the
    all-partitions time→offset lookup; ``startingOffsetsByTimestamp`` is
    the per-TopicPartition form and has no wildcard partition), replacing
    the reference's manual offset bisect (O3, trace-viewer
    binary_by_timestamp.rs:20-72) with the source's built-in lookup.

    ``username``/``password`` (both or neither, exactly as the reference
    CLI enforces — common/src/lib.rs:40-49) emit the JVM source's SASL
    option names for the reference's mechanism (SCRAM-SHA-256 over
    sasl_plaintext, lib.rs:62-68).  The in-process wire broker honors
    them for real — SaslHandshake/SaslAuthenticate with SCRAM-SHA-256
    (kafka/auth.py); ``ssl_ca_location`` (librdkafka's ssl.ca.location,
    the reference's Rust client stack) upgrades the channel to TLS
    (SASL_SSL with credentials, SSL without)."""
    if (username is None) != (password is None):
        # the reference requires the pair (common/src/lib.rs:40-49)
        raise ValueError("username and password must be provided together")
    opts = {
        "kafka.bootstrap.servers": brokers,
        "kafka.compression.type": "zstd",
        "failOnDataLoss": "false",
    }
    if assign is not None:
        # the JVM source's explicit-partition subscription: one writer
        # instance per DISJOINT partition set shards a topic across
        # processes (topics is ignored in this form)
        import json as _json

        opts["assign"] = _json.dumps(
            {t: sorted(int(p) for p in ps) for t, ps in assign.items()}
        )
    else:
        opts["subscribe"] = ",".join(topics)
    if starting_timestamp_ms is not None:
        opts["startingTimestamp"] = str(starting_timestamp_ms)
    else:
        opts["startingOffsets"] = starting_offsets
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id is not None:
        # the JVM source's consumer-group override (the reference CLI's
        # --consumer-group, common/src/lib.rs:77); consumer_from_options
        # maps it to the GROUP-MANAGED GroupConsumer
        opts["kafka.group.id"] = group_id
    if username is not None:
        opts["kafka.security.protocol"] = (
            "SASL_SSL" if ssl_ca_location else "SASL_PLAINTEXT"
        )
        opts["kafka.sasl.mechanism"] = "SCRAM-SHA-256"
        # build_jaas escapes '"' and '\' so parse_jaas round-trips any
        # credential byte-identical (unescaped interpolation mis-parsed
        # passwords containing either character)
        opts["kafka.sasl.jaas.config"] = build_jaas(username, password)
    elif ssl_ca_location:
        opts["kafka.security.protocol"] = "SSL"
    if ssl_ca_location:
        opts["kafka.ssl.ca.location"] = ssl_ca_location
    return opts


def read_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Test-side envelope source: parquet files of ENVELOPE_STREAM_SCHEMA
    rows, optionally rate-limited per micro-batch."""
    reader = spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def encode_dev2_stream(messages: DataFrame, topic: str = "digitiser-events") -> DataFrame:
    """S2 produce path: DIGITISER_MESSAGE_SCHEMA rows → envelope rows, one
    dev2 payload per message (narrow mapInPandas; streaming-safe).  The
    result writes to Kafka with ``writeStream.format("kafka")`` or to any
    test sink unchanged; the key is the digitiser id (the reference keys
    messages by source digitiser)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                md = {
                    "ts_ns": int(pd.Timestamp(r.ts).value),
                    "period_number": int(r.period_number),
                    "protons_per_pulse": int(r.protons_per_pulse),
                    "running": bool(r.running),
                    "frame_number": int(r.frame_number),
                    "veto_flags": int(r.veto_flags),
                }
                buf = M.encode_dev2(
                    int(r.digitizer_id),
                    md,
                    [int(t) for t in r.event_time],
                    [int(round(float(v))) for v in r.event_voltage],
                    [int(c) for c in r.channel],
                )
                out.append(
                    {
                        "key": str(r.digitizer_id).encode(),
                        "value": buf,
                        "topic": topic,
                    }
                )
            yield pd.DataFrame(out, columns=["key", "value", "topic"])

    return messages.mapInPandas(proc, ENVELOPE_STREAM_SCHEMA)


def encode_aev2_stream(frames: DataFrame, topic: str = "frame-events") -> DataFrame:
    """S2 produce path for the aggregator output: FRAME_EVENT_LIST_SCHEMA
    rows (+ veto_flags) → aev2 envelope messages, one per assembled frame."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                md = {
                    "ts_ns": int(pd.Timestamp(r.ts).value),
                    "period_number": int(r.period_number),
                    "protons_per_pulse": int(r.protons_per_pulse),
                    "running": bool(r.running),
                    "frame_number": int(r.frame_number),
                    "veto_flags": int(r.veto_flags),
                }
                buf = M.encode_aev2(
                    md,
                    [int(t) for t in r.event_time],
                    [int(round(float(v))) for v in r.event_voltage],
                    [int(c) for c in r.channel],
                    bool(r.complete),
                    [int(d) for d in r.digitizers_present],
                )
                out.append(
                    {"key": str(r.frame_number).encode(), "value": buf, "topic": topic}
                )
            yield pd.DataFrame(out, columns=["key", "value", "topic"])

    return frames.mapInPandas(proc, ENVELOPE_STREAM_SCHEMA)
