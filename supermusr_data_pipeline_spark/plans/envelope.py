"""Envelope encode→dispatch→decode queries with DuckDB oracles (S3 + G7).

Each query derives deterministic FlatBuffers messages FROM the driver's
``events`` table, ships them through the binary Kafka-envelope shape
``(topic, value binary)``, decodes them back through the identifier-dispatch
layer (:mod:`..sources.decode`), and aggregates.  The DuckDB oracle computes
the same result directly from ``events.parquet`` — so a hash match proves
the wire codec (builder + parser + GpsTime packing) is value-exact, not just
runnable.

Scale: both encode and decode are narrow ``mapInPandas``/``applyInPandas``
stages (no shuffle beyond the grouping the message layout itself requires);
at 100 TB this is the same per-record streaming shape the reference services
use (consume → parse → produce, trace-to-events/src/main.rs:199-257).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import decode as D
from ..sources import messages as M
from ..sources.testdata import load_table
from .relational import ORACLES, QUERIES, _register

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("value", T.BinaryType()),
    ]
)

_SEVERITIES = ["OK", "MINOR", "MAJOR", "INVALID"]


# Base for the f144 integer-fidelity fixture: 2^53 + 1, the first integer a
# DOUBLE cannot represent — event_id offsets keep every fixture value above
# the float53 cliff, so the q37 hash only matches if value_int is EXACT.
_F144_LONG_BASE = 9_007_199_254_740_993


def encode_log_envelope(events: DataFrame) -> DataFrame:
    """events rows → f144/al00/se00 envelope messages, routed by
    ``event_id % 3`` (one message per row; narrow mapInPandas).  Half the
    f144 messages carry a LONG value above 2^53 (exercising the value_int
    sidecar), the other half a DOUBLE."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                ns = int(pd.Timestamp(r.ts).value)
                kind = r.event_id % 3
                if kind == 0:
                    if r.event_id % 2 == 0:
                        buf = M.encode_f144(
                            r.event_type, ns, _F144_LONG_BASE + int(r.event_id), "long"
                        )
                    else:
                        buf = M.encode_f144(r.event_type, ns, float(r.value), "double")
                    topic = "runlog"
                elif kind == 1:
                    buf = M.encode_al00(
                        r.event_type, ns, _SEVERITIES[r.user_id % 4], r.props
                    )
                    topic = "alarms"
                else:
                    ts_list = (
                        [ns, ns + 1000, ns + 2000] if r.event_id % 2 == 0 else None
                    )
                    buf = M.encode_se00(
                        r.event_type,
                        ns,
                        [float(r.value), float(r.value) * 2, float(r.value) * 3],
                        "f64",
                        channel=int(r.user_id % 8),
                        time_delta_ns=1000.0,
                        timestamps=ts_list,
                        message_counter=int(r.event_id),
                    )
                    topic = "selog"
                out.append({"topic": topic, "value": buf})
            yield pd.DataFrame(out, columns=["topic", "value"])

    return events.select("event_id", "ts", "user_id", "event_type", "value", "props").mapInPandas(
        proc, ENVELOPE_SCHEMA
    )


def encode_dev2_envelope(events: DataFrame) -> DataFrame:
    """events grouped by ``user_id`` → one dev2 message per group: the
    metadata timestamp is the group's min(ts), arrays are sorted by
    event_id.  Exercises GpsTime packing + SoA vector encode (G7)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        uid = int(pdf["user_id"].iloc[0])
        max_id = int(pdf["event_id"].max())
        if uid >= 2**32 or max_id >= 2**32:
            # the dev2 wire format carries u32 ids; a silent wrap here would
            # desync from any oracle computed on the unwrapped values
            raise ValueError(
                f"dev2 u32 overflow: user_id={uid} max event_id={max_id}"
            )
        ns = int(pd.Timestamp(pdf["ts"].min()).value)
        md = {
            "ts_ns": ns,
            "period_number": len(pdf),
            "protons_per_pulse": uid % 256,
            "running": True,
            "frame_number": uid,
            "veto_flags": uid % 16,
        }
        volts = np.clip(np.floor(pdf["value"].to_numpy() * 10), 0, 65535).astype(np.uint16)
        buf = M.encode_dev2(
            uid % 256,
            md,
            pdf["event_id"].to_numpy(np.uint32),
            volts,
            (pdf["event_id"].to_numpy(np.int64) % 8).astype(np.uint32),
        )
        return pd.DataFrame([{"topic": "digitiser-events", "value": buf}])

    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(build, ENVELOPE_SCHEMA)
    )


@_register(
    "q37_envelope_roundtrip",
    oracle="""
    WITH f AS (
        SELECT 'f144' AS kind, event_type AS source_name, count(*) AS n_msgs,
               round(sum(CASE WHEN event_id % 2 = 1 THEN value END), 4) AS checksum,
               CAST(sum(CASE WHEN event_id % 2 = 0
                        THEN (9007199254740993 + event_id) % 1000003 END)
                    AS BIGINT) AS extra_count,
               epoch_us(min(ts)) AS ts_min_us
        FROM events WHERE event_id % 3 = 0 GROUP BY event_type
    ), a AS (
        SELECT 'al00' AS kind,
               event_type || '/' || (CASE user_id % 4 WHEN 0 THEN 'OK' WHEN 1 THEN 'MINOR'
                                     WHEN 2 THEN 'MAJOR' ELSE 'INVALID' END) AS source_name,
               count(*) AS n_msgs,
               CAST(sum(length(props)) AS DOUBLE) AS checksum, 0 AS extra_count,
               epoch_us(min(ts)) AS ts_min_us
        FROM events WHERE event_id % 3 = 1 GROUP BY source_name
    ), s AS (
        SELECT 'se00' AS kind, event_type AS source_name, count(*) AS n_msgs,
               round(sum(value * 6), 4) AS checksum,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS extra_count,
               epoch_us(min(ts)) AS ts_min_us
        FROM events WHERE event_id % 3 = 2 GROUP BY event_type
    )
    SELECT * FROM f UNION ALL SELECT * FROM a UNION ALL SELECT * FROM s
    """,
)
def q37_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 end-to-end: encode f144/al00/se00 messages from events, dispatch
    by FlatBuffers identifier, decode, aggregate per source.  A hash match
    against the direct-SQL oracle proves the wire codec is value-exact
    (identifier routing mirrors nexus-writer/src/message_handlers.rs:38-120)."""
    env = encode_log_envelope(load_table(spark, sf_dir, "events"))
    streams = D.decode_stream(env)

    f144 = (
        streams["f144"]
        .groupBy(F.col("source_name"))
        .agg(
            F.count("*").alias("n_msgs"),
            F.round(
                F.sum(F.when(F.col("value_type") == "double", F.col("value"))), 4
            ).alias("checksum"),
            # modular checksum over the EXACT integer sidecar: off-by-one
            # double rounding of a >2^53 long flips the residue, so a hash
            # match proves bit-exact i64 fidelity end to end
            F.sum(F.col("value_int") % 1000003).alias("extra_count"),
            F.min("ts").alias("ts_min"),
        )
        .select(
            F.lit("f144").alias("kind"),
            "source_name",
            "n_msgs",
            "checksum",
            "extra_count",
            F.unix_micros("ts_min").alias("ts_min_us"),
        )
    )
    al00 = (
        streams["al00"]
        .groupBy(F.concat_ws("/", "source_name", "severity").alias("source_name"))
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum(F.length("message")).cast("double").alias("checksum"),
            F.min("ts").alias("ts_min"),
        )
        .select(
            F.lit("al00").alias("kind"),
            "source_name",
            "n_msgs",
            "checksum",
            F.lit(0).cast("int").alias("extra_count"),
            F.unix_micros("ts_min").alias("ts_min_us"),
        )
    )
    se00 = (
        streams["se00"]
        .groupBy(F.col("name").alias("source_name"))
        .agg(
            F.count("*").alias("n_msgs"),
            F.round(F.sum(F.aggregate("values", F.lit(0.0), lambda a, x: a + x)), 4).alias(
                "checksum"
            ),
            F.sum(F.when(F.col("timestamps").isNotNull(), 1).otherwise(0)).alias(
                "extra_count"
            ),
            F.min("packet_ts").alias("ts_min"),
        )
        .select(
            F.lit("se00").alias("kind"),
            "source_name",
            "n_msgs",
            "checksum",
            "extra_count",
            F.unix_micros("ts_min").alias("ts_min_us"),
        )
    )
    return f144.unionByName(al00).unionByName(se00)


@_register(
    "q38_dev2_roundtrip",
    oracle="""
    SELECT e.user_id % 256              AS digitizer_id,
           epoch_us(u.ts0)              AS frame_ts_us,
           u.n                          AS period_number,
           CAST(e.user_id % 256 AS INT) AS protons_per_pulse,
           CAST(e.user_id AS BIGINT)    AS frame_number,
           CAST(e.user_id % 16 AS INT)  AS veto_flags,
           CAST(e.event_id % 8 AS INT)  AS channel,
           e.event_id                   AS event_time,
           CAST(least(greatest(floor(e.value * 10), 0), 65535) AS INT) AS event_voltage
    FROM events e
    JOIN (SELECT user_id, min(ts) AS ts0, count(*) AS n FROM events GROUP BY user_id) u
      USING (user_id)
    """,
)
def q38_dev2_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7+S3 for the DAQ hot path: build one dev2 message per user group
    (GpsTime metadata + SoA u32/u16 vectors), decode back to long event
    rows.  Hash match proves GpsTime calendar packing and vector encode are
    exact at nanosecond/once-widened-integer fidelity."""
    env = encode_dev2_envelope(load_table(spark, sf_dir, "events"))
    dev2 = D.decode_dev2(env)
    return dev2.select(
        "digitizer_id",
        F.unix_micros("ts").alias("frame_ts_us"),
        "period_number",
        "protons_per_pulse",
        "frame_number",
        "veto_flags",
        "channel",
        "event_time",
        "event_voltage",
    )


__all__ = ["QUERIES", "ORACLES", "encode_log_envelope", "encode_dev2_envelope"]
