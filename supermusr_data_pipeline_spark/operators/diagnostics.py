"""S8 + P8: message dump/pretty-print and decode failure counters.

S8 — the reference ships a Kafka tail that decodes and pretty-prints any
pipeline message (diagnostics/src/kafka_tail.rs:10-52, decode_and_print in
diagnostics/src/main.rs:79+).  ``dump_messages`` is the Spark analog: it
turns envelope rows into one readable summary row per message — pipe it to
``df.show(truncate=False)`` in batch or a ``console``-format sink in
streaming.

P8 — services count and skip invalid messages
(digitiser-aggregator/src/main.rs:331-352).  ``failure_counters`` classifies
every envelope row JVM-side (no Python in the hot path) and aggregates
per-(topic, outcome) counts; ``parse_failure_counters`` adds the
Python-parse outcome for payloads whose identifier is known but whose body
is corrupt.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import messages as M
from ..sources.decode import IDENTIFIERS, with_identifier

DUMP_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("identifier", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("summary", T.StringType()),
    ]
)


def _summarize(ident: str, d: dict) -> str:
    if ident == "dat2":
        chans = ", ".join(f"{c}[{len(v)}]" for c, v in d["channels"][:4])
        more = "…" if len(d["channels"]) > 4 else ""
        return (
            f"digitizer {d['digitizer_id']} frame {d['metadata']['frame_number']} "
            f"rate {d['sample_rate']} channels {chans}{more}"
        )
    if ident == "dev2":
        return (
            f"digitizer {d['digitizer_id']} frame {d['metadata']['frame_number']} "
            f"{len(d['time'])} events"
        )
    if ident == "aev2":
        dp = list(d["digitizers_present"]) if d["digitizers_present"] is not None else []
        return (
            f"frame {d['metadata']['frame_number']} complete={d['complete']} "
            f"digitisers {dp} {len(d['time'])} events"
        )
    if ident == "pl72":
        return f"RunStart '{d['run_name']}' at {d['start_time_ms']} ms file={d['filename']}"
    if ident == "6s4t":
        return f"RunStop '{d['run_name']}' at {d['stop_time_ms']} ms"
    if ident == "f144":
        v = d["value"] if not d["value_type"].startswith("array") else list(d["value"][:8])
        return f"log {d['source_name']} = {v} ({d['value_type']}) @ {d['timestamp_ns']} ns"
    if ident == "se00":
        return (
            f"SE {d['name']} ch {d['channel']} {len(d['values'])} samples "
            f"({d['values_kind']}, {'explicit ts' if d['timestamps'] is not None else 'delta'})"
        )
    if ident == "al00":
        return f"alarm {d['source_name']} {d['severity']}: {d['message']}"
    if ident == "df12":
        return f"det-spec map, {d['n_spectra']} spectra"
    return "?"


def dump_messages(env: DataFrame) -> DataFrame:
    """Envelope rows → (topic, identifier, n_bytes, summary) — the S8
    decode-and-pretty-print surface.  Undecodable payloads are kept with a
    '<decode error…>' summary rather than dropped (a tail must show them)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.value)
                try:
                    ident, d = M.decode_any(buf)
                    summary = _summarize(ident, d)
                except Exception as exc:  # noqa: BLE001 — tail shows bad rows
                    ident = buf[4:8].decode("ascii", errors="replace") if len(buf) >= 8 else ""
                    summary = f"<decode error: {type(exc).__name__}: {exc}>"
                rows.append(
                    {
                        "topic": r.topic,
                        "identifier": ident,
                        "n_bytes": len(buf),
                        "summary": summary,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DUMP_SCHEMA.fields])

    return env.select("topic", "value").mapInPandas(proc, DUMP_SCHEMA)


def failure_counters(env: DataFrame) -> DataFrame:
    """P8: per-(topic, outcome) message counts, fully JVM-side.

    Outcomes: ``ok`` (known identifier), ``too_short`` (< 8 bytes — no room
    for root offset + identifier), ``unknown_identifier``.  Works unchanged
    on a streaming DataFrame (append a window for rate counters)."""
    classified = with_identifier(env).withColumn(
        "outcome",
        F.when(F.length("value") < 8, F.lit("too_short"))
        .when(~F.col("identifier").isin(*IDENTIFIERS), F.lit("unknown_identifier"))
        .otherwise(F.lit("ok")),
    )
    return classified.groupBy("topic", "outcome").agg(F.count("*").alias("n"))


def parse_failure_counters(env: DataFrame) -> DataFrame:
    """P8 (deep variant): also attempt the Python parse for known
    identifiers, so corrupt bodies are counted as ``parse_error``."""
    out_schema = T.StructType(
        [T.StructField("topic", T.StringType()), T.StructField("outcome", T.StringType())]
    )

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                buf = bytes(r.value)
                if len(buf) < 8:
                    outcome = "too_short"
                else:
                    ident = buf[4:8].decode("ascii", errors="replace")
                    if ident not in M.DECODERS:
                        outcome = "unknown_identifier"
                    else:
                        try:
                            M.DECODERS[ident](buf)
                            outcome = "ok"
                        except Exception:
                            outcome = "parse_error"
                rows.append({"topic": r.topic, "outcome": outcome})
            yield pd.DataFrame(rows, columns=["topic", "outcome"])

    return (
        env.select("topic", "value")
        .mapInPandas(proc, out_schema)
        .groupBy("topic", "outcome")
        .agg(F.count("*").alias("n"))
    )
