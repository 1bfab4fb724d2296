#!/usr/bin/env python
"""Streaming envelope benchmark: the reference's real-time bar is a
SUSTAINED 50 frames/s (simulator `--frame-time 20`,
simulator/src/main.rs:132-135) with trace->frame latency bounded by the
aggregator's 500 ms completeness TTL / <=1 s dispatch budget
(digitiser-aggregator/src/main.rs:110-118).  This harness replays a
synthetic dev2 tape through the FULL streaming topology —
assemble_frames_stream (applyInPandasWithState frame FSM) feeding the
NexusStreamWriter sink inside one query — and measures both numbers:

- **paced run**: a feeder thread lands one message file per frame every
  20 ms (the real arrival cadence); per-frame latency = wall-clock from
  the frame's LAST message landing to the frame being fully committed by
  the sink batch that carried it.  Sustained fps = frames / (last commit
  - first arrival).
- **unpaced run**: the whole tape at once under availableNow — the
  topology's maximum micro-batch throughput, the headroom number.

Shape: scaled from the reference's full instrument (32 digitisers x 500
events/frame-message).  The default here is 8 digitisers x 500 events at
50 fps for 300 frames (6 s of beam) — the per-frame event volume per
digitiser is reference-exact; the digitiser fan-in is scaled 4x down and
stated in the output JSON so the envelope claim is honest.

Standalone: `python bench_streaming.py` prints one JSON line.
bench.py embeds the same dict under its "streaming" key.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

FRAME_RATE_HZ = 50
FRAME_PERIOD_S = 1.0 / FRAME_RATE_HZ
N_DIGITISERS = 8
EVENTS_PER_MESSAGE = 500  # reference simulator default --events 500
N_FRAMES = 600            # 12 s of beam at 50 Hz — long enough that the
#                           ~3 s micro-batch cycle reaches steady state
LATENCY_BUDGET_S = 1.0    # aggregator dispatch budget (BASELINE.md)

_BASE_TS_US = int(
    datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000
)

_ARROW_SCHEMA = pa.schema(
    [
        ("digitizer_id", pa.int32()),
        ("ts", pa.timestamp("us")),
        ("period_number", pa.int64()),
        ("protons_per_pulse", pa.int32()),
        ("running", pa.bool_()),
        ("frame_number", pa.int64()),
        ("veto_flags", pa.int32()),
        ("channel", pa.list_(pa.int32())),
        ("event_time", pa.list_(pa.int64())),
        ("event_voltage", pa.list_(pa.float64())),
    ]
)


def _frame_table(i: int) -> pa.Table:
    """One frame's worth of dev2 messages (one row per digitiser), built
    with deterministic event payloads — no RNG, so re-runs are identical."""
    ts = _BASE_TS_US + i * int(FRAME_PERIOD_S * 1_000_000)
    ch = [int(e % 8) for e in range(EVENTS_PER_MESSAGE)]
    et = [int(e * 37 % 20_000_000) for e in range(EVENTS_PER_MESSAGE)]
    ev = [float((e * 7 + i) % 4096) for e in range(EVENTS_PER_MESSAGE)]
    cols = {
        "digitizer_id": list(range(N_DIGITISERS)),
        "ts": [ts] * N_DIGITISERS,
        "period_number": [i // 1000] * N_DIGITISERS,
        "protons_per_pulse": [4] * N_DIGITISERS,
        "running": [True] * N_DIGITISERS,
        "frame_number": [i] * N_DIGITISERS,
        "veto_flags": [1 << (i % 4)] * N_DIGITISERS,
        "channel": [ch] * N_DIGITISERS,
        "event_time": [et] * N_DIGITISERS,
        "event_voltage": [ev] * N_DIGITISERS,
    }
    arrays = [
        pa.array(cols[f.name], type=f.type) if f.name != "ts"
        else pa.array(cols["ts"], type=pa.timestamp("us"))
        for f in _ARROW_SCHEMA
    ]
    return pa.Table.from_arrays(arrays, schema=_ARROW_SCHEMA)


def _write_atomic(tbl: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # the stream never sees a partial file


def _runs_df(spark: SparkSession):
    from pyspark.sql import functions as F

    end_us = _BASE_TS_US + (N_FRAMES + 100) * int(FRAME_PERIOD_S * 1_000_000)
    return spark.createDataFrame(
        [("bench_run", _BASE_TS_US - 1_000_000, end_us)],
        "run_name string, from_us long, until_us long",
    ).select(
        "run_name",
        F.timestamp_micros("from_us").alias("collect_from"),
        F.timestamp_micros("until_us").alias("collect_until"),
    )


def _start_query(spark, spool: str, sink: str, ckpt: str, on_frames, trigger: dict):
    """One streaming query: files -> frame FSM -> nexus sink; on_frames is
    called with (list[frame_number], commit_wallclock) per micro-batch via
    the writer's on_commit hook — frame observation rides the sink's own
    totals collect, so the batch runs exactly the production job count."""
    from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
        DIGITISER_MESSAGE_SCHEMA,
        assemble_frames_stream,
    )
    from supermusr_data_pipeline_spark.streaming.nexus_stream import NexusStreamWriter

    writer = NexusStreamWriter(
        _runs_df(spark), sink,
        on_commit=lambda frames: on_frames(frames, time.perf_counter()),
    )

    messages = spark.readStream.schema(DIGITISER_MESSAGE_SCHEMA).parquet(spool)
    frames = assemble_frames_stream(
        messages, list(range(N_DIGITISERS)), frame_ttl_ms=500
    )
    return (
        frames.writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(**trigger)
        .start()
    )


# conf pinned for the streaming queries: no-data micro-batches exist to
# fire processing-time timers, but with availableNow they keep the query
# alive indefinitely (and cost ~0.7 s each on this topology) — the bench
# tape completes every frame, so timers never matter; AQE re-plans every
# 500 ms micro-batch for no benefit at this size; 8 state partitions
# bound the per-batch Python-worker fan-out (32 keys in flight max).
_STREAM_CONF = {
    "spark.sql.streaming.noDataMicroBatches.enabled": "false",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
}

N_WARMUP = 32  # pre-roll frames excluded from the measured window


def run(spark: SparkSession, workdir: str | None = None) -> dict:
    base = workdir or tempfile.mkdtemp(prefix="supermusr_stream_bench_")
    n_total = N_WARMUP + N_FRAMES
    tables = [_frame_table(i) for i in range(n_total)]
    prior = {k: spark.conf.get(k, None) for k in _STREAM_CONF}
    for k, v in _STREAM_CONF.items():
        spark.conf.set(k, v)
    try:
        out = _run_measured(spark, base, tables)
    finally:
        for k, v in prior.items():
            if v is not None:
                spark.conf.set(k, v)
        if workdir is None:
            shutil.rmtree(base, ignore_errors=True)
    return out


def _run_measured(spark: SparkSession, base: str, tables) -> dict:
    n_total = len(tables)

    # ---- paced run: real 50 fps arrival cadence, latency + sustained fps.
    # The first N_WARMUP frames land in one gulp and are excluded from the
    # metrics: they pay the one-time stream start-up (Python workers, state
    # store, codegen) that a SUSTAINED envelope claim rightly amortizes.
    spool_p = os.path.join(base, "spool_paced")
    os.makedirs(spool_p, exist_ok=True)
    emit: dict[int, float] = {}
    emit_lock = threading.Lock()

    def on_frames(frames, t):
        with emit_lock:
            for f in frames:
                emit.setdefault(f, t)

    # ASAP trigger: batches run back-to-back, so the full batch budget goes
    # to processing instead of waiting out a timer — lowest queueing delay
    # the micro-batch model offers at this load
    q = _start_query(
        spark, spool_p, os.path.join(base, "sink_paced"),
        os.path.join(base, "ckpt_paced"), on_frames,
        {"processingTime": "0 seconds"},
    )

    for i in range(N_WARMUP):
        _write_atomic(tables[i], os.path.join(spool_p, f"frame_{i:05d}.parquet"))
    deadline = time.time() + 120
    while time.time() < deadline:
        with emit_lock:
            if len(emit) >= N_WARMUP:
                break
        time.sleep(0.05)

    arrival: dict[int, float] = {}

    def feeder():
        t0 = time.perf_counter()
        for i in range(N_WARMUP, n_total):
            _write_atomic(tables[i], os.path.join(spool_p, f"frame_{i:05d}.parquet"))
            arrival[i] = time.perf_counter()
            lag = t0 + (i - N_WARMUP + 1) * FRAME_PERIOD_S - time.perf_counter()
            if lag > 0:
                time.sleep(lag)

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    deadline = time.time() + 180
    while time.time() < deadline:
        with emit_lock:
            if len(emit) >= n_total:
                break
        time.sleep(0.05)
    th.join(timeout=10)
    q.stop()

    measured = [i for i in range(N_WARMUP, n_total) if i in emit]
    lat = sorted(emit[i] - arrival[i] for i in measured)
    n_done = len(lat)
    sustained = (
        n_done / (max(emit[i] for i in measured) - arrival[N_WARMUP])
        if n_done else 0.0
    )
    # keeps-up test: if the pipeline sustains the offered 50 fps, the
    # commit-latency backlog is BOUNDED — the second half of the tape must
    # not be slower than the first (a pipeline below 50 fps shows latency
    # growing linearly with tape position instead)
    half = N_WARMUP + (n_total - N_WARMUP) // 2
    first = sorted(emit[i] - arrival[i] for i in measured if i < half)
    second = sorted(emit[i] - arrival[i] for i in measured if i >= half)
    keeps_up = bool(
        n_done == n_total - N_WARMUP
        and first
        and second
        and second[len(second) // 2] <= first[len(first) // 2] + 0.25
    )

    # ---- unpaced run: whole tape under availableNow = max throughput
    # (one spare file-listing gives the FSM everything at once; start-up is
    # excluded by timing from query start, warm-up already paid above)
    spool_u = os.path.join(base, "spool_unpaced")
    os.makedirs(spool_u, exist_ok=True)
    for i, tbl in enumerate(tables):
        _write_atomic(tbl, os.path.join(spool_u, f"frame_{i:05d}.parquet"))
    done: list[int] = []
    t0 = time.perf_counter()
    q2 = _start_query(
        spark, spool_u, os.path.join(base, "sink_unpaced"),
        os.path.join(base, "ckpt_unpaced"),
        lambda frames, t: done.extend(frames),
        {"availableNow": True},
    )
    q2.awaitTermination(300)
    elapsed = time.perf_counter() - t0

    return {
        "shape": {
            "n_digitisers": N_DIGITISERS,
            "events_per_message": EVENTS_PER_MESSAGE,
            "reference_digitisers": 32,
            "n_frames": N_FRAMES,
            "n_warmup": N_WARMUP,
            "offered_rate_hz": FRAME_RATE_HZ,
        },
        "paced": {
            "frames_done": n_done,
            "keeps_up_at_50fps": keeps_up,
            "whole_window_fps": round(sustained, 2),
            "latency_p50_s": round(lat[n_done // 2], 4) if n_done else None,
            "latency_p95_s": round(lat[int(n_done * 0.95)], 4) if n_done else None,
            "latency_first_half_p50_s": round(first[len(first) // 2], 4) if first else None,
            "latency_second_half_p50_s": round(second[len(second) // 2], 4) if second else None,
        },
        "unpaced": {
            "frames_done": len(done),
            "max_fps": round(len(done) / elapsed, 2) if elapsed > 0 else None,
        },
        "envelope": {
            "target_fps": FRAME_RATE_HZ,
            "latency_budget_s": LATENCY_BUDGET_S,
            # sustained >= 50 fps: every offered frame lands AND the
            # commit-latency backlog is bounded at the offered rate
            "meets_fps": keeps_up,
            "meets_latency": bool(lat) and lat[int(n_done * 0.95)] <= LATENCY_BUDGET_S,
            "note": (
                "commit latency is micro-batch-granular (~3 s cycles: "
                "stateful FSM + nexus append per batch); the reference "
                "dispatches per message, so its 1 s budget is met only at "
                "frame-TTL semantics (event-time), not at sink-commit "
                "granularity"
            ),
        },
    }


def main() -> None:
    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"metric": "streaming_envelope", **run(spark)}))
    spark.stop()


if __name__ == "__main__":
    main()
