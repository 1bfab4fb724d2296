#!/usr/bin/env python
"""Same-session A/B: the paced 50 fps frame soak through the FILE-SPOOL
front door (bench_streaming's production path) vs the KAFKA-WIRE native
source (kafka/spark_source.py), at the 8x500 shape.

Motivation (VERDICT r7 latency floor): the measured cycle decomposition
attributes ~0.21-0.23 s of every micro-batch to file-source directory
listing.  The kafka-wire source's admission control is one ListOffsets
wire call (~ms) instead of a directory list, so the trigger overhead
term could shrink — but the wire path ADDS dev2 decode that the file
tapes pre-pay (FUSED into the source task since r11, valueDecode=dev2 —
no separate mapInArrow stage), and Python-source planning has its own
per-batch cost.  This tool measures the swap honestly: same
SparkSession, same FSM + sink, same pacing, ABBA-interleaved with both
doors warmed first (the repo's same-session variance rule).

Usage: python tools/ab_kafka_stream.py [--frames 1000]
Writes tools/AB_KAFKA_STREAM_RESULT.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_streaming as BS  # noqa: E402



def _encode_tape(n_total: int, n_dig: int) -> list[list[bytes]]:
    """Pre-encode every frame's dev2 messages (mirrors _frame_table's
    deterministic payloads) so the producer thread only moves bytes —
    FlatBuffers encoding must not eat the 20 ms frame budget."""
    from supermusr_data_pipeline_spark.sources import messages as M

    tape = []
    ch = [int(e % 8) for e in range(BS.EVENTS_PER_MESSAGE)]
    et = [int(e * 37 % 20_000_000) for e in range(BS.EVENTS_PER_MESSAGE)]
    for i in range(n_total):
        ts_ns = (BS._BASE_TS_US + i * int(BS.FRAME_PERIOD_S * 1_000_000)) * 1000
        md = {
            "ts_ns": ts_ns,
            "period_number": i // 1000,
            "protons_per_pulse": 4,
            "running": True,
            "frame_number": i,
            "veto_flags": 1 << (i % 4),
        }
        ev = [int((e * 7 + i) % 4096) for e in range(BS.EVENTS_PER_MESSAGE)]
        tape.append(
            [M.encode_dev2(d, md, et, ev, ch) for d in range(n_dig)]
        )
    return tape


def _run_kafka(spark, base: str, n_frames: int, n_dig: int, tag: str = "",
               door: str = "fsm", cycle_out: list | None = None) -> dict:
    from supermusr_data_pipeline_spark.kafka import MiniBroker, MiniProducer
    from supermusr_data_pipeline_spark.kafka.spark_source import KafkaWireDataSource
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )
    from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
        assemble_frames_stream,
    )
    from supermusr_data_pipeline_spark.streaming.nexus_direct import DirectNexusWriter
    from supermusr_data_pipeline_spark.streaming.nexus_stream import NexusStreamWriter

    spark.dataSource.register(KafkaWireDataSource)
    n_total = BS.N_WARMUP + n_frames
    tape = _encode_tape(n_total, n_dig)
    emit: dict[int, float] = {}
    lock = threading.Lock()

    def on_commit(frames):
        t = time.perf_counter()
        with lock:
            for f in frames:
                emit.setdefault(f, t)

    with MiniBroker() as broker:
        broker.create_topic("daq-events", partitions=4)
        opts = kafka_source_options(
            broker.bootstrap, ["daq-events"], starting_offsets="earliest",
        )
        # FUSED decode (valueDecode=dev2): the source task emits message
        # columns directly, so the raw payload bytes never round-trip
        # JVM -> Python a second time for a mapInArrow stage (r11; the
        # two-stage form is pinned row-identical by
        # test_kafka_spark_source.py)
        messages = (
            spark.readStream.format("kafka-wire").options(**opts)
            .option("valueDecode", "dev2").load()
        )
        if door == "direct":
            # the production sink: frame assembly fused into foreachBatch
            writer = DirectNexusWriter(
                BS._runs_df(spark, n_total),
                os.path.join(base, f"sink_kafka{tag}"),
                list(range(n_dig)), frame_ttl_ms=500, on_commit=on_commit,
            )
            to_sink = messages
        else:
            writer = NexusStreamWriter(
                BS._runs_df(spark, n_total),
                os.path.join(base, f"sink_kafka{tag}"),
                on_commit=on_commit,
            )
            to_sink = assemble_frames_stream(
                messages, list(range(n_dig)), frame_ttl_ms=500
            )
        phase_log: list = []
        writer.phase_log = phase_log
        q = (
            to_sink.writeStream.foreachBatch(writer)
            .option("checkpointLocation", os.path.join(base, f"ckpt_kafka{tag}"))
            .trigger(processingTime="0 seconds")
            .start()
        )

        prod = MiniProducer(broker.bootstrap, buffer_max=n_dig)
        # warm-up gulp (excluded from metrics, like the file soak)
        for i in range(BS.N_WARMUP):
            for d, payload in enumerate(tape[i]):
                prod.send("daq-events", payload, key=str(d).encode())
            prod.flush()
        deadline = time.time() + 120
        while time.time() < deadline:
            with lock:
                if len(emit) >= BS.N_WARMUP:
                    break
            time.sleep(0.05)

        arrival: dict[int, float] = {}

        def feeder():
            t0 = time.perf_counter()
            for i in range(BS.N_WARMUP, n_total):
                for d, payload in enumerate(tape[i]):
                    prod.send("daq-events", payload, key=str(d).encode())
                prod.flush()
                arrival[i] = time.perf_counter()
                lag = (
                    t0 + (i - BS.N_WARMUP + 1) * BS.FRAME_PERIOD_S
                    - time.perf_counter()
                )
                if lag > 0:
                    time.sleep(lag)

        th = threading.Thread(target=feeder, daemon=True)
        th.start()
        deadline = time.time() + n_frames * BS.FRAME_PERIOD_S + 120
        while time.time() < deadline:
            with lock:
                if len(emit) >= n_total:
                    break
            time.sleep(0.05)
        th.join(timeout=10)
        if cycle_out is not None:
            # same engine-durations + sink-phase-timers table the file
            # arm records (_cycle_decomposition) so the wire-vs-file gap
            # is attributable per cycle bucket, not just end-to-end
            cycle_out.append(BS._cycle_decomposition(q, phase_log))
        q.stop()
        prod.close()

    measured = sorted(i for i in range(BS.N_WARMUP, n_total) if i in emit)
    lats = {i: emit[i] - arrival[i] for i in measured}
    lat = sorted(lats.values())
    n_done = len(lat)
    t0 = arrival[measured[0]] if measured else 0.0
    slope = BS._slope(
        [arrival[i] - t0 for i in measured], [lats[i] for i in measured]
    )
    second = sorted(
        lats[i] for i in measured if i >= BS.N_WARMUP + (n_total - BS.N_WARMUP) // 2
    )
    return {
        "frames_done": n_done,
        "keeps_up_at_50fps": bool(n_done == n_frames and slope <= BS.SLOPE_GATE_S_PER_S),
        "latency_slope_s_per_s": round(slope, 5),
        "latency_p50_s": round(lat[n_done // 2], 4) if n_done else None,
        "latency_p95_s": round(lat[int(n_done * 0.95)], 4) if n_done else None,
        "steady_p50_s": round(second[len(second) // 2], 4) if second else None,
        "steady_p95_s": round(second[int(len(second) * 0.95)], 4) if second else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--digitisers", type=int, default=8)
    ap.add_argument("--door", choices=["fsm", "direct"], default="fsm",
                    help="sink door for BOTH arms (fsm keeps round-to-round "
                         "continuity; direct is the production sink)")
    args = ap.parse_args()

    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-ab-kafka-stream")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in BS._STREAM_CONF.items():
        spark.conf.set(k, v)

    base = tempfile.mkdtemp(prefix="ab_kafka_stream_")
    # ABBA arms (file, kafka, kafka, file) with cache/GC hygiene between
    # soaks: the r10 interleave (ABAB) equalized which arm pays start-up,
    # but a LINEAR position drift (session heap debt, slow VM phases that
    # build over minutes) still lands 1+3 vs 2+4 — ABBA gives both arms
    # the same position sum, cancelling linear drift exactly.  Per-arm
    # numbers are pooled medians of the rounds.
    n_dig = args.digitisers
    half = max(200, args.frames // 2)
    keys = (
        "frames_done", "keeps_up_at_50fps", "latency_slope_s_per_s",
        "latency_p50_s", "latency_p95_s", "steady_p50_s", "steady_p95_s",
    )

    def _hygiene():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(5)

    # throwaway warm-in soaks, ONE PER DOOR (codegen/python-worker
    # start-up must not land on either measured arm — the r10
    # direct-door A/B showed a cold first round reading 3x its warmed
    # latency, and the r11 fused-source A/B showed the same for the
    # wire door's Python-DataSource path when only the file door was
    # warmed)
    BS._run_shape(
        spark, base, n_dig, 300, paced_only=True, label_suffix="_warm",
        fsm="direct" if args.door == "direct" else "apply",
    )
    _hygiene()
    _run_kafka(spark, base, 300, n_dig, tag="_warm", door=args.door)
    _hygiene()

    rounds = []
    file_cycle = None
    kafka_cycles: list = []
    for rnd, arm in enumerate(("file", "kafka", "kafka", "file")):
        if arm == "file":
            f = BS._run_shape(
                spark, base, n_dig, half, paced_only=True,
                label_suffix=f"_ab{rnd}",
                fsm="direct" if args.door == "direct" else "apply",
            )
            file_cycle = f.get("cycle_decomposition") or file_cycle
            rounds.append(("file", {k: f["paced"][k] for k in keys}))
        else:
            k = _run_kafka(
                spark, base, half, n_dig, tag=f"_ab{rnd}", door=args.door,
                cycle_out=kafka_cycles,
            )
            rounds.append(("kafka", k))
        if rnd < 3:
            _hygiene()

    def pooled(arm: str) -> dict:
        arm_rounds = [r for a, r in rounds if a == arm]
        out = {}
        for key in keys:
            vals = sorted(
                r[key] for r in arm_rounds if r.get(key) is not None
            )
            if not vals:
                out[key] = None
            elif len(vals) % 2:
                out[key] = vals[len(vals) // 2]
            else:
                # true median for even round counts (upper-middle alone
                # biased the pooled number toward the worse round)
                mid = len(vals) // 2
                out[key] = round((vals[mid - 1] + vals[mid]) / 2, 5)
        out["keeps_up_at_50fps"] = all(
            r["keeps_up_at_50fps"] for r in arm_rounds
        )
        out["rounds"] = arm_rounds
        return out

    payload = {
        "door": args.door,
        "shape": f"{n_dig}x{BS.EVENTS_PER_MESSAGE}",
        "frames": args.frames,
        "frames_per_round": half,
        "interleave": "ABBA",
        "file_source": pooled("file"),
        "kafka_wire_source": pooled("kafka"),
        "file_cycle_decomposition": file_cycle,
        "kafka_cycle_decomposition": kafka_cycles[-1] if kafka_cycles else None,
    }
    suffix = "" if args.door == "fsm" else f"_{args.door}"
    out_name = (f"AB_KAFKA_STREAM_RESULT{suffix}.json" if n_dig == 8
                else f"AB_KAFKA_STREAM_RESULT_{n_dig}dig{suffix}.json")
    with open(os.path.join(REPO, "tools", out_name), "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
