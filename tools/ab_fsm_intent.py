#!/usr/bin/env python
"""Same-session interleaved A/B for VERDICT r9 #1: the FSM fallback
door's 32x500 keep-up regression — is the write-ahead intent (commit
e1d5241, one ~KB json tmp+rename per batch) the cause, or VM variance?

Design: the FSM door (applyInPandasWithState -> NexusStreamWriter)
soaked at the full 32x500 shape with the intent write ON and OFF,
INTERLEAVED (on, off, on, off) so slow VM phases hit both arms equally;
each arm gets 2 x half the frame budget.  The first soak's warm-in is
excluded by the per-soak steady split as usual, and a throwaway warmup
soak precedes the measured rounds so JIT/codegen warm-in doesn't land
on arm A.

Usage: python tools/ab_fsm_intent.py [--frames 3000]
Writes tools/AB_FSM_INTENT_RESULT.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_streaming as BS  # noqa: E402

N_DIG = 32


def _soak(spark, base: str, tag: str, intent: bool, n_frames: int) -> dict:
    os.environ["SPARK_GRAFT_FSM_INTENT"] = "1" if intent else "0"
    res = BS._run_shape(
        spark, base, N_DIG, n_frames, fsm="apply", paced_only=True,
        label_suffix=f"_{tag}",
    )
    out = {k: res["paced"][k] for k in (
        "frames_done", "keeps_up_at_50fps", "latency_slope_s_per_s",
        "latency_p50_s", "latency_p95_s", "steady_p50_s", "steady_p95_s",
    )}
    out["cycle"] = res["cycle_decomposition"]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3000)
    ap.add_argument("--warmup-frames", type=int, default=500)
    args = ap.parse_args()

    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-ab-fsm-intent")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in BS._STREAM_CONF.items():
        spark.conf.set(k, v)

    base = tempfile.mkdtemp(prefix="ab_fsm_intent_")
    half = args.frames // 2

    # throwaway warm-in soak (absorbs codegen/python-worker start-up so
    # it doesn't bias the first measured arm)
    _soak(spark, base, "warm", True, args.warmup_frames)

    rounds = []
    for rnd, (tag, intent) in enumerate(
        [("on_1", True), ("off_1", False), ("on_2", True), ("off_2", False)]
    ):
        rounds.append(
            {"arm": tag, "intent": intent,
             **_soak(spark, base, tag, intent, half)}
        )

    def pooled(flag: bool, key: str):
        vals = sorted(r[key] for r in rounds if r["intent"] is flag)
        return round(vals[len(vals) // 2], 4)

    payload = {
        "shape": f"{N_DIG}x{BS.EVENTS_PER_MESSAGE}",
        "frames_per_round": half,
        "rounds": rounds,
        "intent_on": {
            k: pooled(True, k)
            for k in ("steady_p50_s", "steady_p95_s", "latency_slope_s_per_s")
        },
        "intent_off": {
            k: pooled(False, k)
            for k in ("steady_p50_s", "steady_p95_s", "latency_slope_s_per_s")
        },
    }
    payload["intent_cost_p50_s"] = round(
        payload["intent_on"]["steady_p50_s"]
        - payload["intent_off"]["steady_p50_s"], 4,
    )
    out_path = os.path.join(REPO, "tools", "AB_FSM_INTENT_RESULT.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
