#!/usr/bin/env python
"""Same-session A/B: the paced 50 fps soak through the production FSM
topology (applyInPandasWithState -> NexusStreamWriter) vs the FUSED
direct door (streaming/nexus_direct.py — frame assembly driver-side
inside the sink's foreachBatch, no stateful operator, no shuffle).

Motivation (VERDICT r7 floor decomposition): ~0.58 s of every
micro-batch is fixed applyInPandasWithState machinery and the FSM adds
a shuffle on the frame key.  The direct door replaces both with a slim
collect + a local-relation broadcast join — two narrow jobs — at the
cost of TTL expiry being batch-clocked instead of timer-fired (matches
the reference aggregator's poll-loop expiry).  Both variants run in ONE
SparkSession, back-to-back (the repo's same-session variance rule), at
the 8x500 and the full 32x500 reference shapes.

Usage: python tools/ab_direct_sink.py [--frames 1000]
Writes tools/AB_DIRECT_SINK_RESULT.json and prints one JSON line.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--shapes", type=str, default="8,32")
    args = ap.parse_args()

    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-direct-sink")
    spark.sparkContext.setLogLevel("ERROR")
    prior = {k: spark.conf.get(k, None) for k in BS._STREAM_CONF}
    for k, v in BS._STREAM_CONF.items():
        spark.conf.set(k, v)

    result: dict = {"frames": args.frames, "shapes": {}}
    base = tempfile.mkdtemp(prefix="ab_direct_")
    try:
        for n_dig in [int(s) for s in args.shapes.split(",")]:
            shape: dict = {}
            for tag, fsm in (("fsm", "apply"), ("direct", "direct")):
                r = BS._run_shape(
                    spark, base, n_dig, args.frames, fsm=fsm,
                    paced_only=True, label_suffix=f"_ab_{tag}",
                )
                shape[tag] = {
                    "paced": r["paced"],
                    "cycle_decomposition": r["cycle_decomposition"],
                }
            shape["delta_p50_s"] = round(
                (shape["direct"]["paced"]["steady_p50_s"] or 0)
                - (shape["fsm"]["paced"]["steady_p50_s"] or 0), 4
            )
            result["shapes"][f"{n_dig}x{BS.EVENTS_PER_MESSAGE}"] = shape
    finally:
        for k, v in prior.items():
            if v is not None:
                spark.conf.set(k, v)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        spark.stop()

    out = os.path.join(REPO, "tools", "AB_DIRECT_SINK_RESULT.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
