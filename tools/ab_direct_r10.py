#!/usr/bin/env python
"""Attribute the direct door's 32x500 latency drift vs round 10
(VERDICT r11 "what's wrong" #2: steady p50 1.446 s band [1.391, 1.522]
recorded at r10 vs 1.986 s band [1.567, 2.115] at r11, with NO
plan/code change on the door's hot path between the records).

Method: the ab_fsm_r7.py pattern — same-session ABBA soak of the
32x500 DIRECT door where only the PACKAGE code swaps per round (the
r10 tree in a git worktree vs HEAD) while the harness
(bench_streaming._run_shape, HEAD) stays fixed.  The r10
DirectNexusWriter takes the exact kwargs the HEAD harness passes
(persist_batch, write_coalesce) and the harness never touches the
r11-only surface (pending_max_bytes, expiry-ticker liveness), so no
compat shims are needed.

Reading: equal arms in one session => the r10-record-to-r11-record
drift is session/VM environment (record the attribution in the
envelope note, as AB_FSM_R7 did for the FSM door); head slower =>
the delta is code — bisect e585670..HEAD over the kafka/streaming
changes.

Usage: python tools/ab_direct_r10.py [--frames 2000] [--rev e585670]
Writes tools/AB_DIRECT_R10_RESULT.json; one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_streaming as BS  # noqa: E402

_PKG = "supermusr_data_pipeline_spark"


def _purge() -> None:
    for name in list(sys.modules):
        if name.startswith(_PKG):
            del sys.modules[name]


def _point(root: str) -> None:
    """Resolve the package from ``root`` (bench_streaming stays the
    already-imported HEAD module; it imports the package lazily inside
    functions, so each round resolves the swapped code)."""
    _purge()
    sys.path[:] = [
        p for p in sys.path if p != REPO and "ab_direct_r10_base" not in p
    ]
    sys.path.insert(0, root)
    import importlib

    pkg = importlib.import_module(_PKG)
    got = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    assert os.path.samefile(got, root), f"loaded {got}, wanted {root}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--rev", default="e585670",
                    help="baseline git rev (default: the round-10 marker)")
    args = ap.parse_args()

    wt = os.path.join(tempfile.gettempdir(), f"ab_direct_r10_base_{args.rev}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, args.rev],
            check=True, capture_output=True,
        )

    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-ab-direct-r10")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in BS._STREAM_CONF.items():
        spark.conf.set(k, v)

    base = tempfile.mkdtemp(prefix="ab_direct_r10_")
    half = max(200, args.frames // 2)
    keys = (
        "frames_done", "keeps_up_at_50fps", "latency_slope_s_per_s",
        "latency_p50_s", "latency_p95_s", "steady_p50_s", "steady_p95_s",
    )

    def _hygiene():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(5)

    # throwaway warm-in on HEAD code
    _point(REPO)
    BS._run_shape(spark, base, 32, 300, paced_only=True,
                  label_suffix="_warm", fsm="direct")
    _hygiene()

    rounds = []
    for rnd, arm in enumerate(("r10", "head", "head", "r10")):
        _point(wt if arm == "r10" else REPO)
        f = BS._run_shape(
            spark, base, 32, half, paced_only=True,
            label_suffix=f"_ab{rnd}_{arm}", fsm="direct",
        )
        rec = {k: f["paced"][k] for k in keys}
        rec["cycle"] = f.get("cycle_decomposition")
        rounds.append((arm, rec))
        if rnd < 3:
            _hygiene()
    _point(REPO)  # leave the process on HEAD code

    def pooled(arm: str) -> dict:
        arm_rounds = [r for a, r in rounds if a == arm]
        out = {}
        for key in keys:
            vals = sorted(r[key] for r in arm_rounds if r.get(key) is not None)
            if not vals:
                out[key] = None
            elif len(vals) % 2:
                out[key] = vals[len(vals) // 2]
            else:
                mid = len(vals) // 2
                out[key] = round((vals[mid - 1] + vals[mid]) / 2, 5)
        out["keeps_up_at_50fps"] = all(
            r["keeps_up_at_50fps"] for r in arm_rounds
        )
        out["cycle"] = [r["cycle"] for r in arm_rounds]
        out["rounds"] = arm_rounds
        return out

    payload = {
        "shape": "32x500",
        "door": "direct",
        "baseline_rev": args.rev,
        "frames_per_round": half,
        "interleave": "ABBA (r10, head, head, r10)",
        "note": (
            "r10 arm runs the r10 PACKAGE code under the HEAD harness; "
            "equal arms => the r10-record-to-r11-record drift is "
            "session/VM environment, not code"
        ),
        "r10": pooled("r10"),
        "head": pooled("head"),
    }
    with open(
        os.path.join(REPO, "tools", "AB_DIRECT_R10_RESULT.json"), "w"
    ) as f:
        json.dump(payload, f)
        f.write("\n")
    print(json.dumps({
        "metric": "ab_direct_r10_steady_p50_s",
        "r10": payload["r10"]["steady_p50_s"],
        "head": payload["head"]["steady_p50_s"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
