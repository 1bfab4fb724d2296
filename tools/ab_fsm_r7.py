#!/usr/bin/env python
"""Attribute the FSM fallback door's residual regression vs round 7
(VERDICT r10 #4: steady p50 3.68 s vs r7's 2.94 s at 32x500, with
sink_fsm_s 1.1 s vs the r7 floor decomposition's 0.58 s machinery +
0.45 s bookkeeping; the write-ahead intent is already exonerated by
tools/ab_fsm_intent.py).

Method: same-session ABBA soak of the 32x500 FSM door where only the
PACKAGE code swaps per round — the r7 tree (a git worktree) vs HEAD —
while the harness (bench_streaming._run_shape, HEAD) stays fixed.  The
module swap is ab_bench.py's trick: purge supermusr_data_pipeline_spark*
from sys.modules and repoint sys.path; bench_streaming imports the
package lazily inside functions, so each round resolves the swapped
code.  Two r7-compat shims: the r7 package has no streaming.nexus_direct
(stubbed — the fsm arm never touches it) and its NexusStreamWriter
lacks the write_intent kwarg (wrapped to swallow it, i.e. the r7 arm
runs WITHOUT the intent, exactly the r7-era configuration).

Reading: if r7 code ~= HEAD in one session, the +0.7 s is session/VM
environment (the envelope note then cites this); if r7 is faster, the
delta is code and the per-arm sink_fsm_s decomposition names the
component to bisect.

Usage: python tools/ab_fsm_r7.py [--frames 2000] [--rev 72bc1a2]
Writes tools/AB_FSM_R7_RESULT.json; one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import subprocess
import sys
import tempfile
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_streaming as BS  # noqa: E402

_PKG = "supermusr_data_pipeline_spark"


def _purge() -> None:
    for name in list(sys.modules):
        if name.startswith(_PKG):
            del sys.modules[name]


def _point(root: str, is_r7: bool) -> None:
    """Resolve the package from ``root`` (bench_streaming stays the
    already-imported HEAD module)."""
    _purge()
    sys.path[:] = [
        p for p in sys.path if p != REPO and "ab_fsm_r7_base" not in p
    ]
    sys.path.insert(0, root)
    import importlib

    pkg = importlib.import_module(_PKG)
    got = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    assert os.path.samefile(got, root), f"loaded {got}, wanted {root}"
    if not is_r7:
        return
    # r7-compat shims (see module docstring)
    ns = importlib.import_module(f"{_PKG}.streaming.nexus_stream")
    params = inspect.signature(ns.NexusStreamWriter.__init__).parameters
    if "write_intent" not in params:
        orig = ns.NexusStreamWriter

        class _Compat(orig):  # noqa: N801
            def __init__(self, *a, write_intent=True, **kw):
                super().__init__(*a, **kw)

        ns.NexusStreamWriter = _Compat
    stub_name = f"{_PKG}.streaming.nexus_direct"
    try:
        importlib.import_module(stub_name)
    except ImportError:
        stub = types.ModuleType(stub_name)
        stub.DirectNexusWriter = None  # never constructed on the fsm arm
        sys.modules[stub_name] = stub


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--rev", default="72bc1a2",
                    help="baseline git rev (default: the round-7 marker)")
    args = ap.parse_args()

    wt = os.path.join(tempfile.gettempdir(), f"ab_fsm_r7_base_{args.rev}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, args.rev],
            check=True, capture_output=True,
        )

    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-ab-fsm-r7")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in BS._STREAM_CONF.items():
        spark.conf.set(k, v)

    base = tempfile.mkdtemp(prefix="ab_fsm_r7_")
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
    _point(REPO, is_r7=False)
    BS._run_shape(spark, base, 32, 300, paced_only=True,
                  label_suffix="_warm", fsm="apply")
    _hygiene()

    rounds = []
    for rnd, arm in enumerate(("r7", "head", "head", "r7")):
        _point(wt if arm == "r7" else REPO, is_r7=(arm == "r7"))
        f = BS._run_shape(
            spark, base, 32, half, paced_only=True,
            label_suffix=f"_ab{rnd}_{arm}", fsm="apply",
        )
        rec = {k: f["paced"][k] for k in keys}
        rec["cycle"] = f.get("cycle_decomposition")
        rounds.append((arm, rec))
        if rnd < 3:
            _hygiene()
    _point(REPO, is_r7=False)  # leave the process on HEAD code

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
        out["keeps_up_at_50fps"] = all(r["keeps_up_at_50fps"] for r in arm_rounds)
        out["sink_fsm_s"] = [
            (r["cycle"] or {}).get("sink_fsm_s") for r in arm_rounds
        ]
        out["rounds"] = arm_rounds
        return out

    payload = {
        "shape": "32x500",
        "baseline_rev": args.rev,
        "frames_per_round": half,
        "interleave": "ABBA (r7, head, head, r7)",
        "note": (
            "r7 arm runs the r7 PACKAGE code (no write-ahead intent — "
            "the r7-era configuration) under the HEAD harness; equal "
            "arms => the drift vs the r7 RECORD is session/VM "
            "environment, not code"
        ),
        "r7": pooled("r7"),
        "head": pooled("head"),
    }
    with open(os.path.join(REPO, "tools", "AB_FSM_R7_RESULT.json"), "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
