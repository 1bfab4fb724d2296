#!/usr/bin/env python
"""Same-session A/B of the frame-FSM stateful operator (VERDICT r7 #1):
applyInPandasWithState (production) vs transformWithStateInPandas (the
Spark 4.x candidate) at the full reference shape, 32 digitisers x 500
events/frame, paced at the instrument's 50 frames/s.

Methodology (the repo's own variance rule): cross-invocation bench
variance on this VM is ±15-30%, so all soaks run inside ONE
SparkSession, back-to-back, with cache-clear + GC + settle between
them.  Sequence:

  1. apply @ HDFS store   — the production configuration (anchor)
  2. apply @ RocksDB      — isolates the store change
  3. tws   @ RocksDB      — isolates the operator change
  4. apply @ RocksDB      — drift sentinel: if this differs from #2 by
                            more than the in-session noise, the session
                            accumulated heap debt and the tws delta is
                            read against the average of #2 and #4

transformWithState only runs on RocksDB, hence the two-step isolation.
The tws worker needs the protobuf shim PYTHONPATH (tools/pyshims) —
this script sets it before the session starts so every spawned Python
worker inherits it.

Usage: python tools/ab_fsm_bench.py   (prints one JSON line and writes
tools/AB_FSM_RESULT.json; ~5 min at the default 1500-frame soaks,
SPARK_GRAFT_AB_FRAMES overrides).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# must be set BEFORE the JVM starts so python workers inherit it
_SHIM = os.path.join(_REPO, "tools", "pyshims")
_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_SHIM, _GAE] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)

N_DIGITISERS = 32
N_FRAMES = int(os.environ.get("SPARK_GRAFT_AB_FRAMES", "1500"))

_HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def run(spark) -> dict:
    import bench_streaming as bs
    from supermusr_data_pipeline_spark.streaming.state_store import ROCKSDB_PROVIDER

    prior = {k: spark.conf.get(k, None) for k in bs._STREAM_CONF}
    for k, v in bs._STREAM_CONF.items():
        spark.conf.set(k, v)

    plan = [
        ("apply_hdfs", "apply", _HDFS_PROVIDER),
        ("apply_rocksdb", "apply", ROCKSDB_PROVIDER),
        ("tws_rocksdb", "tws", ROCKSDB_PROVIDER),
        ("apply_rocksdb_2", "apply", ROCKSDB_PROVIDER),
    ]
    base = tempfile.mkdtemp(prefix="supermusr_ab_fsm_")
    out: dict = {"n_digitisers": N_DIGITISERS, "n_frames": N_FRAMES, "runs": {}}
    try:
        for i, (name, fsm, provider) in enumerate(plan):
            if i > 0:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                time.sleep(5)
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
            r = bs._run_shape(
                spark, base, N_DIGITISERS, N_FRAMES,
                fsm=fsm, paced_only=True, label_suffix=f"_{name}",
            )
            out["runs"][name] = {
                "fsm": fsm,
                "provider": provider.rsplit(".", 1)[-1],
                "paced": r["paced"],
                "cycle_decomposition": r["cycle_decomposition"],
            }
    finally:
        for k, v in prior.items():
            if v is not None:
                spark.conf.set(k, v)
        shutil.rmtree(base, ignore_errors=True)

    runs = out["runs"]

    def p50(name):
        return runs[name]["paced"]["steady_p50_s"]

    anchor = (p50("apply_rocksdb") + p50("apply_rocksdb_2")) / 2
    out["verdict"] = {
        "apply_rocksdb_steady_p50_avg_s": round(anchor, 4),
        "tws_steady_p50_s": p50("tws_rocksdb"),
        "tws_minus_apply_s": round(p50("tws_rocksdb") - anchor, 4),
        "in_session_apply_noise_s": round(
            abs(p50("apply_rocksdb") - p50("apply_rocksdb_2")), 4
        ),
    }
    return out


def main() -> None:
    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-ab-fsm")
    spark.sparkContext.setLogLevel("ERROR")
    result = {"metric": "ab_fsm", **run(spark)}
    line = json.dumps(result)
    with open(os.path.join(_REPO, "tools", "AB_FSM_RESULT.json"), "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
