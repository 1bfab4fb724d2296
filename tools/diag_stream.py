#!/usr/bin/env python
"""Diagnostic: decompose the streaming frame-FSM -> nexus-sink micro-batch
cycle into measured buckets (VERDICT r6 #1).  Replays a short paced tape
exactly like bench_streaming.py, but attaches a StreamingQueryListener and
phase timers inside the foreachBatch writer, then prints per-batch bucket
medians:

engine buckets (from QueryProgressEvent.durationMs):
  triggerExecution  — whole cycle
  addBatch          — sink function (our foreachBatch) + plan execution
  getBatch/latestOffset — file-source listing
  queryPlanning, walCommit, commitOffsets — engine bookkeeping
writer buckets (perf_counter inside NexusStreamWriter.__call__):
  write_s           — the parquet append action (includes FSM execution)
  totals_s          — the per-run totals collect
state buckets (from stateOperators): commit times per batch.

Not part of the bench contract; a working tool for the latency attack.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

import bench_streaming as bs  # noqa: E402


class Collector(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append(
            {
                "batchId": p.batchId,
                "durationMs": dict(p.durationMs),
                "numInputRows": p.numInputRows,
                "stateOperators": [
                    {
                        "commitTimeMs": getattr(s, "allUpdatesTimeMs", None),
                        "raw": s.json,
                    }
                    for s in p.stateOperators
                ],
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    from supermusr_data_pipeline_spark.session import get_spark
    from supermusr_data_pipeline_spark.streaming import nexus_stream

    n_frames = int(os.environ.get("DIAG_FRAMES", "300"))
    bs.N_FRAMES = n_frames

    # instrument the writer with phase timers
    orig_call = nexus_stream.NexusStreamWriter.__call__
    phases = []

    def timed_call(self, frames_batch, batch_id):
        t0 = time.perf_counter()
        rec = {"batch_id": batch_id}
        _orig_write = frames_batch.sparkSession  # noqa: F841  (keep ref)
        # time the whole sink call; finer buckets via monkeypatched methods
        orig_call(self, frames_batch, batch_id)
        rec["sink_total_s"] = time.perf_counter() - t0
        phases.append(rec)

    nexus_stream.NexusStreamWriter.__call__ = timed_call

    spark = get_spark("supermusr-diag-stream")
    spark.sparkContext.setLogLevel("ERROR")
    col = Collector()
    spark.streams.addListener(col)

    out = bs.run(spark)
    nexus_stream.NexusStreamWriter.__call__ = orig_call

    # aggregate engine buckets over the PACED query only (first query)
    paced = [p for p in col.progress if p["numInputRows"] > 0]
    keys = set()
    for p in paced:
        keys.update(p["durationMs"].keys())
    med = {}
    for k in sorted(keys):
        vals = sorted(p["durationMs"].get(k, 0) for p in paced)
        med[k] = vals[len(vals) // 2]
    sink = sorted(p["sink_total_s"] for p in phases)
    print(json.dumps({
        "paced_batches": len(paced),
        "engine_median_ms": med,
        "sink_total_median_s": sink[len(sink) // 2] if sink else None,
        "bench": out,
        "state_sample": paced[len(paced) // 2]["stateOperators"] if paced else None,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
