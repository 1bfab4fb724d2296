#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed once after a warm-up of the input scans; timing is
wall-clock per query (action = count/collect of a small result).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from supermusr_data_pipeline_spark.session import get_spark  # noqa: E402


@F.pandas_udf(T.DoubleType())
def _warm_udf(s: pd.Series) -> pd.Series:
    return s * 1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("supermusr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # headline set: scan-heavy agg, star join, windows, interval join,
    # pandas-UDF detector, the synthetic DAQ chain, and the LLM-pipeline
    # heavyweights (LSH near-dup, CC clustering, curation capstone, IVF ANN)
    # so a perf regression in the dedup/ANN path shows up round-over-round
    headline = [
        "q01_pricing_summary",
        "q02_revenue_by_region",
        "q04_event_rates",
        "q05_running_totals",
        "q06_sliding_stats",
        "q08_interval_match",
        "q14_threshold_detect",
        "daq_full_chain",
        "q25_lsh_near_dup",
        "q42_dedup_clusters",
        "q46_curated_corpus",
        "q29_ivf_ann",
        "q47_ann_recall",
        "q51_ivf_sq8_ann",
        "q78_ivf_pq_ann",
        "q96_pq_indexed",
        "q58_semantic_dedup",
        "q61_dup_ngram_spans",
        "q69_lsh_recall",
        "q79_incremental_dedup",
        "q82_indexed_incremental",
        "q112_bm25_topk",
        "q114_bm25_indexed",
        "q116_hybrid_rrf",
        "q118_label_centroid_audit",
        "q119_bigram_quality",
    ]
    headline = [h for h in headline if h in qs]

    # the dedup family shares materialized intermediates (one LSH pass per
    # session); timed once each, in pipeline order, so the numbers read as
    # incremental stage costs: q25 = LSH pass, q42 = CC over the pair
    # graph, q46 = decision join, q29 = IVF build + probe, q47 = recall
    # evaluation over q29's checkpoint, q51 = the SQ8 approx+re-rank
    # production configuration.  Repeats would hit the checkpoint cache
    # and time nothing.
    # q96/q82 run AFTER their in-memory twins (q78/q79) in pipeline order;
    # their physical indexes are pre-built (and timed) separately below, so
    # the per-query numbers are probe-only and the q78/q96 and q79/q82
    # deltas read directly as what the physical layout buys
    single_shot = {
        "q25_lsh_near_dup",
        "q42_dedup_clusters",
        "q46_curated_corpus",
        "q29_ivf_ann",
        "q47_ann_recall",
        "q51_ivf_sq8_ann",
        "q78_ivf_pq_ann",
        "q96_pq_indexed",
        "q58_semantic_dedup",
        "q61_dup_ngram_spans",
        "q69_lsh_recall",
        "q79_incremental_dedup",
        "q82_indexed_incremental",
        "q112_bm25_topk",
        "q114_bm25_indexed",
        "q116_hybrid_rrf",
    }
    try:
        from supermusr_data_pipeline_spark.plans.text_dedup import clear_shared_cache

        clear_shared_cache()
    except ImportError:  # pragma: no cover - cache layer is optional
        pass

    # warm the file-system cache / JVM: touch each input table once
    from supermusr_data_pipeline_spark.schemas import TESTDATA_TABLES
    from supermusr_data_pipeline_spark.sources.testdata import load_table

    for t in TESTDATA_TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    # warm the Python-UDF runtime once (Arrow serializers + worker pool +
    # pandas import on every executor thread) so per-query timings measure
    # steady-state engine throughput, not one-time interpreter start-up —
    # the same reason the scans above are warmed
    spark.range(0, 10_000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm_udf(F.col("id").cast("double"))
    ).count()

    # physical-index builds timed SEPARATELY (VERDICT r6 #5): q82/q96/q114
    # build their $TMPDIR artifact on first call, which used to fold the
    # one-time build into the first probe's number.  Pre-building here (and
    # setting each module's session guard) makes the per-query timings
    # probe-only, and `index_builds` reports what each artifact cost.
    index_builds: dict[str, float] = {}

    def _prebuild(label: str, guard: dict, key, write_fn, path: str) -> None:
        if guard.get(key):
            return
        t0 = time.perf_counter()
        write_fn(spark, sf_dir, path)
        guard[key] = True
        index_builds[label] = round(time.perf_counter() - t0, 3)

    app = spark.sparkContext.applicationId
    try:
        from supermusr_data_pipeline_spark.plans import incremental, retrieval, vector_pq

        if "q82_indexed_incremental" in headline:
            _prebuild(
                "lsh_index", incremental._BUILT, (app, sf_dir),
                incremental.write_lsh_index, incremental.lsh_index_path(sf_dir),
            )
        if "q96_pq_indexed" in headline:
            _prebuild(
                "pq_index", vector_pq._PQ_BUILT, (app, sf_dir),
                vector_pq.write_pq_index, vector_pq.pq_index_path(sf_dir),
            )
        if "q114_bm25_indexed" in headline:
            _prebuild(
                "postings_index", retrieval._POSTINGS_BUILT, (app, sf_dir),
                retrieval.write_postings_index,
                retrieval.postings_index_path(sf_dir, app),
            )
    except ImportError:  # pragma: no cover - index modules are optional
        pass

    def time_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in headline:
        t1 = time_once(name)
        if t1 < 1.0 and name not in single_shot:
            # sub-second queries are I/O-jitter-bound on a shared VM: report
            # the median of 5 so round-over-round deltas reflect the engine
            reps = sorted([t1] + [time_once(name) for _ in range(4)])
            timings[name] = round(reps[len(reps) // 2], 3)
        else:
            timings[name] = round(t1, 3)

    total = round(sum(timings.values()), 3)
    # the pre-round-4 headline set, reported separately so round-over-round
    # comparisons aren't skewed by the queries added to the set since
    legacy = [h for h in headline if h not in single_shot and h != "q29_ivf_ann"]

    # streaming envelope: replay a 50 fps dev2 tape through the frame FSM +
    # nexus sink and measure sustained fps / commit latency vs BASELINE.md's
    # 50 frames/s bar (bench_streaming.py; skippable for quick local loops)
    # q25-vs-q42 attribution: exclusive build seconds of each session-shared
    # intermediate (pair graph vs CC rounds), so a shift between the two
    # reads as work moving, not as an unexplained q42 regression
    try:
        from supermusr_data_pipeline_spark.plans.text_dedup import (
            shared_build_seconds,
        )

        shared = shared_build_seconds()
    except ImportError:  # pragma: no cover
        shared = None

    streaming = None
    if os.environ.get("SPARK_GRAFT_SKIP_STREAMING") != "1":
        try:
            import bench_streaming

            streaming = bench_streaming.run(spark)
        except Exception as e:  # noqa: BLE001 — report, don't sink the bench
            streaming = {"error": str(e)[:200]}

    # index-backed ingest front doors (shard LSH + vector IVF): offered
    # vs admitted docs/s against the standing index at sf0.01 — the
    # "index IS the state" claim as a throughput number (VERDICT r6 #9)
    ingest = None
    if os.environ.get("SPARK_GRAFT_SKIP_STREAMING") != "1":
        try:
            import bench_ingest

            ingest = bench_ingest.run(spark)
        except Exception as e:  # noqa: BLE001 — report, don't sink the bench
            ingest = {"error": str(e)[:200]}

    payload = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "legacy_headline_sec": round(sum(timings[h] for h in legacy), 3),
        "queries": timings,
        "index_builds": index_builds,
        "shared_intermediates": shared,
        "streaming": streaming,
        "streaming_ingest": ingest,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver records only the LAST 2000 chars of stdout and parses the
    # JSON line out of that window.  The full payload (with the streaming /
    # ingest sub-reports) grew to ~4.2 KB by r13, so the driver's capture
    # cut the line's head off and BENCH_r13.json reads `"parsed": null` —
    # the per-query numbers never reached the driver (measurement bug, r14;
    # same failure VERDICT r7 #4 recorded for BENCH_r07).  Fix: stdout gets
    # the compact contract line (metric/value/unit/queries/index_builds/sf
    # — ~1 KB, every existing key kept, nothing renamed); BENCH_LOCAL.json
    # keeps the full payload including streaming/ingest, exactly as before.
    stdout_keys = (
        "metric", "value", "unit", "legacy_headline_sec",
        "queries", "index_builds", "sf",
    )
    line = json.dumps({k: payload[k] for k in stdout_keys if k in payload})
    # Persist the full payload to a committed file so every round's numbers
    # survive regardless of stdout capture.
    bl_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    try:
        # sections maintained by side tools (tools/scaling_bench.py) are
        # carried forward, not clobbered by a headline refresh
        try:
            with open(bl_path) as f:
                prev = json.load(f)
            for carry in ("scaling",):
                if carry in prev and carry not in payload:
                    payload[carry] = prev[carry]
        except (OSError, ValueError):
            pass
        with open(bl_path, "w") as f:
            f.write(json.dumps(payload) + "\n")
    except OSError:  # pragma: no cover — read-only checkout must not sink the bench
        pass
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
