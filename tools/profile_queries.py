#!/usr/bin/env python
"""Round-14 optimization profiler.

Two modes over bench.py's headline set, same order and cache semantics:

  timing mode (default):
      python tools/profile_queries.py <tag> [query ...]
    Times construction + .count() exactly like bench.py's time_once, and
    additionally records how many Spark jobs / stages / tasks each query
    triggered (statusTracker diff) — at sf0.1 the job/stage count is the
    dominant cost driver and the first thing to shrink (guide §1/§2).
    Writes tools/PROFILE_<tag>.json.

  plan mode:
      python tools/profile_queries.py --plans <tag> [query ...]
    Captures .explain("formatted") to plans/r14/<name>_<tag>.txt.  The
    shared-checkpoint cache is bypassed (builder plans are captured, not
    the post-checkpoint scan), so these files show the real query shape.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

HEADLINE = [
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


@F.pandas_udf(T.DoubleType())
def _warm_udf(s: pd.Series) -> pd.Series:
    return s * 1.0


def main() -> None:
    args = sys.argv[1:]
    plans_mode = False
    if args and args[0] == "--plans":
        plans_mode = True
        args = args[1:]
    tag = args[0] if args else "before"
    only = set(args[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from supermusr_data_pipeline_spark.session import get_spark

    extra = {}
    if os.environ.get("SPARK_PROFILE_UI") == "1":
        extra["spark.ui.enabled"] = "true"
    spark = get_spark("supermusr-profile", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    headline = [h for h in HEADLINE if h in qs and (not only or h in only)]

    from supermusr_data_pipeline_spark.plans import text_dedup
    from supermusr_data_pipeline_spark.schemas import TESTDATA_TABLES
    from supermusr_data_pipeline_spark.sources.testdata import load_table

    text_dedup.clear_shared_cache()
    for t in TESTDATA_TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(0, 10_000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm_udf(F.col("id").cast("double"))
    ).count()

    # pre-build physical indexes exactly like bench.py
    index_builds: dict[str, float] = {}
    app = sc.applicationId
    from supermusr_data_pipeline_spark.plans import incremental, retrieval, vector_pq

    def _prebuild(label, guard, key, write_fn, path):
        if guard.get(key):
            return
        t0 = time.perf_counter()
        write_fn(spark, sf_dir, path)
        guard[key] = True
        index_builds[label] = round(time.perf_counter() - t0, 3)

    if "q82_indexed_incremental" in headline:
        _prebuild("lsh_index", incremental._BUILT, (app, sf_dir),
                  incremental.write_lsh_index, incremental.lsh_index_path(sf_dir))
    if "q96_pq_indexed" in headline:
        _prebuild("pq_index", vector_pq._PQ_BUILT, (app, sf_dir),
                  vector_pq.write_pq_index, vector_pq.pq_index_path(sf_dir))
    if "q114_bm25_indexed" in headline:
        _prebuild("postings_index", retrieval._POSTINGS_BUILT, (app, sf_dir),
                  retrieval.write_postings_index,
                  retrieval.postings_index_path(sf_dir, app))

    if plans_mode:
        # bypass the shared cache so builder plans are visible
        def _passthrough(spark_, sf_dir_, name_, builder):
            return builder()

        text_dedup._shared_checkpoint = _passthrough
        plans_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            os.environ.get("SUPERMUSR_PLANS_ROUND", "r15"),
        )
        os.makedirs(plans_dir, exist_ok=True)
        for name in headline:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"captured plan: {name}")
        spark.stop()
        return

    def _stage_metrics():
        """Per-stage wall/task metrics from the UI REST API (needs
        SPARK_PROFILE_UI=1).  Returns {stageId: {...}}."""
        if os.environ.get("SPARK_PROFILE_UI") != "1":
            return {}
        import urllib.request

        try:
            ui = sc.uiWebUrl
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{sc.applicationId}/stages?status=complete",
                timeout=10,
            ) as r:
                data = json.load(r)
        except Exception:
            return {}
        out = {}
        for s in data:
            out[s["stageId"]] = {
                "name": s.get("name", "")[:60],
                "tasks": s.get("numCompleteTasks", 0),
                "executorRunTimeMs": s.get("executorRunTime", 0),
                "cpuTimeMs": round(s.get("executorCpuTime", 0) / 1e6, 1),
                "shuffleReadMB": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                "shuffleWriteMB": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "inputMB": round(s.get("inputBytes", 0) / 1e6, 2),
                "submitted": s.get("submissionTime"),
                "completed": s.get("completionTime"),
            }
        return out

    tracker = sc.statusTracker()
    results: dict[str, dict] = {}
    seen_stages: set = set()
    for name in headline:
        jobs_before = tracker.getJobIdsForGroup(None) or []
        max_job_before = max(jobs_before) if jobs_before else -1
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        new_jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j > max_job_before]
        n_stages = n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for st in ji.stageIds:
                si = tracker.getStageInfo(st)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        results[name] = {
            "sec": round(dt, 3), "rows": n,
            "jobs": len(new_jobs), "stages": n_stages, "tasks": n_tasks,
        }
        sm = _stage_metrics()
        new_sm = {k: v for k, v in sm.items() if k not in seen_stages}
        seen_stages.update(sm.keys())
        if new_sm:
            results[name]["stage_metrics"] = new_sm
        print(f"{name:28s} {dt:7.3f}s rows={n:<8d} jobs={len(new_jobs):<3d} "
              f"stages={n_stages:<4d} tasks={n_tasks}")

    out = {
        "tag": tag,
        "sf_dir": sf_dir,
        "index_builds": index_builds,
        "queries": results,
        "total_sec": round(sum(r["sec"] for r in results.values()), 3),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"PROFILE_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_sec": out["total_sec"], "index_builds": index_builds}))
    spark.stop()


if __name__ == "__main__":
    main()
