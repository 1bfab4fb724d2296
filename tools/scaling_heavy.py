#!/usr/bin/env python
"""Opt-in core-scaling demonstration on a HEAVY synthetic corpus (r15,
VERDICT r14 #7).

At sf0.1 every benched query is scheduling-latency-bound, so the driver's
8-vs-32-core ratios all read ~1.0 and say nothing about whether the heavy
passes actually parallelize.  This tool builds a 10x corpus (50k documents
/ 20k embeddings, deterministic, written as ONE parquet file with one row
group each — the same unsplittable-input layout as the driver tables, so
spread_scan has to do the fan-out) under $TMPDIR, then times the
compute-dense queries (q25 minhash, q51 SQ8 encode+probe, q78 PQ
encode+ADC) in FRESH sessions at SPARK_GRAFT_CPUS=8 and =32.

This is builder-side evidence only: it never touches /root/testdata and is
not part of bench.py.  Writes tools/SCALING_HEAVY.json.

Usage:  python tools/scaling_heavy.py [--regen]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY_DIR = os.path.join(tempfile.gettempdir(), "supermusr_sfheavy")
N_DOCS = 50_000
N_VECS = 20_000
QUERIES = ["q25_lsh_near_dup", "q51_ivf_sq8_ann", "q78_ivf_pq_ann"]


def generate() -> None:
    """Deterministic synthetic corpus, generated IN Spark (hash-derived
    pseudo-randomness, no per-row Python) and coalesced to one file per
    table to mirror the driver layout."""
    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("sfheavy-gen")
    spark.sparkContext.setLogLevel("ERROR")
    # ~11% of docs exactly duplicate their predecessor so the LSH pass has
    # real pairs to verify (seed collapses doc_id -> doc_id-1)
    docs = (
        spark.range(N_DOCS)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "seed",
            F.col("doc_id") - F.when(F.col("doc_id") % 9 == 0, 1).otherwise(0),
        )
        .withColumn(
            "text",
            F.expr(
                "concat_ws(' ', transform(sequence(1, 100 + cast(pmod(xxhash64(seed), 200) as int)), "
                "i -> concat('w', pmod(xxhash64(seed * 1000 + i), 30000))))"
            ),
        )
        .withColumn("lang", F.expr("element_at(array('en','de','fr'), cast(pmod(xxhash64(doc_id), 3) + 1 as int))"))
        .withColumn("source", F.expr("concat('src', pmod(xxhash64(doc_id + 7), 20))"))
        .withColumn("n_chars", F.length("text"))
        .drop("seed")
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(HEAVY_DIR, "documents.parquet")
    )
    vecs = (
        spark.range(N_VECS)
        .select(F.col("id").alias("vec_id"))
        .withColumn(
            "embedding",
            F.expr(
                "transform(sequence(0, 63), j -> "
                "cast(pmod(xxhash64(vec_id * 64 + j), 1000) / 500.0 - 1.0 as float))"
            ),
        )
        .withColumn("label", F.expr("cast(pmod(vec_id, 50) as int)"))
    )
    vecs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(HEAVY_DIR, "embeddings.parquet")
    )
    spark.stop()


_RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from supermusr_data_pipeline_spark.session import get_spark
spark = get_spark("sfheavy-run")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
import __spark_entry__ as em
qs = em.queries()
tracker = sc.statusTracker()
out = {{}}
for name in {queries!r}:
    jobs_before = tracker.getJobIdsForGroup(None) or []
    maxj = max(jobs_before) if jobs_before else -1
    t0 = time.perf_counter()
    n = qs[name](spark, {sf_dir!r}).count()
    dt = time.perf_counter() - t0
    new_jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j > maxj]
    tasks = 0
    for j in new_jobs:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for st in ji.stageIds:
            si = tracker.getStageInfo(st)
            if si is not None:
                tasks += si.numTasks
    out[name] = {{"sec": round(dt, 3), "rows": n, "tasks": tasks}}
print("RESULT_JSON:" + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.pop("SPARK_GRAFT_SF_DIR", None)
    code = _RUN_SNIPPET.format(repo=REPO, queries=QUERIES, sf_dir=HEAVY_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT_JSON:"):
            return json.loads(line[len("RESULT_JSON:"):])
    raise RuntimeError(
        f"run at cpus={cpus} produced no result; stderr tail: {proc.stderr[-2000:]}"
    )


def main() -> None:
    if "--regen" in sys.argv or not os.path.isdir(HEAVY_DIR):
        print(f"generating heavy corpus at {HEAVY_DIR} ...")
        generate()
    results = {}
    for cpus in (8, 32):
        print(f"running {QUERIES} at local[{cpus}] ...")
        results[str(cpus)] = run_at(cpus)
    ratio = {
        q: round(results["8"][q]["sec"] / results["32"][q]["sec"], 2)
        for q in QUERIES
        if results["32"][q]["sec"] > 0
    }
    payload = {
        "metric": "core_scaling_heavy",
        "corpus": {"dir": HEAVY_DIR, "n_docs": N_DOCS, "n_vecs": N_VECS,
                   "layout": "one file / one row group per table"},
        "queries": QUERIES,
        "runs": results,
        "speedup_8_to_32": ratio,
    }
    out = os.path.join(REPO, "tools", "SCALING_HEAVY.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["speedup_8_to_32"]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
