#!/usr/bin/env python
"""Scale dress rehearsal (VERDICT r10 next #6): run the top-10 headline
queries at 1x, 3x, and 10x the sf0.1 corpus and record the measured
scaling exponent per query, converting the "designed for 100 TB"
docstrings into evidence.

Scaled corpora are REPLICAS of sf0.1 with structure-preserving remaps,
built under /tmp (never inside /root/testdata):

- documents: doc_id remapped per replica; text vowels are re-permuted
  per replica (``translate``), so intra-replica near-dup structure is
  preserved exactly while replicas are NOT near-dups of each other —
  naive copies would triple every LSH bucket and measure a quadratic
  pair blow-up that is an artifact of the corpus, not the plan;
- embeddings: vec_id remapped; a small per-replica additive offset on
  every component keeps replicas from being exact ANN ties;
- events: event_id/user_id remapped, timestamps shifted by the corpus
  span per replica (the timeline EXTENDS, as real growth would);
- lineitem: l_orderkey remapped;
- dimension tables (region/nation/customer/supplier/part/orders) are
  carried as-is — dimensions don't scale with fact volume.

Timing mirrors bench.py (`.count()` per query, same session).  The
whole suite runs once at 1x as a throwaway warm-in (codegen, python
workers), then each scale is measured in ascending order.  Per query
the record is t(1x)/t(3x)/t(10x), the fitted exponent
alpha = log(t10/t1)/log(10), and overhead = t10 / (10 * t1) — the
"how much worse than linear" number the r10 verdict gates at 1.3.
Sub-linear readings (overhead < 1) mean fixed per-query costs still
dominate at sf0.1 — also a fine answer for the 100 TB posture.

Usage: python tools/scaling_bench.py [--out]
Writes tools/SCALING_RESULT.json and, with --merge-bench, a "scaling"
section into BENCH_LOCAL.json.  One JSON line on stdout.
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_SF = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
WORK = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", os.path.join("/tmp", "supermusr_scale")
)

DIM_TABLES = ["region", "nation", "customer", "supplier", "part", "orders"]
FACT_TABLES = ["documents", "embeddings", "events", "lineitem"]

# top-10 by r10 bench cost + family coverage: ANN (PQ/SQ8/IVF), LSH
# near-dup + clusters, incremental dedup (probe + persisted index),
# pandas-UDF detector, TPC-H aggregate, lexical retrieval.
# expected exponent: the ANN queries answer "top-k for EVERY 50th
# vector", so their query set grows WITH the corpus — work is
# N_queries x per-probe cost ~ N^2/cells by construction, and the
# honest linear reference for them is exponent 2 (a fixed query set
# over a growing corpus would be exponent 1 — that shape is covered by
# the per-probe ingest benches).  Everything else is expected ~N.
QUERIES = {
    "q78_ivf_pq_ann": 2.0,
    "q51_ivf_sq8_ann": 2.0,
    "q29_ivf_ann": 2.0,
    "q25_lsh_near_dup": 1.0,
    "q42_dedup_clusters": 1.0,
    "q79_incremental_dedup": 1.0,
    "q82_indexed_incremental": 1.0,
    "q14_threshold_detect": 1.0,
    "q01_pricing_summary": 1.0,
    "q112_bm25_topk": 1.0,
}

_VOWEL_PERMS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeiuo", "eioau", "iouea", "ouaie", "uaeoi",
]


def _replicas(df, k, build_one):
    reps = [build_one(df, r) for r in range(k)]
    return functools.reduce(lambda a, b: a.unionByName(b), reps)


def build_scaled(spark, dst: str, k: int) -> float:
    """Materialize the k-times corpus under ``dst``; returns build secs."""
    from pyspark.sql import functions as F

    from supermusr_data_pipeline_spark.sources.testdata import load_table

    t0 = time.perf_counter()
    os.makedirs(dst, exist_ok=True)
    for t in DIM_TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            shutil.copyfile(os.path.join(SRC_SF, f"{t}.parquet"), out)

    docs = load_table(spark, SRC_SF, "documents")
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1

    def doc_rep(df, r):
        text = (
            F.col("text") if r == 0
            else F.translate("text", "aeiou", _VOWEL_PERMS[r % len(_VOWEL_PERMS)])
        )
        return df.select(
            (F.col("doc_id") + F.lit(r * n_doc)).alias("doc_id"),
            text.alias("text"), "lang", "source", "n_chars",
        )

    _replicas(docs, k, doc_rep).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )

    emb = load_table(spark, SRC_SF, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1

    def emb_rep(df, r):
        vec = (
            F.col("embedding") if r == 0
            else F.transform(
                "embedding", lambda x: (x + F.lit(r * 0.0137)).cast("float")
            )
        )
        return df.select(
            (F.col("vec_id") + F.lit(r * n_vec)).alias("vec_id"),
            vec.alias("embedding"), "label",
        )

    _replicas(emb, k, emb_rep).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )

    # load_table normalizes the ts dtype (NTZ/NANOS variants by
    # generator version) to session-local TIMESTAMP
    ev = load_table(spark, SRC_SF, "events")
    lo, hi, n_ev, n_usr = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")),
        F.max("event_id"), F.max("user_id"),
    ).first()
    span_us = (hi - lo) + 3_600_000_000  # corpus span + 1h gap per replica

    def ev_rep(df, r):
        return df.select(
            (F.col("event_id") + F.lit(r * (n_ev + 1))).alias("event_id"),
            F.timestamp_micros(F.unix_micros("ts") + F.lit(r * span_us)).alias("ts"),
            (F.col("user_id") + F.lit(r * (n_usr + 1))).alias("user_id"),
            "event_type", "value", "props",
        )

    _replicas(ev, k, ev_rep).write.mode("overwrite").parquet(
        os.path.join(dst, "events.parquet")
    )

    li = load_table(spark, SRC_SF, "lineitem")
    n_ord = li.agg(F.max("l_orderkey")).first()[0] + 1

    def li_rep(df, r):
        return df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * n_ord)
        )

    _replicas(li, k, li_rep).write.mode("overwrite").parquet(
        os.path.join(dst, "lineitem.parquet")
    )
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merge-bench", action="store_true",
                    help="also write the result under BENCH_LOCAL.json['scaling']")
    ap.add_argument("--factors", default="1,3,10")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    import __spark_entry__ as entry
    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    dirs: dict[int, str] = {}
    build_s: dict[int, float] = {}
    for k in factors:
        dst = os.path.join(WORK, f"x{k}")
        build_s[k] = build_scaled(spark, dst, k)
        dirs[k] = dst

    # index prebuilds per scale (the q82 probe must not pay its own
    # build; the build's OWN scaling is recorded as lsh_index_build)
    from supermusr_data_pipeline_spark.plans import incremental

    app = spark.sparkContext.applicationId
    idx_build: dict[int, float] = {}
    for k in factors:
        t0 = time.perf_counter()
        incremental.write_lsh_index(
            spark, dirs[k], incremental.lsh_index_path(dirs[k])
        )
        incremental._BUILT[(app, dirs[k])] = True
        idx_build[k] = round(time.perf_counter() - t0, 3)

    def _clear_shared() -> None:
        # the dedup family caches per-(session, sf_dir) intermediates
        # (localCheckpoint) — warm-in would otherwise hand the x1
        # measurement a ~free cache hit and garbage alphas
        try:
            from supermusr_data_pipeline_spark.plans.text_dedup import (
                clear_shared_cache,
            )

            clear_shared_cache()
        except ImportError:
            pass

    # throwaway warm-in at 1x: codegen + python workers off the clock
    for name in QUERIES:
        qs[name](spark, dirs[factors[0]]).count()
    _clear_shared()

    times: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    for k in factors:
        # each scale starts cache-cold; WITHIN a scale queries run in
        # bench.py's pipeline order, so each number is the incremental
        # stage cost exactly as BENCH_r*.json reports it
        _clear_shared()
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, dirs[k]).count()
            times[name][k] = round(time.perf_counter() - t0, 3)

    k1, kN = factors[0], factors[-1]
    per_query = {}
    for name, expected in QUERIES.items():
        t1, tN = times[name][k1], times[name][kN]
        ratio = tN / t1 if t1 > 0 else None
        alpha = (
            round(math.log(ratio) / math.log(kN / k1), 3)
            if ratio and ratio > 0 else None
        )
        # overhead vs the EXPECTED work growth (see QUERIES): 1.0 =
        # exactly the expected shape, <=1.3 passes the r10 gate
        overhead = (
            round(ratio / (kN / k1) ** expected, 3) if ratio else None
        )
        per_query[name] = {
            "t_s": {f"x{k}": times[name][k] for k in factors},
            "alpha": alpha,
            "expected_exponent": expected,
            "overhead_vs_expected": overhead,
            "verdict": (
                "within-expected" if overhead is not None and overhead <= 1.3
                else "super-linear"
            ),
        }

    payload = {
        "src": SRC_SF,
        "factors": factors,
        "corpus_build_s": {f"x{k}": round(build_s[k], 1) for k in factors},
        "lsh_index_build_s": {f"x{k}": idx_build[k] for k in factors},
        "queries": per_query,
        "note": (
            "alpha = log(t_xN/t_x1)/log(N); overhead = "
            "t_xN/(N^expected * t_x1) where expected is the query's "
            "work-growth exponent (2 for the ANN queries, whose query "
            "set is a fixed FRACTION of the corpus): <=1 means fixed "
            "costs still amortizing, <=1.3 passes the r10 gate, above "
            "needs an attributed cause"
        ),
    }
    with open(os.path.join(REPO, "tools", "SCALING_RESULT.json"), "w") as f:
        json.dump(payload, f)
        f.write("\n")
    if args.merge_bench:
        bl_path = os.path.join(REPO, "BENCH_LOCAL.json")
        try:
            with open(bl_path) as f:
                bl = json.load(f)
        except (OSError, ValueError):
            bl = {}
        bl["scaling"] = payload
        with open(bl_path, "w") as f:
            json.dump(bl, f)
            f.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
