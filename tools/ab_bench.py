#!/usr/bin/env python
"""Same-session A/B bench: run watch-item queries from TWO checkouts of
the package (a baseline git rev, materialized as a worktree, vs HEAD)
inside ONE SparkSession, interleaved A/B/A/B, so this VM's documented
±15-30% cross-invocation variance cancels (VERDICT r7 #3 — the q29/q42/
q14 drift between the r06 bench file and the judge's r07 re-run could
not be attributed across two different sessions).

Mechanics: the two variants are the same package name from different
source roots, so each rep purges `supermusr_data_pipeline_spark*` and
`__spark_entry__` from sys.modules, points sys.path at the variant's
root, and re-imports.  The JVM, executor threads, warmed scans, and the
Arrow/pandas worker pool are shared by every rep — only the Python plan
code differs.  Import time is outside the timed region.  The A/B set
deliberately contains no $TMPDIR-index-backed queries (a fresh module
per rep would re-trip their build guards and fold builds into probes);
the shared dedup intermediates (q25's LSH pass) are rebuilt per rep by
design — their exclusive build seconds are exactly the drifting metric
— and cleared via the variant's own clear_shared_cache().

Usage:
    python tools/ab_bench.py [--baseline-rev 5ecfefd] [--reps 3]
        [--sf-dir /root/testdata/sf0.1]

Prints a per-query median table + one JSON line, and writes
tools/AB_BENCH_RESULT.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


@F.pandas_udf(T.DoubleType())
def _warm(s: pd.Series) -> pd.Series:
    return s * 1.0

# pipeline order matters: q25 builds the session-shared LSH pair graph
# that q42 consumes; running them in bench.py's order makes each number
# an incremental stage cost, comparable 1:1 with BENCH_r*.json
AB_QUERIES = [
    "q25_lsh_near_dup",
    "q42_dedup_clusters",
    "q29_ivf_ann",
    "q47_ann_recall",
    "q14_threshold_detect",
    # r10 drift watch-items (VERDICT r10 #3): q08 read +73% r9->r10 with
    # no code change to the query; q29/q25 sat at the edge of the ±20%
    # band.  Run against the r9 tree to attribute code vs session noise.
    "q08_interval_match",
    # r11 drift watch-items (VERDICT r11 #7): q82 +12.9% and q58 +25%
    # r10->r11 with no code change to either query.
    "q58_semantic_dedup",
    "q82_indexed_incremental",
]

# $TMPDIR-index-backed queries: a fresh module per rep resets their
# build-once guard, so the FIRST call would fold the index build into
# the probe time.  _run_rep trips the guard with one untimed call, then
# times the probe — matching bench.py's steady-state semantics (the
# build guard is already tripped there by earlier queries in the run).
INDEX_BACKED = {"q82_indexed_incremental"}


def _purge_modules() -> None:
    for name in list(sys.modules):
        if name == "__spark_entry__" or name.startswith("supermusr_data_pipeline_spark"):
            del sys.modules[name]


def _load_variant(root: str):
    """Import the package + driver contract from `root`, exclusively."""
    _purge_modules()
    sys.path = [p for p in sys.path if p not in (REPO,) and "ab_baseline" not in p]
    sys.path.insert(0, root)
    import __spark_entry__ as entry_mod  # noqa: PLC0415

    got = os.path.dirname(os.path.abspath(entry_mod.__file__))
    assert os.path.samefile(got, root), f"loaded {got}, wanted {root}"
    return entry_mod


def _run_rep(entry_mod, spark, sf_dir: str) -> dict[str, float]:
    from supermusr_data_pipeline_spark.plans.text_dedup import clear_shared_cache

    clear_shared_cache()
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    for name in AB_QUERIES:
        if name not in qs:
            continue
        if name in INDEX_BACKED:
            qs[name](spark, sf_dir).count()  # untimed build-guard trip
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    try:
        from supermusr_data_pipeline_spark.plans.text_dedup import shared_build_seconds

        for k, v in (shared_build_seconds() or {}).items():
            out[f"shared:{k}"] = round(v, 3)
    except ImportError:
        pass
    clear_shared_cache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline-rev", default="5ecfefd",
                    help="git rev of the baseline variant (default: round-6 marker)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1,
                    help="discarded reps of each variant before measurement "
                         "(first execution of either code path pays plan "
                         "compilation + code-cache JIT the later reps don't)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--self-check", action="store_true",
                    help="ALL THREE arms load the working tree (byte-"
                         "identical): the acceptance run for the noise-"
                         "floor semantics — must report zero "
                         "delta_above_noise flags")
    args = ap.parse_args()

    if args.self_check:
        wt = REPO
    else:
        wt = os.path.join(
            tempfile.gettempdir(), f"ab_baseline_{args.baseline_rev}"
        )
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "-C", REPO, "worktree", "add", "--detach", wt,
                 args.baseline_rev],
                check=True, capture_output=True,
            )

    sys.path.insert(0, REPO)
    from supermusr_data_pipeline_spark.session import get_spark

    spark = get_spark("supermusr-ab-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm scans + the pandas-UDF worker pool once, exactly like bench.py,
    # so rep 1 of variant A doesn't pay one-time costs the others skip
    from supermusr_data_pipeline_spark.schemas import TESTDATA_TABLES
    from supermusr_data_pipeline_spark.sources.testdata import load_table

    for t in TESTDATA_TABLES:
        try:
            load_table(spark, args.sf_dir, t).count()
        except Exception:
            pass
    spark.range(0, 10_000, numPartitions=32).select(_warm(F.col("id").cast("double"))).count()

    # "control" is a SECOND arm of the byte-identical HEAD tree: its
    # measured delta vs head is the session noise floor, carried next to
    # every verdict (VERDICT r12 #4 — a byte-identical arm once read
    # +28%, above the ±20% drift band, so "inside the band" claims are
    # only falsifiable with the floor measured in the same run).
    variants = {"baseline": wt, "head": REPO, "control": REPO}
    arm_names = ["baseline", "head", "control"]
    for w in range(args.warmup):
        for tag in arm_names:
            entry_mod = _load_variant(variants[tag])
            r = _run_rep(entry_mod, spark, args.sf_dir)
            print(f"  warmup {w} {tag} (discarded): {r}", file=sys.stderr)

    results: dict[str, list[dict[str, float]]] = {t: [] for t in arm_names}
    # interleave, rotating which arm leads each round, so slow drift
    # within the session (heap growth, code cache) also cancels
    for rep in range(args.reps):
        order = arm_names[rep % 3:] + arm_names[:rep % 3]
        for tag in order:
            entry_mod = _load_variant(variants[tag])
            r = _run_rep(entry_mod, spark, args.sf_dir)
            results[tag].append(r)
            print(f"  rep {rep} {tag}: {r}", file=sys.stderr)

    keys = sorted({k for reps in results.values() for r in reps for k in r})
    summary = {}
    print(f"\n{'query':<28}{'baseline':>10}{'head':>10}{'delta%':>9}{'noise%':>9}")
    for k in keys:
        b = statistics.median([r[k] for r in results["baseline"] if k in r])
        h = statistics.median([r[k] for r in results["head"] if k in r])
        c = statistics.median([r[k] for r in results["control"] if k in r])
        # PAIRED per-rep deltas: arms run back-to-back within a rep, so
        # each rep's head-vs-baseline ratio sees the same session state
        paired = [
            100.0 * (rh[k] - rb[k]) / rb[k]
            for rb, rh in zip(results["baseline"], results["head"])
            if k in rb and k in rh and rb[k]
        ]
        control_deltas = [
            100.0 * (rc[k] - rh[k]) / rh[k]
            for rh, rc in zip(results["head"], results["control"])
            if k in rh and k in rc and rh[k]
        ]
        delta = statistics.median(paired) if paired else float("nan")
        # the noise floor is UNSIGNED: the control arm is byte-identical
        # to head, so the LARGEST |control delta| observed this session
        # is the smallest code-attributable effect size.  (The r13 run
        # compared a signed net control delta against a positive head
        # delta — one-sided session drift made identical code read as a
        # +14-21% regression.)  A head delta is attributable only when
        # every paired rep agrees in sign AND each exceeds that floor —
        # a byte-identical-arms run passes this ~99% of the time by
        # construction (3-of-6 smallest |samples| all landing in the
        # control set, times the one-in-four all-same-sign chance).
        noise = max((abs(x) for x in control_deltas), default=float("nan"))
        above = bool(
            paired
            and control_deltas
            and (all(x > 0 for x in paired) or all(x < 0 for x in paired))
            and min(abs(x) for x in paired) > noise
        )
        summary[k] = {"baseline_median_s": round(b, 3), "head_median_s": round(h, 3),
                      "control_median_s": round(c, 3),
                      "delta_pct": round(delta, 1),
                      "paired_deltas_pct": [round(x, 1) for x in paired],
                      "control_deltas_pct": [round(x, 1) for x in control_deltas],
                      "noise_floor_pct": round(noise, 1),
                      "delta_above_noise": above}
        print(f"{k:<28}{b:>10.3f}{h:>10.3f}{delta:>8.1f}%{noise:>8.1f}%")

    payload = {
        "baseline_rev": (
            "WORKING_TREE(self-check)" if args.self_check
            else args.baseline_rev
        ),
        "self_check_all_arms_identical": args.self_check,
        "reps": args.reps,
        "sf_dir": args.sf_dir,
        "interleaved_same_session": True,
        "control_is_byte_identical_head": True,
        "summary": summary,
        "raw": results,
    }
    with open(os.path.join(REPO, "tools", "AB_BENCH_RESULT.json"), "w") as f:
        json.dump(payload, f)
        f.write("\n")
    print(json.dumps({"ab_bench": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
