"""Deterministic spherical k-means fit for the q29 IVF codebook.

Provenance tool: the `_CENTROIDS` literals in ``plans/text_dedup.py`` are the
output of this script run against ``/root/testdata/sf0.01/embeddings.parquet``.
The fit is snapshotted into source so the DuckDB oracle and the Spark plan
share byte-identical literals (the same pattern as `_MINHASH_A/_B`).

At real scale the identical fit runs as a Spark job —
``plans/ivf_fit.fit_ivf_centroids_spark`` — over a deterministic sample of
the embedding table; ``--spark`` runs that job here and prints the same
literal block (``tests/test_ivf_fit_spark.py`` pins that both producers
agree byte-for-byte at sf0.01).

Deterministic by construction: fixed seed, fixed iteration cap, sample-free
(sf0.01 is already small), ties broken by lowest index.  Re-running this
script reproduces the literals exactly.

Usage:  python tools/fit_ivf_centroids.py [parquet_path]
        python tools/fit_ivf_centroids.py --spark [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

K = 8
SEED = 7
ITERS = 40


def fit(path: str, k: int = K) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1)[:, None]

    rng = np.random.default_rng(SEED)
    centroids = x[rng.choice(len(x), k, replace=False)].copy()
    centroids /= np.linalg.norm(centroids, axis=1)[:, None]
    for _ in range(ITERS):
        assign = (x @ centroids.T).argmax(1)
        new = centroids.copy()
        for j in range(k):
            members = x[assign == j]
            if len(members):
                v = members.mean(0)
                n = np.linalg.norm(v)
                if n > 0:
                    new[j] = v / n
        if np.allclose(new, centroids):
            break
        centroids = new
    return np.round(centroids, 6)


def _print_literals(centroids: np.ndarray) -> None:
    print("_CENTROIDS = [")
    for c in centroids:
        vals = ", ".join(f"{v:.6f}" for v in c)
        print(f"    [{vals}],")
    print("]")


def main() -> None:
    args = sys.argv[1:]
    k = K
    if "--k" in args:
        i = args.index("--k")
        k = int(args[i + 1])
        del args[i : i + 2]
    if args and args[0] == "--spark":
        sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
        import os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from pyspark.sql import SparkSession

        from supermusr_data_pipeline_spark.plans.ivf_fit import (
            fit_ivf_centroids_spark,
        )

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        _print_literals(fit_ivf_centroids_spark(spark, sf_dir, k=k))
        spark.stop()
        return
    path = args[0] if args else "/root/testdata/sf0.01/embeddings.parquet"
    _print_literals(fit(path, k=k))


if __name__ == "__main__":
    main()
