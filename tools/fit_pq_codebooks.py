"""Deterministic per-subspace k-means fit for the q78 product-quantization
codebooks.

Provenance tool: the `_PQ_CODEBOOKS` literals in ``plans/vector_pq.py`` are
the output of this script run against
``/root/testdata/sf0.01/embeddings.parquet``.  The fit is snapshotted into
source so the DuckDB oracle and the Spark plan share byte-identical
literals (the `_CENTROIDS` / `_MINHASH_A/_B` pattern).

Product quantization splits the 64-dim embedding into M=16 contiguous
subspaces of 4 dims and fits an independent K=16-codeword L2 k-means per
subspace; a vector is stored as 16 4-bit codes (64 bits — 8 B/vector in the scan path vs SQ8's 64 B and
float32's 256 B).  Unlike the coarse IVF codebook (spherical k-means on
the unit sphere), PQ clusters RAW subvectors under L2 — reconstruction
error, not direction, is what asymmetric-distance search pays for.

Deterministic by construction: fixed seed, fixed iteration cap, ties
broken by lowest index; re-running reproduces the literals exactly
(tests/test_pq_fit_reproducible.py).

At 100 TB the identical fit runs per-subspace over a deterministic sample
with the same machinery as ``plans/ivf_fit.py`` (subspace slicing is a
narrow projection; each subspace fit is an independent 8-dim k-means over
the sample).

Usage:  python tools/fit_pq_codebooks.py [parquet_path]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

M = 16  # subspaces
SUB = 4  # dims per subspace
K = 16  # codewords per subspace
SEED = 7
ITERS = 25


def fit(path: str) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    assert x.shape[1] == M * SUB, x.shape

    books = np.zeros((M, K, SUB))
    for s in range(M):
        xs = x[:, s * SUB : (s + 1) * SUB]
        rng = np.random.default_rng(SEED + s)
        cents = xs[rng.choice(len(xs), K, replace=False)].copy()
        for _ in range(ITERS):
            # L2 assignment; argmin ties -> lowest index (numpy argmin)
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            new = cents.copy()
            for j in range(K):
                members = xs[assign == j]
                if len(members):
                    new[j] = members.mean(0)
            if np.allclose(new, cents):
                break
            cents = new
        books[s] = cents
    return np.round(books, 6)


def print_literals(books: np.ndarray) -> None:
    print("_PQ_CODEBOOKS = [")
    for s in range(books.shape[0]):
        print("    [  # subspace %d" % s)
        for c in books[s]:
            vals = ", ".join(f"{v:.6f}" for v in c)
            print(f"        [{vals}],")
        print("    ],")
    print("]")


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--spark":
        # the distributed fit (plans/pq_fit.py) printing the same literal
        # block — tests/test_pq_fit_spark.py pins both producers agree
        sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
        import os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from pyspark.sql import SparkSession

        from supermusr_data_pipeline_spark.plans.pq_fit import fit_pq_codebooks_spark

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        try:
            print_literals(fit_pq_codebooks_spark(spark, sf_dir))
        finally:
            spark.stop()
        return
    path = args[0] if args else "/root/testdata/sf0.01/embeddings.parquet"
    print_literals(fit(path))


if __name__ == "__main__":
    main()
