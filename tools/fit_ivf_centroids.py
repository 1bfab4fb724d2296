"""Deterministic spherical k-means fit for the q29 IVF codebook.

Provenance tool: the `_CENTROIDS` literals in ``plans/text_dedup.py`` are the
output of this script run against ``/root/testdata/sf0.01/embeddings.parquet``.
At real scale the same fit runs as a Spark job over a sampled slice of the
embedding table and the codebook is broadcast; here the fit is snapshotted
into source so the DuckDB oracle and the Spark plan share byte-identical
literals (the same pattern as `_MINHASH_A/_B`).

Deterministic by construction: fixed seed, fixed iteration cap, sample-free
(sf0.01 is already small), ties broken by lowest index.  Re-running this
script reproduces the literals exactly.

Usage:  python tools/fit_ivf_centroids.py [parquet_path]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

K = 8
SEED = 7
ITERS = 40


def fit(path: str) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1)[:, None]

    rng = np.random.default_rng(SEED)
    centroids = x[rng.choice(len(x), K, replace=False)].copy()
    centroids /= np.linalg.norm(centroids, axis=1)[:, None]
    for _ in range(ITERS):
        assign = (x @ centroids.T).argmax(1)
        new = centroids.copy()
        for j in range(K):
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


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01/embeddings.parquet"
    centroids = fit(path)
    print("_CENTROIDS = [")
    for c in centroids:
        vals = ", ".join(f"{v:.6f}" for v in c)
        print(f"    [{vals}],")
    print("]")


if __name__ == "__main__":
    main()
