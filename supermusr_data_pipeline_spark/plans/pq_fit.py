"""Distributed per-subspace k-means fit for the PQ codebooks (q78/q83).

The `_PQ_CODEBOOKS` snapshot in ``plans/vector_pq.py`` is produced by
``tools/fit_pq_codebooks.py`` — a driver-side numpy script that breaks the
moment the corpus outgrows the driver.  This module is the 100 TB path:
the IDENTICAL algorithm (same per-subspace seeds, init-row selection,
L2-argmin tie-breaks, allclose convergence semantics, numpy arithmetic)
run as a Spark job, so the fit at sf0.01 reproduces the snapshot literals
byte-for-byte (``tests/test_pq_fit_spark.py`` pins this).  The exactness
argument is ``plans/ivf_fit.py``'s, extended to 16 independent subspaces
fitted in ONE distributed pass per iteration:

- Assignment is a PER-ROW numpy computation inside Arrow batches
  (``((xs[:,None,:]-cents[None,:,:])**2).sum(-1).argmin(1)`` — the tool's
  exact expression, batch-height independent, argmin ties -> lowest
  index).  All 16 subspaces assign in the same map pass.
- Per-(subspace, cluster) means gather each cluster's members into one
  pandas group, sort by vec_id (the tool's implicit order), and call the
  same ``members.mean(0)`` — identical pairwise summation over the
  identical row order.
- The tool breaks a subspace's loop when ``allclose(new, cents)`` WITHOUT
  adopting ``new``; converged subspaces here freeze at the same iteration
  with the same retained values.
- Seed rows are positions in vec_id order drawn from
  ``default_rng(SEED + s)`` per subspace, collected once.

Scale shape: one narrow float64 pass materialized (persisted, released in
a finally), then per iteration one narrow assign map + one shuffle on
(subspace, cluster) (<= M*K = 256 cells) + a 256-row collect.  The
deterministic stride sample (`max_sample`) bounds the fit input exactly
as in ``ivf_fit``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .vector_pq import _PQ_K, _PQ_M, _PQ_SUB

SEED = 7
ITERS = 25


def fit_pq_codebooks_spark(
    spark: SparkSession,
    sf_dir: str,
    seed: int = SEED,
    iters: int = ITERS,
    max_sample: Optional[int] = None,
) -> np.ndarray:
    """Fit all M per-subspace codebooks distributed; returns the rounded
    (M, K, SUB) array — ``tools/fit_pq_codebooks.fit``'s output."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    if max_sample is not None and n > max_sample:
        stride = -(-n // max_sample)  # ceil
        e = e.filter(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0)
        n = e.count()
    if n < _PQ_K:
        raise ValueError(f"cannot fit {_PQ_K} codewords from {n} vectors")

    def to_f64(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "x": list(x)})

    rows = e.mapInPandas(to_f64, "vec_id bigint, x array<double>").persist()
    rows.count()
    try:
        # per-subspace seed positions (vec_id order), one collect for all.
        # The global row_number below runs over `rows`, already capped to
        # ~max_sample rows by the stride filter above — a bounded input
        # (fit jobs sit outside the registry plan audit, so the bound is
        # stated here; callers fitting an unbounded corpus MUST pass
        # max_sample).
        seed_idx = [
            np.random.default_rng(seed + s).choice(n, _PQ_K, replace=False)
            for s in range(_PQ_M)
        ]
        wanted = sorted({int(i) for idx in seed_idx for i in idx})
        pos = (
            rows.withColumn("rn", F.row_number().over(Window.orderBy("vec_id")) - 1)
            .filter(F.col("rn").isin(wanted))
            .collect()
        )
        by_rn = {r.rn: np.array(r.x, dtype=np.float64) for r in pos}
        books = np.stack(
            [
                np.stack(
                    [
                        by_rn[int(i)][s * _PQ_SUB : (s + 1) * _PQ_SUB]
                        for i in seed_idx[s]
                    ]
                )
                for s in range(_PQ_M)
            ]
        )
        frozen = [False] * _PQ_M

        mean_schema = "subspace int, cluster int, mean array<double>"

        def mean_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("vec_id")
            members = np.stack(pdf["xs"].to_numpy())
            return pd.DataFrame(
                {
                    "subspace": [int(pdf["subspace"].iloc[0])],
                    "cluster": [int(pdf["cluster"].iloc[0])],
                    "mean": [members.mean(0)],
                }
            )

        for _ in range(iters):
            if all(frozen):
                break
            bks = books.copy()
            active = [s for s in range(_PQ_M) if not frozen[s]]

            def assign_fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in pdfs:
                    if not len(pdf):
                        continue
                    x = np.stack(pdf["x"].to_numpy())
                    out_vec, out_s, out_c, out_xs = [], [], [], []
                    for s in active:
                        xs = x[:, s * _PQ_SUB : (s + 1) * _PQ_SUB]
                        cents = bks[s]
                        d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
                        a = d2.argmin(1)
                        out_vec.append(pdf["vec_id"].to_numpy())
                        out_s.append(np.full(len(xs), s))
                        out_c.append(a)
                        out_xs.extend(list(xs))
                    yield pd.DataFrame(
                        {
                            "vec_id": np.concatenate(out_vec),
                            "subspace": np.concatenate(out_s),
                            "cluster": np.concatenate(out_c),
                            "xs": out_xs,
                        }
                    )

            means = (
                rows.mapInPandas(
                    assign_fn,
                    "vec_id bigint, subspace int, cluster int, xs array<double>",
                )
                .groupBy("subspace", "cluster")
                .applyInPandas(mean_fn, mean_schema)
                .collect()
            )
            new = books.copy()
            for r in means:
                new[r.subspace][r.cluster] = np.array(r["mean"], dtype=np.float64)
            for s in active:
                if np.allclose(new[s], books[s]):
                    # the tool breaks WITHOUT adopting `new` — retain old
                    frozen[s] = True
                else:
                    books[s] = new[s]
        return np.round(books, 6)
    finally:
        rows.unpersist()
