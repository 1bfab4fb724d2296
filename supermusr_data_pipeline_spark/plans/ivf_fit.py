"""Distributed spherical k-means codebook fit for the IVF index (q29/q51).

The `_CENTROIDS` snapshot in ``plans/text_dedup.py`` is produced by
``tools/fit_ivf_centroids.py`` — a driver-side numpy script that is fine at
sf0.01 but breaks the moment the corpus outgrows the driver.  This module
is the promised 100 TB path: the IDENTICAL algorithm (same seed, same
init-row selection, same iteration / tie-break / convergence semantics,
same numpy arithmetic) run as a Spark job, so the Spark fit at sf0.01
reproduces the snapshot literals byte-for-byte
(``tests/test_ivf_fit_spark.py`` pins this).

Exactness argument — why a distributed run can match a single numpy run:

- Normalization and cluster assignment are PER-ROW numpy ops inside Arrow
  batches; a row's result does not depend on which batch it rides in
  (the k=64 dot accumulates in one fused pass regardless of batch height).
- Per-cluster means gather each cluster's members into ONE pandas group,
  sort them by vec_id (the tool's implicit order — its matrix is loaded
  ``ORDER BY vec_id`` and boolean-mask selection preserves order), and call
  the same ``members.mean(0)`` — identical pairwise summation over the
  identical row order.
- The k seed rows, centroid renormalization, the ``allclose`` convergence
  check, and the final rounding happen on the driver with the exact
  expressions of the tool (k×dim values — trivially collectable).

Scale shape: one narrow normalize pass materialized once (persisted),
then per iteration one narrow assignment map + one shuffle on cluster id
(≤ k cells) + a k×dim collect.  The fit runs over a DETERMINISTIC sample
(`max_sample`): a stride filter on xxhash64(vec_id) — reproducible under
retries, no sort, no driver materialization of the corpus.  The global
row_number for seed selection sorts the SAMPLE, not the corpus.

Reference: the codebook consumed by q29/q47/q48/q51
(``plans/text_dedup.py``); provenance twin ``tools/fit_ivf_centroids.py``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table

K = 8
SEED = 7
ITERS = 40


def _normalized_rows(e: DataFrame) -> DataFrame:
    """Unit-normalize embeddings row-wise in float64 — the tool's
    ``x /= norm(x, axis=1)``, batch-height independent."""

    def norm_fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            x /= np.linalg.norm(x, axis=1)[:, None]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "x": list(x)}
            )

    return e.mapInPandas(norm_fn, "vec_id bigint, x array<double>")


def fit_ivf_centroids_spark(
    spark: SparkSession,
    sf_dir: str,
    k: int = K,
    seed: int = SEED,
    iters: int = ITERS,
    max_sample: Optional[int] = None,
) -> np.ndarray:
    """Fit the spherical k-means codebook as a Spark job and return the
    rounded (k, dim) centroid matrix — ``tools/fit_ivf_centroids.py``'s
    output, distributed.  With ``max_sample`` set, corpora larger than the
    cap are stride-sampled deterministically first (the honest trade every
    production IVF fit makes); with the sample covering the full table the
    result is byte-identical to the driver tool."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    if max_sample is not None and n > max_sample:
        stride = -(-n // max_sample)  # ceil
        e = e.filter(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0)
        n = e.count()
    if n < k:
        raise ValueError(f"cannot fit {k} centroids from {n} vectors")

    # persist (not localCheckpoint): the per-iteration lineage is constant —
    # centroids travel via the driver — so there is nothing to truncate, and
    # persist() is releasable in the finally (no orphaned checkpoint RDDs)
    normalized = _normalized_rows(e).persist()
    normalized.count()
    try:
        # seed rows: positions in vec_id order, chosen exactly as the tool.
        # The global (unpartitioned) row_number below runs over `normalized`,
        # which the stride filter above has already capped to ~max_sample
        # rows — a BOUNDED input, the same contract the plan audit's
        # bound-named window whitelist encodes for registry queries (fit
        # jobs sit outside the audit, so the bound is stated here; callers
        # fitting an unbounded corpus MUST pass max_sample).
        rng = np.random.default_rng(seed)
        idx = rng.choice(n, k, replace=False)
        pos = (
            normalized.withColumn(
                "rn", F.row_number().over(Window.orderBy("vec_id")) - 1
            )
            .filter(F.col("rn").isin([int(i) for i in idx]))
            .collect()
        )
        by_rn = {r.rn: np.array(r.x, dtype=np.float64) for r in pos}
        centroids = np.stack([by_rn[int(i)] for i in idx])
        centroids /= np.linalg.norm(centroids, axis=1)[:, None]

        mean_schema = "cluster int, mean array<double>, members bigint"

        def mean_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("vec_id")
            members = np.stack(pdf["x"].to_numpy())
            v = members.mean(0)
            return pd.DataFrame(
                {
                    "cluster": [int(pdf["cluster"].iloc[0])],
                    "mean": [v],
                    "members": [len(members)],
                }
            )

        for _ in range(iters):
            cen = centroids.copy()

            def assign_fn(
                pdfs: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                for pdf in pdfs:
                    if not len(pdf):
                        continue
                    x = np.stack(pdf["x"].to_numpy())
                    # the tool's exact expression shape: C-contiguous
                    # codebook, transposed view — same BLAS path
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "x": list(x),
                            "cluster": (x @ cen.T).argmax(1),
                        }
                    )

            means = (
                normalized.mapInPandas(
                    assign_fn, "vec_id bigint, x array<double>, cluster int"
                )
                .groupBy("cluster")
                .applyInPandas(mean_fn, mean_schema)
                .collect()
            )
            new = centroids.copy()
            for r in means:
                v = np.array(r["mean"], dtype=np.float64)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    new[r.cluster] = v / nrm
            if np.allclose(new, centroids):
                break
            centroids = new
        return np.round(centroids, 6)
    finally:
        normalized.unpersist()
