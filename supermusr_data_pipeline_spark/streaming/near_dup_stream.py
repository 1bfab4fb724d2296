"""Streaming MinHash-LSH near-duplicate detection — the streaming lift of
the batch q25 pipeline (the near-dup analog of ``doc_dedup``'s exact-dedup
lift, and the document-side cousin of the frame layer's J5/T6 duplicate
rejection, digitiser-aggregator/src/frame/cache.rs:71-74).

Recipe lockstep: signatures reuse the BATCH module's expressions verbatim
(token hashing, the 16-permutation MinHash family, 4×4 banding, Jaccard
≥ 0.5 verify — ``plans/text_dedup.py``), so batch and stream agree on what
"a near-duplicate" is by construction; ``near_dup_pairs_batch`` runs the
equivalent transformation on a static frame for parity testing.

Scale/state design:

- Signature computation is a NARROW per-row map (JVM higher-order
  functions, no Python, no shuffle) — stream-safe at any rate.
- Candidate matching + verification is ONE stateful operator:
  ``applyInPandasWithState`` keyed by (band_no, band key).  Each bucket's
  state holds the rows admitted within the event-time horizon (id,
  timestamp, all four band keys, token-hash set), capped at
  ``_LSH_BUCKET_CAP`` — the streaming mirror of the batch stop-bucket
  guard (``text_dedup.py`` ``_LSH_BUCKET_CAP``): a boilerplate band key at
  production rate can no longer make join state or pair output quadratic
  within the horizon; occupancy is bounded at cap rows per bucket and
  pair output at cap² per bucket per horizon.  Admission is deterministic
  (first ``cap`` rows by (event time, doc_id)); rows beyond the cap are
  dropped for that band only.  The batch tier (q25) handles the same hot
  buckets by STAR-LINKING members to a representative instead — bounded
  cost with full family connectivity — so the lambda reconciliation below
  is also what restores cluster membership the stream's admission cap
  traded away inside a horizon.
- Cross-band pair dedup needs NO second stateful operator: every banded
  row carries all four band keys, and a verified pair is emitted only by
  the LOWEST band on which the two signatures collide.  Each other
  colliding band sees the same two key arrays and stays silent, so a pair
  is emitted exactly once per horizon by construction.  (A downstream
  ``dropDuplicatesWithinWatermark`` would require chaining a stateful op
  after ``applyInPandasWithState``, which Spark's global-watermark
  correctness checker rightly rejects — the emitter design avoids the
  chain instead of disabling the check.)
- State eviction is event-time: an entry whose timestamp has fallen more
  than the horizon behind the watermark can never pair with a future
  non-late row and is pruned on access and by EventTimeTimeout timers, so
  an idle bucket's state is removed entirely.  A near-duplicate arriving
  after its partner aged out of the horizon is missed by the stream, and
  cross-window completeness is the batch job's (q25/q42) responsibility in
  the lambda split — see ``near_dup_reconcile``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ..plans.text_dedup import (
    _LSH_BUCKET_CAP,
    _minhash_cols_spark,
    _N_BANDS,
    _ROWS_PER_BAND,
    _TOKENS_EXPR_SPARK,
    _TOKHASH_SPARK,
)

_JACCARD_THRESHOLD = 0.5

_PAIR_SCHEMA = "doc_a bigint, doc_b bigint, jaccard double, pair_ts timestamp"
# parallel arrays, one slot per admitted row: id, event-time ms, the row's
# four band keys (for lowest-common-band pair ownership), token hashes
_STATE_SCHEMA = (
    "ids array<bigint>, tss array<bigint>, "
    "keys array<array<string>>, ths array<array<bigint>>"
)


def banded_signatures(docs: DataFrame, ts_col: str = "ingest_ts") -> DataFrame:
    """Distinct-token hashes + MinHash signature + banded LSH keys, as a
    narrow map (one output row per (doc, band)).  Identical expressions to
    the batch q25 recipe; every row also carries the full ``keys`` array
    (all bands) so the pair emitter can assign cross-band ownership."""
    th = F.expr(
        "transform(array_distinct({toks}), t -> {h})".format(
            toks=_TOKENS_EXPR_SPARK, h=_TOKHASH_SPARK.format(t="t")
        )
    )
    sigs = (
        docs.withColumn("th", th)
        .filter(F.size("th") > 0)
        .select("doc_id", ts_col, "th", *_minhash_cols_spark())
    )
    key_cols = []
    for bnd in range(_N_BANDS):
        parts = [
            F.col(f"mh{bnd * _ROWS_PER_BAND + r:02d}").cast("string")
            for r in range(_ROWS_PER_BAND)
        ]
        key_cols.append(F.md5(F.concat_ws(",", *parts)).alias(f"key{bnd}"))
    keyed = sigs.select("doc_id", ts_col, "th", *key_cols).withColumn(
        "keys", F.array(*[F.col(f"key{b}") for b in range(_N_BANDS)])
    )
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band_no"), F.col(f"key{b}").alias("key"))
            for b in range(_N_BANDS)
        ]
    )
    return keyed.select(
        "doc_id", ts_col, "th", "keys", F.explode(bands).alias("bk")
    ).select(
        "doc_id",
        ts_col,
        "th",
        "keys",
        F.col("bk.band_no").alias("band_no"),
        F.col("bk.key").alias("key"),
    )


def _horizon_ms(horizon: str) -> int:
    qty, unit = horizon.split()
    scale = {
        "second": 1_000,
        "seconds": 1_000,
        "minute": 60_000,
        "minutes": 60_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
    }[unit]
    return int(qty) * scale


def _make_pair_emitter(horizon_ms: int, bucket_cap: int):
    """Build the per-bucket stateful function.  Bound at scale: state ≤
    ``bucket_cap`` rows per (band, key); pair output ≤ cap² per bucket per
    horizon; everything beyond the cap is dropped (stop-bucket guard)."""

    def emit_pairs(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()

        def load_live():
            got = state.getOption
            if got is None:
                return []
            ids, tss, keys, ths = got
            return [
                (int(i), int(t), list(k), set(int(x) for x in h))
                for i, t, k, h in zip(ids, tss, keys, ths)
                if int(t) + horizon_ms >= wm
            ]

        def store(live):
            if live:
                state.update(
                    (
                        [e[0] for e in live],
                        [e[1] for e in live],
                        [e[2] for e in live],
                        [sorted(e[3]) for e in live],
                    )
                )
                # an entry is dead once the watermark passes its ts + horizon
                state.setTimeoutTimestamp(min(e[1] for e in live) + horizon_ms + 1)
            else:
                state.remove()

        if state.hasTimedOut:
            store(load_live())
            return

        band_no = int(key[0])
        live = load_live()
        seen = {e[0] for e in live}
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.itertuples(index=False))
        # deterministic admission order — the batch oracle sorts identically
        rows.sort(key=lambda r: (r.ts_ms, r.doc_id))
        out = []
        for r in rows:
            doc_id, ts_ms = int(r.doc_id), int(r.ts_ms)
            if doc_id in seen:  # at-least-once redelivery guard
                continue
            if ts_ms < wm:  # late beyond the allowed delay, as the join dropped
                continue
            if len(live) >= bucket_cap:  # stop-bucket cap: drop, don't pair
                continue
            rk = list(r.keys)
            th_r = set(int(x) for x in r.th)
            for pid, pts, pk, th_p in live:
                if abs(ts_ms - pts) > horizon_ms:
                    continue
                # lowest colliding band owns the pair (cross-band dedup)
                first_common = next(
                    j for j in range(_N_BANDS) if rk[j] == pk[j]
                )
                if first_common != band_no:
                    continue
                inter = len(th_r & th_p)
                union = len(th_r) + len(th_p) - inter
                jac = inter / union
                if jac >= _JACCARD_THRESHOLD:
                    lo, hi = (doc_id, pid) if doc_id < pid else (pid, doc_id)
                    out.append((lo, hi, jac, ts_ms))
            live.append((doc_id, ts_ms, rk, th_r))
            seen.add(doc_id)
        store(live)
        if out:
            yield pd.DataFrame(
                {
                    "doc_a": [o[0] for o in out],
                    "doc_b": [o[1] for o in out],
                    "jaccard": [o[2] for o in out],
                    "pair_ts": pd.to_datetime([o[3] for o in out], unit="ms"),
                }
            )

    return emit_pairs


def near_dup_pairs_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    horizon: str = "10 minutes",
    bucket_cap: int = _LSH_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate pairs over a streaming documents source.

    ``docs`` needs (doc_id, text, ``ts_col``).  Returns (doc_a, doc_b,
    jaccard, pair_ts) for verified near-dups whose arrivals fall within
    ``horizon`` of each other, emitted exactly once (lowest-colliding-band
    ownership — no downstream dedup state needed).  Per-bucket state and
    pair output are bounded by ``bucket_cap`` (the batch stop-bucket
    guard's streaming mirror)."""
    banded = banded_signatures(docs, ts_col).withWatermark(ts_col, horizon)
    prepared = banded.select(
        "doc_id",
        "th",
        "keys",
        "band_no",
        "key",
        F.col(ts_col).alias("ts"),
        (F.col(ts_col).cast("double") * 1000).cast("bigint").alias("ts_ms"),
    )
    return prepared.groupBy("band_no", "key").applyInPandasWithState(
        _make_pair_emitter(_horizon_ms(horizon), bucket_cap),
        outputStructType=_PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def near_dup_pairs_batch(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    horizon: str | None = "10 minutes",
    bucket_cap: int = _LSH_BUCKET_CAP,
) -> DataFrame:
    """The equivalent transformation on a static frame — the parity oracle
    for the stream, sharing ``banded_signatures`` verbatim and mirroring
    the cap with the SAME deterministic admission rule (first ``cap`` rows
    per bucket by (event time, doc_id) — a window-rank truncation here,
    arrival-order truncation there), so stream == batch holds on any tape
    whose rows fall within one horizon, including degenerate hot buckets.

    ``horizon=None`` removes the time bound entirely: pairs anywhere on the
    tape, the full-corpus q25 recipe — this is the authoritative pass the
    lambda backfill (``near_dup_reconcile``) runs over the day's tape."""
    from pyspark.sql import Window

    banded = banded_signatures(docs, ts_col)
    rank = F.row_number().over(
        Window.partitionBy("band_no", "key").orderBy(F.col(ts_col), F.col("doc_id"))
    )
    capped = banded.withColumn("rk", rank).filter(F.col("rk") <= bucket_cap)
    a = capped.alias("a")
    b = capped.alias("b")
    ats, bts = F.col(f"a.{ts_col}"), F.col(f"b.{ts_col}")
    cond = (
        (F.col("a.band_no") == F.col("b.band_no"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    if horizon is not None:
        cond = (
            cond
            & (bts >= ats - F.expr(f"INTERVAL {horizon}"))
            & (bts <= ats + F.expr(f"INTERVAL {horizon}"))
        )
    joined = a.join(b, cond)
    inter = F.size(F.array_intersect("a.th", "b.th"))
    union = F.size("a.th") + F.size("b.th") - inter
    jac = inter.cast("double") / union
    return (
        joined.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
            F.least(ats, bts).alias("pair_ts"),
        )
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def near_dup_reconcile(
    stream_pairs: DataFrame,
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    bucket_cap: int = _LSH_BUCKET_CAP,
) -> DataFrame:
    """Lambda reconciliation: close the stream's documented recall holes
    with a batch backfill over the same tape.

    The stream trades completeness for bounded state twice — a pair whose
    partner aged out of the horizon is missed, and a pair landing past the
    stop-bucket cap is dropped.  The lambda split's promise is that a
    nightly batch pass restores completeness: run the SAME recipe with no
    time bound (``near_dup_pairs_batch(horizon=None)`` — the full-corpus
    q25 pass) over the day's tape and reconcile against what the stream
    already emitted.

    Returns one row per pair in the union, ids-deduped, with provenance:

    * ``both``        — stream found it; downstream effects already applied
    * ``backfill``    — only the batch pass found it (aged-out partner or
                        capped bucket); downstream must apply it now
    * ``stream_only`` — the stream emitted a pair the authoritative pass
                        does not contain; impossible when both sides share
                        the recipe and cap (stream ⊆ batch by construction)
                        so any row here is an alarm, not data

    ``jaccard``/``pair_ts`` come from the batch side when present (the
    authoritative scores), falling back to the stream's values for
    ``stream_only`` anomalies.

    Scale shape: the tape pass is the standard q25 plan (banded buckets,
    cap, ids-only pair shuffle); the reconcile join is pair-id against
    pair-id — two tables orders of magnitude smaller than the corpus, one
    shuffle on (doc_a, doc_b).  Reference analog: the nexus-writer resumes
    a run after a gap by replaying from the tape rather than trusting the
    live feed (nexus-writer/src/run_engine/engine.rs:144-173)."""
    full = near_dup_pairs_batch(docs, ts_col, horizon=None, bucket_cap=bucket_cap)
    seen = stream_pairs.select(
        "doc_a",
        "doc_b",
        F.col("jaccard").alias("s_jaccard"),
        F.col("pair_ts").alias("s_pair_ts"),
    ).dropDuplicates(["doc_a", "doc_b"])
    return full.join(seen, ["doc_a", "doc_b"], "full_outer").select(
        "doc_a",
        "doc_b",
        F.coalesce("jaccard", "s_jaccard").alias("jaccard"),
        F.coalesce("pair_ts", "s_pair_ts").alias("pair_ts"),
        F.when(F.col("jaccard").isNull(), F.lit("stream_only"))
        .when(F.col("s_jaccard").isNull(), F.lit("backfill"))
        .otherwise(F.lit("both"))
        .alias("source"),
    )
