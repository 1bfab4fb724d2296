"""Index-backed streaming shard ingestion: the admission gate (q94) as a
continuous front door over the persisted LSH index (q82).

Each micro-batch of arriving documents is checked against the STANDING
index — not against recomputed history: batch signatures are a narrow
map over the batch only, candidates come from the index's band-bucket
parquet, and verified near-dups (of the base, or of an earlier peer in
the same batch) are dropped.  Admitted documents are APPENDED to the
index inside the same foreachBatch transaction, so the NEXT micro-batch
deduplicates against them — cross-batch dedup emerges from index growth,
with no unbounded stream state at all (the index IS the state, on disk,
shared with every batch consumer).

This composes the round's incremental pieces into the shape a production
ingest actually runs: near_dup_stream answers "which pairs arrived close
together" with watermarked in-memory state; THIS path answers "may this
document enter the corpus" against the full standing index.

Failure semantics: foreachBatch may re-run a batch after a crash, so the
append must be idempotent.  A per-batch marker file under the index root
guards the append (the same write-once discipline as the nexus sink's
completed-file lifecycle, operators/nexus_sink.py) and records the ids
that attempt admitted, so the re-run excludes exactly its own appended
rows and recomputes byte-identical decisions; decisions land in a
`batch_id`-partitioned parquet so re-runs overwrite their own partition
instead of duplicating rows.  An at-least-once SOURCE is also handled: a
doc_id redelivered in a LATER batch is found in the standing index and
short-circuits to `already_ingested` / admit=false instead of appending
a duplicate index row.

Scale shape per batch: one narrow signature pass over the batch, one
equi-join against bucket-truncated index bands (cap mirrors
_LSH_BUCKET_CAP — a boilerplate bucket's representative is always inside
the truncation, so template families still block admission), one
batch-internal self-join bounded the same way, and an append of the
admitted slice.  The verification-token artifact is tb=hash(doc_id)
bucketed, so both token probes (candidate verification + redelivery
presence) carry literal partition filters and read only the touched
directories.  Nothing scans the base corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.text_dedup import _LSH_BUCKET_CAP, _TOKENS_EXPR_SPARK, _TOKHASH_SPARK
from ..plans.incremental import _banded, _tok_bucket
from ..plans.text_dedup import _minhash_cols_spark

_JACCARD = 0.5


def _batch_artifacts(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(tokens, bands) for an arbitrary docs frame — the q82 index recipe
    applied to a micro-batch (no sf_dir, no event-time column needed)."""
    th = F.expr(
        "transform(array_distinct({toks}), t -> {h})".format(
            toks=_TOKENS_EXPR_SPARK, h=_TOKHASH_SPARK.format(t="t")
        )
    )
    base = docs.withColumn("th", th).filter(F.size("th") > 0)
    tokens = base.select("doc_id", "th")
    bands = _banded(base.select("doc_id", *_minhash_cols_spark()))
    return tokens, bands


def admit_batch(
    batch_docs: DataFrame,
    index_path: str,
    bucket_cap: int = _LSH_BUCKET_CAP,
    self_appended: list | None = None,
) -> DataFrame:
    """Admission decisions for one micro-batch against the standing index:
    (doc_id, already_ingested, dups_base, dups_earlier_peer, admit,
    reason) — q94's output contract, computed from the persisted
    artifacts.

    ``self_appended`` is the crash-retry knob: on a foreachBatch re-run
    whose first attempt already appended to the index, pass the ids THAT
    ATTEMPT admitted (the batch marker records them).  Exactly those rows
    are excluded from the index side — BEFORE the bucket cap, so
    truncation picks the same survivors — which makes the recompute
    byte-identical to the original decisions.  Everything else found in
    the index under a batch doc_id must have been ingested by an EARLIER
    batch (an at-least-once source redelivering), and short-circuits to
    ``already_ingested`` / admit=false instead of re-admitting a
    duplicate index row."""
    spark = batch_docs.sparkSession
    tokens, bands = _batch_artifacts(batch_docs)
    batch_ids = batch_docs.select("doc_id").distinct()
    idx_bands = spark.read.parquet(os.path.join(index_path, "bands")).select(
        "doc_id", F.col("band_no").cast("int").alias("band_no"), "key"
    )
    # the tokens artifact is tb=hash(doc_id)-bucketed (write_lsh_index):
    # every read below carries a LITERAL bucket filter derived from the
    # doc_ids it actually needs, so verification never scans the whole
    # corpus's token sets — only the touched directories
    idx_tokens_all = spark.read.parquet(os.path.join(index_path, "tokens")).select(
        "doc_id", "th", F.col("tb").cast("int").alias("tb")
    )

    def _pruned_tokens(ids_df, id_col: str):
        buckets = [
            r.b
            for r in ids_df.select(
                _tok_bucket(F.col(id_col)).alias("b")
            ).distinct().collect()
        ]
        if not buckets:
            return idx_tokens_all.filter(F.lit(False))
        return idx_tokens_all.filter(F.col("tb").isin(buckets))

    self_df = None
    if self_appended:
        self_df = spark.createDataFrame(
            [(int(i),) for i in self_appended], "doc_id bigint"
        )
        idx_bands = idx_bands.join(F.broadcast(self_df), "doc_id", "left_anti")

    def _self_excluded(tok):
        if self_df is None:
            return tok
        return tok.join(F.broadcast(self_df), "doc_id", "left_anti")

    # redelivery short-circuit: batch ids already in the (self-excluded)
    # index were admitted by an earlier batch — presence probes only the
    # BATCH ids' buckets, index side stays left vs the broadcast batch
    already = (
        _self_excluded(_pruned_tokens(batch_ids, "doc_id"))
        .select("doc_id")
        .join(F.broadcast(batch_ids), "doc_id", "leftsemi")
        .distinct()
        .withColumn("already_ingested", F.lit(True))
    )
    # bucket truncation: the stop-bucket guard; min-doc_id members survive,
    # so a template bucket's representative always remains checkable
    rk = F.row_number().over(
        Window.partitionBy("band_no", "key").orderBy("doc_id")
    )
    idx_capped = idx_bands.withColumn("rk", rk).filter(F.col("rk") <= bucket_cap)

    # materialize the (bounded: <= batch x bands x cap rows) candidate
    # pairs once — their old_ids' buckets become the literal partition
    # filter for the verification-token probe below
    cand_base = (
        bands.alias("n")
        .join(
            idx_capped.alias("i"),
            (F.col("n.band_no") == F.col("i.band_no"))
            & (F.col("n.key") == F.col("i.key")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("i.doc_id").alias("old_id")
        )
        .distinct()
        .localCheckpoint()
    )
    old_tokens = _self_excluded(_pruned_tokens(cand_base, "old_id"))
    verified_base = (
        cand_base.join(tokens.select(F.col("doc_id").alias("new_id"),
                                     F.col("th").alias("tha")), "new_id")
        .join(old_tokens.select(F.col("doc_id").alias("old_id"),
                                F.col("th").alias("thb")), "old_id")
        .withColumn("inter", F.size(F.array_intersect("tha", "thb")))
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.size("tha") + F.size("thb") - F.col("inter")),
        )
        .filter(F.col("jac") >= _JACCARD)
        .select("new_id")
        .distinct()
        .withColumn("dups_base", F.lit(True))
    )

    batch_rk = F.row_number().over(
        Window.partitionBy("band_no", "key").orderBy("doc_id")
    )
    bands_capped = bands.withColumn("rk", batch_rk).filter(F.col("rk") <= bucket_cap)
    cand_peer = (
        bands_capped.alias("a")
        .join(
            bands_capped.alias("b"),
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("first_id"), F.col("b.doc_id").alias("new_id"))
        .distinct()
    )
    verified_peer = (
        cand_peer.join(tokens.select(F.col("doc_id").alias("first_id"),
                                     F.col("th").alias("tha")), "first_id")
        .join(tokens.select(F.col("doc_id").alias("new_id"),
                            F.col("th").alias("thb")), "new_id")
        .withColumn("inter", F.size(F.array_intersect("tha", "thb")))
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.size("tha") + F.size("thb") - F.col("inter")),
        )
        .filter(F.col("jac") >= _JACCARD)
        .select("new_id")
        .distinct()
        .withColumn("dups_earlier_peer", F.lit(True)))

    shard = batch_docs.select("doc_id")
    out = (
        shard.join(F.broadcast(already), "doc_id", "left")
        .join(
            F.broadcast(verified_base.withColumnRenamed("new_id", "doc_id")),
            "doc_id", "left",
        )
        .join(
            F.broadcast(verified_peer.withColumnRenamed("new_id", "doc_id")),
            "doc_id", "left",
        )
        .select(
            "doc_id",
            F.coalesce("already_ingested", F.lit(False)).alias("already_ingested"),
            F.coalesce("dups_base", F.lit(False)).alias("dups_base"),
            F.coalesce("dups_earlier_peer", F.lit(False)).alias("dups_earlier_peer"),
        )
    )
    return out.select(
        "doc_id",
        "already_ingested",
        "dups_base",
        "dups_earlier_peer",
        (
            ~F.col("already_ingested")
            & ~F.col("dups_base")
            & ~F.col("dups_earlier_peer")
        ).alias("admit"),
        F.when(F.col("already_ingested"), "already_ingested")
        .when(F.col("dups_base"), "near_dup_of_base")
        .when(F.col("dups_earlier_peer"), "near_dup_of_earlier_peer")
        .otherwise("admitted")
        .alias("reason"),
    )


def _read_marker_ids(marker: str, batch_df: DataFrame, id_col: str = "doc_id"):
    """None if this batch never appended (fresh run); else the ids the
    first attempt admitted — the crash-retry exclusion set.  A legacy
    marker (pre-ids format, content 'done') cannot name them; fall back to
    the full batch id set, which is exactly the pre-v2 exclusion, so old
    checkpoints stay replayable (they just lose the redelivery
    short-circuit for that one batch)."""
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        toks = f.read().split()
    if all(t.lstrip("-").isdigit() for t in toks):
        return [int(t) for t in toks]
    return [r[id_col] for r in batch_df.select(id_col).distinct().collect()]


def _append_admitted(batch_docs: DataFrame, admitted: DataFrame, index_path: str) -> None:
    tokens, bands = _batch_artifacts(
        batch_docs.join(admitted.select("doc_id"), "doc_id")
    )
    (
        tokens.withColumn("tb", _tok_bucket(F.col("doc_id")))
        .repartition("tb")
        .write.partitionBy("tb")
        .mode("append")
        .parquet(os.path.join(index_path, "tokens"))
    )
    (
        bands.repartition("band_no")
        .write.partitionBy("band_no")
        .mode("append")
        .parquet(os.path.join(index_path, "bands"))
    )


def ingest_shard_stream(
    docs_stream: DataFrame,
    index_path: str,
    decisions_path: str,
    checkpoint_dir: str,
    bucket_cap: int = _LSH_BUCKET_CAP,
    trigger_interval: str = "200 milliseconds",
):
    """Start the streaming front door: per micro-batch, decide admissions
    against the standing index, write decisions (partitioned by batch_id,
    re-run-safe), and append the admitted slice so later batches dedup
    against it.  Returns the StreamingQuery."""

    from ..plans.text_dedup import _persistent_rdd_ids, _unpersist_rdd_ids

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sc = batch_df.sparkSession.sparkContext
        before = _persistent_rdd_ids(sc)
        try:
            marker = os.path.join(index_path, f"_ingested_batch_{batch_id}")
            # the marker records the ids THIS batch appended (newline-
            # separated), so a crash-retry excludes exactly its own rows
            # from the index side and still sees earlier batches'
            # redeliveries as already_ingested
            self_appended = _read_marker_ids(marker, batch_df)
            decisions = admit_batch(
                batch_df, index_path, bucket_cap, self_appended=self_appended
            ).localCheckpoint()
            # append BEFORE publishing decisions: a batch's decisions must not
            # become visible until the index reflects its admissions (and a
            # stop/crash between the two steps then re-runs the decisions
            # write, not the append — which the marker guards anyway)
            if self_appended is None:
                admitted = decisions.filter("admit")
                _append_admitted(batch_df, admitted, index_path)
                ids = sorted(int(r.doc_id) for r in admitted.select("doc_id").collect())
                tmp = marker + ".tmp"
                with open(tmp, "w") as f:
                    f.write("\n".join(str(i) for i in ids))
                os.replace(tmp, marker)  # a half-written marker never counts
            (
                decisions.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(decisions_path)
            )
        finally:
            # per-batch checkpoint blocks must not accumulate over the
            # stream's lifetime (the q42 checkpoint-hygiene rule)
            _unpersist_rdd_ids(sc, _persistent_rdd_ids(sc) - before)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger_interval)
        .start()
    )
