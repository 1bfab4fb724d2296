"""maybe_compact: the automatic compaction policy hook (VERDICT r7 #6).
Soaks alternate ingest batches with in-stream compaction (threshold
forced low) and pin that (a) admission/probe values are identical to a
never-compacted twin index, (b) the just-written batch's segment
survives compaction (protect_bid), so a crash-replay's own-segment
exclusion still recomputes byte-identical decisions, and (c) file
counts stay bounded."""

import os

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.plans.incremental import write_lsh_index
from supermusr_data_pipeline_spark.plans.index_maintenance import (
    _max_files_per_dir,
    maybe_compact,
    resolve_dir,
)
from supermusr_data_pipeline_spark.streaming import shard_ingest

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
BASE_TEXT = "the quick brown fox jumps over the lazy dog near the river bank today"


def _doc(i, text):
    return (i, text, "en", "s1", len(text))


def _fresh(i):
    return _doc(i, f"unique document number {i} about topic {i * 17} with its own words")


def _mk_base(spark, tmp_path, name):
    src = tmp_path / f"src_{name}"
    src.mkdir()
    spark.createDataFrame(
        [_doc(1, BASE_TEXT), _doc(2, "some other base document entirely")], SCHEMA
    ).write.parquet(str(src / "documents.parquet"))
    idx = str(tmp_path / f"idx_{name}")
    write_lsh_index(spark, str(src), idx)
    return idx


def test_lsh_soak_alternating_ingest_and_compaction(spark, tmp_path):
    compacted = _mk_base(spark, tmp_path, "c")
    plain = _mk_base(spark, tmp_path, "p")

    n_compactions = 0
    for b in range(5):
        docs = [_fresh(100 + b * 100 + k) for k in range(4)]
        if b >= 1:
            # redeliver a doc admitted two-or-more batches ago
            docs.append(_fresh(100 + (b - 1) * 100))
        batch = spark.createDataFrame(docs, SCHEMA)
        for idx in (compacted, plain):
            d = shard_ingest.admit_batch(batch, idx, exclude_bid=b)
            shard_ingest._append_admitted(batch, d.filter("admit"), idx, bid=b)
        # the ingest-contract hook, threshold forced low so it fires
        stats = maybe_compact(spark, compacted, "lsh", max_files_per_dir=2, protect_bid=b)
        if stats is not None:
            n_compactions += 1
    assert n_compactions >= 2, "the soak never exercised in-stream compaction"

    probe = spark.createDataFrame(
        [_doc(900, BASE_TEXT), _fresh(901), _fresh(203), _fresh(400)], SCHEMA
    )
    got = sorted(shard_ingest.admit_batch(probe, compacted).collect())
    want = sorted(shard_ingest.admit_batch(probe, plain).collect())
    assert got == want, "compaction changed admission decisions"
    # bounded read shape: the bands artifact has only 4 buckets, so every
    # batch lands a file in each — the never-compacted twin accumulates
    # one per batch while the hook keeps the compacted index at ≤2 per
    # bucket (folded base + the protected last batch)
    worst_c = _max_files_per_dir(resolve_dir(os.path.join(compacted, "bands")))
    worst_p = _max_files_per_dir(resolve_dir(os.path.join(plain, "bands")))
    assert worst_c < worst_p, (worst_c, worst_p)
    assert worst_c <= 2


def test_protect_bid_preserves_crash_replay_exclusion(spark, tmp_path):
    """Sequence: batch 7 appends -> in-stream compaction (protecting 7)
    -> crash BEFORE checkpoint commit -> replay of batch 7.  The replay's
    exclude_bid=7 must still hide exactly its own rows (they were not
    folded), so decisions recompute byte-identical and the re-append
    replaces rather than duplicates."""
    idx = _mk_base(spark, tmp_path, "replay")
    batch = spark.createDataFrame(
        [_fresh(41), _fresh(42), _doc(43, BASE_TEXT)], SCHEMA
    )
    first = sorted(shard_ingest.admit_batch(batch, idx, exclude_bid=7).collect())
    shard_ingest._append_admitted(
        batch, shard_ingest.admit_batch(batch, idx, exclude_bid=7).filter("admit"),
        idx, bid=7,
    )
    stats = maybe_compact(spark, idx, "lsh", max_files_per_dir=0, protect_bid=7)
    assert stats is not None
    # batch 7's segment must still exist under its own bid
    toks = spark.read.parquet(resolve_dir(os.path.join(idx, "tokens")))
    assert toks.filter("bid = 7").count() > 0
    assert toks.filter("bid = -1").count() > 0, "older segments must fold"

    rerun = sorted(shard_ingest.admit_batch(batch, idx, exclude_bid=7).collect())
    assert rerun == first, "crash-replay decisions diverged after compaction"
    shard_ingest._append_admitted(
        batch, shard_ingest.admit_batch(batch, idx, exclude_bid=7).filter("admit"),
        idx, bid=7,
    )
    toks = spark.read.parquet(resolve_dir(os.path.join(idx, "tokens")))
    assert toks.filter("doc_id = 41").count() == 1


def test_postings_soak_with_inline_compaction_matches_plain(spark, tmp_path):
    from supermusr_data_pipeline_spark.streaming.postings_ingest import (
        bm25_topk_over_index,
        ingest_doc_batch,
    )

    docs = [
        (i, f"shared term alpha plus word{i} and word{i + 1} tail", "en", "s1", 40)
        for i in range(12)
    ]
    idx_c = str(tmp_path / "lex_c")
    idx_p = str(tmp_path / "lex_p")
    n_compactions = 0
    for b in range(4):
        chunk = spark.createDataFrame(docs[b * 3 : b * 3 + 3], SCHEMA)
        ingest_doc_batch(chunk, idx_c, b)
        ingest_doc_batch(chunk, idx_p, b)
        stats = maybe_compact(spark, idx_c, "postings", max_files_per_dir=1, protect_bid=b)
        if stats is not None:
            n_compactions += 1
    assert n_compactions >= 2
    got = sorted(
        map(tuple, bm25_topk_over_index(spark, idx_c, ["alpha", "word5"]).collect())
    )
    want = sorted(
        map(tuple, bm25_topk_over_index(spark, idx_p, ["alpha", "word5"]).collect())
    )
    assert got == want, "postings compaction moved a BM25 value"
    # stats ledger folded + protected batch row: at most 2 rows
    stats_rows = spark.read.parquet(
        resolve_dir(os.path.join(idx_c, "stats"))
    ).count()
    assert stats_rows <= 2
    n = spark.read.parquet(resolve_dir(os.path.join(idx_c, "doclen"))).count()
    assert n == 12, "compaction must not drop or duplicate documents"
