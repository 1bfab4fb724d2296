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
