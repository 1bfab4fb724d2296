"""Streaming vector-index ingestion: SemDeDup admission against the
standing cell-partitioned index — batch semantics on crafted vectors,
cross-batch dedup via index growth, and crash-retry idempotency of the
decision recompute (the shard_ingest lessons applied to the vector
side)."""

import time

import numpy as np

from supermusr_data_pipeline_spark.plans.text_dedup import _codebook
from supermusr_data_pipeline_spark.streaming.vector_ingest import (

    admit_vector_batch,
    assign_cells,
    ingest_vector_stream,
    write_vector_index,
    _append_admitted,
)

import pytest

# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow

SCHEMA = "vec_id bigint, embedding array<double>"
CENTS = _codebook("")[0]

_rng = np.random.default_rng(7)
BASE_1 = _rng.normal(size=64)
BASE_2 = _rng.normal(size=64)
FRESH_1 = _rng.normal(size=64)
FRESH_2 = _rng.normal(size=64)


def _near(v, eps=1e-3):
    return (v + eps * np.roll(v, 1)).tolist()


def _rows(*pairs):
    return [(i, list(map(float, v))) for i, v in pairs]


def _mk_index(spark, tmp_path):
    idx = str(tmp_path / "vidx")
    base = spark.createDataFrame(
        _rows((1, BASE_1), (2, BASE_2)), SCHEMA
    )
    write_vector_index(base, idx, CENTS)
    return idx


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_crafted_vectors_are_actually_a_valid_fixture():
    """The fixture must satisfy its own premises: copies near cos 1,
    unrelated 64-d draws below the 0.4 bar."""
    assert _cos(BASE_1, _near(BASE_1)) > 0.99
    for a in (BASE_1, BASE_2):
        for b in (FRESH_1, FRESH_2):
            assert abs(_cos(a, b)) < 0.4


def test_admit_batch_semantics(spark, tmp_path):
    idx = _mk_index(spark, tmp_path)
    batch = spark.createDataFrame(
        _rows(
            (10, _near(BASE_1)),   # semantic dup of base 1
            (11, FRESH_1),         # fresh
            (12, _near(FRESH_1)),  # dup of peer 11
        ),
        SCHEMA,
    )
    d = {r.vec_id: r for r in admit_vector_batch(batch, idx, CENTS).collect()}
    assert not d[10].admit and d[10].reason == "sem_dup_of_base"
    assert d[11].admit and d[11].reason == "admitted"
    assert not d[12].admit and d[12].reason == "sem_dup_of_earlier_peer"


def test_stream_dedups_across_batches_via_index_growth(spark, tmp_path):
    idx = _mk_index(spark, tmp_path)
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        _rows((21, FRESH_1)), SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        _rows((31, _near(FRESH_1)), (32, FRESH_2)), SCHEMA
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    dec_path = str(tmp_path / "decisions")
    q = ingest_vector_stream(stream, idx, dec_path, str(tmp_path / "ckpt"), CENTS)
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if spark.read.parquet(dec_path).count() >= 3:
                break
        except Exception:
            pass
        time.sleep(0.3)
    q.stop()

    d = {r.vec_id: r for r in spark.read.parquet(dec_path).collect()}
    assert d[21].admit, "first arrival must be admitted"
    assert not d[31].admit and d[31].reason == "sem_dup_of_base", (
        "the near-copy in a LATER batch must be blocked by the grown index"
    )
    assert d[32].admit
    got = {r.vec_id for r in spark.read.parquet(idx).collect()}
    assert got == {1, 2, 21, 32}


def test_decisions_are_rerun_idempotent(spark, tmp_path):
    """Crash between the index append and the decisions write: admit_batch
    re-runs with this batch's admitted vectors already in the index and
    must recompute identical decisions (no self-match at cosine 1.0, no
    peer-dup flipping to base-dup)."""
    idx = _mk_index(spark, tmp_path)
    batch = spark.createDataFrame(
        _rows(
            (41, FRESH_1),         # fresh -> admitted
            (42, _near(FRESH_1)),  # dup of peer 41
            (43, _near(BASE_1)),   # dup of base 1
        ),
        SCHEMA,
    )
    first = sorted(admit_vector_batch(batch, idx, CENTS, exclude_bid=5).collect())
    _append_admitted(
        batch,
        admit_vector_batch(batch, idx, CENTS, exclude_bid=5).filter("admit"),
        idx, CENTS, bid=5,
    )
    # the re-run excludes its own bid=5 segment — a partition filter
    rerun = sorted(
        admit_vector_batch(batch, idx, CENTS, exclude_bid=5).collect()
    )
    assert rerun == first, (
        f"re-run decisions diverged:\nfirst={first}\nrerun={rerun}"
    )
    d = {r.vec_id: r for r in rerun}
    assert d[41].admit and d[41].reason == "admitted"
    assert d[42].reason == "sem_dup_of_earlier_peer"
    assert d[43].reason == "sem_dup_of_base"


def test_later_batch_redelivery_short_circuits(spark, tmp_path):
    """A vec_id redelivered by an at-least-once source in a LATER batch
    (a different bid, so own-segment exclusion does not hide it) must be
    rejected as already_ingested, not re-admitted (ADVICE r6, the
    shard_ingest fix applied here too)."""
    idx = _mk_index(spark, tmp_path)
    b1 = spark.createDataFrame(_rows((51, FRESH_1)), SCHEMA)
    d1 = admit_vector_batch(b1, idx, CENTS, exclude_bid=0)
    assert d1.collect()[0].admit
    _append_admitted(b1, d1.filter("admit"), idx, CENTS, bid=0)

    b2 = spark.createDataFrame(
        _rows((51, FRESH_1), (52, FRESH_2)), SCHEMA
    )
    d2 = {r.vec_id: r for r in admit_vector_batch(b2, idx, CENTS, exclude_bid=1).collect()}
    assert not d2[51].admit and d2[51].reason == "already_ingested"
    assert d2[52].admit and d2[52].reason == "admitted"
    _append_admitted(
        b2,
        admit_vector_batch(b2, idx, CENTS, exclude_bid=1).filter("admit"),
        idx, CENTS, bid=1,
    )
    all_rows = spark.read.parquet(idx)
    assert all_rows.filter("vec_id = 51").count() == 1
    assert all_rows.filter("vec_id = 52").count() == 1
