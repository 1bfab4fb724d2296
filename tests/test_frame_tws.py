"""transformWithStateInPandas frame FSM (frame_assembly_tws) must be
semantics-identical to the applyInPandasWithState operator: same frames,
same completeness, same dup rejection, same TTL dispatch — pinned by
running the SAME tape through both streaming operators in one session
and comparing every emitted row.  Requires the RocksDB provider (set
per-query) and the protobuf shim PYTHONPATH (tests/conftest.py)."""

import os
import time

import pytest
import pyarrow.parquet as pq

from supermusr_data_pipeline_spark.streaming.frame_assembly_stream import (
    DIGITISER_MESSAGE_SCHEMA,
    assemble_frames_stream,
)
from supermusr_data_pipeline_spark.streaming.frame_assembly_tws import (
    assemble_frames_stream_tws,
)
from supermusr_data_pipeline_spark.streaming.state_store import (
    ROCKSDB_PROVIDER,
    rocksdb_state_conf,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

N_DIG = 4
N_COMPLETE = 6


def _spool(tmp_path, name):
    import bench_streaming as bs

    spool = str(tmp_path / name)
    os.makedirs(spool)
    prev = bs.EVENTS_PER_MESSAGE
    bs.EVENTS_PER_MESSAGE = 20
    try:
        for i in range(N_COMPLETE):
            pq.write_table(
                bs._frame_table(i, N_DIG), os.path.join(spool, f"f{i:03d}.parquet")
            )
        # one incomplete frame (missing digitiser 3): dispatches via TTL
        pq.write_table(
            bs._frame_table(N_COMPLETE, N_DIG - 1),
            os.path.join(spool, f"f{N_COMPLETE:03d}.parquet"),
        )
    finally:
        bs.EVENTS_PER_MESSAGE = prev
    return spool


def _collect_frames(spark, tmp_path, spool, assemble, tag, provider=None):
    msgs = spark.readStream.schema(DIGITISER_MESSAGE_SCHEMA).parquet(spool)
    frames = assemble(msgs, list(range(N_DIG)), frame_ttl_ms=500)
    out = []
    prior = spark.conf.get(_PROVIDER_KEY, None)
    if provider:
        for k, v in rocksdb_state_conf().items():
            spark.conf.set(k, v)
    try:
        q = (
            frames.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and len(out) < N_COMPLETE + 1:
            time.sleep(0.2)
        q.stop()
    finally:
        if provider and prior is not None:
            spark.conf.set(_PROVIDER_KEY, prior)
    return out


def _canon(rows):
    def c(r):
        return (
            r.ts, r.period_number, r.protons_per_pulse, r.running,
            r.frame_number, r.veto_flags, r.complete,
            tuple(r.digitizers_present), tuple(r.channel),
            tuple(r.event_time), tuple(r.event_voltage),
        )

    return sorted(map(c, rows))


@pytest.mark.skipif(
    not os.path.isdir("/usr/lib/google-cloud-sdk/platform/google_appengine"),
    reason="no protobuf runtime available for transformWithState workers",
)
def test_tws_matches_apply_on_same_tape(spark, tmp_path):
    apply_rows = _collect_frames(
        spark, tmp_path, _spool(tmp_path, "spool_a"), assemble_frames_stream, "apply"
    )
    tws_rows = _collect_frames(
        spark, tmp_path, _spool(tmp_path, "spool_t"),
        assemble_frames_stream_tws, "tws", provider=ROCKSDB_PROVIDER,
    )
    assert len(apply_rows) == N_COMPLETE + 1
    assert _canon(tws_rows) == _canon(apply_rows)
    by_frame = {r.frame_number: r for r in tws_rows}
    assert all(by_frame[i].complete for i in range(N_COMPLETE))
    assert not by_frame[N_COMPLETE].complete
    assert by_frame[N_COMPLETE].digitizers_present == [0, 1, 2]


@pytest.mark.skipif(
    not os.path.isdir("/usr/lib/google-cloud-sdk/platform/google_appengine"),
    reason="no protobuf runtime available for transformWithState workers",
)
def test_tws_rejects_duplicate_and_straggler_messages(spark, tmp_path):
    """A duplicate (frame, digitiser) message in a later batch must not
    re-open a dispatched frame (tombstone), and an in-flight duplicate is
    dropped — the frame emits exactly once with single-counted events."""
    import bench_streaming as bs

    spool = str(tmp_path / "spool_dup")
    os.makedirs(spool)
    prev = bs.EVENTS_PER_MESSAGE
    bs.EVENTS_PER_MESSAGE = 20
    try:
        pq.write_table(bs._frame_table(0, N_DIG), os.path.join(spool, "f000.parquet"))
    finally:
        bs.EVENTS_PER_MESSAGE = prev

    msgs = (
        spark.readStream.schema(DIGITISER_MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(spool)
    )
    # tombstone pinned long: the assertion is about rejection WHILE the
    # tombstone lives — expiry-then-reopen is separately legal semantics
    frames = assemble_frames_stream_tws(
        msgs, list(range(N_DIG)), frame_ttl_ms=500, tombstone_ttl_ms=60_000
    )
    out = []
    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    q = (
        frames.writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_dup"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and not out:
        time.sleep(0.2)
    # straggler: redeliver the whole frame-0 message file in a later batch
    prev = bs.EVENTS_PER_MESSAGE
    bs.EVENTS_PER_MESSAGE = 20
    try:
        pq.write_table(bs._frame_table(0, N_DIG), os.path.join(spool, "f000b.parquet"))
    finally:
        bs.EVENTS_PER_MESSAGE = prev
    time.sleep(3)
    q.stop()
    assert len(out) == 1, "tombstone must reject the redelivered frame"
    assert out[0].complete and len(out[0].channel) == N_DIG * 20
