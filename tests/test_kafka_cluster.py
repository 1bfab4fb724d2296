"""The multi-node MiniCluster: partition leadership spread, pull
replication with ISR + high-watermark semantics, acks=-1 commit
waiting, min.insync.replicas enforcement, leader failover with
client-side metadata refresh, group coordination across nodes, and the
Spark kafka-wire source fanning its fetch tasks out across brokers."""

import time

import pytest

from supermusr_data_pipeline_spark.kafka import (
    GroupConsumer,
    MiniConsumer,
    MiniProducer,
)
from supermusr_data_pipeline_spark.kafka import protocol as P
from supermusr_data_pipeline_spark.kafka.client import _Conn
from supermusr_data_pipeline_spark.kafka.cluster import MiniCluster


# slow set (pytest.ini deselects by default; opt in with -m slow):
# multi-minute soak / streaming end-to-end / large-SF coverage whose
# operators' value-correctness stays pinned by the default sf0.001
# parity + plan audits
pytestmark = pytest.mark.slow


def _await(predicate, timeout_s=5.0, interval=0.02):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return predicate()


def _drain(consumer, max_wait_ms=200):
    out = []
    while True:
        batch = consumer.poll(max_wait_ms=max_wait_ms)
        if not batch:
            return out
        out.extend(batch)


def test_metadata_spreads_leadership_and_replicas():
    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("traces", partitions=6)
        conn = _Conn(c.bootstrap.split(",")[0], "probe")
        brokers, tmeta = conn.metadata_full(["traces"])
        conn.close()
        assert len(brokers) == 3
        (_err, _name, parts) = tmeta[0]
        leaders = [leader for _e, _p, leader, _r, _i in parts]
        assert len(parts) == 6
        # leadership is spread, not piled on one node
        assert len(set(leaders)) == 3
        for _e, _p, leader, replicas, isr in parts:
            assert len(replicas) == 2 and leader == replicas[0]
            assert sorted(isr) == sorted(replicas)


def test_acks_all_commits_to_follower_before_returning():
    with MiniCluster(n_brokers=2, replication_factor=2) as c:
        c.create_topic("traces", partitions=1)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(200):
                prod.send("traces", f"m{i}".encode(), key=b"k")
            prod.flush()
            # acks=-1 returned => the full ISR has every record NOW,
            # not eventually: both nodes' local logs are complete
            sizes = [b.topic_sizes()["traces"][0] for b in c.brokers]
            assert sizes == [200, 200]
        consumer = MiniConsumer(c.bootstrap, ["traces"],
                                starting_offsets="earliest")
        got = [r.value.decode() for r in _drain(consumer)]
        consumer.close()
        assert got == [f"m{i}" for i in range(200)]


def test_direct_produce_to_non_leader_is_rejected():
    with MiniCluster(n_brokers=2, replication_factor=1) as c:
        c.create_topic("traces", partitions=1)
        st = c.meta.state("traces", 0)
        follower_id = 1 - st.leader
        addr = "%s:%d" % c.meta.brokers[follower_id]
        conn = _Conn(addr, "wrong-door")
        mset = P.encode_message_set([(0, None, b"x")])
        cur = conn.request(
            P.API_PRODUCE, 2,
            P.encode_produce_request(-1, 1000, [("traces", [(0, mset)])]),
        )
        topics, _ = P.decode_produce_response(cur)
        assert topics[0][1][0][1] == P.ERR_NOT_LEADER_FOR_PARTITION
        conn.close()


def test_min_insync_replicas_enforced_when_follower_dies():
    with MiniCluster(
        n_brokers=2, replication_factor=2, min_insync_replicas=2,
        replica_lag_ms=500,
    ) as c:
        c.create_topic("traces", partitions=1)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"before")
            prod.flush()
            st = c.meta.state("traces", 0)
            follower = next(r for r in st.replicas if r != st.leader)
            c.kill(follower)
            # ISR shrinks below min.insync -> acks=-1 produce must fail
            # loud (NOT_ENOUGH_REPLICAS), not silently under-replicate
            assert _await(lambda: len(c.meta.state("traces", 0).isr) < 2)
            prod.send("traces", b"after")
            with pytest.raises(OSError, match="error 19"):
                prod.flush()


def test_leader_failover_producer_and_consumer_continue():
    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("traces", partitions=1)
        prod = MiniProducer(c.bootstrap, buffer_max=10_000)
        for i in range(50):
            prod.send("traces", f"a{i}".encode())
        prod.flush()
        consumer = MiniConsumer(c.bootstrap, ["traces"],
                                starting_offsets="earliest")
        first = [r.value.decode() for r in _drain(consumer)]
        assert first == [f"a{i}" for i in range(50)]

        st = c.meta.state("traces", 0)
        old_leader, old_epoch = st.leader, st.epoch
        c.kill(old_leader)
        assert st.leader != old_leader and st.leader >= 0
        assert st.epoch == old_epoch + 1

        # the producer's next flush routes to the new leader (one
        # metadata refresh inside flush), no records lost
        for i in range(50):
            prod.send("traces", f"b{i}".encode())
        prod.flush()
        prod.close()
        # the consumer keeps polling through the failover: nothing
        # redelivered, nothing missing
        second = [r.value.decode() for r in _drain(consumer)]
        consumer.close()
        assert second == [f"b{i}" for i in range(50)]


def test_unreplicated_partition_goes_offline_with_its_leader():
    with MiniCluster(n_brokers=2, replication_factor=1) as c:
        c.create_topic("traces", partitions=2)
        # find a partition led by node 0 and one led by node 1
        leaders = [c.meta.state("traces", p).leader for p in (0, 1)]
        assert sorted(leaders) == [0, 1]
        c.kill(0)
        dead_pid = leaders.index(0)
        live_pid = 1 - dead_pid
        assert c.meta.state("traces", dead_pid).leader == -1  # offline
        assert c.meta.state("traces", live_pid).leader == 1
        conn = _Conn("%s:%d" % c.meta.brokers[1], "probe")
        _brokers, tmeta = conn.metadata_full(["traces"])
        conn.close()
        parts = {p: (e, leader) for e, p, leader, _r, _i in tmeta[0][2]}
        assert parts[dead_pid] == (P.ERR_LEADER_NOT_AVAILABLE, -1)
        assert parts[live_pid] == (P.ERR_NONE, 1)


def test_follower_rejoins_isr_after_catching_up():
    with MiniCluster(
        n_brokers=2, replication_factor=2, replica_lag_ms=300
    ) as c:
        c.create_topic("traces", partitions=1)
        st = c.meta.state("traces", 0)
        follower = next(r for r in st.replicas if r != st.leader)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"x")
            prod.flush()
        # simulate a stalled follower (network-partition analog): the
        # lag timer evicts it from the ISR
        c.pause_replication(follower, "traces", 0)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"y")
            prod.flush()  # commits on the shrunken ISR (min.insync=1)
        assert _await(lambda: follower not in st.isr)
        # un-stall: the housekeeper restarts the fetcher, the follower
        # catches up and the ISR expands again (the protocol's rule)
        c.resume_replication(follower, "traces", 0)
        assert _await(lambda: follower in st.isr, timeout_s=5)
        assert _await(
            lambda: c.brokers[follower].topic_sizes()["traces"][0] == 2
        )


def test_produce_timeout_isolated_to_stalled_partition():
    """Two-phase produce semantics (the DelayedProduce shape): one
    request carrying a healthy and a replication-stalled partition acks
    the healthy one and times out ONLY the stalled one — and the waits
    overlap, so the request takes ~one timeout, not a per-partition
    sum."""
    with MiniCluster(
        n_brokers=2, replication_factor=2, min_insync_replicas=1,
        replica_lag_ms=60_000,  # ISR retains the stalled follower
    ) as c:
        c.create_topic("traces", partitions=4)
        by_leader = {}
        for pid in range(4):
            by_leader.setdefault(
                c.meta.state("traces", pid).leader, []
            ).append(pid)
        leader, pids = next(
            (k, v) for k, v in by_leader.items() if len(v) >= 2
        )
        healthy, stalled = pids[0], pids[1]
        follower = next(
            r
            for r in c.meta.state("traces", stalled).replicas
            if r != leader
        )
        c.pause_replication(follower, "traces", stalled)
        time.sleep(0.1)
        host, port = c.meta.brokers[leader]
        conn = _Conn(f"{host}:{port}", "two-phase-test")
        mset = P.encode_message_set([(0, None, b"v")])
        body = P.encode_produce_request(
            -1, 700, [("traces", [(healthy, mset), (stalled, mset)])]
        )
        t0 = time.monotonic()
        cur = conn.request(P.API_PRODUCE, 2, body)
        took = time.monotonic() - t0
        topics, _throttle = P.decode_produce_response(cur)
        errs = {
            pid: err for _t, prs in topics for pid, err, _b, _l in prs
        }
        conn.close()
        assert errs[healthy] == P.ERR_NONE
        assert errs[stalled] == P.ERR_REQUEST_TIMED_OUT
        assert 0.5 <= took < 2.0, took  # one shared deadline, overlapped


def test_group_consumer_coordinates_across_cluster():
    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("docs", partitions=4)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(100):
                prod.send("docs", f"v{i}".encode(), key=str(i).encode())
        c1 = GroupConsumer(c.bootstrap, "readers", ["docs"],
                           session_timeout_ms=4000)
        assert c1.assignment() == [("docs", p) for p in range(4)]
        got = {r.value.decode() for r in _drain(c1)}
        assert len(got) == 100
        c1.commit()
        c1.close()
        # a fresh member resumes from the cluster-plane committed
        # offsets: nothing redelivered
        c2 = GroupConsumer(c.bootstrap, "readers", ["docs"],
                           session_timeout_ms=4000)
        assert _drain(c2) == []
        c2.close()


def test_spark_kafka_wire_fans_out_across_brokers(spark):
    """The kafka-wire DataSource against a 3-node cluster: the driver's
    oracle routes ListOffsets per leader, every range partition dials
    its own leader broker, and the read returns the full topic — the
    per-broker data-plane fan-out the 100 TB posture claims."""
    from supermusr_data_pipeline_spark.kafka import KafkaWireDataSource
    from supermusr_data_pipeline_spark.kafka.spark_source import _OffsetOracle
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )

    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("traces", partitions=6)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(600):
                prod.send("traces", f"v{i}".encode(), key=str(i).encode())
        opts = kafka_source_options(c.bootstrap, ["traces"])
        lowered = {k.lower(): v for k, v in opts.items()}
        oracle = _OffsetOracle(lowered)
        addrs = {
            oracle.leader_addr("traces", p) for p in range(6)
        }
        oracle.close()
        assert len(addrs) == 3  # ranges dial three distinct brokers
        spark.dataSource.register(KafkaWireDataSource)
        df = spark.read.format("kafka-wire").options(**opts).load()
        rows = df.collect()
        assert len(rows) == 600
        assert sorted({r.partition for r in rows}) == list(range(6))
        assert {bytes(r.value).decode() for r in rows} == {
            f"v{i}" for i in range(600)
        }


def test_cluster_sasl_requires_inter_broker_user():
    """A SASL cluster without an inter-broker principal fails loud at
    construction (not a pre-auth replica-fetcher hang), as does a
    principal absent from the user stores."""
    with pytest.raises(ValueError, match="inter_broker_user"):
        MiniCluster(
            n_brokers=2, security_protocol="SASL_PLAINTEXT",
            scram_users={"svc": "pw"},
        )
    with pytest.raises(ValueError, match="must appear in"):
        MiniCluster(
            n_brokers=2, security_protocol="SASL_PLAINTEXT",
            scram_users={"svc": "pw"}, inter_broker_user=("ghost", "pw"),
        )


def _secured_cluster(**kw):
    """3-broker SASL_SSL cluster: replica fetchers authenticate with the
    inter-broker SCRAM principal over TLS (the reference's deployment
    posture — SASL_SSL everywhere, common/src/lib.rs:51-70)."""
    defaults = dict(
        n_brokers=3, replication_factor=2,
        security_protocol="SASL_SSL",
        scram_users={"svc": "hunter2", "replicator": "wheel"},
        inter_broker_user=("replicator", "wheel"),
    )
    defaults.update(kw)
    return MiniCluster(**defaults)


def _client_security(c, user="svc", password="hunter2"):
    from supermusr_data_pipeline_spark.kafka.auth import (
        SCRAM_SHA_256,
        ClientSecurity,
    )

    return ClientSecurity(
        protocol="SASL_SSL", mechanism=SCRAM_SHA_256,
        username=user, password=password,
        ca_location=c.ssl_ca_location,
    )


def test_secured_cluster_issues_per_broker_ca_chained_certs():
    """Each broker serves its OWN leaf cert (CN broker-<id>) chained to
    the one cluster CA — the deployment shape, replacing the r12 shared
    self-signed cert.  Clients verify every broker against the CA alone,
    and the leaf identities differ per node."""
    import ssl

    with _secured_cluster() as c:
        ctx = ssl.create_default_context(cafile=c.ssl_ca_location)
        ctx.check_hostname = False  # CN is broker-<id>; SANs carry the IP
        cns = []
        for b in c.brokers:
            import socket

            with socket.create_connection((b.host, b.port), timeout=10) as sk:
                with ctx.wrap_socket(sk) as tls:
                    cert = tls.getpeercert()
            cn = dict(x[0] for x in cert["subject"])["commonName"]
            cns.append(cn)
            # hostname-style check against the SANs a client would use
            assert ("IP Address", "127.0.0.1") in cert["subjectAltName"]
        assert sorted(cns) == [f"broker-{i}" for i in range(3)]


def test_secured_cluster_acks_all_replicates_through_auth():
    """acks=-1 over SASL_SSL: the produce returns only after the
    AUTHENTICATED replica fetchers have pulled every record to the full
    ISR — replication and security compose."""
    with _secured_cluster(min_insync_replicas=2) as c:
        c.create_topic("traces", partitions=1)
        sec = _client_security(c)
        with MiniProducer(c.bootstrap, buffer_max=10_000, security=sec) as prod:
            for i in range(100):
                prod.send("traces", f"m{i}".encode(), key=b"k")
            prod.flush()
            st = c.meta.state("traces", 0)
            sizes = [
                c.brokers[r].topic_sizes()["traces"][0] for r in st.replicas
            ]
            assert sizes == [100, 100]
        consumer = MiniConsumer(
            c.bootstrap, ["traces"], starting_offsets="earliest",
            security=sec,
        )
        got = [r.value.decode() for r in _drain(consumer)]
        consumer.close()
        assert got == [f"m{i}" for i in range(100)]
        # an unauthenticated client is still locked out of the same door
        with pytest.raises((ConnectionError, OSError)):
            probe = MiniConsumer(
                c.bootstrap, ["traces"], starting_offsets="earliest"
            )
            probe.poll(max_wait_ms=200)


def test_secured_cluster_leader_failover():
    """Kill the leader mid-stream on the SASL_SSL cluster: the failover
    elects an ISR survivor and the secured client's metadata refresh
    routes around the corpse — every committed record delivered."""
    with _secured_cluster() as c:
        c.create_topic("traces", partitions=1)
        sec = _client_security(c)
        with MiniProducer(c.bootstrap, buffer_max=10, security=sec) as prod:
            for i in range(30):
                prod.send("traces", f"pre{i}".encode())
            prod.flush()
        st = c.meta.state("traces", 0)
        old_leader = st.leader
        c.kill(old_leader)
        assert _await(lambda: st.leader != old_leader and st.leader != -1)
        with MiniProducer(c.bootstrap, buffer_max=10, security=sec) as prod:
            for i in range(30):
                prod.send("traces", f"post{i}".encode())
            prod.flush()
        consumer = MiniConsumer(
            c.bootstrap, ["traces"], starting_offsets="earliest",
            security=sec,
        )
        got = [r.value.decode() for r in _drain(consumer)]
        consumer.close()
        assert got == [f"pre{i}" for i in range(30)] + [
            f"post{i}" for i in range(30)
        ]


def test_fetch_range_fails_over_mid_range():
    """The executor fetch path survives its leader dying mid-range: with
    ``fallback`` it re-resolves leadership and resumes from the exact
    position — every offset delivered once."""
    from supermusr_data_pipeline_spark.kafka.spark_source import _fetch_range

    with MiniCluster(n_brokers=2, replication_factor=2) as c:
        c.create_topic("traces", partitions=1)
        payload = b"x" * 1000
        with MiniProducer(c.bootstrap, buffer_max=500) as prod:
            for i in range(2000):
                prod.send("traces", payload, key=str(i).encode())
        st = c.meta.state("traces", 0)
        leader_addr = "%s:%d" % c.meta.brokers[st.leader]
        gen = _fetch_range(
            leader_addr, "traces", 0, 0, 2000,
            fetch_bytes=1 << 18,  # ~256 KiB/round trip -> many rounds
            fallback=c.bootstrap,
        )
        got = []
        first = next(gen)
        got.extend(first.column("offset").to_pylist())
        c.kill(st.leader)  # connection drops mid-pipeline
        for rb in gen:
            got.extend(rb.column("offset").to_pylist())
        assert got == list(range(2000))  # exactly-once, in order


def test_fetch_range_fails_over_refused_initial_dial():
    """A range PLANNED against a broker that dies before the task
    starts (the bounce window): the refused first dial must fail over
    through the fallback bootstrap, not fail the task — the r12 cluster
    chaos soak found exactly this escape."""
    from supermusr_data_pipeline_spark.kafka.spark_source import _fetch_range

    with MiniCluster(n_brokers=2, replication_factor=2) as c:
        c.create_topic("traces", partitions=1)
        with MiniProducer(c.bootstrap, buffer_max=500) as prod:
            for i in range(100):
                prod.send("traces", f"m{i}".encode(), key=str(i).encode())
        st = c.meta.state("traces", 0)
        dead_addr = "%s:%d" % c.meta.brokers[st.leader]
        live_bootstrap = None
        c.kill(st.leader)
        live_bootstrap = c.bootstrap  # survivors only
        got = []
        for rb in _fetch_range(
            dead_addr, "traces", 0, 0, 100, fallback=live_bootstrap
        ):
            got.extend(rb.column("offset").to_pylist())
        assert got == list(range(100))


def test_streaming_query_survives_leader_failover(spark, tmp_path):
    """A live Structured Streaming read over a replicated topic keeps
    going through a broker kill: offsets are HW-fenced (planned ranges
    are committed records only), the driver's oracle refreshes leaders,
    and executor tasks fail over — the sink ends complete with no
    duplicates."""
    from supermusr_data_pipeline_spark.kafka import KafkaWireDataSource
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )

    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("traces", partitions=2)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(300):
                prod.send("traces", f"v{i}".encode(), key=str(i).encode())
        spark.dataSource.register(KafkaWireDataSource)
        opts = kafka_source_options(
            c.bootstrap, ["traces"], starting_offsets="earliest",
            max_offsets_per_trigger=100,
        )
        out = str(tmp_path / "sink")
        q = (
            spark.readStream.format("kafka-wire").options(**opts).load()
            .selectExpr("cast(value as string) v")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            assert _await(
                lambda: _count_or_zero(spark, out) >= 100, timeout_s=60
            )
            victim = c.meta.state("traces", 0).leader
            c.kill(victim)
            with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
                for i in range(300, 400):
                    prod.send("traces", f"v{i}".encode(), key=str(i).encode())
            assert _await(
                lambda: _count_or_zero(spark, out) >= 400, timeout_s=60
            )
        finally:
            q.stop()
        vals = [r.v for r in spark.read.parquet(out).collect()]
        assert len(vals) == 400  # nothing duplicated by the failover
        assert set(vals) == {f"v{i}" for i in range(400)}  # nothing lost


def _count_or_zero(spark, path):
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0


def test_restarted_follower_truncates_and_catches_up():
    """Broker lifecycle round trip: kill a follower, keep producing on
    the shrunken ISR, restart it — it truncates to its recovery point,
    re-fetches the diverged range, catches up, and rejoins the ISR."""
    with MiniCluster(
        n_brokers=2, replication_factor=2, replica_lag_ms=400
    ) as c:
        c.create_topic("traces", partitions=1)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(100):
                prod.send("traces", f"a{i}".encode())
        st = c.meta.state("traces", 0)
        follower = next(r for r in st.replicas if r != st.leader)
        c.kill(follower)
        assert _await(lambda: follower not in st.isr)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(100):
                prod.send("traces", f"b{i}".encode())
        assert c.brokers[follower].topic_sizes()["traces"][0] == 100
        c.restart(follower)
        assert _await(
            lambda: c.brokers[follower].topic_sizes()["traces"][0] == 200,
            timeout_s=10,
        )
        assert _await(lambda: follower in st.isr, timeout_s=10)


def test_offline_partition_recovers_when_its_broker_returns():
    with MiniCluster(n_brokers=2, replication_factor=1) as c:
        c.create_topic("traces", partitions=2)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(60):
                prod.send("traces", f"v{i}".encode(), key=str(i).encode())
        dead = 0
        dead_pids = [
            p for p in (0, 1) if c.meta.state("traces", p).leader == dead
        ]
        c.kill(dead)
        for p in dead_pids:
            assert c.meta.state("traces", p).leader == -1
        c.restart(dead)
        for p in dead_pids:
            st = c.meta.state("traces", p)
            assert st.leader == dead and st.isr == {dead}
        consumer = MiniConsumer(c.bootstrap, ["traces"],
                                starting_offsets="earliest")
        got = {r.value.decode() for r in _drain(consumer)}
        consumer.close()
        # rf=1 and committed-at-append: everything is still there
        assert got == {f"v{i}" for i in range(60)}


def test_restart_truncates_diverged_uncommitted_tail():
    """A follower that held an UNCOMMITTED beyond-HW tail (the state a
    crash window leaves: fetched from the old leader, never acked) dies
    and returns after the leader moved on: the restart truncates the
    diverged tail to the recovery point, re-fetches the real lineage,
    and converges byte-for-byte (the replica reconciliation rule —
    in-process analog of leader-epoch truncation)."""
    with MiniCluster(
        n_brokers=2, replication_factor=2, replica_lag_ms=300
    ) as c:
        c.create_topic("traces", partitions=1)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"committed")
            prod.flush()
        st = c.meta.state("traces", 0)
        leader = st.leader
        follower = next(r for r in st.replicas if r != leader)
        assert _await(
            lambda: c.brokers[follower].topic_sizes()["traces"][0] == 1
        )
        # stall replication, then plant the beyond-HW tail the crash
        # window leaves on the follower
        c.pause_replication(follower, "traces", 0)
        flog = c.brokers[follower]._log("traces", 0)
        flog.append_set(P.encode_message_set([(0, None, b"ghost")]))
        c.kill(follower)
        # the leader commits a DIFFERENT record at that offset (ISR
        # shrank to the leader alone, min.insync=1)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"the-real-offset-1")
            prod.flush()
        c.resume_replication(follower, "traces", 0)
        c.restart(follower)

        def follower_values():
            recs = P.decode_message_set(bytes(flog.buf))
            return [r.value for r in recs]

        assert _await(
            lambda: follower_values() == [b"committed", b"the-real-offset-1"],
            timeout_s=10,
        )
        assert _await(lambda: follower in st.isr, timeout_s=10)


def test_no_unclean_election_when_evicted_follower_returns_first():
    """A lag-evicted follower (its log misses committed records) that
    restarts BEFORE the final leader must NOT be elected: the partition
    stays OFFLINE until a member of the ISR-at-offline returns.  Electing
    the stale follower would be an unclean election silently truncating
    the committed lineage — the module's 'no unclean election' invariant
    (Kafka's unclean.leader.election.enable=false posture)."""
    with MiniCluster(
        n_brokers=2, replication_factor=2, replica_lag_ms=300
    ) as c:
        c.create_topic("traces", partitions=1)
        st = c.meta.state("traces", 0)
        leader = st.leader
        follower = next(r for r in st.replicas if r != leader)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"seen-by-both")
            prod.flush()
        # lag-evict the follower, then commit a record it will never see
        c.pause_replication(follower, "traces", 0)
        with MiniProducer(c.bootstrap, buffer_max=10) as prod:
            prod.send("traces", b"committed-past-follower")
            prod.flush()
        assert _await(lambda: follower not in st.isr)
        c.kill(follower)
        c.kill(leader)  # ISR was {leader} alone -> partition OFFLINE
        assert st.leader == -1 and st.last_isr == {leader}
        # the stale follower returns first: MUST stay offline
        c.restart(follower)
        assert st.leader == -1, "unclean election of a lag-evicted follower"
        # the last ISR member returns: elected, committed lineage intact
        c.restart(leader)
        assert st.leader == leader
        consumer = MiniConsumer(c.bootstrap, ["traces"],
                                starting_offsets="earliest")
        got = [r.value for r in _drain(consumer)]
        consumer.close()
        assert got == [b"seen-by-both", b"committed-past-follower"]
        # un-stall replication: the follower re-fetches the real lineage
        c.resume_replication(follower, "traces", 0)
        assert _await(
            lambda: c.brokers[follower].topic_sizes()["traces"][0] == 2,
            timeout_s=10,
        )


def test_group_consumer_survives_coordinator_death():
    """The coordinator broker dies mid-session: the consumer
    re-discovers a surviving coordinator (group state is cluster-plane)
    and its committed offsets carry over — nothing redelivered."""
    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("docs", partitions=3)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(90):
                prod.send("docs", f"v{i}".encode(), key=str(i).encode())
        c1 = GroupConsumer(c.bootstrap, "readers", ["docs"],
                           session_timeout_ms=4000,
                           heartbeat_interval_ms=100)
        got = {r.value.decode() for r in _drain(c1)}
        assert len(got) == 90
        c1.commit()
        # find and kill the coordinator node (hash over live brokers)
        order = sorted(c.meta.live)
        coord = order[P.murmur2(b"readers") % len(order)]
        # don't kill a partition leader the consumer still needs if we
        # can avoid it — but with rf=2 every partition survives any
        # single kill, so the coordinator is always a safe victim
        c.kill(coord)
        with MiniProducer(c.bootstrap, buffer_max=10_000) as prod:
            for i in range(90, 120):
                prod.send("docs", f"v{i}".encode(), key=str(i).encode())
        more = {r.value.decode() for r in _drain(c1)}
        assert more == {f"v{i}" for i in range(90, 120)}
        c1.commit()  # lands on the NEW coordinator
        c1.close()
        c2 = GroupConsumer(c.bootstrap, "readers", ["docs"],
                           session_timeout_ms=4000)
        assert _drain(c2) == []  # committed offsets carried over
        c2.close()


def test_replica_fetch_reports_hw_not_leo():
    """The wire contract behind crash recovery: a replica fetch response
    carries the leader's HIGH WATERMARK, not its log end — a follower
    recording LEO as its recovery point would let a diverged uncommitted
    tail survive restart truncation (round-11 review finding)."""
    with MiniCluster(
        n_brokers=3, replication_factor=3, replica_lag_ms=60_000
    ) as c:
        c.create_topic("traces", partitions=1)
        st = c.meta.state("traces", 0)
        leader = st.leader
        followers = [r for r in st.replicas if r != leader]
        # hold the HW back: pause one follower (lag window is huge, so
        # it stays in the ISR and pins hw at its position)
        c.pause_replication(followers[1], "traces", 0)
        llog = c.brokers[leader]._log("traces", 0)
        llog.append_set(P.encode_message_set([(0, None, b"x"), (0, None, b"y")]))
        with c.meta.lock:
            c.brokers[leader]._recompute_hw("traces", 0, st)
        assert st.hw == 0  # paused follower pins the HW below LEO=2
        addr = "%s:%d" % c.meta.brokers[leader]
        conn = _Conn(addr, "replica-probe")
        cur = conn.request(
            P.API_FETCH, 2,
            P.encode_fetch_request(
                100, 1, [("traces", [(0, 2, 1 << 20)])],
                replica_id=followers[0],
            ),
        )
        _thr, topics = P.decode_fetch_response(cur)
        _pid, err, hw, _mset = topics[0][1][0]
        conn.close()
        assert err == P.ERR_NONE
        assert hw == st.hw  # the HW, not LEO=2
        # and the caught-up follower's recovery point respects it
        rp = c.brokers[followers[0]]._recovery_point.get(("traces", 0), 0)
        assert rp <= st.hw


def test_router_fails_over_when_cached_meta_broker_dies():
    """A cached metadata connection to a dead broker must not sink a
    call two live brokers could serve (round-11 review finding)."""
    from supermusr_data_pipeline_spark.kafka.client import _Router

    with MiniCluster(n_brokers=3, replication_factor=2) as c:
        c.create_topic("traces", partitions=3)
        router = _Router(c.bootstrap, "probe")
        counts = router.metadata_counts(["traces"])
        assert counts == {"traces": 3}
        # the router's cached meta address is the first bootstrap entry;
        # kill exactly that broker
        dead = next(
            nid for nid, (h, p) in sorted(c.meta.brokers.items())
            if f"{h}:{p}" == router._meta_addr
        )
        c.kill(dead)
        assert router.metadata_counts(["traces"]) == {"traces": 3}
        router.close()
