"""Consumer-group coordination over the wire (S1's third leg, VERDICT
r9 'What's missing #1'): the in-process broker's group coordinator
(FindCoordinator/JoinGroup/SyncGroup/Heartbeat/LeaveGroup, generation-
fenced OffsetCommit v2, OffsetFetch v1 — kafka/broker.py) driven by the
rebalancing GroupConsumer (kafka/client.py).  Reference analog:
create_default_consumer sets group.id with explicit commits
(common/src/lib.rs:72-94)."""

import threading
import time

import pytest

from supermusr_data_pipeline_spark.kafka import (
    GroupConsumer,
    MiniBroker,
    MiniProducer,
)
from supermusr_data_pipeline_spark.kafka import protocol as P
from supermusr_data_pipeline_spark.kafka.client import _Conn


def _fill(broker, topic, n, partitions=4):
    broker.create_topic(topic, partitions=partitions)
    with MiniProducer(broker.bootstrap, buffer_max=64) as prod:
        for i in range(n):
            prod.send(topic, f"v{i}".encode(), key=str(i % partitions).encode())


def test_single_member_owns_everything_and_resumes_from_commit():
    with MiniBroker() as broker:
        _fill(broker, "t", 40)
        c = GroupConsumer(broker.bootstrap, "g1", ["t"], session_timeout_ms=4000)
        assert c.assignment() == [("t", p) for p in range(4)]
        got = []
        deadline = time.time() + 20
        while len(got) < 40 and time.time() < deadline:
            got.extend(c.poll(max_wait_ms=200))
        assert len(got) == 40
        c.commit()
        c.close()

        # a new member of the SAME group resumes from the committed
        # offsets — nothing is redelivered
        c2 = GroupConsumer(broker.bootstrap, "g1", ["t"], session_timeout_ms=4000)
        assert c2.poll(max_wait_ms=200) == []
        # ... but a DIFFERENT group starts from earliest
        c3 = GroupConsumer(broker.bootstrap, "g2", ["t"], session_timeout_ms=4000)
        got3 = []
        deadline = time.time() + 20
        while len(got3) < 40 and time.time() < deadline:
            got3.extend(c3.poll(max_wait_ms=200))
        assert len(got3) == 40
        c2.close()
        c3.close()


def test_two_members_split_partitions_disjoint_and_complete():
    with MiniBroker() as broker:
        _fill(broker, "t", 0, partitions=4)
        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"],
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        assert len(c1.assignment()) == 4

        # second member joins from another thread (its JoinGroup blocks
        # until c1's heartbeat notices the rebalance and rejoins)
        box = {}

        def join_second():
            box["c2"] = GroupConsumer(
                broker.bootstrap, "g", ["t"],
                session_timeout_ms=4000, heartbeat_interval_ms=100,
            )

        th = threading.Thread(target=join_second)
        th.start()
        deadline = time.time() + 10
        while "c2" not in box and time.time() < deadline:
            c1.poll(max_wait_ms=50)  # heartbeats ride the poll loop
        th.join(timeout=10)
        c2 = box["c2"]
        # c1 must have rejoined (rebalanced) by now
        deadline = time.time() + 10
        while len(c1.assignment()) != 2 and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        a1, a2 = set(c1.assignment()), set(c2.assignment())
        assert a1 | a2 == {("t", p) for p in range(4)}
        assert not (a1 & a2), "two members own the same partition"
        assert c1.generation == c2.generation

        # every message lands with exactly one member
        _fill(broker, "t", 24)
        got1, got2 = [], []
        deadline = time.time() + 20
        while len(got1) + len(got2) < 24 and time.time() < deadline:
            got1.extend(c1.poll(max_wait_ms=100))
            got2.extend(c2.poll(max_wait_ms=100))
        assert len(got1) + len(got2) == 24
        assert got1 and got2, "round-robin split left one member idle"
        c1.close()
        c2.close()


def test_leave_triggers_rebalance_and_survivor_owns_all():
    with MiniBroker() as broker:
        _fill(broker, "t", 8, partitions=4)
        # every poll anywhere in this test accumulates here — the wait
        # loops consume records too, and dropping them would misread the
        # coverage check below
        seen: set[tuple[int, int]] = set()

        def pump(c, wait=50):
            for r in c.poll(max_wait_ms=wait):
                seen.add((r.partition, r.offset))

        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"],
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        box = {}
        th = threading.Thread(
            target=lambda: box.update(
                c2=GroupConsumer(
                    broker.bootstrap, "g", ["t"],
                    session_timeout_ms=4000, heartbeat_interval_ms=100,
                )
            )
        )
        th.start()
        deadline = time.time() + 10
        while "c2" not in box and time.time() < deadline:
            pump(c1)
        th.join(timeout=10)
        c2 = box["c2"]
        while len(c1.assignment()) != 2 and time.time() < deadline:
            pump(c1)

        # drain + commit, then c2 LEAVES: c1's next heartbeat rebalances
        # it onto all four partitions, resuming from the group's commits.
        # Coverage is counted on DISTINCT (partition, offset): before the
        # first commit a rebalance may redeliver — the protocol's
        # at-least-once window, closed below by committing.
        deadline = time.time() + 20
        while len(seen) < 8 and time.time() < deadline:
            pump(c1, 100)
            pump(c2, 100)
        assert len(seen) == 8
        c1.commit()
        c2.commit()
        c2.close()  # LeaveGroup
        deadline = time.time() + 10
        while len(c1.assignment()) != 4 and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        assert c1.assignment() == [("t", p) for p in range(4)]
        # committed handoff: nothing redelivered after the rebalance
        assert c1.poll(max_wait_ms=200) == []
        _fill(broker, "t", 4)
        got = []
        deadline = time.time() + 20
        while len(got) < 4 and time.time() < deadline:
            got.extend(c1.poll(max_wait_ms=100))
        assert len(got) == 4
        c1.close()


def test_session_timeout_evicts_silent_member():
    with MiniBroker() as broker:
        _fill(broker, "t", 0, partitions=4)
        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"],
            session_timeout_ms=1200, heartbeat_interval_ms=100,
        )
        box = {}
        th = threading.Thread(
            target=lambda: box.update(
                c2=GroupConsumer(
                    broker.bootstrap, "g", ["t"],
                    session_timeout_ms=1200, heartbeat_interval_ms=100,
                )
            )
        )
        th.start()
        deadline = time.time() + 10
        while "c2" not in box and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        th.join(timeout=10)
        c2 = box["c2"]
        while len(c1.assignment()) != 2 and time.time() < deadline:
            c1.poll(max_wait_ms=50)

        # c2 goes SILENT (no heartbeats).  c1 keeps polling: the broker
        # evicts c2 at its session timeout and c1 ends up owning all 4.
        deadline = time.time() + 15
        while len(c1.assignment()) != 4 and time.time() < deadline:
            c1.poll(max_wait_ms=100)
        assert c1.assignment() == [("t", p) for p in range(4)]

        # the evicted member's next group call is told who it is now
        cur = c2._coord.request(
            P.API_HEARTBEAT, 0,
            P.encode_heartbeat_request("g", c2.generation, c2.member_id),
        )
        assert P.decode_heartbeat_response(cur) == P.ERR_UNKNOWN_MEMBER_ID
        c2.close(leave=False)
        c1.close()


def test_stale_generation_commit_is_fenced():
    with MiniBroker() as broker:
        _fill(broker, "t", 4, partitions=2)
        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"],
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        stale_gen, stale_member = c1.generation, c1.member_id
        # force a new generation: a second member joins
        box = {}
        th = threading.Thread(
            target=lambda: box.update(
                c2=GroupConsumer(
                    broker.bootstrap, "g", ["t"],
                    session_timeout_ms=4000, heartbeat_interval_ms=100,
                )
            )
        )
        th.start()
        deadline = time.time() + 10
        while "c2" not in box and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        th.join(timeout=10)
        assert c1.generation > stale_gen

        # a commit carrying the OLD generation must be rejected
        conn = _Conn(broker.bootstrap, "stale")
        cur = conn.request(
            P.API_OFFSET_COMMIT, 2,
            P.encode_offset_commit_request(
                "g", stale_gen, stale_member, [("t", [(0, 999, None)])]
            ),
        )
        [(_t, prs)] = P.decode_offset_commit_response(cur)
        assert prs[0][1] == P.ERR_ILLEGAL_GENERATION
        # ... and the standalone (gen=-1, member='') form is allowed
        cur = conn.request(
            P.API_OFFSET_COMMIT, 2,
            P.encode_offset_commit_request(
                "standalone", -1, "", [("t", [(0, 3, None)])]
            ),
        )
        [(_t, prs)] = P.decode_offset_commit_response(cur)
        assert prs[0][1] == P.ERR_NONE
        cur = conn.request(
            P.API_OFFSET_FETCH, 1,
            P.encode_offset_fetch_request("standalone", [("t", [0, 1])]),
        )
        [(_t, prs)] = P.decode_offset_fetch_response(cur)
        assert dict((p, o) for p, o, _m, _e in prs) == {0: 3, 1: -1}
        conn.close()
        box["c2"].close()
        c1.close()


def test_inconsistent_protocol_type_rejected():
    with MiniBroker() as broker:
        broker.create_topic("t", partitions=1)
        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"], session_timeout_ms=4000
        )
        conn = _Conn(broker.bootstrap, "rogue")
        cur = conn.request(
            P.API_JOIN_GROUP, 0,
            P.encode_join_group_request("g", 4000, "", "connect", [("x", b"")]),
        )
        err, *_ = P.decode_join_group_response(cur)
        assert err == P.ERR_INCONSISTENT_GROUP_PROTOCOL
        conn.close()
        c1.close()


def test_find_coordinator_points_home():
    with MiniBroker() as broker:
        conn = _Conn(broker.bootstrap, "probe")
        cur = conn.request(
            P.API_FIND_COORDINATOR, 0, P.encode_find_coordinator_request("g")
        )
        err, node, host, port = P.decode_find_coordinator_response(cur)
        assert err == P.ERR_NONE and f"{host}:{port}" == broker.bootstrap
        conn.close()


def test_group_id_option_selects_group_consumer():
    """kafka_source_options(group_id=...) emits kafka.group.id (the JVM
    source's consumer-group override) and consumer_from_options maps it
    to the group-managed consumer end-to-end."""
    from supermusr_data_pipeline_spark.kafka import consumer_from_options
    from supermusr_data_pipeline_spark.streaming.envelope_stream import (
        kafka_source_options,
    )

    with MiniBroker() as broker:
        _fill(broker, "t", 10, partitions=2)
        opts = kafka_source_options(
            broker.bootstrap, ["t"], starting_offsets="earliest",
            group_id="daq-readers",
        )
        assert opts["kafka.group.id"] == "daq-readers"
        c = consumer_from_options(opts)
        assert isinstance(c, GroupConsumer)
        got = []
        deadline = time.time() + 20
        while len(got) < 10 and time.time() < deadline:
            got.extend(c.poll(max_wait_ms=200))
        assert len(got) == 10
        c.commit()
        c.close()


def test_group_starting_timestamp_positions_uncommitted(monkeypatch):
    """kafka.group.id + startingTimestamp: committed offsets win, the
    timestamp positions never-committed partitions (ADVICE r10 — this
    combination used to silently fall back to startingOffsets)."""
    from supermusr_data_pipeline_spark.kafka import consumer_from_options

    with MiniBroker() as broker:
        broker.create_topic("t", partitions=2)
        base_ms = 1_700_000_000_000
        with MiniProducer(broker.bootstrap) as prod:
            for i in range(10):
                # 5 records per partition, timestamps base, base+1000, ...
                prod.send(
                    "t", f"v{i}".encode(), partition=i % 2,
                    timestamp_ms=base_ms + (i // 2) * 1000,
                )
        # commit partition 0 at offset 4 under the group (standalone form)
        conn = _Conn(broker.bootstrap, "seed")
        conn.request(
            P.API_OFFSET_COMMIT, 2,
            P.encode_offset_commit_request("g", -1, "", [("t", [(0, 4, None)])]),
        )
        conn.close()

        c = consumer_from_options(
            {
                "kafka.bootstrap.servers": broker.bootstrap,
                "subscribe": "t",
                "startingOffsets": "earliest",
                "startingTimestamp": str(base_ms + 3000),
                "kafka.group.id": "g",
            }
        )
        assert isinstance(c, GroupConsumer)
        # partition 0: committed offset 4 wins over the timestamp;
        # partition 1: never committed -> first offset with ts >= base+3000
        assert c._positions[("t", 0)] == 4
        assert c._positions[("t", 1)] == 3
        c.close()


def test_join_survives_leave_during_rebalance():
    """A JoinGroup blocked in PreparingRebalance whose round is bumped
    mid-wait (the straggler LEAVES instead of rejoining) must complete
    in the NEW round with a fresh generation — not fall through to a
    stale-generation/INCONSISTENT_GROUP_PROTOCOL response (ADVICE r10,
    broker._join_group)."""
    with MiniBroker() as broker:
        broker.create_topic("t", partitions=2)
        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"],
            session_timeout_ms=8000, heartbeat_interval_ms=8000,
        )
        gen0 = c1.generation

        # a second member's join starts a rebalance and BLOCKS on c1
        box = {}

        def join_second():
            conn = _Conn(broker.bootstrap, "late")
            cur = conn.request(
                P.API_JOIN_GROUP, 0,
                P.encode_join_group_request(
                    "g", 8000, "", "consumer",
                    [("roundrobin", P.encode_consumer_subscription(["t"]))],
                ),
            )
            box["resp"] = P.decode_join_group_response(cur)
            conn.close()

        th = threading.Thread(target=join_second)
        th.start()
        time.sleep(0.4)  # let the join enter its wait loop
        assert "resp" not in box

        # c1 leaves instead of rejoining: round bumps, joined clears
        c1._coord.request(
            P.API_LEAVE_GROUP, 0,
            P.encode_leave_group_request("g", c1.member_id),
        )
        th.join(timeout=10)
        assert not th.is_alive()
        err, gen, proto, leader, member, _members = box["resp"]
        assert err == P.ERR_NONE
        assert gen == gen0 + 1, "join must complete in the NEW round"
        assert leader == member, "sole survivor leads"
        assert proto == "roundrobin"
        c1.close(leave=False)


def test_spark_job_to_group_consumer_interop(spark):
    """Interop closure (VERDICT r10 next #8): a SPARK JOB produces the
    topic over the wire (executor-side producers in foreachPartition),
    and stock-shaped group consumers — subscribe -> rebalance ->
    committed offsets — consume it: one member drains and commits, a
    second member joining forces a rebalance (generation bump, disjoint
    split), both drain Spark-produced deltas, and a fresh member of the
    same group resumes from the committed offsets with nothing
    redelivered."""
    with MiniBroker() as broker:
        broker.create_topic("docs", partitions=4)
        bootstrap = broker.bootstrap

        def produce(df):
            def send_part(rows):
                from supermusr_data_pipeline_spark.kafka import MiniProducer

                with MiniProducer(bootstrap, buffer_max=64) as p:
                    for r in rows:
                        p.send("docs", r.v.encode(), key=r.k.encode())

            df.foreachPartition(send_part)

        produce(
            spark.range(120).selectExpr(
                "cast(id as string) k", "concat('v-', id) v"
            )
        )
        assert sum(broker.topic_sizes()["docs"]) == 120

        c1 = GroupConsumer(
            bootstrap, "readers", ["docs"],
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        assert c1.assignment() == [("docs", p) for p in range(4)]
        got = {}
        deadline = time.time() + 20
        while len(got) < 120 and time.time() < deadline:
            for r in c1.poll(max_wait_ms=100):
                got[r.value.decode()] = r.key.decode()
        assert len(got) == 120
        assert got["v-17"] == "17"  # content round-trips, not just counts
        c1.commit()
        gen0 = c1.generation

        # a second member joins -> rebalance -> disjoint two-way split
        box = {}
        th = threading.Thread(
            target=lambda: box.update(
                c2=GroupConsumer(
                    bootstrap, "readers", ["docs"],
                    session_timeout_ms=4000, heartbeat_interval_ms=100,
                )
            )
        )
        th.start()
        deadline = time.time() + 10
        while "c2" not in box and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        th.join(timeout=10)
        c2 = box["c2"]
        while len(c1.assignment()) != 2 and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        assert c1.generation > gen0
        a1, a2 = set(c1.assignment()), set(c2.assignment())
        assert a1 | a2 == {("docs", p) for p in range(4)} and not (a1 & a2)

        # Spark produces a delta; the group sees each record exactly once
        produce(
            spark.range(120, 160).selectExpr(
                "cast(id as string) k", "concat('v-', id) v"
            )
        )
        delta = []
        deadline = time.time() + 20
        while len(delta) < 40 and time.time() < deadline:
            delta.extend(c1.poll(max_wait_ms=100))
            delta.extend(c2.poll(max_wait_ms=100))
        assert sorted(r.value.decode() for r in delta) == sorted(
            f"v-{i}" for i in range(120, 160)
        )
        c1.commit()
        c2.commit()
        c1.close()
        c2.close()

        # committed handoff: a fresh member resumes, nothing redelivered
        c3 = GroupConsumer(
            bootstrap, "readers", ["docs"], session_timeout_ms=4000
        )
        assert c3.poll(max_wait_ms=200) == []
        c3.close()


def test_group_seek_buffers_targets_for_unowned_partitions():
    """The consumer_factory resume contract under group semantics: a
    seek() for a partition another member currently owns must not be
    silently dropped — it buffers and applies when a rebalance hands the
    partition over (one-shot), so a FetchLoopNexusWriter resumed through
    a group-consumer factory keeps its saved cursor."""
    with MiniBroker() as broker:
        _fill(broker, "t", 8, partitions=4)
        c1 = GroupConsumer(
            broker.bootstrap, "g", ["t"],
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        box = {}
        th = threading.Thread(
            target=lambda: box.update(
                c2=GroupConsumer(
                    broker.bootstrap, "g", ["t"],
                    session_timeout_ms=4000, heartbeat_interval_ms=100,
                )
            )
        )
        th.start()
        deadline = time.time() + 10
        while "c2" not in box and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        th.join(timeout=10)
        c2 = box["c2"]
        while len(c1.assignment()) != 2 and time.time() < deadline:
            c1.poll(max_wait_ms=50)
        assert len(c1.assignment()) == 2

        # seek ALL four partitions on c1: the two it owns move now, the
        # two c2 owns buffer; an unsubscribed topic's key drops
        targets = {("t", p): 0 for p in range(4)}
        targets[("ghost", 0)] = 99
        c1.seek(targets)
        owned_now = set(c1.assignment())
        assert all(c1.positions()[tp] == 0 for tp in owned_now)
        buffered = {("t", p) for p in range(4)} - owned_now
        assert set(c1._seek_targets) == buffered

        # c2 leaves -> c1 rebalances onto all four -> buffered targets
        # apply exactly once, beating the group's committed offsets
        c2.poll(max_wait_ms=200)  # move c2 past 0 on its partitions
        c1.commit()  # commit both so "committed wins" would place the
        c2.commit()  # handed-over partitions at their polled log ends
        c2.close()
        sizes = {p: c1._log_end("t", p) for (_t, p) in buffered}
        want = {(p, 0) for (_t, p) in buffered if sizes[p] > 0}
        deadline = time.time() + 10
        got: set[tuple[int, int]] = set()
        while time.time() < deadline and not (
            len(c1.assignment()) == 4 and want <= got
        ):
            for r in c1.poll(max_wait_ms=50):
                got.add((r.partition, r.offset))
        assert len(c1.assignment()) == 4
        assert c1._seek_targets == {}  # one-shot: consumed on adoption
        # redelivery from offset 0 proves the buffered target beat the
        # committed offsets for every handed-over partition with data
        assert want <= got
        c1.close()


def test_group_seek_survives_rebalance_via_commit_anchor():
    """seek() on owned partitions must COMMIT the new positions: a
    rebalance wipes in-memory positions and repositions from the
    group's committed offsets, so an uncommitted seek would silently
    fall back to starting_offsets ('latest' -> every record between
    the saved cursor and the log end skipped)."""
    with MiniBroker() as broker:
        _fill(broker, "t", 4, partitions=1)
        c = GroupConsumer(
            broker.bootstrap, "g", ["t"], starting_offsets="latest",
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        assert c.poll(max_wait_ms=200) == []  # latest: nothing behind
        c.seek({("t", 0): 0})
        # a nonexistent partition's key drops instead of lingering
        c.seek({("t", 9): 5})
        assert ("t", 9) not in c._seek_targets
        # simulate a rebalance (member churn / session expiry path):
        # rejoin wipes positions and re-adopts from committed offsets
        c._join()
        assert c.positions()[("t", 0)] == 0
        got = []
        deadline = time.time() + 10
        while len(got) < 4 and time.time() < deadline:
            got.extend(c.poll(max_wait_ms=100))
        assert len(got) == 4  # the seek survived the rebalance
        c.close()


def test_group_seek_commit_scoped_to_seeked_partitions():
    """The seek anchor must commit ONLY the repositioned partitions:
    committing all in-memory positions would publish other partitions'
    uncommitted poll progress to the group, breaking at-least-once for
    records polled but not yet processed."""
    with MiniBroker() as broker:
        broker.create_topic("t", partitions=2)
        with MiniProducer(broker.bootstrap) as prod:
            for i in range(8):
                prod.send("t", f"v{i}".encode(), partition=i % 2)
        c = GroupConsumer(
            broker.bootstrap, "g", ["t"], starting_offsets="earliest",
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        got = []
        deadline = time.time() + 10
        while len(got) < 8 and time.time() < deadline:
            got.extend(c.poll(max_wait_ms=100))
        assert len(got) == 8  # both partitions polled, nothing committed
        c.seek({("t", 0): 0})  # anchor commits (t,0)=0 and ONLY that
        c.close()

        # a fresh member adopting from the group's commits: (t,0) at the
        # anchored 0 (redelivery), (t,1) UNCOMMITTED -> 'latest' -> none
        c2 = GroupConsumer(
            broker.bootstrap, "g", ["t"], starting_offsets="latest",
            session_timeout_ms=4000, heartbeat_interval_ms=100,
        )
        got2 = []
        deadline = time.time() + 10
        while len(got2) < 4 and time.time() < deadline:
            got2.extend(c2.poll(max_wait_ms=100))
        assert {r.partition for r in got2} == {0}
        assert len(got2) == 4
        assert c2.poll(max_wait_ms=200) == []
        c2.close()
