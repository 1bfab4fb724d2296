"""Broker/client authentication: SASL SCRAM-SHA-256 (RFC 5802/7677 —
the reference pipeline's mechanism, common/src/lib.rs:62-68), SASL
PLAIN (RFC 4616), and TLS (SSL / SASL_SSL) — the full handshake over
real sockets against the in-process broker, plus the RFC 7677 golden
exchange pinned byte-for-byte."""

import pytest

from supermusr_data_pipeline_spark.kafka import (
    MiniBroker,
    MiniConsumer,
    MiniProducer,
    consumer_from_options,
)
from supermusr_data_pipeline_spark.kafka import auth as A
from supermusr_data_pipeline_spark.kafka import protocol as P
from supermusr_data_pipeline_spark.kafka.client import _Conn
from supermusr_data_pipeline_spark.streaming.envelope_stream import (
    kafka_source_options,
)


# ---------------------------------------------------------------------------
# SCRAM state machines (no sockets)
# ---------------------------------------------------------------------------


def test_scram_sha256_rfc7677_golden_exchange():
    """The RFC 7677 §3 example, byte-for-byte: user 'user', password
    'pencil', pinned nonces and salt."""
    salt = __import__("base64").b64decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    cred = A.make_scram_credential("pencil", salt=salt, iterations=4096)
    server = A.ScramServer(
        {"user": cred}, nonce="%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    )
    client = A.ScramClient("user", "pencil", nonce="rOprNGfwEbeRWgbNEkqO")

    c1 = client.first()
    assert c1 == b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
    s1 = server.first(c1)
    assert s1 == (
        b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    c2 = client.final(s1)
    assert c2 == (
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    s2 = server.final(c2)
    assert s2 == b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
    client.verify(s2)  # mutual auth: server signature checks out
    assert server.username == "user"


def test_scram_wrong_password_and_unknown_user_fail_alike():
    users = {"svc": A.make_scram_credential("right")}
    for username, password in (("svc", "wrong"), ("ghost", "whatever")):
        server = A.ScramServer(users)
        client = A.ScramClient(username, password)
        s1 = server.first(client.first())
        with pytest.raises(A.AuthError, match="authentication failed"):
            server.final(client.final(s1))


def test_scram_tampered_server_signature_detected():
    """A MITM broker that accepts without knowing ServerKey is caught by
    the client's verify step."""
    users = {"svc": A.make_scram_credential("pw")}
    server = A.ScramServer(users)
    client = A.ScramClient("svc", "pw")
    s1 = server.first(client.first())
    server.final(client.final(s1))
    with pytest.raises(A.AuthError, match="signature"):
        client.verify(b"v=" + __import__("base64").b64encode(b"x" * 32))


def test_saslname_escaping_roundtrip():
    assert A.saslname_escape("a=b,c") == "a=3Db=2Cc"
    assert A.saslname_unescape("a=3Db=2Cc") == "a=b,c"
    with pytest.raises(A.AuthError):
        A.saslname_unescape("bad=99escape")
    # a username containing both specials round-trips the full exchange
    users = {"a=b,c": A.make_scram_credential("pw")}
    server = A.ScramServer(users)
    client = A.ScramClient("a=b,c", "pw")
    s1 = server.first(client.first())
    server.final(client.final(s1))
    assert server.username == "a=b,c"


def test_plain_token_check():
    assert A.plain_check(A.plain_token("u", "p"), {"u": "p"}) == "u"
    for bad in (A.plain_token("u", "x"), A.plain_token("v", "p"), b"junk"):
        with pytest.raises(A.AuthError):
            A.plain_check(bad, {"u": "p"})


def test_scram_client_rejects_low_iteration_count():
    """RFC 5802 downgrade guard: a MITM on a plaintext channel could send
    i=1 to make the client's derived proof near-free to brute-force
    offline; the client must refuse below the RFC 7677 floor of 4096."""
    import base64

    client = A.ScramClient("user", "pencil", nonce="cnonce")
    client.first()
    salt = base64.b64encode(b"\x00" * 16).decode()
    evil = f"r=cnonceXYZ,s={salt},i=1".encode()
    with pytest.raises(A.AuthError, match="iteration count"):
        client.final(evil)
    # the legitimate floor itself is accepted (proof fails later at the
    # server, but the client-side downgrade check passes)
    ok = f"r=cnonceXYZ,s={salt},i={A.MIN_ITERATIONS}".encode()
    client2 = A.ScramClient("user", "pencil", nonce="cnonce")
    client2.first()
    client2.final(ok)  # no raise


def test_jaas_builder_roundtrip_property():
    """Property: kafka_source_options → ClientSecurity.from_options
    round-trips ANY unicode credential — including '\"' and '\\', which
    the unescaped f-string builder used to mis-emit (truncated password
    or plan-time ValueError)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        user=st.text(min_size=1, max_size=24),
        password=st.text(min_size=1, max_size=24),
    )
    def _case(user, password):
        opts = kafka_source_options(
            "localhost:1", ["traces"], username=user, password=password
        )
        sec = A.ClientSecurity.from_options(opts)
        assert (sec.username, sec.password) == (user, password)
        assert sec.protocol == "SASL_PLAINTEXT"

    _case()
    # the two characters the old builder broke on, pinned explicitly
    for pw in ('pa"ss', "pa\\ss", 'a\\"b', '"', "\\"):
        assert A.parse_jaas(A.build_jaas("u", pw)) == ("u", pw)


def test_jaas_parsing():
    user, pw = A.parse_jaas(
        "org.apache.kafka.common.security.scram.ScramLoginModule "
        'required username="svc" password="hunter2";'
    )
    assert (user, pw) == ("svc", "hunter2")
    # escaped quotes/backslashes inside JAAS values
    user, pw = A.parse_jaas(r'username="a\"b" password="c\\d";')
    assert (user, pw) == ('a"b', "c\\d")
    with pytest.raises(ValueError):
        A.parse_jaas('username="only";')


# ---------------------------------------------------------------------------
# over the wire: SASL_PLAINTEXT
# ---------------------------------------------------------------------------


def _roundtrip(bootstrap, security, n=25):
    with MiniProducer(bootstrap, security=security) as prod:
        for i in range(n):
            prod.send("traces", f"m{i}".encode(), key=b"k")
    consumer = MiniConsumer(
        bootstrap, ["traces"], starting_offsets="earliest", security=security
    )
    got = []
    while True:
        batch = consumer.poll(max_wait_ms=100)
        if not batch:
            break
        got.extend(r.value.decode() for r in batch)
    consumer.close()
    assert got == [f"m{i}" for i in range(n)]


def test_sasl_plaintext_scram_end_to_end():
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    scram_users={"svc": "hunter2"}) as b:
        opts = kafka_source_options(
            b.bootstrap, ["traces"], username="svc", password="hunter2",
            starting_offsets="earliest",
        )
        sec = A.ClientSecurity.from_options(opts)
        _roundtrip(b.bootstrap, sec)
        # and through the production option-dict path
        c = consumer_from_options(opts)
        assert [r.value for r in c.poll()] != []
        c.close()


def test_sasl_plain_mechanism_end_to_end():
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    plain_users={"svc": "pw"}) as b:
        sec = A.ClientSecurity(
            protocol="SASL_PLAINTEXT", mechanism="PLAIN",
            username="svc", password="pw",
        )
        _roundtrip(b.bootstrap, sec)


def test_sasl_wrong_password_fails_loud_and_disconnects():
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    scram_users={"svc": "right"}) as b:
        sec = A.ClientSecurity(
            protocol="SASL_PLAINTEXT", mechanism="SCRAM-SHA-256",
            username="svc", password="wrong",
        )
        with pytest.raises(OSError, match="authentication failed"):
            MiniProducer(b.bootstrap, security=sec)


def test_sasl_unsupported_mechanism_reports_offers():
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    scram_users={"svc": "pw"}) as b:
        sec = A.ClientSecurity(
            protocol="SASL_PLAINTEXT", mechanism="PLAIN",  # not offered
            username="svc", password="pw",
        )
        with pytest.raises(OSError, match="SCRAM-SHA-256"):
            MiniProducer(b.bootstrap, security=sec)


def test_unauthenticated_api_is_disconnected():
    """Pre-auth, only ApiVersions + the SASL APIs are served; a produce
    drops the connection (the real broker's behavior)."""
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    scram_users={"svc": "pw"}) as b:
        conn = _Conn(b.bootstrap, "intruder")
        # ApiVersions IS allowed pre-auth (clients negotiate first)
        cur = conn.request(P.API_VERSIONS, 0, b"")
        err, apis = P.decode_api_versions_response(cur)
        assert err == P.ERR_NONE
        assert {k for k, _lo, _hi in apis} >= {
            P.API_SASL_HANDSHAKE, P.API_SASL_AUTHENTICATE,
        }
        conn.send_request(
            P.API_METADATA, 0, P.encode_metadata_request(["traces"])
        )
        with pytest.raises((ConnectionError, OSError)):
            conn.recv_response()
        conn.close()


def test_plaintext_broker_rejects_handshake_cleanly():
    """Against a PLAINTEXT broker a SASL handshake gets an in-band
    ILLEGAL_SASL_STATE error, not a hang or a silent success."""
    with MiniBroker() as b:
        conn = _Conn(b.bootstrap, "curious")
        cur = conn.request(
            P.API_SASL_HANDSHAKE, 1,
            P.encode_sasl_handshake_request("SCRAM-SHA-256"),
        )
        err, _mechs = P.decode_sasl_handshake_response(cur)
        assert err == P.ERR_ILLEGAL_SASL_STATE
        conn.close()


# ---------------------------------------------------------------------------
# TLS: SSL and SASL_SSL
# ---------------------------------------------------------------------------


def test_ssl_end_to_end_and_untrusted_ca_rejected(tmp_path):
    with MiniBroker(security_protocol="SSL") as b:
        cert, _key = b.ssl_cert
        sec = A.ClientSecurity(protocol="SSL", ca_location=cert)
        _roundtrip(b.bootstrap, sec)
        # a client trusting a DIFFERENT CA must refuse the channel
        other_cert, _ = A.generate_self_signed_cert(str(tmp_path))
        bad = A.ClientSecurity(protocol="SSL", ca_location=other_cert)
        with pytest.raises(Exception):  # noqa: B017 — ssl.SSLError family
            MiniProducer(b.bootstrap, security=bad)
        # and SSL without a CA is a loud config error, not plaintext
        with pytest.raises(ValueError, match="ca.location"):
            MiniProducer(
                b.bootstrap, security=A.ClientSecurity(protocol="SSL")
            )


def test_sasl_ssl_scram_end_to_end_via_option_dict():
    """The full reference-shaped stack: TLS channel + SCRAM credentials,
    configured through the production kafka_source_options builder."""
    with MiniBroker(security_protocol="SASL_SSL",
                    scram_users={"svc": "hunter2"}) as b:
        cert, _key = b.ssl_cert
        opts = kafka_source_options(
            b.bootstrap, ["traces"], username="svc", password="hunter2",
            starting_offsets="earliest", ssl_ca_location=cert,
        )
        assert opts["kafka.security.protocol"] == "SASL_SSL"
        sec = A.ClientSecurity.from_options(opts)
        _roundtrip(b.bootstrap, sec)
        c = consumer_from_options(opts)
        assert len(_poll_all(c)) == 25
        c.close()


def _poll_all(consumer):
    got = []
    while True:
        batch = consumer.poll(max_wait_ms=100)
        if not batch:
            return got
        got.extend(batch)


# ---------------------------------------------------------------------------
# Spark DataSource over an authenticated broker
# ---------------------------------------------------------------------------


def test_spark_kafka_wire_read_over_sasl_ssl(spark):
    """The kafka-wire DataSource carries ClientSecurity inside its read
    plan: executor fetch tasks authenticate (TLS + SCRAM) on their own
    connections — the full S1 surface over an authenticated channel."""
    from supermusr_data_pipeline_spark.kafka import KafkaWireDataSource

    with MiniBroker(security_protocol="SASL_SSL",
                    scram_users={"svc": "hunter2"},
                    default_partitions=3) as b:
        cert, _key = b.ssl_cert
        with MiniProducer(b.bootstrap, security=A.ClientSecurity(
            protocol="SASL_SSL", mechanism="SCRAM-SHA-256",
            username="svc", password="hunter2", ca_location=cert,
        )) as prod:
            for i in range(90):
                prod.send("traces", f"v{i}".encode(), key=str(i).encode())
        spark.dataSource.register(KafkaWireDataSource)
        opts = kafka_source_options(
            b.bootstrap, ["traces"], username="svc", password="hunter2",
            ssl_ca_location=cert,
        )
        df = (
            spark.read.format("kafka-wire")
            .options(**opts)
            .load()
        )
        rows = df.collect()
        assert len(rows) == 90
        assert sorted({r.partition for r in rows}) == [0, 1, 2]
        assert {bytes(r.value).decode() for r in rows} == {
            f"v{i}" for i in range(90)
        }


def test_spark_streaming_read_over_sasl_ssl(spark, tmp_path):
    """The streaming face of the same matrix corner: engine-checkpointed
    offsets over an authenticated TLS channel — driver oracle and every
    executor fetch task authenticate per micro-batch."""
    from supermusr_data_pipeline_spark.kafka import KafkaWireDataSource

    with MiniBroker(security_protocol="SASL_SSL",
                    scram_users={"svc": "hunter2"},
                    default_partitions=2) as b:
        cert, _key = b.ssl_cert
        sec = A.ClientSecurity(
            protocol="SASL_SSL", mechanism="SCRAM-SHA-256",
            username="svc", password="hunter2", ca_location=cert,
        )
        with MiniProducer(b.bootstrap, security=sec) as prod:
            for i in range(40):
                prod.send("traces", f"v{i}".encode(), key=str(i).encode())
        spark.dataSource.register(KafkaWireDataSource)
        opts = kafka_source_options(
            b.bootstrap, ["traces"], username="svc", password="hunter2",
            ssl_ca_location=cert, starting_offsets="earliest",
            max_offsets_per_trigger=25,
        )
        out = str(tmp_path / "sink")
        q = (
            spark.readStream.format("kafka-wire").options(**opts).load()
            .selectExpr("cast(value as string) v")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            import time as _t

            deadline = _t.time() + 45
            n = 0
            while _t.time() < deadline and n < 40:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                _t.sleep(0.2)
        finally:
            q.stop()
        vals = {r.v for r in spark.read.parquet(out).collect()}
        assert vals == {f"v{i}" for i in range(40)}


def test_scram_roundtrip_property():
    """Property: the full SCRAM exchange authenticates for arbitrary
    unicode usernames/passwords (saslname escaping included) and fails
    for any perturbed password."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        user=st.text(min_size=1, max_size=24),
        password=st.text(min_size=1, max_size=24),
    )
    def _case(user, password):
        # MIN_ITERATIONS: the client now enforces the RFC 7677 floor
        users = {
            user: A.make_scram_credential(
                password, iterations=A.MIN_ITERATIONS
            )
        }
        server = A.ScramServer(users)
        client = A.ScramClient(user, password)
        s1 = server.first(client.first())
        s2 = server.final(client.final(s1))
        client.verify(s2)
        assert server.username == user
        # the same exchange with a wrong password must fail
        bad = A.ScramClient(user, password + "x")
        server2 = A.ScramServer(users)
        sb1 = server2.first(bad.first())
        with pytest.raises(A.AuthError):
            server2.final(bad.final(sb1))

    _case()


def test_malformed_sasl_frames_fail_in_band_not_crash():
    """Garbage SASL payloads (missing attrs, bad base64, invalid UTF-8)
    get the in-band SASL_AUTHENTICATION_FAILED response — never a
    handler crash or a silent drop before the error frame."""
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    scram_users={"svc": "pw"}) as b:
        for garbage in (
            b"\xff\xfe invalid utf8",
            b"n,,nonsense-without-attrs",
            b"n,,n=svc",  # missing r=
        ):
            conn = _Conn(b.bootstrap, "fuzzer")
            cur = conn.request(
                P.API_SASL_HANDSHAKE, 1,
                P.encode_sasl_handshake_request("SCRAM-SHA-256"),
            )
            err, _m = P.decode_sasl_handshake_response(cur)
            assert err == P.ERR_NONE
            cur = conn.request(
                P.API_SASL_AUTHENTICATE, 0,
                P.encode_sasl_authenticate_request(garbage),
            )
            aerr, msg, _out = P.decode_sasl_authenticate_response(cur)
            assert aerr == P.ERR_SASL_AUTHENTICATION_FAILED
            assert msg  # the reason travels in-band
            conn.close()
        # malformed client-FINAL after a valid first round
        conn = _Conn(b.bootstrap, "fuzzer2")
        conn.request(P.API_SASL_HANDSHAKE, 1,
                     P.encode_sasl_handshake_request("SCRAM-SHA-256"))
        client = A.ScramClient("svc", "pw")
        cur = conn.request(P.API_SASL_AUTHENTICATE, 0,
                           P.encode_sasl_authenticate_request(client.first()))
        aerr, _msg, _sf = P.decode_sasl_authenticate_response(cur)
        assert aerr == P.ERR_NONE
        cur = conn.request(
            P.API_SASL_AUTHENTICATE, 0,
            P.encode_sasl_authenticate_request(b"c=biws,r=zzz,p=!!notb64"),
        )
        aerr, msg, _out = P.decode_sasl_authenticate_response(cur)
        assert aerr == P.ERR_SASL_AUTHENTICATION_FAILED
        conn.close()


def test_unknown_user_decoy_is_stable_across_connections():
    """Anti-enumeration: probing a nonexistent username twice yields the
    SAME salt/iterations (deterministic per-broker decoy) — a fresh
    random decoy per connection would be a two-probe existence oracle."""
    with MiniBroker(security_protocol="SASL_PLAINTEXT",
                    scram_users={"svc": "pw"}) as b:
        def server_first(user):
            conn = _Conn(b.bootstrap, "probe")
            conn.request(P.API_SASL_HANDSHAKE, 1,
                         P.encode_sasl_handshake_request("SCRAM-SHA-256"))
            client = A.ScramClient(user, "whatever")
            cur = conn.request(
                P.API_SASL_AUTHENTICATE, 0,
                P.encode_sasl_authenticate_request(client.first()),
            )
            aerr, _msg, out = P.decode_sasl_authenticate_response(cur)
            conn.close()
            assert aerr == P.ERR_NONE  # failure only lands at the proof
            attrs = dict(kv.split("=", 1) for kv in out.decode().split(",")[1:])
            return attrs["s"], attrs["i"]

        a1 = server_first("ghost")
        a2 = server_first("ghost")
        assert a1 == a2  # stable decoy: no existence oracle
        real1 = server_first("svc")
        real2 = server_first("svc")
        assert real1 == real2 and real1 != a1
