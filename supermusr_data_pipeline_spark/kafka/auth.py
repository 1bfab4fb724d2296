"""Kafka broker/client authentication from the public specs: SASL
SCRAM-SHA-256 (RFC 5802 framing + RFC 7677 hash parameters — the
reference pipeline's mechanism, common/src/lib.rs:62-68), SASL PLAIN
(RFC 4616), and TLS channel helpers for the SSL / SASL_SSL protocols.

The SASL exchange rides the Kafka SaslHandshake v1 + SaslAuthenticate
v0 APIs (https://kafka.apache.org/protocol): the client asks the broker
for a mechanism, then the RFC's challenge/response bytes travel as
opaque ``auth_bytes`` payloads.  Credentials are stored the way a real
broker stores SCRAM users — salt, iteration count, StoredKey, ServerKey
— never the password, so a leaked store cannot impersonate a client.

``ClientSecurity.from_options`` parses the SAME option names the JVM
Kafka source takes (``kafka.security.protocol``,
``kafka.sasl.mechanism``, ``kafka.sasl.jaas.config``) plus librdkafka's
``ssl.ca.location`` (the reference's Rust client stack), so the
production `kafka_source_options(username=..., password=...)` dict
drives an authenticated connection end-to-end.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import re
import secrets
from dataclasses import dataclass

SCRAM_SHA_256 = "SCRAM-SHA-256"
PLAIN = "PLAIN"
SUPPORTED_MECHANISMS = (SCRAM_SHA_256, PLAIN)

_PROTOCOLS = ("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")


class AuthError(Exception):
    """SASL exchange failed (bad proof, unknown user, malformed frame)."""


# ---------------------------------------------------------------------------
# SCRAM-SHA-256 (RFC 5802 message flow, RFC 7677 SHA-256 parameters)
# ---------------------------------------------------------------------------


def _h(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def _hmac(key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hashlib.sha256).digest()


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def saslname_escape(name: str) -> str:
    """RFC 5802 saslname: '=' -> '=3D', ',' -> '=2C'."""
    return name.replace("=", "=3D").replace(",", "=2C")


def saslname_unescape(name: str) -> str:
    if re.search(r"=(?!2C|3D)", name):
        raise AuthError("invalid saslname escape")
    return name.replace("=2C", ",").replace("=3D", "=")


@dataclass(frozen=True)
class ScramCredential:
    """What the broker stores per user — the RFC's server-side verifier
    material (StoredKey/ServerKey), NOT the password."""

    salt: bytes
    stored_key: bytes
    server_key: bytes
    iterations: int


# RFC 7677 §4: SCRAM-SHA-256 iteration counts below 4096 SHOULD be
# rejected; doubles as the client-side downgrade floor (ScramClient.final).
MIN_ITERATIONS = 4096


def make_scram_credential(
    password: str, salt: bytes | None = None, iterations: int = 4096
) -> ScramCredential:
    if salt is None:
        salt = secrets.token_bytes(16)
    salted = hashlib.pbkdf2_hmac(
        "sha256", password.encode("utf-8"), salt, iterations
    )
    client_key = _hmac(salted, b"Client Key")
    server_key = _hmac(salted, b"Server Key")
    return ScramCredential(salt, _h(client_key), server_key, iterations)


def _parse_attrs(msg: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in msg.split(","):
        if len(part) < 2 or part[1] != "=":
            raise AuthError(f"malformed SCRAM attribute {part!r}")
        out[part[0]] = part[2:]
    return out


class ScramServer:
    """Per-connection server FSM: ``first()`` then ``final()``.

    ``users`` maps username -> ScramCredential.  A nonce can be injected
    for the RFC 7677 golden-vector test; production paths use a fresh
    ``secrets`` nonce per connection.
    """

    def __init__(
        self,
        users: dict[str, ScramCredential],
        nonce: str | None = None,
        decoy_secret: bytes | None = None,
    ) -> None:
        self._users = users
        self._nonce = nonce or secrets.token_urlsafe(18)
        # decoys must be DETERMINISTIC per username (derived from a
        # broker-held RANDOM secret), or repeated probes would expose
        # which usernames exist by whether the salt is stable; the
        # secret must be unpredictable or the decoy salts themselves
        # become recognizable.  Standalone uses get a fresh secret
        # (stable only within this server instance — fine for one
        # connection's exchange); the broker passes its own.
        self._decoy_secret = decoy_secret or secrets.token_bytes(16)
        self._auth_message: bytes | None = None
        self._cred: ScramCredential | None = None
        self.username: str | None = None

    def first(self, client_first: bytes) -> bytes:
        try:
            return self._first(client_first)
        except (KeyError, ValueError, IndexError) as e:
            # malformed frame (bad UTF-8/base64/missing attr) is an
            # AUTH failure answered in-band, not a handler crash
            raise AuthError(f"malformed client-first: {e}") from e

    def _first(self, client_first: bytes) -> bytes:
        text = client_first.decode("utf-8")
        # GS2 header: Kafka clients use no channel binding -> "n,,"
        if not text.startswith("n,"):
            raise AuthError("unsupported GS2 header (channel binding)")
        bare = text.split(",", 2)[2]
        attrs = _parse_attrs(bare)
        if "n" not in attrs or "r" not in attrs:
            raise AuthError("client-first missing n=/r=")
        self.username = saslname_unescape(attrs["n"])
        cred = self._users.get(self.username)
        # unknown user: proceed with a DETERMINISTIC decoy credential
        # and fail at the proof check — stable salt/iterations per
        # username, so repeated probes cannot distinguish existing
        # users (a fresh random decoy would be a two-probe oracle)
        if cred is None:
            name = self.username.encode("utf-8")
            cred = make_scram_credential(
                _hmac(self._decoy_secret, b"pw:" + name).hex(),
                salt=_hmac(self._decoy_secret, b"salt:" + name)[:16],
            )
        self._cred = cred
        self._known = self.username in self._users
        combined = attrs["r"] + self._nonce
        server_first = (
            f"r={combined},"
            f"s={base64.b64encode(self._cred.salt).decode()},"
            f"i={self._cred.iterations}"
        )
        self._client_first_bare = bare
        self._server_first = server_first
        self._combined_nonce = combined
        return server_first.encode("utf-8")

    def final(self, client_final: bytes) -> bytes:
        if self._cred is None:
            raise AuthError("final before first")
        try:
            return self._final(client_final)
        except (KeyError, ValueError, IndexError) as e:
            raise AuthError(f"malformed client-final: {e}") from e

    def _final(self, client_final: bytes) -> bytes:
        text = client_final.decode("utf-8")
        attrs = _parse_attrs(text)
        if attrs.get("c") != base64.b64encode(b"n,,").decode():
            raise AuthError("channel-binding mismatch")
        if attrs.get("r") != self._combined_nonce:
            raise AuthError("nonce mismatch")
        proof = base64.b64decode(attrs["p"])
        without_proof = text[: text.rindex(",p=")]
        auth_message = ",".join(
            [self._client_first_bare, self._server_first, without_proof]
        ).encode("utf-8")
        client_signature = _hmac(self._cred.stored_key, auth_message)
        client_key = _xor(proof, client_signature)
        if not self._known or not hmac.compare_digest(
            _h(client_key), self._cred.stored_key
        ):
            raise AuthError("authentication failed")
        server_signature = _hmac(self._cred.server_key, auth_message)
        return b"v=" + base64.b64encode(server_signature)


class ScramClient:
    """Client half: ``first()`` -> send; ``final(server_first)`` -> send;
    ``verify(server_final)`` checks the server signature (mutual auth)."""

    def __init__(
        self, username: str, password: str, nonce: str | None = None
    ) -> None:
        self._user = username
        self._password = password
        self._nonce = nonce or secrets.token_urlsafe(18)

    def first(self) -> bytes:
        self._client_first_bare = (
            f"n={saslname_escape(self._user)},r={self._nonce}"
        )
        return ("n,," + self._client_first_bare).encode("utf-8")

    def final(self, server_first: bytes) -> bytes:
        text = server_first.decode("utf-8")
        attrs = _parse_attrs(text)
        combined, salt, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not combined.startswith(self._nonce):
            raise AuthError("server nonce does not extend client nonce")
        if iters < MIN_ITERATIONS:
            # RFC 5802 downgrade guard: a MITM on a plaintext channel could
            # otherwise send i=1 and collect a near-free-to-brute-force
            # proof.  4096 is the RFC 7677 SCRAM-SHA-256 minimum.
            raise AuthError(
                f"server iteration count {iters} below minimum {MIN_ITERATIONS}"
            )
        salted = hashlib.pbkdf2_hmac(
            "sha256", self._password.encode("utf-8"),
            base64.b64decode(salt), iters,
        )
        client_key = _hmac(salted, b"Client Key")
        without_proof = (
            f"c={base64.b64encode(b'n,,').decode()},r={combined}"
        )
        auth_message = ",".join(
            [self._client_first_bare, text, without_proof]
        ).encode("utf-8")
        client_signature = _hmac(_h(client_key), auth_message)
        proof = _xor(client_key, client_signature)
        self._server_signature = _hmac(
            _hmac(salted, b"Server Key"), auth_message
        )
        return (
            without_proof + ",p=" + base64.b64encode(proof).decode()
        ).encode("utf-8")

    def verify(self, server_final: bytes) -> None:
        attrs = _parse_attrs(server_final.decode("utf-8"))
        if "e" in attrs:
            raise AuthError(f"server rejected: {attrs['e']}")
        if not hmac.compare_digest(
            base64.b64decode(attrs["v"]), self._server_signature
        ):
            raise AuthError("server signature mismatch (not the real broker)")


# ---------------------------------------------------------------------------
# PLAIN (RFC 4616): one frame, NUL-separated
# ---------------------------------------------------------------------------


def plain_token(username: str, password: str) -> bytes:
    return b"\x00" + username.encode("utf-8") + b"\x00" + password.encode("utf-8")


def plain_check(token: bytes, users: dict[str, str]) -> str:
    parts = token.split(b"\x00")
    if len(parts) != 3:
        raise AuthError("malformed PLAIN token")
    try:
        _authzid, user, password = (p.decode("utf-8") for p in parts)
    except ValueError as e:  # UnicodeDecodeError
        raise AuthError("malformed PLAIN token") from e
    expected = users.get(user)
    if expected is None or not hmac.compare_digest(
        expected.encode(), password.encode()
    ):
        raise AuthError("authentication failed")
    return user


# ---------------------------------------------------------------------------
# option-dict parsing (JVM Kafka source names + librdkafka ssl.ca.location)
# ---------------------------------------------------------------------------


def build_jaas(username: str, password: str) -> str:
    """Emit a ``kafka.sasl.jaas.config`` value for the ScramLoginModule,
    escaping backslashes and double quotes so that credentials containing
    either survive the round-trip through :func:`parse_jaas` (which already
    understands ``\\"`` / ``\\\\`` escapes) byte-identical."""
    esc = lambda v: v.replace("\\", "\\\\").replace('"', '\\"')  # noqa: E731
    return (
        "org.apache.kafka.common.security.scram.ScramLoginModule "
        f'required username="{esc(username)}" password="{esc(password)}";'
    )


def parse_jaas(jaas: str) -> tuple[str, str]:
    """Extract username/password from a JAAS config string — the format
    the JVM source's ``kafka.sasl.jaas.config`` option carries
    (``...ScramLoginModule required username="u" password="p";``)."""
    m_user = re.search(r'username\s*=\s*"((?:[^"\\]|\\.)*)"', jaas)
    m_pass = re.search(r'password\s*=\s*"((?:[^"\\]|\\.)*)"', jaas)
    if not m_user or not m_pass:
        raise ValueError("jaas.config must carry username=\"..\" password=\"..\"")
    unescape = lambda s: re.sub(r"\\(.)", r"\1", s)  # noqa: E731
    return unescape(m_user.group(1)), unescape(m_pass.group(1))


@dataclass(frozen=True)
class ClientSecurity:
    """Picklable connection-security config: travels inside the Spark
    read plan to executor-side fetch tasks."""

    protocol: str = "PLAINTEXT"
    mechanism: str | None = None
    username: str | None = None
    password: str | None = None
    ca_location: str | None = None

    @property
    def use_tls(self) -> bool:
        return self.protocol in ("SSL", "SASL_SSL")

    @property
    def use_sasl(self) -> bool:
        return self.protocol in ("SASL_PLAINTEXT", "SASL_SSL")

    @classmethod
    def from_options(cls, options, opt=None) -> "ClientSecurity":
        """Build from a Kafka source option dict (case-insensitive keys;
        ``opt`` is the caller's accessor when options is Spark's
        lower-cased dict)."""
        if opt is None:
            opt = lambda o, k, d=None: o.get(k.lower(), o.get(k, d))  # noqa: E731
        proto = str(opt(options, "kafka.security.protocol", "PLAINTEXT")).upper()
        if proto not in _PROTOCOLS:
            raise ValueError(
                f"kafka.security.protocol={proto!r}: supported protocols "
                f"are {_PROTOCOLS}"
            )
        mech = opt(options, "kafka.sasl.mechanism")
        jaas = opt(options, "kafka.sasl.jaas.config")
        ca = opt(options, "kafka.ssl.ca.location")
        user = password = None
        if proto.startswith("SASL"):
            mech = str(mech or SCRAM_SHA_256).upper()
            if mech not in SUPPORTED_MECHANISMS:
                raise ValueError(
                    f"kafka.sasl.mechanism={mech!r}: this broker implements "
                    f"{SUPPORTED_MECHANISMS} (GSSAPI/OAUTHBEARER need an "
                    "external Kafka cluster)"
                )
            if not jaas:
                raise ValueError(
                    "SASL requested but kafka.sasl.jaas.config is missing"
                )
            user, password = parse_jaas(str(jaas))
        elif mech or jaas:
            raise ValueError(
                "kafka.sasl.* options require security.protocol "
                "SASL_PLAINTEXT or SASL_SSL"
            )
        return cls(
            protocol=proto,
            mechanism=mech if proto.startswith("SASL") else None,
            username=user,
            password=password,
            ca_location=str(ca) if ca else None,
        )


# ---------------------------------------------------------------------------
# TLS helpers
# ---------------------------------------------------------------------------


def generate_self_signed_cert(directory: str) -> tuple[str, str]:
    """Write a self-signed RSA cert + key PEM pair for 127.0.0.1 /
    localhost into ``directory``; returns (cert_path, key_path).  Uses
    the `cryptography` package (baked into the container)."""
    import datetime
    import ipaddress
    import os

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "supermusr-minibroker")]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=7))
        .add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName("localhost"),
                    x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
                ]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_path = os.path.join(directory, "broker.crt")
    key_path = os.path.join(directory, "broker.key")
    with open(cert_path, "wb") as fh:
        fh.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as fh:
        fh.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            )
        )
    return cert_path, key_path


def generate_cluster_ca(directory: str) -> tuple[str, str]:
    """Write a CA cert + key PEM pair into ``directory``; returns
    (ca_cert_path, ca_key_path).  A multi-broker cluster issues each
    broker its OWN leaf cert chained to this CA (the real deployment
    shape: clients and replica fetchers trust the CA, one broker's key
    cannot impersonate another), instead of sharing one self-signed
    cert across every listener."""
    import datetime
    import os

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "supermusr-minicluster-ca")]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=7))
        .add_extension(
            x509.BasicConstraints(ca=True, path_length=0), critical=True
        )
        .sign(key, hashes.SHA256())
    )
    ca_cert = os.path.join(directory, "cluster-ca.crt")
    ca_key = os.path.join(directory, "cluster-ca.key")
    with open(ca_cert, "wb") as fh:
        fh.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(ca_key, "wb") as fh:
        fh.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            )
        )
    return ca_cert, ca_key


def generate_broker_cert(
    directory: str, ca_cert_path: str, ca_key_path: str, node_id: int
) -> tuple[str, str]:
    """Issue one broker's leaf cert (CN ``broker-<id>``, SANs for the
    loopback listeners) signed by the cluster CA; returns
    (cert_path, key_path).  The served chain includes the CA cert so a
    client trusting only the CA verifies the leaf."""
    import datetime
    import ipaddress
    import os

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    with open(ca_cert_path, "rb") as fh:
        ca_cert = x509.load_pem_x509_certificate(fh.read())
    with open(ca_key_path, "rb") as fh:
        ca_key = serialization.load_pem_private_key(fh.read(), password=None)
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(
            x509.Name(
                [x509.NameAttribute(NameOID.COMMON_NAME, f"broker-{node_id}")]
            )
        )
        .issuer_name(ca_cert.subject)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=7))
        .add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName("localhost"),
                    x509.DNSName(f"broker-{node_id}"),
                    x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
                ]
            ),
            critical=False,
        )
        .sign(ca_key, hashes.SHA256())
    )
    cert_path = os.path.join(directory, f"broker-{node_id}.crt")
    key_path = os.path.join(directory, f"broker-{node_id}.key")
    with open(cert_path, "wb") as fh:
        fh.write(cert.public_bytes(serialization.Encoding.PEM))
        # append the CA: load_cert_chain serves leaf + chain
        fh.write(ca_cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as fh:
        fh.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            )
        )
    return cert_path, key_path


def server_ssl_context(cert_path: str, key_path: str):
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_path, key_path)
    return ctx


def client_ssl_context(ca_location: str):
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(ca_location)
    ctx.check_hostname = True
    ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx
