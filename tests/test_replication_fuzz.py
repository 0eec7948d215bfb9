"""Randomized permutation fuzz of the replication TLS/auth matrix
(VERDICT r6 next #7): the r5/r6 reviews kept finding real bugs in exactly
this code (the NUL-strip nonce bug, the vacuous refusal assert), so sweep
the cross product the directed tests sample only pointwise —

    announced plugin x ssl mode x sha2 fast/full x auth-switch target
    x success/deny outcome x scramble edge bytes (0x00 anywhere,
    including the trailing byte the server's NUL pad sits behind)
    x password shape (empty, high-unicode, NUL-adjacent lengths)

— against a fake server that VALIDATES each token exactly the way the
real server does (stage2 double-hash for native, stored-digest compare
for sha2 fast, RSA-OAEP decrypt + nonce unmask for sha2 full, cleartext
compare over TLS). Every permutation must end in either an authenticated
dump of the same 4 decoded changes or a clean 1045 ServerError — never a
hang, desync, or mis-derived scramble."""

from __future__ import annotations

import hashlib
import socket
import struct
import threading

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_rs_spark.streaming.replication import (
    BinlogReplicationClient,
    ReplicationConfig,
    ServerError,
)
from tests.test_replication import (
    RSA_D,
    RSA_N,
    RSA_PEM,
    FakeServer,
    _dump_events,
    _rsa_oaep_decrypt,
)

NATIVE = b"mysql_native_password"
SHA2 = b"caching_sha2_password"


def _native_ok(token: bytes, nonce: bytes, password: str) -> bool:
    """The real server's check from its stored stage2 = SHA1(SHA1(pwd))."""
    if not password:
        return token == b""
    stage2 = hashlib.sha1(hashlib.sha1(password.encode()).digest()).digest()
    mask = hashlib.sha1(nonce + stage2).digest()
    stage1 = bytes(a ^ b for a, b in zip(token, mask))
    return len(token) == 20 and hashlib.sha1(stage1).digest() == stage2


def _sha2_fast_ok(token: bytes, nonce: bytes, password: str) -> bool:
    if not password:
        return token == b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + nonce).digest()
    return token == bytes(a ^ b for a, b in zip(h1, h3))


class PermutedServer(FakeServer):
    """One scripted session over a drawn point of the auth matrix."""

    def __init__(self, sock, events, *, nonce1, nonce2, plugin, sha2_mode,
                 switch_to, password, **kw):
        super().__init__(sock, events, **kw)
        self.nonce1 = nonce1
        self.nonce2 = nonce2
        self.plugin = plugin  # announced in the handshake
        self.sha2_mode = sha2_mode  # "fast" | "full"
        self.switch_to = switch_to  # None | plugin bytes
        self.password = password  # what the account's stored digest is for
        self.switch_nonce = b"A" * 20  # fresh nonce on AuthSwitchRequest

    def handshake_payload(self) -> bytes:
        caps = 0x00008000 | 0x00000200 | 0x00080000
        if self.certfile:
            caps |= 0x00000800
        p = bytes([0x0A]) + b"8.0.99-fuzz\x00"
        p += struct.pack("<I", 7)
        p += self.nonce1 + b"\x00"
        p += struct.pack("<H", caps & 0xFFFF)
        p += bytes([0x21]) + struct.pack("<H", 2)
        p += struct.pack("<H", caps >> 16)
        p += bytes([21])  # 8 + 12 + NUL
        p += bytes(10)
        p += self.nonce2 + b"\x00"  # the pad NUL sits after the scramble
        p += self.plugin + b"\x00"
        return p

    def _deny(self) -> bool:
        self.send_packet(
            b"\xff" + struct.pack("<H", 1045) + b"#28000Access denied"
        )
        return False

    def _settle(self, plugin: bytes, token: bytes, nonce: bytes) -> bool:
        """Validate a scrambled token (or run sha2 full auth) against the
        stored password, exactly once, on the current channel."""
        if plugin == NATIVE:
            if not _native_ok(token, nonce, self.password):
                return self._deny()
            self.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")
            return True
        assert plugin == SHA2, plugin
        if self.sha2_mode == "fast":
            if not _sha2_fast_ok(token, nonce, self.password):
                return self._deny()
            self.send_packet(b"\x01\x03")
            self.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")
            return True
        # full auth (cache miss)
        self.send_packet(b"\x01\x04")
        req = self.read_packet()
        self.received.append(req)
        if req == b"\x02":
            assert not self.tls_negotiated, "RSA request over TLS"
            self.send_packet(b"\x01" + RSA_PEM)
            ct = self.read_packet()
            self.received.append(ct)
            masked = _rsa_oaep_decrypt(ct, RSA_N, RSA_D)
            pwd = bytes(
                b ^ nonce[i % len(nonce)] for i, b in enumerate(masked)
            )
        else:
            assert self.tls_negotiated, "cleartext password on plain socket"
            pwd = req
        if pwd != self.password.encode() + b"\x00":
            return self._deny()
        self.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")
        return True

    def authenticate(self) -> bool:
        resp = self.read_auth_response()
        self.received.append(resp)
        user, token = self.parse_user_token(resp)
        if user != "repl":
            return self._deny()
        assert self.plugin + b"\x00" in resp  # client echoes the plugin
        if self.switch_to is not None:
            self.send_packet(
                b"\xfe" + self.switch_to + b"\x00" + self.switch_nonce
                + b"\x00"
            )
            token = self.read_packet()
            self.received.append(token)
            return self._settle(self.switch_to, token, self.switch_nonce)
        return self._settle(self.plugin, token, self.nonce1 + self.nonce2)


# passwords: empty, ASCII, unicode, and lengths that straddle hash-block
# boundaries; capped so the RSA-OAEP message always fits the test key
_passwords = st.one_of(
    st.just(""),
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF),
        min_size=1,
        max_size=24,
    ),
)

_matrix = st.fixed_dictionaries(
    {
        "nonce1": st.binary(min_size=8, max_size=8),
        "nonce2": st.binary(min_size=12, max_size=12),
        "plugin": st.sampled_from([NATIVE, SHA2]),
        "sha2_mode": st.sampled_from(["fast", "full"]),
        "switch": st.sampled_from([None, NATIVE, SHA2]),
        "tls": st.booleans(),
        "password": _passwords,
        "deny": st.booleans(),
    }
)


@pytest.fixture(scope="module")
def maybe_tls_cert(tmp_path_factory):
    import shutil
    import subprocess

    if shutil.which("openssl") is None:
        return None
    d = tmp_path_factory.mktemp("fuzztls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", key, "-out", cert, "-days", "2", "-nodes",
            "-subj", "/CN=fuzz-mysql",
        ],
        check=True, capture_output=True,
    )
    return cert, key


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(m=_matrix)
def test_auth_matrix_always_authenticates_or_cleanly_denies(
    m, maybe_tls_cert
):
    use_tls = m["tls"] and maybe_tls_cert is not None
    # sha2 full-auth with an EMPTY password never reaches the full leg:
    # the empty fast token is accepted outright (matches the real server,
    # which OKs empty-password accounts before the cache is consulted)
    sha2_mode = m["sha2_mode"]
    effective_plugin = m["switch"] or m["plugin"]
    if m["password"] == "" and effective_plugin == SHA2:
        sha2_mode = "fast"
    server_pwd = m["password"] if not m["deny"] else m["password"] + "x"
    server_sock, client_sock = socket.socketpair()
    kw = {}
    if use_tls:
        kw["certfile"], kw["keyfile"] = maybe_tls_cert
    server = PermutedServer(
        server_sock,
        _dump_events(False),
        nonce1=m["nonce1"],
        nonce2=m["nonce2"],
        plugin=m["plugin"],
        sha2_mode=sha2_mode,
        switch_to=m["switch"],
        password=server_pwd,
        **kw,
    )
    t = threading.Thread(target=server.run, daemon=True)
    t.start()
    client = BinlogReplicationClient(
        ReplicationConfig(
            user="repl", password=m["password"], server_id=42,
            filename="bin.000007", non_block=True,
            ssl_mode="required" if use_tls else "disabled",
        )
    )
    try:
        if m["deny"]:
            with pytest.raises(ServerError, match="Access denied"):
                client.connect(sock=client_sock)
                list(client.stream_changes())
        else:
            client.connect(sock=client_sock)
            changes = list(client.stream_changes())
            assert [c["op"] for c in changes] == [
                "Insert", "Insert", "SchemaChange", "Update",
            ]
            if use_tls:
                assert server.tls_negotiated is True
                # over TLS, sha2 full auth must NEVER run the RSA leg
                assert b"\x02" not in server.received[1:]
    finally:
        client_sock.close()
        t.join(timeout=10)
    assert server.error is None, server.error
