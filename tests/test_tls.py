"""TLS for the live OTLP/HTTP pair (config/configtls surface): server
cert, CA-verified client, mTLS client certs, and the failure taxonomy —
a TLS trust failure is PERMANENT (misconfig), an auth failure is HTTP 401,
and the two are distinguishable."""

from __future__ import annotations

import datetime

import pytest

cryptography = pytest.importorskip("cryptography")

from cryptography import x509                              # noqa: E402
from cryptography.hazmat.primitives import hashes, serialization  # noqa: E402
from cryptography.hazmat.primitives.asymmetric import rsa  # noqa: E402
from cryptography.x509.oid import NameOID                  # noqa: E402

from otel_arrow_collector_spark.exporters.http_exporter import (  # noqa: E402
    export_http_now)
from otel_arrow_collector_spark.exporters.retry import (  # noqa: E402
    PermanentError, RetryConfig, TransientError)

#: handshake refusals surface as transient transport errors; keep the
#: retry loop short so the negative tests don't sit in backoff
_FAST = RetryConfig(initial_interval_s=0.05, max_elapsed_s=0.3)
from otel_arrow_collector_spark.model import generate_traces  # noqa: E402
from otel_arrow_collector_spark.sources.http_receiver import (  # noqa: E402
    OtlpHttpReceiver, read_spool)
from otel_arrow_collector_spark.tls import TLSConfig      # noqa: E402


def _make_cert(tmp, name, *, ca=None, is_ca=False, ip_san=True):
    """Self-signed (or `ca`-signed) RSA cert; returns (cert_pem, key_pem)."""
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    subject = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, name)])
    issuer_cert, issuer_key = (ca if ca is not None else (None, key))
    issuer = issuer_cert.subject if issuer_cert is not None else subject
    now = datetime.datetime.now(datetime.timezone.utc)
    b = (x509.CertificateBuilder()
         .subject_name(subject).issuer_name(issuer)
         .public_key(key.public_key())
         .serial_number(x509.random_serial_number())
         .not_valid_before(now - datetime.timedelta(minutes=5))
         .not_valid_after(now + datetime.timedelta(days=1))
         .add_extension(x509.BasicConstraints(ca=is_ca, path_length=None),
                        critical=True))
    if ip_san:
        import ipaddress
        b = b.add_extension(x509.SubjectAlternativeName(
            [x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
             x509.DNSName("localhost")]), critical=False)
    cert = b.sign(issuer_key, hashes.SHA256())
    cert_pem = tmp / f"{name}.crt"
    key_pem = tmp / f"{name}.key"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return (cert, key), cert_pem, key_pem


@pytest.fixture(scope="module")
def pki(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pki")
    ca_pair, ca_crt, ca_key = _make_cert(tmp, "test-ca", is_ca=True,
                                         ip_san=False)
    _, srv_crt, srv_key = _make_cert(tmp, "server", ca=ca_pair)
    _, cli_crt, cli_key = _make_cert(tmp, "client", ca=ca_pair)
    rogue_pair, rogue_ca_crt, _ = _make_cert(tmp, "rogue-ca", is_ca=True,
                                             ip_san=False)
    _, rogue_crt, rogue_key = _make_cert(tmp, "rogue", ca=rogue_pair)
    return {"ca": str(ca_crt), "srv_crt": str(srv_crt),
            "srv_key": str(srv_key), "cli_crt": str(cli_crt),
            "cli_key": str(cli_key), "rogue_ca": str(rogue_ca_crt),
            "rogue_crt": str(rogue_crt), "rogue_key": str(rogue_key)}


def _tls_rcv(tmp_path, pki, **kw):
    r = OtlpHttpReceiver(
        str(tmp_path / "spool"),
        tls=TLSConfig(cert_file=pki["srv_crt"], key_file=pki["srv_key"],
                      **kw.pop("tls_kw", {})), **kw)
    r.start()
    return r


def test_https_roundtrip(spark, tmp_path, pki):
    """Exporter -> TLS receiver with a CA-verified server cert: data lands
    in the spool and reads back through Spark."""
    rcv = _tls_rcv(tmp_path, pki)
    try:
        assert rcv.endpoint.startswith("https://")
        df = generate_traces(spark, 8)
        res = export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                              tls=TLSConfig(ca_file=pki["ca"]))
        assert res["rows_sent"] == 8
        assert rcv.read_spool(spark, "traces").count() == 8
    finally:
        rcv.stop()


def test_https_untrusted_ca_is_permanent_not_401(spark, tmp_path, pki):
    """A client that does not trust the server's CA fails PERMANENTLY with
    a TLS-verification error — distinguishable from an HTTP 401 (which
    requires a completed handshake)."""
    rcv = _tls_rcv(tmp_path, pki, token="sekrit")
    try:
        df = generate_traces(spark, 1)
        # default trust roots do not include the test CA
        with pytest.raises(Exception, match="TLS verification failed"):
            export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                            tls=TLSConfig())
        # same endpoint, trusted CA but bad token: handshake completes,
        # the refusal is HTTP 401 — a different, auth-shaped error
        with pytest.raises(Exception, match="HTTP 401"):
            export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                            token="wrong",
                            tls=TLSConfig(ca_file=pki["ca"]))
        assert rcv.counters.get("refused_tls_handshake", 0) >= 1
        assert rcv.counters.get("refused_unauth_traces", 0) >= 1
    finally:
        rcv.stop()


def test_https_mtls_client_certs(spark, tmp_path, pki):
    """client_ca_file turns on mTLS: a client WITHOUT a cert (or with one
    from the wrong CA) is refused at handshake; the right cert passes."""
    rcv = _tls_rcv(tmp_path, pki, tls_kw={"client_ca_file": pki["ca"]})
    try:
        df = generate_traces(spark, 2)
        with pytest.raises(Exception):       # no client cert -> handshake fails
            export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                            retry_config=_FAST,
                            tls=TLSConfig(ca_file=pki["ca"]))
        with pytest.raises(Exception):       # wrong-CA client cert
            export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                            retry_config=_FAST,
                            tls=TLSConfig(ca_file=pki["ca"],
                                          cert_file=pki["rogue_crt"],
                                          key_file=pki["rogue_key"]))
        res = export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                              tls=TLSConfig(ca_file=pki["ca"],
                                            cert_file=pki["cli_crt"],
                                            key_file=pki["cli_key"]))
        assert res["rows_sent"] == 2
        assert rcv.read_spool(spark, "traces").count() == 2
    finally:
        rcv.stop()


def test_insecure_skip_verify(spark, tmp_path, pki):
    """insecure_skip_verify accepts any server cert (configtls
    TLSClientSetting.InsecureSkipVerify) — for dev loops only."""
    rcv = _tls_rcv(tmp_path, pki)
    try:
        df = generate_traces(spark, 1)
        res = export_http_now(df.coalesce(1), rcv.endpoint, "traces",
                              tls=TLSConfig(insecure_skip_verify=True))
        assert res["rows_sent"] == 1
    finally:
        rcv.stop()
