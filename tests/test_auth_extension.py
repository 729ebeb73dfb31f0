"""Pluggable server authenticators (reference extension/auth/server.go:
18-29 + config/configauth name resolution), exercised on LIVE sockets:
a custom authenticator maps headers -> principal (mTLS-style identity
mapping), failures answer 401 / UNAUTHENTICATED without spooling, and
the returned principal lands in the client_principal column — the
authtest/MockServer shape against real receivers.
"""

import http.client

import pytest

from otel_arrow_collector_spark.exporters.grpc_exporter import (
    GrpcCallError, grpc_call)
from otel_arrow_collector_spark.model import generate_traces
from otel_arrow_collector_spark.sources.auth import (
    AuthenticationError, BearerTokenAuthenticator, FuncAuthenticator,
    register_authenticator, resolve_authenticator,
    unregister_authenticator)
from otel_arrow_collector_spark.sources.grpc_receiver import OtlpGrpcReceiver
from otel_arrow_collector_spark.sources.http_receiver import OtlpHttpReceiver
from otel_arrow_collector_spark.sources.otlp_pb import encode_request

TRACES_PATH = "/opentelemetry.proto.collector.trace.v1.TraceService/Export"


def _body(spark, n=2):
    rows = [r.asDict(recursive=True)
            for r in generate_traces(spark, n).collect()]
    return encode_request(rows, "traces")


def _tenant_auth(headers: dict[str, str]) -> str:
    """OIDC/mTLS-style custom authenticator: derive the principal from
    a client-supplied identity header, reject unknown tenants."""
    tenant = headers.get("x-tenant", "")
    if tenant not in ("acme", "globex"):
        raise AuthenticationError(f"unknown tenant {tenant!r}")
    return f"tenant:{tenant}"


# -- unit surface -----------------------------------------------------------

def test_bearer_authenticator_contract():
    a = BearerTokenAuthenticator("tok")
    assert a.authenticate({"authorization": "Bearer tok"}) == "bearer"
    with pytest.raises(AuthenticationError):
        a.authenticate({"authorization": "Bearer wrong"})
    with pytest.raises(AuthenticationError):
        a.authenticate({})


def test_registry_resolution():
    register_authenticator("t-auth", _tenant_auth)
    try:
        a = resolve_authenticator("t-auth")
        assert a.authenticate({"x-tenant": "acme"}) == "tenant:acme"
        with pytest.raises(ValueError, match="already registered"):
            register_authenticator("t-auth", _tenant_auth)
    finally:
        unregister_authenticator("t-auth")
    with pytest.raises(ValueError, match="not found"):
        resolve_authenticator("t-auth")
    # token sugar and callable coercion
    assert isinstance(resolve_authenticator(None, "tok"),
                      BearerTokenAuthenticator)
    assert resolve_authenticator(None) is None
    assert isinstance(resolve_authenticator(_tenant_auth),
                      FuncAuthenticator)


# -- live HTTP --------------------------------------------------------------

def test_http_custom_authenticator_live(spark, tmp_path):
    r = OtlpHttpReceiver(str(tmp_path / "spool"),
                         authenticator=_tenant_auth,
                         record_client_info=True)
    host, port = r.start()
    try:
        body = _body(spark)

        def post(hdrs):
            conn = http.client.HTTPConnection(host, port, timeout=10)
            conn.request("POST", "/v1/traces", body,
                         {"Content-Type": "application/x-protobuf",
                          **hdrs})
            st = conn.getresponse().status
            conn.close()
            return st

        assert post({"X-Tenant": "acme"}) == 200
        assert post({"X-Tenant": "intruder"}) == 401
        assert post({}) == 401
        assert r.counters.get("refused_unauth_traces") == 2
        df = r.read_spool(spark, "traces", client_info=True)
        # only the authenticated request spooled; custom principal column
        assert {x.client_principal for x in
                df.select("client_principal").collect()} == {"tenant:acme"}
    finally:
        r.stop()


# -- live gRPC --------------------------------------------------------------

def test_grpc_custom_authenticator_live(spark, tmp_path):
    register_authenticator("grpc-tenant", _tenant_auth)
    try:
        r = OtlpGrpcReceiver(str(tmp_path / "spool"),
                             authenticator="grpc-tenant",
                             record_client_info=True)
        host, port = r.start()
        try:
            body = _body(spark)
            grpc_call(host, port, TRACES_PATH, body,
                      metadata={"x-tenant": "globex"})     # no raise = OK
            with pytest.raises(GrpcCallError) as ei:
                grpc_call(host, port, TRACES_PATH, body,
                          metadata={"x-tenant": "intruder"})
            assert ei.value.status == 16   # UNAUTHENTICATED
            df = r.read_spool(spark, "traces", client_info=True)
            assert {x.client_principal for x in
                    df.select("client_principal").collect()} \
                == {"tenant:globex"}
        finally:
            r.stop()
    finally:
        unregister_authenticator("grpc-tenant")


# -- client side (extension/auth/client.go) ---------------------------------

def test_client_authenticator_resolution():
    from otel_arrow_collector_spark.sources.auth import (
        BearerTokenClientAuthenticator, FuncClientAuthenticator,
        resolve_client_authenticator)
    a = resolve_client_authenticator(None, "tok")
    assert isinstance(a, BearerTokenClientAuthenticator)
    assert a.auth_headers() == {"authorization": "Bearer tok"}
    f = resolve_client_authenticator(lambda: {"x-tenant": "acme"})
    assert isinstance(f, FuncClientAuthenticator)
    assert f.auth_headers() == {"x-tenant": "acme"}
    assert resolve_client_authenticator(None) is None
    # errNotClient: a server-only registration cannot serve as client
    register_authenticator("srv-only", _tenant_auth)
    try:
        with pytest.raises(ValueError, match="not a client"):
            resolve_client_authenticator("srv-only")
        with pytest.raises(ValueError, match="not found"):
            resolve_client_authenticator("no-such")
    finally:
        unregister_authenticator("srv-only")
    # errNotServer: a client registration cannot serve as server
    from otel_arrow_collector_spark.sources.auth import (
        resolve_authenticator)
    register_authenticator("cli-only",
                           BearerTokenClientAuthenticator("t"))
    try:
        with pytest.raises(ValueError, match="not a server"):
            resolve_authenticator("cli-only")
        assert resolve_client_authenticator("cli-only").auth_headers() \
            == {"authorization": "Bearer t"}
    finally:
        unregister_authenticator("cli-only")


def test_exporter_client_auth_end_to_end(spark, tmp_path):
    """Full configauth loop on live sockets: the receiver requires a
    custom server authenticator; the exporter's client authenticator
    injects the matching identity headers on every executor-side
    request.  Without it the export fails permanent."""
    from otel_arrow_collector_spark.exporters.http_exporter import (
        export_http_now)
    from otel_arrow_collector_spark.exporters.retry import (
        PermanentError, RetryConfig)
    from otel_arrow_collector_spark.model import generate_traces

    r = OtlpHttpReceiver(str(tmp_path / "spool"),
                         authenticator=_tenant_auth,
                         record_client_info=True)
    host, port = r.start()
    try:
        df = generate_traces(spark, 6).repartition(2)
        out = export_http_now(
            df, f"http://{host}:{port}", "traces",
            # inline lambda: cloudpickle ships it by value into the
            # executor closure (a test-module def would not import
            # on the worker)
            authenticator=lambda: {"x-tenant": "acme"},
            retry_config=RetryConfig(enabled=False))
        assert out["rows_sent"] == 6
        spooled = r.read_spool(spark, "traces", client_info=True)
        assert {x.client_principal for x in
                spooled.select("client_principal").collect()} \
            == {"tenant:acme"}
        # no client auth -> 401 -> permanent failure in the retry chain
        with pytest.raises(Exception) as ei:
            export_http_now(df, f"http://{host}:{port}", "traces",
                            retry_config=RetryConfig(enabled=False))
        assert "PermanentError" in str(ei.getrepr()) \
            or isinstance(ei.value, PermanentError)
    finally:
        r.stop()
