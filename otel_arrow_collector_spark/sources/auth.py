"""Pluggable server authenticators — the reference's ``auth.Server``
extension point (extension/auth/server.go:18-29: an Extension whose
``Authenticate(headers) -> (ctx, err)`` is called by receivers, with
the principal/identity threaded into the request context) plus the
``configauth`` name-based resolution (config/configauth/configauth.go:
24-40: receivers reference an authenticator *by name*; unknown names
fail resolution).

Spark-side shape: an authenticator maps a lower-cased header dict to a
**principal string**; failure raises :class:`AuthenticationError` and
the receiver answers 401 (HTTP) / UNAUTHENTICATED (gRPC) without
retry, exactly the server.go contract.  The returned principal lands
in the spool's ``client_principal`` column, so downstream operators
(metadata-sharded batching, tenancy routing) see the identity as a
first-class column — the reference's "other components make decisions
based on that data" clause, expressed relationally.

Receivers accept ``authenticator=`` as an instance, a bare callable
(``headers -> principal``, the ServerAuthenticateFunc convenience of
server.go:42-50), or a registered name (the configauth path).  The
legacy ``token=`` knob is now sugar for a named
:class:`BearerTokenAuthenticator` with identical behavior.
"""

from __future__ import annotations

import threading
from collections.abc import Callable


class AuthenticationError(Exception):
    """Authentication failed — the caller must not retry
    (server.go:21-22)."""


class ServerAuthenticator:
    """Base authenticator: override :meth:`authenticate`.

    ``start``/``shutdown`` mirror the Extension lifecycle hooks
    (server.go:31-36 defaultServer embeds StartFunc/ShutdownFunc); the
    defaults are no-ops, as in the reference.
    """

    def authenticate(self, headers: dict[str, str]) -> str:
        """Validate ``headers`` (lower-cased names); return the
        authenticated principal or raise :class:`AuthenticationError`."""
        raise NotImplementedError

    def start(self) -> None:                     # pragma: no cover
        pass

    def shutdown(self) -> None:                  # pragma: no cover
        pass


class FuncAuthenticator(ServerAuthenticator):
    """Wrap a bare ``headers -> principal`` callable
    (ServerAuthenticateFunc, server.go:42-50)."""

    def __init__(self, fn: Callable[[dict[str, str]], str]):
        self._fn = fn

    def authenticate(self, headers: dict[str, str]) -> str:
        return self._fn(headers)


class BearerTokenAuthenticator(ServerAuthenticator):
    """Static bearer-token check — the behavior both receivers
    previously hardcoded, now one authenticator among many."""

    def __init__(self, token: str, principal: str = "bearer"):
        self.token = token
        self.principal = principal

    def authenticate(self, headers: dict[str, str]) -> str:
        if headers.get("authorization", "") != f"Bearer {self.token}":
            raise AuthenticationError("unauthenticated")
        return self.principal


# -- client side (extension/auth/client.go:18-26) ---------------------------

class ClientAuthenticator:
    """Client authenticator: produces the auth metadata an exporter
    attaches to outgoing requests — the Spark-side analogue of both
    ``RoundTripper`` (HTTP header injection) and ``PerRPCCredentials``
    (gRPC call metadata), which in this engine are the same thing: a
    headers dict evaluated per request (so rotating credentials work).
    Instances must pickle: exporters call :meth:`auth_headers` inside
    executor tasks."""

    def auth_headers(self) -> dict[str, str]:
        raise NotImplementedError

    def start(self) -> None:                 # pragma: no cover
        pass

    def shutdown(self) -> None:              # pragma: no cover
        pass


class FuncClientAuthenticator(ClientAuthenticator):
    """Wrap a bare ``() -> headers`` callable
    (ClientRoundTripperFunc / ClientPerRPCCredentialsFunc,
    client.go:31-49)."""

    def __init__(self, fn: Callable[[], dict[str, str]]):
        self._fn = fn

    def auth_headers(self) -> dict[str, str]:
        return dict(self._fn())


class BearerTokenClientAuthenticator(ClientAuthenticator):
    """Static bearer token on every outgoing request — the client half
    of :class:`BearerTokenAuthenticator`."""

    def __init__(self, token: str):
        self.token = token

    def auth_headers(self) -> dict[str, str]:
        return {"authorization": f"Bearer {self.token}"}


# -- name-based registry (configauth.go:31-40) ------------------------------
#
# One registry holds both kinds, like the reference's extensions map;
# resolution type-checks (errNotServer / errNotClient, configauth.go).

_REGISTRY: dict[str, object] = {}
_LOCK = threading.Lock()


def register_authenticator(name: str, auth):
    """Register a named authenticator (server or client instance, or a
    bare ``headers -> principal`` callable, coerced server-side);
    duplicate names error (the extension-id uniqueness rule)."""
    if not isinstance(auth, (ServerAuthenticator, ClientAuthenticator)):
        auth = _coerce(auth)
    with _LOCK:
        if name in _REGISTRY:
            raise ValueError(f"authenticator {name!r} already registered")
        _REGISTRY[name] = auth
    return auth


def unregister_authenticator(name: str) -> None:
    with _LOCK:
        _REGISTRY.pop(name, None)


def _coerce(auth) -> ServerAuthenticator:
    if isinstance(auth, ServerAuthenticator):
        return auth
    if callable(auth):
        return FuncAuthenticator(auth)
    raise TypeError(f"not an authenticator: {auth!r}")


def _lookup(name: str):
    with _LOCK:
        a = _REGISTRY.get(name)
    if a is None:
        raise ValueError(f"failed to resolve authenticator {name!r}: "
                         f"authenticator not found")
    return a


def resolve_authenticator(spec, token: str | None = None):
    """Resolve a receiver's auth config to a server authenticator or
    None.

    ``spec`` may be: None (fall back to ``token`` sugar), a registered
    name (configauth.GetServerAuthenticator — unknown names raise, a
    client-only registration raises the errNotServer analogue), an
    authenticator instance, or a bare callable.
    """
    if spec is None:
        if token is not None:
            return BearerTokenAuthenticator(token)
        return None
    if isinstance(spec, str):
        a = _lookup(spec)
        if not isinstance(a, ServerAuthenticator):
            raise ValueError(f"requested authenticator {spec!r} is not "
                             f"a server authenticator")
        return a
    return _coerce(spec)


def resolve_client_authenticator(spec, token: str | None = None):
    """Resolve an exporter's auth config to a client authenticator or
    None (configauth.GetClientAuthenticator; errNotClient on a
    server-only registration).  A bare ``() -> headers`` callable is
    coerced."""
    if spec is None:
        if token is not None:
            return BearerTokenClientAuthenticator(token)
        return None
    if isinstance(spec, str):
        a = _lookup(spec)
        if not isinstance(a, ClientAuthenticator):
            raise ValueError(f"requested authenticator {spec!r} is not "
                             f"a client authenticator")
        return a
    if isinstance(spec, ClientAuthenticator):
        return spec
    if callable(spec):
        return FuncClientAuthenticator(spec)
    raise TypeError(f"not a client authenticator: {spec!r}")
