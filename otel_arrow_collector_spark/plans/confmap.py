"""Config resolution — the reference's confmap layer
(confmap/resolver.go:117-158): config URIs are fetched by scheme
providers, merged left-to-right, and ``${scheme:uri}`` references inside
values are expanded recursively before unmarshalling.

Providers mirrored (each is a tiny function, registered by scheme):
- ``file:``  read a YAML file (confmap/provider/fileprovider/provider.go:17)
- ``env:``   read an environment variable, parsed as YAML scalar/doc
  (confmap/provider/envprovider)
- ``yaml:``  inline YAML document (confmap/provider/yamlprovider)
- ``http:`` / ``https:``  GET a YAML config from a URL; non-2xx is a
  ResolveError (confmap/provider/httpprovider/provider.go,
  httpsprovider/provider.go)

Semantics honored from the reference:
- merge: later URIs override earlier ones key-by-key, maps merged deep
  (confmap.Conf.Merge)
- expansion is recursive — an expanded value may itself contain
  ``${...}`` (resolver.go:140-151) — with a depth guard against cycles
- a bare ``${VAR}`` (no scheme) defaults to the env provider
  (resolver expandConverter behavior)
- unknown schemes raise (resolver.go errors on missing provider)
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

import yaml

_REF = re.compile(r"\$\{([a-zA-Z][a-zA-Z0-9+.-]*:)?([^${}]+)\}")
_MAX_DEPTH = 100


class ResolveError(ValueError):
    """Unknown scheme, missing file/env var, or expansion cycle."""


def _load_yaml(text: str, what: str):
    """safe_load fenced to the ResolveError contract: malformed YAML in
    ANY provider surfaces as the typed config error, never a raw
    yaml.ParserError/ScannerError out of the resolver."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ResolveError(f"{what}: invalid YAML: {e}") from e


def _file_provider(uri: str):
    try:
        with open(uri, encoding="utf-8") as f:
            return _load_yaml(f.read(), f"file provider {uri!r}")
    except OSError as e:
        raise ResolveError(f"file provider: cannot read {uri!r}: {e}") from e


def _env_provider(uri: str):
    if uri not in os.environ:
        raise ResolveError(f"env provider: ${uri} is not set")
    return _load_yaml(os.environ[uri], f"env provider ${uri}")


def _yaml_provider(uri: str):
    return _load_yaml(uri, "yaml provider")


def _http_provider_for(scheme: str) -> Callable[[str], object]:
    """GET a YAML document over HTTP(S) (httpprovider/provider.go: fetch,
    reject non-2xx, unmarshal YAML).  ``uri`` arrives scheme-stripped
    (``//host:port/path``) and is reassembled here."""
    def fetch(uri: str):
        import urllib.error
        import urllib.request
        url = f"{scheme}:{uri}"
        try:
            with urllib.request.urlopen(url, timeout=30) as resp:
                status = getattr(resp, "status", 200)
                body = resp.read()
        except urllib.error.HTTPError as e:
            raise ResolveError(
                f"{scheme} provider: GET {url} returned HTTP {e.code}") from e
        except (urllib.error.URLError, OSError) as e:
            raise ResolveError(
                f"{scheme} provider: cannot fetch {url}: {e}") from e
        if not 200 <= status < 300:
            raise ResolveError(
                f"{scheme} provider: GET {url} returned HTTP {status}")
        try:
            return yaml.safe_load(body.decode("utf-8"))
        except (UnicodeDecodeError, yaml.YAMLError) as e:
            raise ResolveError(
                f"{scheme} provider: {url} is not valid YAML: {e}") from e
    return fetch


PROVIDERS: dict[str, Callable[[str], object]] = {
    "file": _file_provider,
    "env": _env_provider,
    "yaml": _yaml_provider,
    "http": _http_provider_for("http"),
    "https": _http_provider_for("https"),
}


def _fetch(scheme: str, uri: str):
    if scheme not in PROVIDERS:
        raise ResolveError(f"no provider registered for scheme {scheme!r}")
    return PROVIDERS[scheme](uri)


def _expand_str(s: str, depth: int):
    if depth > _MAX_DEPTH:
        raise ResolveError("expansion depth exceeded (reference cycle?)")
    m = _REF.fullmatch(s)
    if m:   # whole-string reference: keep the provider's native type
        scheme = (m.group(1) or "env:")[:-1]
        return _expand(_fetch(scheme, m.group(2)), depth + 1)

    def sub(mm: re.Match) -> str:
        scheme = (mm.group(1) or "env:")[:-1]
        v = _expand(_fetch(scheme, mm.group(2)), depth + 1)
        return "" if v is None else str(v)
    out = _REF.sub(sub, s)
    return _expand(out, depth + 1) if _REF.search(out) else out


def _expand(node, depth: int = 0):
    if isinstance(node, str):
        return _expand_str(node, depth)
    if isinstance(node, dict):
        return {k: _expand(v, depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_expand(v, depth) for v in node]
    return node


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def resolve(*uris: str) -> dict:
    """Fetch every config URI (scheme-prefixed; bare paths = ``file:``),
    deep-merge left-to-right, expand ``${...}`` references recursively.
    Returns the resolved config mapping — the input to
    ``PipelineGraph``."""
    if not uris:
        raise ResolveError("at least one config URI required")
    merged: dict = {}
    for u in uris:
        m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):(.*)$", u, re.DOTALL)
        scheme, rest = (m.group(1), m.group(2)) if m else ("file", u)
        doc = _fetch(scheme, rest)
        if doc is None:
            continue
        if not isinstance(doc, dict):
            raise ResolveError(f"config URI {u!r} did not yield a mapping")
        merged = _deep_merge(merged, doc)
    return _expand(merged)
