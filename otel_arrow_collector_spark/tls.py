"""TLS settings for the live OTLP/HTTP pair.

Mirrors the surface of the reference's ``config/configtls``
(configtls.go: ``TLSSetting{CAFile, CertFile, KeyFile}``,
``TLSServerSetting.ClientCAFile``, ``TLSClientSetting.InsecureSkipVerify``)
on top of stdlib :mod:`ssl`.  The dataclass holds only file paths and
flags, so it is picklable into Spark executor closures; the (unpicklable)
``SSLContext`` is built where it is used.
"""

from __future__ import annotations

import ssl
from dataclasses import dataclass


@dataclass(frozen=True)
class TLSConfig:
    """File-path TLS settings; build contexts lazily via the methods."""

    cert_file: str | None = None        #: this side's certificate chain
    key_file: str | None = None         #: this side's private key
    ca_file: str | None = None          #: trust roots for the PEER's cert
    client_ca_file: str | None = None   #: server side: require + verify client certs (mTLS)
    insecure_skip_verify: bool = False  #: client side: skip server-cert verification

    def server_context(self) -> ssl.SSLContext:
        """Server-side context: our cert + optional mTLS client check."""
        if not self.cert_file or not self.key_file:
            raise ValueError("server TLS requires cert_file and key_file")
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(self.cert_file, self.key_file)
        if self.client_ca_file:
            ctx.load_verify_locations(self.client_ca_file)
            ctx.verify_mode = ssl.CERT_REQUIRED
        return ctx

    def client_context(self) -> ssl.SSLContext:
        """Client-side context: server verification + optional client cert."""
        ctx = ssl.create_default_context(cafile=self.ca_file)
        if self.insecure_skip_verify:
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        if self.cert_file and self.key_file:
            ctx.load_cert_chain(self.cert_file, self.key_file)
        return ctx
