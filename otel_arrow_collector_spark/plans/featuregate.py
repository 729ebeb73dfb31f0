"""Feature gates — the reference's ``featuregate`` library
(featuregate/registry.go:80-133 Register/Set, stage.go:6-31 lifecycle,
flag.go:35-60 ``--feature-gates`` syntax) as a small thread-safe registry.

Stages and their rules (stage.go):
- ALPHA       disabled by default, freely togglable
- BETA        enabled by default, freely togglable
- STABLE      enabled; disabling errors; requires a removal version
- DEPRECATED  disabled; enabling errors; requires a removal version

Flag syntax (flag.go): comma-separated ids; ``-id`` disables, ``+id`` or
bare ``id`` enables.  The pipeline config may carry a ``feature_gates``
section (list or comma string) applied by the Collector before compile.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from enum import Enum


class Stage(Enum):
    ALPHA = "Alpha"
    BETA = "Beta"
    STABLE = "Stable"
    DEPRECATED = "Deprecated"


class GateError(ValueError):
    """Invalid registration or Set (duplicate id, unknown id, stage rule)."""


@dataclass
class Gate:
    id: str
    stage: Stage
    description: str = ""
    reference_url: str = ""
    from_version: str = ""
    to_version: str = ""
    _enabled: bool = field(default=False, repr=False)

    @property
    def enabled(self) -> bool:
        return self._enabled


class Registry:
    """Gate registry (registry.go:20-133 semantics)."""

    def __init__(self):
        self._gates: dict[str, Gate] = {}
        self._lock = threading.Lock()

    def register(self, gate_id: str, stage: Stage, *, description: str = "",
                 reference_url: str = "", from_version: str = "",
                 to_version: str = "") -> Gate:
        g = Gate(gate_id, stage, description, reference_url,
                 from_version, to_version)
        g._enabled = stage in (Stage.BETA, Stage.STABLE)
        if stage in (Stage.STABLE, Stage.DEPRECATED) and not to_version:
            raise GateError(
                f"no removal version set for {stage.value} gate {gate_id!r}")
        with self._lock:
            if gate_id in self._gates:
                raise GateError(
                    f"attempted to add pre-existing gate {gate_id!r}")
            self._gates[gate_id] = g
        return g

    def set(self, gate_id: str, enabled: bool) -> None:
        with self._lock:
            g = self._gates.get(gate_id)
            if g is None:
                raise GateError(f"no such feature gate {gate_id!r}")
            if g.stage is Stage.STABLE and not enabled:
                raise GateError(
                    f"feature gate {gate_id!r} is stable, can not be disabled")
            if g.stage is Stage.DEPRECATED and enabled:
                raise GateError(
                    f"feature gate {gate_id!r} is deprecated, can not be "
                    f"enabled")
            if g.stage in (Stage.ALPHA, Stage.BETA):
                g._enabled = enabled

    def is_enabled(self, gate_id: str) -> bool:
        with self._lock:
            g = self._gates.get(gate_id)
            if g is None:
                raise GateError(f"no such feature gate {gate_id!r}")
            return g._enabled

    def visit_all(self):
        """Gates in lexicographic id order (registry.go VisitAll)."""
        with self._lock:
            return [self._gates[k] for k in sorted(self._gates)]

    def apply_flags(self, flags) -> None:
        """Apply ``--feature-gates`` syntax: str "a,-b,+c" or list of such
        tokens (flag.go:35-60).  All tokens are validated; the first error
        aborts (the reference accumulates with multierr — first-error is
        the stricter subset)."""
        if flags is None:
            return
        if isinstance(flags, str):
            tokens = [t for t in flags.split(",") if t.strip()]
        else:
            tokens = [str(t) for t in flags]
        for tok in tokens:
            tok = tok.strip()
            if tok.startswith("-"):
                self.set(tok[1:], False)
            elif tok.startswith("+"):
                self.set(tok[1:], True)
            else:
                self.set(tok, True)

    def flag_string(self) -> str:
        """Current state in flag syntax (flag.go String): ``-`` prefix on
        disabled gates."""
        return ",".join(g.id if g.enabled else "-" + g.id
                        for g in self.visit_all())


_GLOBAL = Registry()


def global_registry() -> Registry:
    """The process-wide registry (registry.go GlobalRegistry)."""
    return _GLOBAL
