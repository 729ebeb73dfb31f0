"""Memory-limiter configuration — the reference's full config surface
(processor/memorylimiterprocessor/config.go:16-40): ``check_interval``
+ ``limit_mib``/``spike_limit_mib`` (fixed) or ``limit_percentage``/
``spike_limit_percentage`` (resolved against total memory, detected
cgroup-aware per internal/iruntime/total_memory_linux.go with the
/proc/meminfo fallback of internal/iruntime/mem_info.go).

Validation mirrors memorylimiter.go:87-93,322-341:

- check_interval must be > 0 (errCheckIntervalOutOfRange),
- one of limit_mib / limit_percentage must be > 0 (errLimitOutOfRange),
- spike_limit_mib must be < limit_mib (errMemSpikeLimitOutOfRange);
  unset spike defaults to limit/5,
- percentages must be in (0, 100] (errPercentageLimitOutOfRange),
- limit_mib takes precedence over limit_percentage
  (getMemUsageChecker, memorylimiter.go:128-143).

Batch-mode semantics: the reference's ticker checks process RSS between
batches and refuses while above the soft limit (limit - spike).  Here
"a batch" is one pipeline run, and the projected footprint of the
admitted DataFrame stands in for runtime.MemStats.Alloc: a bounded row
sample prices the average row, and sampled-avg-row-bytes x admitted
rows is compared against the soft limit at admission time.  ``max_rows``
remains the explicit engine-native knob and takes precedence over both
reference knobs when present.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import types as T

MIB = 1024 * 1024

# cgroup v1 reports this when no limit is set (iruntime's
# unlimitedMemorySize, total_memory_linux.go:13-14).
_UNLIMITED = 9223372036854771712


class MemLimitConfigError(ValueError):
    """Invalid memory_limiter configuration (construction errors of
    memorylimiter.go:37-48)."""


def total_memory(root: str = "/") -> int:
    """Total memory available to this process in bytes, cgroup-aware:
    cgroup v2 ``memory.max``, else v1 ``memory.limit_in_bytes``, else
    /proc/meminfo MemTotal (TotalMemory, total_memory_linux.go:17-54).
    ``root`` is overridable for tests."""
    v2 = os.path.join(root, "sys/fs/cgroup/memory.max")
    try:
        with open(v2, encoding="ascii") as f:
            raw = f.read().strip()
        if raw != "max":
            return int(raw)
    except (OSError, ValueError):
        pass
    v1 = os.path.join(root, "sys/fs/cgroup/memory/memory.limit_in_bytes")
    try:
        with open(v1, encoding="ascii") as f:
            quota = int(f.read().strip())
        if 0 < quota < _UNLIMITED:
            return quota
    except (OSError, ValueError):
        pass
    meminfo = os.path.join(root, "proc/meminfo")
    try:
        with open(meminfo, encoding="ascii") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024
    except (OSError, ValueError, IndexError):
        pass
    raise MemLimitConfigError(
        "failed to get total memory, use fixed memory settings (limit_mib)")


_DURATION = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ns|us|µs|ms|s|m|h)?\s*$")
_UNIT_S = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
           "s": 1.0, "m": 60.0, "h": 3600.0, None: 1.0}


def parse_duration(v) -> float:
    """Go time.Duration-ish config value -> seconds (int/float are
    seconds; strings accept ns/us/ms/s/m/h suffixes)."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    m = _DURATION.match(str(v))
    if not m:
        raise MemLimitConfigError(f"invalid duration {v!r}")
    return float(m.group(1)) * _UNIT_S[m.group(2)]


@dataclass(frozen=True)
class MemLimiterSpec:
    """Resolved admission budget: exactly one of ``max_rows`` /
    ``soft_limit_bytes`` is the active gate."""

    check_interval_s: float
    max_rows: int | None = None
    limit_bytes: int | None = None
    spike_bytes: int | None = None

    @property
    def soft_limit_bytes(self) -> int | None:
        """Refusal threshold: limit - spike (aboveSoftLimit,
        memorylimiter.go:315-317)."""
        if self.limit_bytes is None:
            return None
        return self.limit_bytes - self.spike_bytes


def _uint(cfg: dict, key: str) -> int:
    v = cfg.get(key, 0)
    if v is None:
        return 0
    if isinstance(v, bool) or not isinstance(v, int) or v < 0:
        raise MemLimitConfigError(f"{key} must be a non-negative integer, "
                                  f"got {v!r}")
    return v


def parse_memlimiter(cfg: dict, *,
                     total_memory_fn=total_memory) -> MemLimiterSpec:
    """Validate + resolve a ``memory_limiter`` processor config block.

    Accepts the reference keys (config.go:16-40) plus the engine-native
    ``max_rows``; precedence max_rows > limit_mib > limit_percentage."""
    known = {"kind", "max_rows", "check_interval", "limit_mib",
             "spike_limit_mib", "limit_percentage",
             "spike_limit_percentage"}
    unknown = set(cfg) - known
    if unknown:
        raise MemLimitConfigError(
            f"memory_limiter: unknown keys {sorted(unknown)}")

    interval = parse_duration(cfg.get("check_interval", "1s"))
    if interval <= 0:
        raise MemLimitConfigError("checkInterval must be greater than zero")

    if cfg.get("max_rows") is not None:
        n = cfg["max_rows"]
        if isinstance(n, bool) or not isinstance(n, int) or n <= 0:
            raise MemLimitConfigError(
                f"max_rows must be a positive integer, got {n!r}")
        return MemLimiterSpec(check_interval_s=interval, max_rows=n)

    limit_mib = _uint(cfg, "limit_mib")
    spike_mib = _uint(cfg, "spike_limit_mib")
    limit_pct = _uint(cfg, "limit_percentage")
    spike_pct = _uint(cfg, "spike_limit_percentage")

    if limit_mib == 0 and limit_pct == 0:
        raise MemLimitConfigError(
            "memAllocLimit or memoryLimitPercentage must be greater "
            "than zero")

    if limit_mib > 0:                          # fixed settings win
        limit_b, spike_b = limit_mib * MIB, spike_mib * MIB
    else:
        if not 0 < limit_pct <= 100 or not 0 < spike_pct <= 100:
            raise MemLimitConfigError(
                "memoryLimitPercentage and memorySpikePercentage must be "
                "greater than zero and less than or equal to hundred")
        total = total_memory_fn()
        limit_b = limit_pct * total // 100
        spike_b = spike_pct * total // 100

    if spike_b >= limit_b:                     # newFixedMemUsageChecker
        raise MemLimitConfigError(
            "memSpikeLimit must be smaller than memAllocLimit")
    if spike_b == 0:
        spike_b = limit_b // 5                 # default spike: 20%
    return MemLimiterSpec(check_interval_s=interval,
                          limit_bytes=limit_b, spike_bytes=spike_b)


# -- row-footprint pricing ---------------------------------------------------

# UnsafeRow stores every fixed-width field in one 8-byte word
# regardless of logical width (bool and long cost the same), so the
# footprint of any fixed type is exactly one word.
_FIXED = (T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
          T.FloatType, T.DateType, T.LongType, T.DoubleType,
          T.TimestampType, T.TimestampNTZType)


def _value_bytes(v, dtype) -> int:
    """In-memory footprint estimate of one value (Tungsten UnsafeRow
    accounting shape: 8-byte word per field + variable payloads)."""
    if v is None:
        return 8
    if isinstance(dtype, _FIXED):
        return 8
    if isinstance(dtype, T.StringType):
        return 8 + len(str(v).encode("utf-8"))
    if isinstance(dtype, T.BinaryType):
        return 8 + len(v)
    if isinstance(dtype, T.DecimalType):
        return 16
    if isinstance(dtype, T.ArrayType):
        return 16 + sum(_value_bytes(x, dtype.elementType) for x in v)
    if isinstance(dtype, T.MapType):
        return 16 + sum(_value_bytes(k, dtype.keyType) +
                        _value_bytes(x, dtype.valueType)
                        for k, x in v.items())
    if isinstance(dtype, T.StructType):
        d = v.asDict() if hasattr(v, "asDict") else dict(v)
        return 16 + sum(_value_bytes(d.get(f.name), f.dataType)
                        for f in dtype.fields)
    return 16                                   # conservative default


def estimate_row_bytes(rows, schema: T.StructType) -> float:
    """Average estimated in-memory bytes per row over a sample."""
    if not rows:
        return 0.0
    tot = sum(16 + sum(_value_bytes(r[f.name], f.dataType)
                       for f in schema.fields) for r in rows)
    return tot / len(rows)
