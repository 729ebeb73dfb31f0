"""Feature-gate registry tests mirroring the reference's
featuregate/registry_test.go + flag_test.go semantics."""

from __future__ import annotations

import pytest

from otel_arrow_collector_spark.plans import (GateError, Registry, Stage,
                                              global_registry)


def test_stage_defaults():
    r = Registry()
    assert r.register("a.alpha", Stage.ALPHA).enabled is False
    assert r.register("b.beta", Stage.BETA).enabled is True
    assert r.register("s.stable", Stage.STABLE,
                      to_version="v0.90.0").enabled is True
    assert r.register("d.dep", Stage.DEPRECATED,
                      to_version="v0.90.0").enabled is False


def test_duplicate_register_errors():
    r = Registry()
    r.register("g", Stage.ALPHA)
    with pytest.raises(GateError, match="pre-existing"):
        r.register("g", Stage.BETA)


def test_stable_deprecated_require_removal_version():
    r = Registry()
    with pytest.raises(GateError, match="no removal version"):
        r.register("s", Stage.STABLE)
    with pytest.raises(GateError, match="no removal version"):
        r.register("d", Stage.DEPRECATED)


def test_set_rules():
    r = Registry()
    r.register("a", Stage.ALPHA)
    r.register("s", Stage.STABLE, to_version="v1")
    r.register("d", Stage.DEPRECATED, to_version="v1")
    r.set("a", True)
    assert r.is_enabled("a")
    r.set("s", True)                   # no-op, allowed
    with pytest.raises(GateError, match="stable, can not be disabled"):
        r.set("s", False)
    r.set("d", False)                  # no-op, allowed
    with pytest.raises(GateError, match="deprecated, can not be enabled"):
        r.set("d", True)
    with pytest.raises(GateError, match="no such feature gate"):
        r.set("nope", True)


def test_flag_syntax_roundtrip():
    r = Registry()
    r.register("x.one", Stage.ALPHA)
    r.register("x.two", Stage.BETA)
    r.register("x.three", Stage.ALPHA)
    r.apply_flags("x.one,-x.two,+x.three")
    assert r.is_enabled("x.one") and r.is_enabled("x.three")
    assert not r.is_enabled("x.two")
    assert r.flag_string() == "x.one,x.three,-x.two"


def test_collector_config_applies_gates(spark, tmp_path):
    """A config's feature_gates section toggles the global registry during
    dry_run; unknown gates fail validation."""
    from otel_arrow_collector_spark.plans.collector import Collector
    reg = global_registry()
    try:
        reg.register("engine.test_gate", Stage.ALPHA)
    except GateError:
        pass
    cfg = tmp_path / "c.yaml"
    cfg.write_text("""
feature_gates: [engine.test_gate]
receivers:
  t: {kind: table, table: events}
exporters:
  m: {kind: memory}
pipelines:
  p: {receivers: [t], exporters: [m]}
""")
    from tests.conftest import SF_SMALL
    Collector.dry_run(spark, str(cfg), sf_dir=SF_SMALL)
    assert reg.is_enabled("engine.test_gate")
    bad = tmp_path / "bad.yaml"
    bad.write_text(cfg.read_text().replace("engine.test_gate", "no.such"))
    with pytest.raises(GateError, match="no such feature gate"):
        Collector.dry_run(spark, str(bad), sf_dir=SF_SMALL)
