"""OTTL statement-text parser tests — the reference's transformation
language surface (docs/processing.md:96-214) compiled to Column ops over
the canonical trace fixtures.  Statements under test are the doc's own
examples where possible."""

from __future__ import annotations

import pytest

from otel_arrow_collector_spark.functions.ottl_parser import (
    OttlSyntaxError, apply_statement, apply_statements, compile_condition,
    parse_statement)
from otel_arrow_collector_spark.model import generate_traces


@pytest.fixture()
def td(spark):
    from otel_arrow_collector_spark.functions.ottl_parser import \
        apply_statement as _a
    base = generate_traces(spark, 4)
    # seed an attribute to operate on
    return _a(base, 'set(attributes["http.target"], "/user/7/list/2")')


def test_parse_shapes():
    s = parse_statement(
        'set(attributes["k8s_pod"], resource.attributes["k8s.pod.name"]) '
        'where name == "GET /cats"')
    assert s.func == "set" and s.where == 'name == "GET /cats"'
    assert s.args[0] == ("path", 'attributes["k8s_pod"]')
    assert s.args[1] == ("path", 'resource.attributes["k8s.pod.name"]')
    d = parse_statement('drop() where attributes["http.target"] = "/health"')
    assert d.func == "drop" and d.args == []


def test_set_attribute_and_read_back(td):
    rows = td.select("attributes").collect()
    assert all(r.attributes["http.target"].s == "/user/7/list/2"
               for r in rows)


def test_set_column_conditional(td):
    out = apply_statement(td, 'set(name, "renamed") '
                              'where name == "operationA"')
    names = sorted(r.name for r in out.select("name").collect())
    assert set(names) == {"operationB", "renamed"}


def test_set_from_resource_path(td):
    out = apply_statement(
        td, 'set(attributes["rsrc"], resource.attributes["resource-attr"])')
    r = out.first()
    assert r.attributes["rsrc"].s == "resource-attr-val-1"


def test_delete_and_keep_keys(td):
    out = apply_statement(td, 'delete(attributes["http.target"])')
    assert all("http.target" not in r.attributes
               for r in out.select("attributes").collect())
    out2 = apply_statements(td, [
        'set(attributes["keep.me"], "v")',
        'keep_keys(attributes, "keep.me")'])
    for r in out2.select("attributes").collect():
        assert set(r.attributes) == {"keep.me"}


def test_drop_where_filters(td):
    out = apply_statement(td, 'drop() where name == "operationA"')
    assert {r.name for r in out.select("name").collect()} == {"operationB"}
    # spans with no match flow through untouched
    assert out.count() == td.filter("name != 'operationA'").count()


def test_replace_match_glob_on_attribute(td):
    out = apply_statement(
        td, 'replace_match(attributes["http.target"], "/user/*/list/*", '
            '"/user/{userId}/list/{listId}")')
    r = out.first()
    assert r.attributes["http.target"].s == "/user/{userId}/list/{listId}"
    # non-matching values untouched
    out2 = apply_statement(
        td, 'replace_match(attributes["http.target"], "/cats/*", "X")')
    assert out2.first().attributes["http.target"].s == "/user/7/list/2"


def test_replace_match_on_span_name(td):
    out = apply_statement(
        td, 'replace_match(name, "operation*", "operation{x}")')
    assert {r.name for r in out.select("name").collect()} == {"operation{x}"}


def test_replace_all_matches(td):
    out = apply_statement(
        td, 'replace_all_matches(attributes, "/user/*", "{redacted}")')
    assert out.first().attributes["http.target"].s == "{redacted}"


def test_truncate_all_and_limit(td):
    out = apply_statements(td, [
        'set(attributes["long"], "abcdefghij")',
        'truncate_all(attributes, 4)'])
    assert out.first().attributes["long"].s == "abcd"
    out2 = apply_statements(td, [
        'set(attributes["a"], "1")',
        'set(attributes["b"], "2")',
        'limit(attributes, 1, "http.target")'])
    for r in out2.select("attributes").collect():
        assert set(r.attributes) == {"http.target"}


def test_where_boolean_operators(td):
    cond = compile_condition(
        'name == "operationA" and not (status_code == 0) '
        'or trace_state != ""')
    got = td.filter(cond).count()
    # operationA spans carry status Error (2): predicate true for them
    want = td.filter(
        "(name = 'operationA' and not (status_code = 0)) "
        "or trace_state != ''").count()
    assert got == want > 0


def test_where_on_resource_attribute(td):
    out = apply_statement(
        td, 'set(name, "tagged") where '
            'resource.attributes["resource-attr"] == "resource-attr-val-1"')
    assert {r.name for r in out.select("name").collect()} == {"tagged"}


def test_syntax_errors():
    for bad in ['set(attributes["a"]',          # unbalanced
                'notafunc!(x)',
                'set(name, "x") whree y',       # bad trailing
                'drop(1)',                      # drop takes no args
                'keep_keys("notapath", "k")']:
        with pytest.raises(OttlSyntaxError):
            parse_statement(bad) and apply_statement(None, bad)


def test_statement_list_order(td):
    """Statements apply in order — a later delete sees the earlier set."""
    out = apply_statements(td, [
        'set(attributes["tmp"], "x")',
        'delete(attributes["tmp"])'])
    assert all("tmp" not in r.attributes
               for r in out.select("attributes").collect())


def test_statements_through_pipeline_dag(spark):
    """The transform processor's `statements:` key routes OTTL text
    through the DAG compiler — the reference's transform-processor
    config surface end to end."""
    from otel_arrow_collector_spark.plans import PipelineGraph
    from tests.conftest import SF_SMALL
    g = PipelineGraph.from_yaml("""
receivers:
  table/events: {kind: table, table: events}
processors:
  transform/sev:
    kind: transform
    statements:
      - 'set(severity, 17) where event_type == "error"'
      - 'set(severity, 9) where not (event_type == "error")'
      - 'drop() where event_type == "view"'
exporters:
  sink/mem: {kind: memory}
pipelines:
  p: {receivers: [table/events], processors: [transform/sev],
      exporters: [sink/mem]}
""")
    rows = g.compile(spark, sf_dir=SF_SMALL).run()["p/sink/mem"]
    assert rows and all(r.event_type != "view" for r in rows)
    assert all(r.severity == (17 if r.event_type == "error" else 9)
               for r in rows)


def test_set_new_column_conditional_null_elsewhere(spark):
    from otel_arrow_collector_spark.functions.ottl_parser import \
        apply_statement as _a
    from otel_arrow_collector_spark.model import generate_traces
    out = _a(generate_traces(spark, 4),
             'set(flagged, "y") where name == "operationA"')
    vals = {(r.name, r.flagged) for r in out.select("name", "flagged").collect()}
    assert ("operationA", "y") in vals and ("operationB", None) in vals
