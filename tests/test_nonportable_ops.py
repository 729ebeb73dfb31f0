"""Engine-internal golden tests for the operators SURVEY.md §2.8 excludes
from the DuckDB oracle (dialect-divergent): JSON attribute access
(get_json_object vs json_extract) and approximate distinct-count
(different sketches).  Arrow round-trips live in test_codecs.py."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from otel_arrow_collector_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_json_attribute_access_matches_python(spark):
    """get_json_object over events.props == Python json.loads golden
    (the OTTL attributes-path analogue for JSON-encoded attribute maps)."""
    e = load_table(spark, SF_SMALL, "events")
    got = (e.select("event_id",
                    F.get_json_object("props", "$.k").alias("k"))
            .orderBy("event_id").limit(200).collect())
    want = {r.event_id: json.loads(r.props).get("k")
            for r in e.select("event_id", "props")
                      .orderBy("event_id").limit(200).collect()}
    for r in got:
        expect = want[r.event_id]
        assert r.k == (None if expect is None else str(expect))


def test_json_typed_extraction(spark):
    """from_json with a typed schema gives native ints (the variant-codec
    path for JSON attribute maps)."""
    e = load_table(spark, SF_SMALL, "events")
    typed = e.select(F.from_json("props", "k INT").alias("p"))
    assert typed.schema["p"].dataType.fields[0].dataType.simpleString() == "int"
    assert typed.filter("p.k IS NOT NULL").count() > 0


def test_approx_count_distinct_within_tolerance(spark):
    """HLL sketch estimate within its configured relative error of the
    exact count (the reference's self-telemetry has exact counters only;
    the sketch is our scale path for high-cardinality dims)."""
    e = load_table(spark, SF_SMALL, "events")
    exact = e.select(F.countDistinct("user_id")).first()[0]
    approx = e.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= max(3.0, 0.06 * exact)
