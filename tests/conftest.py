from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_GATE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from otel_arrow_collector_spark.session import get_spark
    s = get_spark("pytest", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    from otel_arrow_collector_spark.oracle import register_duckdb_views
    con = duckdb.connect()
    register_duckdb_views(con, SF_SMALL)
    yield con
    con.close()
