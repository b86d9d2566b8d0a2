"""Suite smoke tests: every registered query runs at sf0.001 and returns a
stable schema; a sampled subset is value-checked against its DuckDB oracle
(the full cross-check runs in tools/selfcheck.py at sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

from datafusion_python_spark.suite import ALL_QUERIES
from datafusion_python_spark.tables import TABLE_NAMES

ORACLE_SAMPLE = [
    "tpch_q1",
    "tpch_q6",
    "evt_sessionize",
    "agg_grouping_multi",
    "fn_strings",
    # the end-to-end curation chain: the one gate that certifies the
    # pipeline operators COMPOSE (full value check in tools/selfcheck.py)
    "pipe_curation_e2e",
]


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_runs(spark, sf_dir, name):
    fn, _sql = ALL_QUERIES[name]
    df = fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None


@pytest.mark.parametrize("name", ORACLE_SAMPLE)
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = ALL_QUERIES[name]
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(v) for _, v in sorted(r.asDict().items())) for r in sdf.collect()
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    res = con.execute(sql)
    dcols = sorted(d[0] for d in res.description)
    assert scols == dcols, name
    assert len(srows) == len(res.fetchall()), name
