"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are
consistent, and a fast subset hash-matches DuckDB at sf0.001."""

import math
from collections import Counter

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_keys_align():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q3_shipping_priority", "events_hourly_rollup"]
)
def test_query_matches_oracle_smoke(spark, name):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    res = con.execute(os_[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    s_order = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    o_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sm = Counter(tuple(_norm(r[i]) for i in s_order) for r in srows)
    om = Counter(tuple(_norm(r[i]) for i in o_order) for r in orows)
    assert sm == om
