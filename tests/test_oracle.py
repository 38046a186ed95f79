"""Local replica of the driver's DuckDB-oracle gate: every queries() entry is
run through Spark AND its oracle_sql() through DuckDB at sf0.01, comparing
row count, column names, and order-insensitive value multisets."""

import math

import duckdb
import pytest

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "entrymod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "__spark_entry__.py"))
entrymod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entrymod)

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "__int__") and not isinstance(v, (bool, float)):
        try:
            return int(v)
        except Exception:
            return v
    return v


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(normalize(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(row) for row in sdf.collect()]

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: schema {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} vs {len(orows)}"
    sm, om = to_multiset(scols, srows), to_multiset(ocols, orows)
    if sm != om:
        diff1 = {k: v for k, v in sm.items() if om.get(k) != v}
        diff2 = {k: v for k, v in om.items() if sm.get(k) != v}
        raise AssertionError(
            f"{name}: value mismatch; spark-only {list(diff1.items())[:3]} "
            f"oracle-only {list(diff2.items())[:3]}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.columns == ["z", "x", "y", "layer", "feature_count"]
