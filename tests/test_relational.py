"""TPC-H-shaped relational gates (queries_ext.py q_top_orders /
q_regional_volume / q_small_qty_revenue): plan-shape guards (pushdown,
broadcast, TakeOrdered) and an exact python replay of the Q17
cross-multiplied threshold."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_top_orders_plan_and_values(spark):
    from mapbox_filter_spark.queries_ext import q_top_orders
    df = q_top_orders(spark, SF)
    plan = _plan(df)
    # selective filters reach the parquet scans, the top-k is a
    # TakeOrdered (per-partition heaps), customer is broadcast
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" \
        in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" \
        in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r.revenue_u for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_regional_volume_broadcast_dims(spark):
    from mapbox_filter_spark.queries_ext import q_regional_volume
    df = q_regional_volume(spark, SF)
    plan = _plan(df)
    # customer, supplier (with the cycle-closing nationkey equality),
    # nation, region all broadcast — exactly one big-side shuffle join
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1
    total = df.agg(F.sum("n_items")).first()[0]
    assert total is None or total >= 0   # sf0.001 may have no ASIA rows


def _py_q17(rows, mod):
    # rows: (partkey, qty, price_c)
    from collections import defaultdict
    tot = defaultdict(lambda: [0, 0])
    for p, q, _ in rows:
        tot[p][0] += 1
        tot[p][1] += q
    n = s = 0
    for p, q, c in rows:
        if p % mod == 0 and 5 * q * tot[p][0] < tot[p][1]:
            n += 1
            s += c
    return n, s


def test_small_qty_threshold_replay(spark, tmp_path):
    import random

    from mapbox_filter_spark.queries_ext import (
        _Q17_BRAND_MOD, q_small_qty_revenue)

    random.seed(51)
    rows = [(random.randrange(1, 40), random.randrange(1, 50),
             random.randrange(100, 99999)) for _ in range(600)]
    li = spark.createDataFrame(
        [(p, float(q), c / 100.0) for p, q, c in rows],
        "l_partkey long, l_quantity double, l_extendedprice double")
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame([(p,) for p in range(1, 40)],
                          "p_partkey long") \
        .write.parquet(str(tmp_path / "part.parquet"))
    got = q_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    n, s = _py_q17(rows, _Q17_BRAND_MOD)
    assert (got.n_small, got.sum_cents) == (n, s if n else None)
