"""TPC-H-shaped relational gates (queries_ext.py q_top_orders /
q_regional_volume / q_small_qty_revenue): plan-shape guards (pushdown,
broadcast, TakeOrdered) and an exact python replay of the Q17
cross-multiplied threshold."""

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


def test_regional_volume_values(spark, tmp_path):
    from mapbox_filter_spark.queries_ext import q_regional_volume

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).write.parquet(
            str(tmp_path / f"{name}.parquet"))

    w("region", "r_regionkey int, r_name string",
      [(1, "ASIA"), (2, "EUROPE")])
    w("nation", "n_nationkey int, n_name string, n_regionkey int",
      [(10, "JAPAN", 1), (11, "INDIA", 1), (20, "FRANCE", 2)])
    w("customer", "c_custkey long, c_nationkey int",
      [(100, 10), (101, 11), (102, 20)])
    w("supplier", "s_suppkey long, s_nationkey int",
      [(200, 10), (201, 11), (202, 20)])
    w("orders", "o_orderkey long, o_custkey long, o_orderdate timestamp",
      [(1, 100, __import__("datetime").datetime(1997, 6, 1)),   # in
       (2, 100, __import__("datetime").datetime(1996, 6, 1)),   # out
       (3, 101, __import__("datetime").datetime(1997, 2, 1)),   # in
       (4, 102, __import__("datetime").datetime(1997, 6, 1))])  # EUROPE
    w("lineitem", "l_orderkey long, l_suppkey long, "
                  "l_extendedprice double, l_discount double",
      [(1, 200, 100.00, 0.10),   # JAPAN local:  10000 * 90
       (1, 201, 50.00, 0.00),    # cust JAPAN / supp INDIA: cycle drops
       (2, 200, 77.00, 0.05),    # order outside the date range
       (3, 201, 20.00, 0.02),    # INDIA local:  2000 * 98
       (4, 202, 99.00, 0.00)])   # EUROPE region: filtered
    got = {r.n_name: r for r in
           q_regional_volume(spark, str(tmp_path)).collect()}
    assert set(got) == {"JAPAN", "INDIA"}
    assert (got["JAPAN"].n_items, got["JAPAN"].revenue_u) == (1, 900000)
    assert (got["INDIA"].n_items, got["INDIA"].revenue_u) == (1, 196000)


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

def test_late_orders_semi_join_plan(spark):
    from mapbox_filter_spark.queries_ext import q_late_orders
    df = q_late_orders(spark, SF)
    plan = _plan(df)
    # the EXISTS runs as a LEFT-SEMI join (each order counted once) and
    # the quarter filter reaches the orders parquet scan
    assert "LeftSemi" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), " \
           "GreaterThanOrEqual(o_orderdate" in plan


def test_late_orders_values(spark, tmp_path):
    import datetime as dt

    from mapbox_filter_spark.queries_ext import q_late_orders

    d = dt.datetime
    spark.createDataFrame(
        [(1, d(1996, 1, 10), "1-URGENT"),    # two late lines -> counts ONCE
         (2, d(1996, 2, 10), "1-URGENT"),    # on-time only
         (3, d(1996, 3, 10), "5-LOW"),       # exactly +60d -> late (>=)
         (4, d(1995, 6, 1), "5-LOW")],       # outside the quarter
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, d(1996, 4, 1)), (1, d(1996, 5, 1)),
         (2, d(1996, 2, 20)),
         (3, d(1996, 5, 9)),                 # 1996-03-10 + 60d exactly
         (4, d(1999, 1, 1))],
        "l_orderkey long, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {r.o_orderpriority: r.n_orders
           for r in q_late_orders(spark, str(tmp_path)).collect()}
    assert got == {"1-URGENT": 1, "5-LOW": 1}


def test_custdist_keeps_zero_order_customers(spark, tmp_path):
    from mapbox_filter_spark.queries_ext import q_custdist

    spark.createDataFrame([(i,) for i in range(1, 6)], "c_custkey long") \
        .write.parquet(str(tmp_path / "customer.parquet"))
    # cust 1: two kept orders; cust 2: one kept + one excluded priority;
    # cust 3: only an excluded order -> counts as zero; cust 4,5: none
    spark.createDataFrame(
        [(10, 1, "5-LOW"), (11, 1, "5-LOW"),
         (12, 2, "5-LOW"), (13, 2, "1-URGENT"),
         (14, 3, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {r.c_count: r.custdist
           for r in q_custdist(spark, str(tmp_path)).collect()}
    assert got == {2: 1, 1: 1, 0: 3}


def test_idle_customers_anti_join_plan_and_values(spark, tmp_path):
    from mapbox_filter_spark.queries_ext import q_idle_customers

    plan = _plan(q_idle_customers(spark, SF))
    assert "LeftAnti" in plan

    # positive balances: 100.00, 200.00, 300.00 -> avg 200.00; "rich"
    # means strictly above (cross-multiplied: bal_c * 3 > 60000)
    spark.createDataFrame(
        [(1, 7, 100.00),    # not rich
         (2, 7, 250.00),    # rich, recent order -> dropped by anti-join
         (3, 7, 300.00),    # rich, only a pre-cutoff order -> kept
         (4, 8, 200.00),    # exactly average -> not rich
         (5, 8, -50.00)],   # negative: excluded from avg, never rich
        "c_custkey long, c_nationkey int, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    import datetime as dt
    spark.createDataFrame(
        [(100, 2, dt.datetime(2001, 1, 1)),
         (101, 3, dt.datetime(1997, 1, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = q_idle_customers(spark, str(tmp_path)).collect()
    assert [(r.c_nationkey, r.n_cust, r.sum_bal_c) for r in rows] \
        == [(7, 1, 30000)]
