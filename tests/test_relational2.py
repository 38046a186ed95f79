"""TPC-H completion block (queries_relational.py): plan-shape guards
(pushdown, broadcast, semi/anti, TakeOrdered) and hand-computed
fixtures for the shapes with subtle semantics — Q21 sole-late-supplier
qualification, Q2/Q15 tie inclusion, Q11 cross-multiplied scalar
threshold, Q12's synthesized ship mode."""

import datetime as dt

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _write(spark, tmp_path, name, schema, rows):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet"))


# ------------------------------------------------------------ plans

def test_forecast_revenue_pushdown(spark):
    from mapbox_filter_spark.queries_relational import q_forecast_revenue
    plan = _plan(q_forecast_revenue(spark, SF))
    # every predicate reaches the scan (the plan string truncates the
    # PushedFilters list, so assert the stable prefix + the residual
    # Filter carrying all three bounds), columns pruned to the 4 used;
    # no join at all
    assert ("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)"
            ", IsNotNull(l_quantity)") in plan
    assert "< 24.0)" in plan and ">= 0.045)" in plan
    assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
            "l_discount:double,l_shipdate") in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_supplier_part_counts_anti_join(spark):
    from mapbox_filter_spark.queries_relational import (
        q_supplier_part_counts)
    plan = _plan(q_supplier_part_counts(spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_promotion_suppliers_double_semi(spark):
    from mapbox_filter_spark.queries_relational import (
        q_promotion_suppliers)
    plan = _plan(q_promotion_suppliers(spark, SF))
    assert plan.count("LeftSemi") >= 2


def test_big_orders_take_ordered(spark):
    from mapbox_filter_spark.queries_relational import q_big_orders
    plan = _plan(q_big_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_returned_revenue_take_ordered_and_pushdown(spark):
    from mapbox_filter_spark.queries_relational import q_returned_revenue
    plan = _plan(q_returned_revenue(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_disjunctive_revenue_broadcast(spark):
    from mapbox_filter_spark.queries_relational import (
        q_disjunctive_revenue)
    plan = _plan(q_disjunctive_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------- fixtures

def test_waiting_suppliers_sole_late_semantics(spark, tmp_path):
    from mapbox_filter_spark.queries_relational import q_waiting_suppliers
    d = dt.datetime
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
           [(1, "F", d(1997, 1, 1)),    # 2 supp, only 10 late -> counts
            (2, "F", d(1997, 1, 1)),    # 2 supp, both late -> nobody
            (3, "F", d(1997, 1, 1)),    # 1 supp late -> nobody (n_supp=1)
            (4, "O", d(1997, 1, 1))])   # status O -> excluded
    late, ok = d(1997, 6, 1), d(1997, 1, 15)
    _write(spark, tmp_path, "lineitem",
           "l_orderkey long, l_suppkey long, l_shipdate timestamp",
           [(1, 10, late), (1, 10, late), (1, 20, ok),   # 10: 2 late lines
            (2, 10, late), (2, 20, late),
            (3, 10, late),
            (4, 10, late), (4, 20, ok)])
    _write(spark, tmp_path, "supplier", "s_suppkey long, s_name string",
           [(10, "S10"), (20, "S20")])
    rows = q_waiting_suppliers(spark, str(tmp_path)).collect()
    assert [(r.s_suppkey, r.numwait, r.n_orders) for r in rows] == \
        [(10, 2, 1)]


def test_min_cost_supplier_keeps_ties(spark, tmp_path):
    from mapbox_filter_spark.queries_relational import q_min_cost_supplier
    _write(spark, tmp_path, "region", "r_regionkey int, r_name string",
           [(3, "EUROPE")])
    _write(spark, tmp_path, "nation",
           "n_nationkey int, n_name string, n_regionkey int",
           [(1, "FRANCE", 3)])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_name string, s_nationkey int, "
           "s_acctbal double",
           [(10, "A", 1, 5.0), (20, "B", 1, 7.0), (30, "C", 1, 9.0)])
    _write(spark, tmp_path, "part",
           "p_partkey long, p_type string, p_size int",
           [(100, "STANDARD", 3), (200, "STANDARD", 99)])
    _write(spark, tmp_path, "lineitem",
           "l_partkey long, l_suppkey long, l_extendedprice double",
           [(100, 10, 4.00), (100, 10, 9.99),   # cost_u = 400
            (100, 20, 4.00),                    # tie at 400 -> kept
            (100, 30, 4.01),                    # loses
            (200, 30, 1.00)])                   # part filtered (size 99)
    rows = q_min_cost_supplier(spark, str(tmp_path)).collect()
    got = sorted((r.s_suppkey, r.p_partkey, r.cost_u) for r in rows)
    assert got == [(10, 100, 400), (20, 100, 400)]


def test_top_supplier_ties_included(spark, tmp_path):
    from mapbox_filter_spark.queries_relational import q_top_supplier
    d = dt.datetime
    _write(spark, tmp_path, "supplier", "s_suppkey long, s_name string",
           [(1, "A"), (2, "B"), (3, "C")])
    _write(spark, tmp_path, "lineitem",
           "l_suppkey long, l_shipdate timestamp, "
           "l_extendedprice double, l_discount double",
           [(1, d(1997, 2, 1), 100.0, 0.0),    # 1000000
            (2, d(1997, 2, 1), 50.0, 0.0),     # 500000
            (2, d(1997, 2, 2), 50.0, 0.0),     # -> 1000000 tie
            (3, d(1997, 2, 1), 99.0, 0.0),     # below
            (1, d(1998, 2, 1), 999.0, 0.0)])   # out of window
    rows = q_top_supplier(spark, str(tmp_path)).collect()
    assert sorted((r.s_suppkey, r.total_rev_u) for r in rows) == \
        [(1, 1000000), (2, 1000000)]


def test_important_parts_cross_multiply(spark, tmp_path):
    from mapbox_filter_spark.queries_relational import (
        q_important_parts, _Q11_FRACTION_DEN)
    _write(spark, tmp_path, "nation",
           "n_nationkey int, n_name string", [(5, "NATION_5")])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_nationkey int", [(1, 5), (2, 7)])
    # value_u = line-price cents · qty:
    # part 100: 60000·1 = 60000; part 200: 3000·2 = 6000
    # part 300 via supplier 2 (wrong nation): excluded entirely
    _write(spark, tmp_path, "lineitem",
           "l_partkey long, l_suppkey long, l_extendedprice double, "
           "l_quantity double",
           [(100, 1, 600.0, 1.0), (200, 1, 30.0, 2.0),
            (300, 2, 9999.0, 9.0)])
    rows = q_important_parts(spark, str(tmp_path)).collect()
    got = {r.p_partkey: r.value_u for r in rows}
    total = 60000 + 6000
    # replay the exact threshold value_u * DEN > total
    assert got == {p: v for p, v in [(100, 60000), (200, 6000)]
                   if v * _Q11_FRACTION_DEN > total}
    assert 100 in got and 200 in got  # both clear the 1/1000 bar here


def test_shipmode_priority_synthesized_mode(spark, tmp_path):
    from mapbox_filter_spark.queries_relational import q_shipmode_priority
    d = dt.datetime
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_orderdate timestamp, "
           "o_orderpriority string",
           [(1, d(1997, 1, 1), "1-URGENT"),
            (2, d(1997, 1, 1), "5-LOW")])
    late = d(1997, 6, 1)
    _write(spark, tmp_path, "lineitem",
           "l_orderkey long, l_suppkey long, l_shipdate timestamp",
           [(1, 3, late),      # pmod 0 -> MAIL, high
            (1, 4, late),      # pmod 1 -> SHIP, high
            (2, 6, late),      # pmod 0 -> MAIL, low
            (2, 6, d(1997, 1, 20))])  # not late -> dropped
    rows = q_shipmode_priority(spark, str(tmp_path)).collect()
    got = {r.ship_mode: (r.high_line_count, r.low_line_count)
           for r in rows}
    assert got == {"MAIL": (1, 1), "SHIP": (1, 0)}


def test_market_share_single_division(spark, tmp_path):
    from mapbox_filter_spark.queries_relational import q_market_share
    d = dt.datetime
    _write(spark, tmp_path, "region", "r_regionkey int, r_name string",
           [(2, "ASIA")])
    _write(spark, tmp_path, "nation",
           "n_nationkey int, n_name string, n_regionkey int",
           [(3, "NATION_3", 2), (4, "NATION_4", 2)])
    _write(spark, tmp_path, "customer",
           "c_custkey long, c_nationkey int", [(1, 3)])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_nationkey int", [(10, 3), (20, 4)])
    _write(spark, tmp_path, "part", "p_partkey long, p_type string",
           [(100, "ECONOMY")])
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long, o_orderdate timestamp",
           [(1, 1, d(1996, 5, 1))])
    _write(spark, tmp_path, "lineitem",
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_extendedprice double, l_discount double",
           [(1, 100, 10, 30.0, 0.0),     # NATION_3: 300000
            (1, 100, 20, 10.0, 0.0)])    # other:    100000
    rows = q_market_share(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.o_year, r.nation_vol_u, r.total_vol_u) == \
        (1996, 300000, 400000)
    assert r.share == 300000 / 400000
