"""TPC-H completion block: the 15 query shapes (Q2, Q6-Q12, Q14-Q16,
Q18-Q21) not already covered by queries_ext (Q1 agg_pricing, Q3
top_orders, Q4 late_orders, Q5 regional_volume, Q13 custdist, Q17
small_qty_revenue, Q22 idle_customers).  Together the 22 canonical
TPC-H access shapes are all represented.

Shapes are ADAPTED to the driver's reduced schema (no partsupp table,
no l_commitdate / l_receiptdate / l_shipmode / l_shipinstruct /
p_container / p_mfgr / comments):

- the part↔supplier relationship (Q2/Q11/Q16/Q20) is DERIVED from
  lineitem as DISTINCT (l_partkey, l_suppkey) with per-pair cost
  aggregates — the join/argmin/semi-join shapes are identical;
- Q4's lateness adaptation (`l_shipdate > o_orderdate + K days`)
  stands in everywhere receipt/commit lateness is needed (Q12, Q21);
- Q12's ship mode is the deterministic synthesized column
  `pmod(l_suppkey, 3) → MAIL/SHIP/AIR` (documented, cross-engine);
- Q19's container predicate is replaced by a p_size range — the
  disjunction-of-conjunctions pushdown shape is what matters.

Every monetary value uses the exact-integer conventions shared with
queries_ext: `price_c = floor(extprice·100 + 0.5)` cents,
`rev_u = price_c · (100 − disc_pct)`, quantities cast to bigint.  All
sums/compares are on int64 (DECIMAL38-free here: at sf1000 the largest
sum is ≈ 6e9 lineitems · ~1e9 rev_u grouped by ≥25 nations ≈ 2.4e17
per group — inside int64; single-row totals Q6/Q14/Q19 are filtered
to ≪1% of rows first).  The only doubles are the final single
divisions of two exact ints (Q8 share, Q14 promo pct) — one IEEE-754
op, bit-identical cross-engine.

Reference parity: the reference engine (ondrap/mapbox-filter,
src/Mapbox/*.hs) has no relational layer; this block exists for the
generalized analytics surface (SURVEY.md §2.5 breadth), modeled on the
published TPC-H specification (public domain, tpc.org).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .queries_curation import _CENTS_SQL, _cents
from .queries_ext import _price_c, _rev_u, _SQL_REV_U

# SQL cents spellings DERIVED from the one canonical template
# (queries_curation._CENTS_SQL) so they cannot drift from the engine
# quantizer — the single-definition rule that helper documents
_SQL_PRICE_C = _CENTS_SQL.replace("value", "l_extendedprice")
_SQL_DISC_P = _CENTS_SQL.replace("value", "l_discount")


def _li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _bal_c(col):
    """Signed cents — THE canonical quantizer (queries_curation._cents;
    floor(x·100+0.5) is half-up toward +inf for negatives too, still
    deterministic cross-engine since floor is toward −inf in both
    Spark and DuckDB)."""
    return _cents(col)


def _sql_bal_c(col):
    return _CENTS_SQL.replace("value", col)


# ---------------------------------------------------------------- Q6
_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): single-scan
    filter+aggregate — every predicate (shipdate range, discount band,
    quantity cap) is scan-pushable, so the plan is one parquet scan
    with PushedFilters feeding a two-value partial aggregate; no
    shuffle beyond the 1-row final agg.  discount_rev_u is the exact
    integer Σ price_c·disc_pct."""
    li = _li(spark, sf_dir)
    disc_p = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        li.filter((F.col("l_shipdate") >= F.lit(_Q6_LO))
                  & (F.col("l_shipdate") < F.lit(_Q6_HI))
                  & (F.col("l_discount") >= 0.045)
                  & (F.col("l_discount") <= 0.075)
                  & (F.col("l_quantity") < 24))
        .agg(F.sum(_price_c() * disc_p).alias("discount_rev_u"),
             F.count(F.lit(1)).alias("n_lines")))


def sql_forecast_revenue() -> str:
    return f"""SELECT
  CAST(SUM({_SQL_PRICE_C} * {_SQL_DISC_P}) AS BIGINT) AS discount_rev_u,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{_Q6_HI} 00:00:00'
  AND l_discount >= 0.045 AND l_discount <= 0.075
  AND l_quantity < 24"""


# ---------------------------------------------------------------- Q7
_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"
_Q7_LO, _Q7_HI = "1996-01-01", "1998-01-01"


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the two-direction nation-pair
    filter ((supp=N1 ∧ cust=N2) ∨ (supp=N2 ∧ cust=N1)).  supplier and
    nation are broadcast; customer joins orders on the shuffle key
    both sides already carry; the pair predicate is applied AFTER both
    nation names are in scope (it is inherently cross-input, not
    pushable).  Exact rev_u per (supp_nation, cust_nation, year)."""
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit(_Q7_LO))
        & (F.col("l_shipdate") < F.lit(_Q7_HI))) \
        .select("l_orderkey", "l_suppkey",
                F.year("l_shipdate").alias("l_year"),
                _rev_u().alias("rev_u"))
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q7_N1, _Q7_N2))
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cus = _t(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")) \
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(cus, o.o_custkey == cus.c_custkey)
         .filter(((F.col("supp_nation") == _Q7_N1)
                  & (F.col("cust_nation") == _Q7_N2))
                 | ((F.col("supp_nation") == _Q7_N2)
                    & (F.col("cust_nation") == _Q7_N1))))
    return (j.groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum("rev_u").alias("volume_u"),
                 F.count(F.lit(1)).alias("n_lines")))


def sql_nation_trade_volume() -> str:
    return f"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM({_SQL_REV_U}) AS BIGINT) AS volume_u,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q7_LO} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{_Q7_HI} 00:00:00'
  AND ((sn.n_name = '{_Q7_N1}' AND cn.n_name = '{_Q7_N2}')
    OR (sn.n_name = '{_Q7_N2}' AND cn.n_name = '{_Q7_N1}'))
GROUP BY 1, 2, 3"""


# ---------------------------------------------------------------- Q8
_Q8_NATION = "NATION_3"
_Q8_REGION = "ASIA"
_Q8_TYPE = "ECONOMY"
_Q8_LO, _Q8_HI = "1996-01-01", "1998-01-01"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): conditional-sum ratio
    per order year — numerator and denominator both exact int64
    (share itself is ONE pinned division of the two).  part (type
    filter), supplier+nation, and nation+region are broadcast; the
    only shuffle joins are lineitem⋈orders and orders⋈customer."""
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_u().alias("rev_u"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE) \
        .select("p_partkey")
    nat = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    rnat = nat.join(F.broadcast(reg),
                    F.col("n_regionkey") == F.col("r_regionkey")) \
        .select(F.col("n_nationkey").alias("rn_key"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_LO))
        & (F.col("o_orderdate") < F.lit(_Q8_HI))) \
        .select("o_orderkey", "o_custkey",
                F.year("o_orderdate").alias("o_year"))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(rnat), c.c_nationkey == F.col("rn_key")))
    agg = j.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == _Q8_NATION,
                     F.col("rev_u")).otherwise(F.lit(0).cast("long")))
        .alias("nation_vol_u"),
        F.sum("rev_u").alias("total_vol_u"))
    return agg.select(
        "o_year", "nation_vol_u", "total_vol_u",
        (F.col("nation_vol_u").cast("double")
         / F.col("total_vol_u").cast("double")).alias("share"))


def sql_market_share() -> str:
    return f"""WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         sn.n_name AS supp_nation,
         {_SQL_REV_U} AS rev_u
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{_Q8_TYPE}'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
                AND r.r_name = '{_Q8_REGION}'
  WHERE o.o_orderdate >= TIMESTAMP '{_Q8_LO} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{_Q8_HI} 00:00:00')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev_u
                     ELSE 0 END) AS BIGINT) AS nation_vol_u,
       CAST(SUM(rev_u) AS BIGINT) AS total_vol_u,
       CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev_u
                     ELSE 0 END) AS DOUBLE)
         / CAST(SUM(rev_u) AS DOUBLE) AS share
FROM j GROUP BY 1"""


# ---------------------------------------------------------------- Q9
_Q9_TOKEN = "gear"


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit_u = rev_u −
    retail_c·qty (p_retailprice stands in for ps_supplycost — no
    partsupp table; the join/agg shape is unchanged).  The p_name
    LIKE '%token%' part filter and supplier⋈nation are broadcast;
    profit can be negative (signed int64).  Grouped by supplier
    nation × ship year."""
    li = _li(spark, sf_dir)
    p = _t(spark, sf_dir, "part") \
        .filter(F.col("p_name").contains(_Q9_TOKEN)) \
        .select("p_partkey",
                _bal_c("p_retailprice").alias("retail_c"))
    nat = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", "n_name")
    j = (li.select("l_partkey", "l_suppkey",
                   F.year("l_shipdate").alias("l_year"),
                   F.col("l_quantity").cast("long").alias("qty"),
                   _rev_u().alias("rev_u"))
         .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
         .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey))
    return (j.groupBy(F.col("n_name").alias("nation"), "l_year")
            .agg(F.sum(F.col("rev_u") - F.col("retail_c") * F.col("qty"))
                 .alias("profit_u"),
                 F.count(F.lit(1)).alias("n_lines")))


def sql_product_profit() -> str:
    return f"""SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM({_SQL_REV_U}
                - {_sql_bal_c('p.p_retailprice')}
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_u,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
            AND p.p_name LIKE '%{_Q9_TOKEN}%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2"""


# --------------------------------------------------------------- Q10
_Q10_LO, _Q10_HI = "1997-01-01", "1997-04-01"
_Q10_K = 20


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): one quarter of
    orders ⋈ returned lineitems (both filters pushed to the scans),
    customer attributes joined AFTER the per-customer aggregate (the
    agg output is ≤|customer| rows, so the attribute join is
    broadcast-sized), nation broadcast; deterministic top-20 via
    TakeOrdered (revenue DESC, custkey ASC)."""
    li = _li(spark, sf_dir).filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey", _rev_u().alias("rev_u"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO))
        & (F.col("o_orderdate") < F.lit(_Q10_HI))) \
        .select("o_orderkey", "o_custkey")
    agg = (li.join(o, li.l_orderkey == o.o_orderkey)
           .groupBy("o_custkey")
           .agg(F.sum("rev_u").alias("revenue_u"),
                F.count(F.lit(1)).alias("n_lines")))
    nat = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")) \
        .select("c_custkey", "c_name",
                _bal_c("c_acctbal").alias("acctbal_c"), "n_name")
    out = agg.join(c, agg.o_custkey == c.c_custkey)
    return (out.orderBy(F.col("revenue_u").desc(), F.col("c_custkey"))
            .limit(_Q10_K)
            .select("c_custkey", "c_name", "acctbal_c", "n_name",
                    "revenue_u", "n_lines"))


def sql_returned_revenue() -> str:
    return f"""WITH agg AS (
  SELECT o.o_custkey,
         CAST(SUM({_SQL_REV_U}) AS BIGINT) AS revenue_u,
         count(*) AS n_lines
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{_Q10_LO} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{_Q10_HI} 00:00:00'
  GROUP BY 1)
SELECT c.c_custkey, c.c_name,
       {_sql_bal_c('c.c_acctbal')} AS acctbal_c,
       n.n_name, a.revenue_u, a.n_lines
FROM agg a
JOIN customer c ON a.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
QUALIFY ROW_NUMBER() OVER (ORDER BY a.revenue_u DESC, c.c_custkey)
        <= {_Q10_K}"""


# --------------------------------------------------------------- Q12
_Q12_LO, _Q12_HI = "1997-01-01", "1998-01-01"
_Q12_LATE_DAYS = 45
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): ship mode
    is the documented synthesized column pmod(l_suppkey,3) →
    MAIL/SHIP/AIR (the driver schema has no l_shipmode); "late" is
    the Q4-style adaptation l_shipdate > o_orderdate + 45 days.
    Counts of high- vs low-priority LATE lines per mode — the
    conditional-aggregate shape of the original."""
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit(_Q12_LO))
        & (F.col("l_shipdate") < F.lit(_Q12_HI))) \
        .select("l_orderkey", "l_shipdate",
                F.element_at(
                    F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("AIR")),
                    (F.pmod(F.col("l_suppkey"), F.lit(3)) + 1).cast("int"))
                .alias("ship_mode"))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .filter(F.col("l_shipdate")
                 > F.col("o_orderdate")
                 + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAYS")))
    hi = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (j.groupBy("ship_mode")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(hi, 0).otherwise(1)).cast("long")
                 .alias("low_line_count")))


def sql_shipmode_priority() -> str:
    hi = ", ".join(f"'{p}'" for p in _Q12_HIGH)
    return f"""SELECT
  ['MAIL','SHIP','AIR'][CAST((l.l_suppkey % 3) + 1 AS INT)] AS ship_mode,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ({hi}) THEN 1 ELSE 0 END)
       AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ({hi}) THEN 0 ELSE 1 END)
       AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{_Q12_HI} 00:00:00'
  AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
GROUP BY 1"""


# --------------------------------------------------------------- Q14
_Q14_LO, _Q14_HI = "1997-03-01", "1997-04-01"
_Q14_TYPE = "PROMO"


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one month of lineitems ⋈
    broadcast part, conditional sum over p_type — promo_rev_u and
    total_rev_u exact int64, promo_pct the ONE pinned division
    (100·promo/total)."""
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit(_Q14_LO))
        & (F.col("l_shipdate") < F.lit(_Q14_HI))) \
        .select("l_partkey", _rev_u().alias("rev_u"))
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    agg = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .agg(F.sum(F.when(F.col("p_type") == _Q14_TYPE,
                             F.col("rev_u"))
                      .otherwise(F.lit(0).cast("long")))
                .alias("promo_rev_u"),
                F.sum("rev_u").alias("total_rev_u")))
    return agg.select(
        "promo_rev_u", "total_rev_u",
        (F.lit(100.0) * F.col("promo_rev_u").cast("double")
         / F.col("total_rev_u").cast("double")).alias("promo_pct"))


def sql_promo_revenue() -> str:
    return f"""WITH j AS (
  SELECT CASE WHEN p.p_type = '{_Q14_TYPE}'
              THEN {_SQL_REV_U} ELSE 0 END AS promo_u,
         {_SQL_REV_U} AS rev_u
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{_Q14_HI} 00:00:00')
SELECT CAST(SUM(promo_u) AS BIGINT) AS promo_rev_u,
       CAST(SUM(rev_u) AS BIGINT) AS total_rev_u,
       100.0 * CAST(SUM(promo_u) AS DOUBLE)
             / CAST(SUM(rev_u) AS DOUBLE) AS promo_pct
FROM j"""


# --------------------------------------------------------------- Q19
_Q19_ARMS = (("Brand#12", 1, 5, 1, 11),
             ("Brand#23", 1, 10, 10, 20),
             ("Brand#34", 1, 15, 20, 30))


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    the OR-of-three-conjunctions across BOTH join inputs (brand+size
    from part, quantity from lineitem).  part is broadcast; the
    per-side halves of each arm (brand/size on part, quantity bounds
    on lineitem) are separately pushable and the cross-input residual
    is evaluated in the join — the classic Q19 optimizer shape.
    Single exact-revenue row."""
    li = _li(spark, sf_dir).select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"),
        _rev_u().alias("rev_u"))
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = None
    for brand, slo, shi, qlo, qhi in _Q19_ARMS:
        a = ((F.col("p_brand") == brand)
             & F.col("p_size").between(slo, shi)
             & F.col("qty").between(qlo, qhi))
        arm = a if arm is None else (arm | a)
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(arm)
    return j.agg(F.sum("rev_u").alias("revenue_u"),
                 F.count(F.lit(1)).alias("n_lines"))


def sql_disjunctive_revenue() -> str:
    arms = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19_ARMS)
    return f"""SELECT CAST(SUM({_SQL_REV_U}) AS BIGINT) AS revenue_u,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {arms}"""


# ---------------------------------------------------------------- Q2
_Q2_TYPE = "STANDARD"
_Q2_SIZE_MAX = 5
_Q2_REGION = "EUROPE"
_Q2_K = 100


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated
    MIN-subquery.  The part↔supplier relation is derived from lineitem
    (DISTINCT pair, cost_u = MIN extended-price cents — no partsupp
    table).  The per-part argmin is a window MIN over p_partkey (one
    keyed exchange — NOT a self-join back), ties kept like the
    original; region-filtered suppliers and the part filter are
    broadcast.  Deterministic top-100: acctbal_c DESC, suppkey,
    partkey."""
    ps = (_li(spark, sf_dir)
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.min(_price_c()).alias("cost_u")))
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == _Q2_TYPE)
        & (F.col("p_size") <= _Q2_SIZE_MAX)).select("p_partkey")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    nat = _t(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", "s_name",
                _bal_c("s_acctbal").alias("acctbal_c"), "n_name")
    elig = (ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
            .join(F.broadcast(sup), ps.l_suppkey == sup.s_suppkey))
    w = W.partitionBy("l_partkey")
    best = (elig.withColumn("min_cost_u", F.min("cost_u").over(w))
            .filter(F.col("cost_u") == F.col("min_cost_u")))
    return (best.orderBy(F.col("acctbal_c").desc(), "s_suppkey",
                         "l_partkey")
            .limit(_Q2_K)
            .select("s_suppkey", "s_name", "acctbal_c", "n_name",
                    F.col("l_partkey").alias("p_partkey"), "cost_u"))


def sql_min_cost_supplier() -> str:
    return f"""WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(MIN({_SQL_PRICE_C}) AS BIGINT) AS cost_u
  FROM lineitem GROUP BY 1, 2),
elig AS (
  SELECT s.s_suppkey, s.s_name,
         {_sql_bal_c('s.s_acctbal')} AS acctbal_c,
         n.n_name, ps.l_partkey AS p_partkey, ps.cost_u,
         MIN(ps.cost_u) OVER (PARTITION BY ps.l_partkey) AS min_cost_u
  FROM ps
  JOIN part p ON ps.l_partkey = p.p_partkey
             AND p.p_type = '{_Q2_TYPE}' AND p.p_size <= {_Q2_SIZE_MAX}
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
               AND r.r_name = '{_Q2_REGION}')
SELECT s_suppkey, s_name, acctbal_c, n_name, p_partkey, cost_u
FROM elig WHERE cost_u = min_cost_u
QUALIFY ROW_NUMBER() OVER (ORDER BY acctbal_c DESC, s_suppkey,
                           p_partkey) <= {_Q2_K}"""


# --------------------------------------------------------------- Q11
_Q11_NATION = "NATION_5"
_Q11_FRACTION_DEN = 1000    # keep parts with value_u·DEN > total_u


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): HAVING against a scalar
    subquery.  Per-part value (Σ price_c·qty over one nation's
    suppliers) vs fraction of the grand total — the total is a 1-row
    broadcast crossJoin and the threshold is the exact cross-multiply
    value_u·1000 > total_u (no float fraction).  Supplier set is a
    broadcast semi-filter."""
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == _Q11_NATION)
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey")
    li = _li(spark, sf_dir).select(
        "l_partkey", "l_suppkey",
        (_price_c() * F.col("l_quantity").cast("long")).alias("val_u"))
    vals = (li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey,
                    "leftsemi")
            .groupBy("l_partkey")
            .agg(F.sum("val_u").alias("value_u")))
    total = vals.agg(F.sum("value_u").alias("total_u"))
    return (vals.crossJoin(F.broadcast(total))
            .filter(F.col("value_u") * _Q11_FRACTION_DEN
                    > F.col("total_u"))
            .select(F.col("l_partkey").alias("p_partkey"), "value_u"))


def sql_important_parts() -> str:
    return f"""WITH vals AS (
  SELECT l.l_partkey AS p_partkey,
         CAST(SUM({_SQL_PRICE_C} * CAST(l.l_quantity AS BIGINT))
              AS BIGINT) AS value_u
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
               AND n.n_name = '{_Q11_NATION}'
  GROUP BY 1)
SELECT p_partkey, value_u FROM vals
WHERE value_u * {_Q11_FRACTION_DEN} > (SELECT SUM(value_u) FROM vals)"""


# --------------------------------------------------------------- Q15
_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): revenue view + scalar-MAX
    equality join-back, ties included (the original's correlated
    = (SELECT MAX(...)) semantics).  The per-supplier aggregate is the
    only fact-sized shuffle; the MAX is a 1-row broadcast."""
    rev = (_li(spark, sf_dir)
           .filter((F.col("l_shipdate") >= F.lit(_Q15_LO))
                   & (F.col("l_shipdate") < F.lit(_Q15_HI)))
           .groupBy("l_suppkey")
           .agg(F.sum(_rev_u()).alias("total_rev_u")))
    mx = rev.agg(F.max("total_rev_u").alias("max_rev_u"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev_u") == F.col("max_rev_u"))
            .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
            .select("s_suppkey", "s_name", "total_rev_u"))


def sql_top_supplier() -> str:
    return f"""WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_SQL_REV_U}) AS BIGINT) AS total_rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{_Q15_HI} 00:00:00'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_rev_u
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev_u = (SELECT MAX(total_rev_u) FROM rev)"""


# --------------------------------------------------------------- Q16
_Q16_EXCL_BRAND = "Brand#1"
_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
_Q16_COMPLAINT_MOD = 13   # suppliers with s_suppkey % 13 == 0 excluded


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT
    suppliers per (brand, type, size) over the derived part↔supplier
    pairs, minus the NOT-IN "complaints" supplier set (adapted to the
    deterministic pmod(s_suppkey,13)=0 set — no comment column; the
    LeftAnti shape is the point).  part filter broadcast; the distinct
    pair projection is the only fact-sized shuffle."""
    pairs = (_li(spark, sf_dir)
             .select("l_partkey", "l_suppkey").distinct())
    bad = _t(spark, sf_dir, "supplier").filter(
        F.pmod(F.col("s_suppkey"), F.lit(_Q16_COMPLAINT_MOD)) == 0) \
        .select("s_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_EXCL_BRAND)
        & F.col("p_size").isin(*_Q16_SIZES)) \
        .select("p_partkey", "p_brand", "p_type", "p_size")
    j = (pairs.join(F.broadcast(bad),
                    pairs.l_suppkey == bad.s_suppkey, "left_anti")
         .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey))
    return (j.groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def sql_supplier_part_counts() -> str:
    sizes = ", ".join(str(s) for s in _Q16_SIZES)
    return f"""WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs pr
JOIN part p ON pr.l_partkey = p.p_partkey
WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
  AND p.p_size IN ({sizes})
  AND pr.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    WHERE s_suppkey % {_Q16_COMPLAINT_MOD} = 0)
GROUP BY 1, 2, 3"""


# --------------------------------------------------------------- Q18
_Q18_QTY = 300
_Q18_K = 100


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over a grouped
    HAVING — the per-order quantity aggregate qualifies orderkeys,
    then joins back order+customer attributes.  The qualifying set is
    tiny (HAVING > 300 keeps <1%), so the attribute joins are
    broadcast-sized; deterministic top-100 via TakeOrdered."""
    oq = (_li(spark, sf_dir)
          .groupBy("l_orderkey")
          .agg(F.sum(F.col("l_quantity").cast("long"))
               .alias("total_qty"))
          .filter(F.col("total_qty") > _Q18_QTY))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("order_us"))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = (oq.join(o, oq.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    return (j.orderBy(F.col("total_qty").desc(), F.col("l_orderkey"))
            .limit(_Q18_K)
            .select("c_custkey", "c_name",
                    F.col("l_orderkey").alias("o_orderkey"),
                    "order_us", "total_qty"))


def sql_big_orders() -> str:
    return f"""WITH oq AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING total_qty > {_Q18_QTY})
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       epoch_us(o.o_orderdate) AS order_us, oq.total_qty
FROM oq
JOIN orders o ON oq.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
QUALIFY ROW_NUMBER() OVER (ORDER BY oq.total_qty DESC, o.o_orderkey)
        <= {_Q18_K}"""


# --------------------------------------------------------------- Q20
_Q20_TYPE = "PROMO"
_Q20_LO, _Q20_HI = "1997-01-01", "1998-01-01"
_Q20_QTY = 350
_Q20_REGION = "ASIA"


def q_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested
    semi-join chain — partkeys from a part filter, per-supplier
    shipped quantity of those parts over a year HAVING > threshold
    (stands in for the partsupp availqty comparison), then supplier
    LEFT SEMI the qualifying set, region-filtered.  Output is the
    supplier list (the original's projection)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q20_TYPE) \
        .select("p_partkey")
    qual = (_li(spark, sf_dir)
            .filter((F.col("l_shipdate") >= F.lit(_Q20_LO))
                    & (F.col("l_shipdate") < F.lit(_Q20_HI)))
            .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey,
                  "leftsemi")
            .groupBy("l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
            .filter(F.col("qty") > _Q20_QTY)
            .select("l_suppkey"))
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q20_REGION)
    nat = _t(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select("s_suppkey", "s_name", "n_name")
    return sup.join(F.broadcast(qual),
                    sup.s_suppkey == F.col("l_suppkey"), "leftsemi") \
        .select("s_suppkey", "s_name", "n_name")


def sql_promotion_suppliers() -> str:
    return f"""SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
             AND r.r_name = '{_Q20_REGION}'
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_type = '{_Q20_TYPE}')
    AND l_shipdate >= TIMESTAMP '{_Q20_LO} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{_Q20_HI} 00:00:00'
  GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q20_QTY})"""


# --------------------------------------------------------------- Q21
_Q21_LATE_DAYS = 60
_Q21_K = 100


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS + NOT-EXISTS pair over the same fact table, re-expressed as
    ONE per-(order, supplier) aggregate + a per-order rollup — an
    order qualifies iff >1 distinct suppliers AND exactly one of them
    is late ("late" = Q4-style l_shipdate > o_orderdate + 60 days,
    o_orderstatus = 'F'); the sole late supplier scores its late
    lines.  Three keyed shuffles total (order+supp agg, order rollup,
    supplier score) — no self-joins of lineitem against itself.
    Deterministic top-100: numwait DESC, suppkey ASC."""
    o = _t(spark, sf_dir, "orders") \
        .filter(F.col("o_orderstatus") == "F") \
        .select("o_orderkey", "o_orderdate")
    li = _li(spark, sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late",
        (F.col("l_shipdate")
         > F.col("o_orderdate")
         + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS")).cast("int"))
    per_os = (j.groupBy("l_orderkey", "l_suppkey")
              .agg(F.sum("late").alias("late_lines")))
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("late_lines") > 0, 1).otherwise(0))
        .alias("n_late_supp"))
    qual = (per_os.filter(F.col("late_lines") > 0)
            .join(per_o.filter((F.col("n_supp") > 1)
                               & (F.col("n_late_supp") == 1)),
                  "l_orderkey"))
    scored = (qual.groupBy("l_suppkey")
              .agg(F.sum("late_lines").alias("numwait"),
                   F.count(F.lit(1)).alias("n_orders")))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (scored.join(F.broadcast(sup),
                        scored.l_suppkey == sup.s_suppkey)
            .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
            .limit(_Q21_K)
            .select("s_suppkey", "s_name", "numwait", "n_orders"))


def sql_waiting_suppliers() -> str:
    return f"""WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate
                            + INTERVAL {_Q21_LATE_DAYS} DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS late_lines
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
               AND o.o_orderstatus = 'F'
  GROUP BY 1, 2),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp,
         SUM(CASE WHEN late_lines > 0 THEN 1 ELSE 0 END) AS n_late_supp
  FROM per_os GROUP BY 1),
scored AS (
  SELECT ps.l_suppkey,
         CAST(SUM(ps.late_lines) AS BIGINT) AS numwait,
         count(*) AS n_orders
  FROM per_os ps
  JOIN per_o po ON ps.l_orderkey = po.l_orderkey
               AND po.n_supp > 1 AND po.n_late_supp = 1
  WHERE ps.late_lines > 0
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, sc.numwait, sc.n_orders
FROM scored sc JOIN supplier s ON sc.l_suppkey = s.s_suppkey
QUALIFY ROW_NUMBER() OVER (ORDER BY sc.numwait DESC, s.s_suppkey)
        <= {_Q21_K}"""


RELATIONAL_QUERIES = {
    "forecast_revenue": (q_forecast_revenue, sql_forecast_revenue),
    "nation_trade_volume": (q_nation_trade_volume, sql_nation_trade_volume),
    "market_share": (q_market_share, sql_market_share),
    "product_profit": (q_product_profit, sql_product_profit),
    "returned_revenue": (q_returned_revenue, sql_returned_revenue),
    "shipmode_priority": (q_shipmode_priority, sql_shipmode_priority),
    "promo_revenue": (q_promo_revenue, sql_promo_revenue),
    "disjunctive_revenue": (q_disjunctive_revenue, sql_disjunctive_revenue),
    "min_cost_supplier": (q_min_cost_supplier, sql_min_cost_supplier),
    "important_parts": (q_important_parts, sql_important_parts),
    "top_supplier": (q_top_supplier, sql_top_supplier),
    "supplier_part_counts": (q_supplier_part_counts,
                             sql_supplier_part_counts),
    "big_orders": (q_big_orders, sql_big_orders),
    "promotion_suppliers": (q_promotion_suppliers,
                            sql_promotion_suppliers),
    "waiting_suppliers": (q_waiting_suppliers, sql_waiting_suppliers),
}
