"""TPC-H-shape OLAP battery II (round 4): the join-planning shapes beyond
the Q1/Q3/Q5/Q10 already declared in ``core_queries`` — semi/anti joins,
self-joined dimensions, conditional aggregation, disjunctive multi-column
predicates, scalar-subquery thresholds, and HAVING-gated IN subqueries.

The canonical queries are adapted to the driver schema (no ``partsupp``,
no ``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns): each keeps
the *plan shape* that makes the original a planner benchmark, with the
predicate rewritten onto available columns.

Determinism rules (plans/queries.py): money math in exact DECIMAL summed
then cast to DOUBLE; counts as BIGINT; identical aliases both sides.
``l_quantity`` is an integral-valued double (1..50), so double sums over
it are exact and order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bicis_spark.plans.queries import register
from bicis_spark.sources.io import read_table


def _volume() -> F.Column:
    """Exact-decimal revenue term: price · (1 − discount)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


_VOL_SQL = (
    "CAST(l.l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l.l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS-correlated semi-join with a non-equi term in the
# correlation (late shipments instead of commit<receipt)
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("q4_order_priority", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority census of orders with at least one late
    line (shipped >90 days after order). The EXISTS compiles to a LEFT
    SEMI hash join on l_orderkey — the duplicate-free probe shape — with
    the non-equi lateness term evaluated inside the join, and the
    quarter filter pushed to the orders scan. Scale: the semi join
    outputs at most one row per order regardless of line fan-out, and
    the 5-group aggregate is map-side combined."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q7 shape: self-joined nation dimension (supplier nation ⨯ customer nation)
# ---------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_VOL_SQL} AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", _Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    The nation dimension joins TWICE under different roles (supplier side,
    customer side) — both broadcast, as does supplier; the nation-pair
    disjunction applies after both broadcasts so only the two fact joins
    shuffle. The supplier-side nation filter prunes suppliers before the
    lineitem join probes them."""
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    joined = (
        s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _volume().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share (conditional share of a revenue aggregate)
# ---------------------------------------------------------------------------

_Q8_SQL = f"""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE)
       / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {_VOL_SQL} AS volume,
           n1.n_name AS nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r ON n2.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_type = 'MEDIUM'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue for a part
    class, by order year. The share is two exact-DECIMAL sums over the
    SAME joined pass (a conditional numerator riding the full aggregate —
    no second scan), divided as doubles only at the end. NULL-ELSE CASE
    keeps the numerator type exactly the denominator's. part (filtered
    1/6), supplier, and both nation roles broadcast; region prunes the
    customer-nation side before any fact shuffle."""
    p = read_table(spark, sf_dir, "part").where(F.col("p_type") == "MEDIUM")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    s = read_table(spark, sf_dir, "supplier")
    euro_nations = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("n2_key")
        )
    )
    supp_nation = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
        )
    )
    vol = _volume().alias("volume")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(euro_nations, c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(supp_nation, s.s_nationkey == F.col("n1_key"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"), vol, "nation")
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q12 shape: join + two-way conditional aggregation on a flag column
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag = 'R'
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@register("q12_priority_lines", _Q12_SQL)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: urgent-vs-other order counts per line status
    (shipmode in the canonical query; the driver schema has no shipmode).
    Both lineitem predicates push to the scan; the priority split is one
    conditional aggregation over a single joined pass — never two scans."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share (single-pass conditional ratio)
# ---------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_VOL_SQL} END) AS DOUBLE)
       * 100.0
       / CAST(sum({_VOL_SQL}) AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from promo
    parts. One broadcast join + one grand aggregate carrying both the
    conditional and total DECIMAL sums; the ratio is computed once on the
    two exact sums (numerator ×100 before the divide, same operand order
    as the oracle)."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    vol = _volume()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
                * F.lit(100.0)
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: argmax via scalar subquery over a derived revenue view
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
WITH revenue AS (
    SELECT l.l_suppkey AS supplier_no,
           sum({_VOL_SQL}) AS total_revenue
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The revenue view aggregates once; the scalar max is a 1-row aggregate
    broadcast back as a cross-join filter (the repo's standard
    bounds-attach pattern) — the view is NOT recomputed for the subquery.
    Equality compares exact DECIMAL totals, so ties are bit-exact."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_volume()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-count census over a bridge join with NOT-predicates
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_census", _Q16_SQL)
def q16_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) bucket — lineitem standing in for partsupp as the
    part↔supplier bridge. The NOT/IN predicates all push to the part
    scan; countDistinct expands to the standard two-phase plan (distinct
    (group, suppkey) pre-aggregate, then count) so the shuffle carries
    deduped pairs bounded by buckets × suppliers, not bridge rows."""
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-gated IN subquery over the same fact table
# ---------------------------------------------------------------------------

_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q18_large_orders", _Q18_SQL)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (line quantity sum over a
    threshold). The IN subquery becomes a LEFT SEMI join against the
    HAVING-filtered aggregate — the filtered key set is tiny (the >250
    tail), so at scale it broadcasts and prunes orders before the
    customer join. l_quantity is integral-valued, so its double sum is
    exact; top-100 is TakeOrderedAndProject on (totalprice, key)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 250)
        .select("l_orderkey")
    )
    o_big = o.join(
        F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi"
    )
    return (
        c.join(o_big, c.c_custkey == o_big.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive multi-column predicates
# ---------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT CAST(sum({_VOL_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", _Q19_SQL)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR-ed (brand, size, quantity)
    bands — the classic disjunctive-predicate planning test. The single-
    table residues each side CAN satisfy push down (brand ∈ {{12,23,34}},
    size ≤ 35, quantity between 1 and 30 — the OR-of-conjuncts' per-column
    envelopes), pruning both scans before the join evaluates the full
    disjunction."""
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    p = read_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 35)
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + NOT EXISTS anti join
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH thresh AS (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
"""


@register("q22_dormant_customers", _Q22_SQL)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered, by
    nation. The above-average threshold is a 1-row exact-DECIMAL aggregate
    attached via broadcast cross-join (sum/count, never a float avg — the
    division happens once on exact operands); NOT EXISTS is a LEFT ANTI
    join probing the orders key set. At scale the anti join's build side
    reduces to distinct o_custkey before the shuffle."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(bal).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q6 shape: multi-predicate filtered grand aggregate
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * CAST(l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_discount BETWEEN 0.05 AND 0.07
  AND l.l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical scan-dominated query — every predicate
    (date range, discount band, quantity cap) pushes into the parquet
    scan, zero joins, one map-side-combined grand aggregate. At 100 TB
    this is pure scan bandwidth; the plan must show PushedFilters on all
    three columns and a single partial/final agg pair."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group average subquery
# ---------------------------------------------------------------------------

_Q17_SQL = """
WITH part_avg AS (
    SELECT l_partkey,
           CAST(sum(l_quantity) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_type = 'SMALL'
  AND l.l_quantity < 0.2 * a.avg_qty
"""


@register("q17_small_quantity_revenue", _Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one part
    class. The correlated AVG subquery decorrelates into a per-part
    aggregate joined back to the fact — Spark expresses that directly
    (aggregate once, join once, never re-scan per row). The average is
    sum/count on exact operands (l_quantity sums are exact integral
    doubles), so the 0.2·avg comparison is bitwise both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("_ak")).agg(
        (
            F.sum("l_quantity").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("_ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS against the same fact (sole-blame filter)
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH late AS (
    SELECT l_orderkey, l_suppkey,
           (l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM (
    SELECT DISTINCT a.l_orderkey, a.l_suppkey
    FROM late a
    WHERE a.is_late
      AND EXISTS (SELECT 1 FROM late b
                  WHERE b.l_orderkey = a.l_orderkey
                    AND b.l_suppkey <> a.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late c
                      WHERE c.l_orderkey = a.l_orderkey
                        AND c.l_suppkey <> a.l_suppkey
                        AND c.is_late)
) blamed
JOIN supplier s ON s.s_suppkey = blamed.l_suppkey
GROUP BY s.s_name
"""


@register("q21_waiting_supplier", _Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers SOLELY to blame for late multi-supplier
    orders (their line late >60 days, at least one other supplier on the
    order, no other supplier late). The EXISTS / NOT-EXISTS pair over the
    same fact rewrites to ONE per-order aggregate — distinct supplier
    count and distinct late-supplier count — joined back: three passes in
    the canonical form, one aggregation here, same answer. Spark-first:
    never probe per row what an aggregate answers per group."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = read_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    per_supp = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).alias("_n_late"),
    )
    blamed = (
        per_supp.where(F.col("supp_late"))
        .join(per_order, "l_orderkey")
        .where((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q2 shape: argmin-per-group join-back (min-cost supplier)
# ---------------------------------------------------------------------------

_Q2_SQL = """
WITH costs AS (
    SELECT l.l_partkey, l.l_suppkey,
           min(l.l_extendedprice / l.l_quantity) AS unit_cost
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 3
    GROUP BY l.l_partkey, l.l_suppkey
),
best AS (
    SELECT l_partkey, l_suppkey, unit_cost,
           row_number() OVER (PARTITION BY l_partkey
                              ORDER BY unit_cost ASC, l_suppkey) AS rn
    FROM costs
)
SELECT p.p_partkey, p.p_brand, b.l_suppkey AS best_suppkey,
       b.unit_cost
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
WHERE b.rn = 1 AND p.p_size = 15
"""


@register("q2_min_cost_supplier", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp emulated by observed lineitem unit costs):
    for each size-15 part, the region-3 supplier with the lowest unit
    cost. The correlated MIN subquery becomes argmin-per-group: one
    (part, supplier) aggregate, then min_by within part — expressed as a
    max_by-style hash aggregate, NOT a window sort, so the per-part
    argmin gets map-side partial combine. Unit cost is ONE IEEE double
    division of raw stored doubles (identical in any engine); DECIMAL
    division was tried and rejected — the two engines truncate the
    repeating quotient at different scales, so min() could disagree in
    the last ulp."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    p = read_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    costs = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit).alias("unit_cost"))
    )
    best = costs.groupBy("l_partkey").agg(
        F.min_by(
            F.struct(F.col("l_suppkey"), F.col("unit_cost")),
            F.struct(F.col("unit_cost"), F.col("l_suppkey")),
        ).alias("_best")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            F.col("_best.l_suppkey").alias("best_suppkey"),
            F.col("_best.unit_cost").alias("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: multi-dimension join fan (part-name filter, supplier nation,
# order year) feeding a two-measure profit aggregate
# ---------------------------------------------------------------------------

_Q9_SQL = """
SELECT n.n_name,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       - CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%bolt'
GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
"""


@register("q9_product_type_profit", _Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation x order year; supply cost
    emulated as the part's retail price since the driver schema has no
    partsupp). The planner exercise is the join fan: one fact scan joined
    to THREE broadcastable dims (part filtered by name suffix, supplier,
    nation) plus the orders fact for the year key. part/supplier/nation are
    broadcast; lineitem<->orders is the one real shuffle and AQE/SMJ's home
    turf. Revenue and cost ride the same hash aggregate as two exact
    DECIMAL sums; the profit subtraction is a single double op at the end
    (never accumulated in floats). Ref shape: TPC-H spec Q9; reference
    repo has no partsupp either (parity with SURVEY §2 A2 two-measure agg).
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    cost = F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(_volume()).cast("double") - F.sum(cost).cast("double")
            ).alias("sum_profit")
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape: grouped value vs a scalar fraction-of-total threshold computed
# from the SAME aggregate (sum-of-sums, no second fact scan)
# ---------------------------------------------------------------------------

_Q11_SQL = """
WITH perpart AS (
    SELECT l.l_partkey,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS val_dec
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_nationkey = 7
    GROUP BY l.l_partkey
),
total AS (SELECT sum(val_dec) AS tot_dec FROM perpart)
SELECT p.l_partkey, CAST(p.val_dec AS DOUBLE) AS part_value
FROM perpart p, total t
WHERE CAST(p.val_dec AS DOUBLE) > CAST(t.tot_dec AS DOUBLE) * 0.001
"""


@register("q11_important_stock", _Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part traded value for one nation's suppliers,
    kept only where it exceeds a fraction of the grand total. The HAVING
    threshold is a sum over the ALREADY-AGGREGATED per-part rows
    (sum-of-sums stays exact DECIMAL), so the fact table is scanned once;
    the 1-row total attaches via broadcast cross-join exactly like
    q22/split_bounds. The fraction comparison happens in one double
    multiply+compare on exact operands — no float accumulation. At 100 TB
    the perpart intermediate is |parts|-sized, the threshold is 1 row, and
    nothing about the plan changes."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 7)
    perpart = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_volume()).alias("val_dec"))
    )
    total = perpart.agg(F.sum("val_dec").alias("tot_dec"))
    return (
        perpart.crossJoin(F.broadcast(total))
        .where(
            F.col("val_dec").cast("double")
            > F.col("tot_dec").cast("double") * F.lit(0.001)
        )
        .select("l_partkey", F.col("val_dec").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer join with an ON-clause right-side predicate feeding a
# count-of-counts distribution (zero-order customers included)
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON o.o_custkey = c.c_custkey
     AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) pc
GROUP BY c_count
"""


@register("q13_customer_distribution", _Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed exactly N (non-urgent) orders,
    INCLUDING the N=0 customers the inner-join shape would drop. The
    ON-clause predicate touches only the orders side, so it pushes into the
    right input of the left-outer join (the same plan Catalyst derives from
    the canonical ON form); count(o_orderkey) counts matches, not rows, so
    unmatched customers land in the N=0 bucket. Two-level count-then-count
    distribution = SURVEY §2 A2's shape with an outer join feeding it. At
    scale: first agg shuffles by custkey (same key as the join — AQE reuses
    the partitioning), second agg's key space is tiny (max orders/customer).
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q20 shape: semi-join chain gated by a conditional aggregate over the
# correlated pair (one fact pass for both the window and lifetime sums)
# ---------------------------------------------------------------------------

_Q20_SQL = """
WITH pair AS (
    SELECT l.l_partkey, l.l_suppkey,
           sum(l.l_quantity) AS qty_total,
           sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
                     AND l.l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
                    THEN l.l_quantity ELSE 0 END) AS qty_1999
    FROM lineitem l
    GROUP BY l.l_partkey, l.l_suppkey
),
hot AS (
    SELECT pr.l_suppkey
    FROM pair pr
    WHERE pr.qty_1999 * 2 > pr.qty_total
      AND pr.l_partkey IN (
            SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'red%')
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_nationkey = 5
  AND s.s_suppkey IN (SELECT l_suppkey FROM hot)
"""


@register("q20_promotion_suppliers", _Q20_SQL)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty emulated by lifetime shipped quantity):
    nation-5 suppliers who shipped more than half of a red part's lifetime
    volume inside 1999 — the nested-IN / correlated-aggregate planner
    benchmark. Both the windowed and lifetime sums ride ONE conditional
    aggregate over a single lineitem scan (no self-join of the fact table,
    which is how naive plans go quadratic); the part-name gate is a
    broadcast LEFT SEMI join on the |parts|-sized pair aggregate; suppliers
    probe the surviving pair keys with a second semi join. l_quantity is
    integral, so the half-threshold is the exact integer test 2*qty_window
    > qty_total — no 0.5 float. At 100 TB: one fact shuffle keyed
    (partkey, suppkey) with map-side combine, everything downstream is
    dimension-sized."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = read_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 5)
    in_1999 = (
        F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty_total"),
        F.sum(F.when(in_1999, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
            "qty_1999"
        ),
    )
    hot = (
        pair.where(F.col("qty_1999") * 2 > F.col("qty_total"))
        .join(F.broadcast(p), pair.l_partkey == p.p_partkey, "left_semi")
        .select("l_suppkey")
    )
    return s.join(hot, s.s_suppkey == hot.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )
