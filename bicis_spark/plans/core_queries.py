"""Core declared queries: scans, filters, aggregations, joins, profiles.

Maps the reference's bicis-domain operators onto the driver tables per
FIXTURES.md §4: ``events.user_id`` plays station, ``events.ts`` plays
rent_date, ``event_type='click'`` plays rents / ``'view'`` plays returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bicis_spark.operators.profiles import event_profile_single_scan
from bicis_spark.plans.queries import register
from bicis_spark.sources.io import read_table

RENT_TYPE = "click"
RETURN_TYPE = "view"


def events_as_trips(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(rents, returns) event streams standing in for the trips table."""
    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE)
    returns = events.where(F.col("event_type") == RETURN_TYPE)
    return rents, returns


# ---------------------------------------------------------------------------
# Flagship (entry): per-station per-hour-of-day average event counts
# = A2 two-level agg + W2 bucketing + J1 multi-key inner join
# (basic_features.py:30-68 semantics on driver data).
# ---------------------------------------------------------------------------

_HOUR_PROFILE_ORACLE = f"""
WITH rent_l1 AS (
    SELECT user_id AS station,
           date_trunc('hour', ts) AS period,
           hour(ts) AS hour,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RENT_TYPE}'
    GROUP BY 1, 2, 3
),
rent_prof AS (
    SELECT station, hour, avg(cnt) AS n_rents FROM rent_l1 GROUP BY 1, 2
),
ret_l1 AS (
    SELECT user_id AS station,
           date_trunc('hour', ts) AS period,
           hour(ts) AS hour,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RETURN_TYPE}'
    GROUP BY 1, 2, 3
),
ret_prof AS (
    SELECT station, hour, avg(cnt) AS n_returns FROM ret_l1 GROUP BY 1, 2
)
SELECT rent_prof.station, rent_prof.hour, n_rents, n_returns
FROM rent_prof
JOIN ret_prof ON rent_prof.station = ret_prof.station
            AND rent_prof.hour = ret_prof.hour
"""


@register("hour_profile", _HOUR_PROFILE_ORACLE)
def hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    joined = event_profile_single_scan(
        events, "user_id", "ts", "hour",
        is_rent=F.col("event_type") == RENT_TYPE,
        is_return=F.col("event_type") == RETURN_TYPE,
    )
    return joined.select(
        F.col("station").cast("long").alias("station"),
        F.col("hour").cast("long").alias("hour"),
        "n_rents",
        "n_returns",
    )


_WEEKDAY_PROFILE_ORACLE = f"""
WITH rent_l1 AS (
    SELECT user_id AS station,
           date_trunc('week', ts) AS period,
           isodow(ts) AS weekday,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RENT_TYPE}'
    GROUP BY 1, 2, 3
),
rent_prof AS (
    SELECT station, weekday, avg(cnt) AS n_rents FROM rent_l1 GROUP BY 1, 2
),
ret_l1 AS (
    SELECT user_id AS station,
           date_trunc('week', ts) AS period,
           isodow(ts) AS weekday,
           count(*) AS cnt
    FROM events
    WHERE event_type = '{RETURN_TYPE}'
    GROUP BY 1, 2, 3
),
ret_prof AS (
    SELECT station, weekday, avg(cnt) AS n_returns FROM ret_l1 GROUP BY 1, 2
)
SELECT rent_prof.station, rent_prof.weekday, n_rents, n_returns
FROM rent_prof
JOIN ret_prof ON rent_prof.station = ret_prof.station
            AND rent_prof.weekday = ret_prof.weekday
"""


@register("weekday_profile", _WEEKDAY_PROFILE_ORACLE)
def weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday profile: exercises the ISO weekday shift formula and the
    (iso_year, iso_week) period grouping (W2, basic_features.py:78-80)."""
    events = read_table(spark, sf_dir, "events")
    joined = event_profile_single_scan(
        events, "user_id", "ts", "weekday",
        is_rent=F.col("event_type") == RENT_TYPE,
        is_return=F.col("event_type") == RETURN_TYPE,
    )
    return joined.select(
        F.col("station").cast("long").alias("station"),
        F.col("weekday").cast("long").alias("weekday"),
        "n_rents",
        "n_returns",
    )


# ---------------------------------------------------------------------------
# A4: plain counts
# ---------------------------------------------------------------------------


@register("count_rows", "SELECT count(*) AS n FROM lineitem")
def count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# F1/F5: filters
# ---------------------------------------------------------------------------


@register(
    "boolean_or_filter",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE user_id = 3 OR event_type = '{RENT_TYPE}'
    """,
)
def boolean_or_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 (notebooks/Untitled.ipynb cell 9): boolean OR of two predicates."""
    events = read_table(spark, sf_dir, "events")
    return events.where(
        (F.col("user_id") == 3) | (F.col("event_type") == RENT_TYPE)
    ).select("event_id", "user_id", "event_type")


@register(
    "timestamp_range_filter",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2024-01-08 00:00:00'
      AND o_orderdate < TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def timestamp_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (split.py:51,58-61): half-open timestamp range, pushed to the scan."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.where(
        (F.col("o_orderdate") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# §2.7: UNION ALL (unify's concatenation shape)
# ---------------------------------------------------------------------------


@register(
    "union_all_sources",
    f"""
    SELECT event_id AS id, ts, 'rent' AS kind FROM events WHERE event_type = '{RENT_TYPE}'
    UNION ALL
    SELECT event_id AS id, ts, 'return' AS kind FROM events WHERE event_type = '{RETURN_TYPE}'
    """,
)
def union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: per-dialect normalization then UNION ALL (unify.py:36-37 via
    chained iterators) — `unionByName` here."""
    rents, returns = events_as_trips(spark, sf_dir)
    a = rents.select(F.col("event_id").alias("id"), "ts", F.lit("rent").alias("kind"))
    b = returns.select(
        F.col("event_id").alias("id"), "ts", F.lit("return").alias("kind")
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# X1/X2: multi-format timestamp + duration parsing (round-trip through
# strings synthesized from driver columns, so the oracle sees identical input)
# ---------------------------------------------------------------------------


@register(
    "multi_format_timestamp_parse",
    """
    WITH s AS (
        SELECT o_orderkey,
               CASE o_orderkey % 3
                   WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M')
                   WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
                   ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
               END AS raw
        FROM orders
    )
    SELECT o_orderkey, raw,
           coalesce(try_strptime(raw, '%d/%m/%Y %H:%M'),
                    try_strptime(raw, '%d/%m/%Y %H:%M:%S'),
                    try_strptime(raw, '%Y-%m-%d %H:%M:%S.%f')) AS parsed
    FROM s
    """,
)
def multi_format_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 (parse_raw_data.py:67-76): three formats tried in order, null on
    failure. Input strings are synthesized per-row in one of the three
    formats; both engines parse the identical strings."""
    from bicis_spark.functions.parsing import parse_timestamp_multi

    orders = read_table(spark, sf_dir, "orders")
    raw = (
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.date_format("o_orderdate", "dd/MM/yyyy HH:mm"),
        )
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss"),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    with_raw = orders.select("o_orderkey", raw.alias("raw"))
    # padded variants of the reference formats (the synthesized strings are
    # zero-padded; lenient d/M patterns also accept them)
    return with_raw.select(
        "o_orderkey",
        "raw",
        parse_timestamp_multi(F.col("raw")).alias("parsed"),
    )


@register(
    "duration_parse",
    """
    WITH s AS (
        SELECT o_orderkey,
               CASE o_orderkey % 4
                   WHEN 0 THEN CAST(o_orderkey % 120 AS VARCHAR)
                   WHEN 1 THEN concat(o_orderkey % 3, 'H ', o_orderkey % 60, 'MIN ', o_orderkey % 59, 'SEG')
                   WHEN 2 THEN concat(o_orderkey % 60, 'MIN ', o_orderkey % 59, 'SEG')
                   ELSE 'garbage'
               END AS raw
        FROM orders
    )
    SELECT o_orderkey, raw,
           CASE
               WHEN regexp_matches(raw, '^[0-9]+$')
                    AND try_cast(raw AS BIGINT) IS NOT NULL
                    THEN try_cast(raw AS BIGINT) * 60
               WHEN len(regexp_extract_all(raw, '(\\d+)', 1)) >= 3 THEN
                    CAST(regexp_extract_all(raw, '(\\d+)', 1)[1] AS BIGINT) * 3600
                  + CAST(regexp_extract_all(raw, '(\\d+)', 1)[2] AS BIGINT) * 60
                  + CAST(regexp_extract_all(raw, '(\\d+)', 1)[3] AS BIGINT)
           END AS duration_s
    FROM s
    """,
)
def duration_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (parse_raw_data.py:55-64): int ⇒ minutes; "xH yMIN zSEG" ⇒
    h/m/s; <3 numeric tokens ⇒ null. Strings synthesized per-row."""
    from bicis_spark.functions.parsing import parse_duration_seconds

    orders = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = (
        F.when(k % 4 == 0, (k % 120).cast("string"))
        .when(
            k % 4 == 1,
            F.concat(
                (k % 3).cast("string"),
                F.lit("H "),
                (k % 60).cast("string"),
                F.lit("MIN "),
                (k % 59).cast("string"),
                F.lit("SEG"),
            ),
        )
        .when(
            k % 4 == 2,
            F.concat(
                (k % 60).cast("string"),
                F.lit("MIN "),
                (k % 59).cast("string"),
                F.lit("SEG"),
            ),
        )
        .otherwise(F.lit("garbage"))
    )
    with_raw = orders.select("o_orderkey", raw.alias("raw"))
    return with_raw.select(
        "o_orderkey", "raw", parse_duration_seconds(F.col("raw")).alias("duration_s")
    )


# ---------------------------------------------------------------------------
# J3/J4: expression join + broadcast dimension joins
# ---------------------------------------------------------------------------


@register(
    "customers_per_region",
    """
    SELECT r.r_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: two broadcast dimension hops + agg. Money sums go through exact
    DECIMAL then back to DOUBLE (order-independent, oracle-bitwise)."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "revenue_per_brand",
    """
    SELECT p.p_brand,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def revenue_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 on the fact table: lineitem ⋈ broadcast(part), revenue in exact
    decimal arithmetic."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    revenue_expr = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(revenue_expr).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "customers_without_events",
    """
    SELECT c.c_custkey, c.c_name, c.c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
)
def customers_without_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join (NOT EXISTS semantics): customers with no tracked
    events. Anti joins never expand rows, so the plan is a one-sided probe
    — broadcast-anti when the right side's distinct keys fit, shuffled-anti
    otherwise; either way only the KEY column of the right side moves,
    never its payload (Catalyst prunes to user_id before the exchange)."""
    customer = read_table(spark, sf_dir, "customer")
    events = read_table(spark, sf_dir, "events")
    return customer.join(
        events, customer["c_custkey"] == events["user_id"], "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


@register(
    "salted_join_supplier_revenue",
    """
    SELECT s.s_name, count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def salted_join_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dim through the SALTED replication join (operators/skew.py)
    with the default per-row salt (xxhash64 over all fact columns — the
    round-3 fix; salting the join key itself would no-op the mitigation).
    Output-identical to the plain join the oracle runs; a pathologically
    hot supplier key is spread across n_salts tasks."""
    from bicis_spark.operators.skew import salted_broadcast_join

    lineitem = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    joined = salted_broadcast_join(lineitem, supplier, on="l_suppkey", n_salts=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "orders_events_expr_join",
    f"""
    SELECT o.o_orderkey, e.event_id
    FROM orders o
    JOIN events e
      ON o.o_custkey = e.user_id
     AND date_trunc('day', o.o_orderdate) = date_trunc('day', e.ts)
     AND e.event_type = '{RENT_TYPE}'
    """,
)
def orders_events_expr_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (Spark test.ipynb cell 8): compound expression equi-join — still
    hashable keys, so Catalyst picks SMJ/broadcast, never a cartesian."""
    orders = read_table(spark, sf_dir, "orders")
    events = read_table(spark, sf_dir, "events")
    return orders.join(
        events,
        (orders["o_custkey"] == events["user_id"])
        & (
            F.date_trunc("day", orders["o_orderdate"])
            == F.date_trunc("day", events["ts"])
        )
        & (events["event_type"] == RENT_TYPE),
    ).select("o_orderkey", "event_id")


# ---------------------------------------------------------------------------
# O1/O2 + extensions: ordering, limit, top-k per group
# ---------------------------------------------------------------------------


@register(
    "latest_events_top100",
    """
    SELECT event_id, ts, user_id
    FROM events
    ORDER BY ts DESC, event_id
    LIMIT 100
    """,
)
def latest_events_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: descending sort + limit, tie-broken on the unique id so the
    result set is deterministic. Spark executes this as TakeOrderedAndProject
    (per-partition top-k + merge) — no global sort at scale."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.orderBy(F.col("ts").desc(), F.col("event_id"))
        .select("event_id", "ts", "user_id")
        .limit(100)
    )


@register(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (SURVEY.md §2.6 extension): row_number window,
    deterministic tie-break."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# A6: hourly resample; TPC-H-style pricing summary (bench headline)
# ---------------------------------------------------------------------------


@register(
    "hourly_event_counts",
    """
    SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (notebook resample('H').count()): tumbling 1-hour buckets."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (PAPERS.md / pyspark_guide common OLAP pattern): the
    bench headline aggregate. All money math in exact decimals."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        lineitem.where(
            F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7 engine surface): INTERSECT / EXCEPT
# ---------------------------------------------------------------------------


@register(
    "users_intersect",
    f"""
    SELECT user_id FROM events WHERE event_type = '{RENT_TYPE}'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = '{RETURN_TYPE}'
    """,
)
def users_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    rents, returns = events_as_trips(spark, sf_dir)
    return rents.select("user_id").intersect(returns.select("user_id"))


@register(
    "hours_except",
    f"""
    SELECT date_trunc('hour', ts) AS hour_start FROM events WHERE event_type = '{RENT_TYPE}'
    EXCEPT
    SELECT date_trunc('hour', ts) AS hour_start FROM events WHERE event_type = 'error'
    """,
)
def hours_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics = Spark subtract): hours with rent activity
    but no errors."""
    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE)
    errors = events.where(F.col("event_type") == "error")
    hr = F.date_trunc("hour", F.col("ts")).alias("hour_start")
    return rents.select(hr).subtract(errors.select(hr))


# ---------------------------------------------------------------------------
# Grouping sets / rollup (§2.4 extension surface)
# ---------------------------------------------------------------------------


@register(
    "rollup_order_counts",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           GROUPING(l_returnflag, l_linestatus) AS gid
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping-id (bit encodings verified identical between
    Spark's grouping_id() and DuckDB's GROUPING())."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "cube_event_counts",
    """
    SELECT event_type, user_id % 4 AS user_bucket, count(*) AS n,
           GROUPING(event_type, user_id % 4) AS gid
    FROM events
    GROUP BY CUBE(event_type, user_id % 4)
    """,
)
def cube_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 4
    )
    return events.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("long").alias("gid"),
    )


# ---------------------------------------------------------------------------
# Exact + approximate distinct / quantiles
# ---------------------------------------------------------------------------


@register(
    "distinct_user_stats",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           quantile_cont(value, 0.5) AS p50_value
    FROM events GROUP BY event_type
    """,
)
def distinct_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count + exact interpolated median (interpolation
    verified bit-identical between Spark percentile and DuckDB
    quantile_cont)."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.percentile("value", F.lit(0.5)).alias("p50_value"),
    )


@register(
    "approx_distinct_stats",
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users,
           true AS hll_within_10pct, true AS p50_within_band
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch estimates pinned as a contract (r3 verdict item #7 pattern):
    the HLL/GK outputs are engine-specific, so the hash gate checks the
    exact distinct plus booleans asserting (a) approx_count_distinct
    within 10% of exact and (b) percentile_approx(0.5, acc=1000) — rank
    error ≤ 0.001 — inside the exact [p0.45, p0.55] value band (50×
    slack). Both sketches are order-insensitive, so the booleans are
    deterministic for a given dataset."""
    events = read_table(spark, sf_dir, "events")
    exact_d = F.countDistinct("user_id").cast("double")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        (
            F.abs(F.approx_count_distinct("user_id").cast("double") - exact_d)
            <= 0.1 * exact_d
        ).alias("hll_within_10pct"),
        F.percentile_approx("value", F.lit(0.5), F.lit(1000))
        .between(
            F.percentile("value", F.lit(0.45)), F.percentile("value", F.lit(0.55))
        )
        .alias("p50_within_band"),
    )


# ---------------------------------------------------------------------------
# Sessionization (pyspark_guide common pattern: lag + cumulative gap count)
# ---------------------------------------------------------------------------


@register(
    "sessionization",
    """
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM g
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions via lag + running sum — the batch form of
    streaming session windows (order tie-broken on event_id)."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(gap > 1_800_000_000, F.lit(1)).otherwise(F.lit(0))
    sessions = (
        events.withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# As-of join (custom cogrouped-applyInPandas operator)
# ---------------------------------------------------------------------------


@register(
    "asof_latest_order",
    f"""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = '{RENT_TYPE}'),
    m AS (
        SELECT e.event_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id, e.ts, m.o_orderkey, m.o_orderdate, m.o_totalprice
    FROM e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each rent event enriched with the user's latest
    order at-or-before the event (ties -> max o_orderkey). The unique
    event_id selects the pure-JVM join+max_by plan — no Python stage, AQE
    skew-split applies to the hot-user equi-join."""
    from bicis_spark.operators.asof import asof_join

    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return asof_join(
        rents,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        by_left="user_id",
        by_right="o_custkey",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tiebreak="o_orderkey",
        left_id="event_id",
    )


_ASOF_FWD_TOL_US = 30 * 86_400 * 1_000_000  # 30 days


@register(
    "asof_forward_next_order",
    f"""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = '{RENT_TYPE}'),
    m AS (
        SELECT e.event_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate ASC, o.o_orderkey DESC) AS rn
        FROM e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
         AND epoch_us(o.o_orderdate) - epoch_us(e.ts) <= {_ASOF_FWD_TOL_US}
    )
    SELECT e.event_id, e.user_id, e.ts, m.o_orderkey, m.o_orderdate, m.o_totalprice
    FROM e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
    """,
)
def asof_forward_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each rent event enriched with the
    user's EARLIEST order at-or-after the event, but only within 30 days
    (merge_asof direction='forward', tolerance). The tolerance doubles as
    the scale guard — the pre-aggregate join materializes only in-band
    pairs, not a user's entire future order history."""
    from bicis_spark.operators.asof import asof_join

    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return asof_join(
        rents,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        by_left="user_id",
        by_right="o_custkey",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tiebreak="o_orderkey",
        left_id="event_id",
        direction="forward",
        tolerance_s=30 * 86_400,
    )


_ASOF_NEAR_TOL_US = 7 * 86_400 * 1_000_000  # 7 days


@register(
    "asof_nearest_order",
    f"""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = '{RENT_TYPE}'),
    m AS (
        SELECT e.event_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) ASC,
                            CASE WHEN o.o_orderdate <= e.ts THEN 1 ELSE 0 END DESC,
                            o.o_orderkey DESC) AS rn
        FROM e JOIN orders o
          ON o.o_custkey = e.user_id
         AND abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) <= {_ASOF_NEAR_TOL_US}
    )
    SELECT e.event_id, e.user_id, e.ts, m.o_orderkey, m.o_orderdate, m.o_totalprice
    FROM e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1
    """,
)
def asof_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each rent event enriched with the order closest
    in time (either direction) within a 7-day band; exact-distance ties
    prefer the backward row then max orderkey. The band predicate is what
    keeps 'nearest' scalable — without it every (user, order) pair joins."""
    from bicis_spark.operators.asof import asof_join

    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return asof_join(
        rents,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        by_left="user_id",
        by_right="o_custkey",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        tiebreak="o_orderkey",
        left_id="event_id",
        direction="nearest",
        tolerance_s=7 * 86_400,
    )


# ---------------------------------------------------------------------------
# Entry point 3 (SURVEY.md §3): ad-hoc SQL over registered views — the
# reference's notebook exploration surface, served by spark.sql (identical
# Catalyst plan as the DataFrame API)
# ---------------------------------------------------------------------------

_ADHOC_SQL = """
SELECT n.n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("sql_adhoc_orders_by_nation", _ADHOC_SQL)
def sql_adhoc_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() string surface: same SQL text runs on both engines
    (views registered via sources.io.register_views)."""
    from bicis_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ADHOC_SQL)


# ---------------------------------------------------------------------------
# W4: duration derivation from two timestamps (return_date − rent_date ≙
# ship delay; notebooks/Explore the data.ipynb cell 8)
# ---------------------------------------------------------------------------


@register(
    "ship_delay_stats",
    """
    SELECT o.o_orderpriority,
           count(*) AS n,
           (CAST(sum(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) AS DOUBLE)
               / count(*)) / 1000000.0 AS avg_delay_s,
           max(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) / 1000000.0
               AS max_delay_s
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 duration arithmetic: timestamp difference in exact integer
    microseconds, averaged (exact int sums), scaled to seconds in double."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    delay_us = F.unix_micros(F.col("l_shipdate")) - F.unix_micros(F.col("o_orderdate"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                (F.sum(delay_us).cast("double") / F.count(F.lit(1)))
                / F.lit(1_000_000.0)
            ).alias("avg_delay_s"),
            (F.max(delay_us) / F.lit(1_000_000.0)).alias("max_delay_s"),
        )
    )


# ---------------------------------------------------------------------------
# Range join (bucketized equi-join form — no nested-loop join)
# ---------------------------------------------------------------------------


@register(
    "range_join_recent_orders",
    f"""
    SELECT e.event_id, o.o_orderkey
    FROM events e JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate <= e.ts
     AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
    WHERE e.event_type = '{RENT_TYPE}'
    """,
)
def range_join_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events joined to the same user's orders within the 7 days before the
    event — bucketized so it executes as a hash equi-join, not a
    BroadcastNestedLoopJoin."""
    from bicis_spark.operators.rangejoin import range_join_lookback

    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    out = range_join_lookback(
        rents,
        orders,
        left_ts="ts",
        right_ts="o_orderdate",
        by_left="user_id",
        by_right="o_custkey",
        lookback_seconds=7 * 86_400,
    )
    return out.select("event_id", "o_orderkey")


# ---------------------------------------------------------------------------
# Moment statistics with exact decimal sums (variance/stddev without
# order-dependent float accumulation — the formula runs on exactly-equal
# inputs in both engines, so even sqrt results are bitwise identical)
# ---------------------------------------------------------------------------


@register(
    "value_moment_stats",
    """
    WITH s AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           sx / n AS mean_value,
           (sx2 - sx * sx / n) / n AS var_pop,
           sqrt((sx2 - sx * sx / n) / n) AS stddev_pop
    FROM s
    """,
)
def value_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("sx"),
        F.sum(v * v).cast("double").alias("sx2"),
    )
    n, sx, sx2 = F.col("n"), F.col("sx"), F.col("sx2")
    var_pop = (sx2 - sx * sx / n) / n
    return s.select(
        "event_type",
        "n",
        (sx / n).alias("mean_value"),
        var_pop.alias("var_pop"),
        F.sqrt(var_pop).alias("stddev_pop"),
    )


# ---------------------------------------------------------------------------
# lead/lag + cumulative windows; unpivot (A5 inverse)
# ---------------------------------------------------------------------------


@register(
    "next_event_gap",
    f"""
    SELECT event_id,
           (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
            - epoch_us(ts)) AS gap_us
    FROM events
    WHERE event_type = '{RENT_TYPE}'
    """,
)
def next_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead(): microseconds to the user's next rent event (null at series
    end) — the inverse perspective of the W1 forward window."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    return rents.select("event_id", gap.alias("gap_us"))


@register(
    "running_value_total",
    f"""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM events
    WHERE event_type = '{RENT_TYPE}'
    """,
)
def running_value_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user spend — running sum over an exact decimal so
    every prefix is order-exact (frame order pinned by (ts, event_id))."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    rents = events.where(F.col("event_type") == RENT_TYPE)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rents.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


_UNPIVOT_STACK = ", ".join(f"'{h}', n_rents_h{h}" for h in range(24))


@register(
    "unpivot_hour_profile",
    """
    WITH rent_l1 AS (
        SELECT user_id AS station, date_trunc('hour', ts) AS period,
               hour(ts) AS hour, count(*) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3
    ),
    rent_prof AS (SELECT station, hour, avg(cnt) AS n_rents FROM rent_l1 GROUP BY 1, 2),
    ret_l1 AS (
        SELECT user_id AS station, date_trunc('hour', ts) AS period,
               hour(ts) AS hour, count(*) AS cnt
        FROM events WHERE event_type = 'view' GROUP BY 1, 2, 3
    ),
    ret_prof AS (SELECT station, hour, avg(cnt) AS n_returns FROM ret_l1 GROUP BY 1, 2),
    prof AS (
        SELECT rent_prof.station, rent_prof.hour, n_rents
        FROM rent_prof JOIN ret_prof
          ON rent_prof.station = ret_prof.station AND rent_prof.hour = ret_prof.hour
    ),
    pivoted AS (
        SELECT station, h.h AS hour,
               coalesce(max(n_rents) FILTER (WHERE prof.hour = h.h), 0.0) AS n_rents
        FROM prof CROSS JOIN (SELECT unnest(range(24)) AS h) h
        GROUP BY station, h.h
    )
    SELECT station, hour::BIGINT AS hour, n_rents FROM pivoted
    """,
)
def unpivot_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot (stack): the 24-column hourly pivot melted back to
    long form — round-trips A5 and exercises the stack/unpivot surface."""
    from bicis_spark.operators.features import hour_profile_pivot
    from bicis_spark.plans.pipeline_queries import _profile_df

    pivoted = hour_profile_pivot(_profile_df(spark, sf_dir), "n_rents")
    unpivoted = pivoted.selectExpr(
        "station", f"stack(24, {_UNPIVOT_STACK}) AS (hour, n_rents)"
    )
    return unpivoted.select(
        F.col("station").cast("long").alias("station"),
        F.col("hour").cast("long").alias("hour"),
        "n_rents",
    )


# ---------------------------------------------------------------------------
# Skew mitigation surface (operators/skew.py)
# ---------------------------------------------------------------------------


@register(
    "salted_event_counts",
    "SELECT user_id, count(*) AS n FROM events GROUP BY user_id",
)
def salted_event_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event counts through the SALTED two-phase aggregation
    (operators/skew.py): partial counts on (user, salt-of-event_id), then
    a merge over at most n_salts partials per user. Output-identical to a
    plain groupBy (the oracle), but a pathologically hot user is bounded
    at 1/16 of its rows per task — the manual fix for skew AQE can't
    split (window exchanges, aggregations)."""
    from bicis_spark.operators.skew import salted_count

    events = read_table(spark, sf_dir, "events")
    return salted_count(events, ["user_id"], "event_id", n_salts=16, out_name="n")


# ---------------------------------------------------------------------------
# Profiling, rank functions, JSON extraction (engine surface)
# ---------------------------------------------------------------------------


@register(
    "table_profile_orders",
    """
    SELECT 'o_orderkey' AS col_name, count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           count(DISTINCT o_orderkey)::BIGINT AS n_distinct,
           min(o_orderkey)::BIGINT AS min_num, max(o_orderkey)::BIGINT AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*)::BIGINT,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_custkey)::BIGINT,
           min(o_custkey)::BIGINT, max(o_custkey)::BIGINT FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*)::BIGINT,
           sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderstatus)::BIGINT,
           NULL::BIGINT, NULL::BIGINT FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*)::BIGINT,
           sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderpriority)::BIGINT,
           NULL::BIGINT, NULL::BIGINT FROM orders
    """,
)
def table_profile_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling (operators/stats.py): one aggregation
    pass over the table yields null counts, exact cardinalities, and
    integral ranges for every profiled column; stack pivots to long form.
    approx_count_distinct is the documented 100 TB path."""
    from bicis_spark.operators.stats import profile_table

    orders = read_table(spark, sf_dir, "orders")
    return profile_table(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@register(
    "table_profile_orders_approx",
    """
    SELECT 'o_orderkey' AS col_name, count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           count(DISTINCT o_orderkey)::BIGINT AS n_distinct,
           TRUE AS hll_within_band FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*)::BIGINT,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_custkey)::BIGINT, TRUE FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*)::BIGINT,
           sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderstatus)::BIGINT, TRUE FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*)::BIGINT,
           sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
           count(DISTINCT o_orderpriority)::BIGINT, TRUE FROM orders
    """,
)
def table_profile_orders_approx_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB ANALYZE path's accuracy CONTRACT (was rows-only; r3
    verdict item #7): HLL estimates are engine-specific so they can't be
    hash-compared directly — instead the query emits the exact profile
    plus a boolean asserting approx_count_distinct(rsd=0.01) landed within
    ±10% (~10σ) of the exact cardinality, and the oracle pins the exact
    stats + TRUE. A wrong HLL path now flips the boolean and goes red."""
    from bicis_spark.operators.stats import profile_table_hll_contract

    orders = read_table(spark, sf_dir, "orders")
    return profile_table_hll_contract(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@register(
    "order_rank_distribution",
    """
    SELECT o_orderkey, o_orderpriority,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY date_trunc('month', o_orderdate), o_orderkey)
               AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY date_trunc('month', o_orderdate))
    """,
)
def order_rank_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full rank-function surface in one window pass: rank/dense_rank/
    percent_rank/cume_dist over a deliberately tie-heavy key (order month
    — rank semantics depend only on sort-key VALUES, so ties are
    engine-independent), plus ntile over a unique ordering (ntile depends
    on row order, so its sort key must be total)."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    w = Window.partitionBy("o_orderpriority").orderBy(month)
    wu = Window.partitionBy("o_orderpriority").orderBy(month, "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(wu).cast("long").alias("quartile"),
    )


@register(
    "json_props_stats",
    """
    SELECT event_type,
           count(*) AS n,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY event_type
    """,
)
def json_props_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract a field from the JSON ``props``
    column (get_json_object — JVM-side JSON path, no UDF) and aggregate
    it per event type. At scale the extraction runs inside the scan
    project, before the groupBy shuffle."""
    events = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(k).alias("n_k"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
        F.sum(k).cast("long").alias("k_sum"),
    )


@register(
    "upsert_latest_events",
    """
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events
    ) r WHERE rk = 1
    """,
)
def upsert_latest_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction / MERGE-style upsert: latest-wins per key — the
    standard 'apply a change log' primitive (one window shuffle keyed by
    the upsert key; at scale this is the compaction pass of any
    merge-on-read table format)."""
    from pyspark.sql import Window

    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "user_event_histogram",
    """
    WITH c AS (
        SELECT user_id, event_type, count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY event_type) AS histogram
    FROM c GROUP BY user_id
    """,
)
def user_event_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation parity: per-user event-type histogram
    serialized deterministically (collect_list is unordered by contract,
    so the list is array_sort'ed before joining — the only way an
    aggregated string column can survive a bitwise gate)."""
    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return counts.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_type", "n"))),
                lambda x: F.concat(
                    x["event_type"], F.lit(":"), x["n"].cast("string")
                ),
            ),
        ).alias("histogram")
    )


@register(
    "order_window_frames",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w_run AS running_last,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           lag(o_totalprice, 1) OVER w_seq AS prev_price,
           lead(o_totalprice, 1) OVER w_seq AS next_price,
           avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_window_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME semantics parity: first/last/nth_value with explicit
    ROWS frames, lag/lead, and a 3-row moving average — all over one
    total order (orderdate, orderkey) so frames are engine-independent.
    The ma3 average divides a DOUBLE sum of at most 3 values — the
    accumulation order inside a ROWS frame is the frame order in both
    engines, so it stays bitwise."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    ordering = [F.col("o_orderdate"), F.col("o_orderkey")]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy(*ordering)
    ma3 = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_run).alias("running_last"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.lag("o_totalprice", 1).over(w_seq).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w_seq).alias("next_price"),
        F.avg("o_totalprice").over(ma3).alias("ma3"),
    )


@register(
    "incremental_user_totals",
    """
    SELECT user_id, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def incremental_user_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view maintenance under the hash gate: the per-user
    totals are computed by FOLDING a delta batch (events on/after
    2024-01-20) into the pre-materialized history state — never
    re-aggregating history — and must equal the oracle's full GROUP BY.
    At 100 TB this is the rolling-metrics pattern: update cost is
    O(delta), not O(history)."""
    from bicis_spark.operators.incremental import count_sum_state, merge_count_sum

    events = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    hist = count_sum_state(events.where(F.col("ts") < cut), ["user_id"], "value")
    delta = count_sum_state(events.where(F.col("ts") >= cut), ["user_id"], "value")
    merged = merge_count_sum(hist, delta, ["user_id"])
    return merged.select(
        "user_id", "n", F.col("s").cast("double").alias("total_value")
    )


# ---------------------------------------------------------------------------
# Classic multi-join OLAP battery (TPC-H Q3/Q5/Q10 shapes): join ordering,
# dimension broadcast, and exact-decimal money math over the fact table
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem,
    revenue per open order, top 10. The selective dimension predicate
    (1/5 of customers) reaches the customer scan (PushedFilters); revenue
    sums run in exact DECIMAL and only the final 10-row result is ordered
    (TakeOrderedAndProject — no global sort of the aggregate)."""
    c = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", _Q5_SQL)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with the customer-nation == supplier-
    nation correlation. nation⋈region prunes to one region BEFORE touching
    facts; supplier and the nation dim are explicit broadcasts (both stay
    small at any SF — suppliers scale ~1/10 of customers), so the only
    shuffles are the two fact-side equi-joins."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        c.join(asia_nations, c.c_nationkey == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


_Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("q10_returned_items", _Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue report over one quarter of returned
    items. Both fact filters (o_orderdate range, l_returnflag) push to the
    scans; nation broadcasts; top-20 via TakeOrderedAndProject."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# S7/S8 sinks proven by the roundtrip law (write -> read -> aggregate ==
# aggregate of the original; the oracle only ever sees the parquet, so any
# loss in the text trip — timestamp truncation, null/empty confusion,
# double formatting — breaks the hash)
# ---------------------------------------------------------------------------

_TEXT_ROUNDTRIP_SQL = """
SELECT event_type,
       count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS n_users,
       min(ts) AS min_ts, max(ts) AS max_ts,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register("csv_sink_roundtrip", _TEXT_ROUNDTRIP_SQL)
def csv_sink_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 (headered CSV sink, unify.py:40-50 / split.py:49-72 semantics):
    events written through write_csv and re-read schema-explicitly must
    aggregate bit-identically to the source. timestampFormat is pinned to
    microseconds on BOTH sides — the writer default truncates to millis
    (sources/io.py TEXT_TS_FORMAT)."""
    from bicis_spark.sources.io import staging_dir

    from bicis_spark.schemas import EVENTS
    from bicis_spark.sources.io import TEXT_TS_FORMAT, read_csv, write_csv

    import shutil

    ev = read_table(spark, sf_dir, "events")
    path = staging_dir("bicis_spark_csv_rt_")
    opts = {"timestampFormat": TEXT_TS_FORMAT}
    try:
        write_csv(ev, path, options=opts)
        back = read_csv(spark, path, EVENTS, sep=",", header=True, options=opts)
        # eager checkpoint so the staged copy can be deleted immediately
        # (per-run mkdtemp dirs otherwise accumulate in tmp across runs)
        return _roundtrip_agg(back).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register("json_sink_roundtrip", _TEXT_ROUNDTRIP_SQL)
def json_sink_roundtrip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (JSON sink): the JSON-lines roundtrip twin of the CSV law, same
    microsecond timestampFormat pin on write and read."""
    from bicis_spark.sources.io import staging_dir

    from bicis_spark.schemas import EVENTS
    from bicis_spark.sources.io import TEXT_TS_FORMAT, read_jsonl, write_json

    import shutil

    ev = read_table(spark, sf_dir, "events")
    path = staging_dir("bicis_spark_json_rt_")
    opts = {"timestampFormat": TEXT_TS_FORMAT}
    try:
        write_json(ev, path, options=opts)
        back = read_jsonl(spark, path, EVENTS, options=opts)
        return _roundtrip_agg(back).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "string_normalize_stations",
    """
    WITH s AS (
        SELECT c_custkey,
               CASE c_custkey % 3
                   WHEN 0 THEN '   ' || lower(c_name) || '  '
                   WHEN 1 THEN ' ' || upper(c_name)
                   ELSE c_name
               END AS raw
        FROM customer
    )
    SELECT c_custkey, raw, upper(trim(raw)) AS station FROM s
    """,
)
def string_normalize_stations_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (string normalization, parse_raw_data.py:84,89): messy padded /
    case-mangled station strings synthesized per-row from a driver column
    (same synthesized-input pattern as X1/X2), normalized with the
    engine's normalize_station — both engines see identical inputs and
    the oracle replays upper∘trim."""
    from bicis_spark.functions.parsing import normalize_station

    customer = read_table(spark, sf_dir, "customer")
    raw = (
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("   "), F.lower("c_name"), F.lit("  ")),
        )
        .when(F.col("c_custkey") % 3 == 1, F.concat(F.lit(" "), F.upper("c_name")))
        .otherwise(F.col("c_name"))
    )
    return customer.select(
        "c_custkey",
        raw.alias("raw"),
        normalize_station(raw).alias("station"),
    )


@register(
    "row_validity_filter",
    """
    WITH r AS (
        SELECT event_id, event_type,
               date_trunc('second', ts) AS rd,
               event_id % 4 AS m
        FROM events
    )
    SELECT CAST(event_id AS VARCHAR) AS rent_station,
           rd AS rent_date,
           CASE m WHEN 2 THEN rd + INTERVAL 2700 SECOND
                  ELSE rd + INTERVAL 5415 SECOND END AS return_date,
           event_type AS return_station
    FROM r WHERE m IN (2, 3)
    """,
)
def row_validity_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 (row-validity predicate, unify.py:43-49 + parse_raw_data.py:
    108-115) end-to-end through the V4 dialect: raw strings synthesized
    per-row carry a zero duration ('0' — falsy timedelta, no return_date
    derivation), a negative one ('-15' — rejected by the isdigit parity
    digit gate), integer minutes ('45' → +2700 s) and the H/MIN/SEG
    grammar ('1H 30MIN 15SEG' → +5415 s). normalize_dialect must drop
    exactly the first two classes; the oracle replays the survivors'
    derived return_dates directly."""
    from bicis_spark.operators.unify import FIELDS_V4, normalize_dialect

    events = read_table(spark, sf_dir, "events")
    raw = events.select(
        F.date_format("ts", "dd/MM/yyyy HH:mm:ss").alias("fecha_hora_retiro"),
        F.when(F.col("event_id") % 4 == 0, F.lit("0"))
        .when(F.col("event_id") % 4 == 1, F.lit("-15"))
        .when(F.col("event_id") % 4 == 2, F.lit("45"))
        .otherwise(F.lit("1H 30MIN 15SEG"))
        .alias("tiempo_uso"),
        F.col("event_id").cast("string").alias("nombre_origen"),
        F.col("event_type").alias("nombre_destino"),
    )
    return normalize_dialect(raw, FIELDS_V4).select(
        "rent_station", "rent_date", "return_date", "return_station"
    )


@register(
    "partitioned_sink_day_counts",
    """
    SELECT date_trunc('day', ts) AS day,
           event_type,
           count(*)::BIGINT AS n,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM events
    WHERE CAST(ts AS DATE) >= (SELECT min(CAST(ts AS DATE)) FROM events)
      AND CAST(ts AS DATE) <  (SELECT min(CAST(ts AS DATE)) FROM events) + 7
    GROUP BY 1, 2
    """,
)
def partitioned_sink_day_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned read under a hash
    gate: events written day-partitioned through the dynamic-overwrite
    sink (the idempotent daily-backfill layout), then read back with a
    first-week day filter that must resolve via PARTITION pruning (the
    filter key IS the directory key; tests/test_io.py asserts the plan's
    PartitionFilters carry it). The oracle filters the original table
    directly, so a row lost or duplicated by the partitioned write or
    the pruned read breaks the hash."""
    from bicis_spark.sources.io import staging_dir

    from bicis_spark.sources.io import overwrite_partitions_dynamic

    ev = read_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    import shutil

    path = staging_dir("bicis_spark_part_sink_")
    try:
        overwrite_partitions_dynamic(ev, path, ["event_date"])

        first_day = ev.agg(F.min("event_date")).first()[0]
        # schema-explicit read of the partitioned layout: the partition
        # column comes back from directory names, data from the files
        back = spark.read.parquet(path).where(
            (F.col("event_date") >= F.lit(first_day))
            & (F.col("event_date") < F.date_add(F.lit(first_day), 7))
        )
        return (
            back.groupBy(
                F.col("event_date").cast("timestamp").alias("day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("user_id").alias("n_users"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "bucketed_join_order_revenue",
    """
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_lines,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_order_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join under a hash gate: orders and lineitem
    are WRITTEN as tables bucketed on the join key (equal bucket counts,
    the write-time shuffle being the only one ever paid — tests/test_io.py
    asserts the zero-Exchange plan), then joined and aggregated. The
    oracle joins the original parquet directly, so bucket routing errors
    (a row hashed into the wrong bucket, a bucket dropped) break the
    hash. At 100 TB this is THE repeated-join layout: both fact tables
    pre-shuffled once at ingest, every subsequent join exchange-free."""
    import uuid

    from bicis_spark.sources.io import write_bucketed_table

    tag = uuid.uuid4().hex[:8]
    lt, rt = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    # writes inside the try: if the second write fails, the finally still
    # drops the first table instead of leaking it into the warehouse
    try:
        write_bucketed_table(orders, lt, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        write_bucketed_table(
            lineitem, rt, ["l_orderkey"], 8, sort_cols=["l_orderkey"]
        )
        joined = spark.table(lt).join(
            spark.table(rt),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        return (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
            # materialize BEFORE dropping the tables the plan reads from
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
