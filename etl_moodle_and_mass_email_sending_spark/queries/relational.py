"""[EXT] M5 — relational completeness (SURVEY.md §7): joins, group-bys,
windows, sort/limit/distinct, set ops, rollups, JSON extraction — the
operator classes the reference lacks (§2.6 negatives), each oracle-checked.

Numeric-parity policy: every aggregated measure is cast to an exact
DECIMAL before arithmetic, with the SAME cast chain in Spark and DuckDB —
double-sum order-dependence would otherwise make cross-engine hashes
flaky. Averages are exact-sum / count in double, rounded to 6 places.
OUTPUT projections are always DOUBLE (via `CAST(<exact agg> AS DOUBLE)`),
never DECIMAL: DuckDB's pandas conversion renders DECIMAL as float64
(`Decimal('103.50')` → `103.5`) and integer `sum()` as HUGEINT → float64,
so a Spark `Decimal`/int output hash-mismatches the oracle despite exact
value equality (round-1 verdict).  The internal arithmetic stays exact
decimal; only the final projection funnels through double (both engines
produce the identical nearest-double of the same exact value).  Integer
sums in oracle SQL are `CAST(sum(...) AS BIGINT)` for the same reason.

Scale notes per query are inline (broadcast choices, shuffle keys, AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..registry import register


def _dec(col: Column, prec: str = "18,2") -> Column:
    return col.cast(f"decimal({prec})")


# --------------------------------------------------------------------------
# rel_q1_pricing_summary — TPC-H Q1 shape: scan-heavy group-by with partial
# aggregation (map-side combine is automatic for sum/count). At 100 TB this
# is a pure scan + 6-group agg: no shuffle pressure, predicate pushed to
# parquet row groups.
# --------------------------------------------------------------------------


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # Exact-scale chain, NO intermediate rounding casts: 2-dec inputs →
    # disc_price scale 4 → charge scale 6, exact in both engines (a cast
    # back to scale 4 would round, and Spark's HALF_UP vs DuckDB's
    # round-half-even disagree on the many trailing-5 products).
    disc_price = _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"), "8,2"))
    charge = disc_price * (1 + _dec(F.col("l_tax"), "8,2"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec(F.col("l_discount"))).cast("double") / F.count("*"), 6
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2))) * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""

register("rel_q1_pricing_summary", _q1, _Q1_SQL)

# --------------------------------------------------------------------------
# rel_q3_shipping_priority — TPC-H Q3 shape: fact⨝fact⨝dim with selective
# filters, group, ordered top-10. customer side is dim-sized → broadcast;
# orders⨝lineitem shuffles on orderkey (the natural co-location key —
# bucketing both facts by orderkey removes this shuffle on a cluster).
# --------------------------------------------------------------------------


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, l = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    cutoff = F.lit("1998-01-01").cast("timestamp")
    revenue = F.sum(
        _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
    ).cast("double").alias("revenue")
    return (
        l.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

register("rel_q3_shipping_priority", _q3, _Q3_SQL)

# --------------------------------------------------------------------------
# rel_q5_region_revenue — snowflake join through region→nation→customer→
# orders→lineitem. region+nation are tiny → broadcast the whole dim chain;
# only the orders⨝lineitem shuffle remains.
# --------------------------------------------------------------------------


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, n, c, o, l = (
        load_table(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "orders", "lineitem")
    )
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "AFRICA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    revenue = F.sum(
        _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
    ).cast("double").alias("revenue")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(revenue, F.count("*").alias("n_lineitems"))
    )


_Q5_SQL = """
    SELECT n_name,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
    GROUP BY n_name
"""

register("rel_q5_region_revenue", _q5, _Q5_SQL)

# --------------------------------------------------------------------------
# rel_supplier_part_volume — fact⨝two dims: lineitem⨝supplier⨝part,
# both dims broadcast; group by supplier × brand.
# --------------------------------------------------------------------------


def _supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, p, l = (
        load_table(spark, sf_dir, t) for t in ("supplier", "part", "lineitem")
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("s_name", "p_brand")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty"),
            F.count("*").alias("n_items"),
        )
    )


register(
    "rel_supplier_part_volume",
    _supplier_part,
    """
    SELECT s_name, p_brand,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY s_name, p_brand
    """,
)

# --------------------------------------------------------------------------
# rel_top_orders_per_customer — window row_number per partition key (the
# generalization of the reference's running counter A2). Partition-local
# sort, no global ordering → scales linearly.
# --------------------------------------------------------------------------


def _top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            _dec(F.col("o_totalprice")).cast("double").alias("totalprice"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


register(
    "rel_top_orders_per_customer",
    _top_orders,
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
)

# --------------------------------------------------------------------------
# rel_running_total — cumulative window sum per customer over order time
# (explicit ROWS frame so Spark and the oracle agree on tie handling).
# --------------------------------------------------------------------------


def _running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_spend"),
    )


register(
    "rel_running_total",
    _running_total,
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)

# --------------------------------------------------------------------------
# rel_distinct_parts — distinct + exact count-distinct (the dedup primitive
# the reference lacks; README.md:72–74 lists it as unimplemented roadmap).
# --------------------------------------------------------------------------


def _distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_returnflag", "l_linestatus", "l_partkey")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


register(
    "rel_distinct_parts",
    _distinct_parts,
    """
    SELECT l_returnflag, l_linestatus,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)

# --------------------------------------------------------------------------
# rel_setops — INTERSECT / EXCEPT / UNION with distinct semantics.
# --------------------------------------------------------------------------


def _setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    furn = c.filter(F.col("c_mktsegment") == "FURNITURE").select(
        F.col("c_custkey").alias("custkey")
    )
    open_orders = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    both = furn.intersect(open_orders).withColumn("src", F.lit("both"))
    only_furn = furn.exceptAll(open_orders.distinct()).distinct().withColumn(
        "src", F.lit("furniture_only")
    )
    return both.unionByName(only_furn)


register(
    "rel_setops",
    _setops,
    """
    WITH furn AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'FURNITURE'),
         op AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT custkey, 'both' AS src FROM (SELECT custkey FROM furn INTERSECT SELECT custkey FROM op)
    UNION ALL
    SELECT custkey, 'furniture_only' AS src FROM (SELECT custkey FROM furn EXCEPT SELECT custkey FROM op)
    """,
)

# --------------------------------------------------------------------------
# rel_rollup — hierarchical aggregates in one pass (GROUPING SETS).
# --------------------------------------------------------------------------


def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
    )


register(
    "rel_rollup",
    _rollup,
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

# --------------------------------------------------------------------------
# rel_events_hourly — time-bucketed aggregation (the batch shape of the
# streaming windowed agg in streaming/): tumbling 1h windows via
# date_trunc.
# --------------------------------------------------------------------------


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


register(
    "rel_events_hourly",
    _events_hourly,
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)

# --------------------------------------------------------------------------
# rel_events_json — semi-structured extraction from the props JSON column.
# --------------------------------------------------------------------------


def _events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(k).alias("n_with_k"),
    )


register(
    "rel_events_json",
    _events_json,
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
    FROM events GROUP BY event_type
    """,
)


# --------------------------------------------------------------------------
# rel_semi_anti — semi/anti join coverage: per market segment, how many
# customers have an URGENT order (semi) and how many have no orders at all
# (anti). At scale: both are shuffle joins on custkey that never widen the
# row (semi/anti keep only the left side); Catalyst plans ExistenceJoin.
# --------------------------------------------------------------------------


def _semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    with_urgent = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_urgent"))
    )
    without_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .join(with_urgent, on="c_mktsegment", how="left")
        .join(without_orders, on="c_mktsegment", how="left")
        .select(
            "c_mktsegment",
            "n_customers",
            F.coalesce("n_with_urgent", F.lit(0)).alias("n_with_urgent"),
            F.coalesce("n_without_orders", F.lit(0)).alias(
                "n_without_orders"
            ),
        )
    )


register(
    "rel_semi_anti",
    _semi_anti,
    """
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(coalesce(sum(CASE WHEN EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT') THEN 1 END), 0)
             AS BIGINT) AS n_with_urgent,
           CAST(coalesce(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             THEN 1 END), 0) AS BIGINT) AS n_without_orders
    FROM customer c GROUP BY c_mktsegment
    """,
)


# --------------------------------------------------------------------------
# rel_scalar_subquery — big spenders: customers whose total order value
# exceeds 2× the global average customer total. Catalyst plans the scalar
# as a single-row broadcast (one extra agg pass, no per-row subquery
# execution) — the textbook decorrelation the optimizer does for free.
# --------------------------------------------------------------------------


def _scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    avg_spend = totals.agg(
        F.avg(F.col("spend").cast("double")).alias("avg_spend")
    )
    return (
        totals.crossJoin(F.broadcast(avg_spend))
        .filter(F.col("spend").cast("double") > 2 * F.col("avg_spend"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("spend").cast("double").alias("total_spend"),
        )
    )


register(
    "rel_scalar_subquery",
    _scalar_subquery,
    """
    WITH totals AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS custkey, CAST(spend AS DOUBLE) AS total_spend
    FROM totals
    WHERE CAST(spend AS DOUBLE) >
          2 * (SELECT avg(CAST(spend AS DOUBLE)) FROM totals)
    """,
)


# --------------------------------------------------------------------------
# rel_percentiles — exact interpolated percentiles (Spark `percentile` ↔
# DuckDB `quantile_cont`, same linear-interpolation definition). At 100 TB
# exact percentiles need a full sort per group — the scale path swaps in
# `percentile_approx` (t-digest) at the cost of oracle exactness; both are
# one expression swap in this plan shape.
# --------------------------------------------------------------------------


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.coalesce(F.col("value"), F.lit(0.0))
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(coalesce(value, 0.0), 0.5)"), 6).alias(
            "p50"
        ),
        F.round(F.expr("percentile(coalesce(value, 0.0), 0.95)"), 6).alias(
            "p95"
        ),
        F.round(F.min(v), 6).alias("vmin"),
        F.round(F.max(v), 6).alias("vmax"),
        F.count("*").alias("n"),
    )


register(
    "rel_percentiles",
    _percentiles,
    """
    SELECT event_type,
           round(quantile_cont(coalesce(value, 0.0), 0.5), 6) AS p50,
           round(quantile_cont(coalesce(value, 0.0), 0.95), 6) AS p95,
           round(min(coalesce(value, 0.0)), 6) AS vmin,
           round(max(coalesce(value, 0.0)), 6) AS vmax,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)


# --------------------------------------------------------------------------
# rel_data_quality — declarative ingest-gate checks over lineitem, all
# evaluated in one scan (operators/quality_checks.py).
# --------------------------------------------------------------------------


def _data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_checks import validate

    l = load_table(spark, sf_dir, "lineitem")
    return validate(
        l,
        {
            "orderkey_not_null": F.col("l_orderkey").isNotNull(),
            "quantity_in_range": F.col("l_quantity").between(1, 50),
            "discount_in_range": F.col("l_discount").between(0.0, 0.1),
            "price_positive": F.col("l_extendedprice") > 0,
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
            "tax_in_range": F.col("l_tax").between(0.0, 0.08),
        },
    )


def _data_quality_sql() -> str:
    from ..operators.quality_checks import sql_validate

    return sql_validate(
        "SELECT * FROM lineitem",
        {
            "orderkey_not_null": "l_orderkey IS NOT NULL",
            "quantity_in_range": "l_quantity BETWEEN 1 AND 50",
            "discount_in_range": "l_discount BETWEEN 0.0 AND 0.1",
            "price_positive": "l_extendedprice > 0",
            "shipdate_not_null": "l_shipdate IS NOT NULL",
            "tax_in_range": "l_tax BETWEEN 0.0 AND 0.08",
        },
    )


register("rel_data_quality", _data_quality, _data_quality_sql())


# --------------------------------------------------------------------------
# rel_latest_per_key — "current record per key" (SCD-style dedup): the most
# recent event per user.  Implemented as ONE hash aggregation with
# max_by(payload, (ts, event_id)) — partial map-side combine reduces every
# partition to ≤|users| rows BEFORE the shuffle, unlike the textbook
# row_number()-window form, which must shuffle every row and sort each
# group.  At 100 TB of events the difference is the whole job.  The
# (ts, event_id) ordering struct makes ties deterministic.
# --------------------------------------------------------------------------


def _latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    payload = F.struct(
        F.col("event_id"), F.col("ts"), F.col("event_type"), F.col("value")
    )
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(F.max_by(payload, order).alias("_last"))
        .select(
            "user_id",
            F.col("_last.event_id").alias("last_event_id"),
            F.col("_last.ts").alias("last_ts"),
            F.col("_last.event_type").alias("last_event_type"),
            _dec(F.col("_last.value")).cast("double").alias("last_value"),
        )
    )


register(
    "rel_latest_per_key",
    _latest_per_key,
    # oracle = the textbook window form; equivalent because the
    # (ts, event_id) tie-break is a total order per user
    """
    SELECT user_id,
           event_id AS last_event_id,
           CAST(ts AS TIMESTAMP) AS last_ts,
           event_type AS last_event_type,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
    FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)


# --------------------------------------------------------------------------
# rel_pivot_events — pivot event_type into measure columns, one row per
# day.  The value list is EXPLICIT: pivot without one runs a hidden
# distinct job over the full table first (an extra scan + shuffle at
# 100 TB) and makes the output schema data-dependent — a schema drift
# hazard for downstream consumers.  With literal values Catalyst compiles
# straight to one scan + conditional aggregation.
# --------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                for t in EVENT_TYPES
            ],
        )
    )


register(
    "rel_pivot_events",
    _pivot_events,
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
    FROM events GROUP BY 1
    """,
)


# --------------------------------------------------------------------------
# rel_cube_documents — CUBE over (source, lang): all four grouping sets in
# ONE pass (Spark expands grouping sets inside the aggregate — one scan,
# one shuffle — vs four separate group-bys = four scans at 100 TB).
# Subtotal rows are labelled 'ALL' via coalesce; safe because the testbed
# columns are non-null (documents.source/lang: 0 nulls, TESTDATA.md).
# --------------------------------------------------------------------------


def _cube_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.cube("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars")).alias("sum_chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            "n_docs",
            "sum_chars",
        )
    )


register(
    "rel_cube_documents",
    _cube_documents,
    """
    SELECT coalesce(source, 'ALL') AS source,
           coalesce(lang, 'ALL') AS lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY CUBE (source, lang)
    """,
)


# --------------------------------------------------------------------------
# rel_q18_big_spenders — TPC-H Q18 shape: group-HAVING on the big fact,
# then join the survivors.  Order matters at scale: aggregate lineitem
# FIRST (map-side combine collapses ~4 lines/order before the shuffle),
# filter to the rare survivors, and only then join orders + customer —
# the join inputs are then tiny.  Joining before aggregating would
# shuffle the full fact twice.
# --------------------------------------------------------------------------


def _q18_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer"
    )
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 250)
    )
    return (
        qty.join(orders, qty.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name"),
            F.col("c_custkey"),
            F.col("o_orderkey"),
            F.col("o_orderdate").alias("o_orderdate"),
            _dec(F.col("o_totalprice")).cast("double").alias("o_totalprice"),
            F.col("_sum_qty").cast("double").alias("sum_qty"),
        )
    )


register(
    "rel_q18_big_spenders",
    _q18_big_spenders,
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           CAST(q.sum_qty AS DOUBLE) AS sum_qty
    FROM (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
    ) q
    JOIN orders   ON q.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)


# --------------------------------------------------------------------------
# rel_rolling_window — time-RANGE window frame (distinct from the
# rows-frame running total): per-user rolling 1-hour event count and
# value average. The frame is defined on event-time MICROSECONDS on both
# engines (Spark rangeBetween needs a numeric ordering key; epoch-seconds
# would truncate differently than DuckDB's interval frame). One shuffle
# on user_id; the range frame is evaluated in a single ordered pass per
# partition — no self-join rewrite, which is the O(n·w) trap at scale.
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


def _rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_HOUR_US, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("n_1h"),
        F.round(
            F.sum(_dec(F.col("value"))).over(w).cast("double")
            / F.count("*").over(w),
            6,
        ).alias("avg_value_1h"),
    )


register(
    "rel_rolling_window",
    _rolling_window,
    """
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           count(*) OVER w AS n_1h,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 / count(*) OVER w, 6) AS avg_value_1h
    FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)


# --------------------------------------------------------------------------
# rel_kmv_distinct — deterministic KMV distinct-count sketch per
# event_type over user_id (operators/sketches.py has the full scale
# rationale: two-stage salted top-k, 8-byte shuffle payloads).
# --------------------------------------------------------------------------

from ..operators import sketches as _sketches  # noqa: E402


register(
    "rel_kmv_distinct",
    lambda spark, sf_dir: _sketches.kmv_distinct(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    ),
    _sketches.sql_kmv_distinct(
        "SELECT event_type, user_id FROM events", "event_type", "user_id"
    ),
)


# --------------------------------------------------------------------------
# rel_ship_lag_by_nation — operational fulfillment metric: days from
# order date to line ship date, averaged per supplier nation. The
# orderkey join is fact-to-fact (q12 posture: shuffle, never
# broadcast); supplier and nation are broadcast dims; the day
# difference is an exact integer, so the average is sum/count exact
# until the final division.
# --------------------------------------------------------------------------


def _ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum(lag).alias("_slag"),
            F.max(lag).alias("max_ship_days"),
        )
        .select(
            "n_name",
            "n_lineitems",
            F.round(
                F.col("_slag") / F.col("n_lineitems"), 6
            ).alias("avg_ship_days"),
            "max_ship_days",
        )
    )


register(
    "rel_ship_lag_by_nation",
    _ship_lag,
    """
    SELECT n.n_name,
           count(*) AS n_lineitems,
           round(CAST(sum(datediff('day', CAST(o.o_orderdate AS DATE),
                                   CAST(l.l_shipdate AS DATE)))
                      AS DOUBLE) / count(*), 6) AS avg_ship_days,
           CAST(max(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)))
                AS INTEGER) AS max_ship_days
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)


# --------------------------------------------------------------------------
# rel_new_vs_returning — daily growth accounting: per event date,
# active users split into first-ever-seen (new) and returning. The
# first-seen date is one min-aggregate per user; the daily split is
# one distinct (date, user) rollup joined against it — the DAU/new/
# returning panel every activation dashboard starts from.
# --------------------------------------------------------------------------


def _new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day as a STRING — pandas date vs datetime64 dtypes diverge
    # between the two engines' conversions, strings cannot
    e = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    daily = e.distinct()
    first = daily.groupBy("user_id").agg(F.min("day").alias("_first"))
    return (
        daily.join(first, on="user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_active"),
            F.coalesce(
                F.sum(F.when(F.col("day") == F.col("_first"), 1)),
                F.lit(0),
            ).cast("bigint").alias("n_new"),
        )
        .select(
            "day",
            "n_active",
            "n_new",
            (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        )
    )


register(
    "rel_new_vs_returning",
    _new_vs_returning,
    """
    WITH daily AS (
      SELECT DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             user_id
      FROM events
    ),
    first AS (
      SELECT user_id, min(day) AS first_day FROM daily GROUP BY 1
    )
    SELECT d.day, count(*) AS n_active,
           CAST(coalesce(sum(CASE WHEN d.day = f.first_day THEN 1 END),
                         0) AS BIGINT) AS n_new,
           count(*) - CAST(coalesce(sum(CASE WHEN d.day = f.first_day
                                         THEN 1 END), 0) AS BIGINT)
             AS n_returning
    FROM daily d JOIN first f USING (user_id)
    GROUP BY d.day
    """,
)


# --------------------------------------------------------------------------
# rel_market_basket — association rules over order baskets: for the
# top part pairs co-occurring in orders, support (pair orders / all
# orders), confidence (pair / antecedent) and lift (confidence /
# consequent support). The within-order self-join is bounded by basket
# size (TPC-H baskets are ≤ 7 lines, so ≤ 21 pairs per order — no
# quadratic blowup), and every measure is a ratio of exact integer
# counts. Canonical pair orientation part_a < part_b; top-20 by pair
# count with pair-id tie-break.
# --------------------------------------------------------------------------


def _market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = (
        load_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_orderkey").alias("_n"))
    )
    part_orders = li.groupBy("l_partkey").agg(
        F.count("*").alias("_po")
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, on="ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_pair"))
    )
    salt = F.pmod(F.xxhash64("pa", "pb"), F.lit(16))
    w1 = Window.partitionBy(salt).orderBy(
        F.col("n_pair").desc(), F.col("pa"), F.col("pb")
    )
    w2 = Window.orderBy(F.col("n_pair").desc(), F.col("pa"), F.col("pb"))
    top = (
        pairs.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= 20)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= 20)
    )
    pa_cnt = part_orders.select(
        F.col("l_partkey").alias("pa"), F.col("_po").alias("_na")
    )
    pb_cnt = part_orders.select(
        F.col("l_partkey").alias("pb"), F.col("_po").alias("_nb")
    )
    # Broadcast the 20-row `top`, never the |parts|-cardinality
    # pa_cnt/pb_cnt rollups (linear in SF — broadcasting a fact-derived
    # aggregate is a guaranteed OOM at 100 TB). The big sides stream.
    enriched = pa_cnt.join(F.broadcast(top), on="pa")
    enriched = pb_cnt.join(F.broadcast(enriched), on="pb")
    return (
        enriched.crossJoin(F.broadcast(n_orders))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_pair",
            F.round(F.col("n_pair") / F.col("_n"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("_na"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_pair") / F.col("_na"))
                / (F.col("_nb") / F.col("_n")),
                6,
            ).alias("lift"),
        )
    )


register(
    "rel_market_basket",
    _market_basket,
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT o_orderkey) AS n FROM orders),
    part_orders AS (
      SELECT l_partkey, count(*) AS po FROM li GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_pair
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    top AS (
      SELECT pa, pb, n_pair FROM pairs
      ORDER BY n_pair DESC, pa, pb LIMIT 20
    )
    SELECT t.pa AS part_a, t.pb AS part_b, t.n_pair,
           round(CAST(t.n_pair AS DOUBLE) / n.n, 6) AS support,
           round(CAST(t.n_pair AS DOUBLE) / ca.po, 6) AS confidence,
           round((CAST(t.n_pair AS DOUBLE) / ca.po)
                 / (CAST(cb.po AS DOUBLE) / n.n), 6) AS lift
    FROM top t
    JOIN part_orders ca ON t.pa = ca.l_partkey
    JOIN part_orders cb ON t.pb = cb.l_partkey
    CROSS JOIN n_orders n
    """,
)


# --------------------------------------------------------------------------
# rel_abc_analysis — ABC/Pareto inventory classification: parts sorted
# by lineitem revenue; class A = parts covering the first 80% of
# cumulative revenue, B = next 15%, C = the tail. The classic
# inventory-policy rollup. Revenue is exact DECIMAL; the cumulative
# sum over the PART-level rollup (|parts| rows, not lineitems — but
# still growing linearly with SF) runs as the TWO-PASS prefix sum
# (range-partition on revenue desc + broadcast earlier-partition
# totals), not an unpartitioned window (VERDICT r5 item 4). Exact:
# decimal partial sums reassociate. Class boundaries compare exact
# decimals so classification is deterministic.
# --------------------------------------------------------------------------


def _abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.util import two_pass_running_sum

    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            _dec(F.sum(_dec(F.col("l_extendedprice")))).alias("_rev")
        )
    )
    tot = rev.agg(F.sum("_rev").alias("_t"))
    ranked = two_pass_running_sum(
        rev,
        [F.col("_rev").desc(), F.col("l_partkey")],
        "_rev",
        out_col="_cum",
    ).crossJoin(F.broadcast(tot))
    cls = (
        F.when(
            F.col("_cum") * 100 <= F.col("_t") * 80, F.lit("A")
        )
        .when(F.col("_cum") * 100 <= F.col("_t") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    out = ranked.select(cls.alias("abc_class"), "_rev")
    tot2 = out.agg(F.sum("_rev").alias("_t2"))
    return (
        out.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("_rev").alias("_crev"),
        )
        .crossJoin(F.broadcast(tot2))
        .select(
            "abc_class",
            "n_parts",
            F.col("_crev").cast("double").alias("class_revenue"),
            F.round(
                F.col("_crev").cast("double")
                / F.col("_t2").cast("double"),
                6,
            ).alias("revenue_share"),
        )
    )


register(
    "rel_abc_analysis",
    _abc_analysis,
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(rev) AS t FROM rev),
    ranked AS (
      SELECT rev, t,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
      FROM rev CROSS JOIN tot
    ),
    classed AS (
      SELECT CASE WHEN cum * 100 <= t * 80 THEN 'A'
                  WHEN cum * 100 <= t * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev
      FROM ranked
    ),
    tot2 AS (SELECT sum(rev) AS t2 FROM classed)
    SELECT abc_class, count(*) AS n_parts,
           CAST(sum(rev) AS DOUBLE) AS class_revenue,
           round(CAST(sum(rev) AS DOUBLE) / CAST(t2 AS DOUBLE), 6)
             AS revenue_share
    FROM classed CROSS JOIN tot2
    GROUP BY abc_class, t2
    """,
)


# --------------------------------------------------------------------------
# rel_revenue_gini — revenue-concentration audit per market segment:
# the Gini coefficient over per-customer order revenue (customers with
# no orders included at zero — concentration among the eligible
# population, not just the buyers). Closed form over ranked values
# G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n with revenue in exact DECIMAL and
# ranks integer, so both sums are order-independent; the per-segment
# rank window is the exact computation's inherent sort (the sampled
# alternative at extreme scale is rel_quantile_sketch's bottom-k
# machinery).
# --------------------------------------------------------------------------


def _revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(_dec(F.sum(_dec(F.col("o_totalprice")))).alias("_rev"))
    )
    base = c.join(rev, c.c_custkey == rev.o_custkey, "left").select(
        "c_mktsegment",
        "c_custkey",
        F.coalesce("_rev", F.lit(0).cast("decimal(18,2)")).alias("rev"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("rev", "c_custkey")
    ranked = base.withColumn("_i", F.row_number().over(w))
    sums = ranked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum("rev").alias("_srev"),
        F.sum(F.col("_i") * F.col("rev")).alias("_sirev"),
    )
    n = F.col("n_customers").cast("double")
    g = F.round(
        F.lit(2.0)
        * F.col("_sirev").cast("double")
        / (n * F.col("_srev").cast("double"))
        - (n + 1) / n,
        6,
    )
    return sums.select(
        "c_mktsegment",
        "n_customers",
        F.col("_srev").cast("double").alias("total_revenue"),
        g.alias("gini"),
    )


register(
    "rel_revenue_gini",
    _revenue_gini,
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT c.c_mktsegment, c.c_custkey,
             coalesce(r.rev, CAST(0 AS DECIMAL(18,2))) AS rev
      FROM customer c LEFT JOIN rev r ON c.c_custkey = r.o_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, rev,
             row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY rev, c_custkey) AS i
      FROM base
    ),
    sums AS (
      SELECT c_mktsegment, count(*) AS n_customers,
             sum(rev) AS srev, sum(i * rev) AS sirev
      FROM ranked GROUP BY 1
    )
    SELECT c_mktsegment, n_customers,
           CAST(srev AS DOUBLE) AS total_revenue,
           round(2.0 * CAST(sirev AS DOUBLE)
                 / (n_customers * CAST(srev AS DOUBLE))
                 - CAST(n_customers + 1 AS DOUBLE) / n_customers, 6)
             AS gini
    FROM sums
    """,
)


# --------------------------------------------------------------------------
# rel_dow_hour_profile — the weekly traffic heatmap: events per
# (day-of-week, hour) cell with each cell's share of total — seasonal
# capacity planning and anomaly baselining in one rollup. dayofweek is
# computed in UTC on the µs-truncated event time, identical in both
# engines (DuckDB dow: 0=Sunday; Spark dayofweek: 1=Sunday — aligned
# by the -1 shift).
# --------------------------------------------------------------------------


def _dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.dayofweek(F.col("ts")) - 1).cast("int").alias("dow"),
        F.hour(F.col("ts")).cast("int").alias("hour"),
    ).agg(F.count("*").alias("n_events"))
    tot = cells.agg(F.sum("n_events").alias("_t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n_events",
        F.round(F.col("n_events") / F.col("_t"), 6).alias("share"),
    )


register(
    "rel_dow_hour_profile",
    _dow_hour_profile,
    """
    WITH cells AS (
      SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n_events) AS t FROM cells)
    SELECT dow, hour, n_events,
           round(CAST(n_events AS DOUBLE) / t, 6) AS share
    FROM cells CROSS JOIN tot
    """,
)


# --------------------------------------------------------------------------
# rel_arrival_disorder — how out-of-order is the event feed: per
# event_type, adjacent-pair inversions in ARRIVAL order (event_id)
# where event TIME goes backwards, plus the maximum backwards jump.
# This is the measurement that picks a streaming watermark delay — the
# watermark must cover the observed lateness, and this op reads it off
# the data instead of guessing. One lag() window in event_id order;
# microsecond integer arithmetic.
# --------------------------------------------------------------------------


def _arrival_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    d = (
        e.select("event_type", "event_id", "ts")
        .withColumn("_late", prev - F.unix_micros(F.col("ts")))
    )
    return d.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.coalesce(
            F.sum(F.when(F.col("_late") > 0, 1)), F.lit(0)
        ).cast("bigint").alias("n_inversions"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("_late") > 0, 1)), F.lit(0))
            / F.count("*"),
            6,
        ).alias("inversion_rate"),
        F.coalesce(
            F.max(F.when(F.col("_late") > 0, F.col("_late"))), F.lit(0)
        ).alias("max_lateness_micros"),
    )


register(
    "rel_arrival_disorder",
    _arrival_disorder,
    """
    WITH src AS (
      SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    lagged AS (
      SELECT event_type,
             lag(epoch_us(ts)) OVER (PARTITION BY event_type
                  ORDER BY event_id) - epoch_us(ts) AS late
      FROM src
    )
    SELECT event_type, count(*) AS n_events,
           CAST(coalesce(sum(CASE WHEN late > 0 THEN 1 END), 0)
                AS BIGINT) AS n_inversions,
           round(CAST(coalesce(sum(CASE WHEN late > 0 THEN 1 END), 0)
                      AS DOUBLE) / count(*), 6) AS inversion_rate,
           coalesce(max(CASE WHEN late > 0 THEN late END), 0)
             AS max_lateness_micros
    FROM lagged GROUP BY event_type
    """,
)


# --------------------------------------------------------------------------
# rel_order_reconciliation — the classic cross-table financial audit:
# per order, o_totalprice vs the recomputed
# sum(extendedprice * (1 - discount) * (1 + tax)) over its lineitems,
# bucketed into exact / within-1% / mismatched / no-lineitems counts.
# All money math in DECIMAL (exact, order-independent); the join is
# fact-to-fact on orderkey (shuffle, never broadcast — the q12
# posture). On real ingest this is the reconciliation gate between an
# order header feed and a line-level feed.
# --------------------------------------------------------------------------


def _order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            _dec(F.col("l_extendedprice"))
            * (F.lit(1).cast("decimal(3,2)") - _dec(F.col("l_discount"), "4,2"))
            * (F.lit(1).cast("decimal(3,2)") + _dec(F.col("l_tax"), "4,2"))
        ).alias("_line_total"),
    )
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum("_line_total").alias("_computed")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _dec(F.col("o_totalprice")).alias("_stated")
    )
    joined = o.join(
        recomputed, o.o_orderkey == recomputed.l_orderkey, "left"
    ).select(
        "_stated",
        "_computed",
        F.when(F.col("_computed").isNull(), F.lit("no_lineitems"))
        .when(F.col("_computed") == F.col("_stated"), F.lit("exact"))
        .when(
            F.abs(
                F.col("_computed").cast("double")
                - F.col("_stated").cast("double")
            )
            <= F.col("_stated").cast("double") * 0.01,
            F.lit("within_1pct"),
        )
        .otherwise(F.lit("mismatch"))
        .alias("status"),
    )
    tot = joined.groupBy().agg(F.count("*").alias("_t"))
    return (
        joined.groupBy("status")
        .agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "status",
            "n_orders",
            F.round(F.col("n_orders") / F.col("_t"), 6).alias("share"),
        )
    )


register(
    "rel_order_reconciliation",
    _order_reconciliation,
    """
    WITH recomputed AS (
      SELECT l_orderkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(3,2))
                    - CAST(l_discount AS DECIMAL(4,2)))
                 * (CAST(1 AS DECIMAL(3,2))
                    + CAST(l_tax AS DECIMAL(4,2)))) AS computed
      FROM lineitem GROUP BY 1
    ),
    joined AS (
      SELECT CASE
               WHEN r.computed IS NULL THEN 'no_lineitems'
               WHEN r.computed = CAST(o.o_totalprice AS DECIMAL(18,2))
                 THEN 'exact'
               WHEN abs(CAST(r.computed AS DOUBLE)
                        - CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                               AS DOUBLE))
                    <= CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                            AS DOUBLE) * 0.01
                 THEN 'within_1pct'
               ELSE 'mismatch'
             END AS status
      FROM orders o LEFT JOIN recomputed r ON o.o_orderkey = r.l_orderkey
    ),
    tot AS (SELECT count(*) AS t FROM joined)
    SELECT status, count(*) AS n_orders,
           round(CAST(count(*) AS DOUBLE) / t, 6) AS share
    FROM joined CROSS JOIN tot
    GROUP BY status, t
    """,
)


# --------------------------------------------------------------------------
# rel_gap_detection — ingest-completeness monitor: per event_type, the
# inter-arrival gaps longer than GAP_THRESHOLD (lead over event time).
# A pipeline that silently stops delivering a source shows up here
# before any downstream metric moves. Same one-window shape as the
# TWAP below; microsecond integer arithmetic, no float risk.
# --------------------------------------------------------------------------

GAP_THRESHOLD_MICROS = 3_600_000_000  # 1 hour


def _gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros(F.col("ts"))).over(w)
    return (
        e.select("event_type", "ts", "event_id")
        .withColumn("_next", nxt)
        .withColumn(
            "gap_micros", F.col("_next") - F.unix_micros(F.col("ts"))
        )
        .filter(F.col("gap_micros") > GAP_THRESHOLD_MICROS)
        .select(
            "event_type",
            F.unix_micros(F.col("ts")).alias("gap_start_micros"),
            F.col("_next").alias("gap_end_micros"),
            "gap_micros",
        )
    )


register(
    "rel_gap_detection",
    _gap_detection,
    f"""
    WITH src AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events
    ),
    gaps AS (
      SELECT event_type, epoch_us(ts) AS gap_start_micros,
             lead(epoch_us(ts)) OVER (PARTITION BY event_type
                  ORDER BY ts, event_id) AS gap_end_micros
      FROM src
    )
    SELECT event_type, gap_start_micros, gap_end_micros,
           gap_end_micros - gap_start_micros AS gap_micros
    FROM gaps
    WHERE gap_end_micros - gap_start_micros > {GAP_THRESHOLD_MICROS}
    """,
)


# --------------------------------------------------------------------------
# rel_time_weighted_avg — TWAP of event values per event_type: each
# reading holds until the next one (lead over (ts, event_id)), so its
# weight is that holding duration in microseconds; the final row of a
# series carries no weight. The weighted sum accumulates as
# DECIMAL(18,6)-value x bigint-micros products (exact, order-
# independent — the rel_trend_slope recipe), so the average is
# deterministic cross-engine. The timeseries-analytics answer to "what
# was the average PRICE, not the average of the readings" when
# readings are irregular. One window pass + one partial-aggregated
# groupBy.
# --------------------------------------------------------------------------


def _time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros(F.col("ts"))).over(w)
    span = (
        e.select("event_type", "ts", "event_id", "value")
        .withColumn("_w", nxt - F.unix_micros(F.col("ts")))
        .filter(F.col("_w").isNotNull())
    )
    wsum = F.sum(
        F.round(F.col("value"), 6).cast("decimal(18,6)") * F.col("_w")
    )
    return span.groupBy("event_type").agg(
        F.count("*").alias("n_obs"),
        F.sum("_w").alias("total_micros"),
        F.round(
            wsum.cast("double") / F.sum("_w").cast("double"), 6
        ).alias("twap"),
    )


register(
    "rel_time_weighted_avg",
    _time_weighted_avg,
    """
    WITH src AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    span AS (
      SELECT event_type,
             CAST(round(value, 6) AS DECIMAL(18,6)) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY event_type
                  ORDER BY ts, event_id) - epoch_us(ts) AS w
      FROM src
    )
    SELECT event_type, count(*) AS n_obs,
           CAST(sum(w) AS BIGINT) AS total_micros,
           round(CAST(sum(v * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6)
             AS twap
    FROM span WHERE w IS NOT NULL
    GROUP BY event_type
    """,
)


# --------------------------------------------------------------------------
# rel_k_anonymity — privacy audit over customer quasi-identifiers
# (nation, market segment): per k threshold, equivalence classes and
# rows below it (operators/quality_checks.py).
# --------------------------------------------------------------------------


from ..operators import quality_checks as _qc  # noqa: E402


register(
    "rel_k_anonymity",
    lambda spark, sf_dir: _qc.k_anonymity(
        load_table(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
    ),
    _qc.sql_k_anonymity(
        "SELECT * FROM customer", ["c_nationkey", "c_mktsegment"]
    ),
)


# --------------------------------------------------------------------------
# rel_psi_drift — population-stability-index drift of event values
# between the even/odd event-id cohorts (a deterministic stand-in for
# week-over-week snapshots): 10 global equal-width bins, per-bin
# (p − q)·ln(p/q) with the conventional 1e-4 floor.
# --------------------------------------------------------------------------


def _psi(spark, sf_dir):
    from pyspark.sql import functions as F

    return _qc.psi_drift(
        load_table(spark, sf_dir, "events"),
        "value",
        (F.col("event_id") % 2).cast("int"),
    )


register(
    "rel_psi_drift",
    _psi,
    _qc.sql_psi_drift(
        "SELECT * FROM events", "value",
        "CAST(event_id % 2 AS INTEGER)",
    ),
)


# --------------------------------------------------------------------------
# rel_quantile_sketch — mergeable bottom-k-sample quantile estimation
# (operators/sketches.py): nearest-rank p50/p90 of event values from a
# deterministic 64-row hash sample, exact twins alongside.
# --------------------------------------------------------------------------


register(
    "rel_quantile_sketch",
    lambda spark, sf_dir: _sketches.sample_quantiles(
        load_table(spark, sf_dir, "events"),
        "event_type", "event_id", "value",
    ),
    _sketches.sql_sample_quantiles(
        "SELECT event_type, event_id, value FROM events",
        "event_type", "event_id", "value",
    ),
)


# --------------------------------------------------------------------------
# rel_benford_check — first-significant-digit Benford audit over order
# totals (operators/quality_checks.py): the data-quality screen for
# amount columns, 9 spine rows with per-digit chi-square terms.
# --------------------------------------------------------------------------


register(
    "rel_benford_check",
    lambda spark, sf_dir: _qc.benford_check(
        load_table(spark, sf_dir, "orders"), "o_totalprice"
    ),
    _qc.sql_benford_check("SELECT * FROM orders", "o_totalprice"),
)


# --------------------------------------------------------------------------
# rel_hll_distinct — deterministic HyperLogLog sketch: distinct
# event_ids per event_type (thousands per group, so the raw estimator
# branch is exercised, unlike the 150-user KMV demo above). Registers
# (not top-k) — a single
# map-side-combining shuffle, no window sort; the cheaper sketch at
# very high cardinality (operators/sketches.py has the exact-integer
# harmonic-sum determinism story).
# --------------------------------------------------------------------------


register(
    "rel_hll_distinct",
    lambda spark, sf_dir: _sketches.hll_distinct(
        load_table(spark, sf_dir, "events"), "event_type", "event_id"
    ),
    _sketches.sql_hll_distinct(
        "SELECT event_type, event_id FROM events", "event_type", "event_id"
    ),
)


# --------------------------------------------------------------------------
# rel_q13_custdist — TPC-H Q13 shape: LEFT OUTER join customer→orders
# with a predicate ON THE JOIN (not a post-filter — customers whose only
# orders are urgent must still appear with count 0), per-customer order
# count, then the tiny distribution aggregate. Scale: the outer join
# shuffles on custkey and the first groupBy reuses that exact
# partitioning (no second exchange of the big side); the distribution
# groupBy moves one row per distinct count.
# --------------------------------------------------------------------------


def _q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            on=customer["c_custkey"] == orders["o_custkey"],
            how="left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


register(
    "rel_q13_custdist",
    _q13_custdist,
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)


# --------------------------------------------------------------------------
# rel_q7_nation_volume — TPC-H Q7 shape: the big fact joined through two
# INDEPENDENT dimension chains (supplier→nation as n1, order→customer→
# nation as n2) with a symmetric pair predicate, grouped by (nation pair,
# ship year). The nation table joins twice under different aliases — the
# classic self-aliased-dim pattern. Scale: every dim chain is
# broadcast-size (nation, supplier, customer all ≪ fact), so the plan is
# fact-scan + 4 broadcast joins + one partial-aggregated groupBy; the
# only shuffle is the final (pair, year) agg, whose key space is tiny.
# --------------------------------------------------------------------------

_Q7_NATIONS = 4


def _q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, supplier, nation = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        lineitem.join(F.broadcast(supplier), on=F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, on=F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), on=F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), on=F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), on=F.col("c_nationkey") == F.col("c_nk"))
        # cross-border trade within the focus nation set: the nationkey
        # bounds prune each nation dim BEFORE its broadcast
        .filter(
            (F.col("s_nk") < _Q7_NATIONS)
            & (F.col("c_nk") < _Q7_NATIONS)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    volume = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(volume).cast("double"), 2).alias("revenue"))
    )


register(
    "rel_q7_nation_volume",
    _q7_nation_volume,
    f"""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               AS volume
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey < {_Q7_NATIONS} AND n2.n_nationkey < {_Q7_NATIONS}
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)


# --------------------------------------------------------------------------
# rel_funnel_stages — ordered conversion funnel (view → later click →
# later purchase) per user. The stage chain is three aggregations ALL
# keyed on user_id: after the first groupBy the data is partitioned by
# user_id, and the two join-then-regroup rounds reuse that partitioning
# (no new exchange of the big side at scale — same-key joins are
# co-partitioned). A window/self-join encoding would carry every event
# pair; this carries one row per user between stages.
# --------------------------------------------------------------------------


def _funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    c1 = (
        e.filter(F.col("event_type") == "click")
        .join(v1, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p1 = (
        e.filter(F.col("event_type") == "purchase")
        .join(c1, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v1.join(c1, "user_id", "left")
        .join(p1, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            (
                F.lit(1)
                + F.col("first_click").isNotNull().cast("int")
                + F.col("first_purchase").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


register(
    "rel_funnel_stages",
    _funnel_stages,
    """
    WITH base AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v1 AS (
      SELECT user_id, min(ts) AS first_view FROM base
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c1 AS (
      SELECT b.user_id, min(b.ts) AS first_click
      FROM base b JOIN v1 USING (user_id)
      WHERE b.event_type = 'click' AND b.ts > v1.first_view
      GROUP BY b.user_id
    ),
    p1 AS (
      SELECT b.user_id, min(b.ts) AS first_purchase
      FROM base b JOIN c1 USING (user_id)
      WHERE b.event_type = 'purchase' AND b.ts > c1.first_click
      GROUP BY b.user_id
    )
    SELECT v1.user_id, v1.first_view, c1.first_click, p1.first_purchase,
           1 + CAST(c1.first_click IS NOT NULL AS INTEGER)
             + CAST(p1.first_purchase IS NOT NULL AS INTEGER) AS stage
    FROM v1 LEFT JOIN c1 USING (user_id) LEFT JOIN p1 USING (user_id)
    """,
)


# --------------------------------------------------------------------------
# rel_retention — day-over-day cohort retention: of the users active on
# day d, the fraction also active on d+1. One distinct (user, day) pass
# (map-side combining shuffle), then a self-join keyed (user, day+1) —
# both sides are the POST-distinct frame (one row per user-day), so the
# join input is orders of magnitude smaller than the event stream; the
# final per-day rollup is tiny.
# --------------------------------------------------------------------------


def _retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # day as a TIMESTAMP (midnight), not DATE: both engines' pandas
    # conversions agree on timestamps, while DATE reprs diverge
    active = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    nxt = active.select(
        "user_id", (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day")
    )
    joined = active.join(nxt, ["user_id", "day"], "left_semi")
    per_day = active.groupBy("day").agg(F.count("*").alias("n_active"))
    retained = joined.groupBy("day").agg(F.count("*").alias("n_retained"))
    return (
        per_day.join(retained, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)) / F.col("n_active"), 6
            ).alias("retention_rate"),
        )
    )


register(
    "rel_retention",
    _retention,
    """
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS day
      FROM events
    ),
    retained AS (
      SELECT a.day, count(*) AS n_retained
      FROM active a
      WHERE EXISTS (
        SELECT 1 FROM active b
        WHERE b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
      )
      GROUP BY a.day
    )
    SELECT p.day, p.n_active,
           coalesce(r.n_retained, 0) AS n_retained,
           round(coalesce(r.n_retained, 0) / p.n_active, 6)
             AS retention_rate
    FROM (SELECT day, count(*) AS n_active FROM active GROUP BY day) p
    LEFT JOIN retained r USING (day)
    """,
)


# --------------------------------------------------------------------------
# rel_scd2_history — slowly-changing-dimension type-2 build: collapse each
# user's event-type stream into change intervals [effective_from,
# effective_to) with NULL for the open current row. One shuffle on
# user_id; both window passes (change detection via lag, interval close
# via lead) reuse that single partitioning. The batch sibling of
# rel_latest_per_key (SCD1 latest-wins).
# --------------------------------------------------------------------------


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    byu = Window.partitionBy("user_id").orderBy("ts", "event_type")
    changes = (
        e.withColumn("_prev", F.lag("event_type").over(byu))
        .filter(
            F.col("_prev").isNull() | (F.col("event_type") != F.col("_prev"))
        )
    )
    # same (ts, event_type) tie-break as the change-detection window so
    # effective_to is deterministic if a user has two changes in one µs
    byu2 = Window.partitionBy("user_id").orderBy("ts", "event_type")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(byu2).alias("effective_to"),
    )


register(
    "rel_scd2_history",
    _scd2_history,
    """
    WITH base AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_type) AS prev
      FROM base
    )
    SELECT user_id, event_type, ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_type) AS effective_to
    FROM changes
    WHERE prev IS NULL OR event_type <> prev
    """,
)


# --------------------------------------------------------------------------
# rel_session_concurrency — max concurrent sessions per day via the
# sweep-line encoding: sessions → (+1 at start, −1 one µs past end — closed
# intervals, so instantaneous sessions still count), deltas
# pre-aggregated PER TIMESTAMP (what makes the running sum deterministic
# under ties), a TWO-PASS global running sum (range-partition on t,
# per-partition cumulative sum, broadcast earlier-partition totals — no
# unpartitioned window anywhere: the change-point frame is
# O(distinct event timestamps), fact-sized at 100 TB), then a per-day max.
# VERDICT r5 item 2: same pattern as sinks/smtp.py's send-order stamp,
# now shared via operators/util.two_pass_running_sum.
# --------------------------------------------------------------------------


def _session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.util import two_pass_running_sum
    from .streaming_q import rel_sessionize

    sess = rel_sessionize(spark, sf_dir)
    deltas = (
        sess.select(F.col("session_start").alias("t"), F.lit(1).alias("d"))
        .unionByName(
            # closed intervals: release one µs PAST the end, so a
            # single-event session (start == end) still counts as active
            sess.select(
                (
                    F.col("session_end") + F.expr("INTERVAL 1 MICROSECOND")
                ).alias("t"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("t")
        .agg(F.sum("d").alias("delta"))
    )
    swept = two_pass_running_sum(
        deltas, [F.col("t")], "delta", out_col="concurrent"
    )
    return (
        swept.groupBy(F.date_trunc("day", F.col("t")).alias("day"))
        .agg(F.max("concurrent").alias("max_concurrent"))
    )


register(
    "rel_session_concurrency",
    _session_concurrency,
    """
    WITH base AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS brk
      FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), grp AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS g
      FROM marked
    ), sess AS (
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
      FROM grp GROUP BY user_id, g
    ), deltas AS (
      SELECT t, CAST(sum(d) AS BIGINT) AS delta FROM (
        SELECT session_start AS t, 1 AS d FROM sess
        UNION ALL
        SELECT session_end + INTERVAL 1 MICROSECOND AS t, -1 AS d FROM sess
      ) GROUP BY t
    ), swept AS (
      SELECT t, CAST(sum(delta) OVER (ORDER BY t ROWS UNBOUNDED
               PRECEDING) AS BIGINT) AS concurrent
      FROM deltas
    )
    SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
           CAST(max(concurrent) AS BIGINT) AS max_concurrent
    FROM swept GROUP BY 1
    """,
)


# --------------------------------------------------------------------------
# rel_value_deciles — ntile decile assignment per event_type over value
# (tie-broken by event_id so both engines bucket identically), rolled up
# to per-decile stats. The ntile window and the rollup share the
# event_type shuffle key; within-partition sorts are the only extra cost
# — the standard "distribution profile" shape for monitoring a metric's
# spread per segment.
# --------------------------------------------------------------------------


def _value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.round(
                F.sum(_dec(F.col("value"))).cast("double") / F.count("*"), 6
            ).alias("avg_value"),
        )
    )


register(
    "rel_value_deciles",
    _value_deciles,
    """
    SELECT event_type, decile, count(*) AS n,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM (
      SELECT event_type, value, event_id,
             CAST(ntile(10) OVER (PARTITION BY event_type
                  ORDER BY value, event_id) AS INTEGER) AS decile
      FROM events WHERE value IS NOT NULL
    )
    GROUP BY event_type, decile
    """,
)


# --------------------------------------------------------------------------
# rel_value_outliers — per-user z-score anomaly flags: events whose value
# deviates > 2σ from that user's own mean. Two passes over the same
# user_id partitioning: one agg for per-user moments (exact DECIMAL sums
# → deterministic mean/variance), one broadcast-join back to flag rows.
# Variance uses the E[x²]−E[x]² form off the same exact sums, rounded
# before the sqrt so both engines branch identically at the threshold.
# --------------------------------------------------------------------------


def _value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    sums = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(_dec(F.col("value"))).alias("_s"),
        F.sum(_dec(F.col("value")) * _dec(F.col("value"))).alias("_s2"),
    )
    stats = sums.select(
        "user_id",
        "n",
        (F.col("_s").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            F.round(
                F.col("_s2").cast("double") / F.col("n")
                - F.pow(F.col("_s").cast("double") / F.col("n"), 2),
                9,
            )
        ).alias("sd"),
    ).filter(F.col("n") >= 10).filter(F.col("sd") > 0)
    flagged = e.join(F.broadcast(stats), "user_id").filter(
        F.abs(F.col("value") - F.col("mean")) > 2 * F.col("sd")
    )
    return flagged.select(
        "event_id",
        "user_id",
        "value",
        F.round("mean", 6).alias("mean"),
        F.round("sd", 6).alias("sd"),
        F.round(
            (F.col("value") - F.col("mean")) / F.col("sd"), 4
        ).alias("z"),
    )


register(
    "rel_value_outliers",
    _value_outliers,
    """
    WITH base AS (
      SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL
    ),
    sums AS (
      SELECT user_id, count(*) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
               AS s2
      FROM base GROUP BY user_id
    ),
    stats AS (
      SELECT user_id, n,
             CAST(s AS DOUBLE) / n AS mean,
             sqrt(round(CAST(s2 AS DOUBLE) / n
                  - pow(CAST(s AS DOUBLE) / n, 2), 9)) AS sd
      FROM sums WHERE n >= 10
    ),
    stats2 AS (
      SELECT * FROM stats WHERE sd > 0
    )
    SELECT b.event_id, b.user_id, b.value,
           round(t.mean, 6) AS mean, round(t.sd, 6) AS sd,
           round((b.value - t.mean) / t.sd, 4) AS z
    FROM base b JOIN stats2 t USING (user_id)
    WHERE abs(b.value - t.mean) > 2 * t.sd
    """,
)


# --------------------------------------------------------------------------
# rel_event_pmi — pointwise mutual information between event types
# co-occurring in the same (user, day) basket — the association-mining
# shape (market-basket lift). The pair join is a self-join of the
# DISTINCT basket-membership frame on the basket key: with a bounded
# type vocabulary each basket contributes ≤ C(5,2) pairs, so the join
# fan-out is bounded per key regardless of event volume — the raw event
# stream never self-joins. PMI = ln(n_ab·N / (n_a·n_b)) stays in integer
# counts until one final ln, rounded to 6 — deterministic cross-engine.
# --------------------------------------------------------------------------


def _event_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    member = e.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).distinct()
    n_baskets = member.select("user_id", "day").distinct().agg(
        F.count("*").alias("_nb")
    )
    singles = member.groupBy("event_type").agg(F.count("*").alias("n_single"))
    a = member.select(
        "user_id", "day", F.col("event_type").alias("type_a")
    )
    b = member.select(
        "user_id", "day", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n_single").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n_single").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * F.col("_nb")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


register(
    "rel_event_pmi",
    _event_pmi,
    """
    WITH member AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS day,
             event_type
      FROM events
    ),
    nb AS (SELECT count(*) AS n FROM (SELECT DISTINCT user_id, day FROM member)),
    singles AS (
      SELECT event_type, count(*) AS n_single FROM member GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_ab
      FROM member a JOIN member b
        ON a.user_id = b.user_id AND a.day = b.day
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           round(ln(CAST(p.n_ab AS DOUBLE) * nb.n
                 / (CAST(sa.n_single AS DOUBLE) * sb.n_single)), 6) AS pmi
    FROM pairs p
    JOIN singles sa ON p.type_a = sa.event_type
    JOIN singles sb ON p.type_b = sb.event_type
    CROSS JOIN nb
    """,
)


# --------------------------------------------------------------------------
# rel_incremental_agg — snapshot ⊎ delta aggregate merge: the pattern an
# incremental 100 TB pipeline lives on. The per-(user, type) rollup is
# built twice — once over history (days 1-20), once over the new arrivals
# (day > 20) — and MERGED by summing the algebraic pieces (sum, count),
# with avg derived only after the merge (avg itself is not mergeable;
# its sum/count decomposition is). The oracle is the one-shot rollup
# over everything: merging partials must be indistinguishable from
# recomputing — that equivalence is exactly what lets a production
# pipeline process only the delta each day. Counts use
# sum(count)::BIGINT on both sides so the merged dtypes match.
# --------------------------------------------------------------------------

_INCR_CUTOFF = "2024-01-21"


def _incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.lit(_INCR_CUTOFF).cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "event_type").agg(
            F.sum(_dec(F.col("value"))).alias("s"),
            F.count("*").alias("n"),
        )

    snapshot = rollup(e.filter(F.col("ts") < cut))
    delta = rollup(e.filter(F.col("ts") >= cut))
    merged = (
        snapshot.unionByName(delta)
        .groupBy("user_id", "event_type")
        .agg(F.sum("s").alias("s"), F.sum("n").cast("bigint").alias("n"))
    )
    return merged.select(
        "user_id",
        "event_type",
        F.col("s").cast("double").alias("sum_value"),
        F.col("n").alias("n_events"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_value"),
    )


register(
    "rel_incremental_agg",
    _incremental_agg,
    f"""
    SELECT user_id, event_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY user_id, event_type
    """,
)


# --------------------------------------------------------------------------
# rel_snapshot_diff — table-version reconciliation: FULL OUTER join two
# snapshots on the key and classify every row as added / removed /
# modified / unchanged-excluded, comparing payloads by md5 so the join
# carries an 8-byte digest per side instead of the document text (the
# same shuffle-the-digest-not-the-payload rule as dedup_exact). v2 is a
# deterministic mutation of the documents table (drop every 11th doc,
# rewrite every 13th) so all three classes are exercised; in production
# the two sides are yesterday's and today's snapshot of the same table.
# --------------------------------------------------------------------------


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = d.select("doc_id", F.md5("text").alias("h"))
    v2 = (
        d.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 13 == 0, F.upper(F.col("text"))
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
        # new arrivals, so the 'added' class is exercised too
        .unionByName(
            d.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 500_000).alias("doc_id"),
                F.md5("text").alias("h"),
            )
        )
    )
    j = v1.select(F.col("doc_id"), F.col("h").alias("h1")).join(
        v2.select(F.col("doc_id"), F.col("h").alias("h2")),
        "doc_id",
        "full_outer",
    )
    return (
        j.select(
            "doc_id",
            F.when(F.col("h1").isNull(), F.lit("added"))
            .when(F.col("h2").isNull(), F.lit("removed"))
            .when(F.col("h1") != F.col("h2"), F.lit("modified"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
        )
        .filter(F.col("change_type") != "unchanged")
    )


register(
    "rel_snapshot_diff",
    _snapshot_diff,
    """
    WITH v1 AS (
      SELECT doc_id, md5(text) AS h FROM documents
    ),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END)
               AS h
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 500000 AS doc_id, md5(text) AS h
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT doc_id, change_type FROM (
      SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             CASE WHEN v1.h IS NULL THEN 'added'
                  WHEN v2.h IS NULL THEN 'removed'
                  WHEN v1.h <> v2.h THEN 'modified'
                  ELSE 'unchanged' END AS change_type
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    ) WHERE change_type <> 'unchanged'
    """,
)


# --------------------------------------------------------------------------
# rel_winsorize — percentile capping: clamp each value to its segment's
# [p05, p95] band and report the shift. Two stages sharing the
# event_type key: the per-segment percentile agg (tiny result —
# broadcast back over the stream) and the clamp + rollup. Rounding the
# band BEFORE clamping keeps the boundary branch identical across
# engines (percentile/quantile_cont share the linear-interpolation
# definition). The scale note from rel_percentiles applies: exact
# percentiles sort per group; the approx swap is one expression.
# --------------------------------------------------------------------------


def _winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bands = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )
    clamped = e.join(F.broadcast(bands), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias(
            "w"
        ),
    )
    return clamped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") < F.col("w")).cast("bigint")).alias(
            "n_capped_low"
        ),
        F.sum((F.col("value") > F.col("w")).cast("bigint")).alias(
            "n_capped_high"
        ),
        F.round(
            F.sum(_dec(F.col("value"))).cast("double") / F.count("*"), 6
        ).alias("mean_raw"),
        F.round(
            F.sum(_dec(F.col("w"), "18,6")).cast("double") / F.count("*"), 6
        ).alias("mean_winsorized"),
    )


register(
    "rel_winsorize",
    _winsorize,
    """
    WITH base AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    bands AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS p05,
             round(quantile_cont(value, 0.95), 6) AS p95
      FROM base GROUP BY event_type
    ),
    clamped AS (
      SELECT b.event_type, b.value,
             least(greatest(b.value, d.p05), d.p95) AS w
      FROM base b JOIN bands d USING (event_type)
    )
    SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN value < w THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_low,
           CAST(sum(CASE WHEN value > w THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_high,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS mean_raw,
           round(CAST(sum(CAST(w AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS mean_winsorized
    FROM clamped GROUP BY event_type
    """,
)


# --------------------------------------------------------------------------
# rel_skew_salted_join — the join-side twin of rel_skew_salted_agg
# (operators/skew.py::salted_join): events ⋈ per-user dim with the dim
# replicated across 16 salts so a hot user's events spread over 16
# reducers instead of one. The oracle is the plain join + rollup —
# salting is physical, not semantic.
# --------------------------------------------------------------------------


def _skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        e.select("user_id", "event_id", "value"),
        c,
        key="user_id",
        salt_source="event_id",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(_dec(F.col("value"))).cast("double"), 6
        ).alias("sum_value"),
    )


register(
    "rel_skew_salted_join",
    _skew_salted_join,
    """
    SELECT c_mktsegment, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE value IS NOT NULL
    GROUP BY c_mktsegment
    """,
)


# --------------------------------------------------------------------------
# rel_zorder_layout — Morton-order file-bucket assignment over
# (user_id, hour-of-month): rows are ranked by the bit-interleaved
# zvalue and cut into 32 range buckets — exactly what
# repartitionByRange(zvalue) does before a layout-optimizing write, so
# each bucket (file) has tight min/max on BOTH keys and scans filtering
# on either dimension prune files. The bucket split reproduces ntile(32)
# semantics exactly (so the assignment stays oracle-checkable) but is
# computed scale-safely: two-pass global rank (range-partition on
# (zvalue, event_id) + per-partition row_number + broadcast offsets) and
# bucket arithmetic from (rank, total) — no global-window single-task
# sort over the fact table (VERDICT r5 item 3).
# --------------------------------------------------------------------------


def _zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import zorder_value
    from ..operators.util import ntile_from_rank, two_pass_rank

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000))
        .cast("bigint")
        .alias("epoch_hour"),
    )
    z = e.withColumn("zvalue", zorder_value("user_id", "epoch_hour"))
    ranked = two_pass_rank(
        z, [F.col("zvalue"), F.col("event_id")], out_col="_rank"
    )
    # total row count as a broadcast 1-row aggregate over the ranked frame
    # (cheap: the rank's range shuffle is checkpointed) — never collected
    # driver-side.
    total = ranked.agg(F.max("_rank").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "event_id",
            "user_id",
            "epoch_hour",
            "zvalue",
            ntile_from_rank(
                F.col("_rank"), F.col("_n"), 32
            ).alias("file_bucket"),
        )
    )


def _sql_zorder_layout() -> str:
    from ..operators.sketches import sql_zorder_value

    zexpr = sql_zorder_value("user_id", "epoch_hour")
    return f"""
    WITH base AS (
      SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS epoch_hour
      FROM events
    ),
    z AS (SELECT *, {zexpr} AS zvalue FROM base)
    SELECT event_id, user_id, epoch_hour, zvalue,
           CAST(ntile(32) OVER (ORDER BY zvalue, event_id) AS INTEGER)
             AS file_bucket
    FROM z
    """


register("rel_zorder_layout", _zorder_layout, _sql_zorder_layout())


# --------------------------------------------------------------------------
# rel_event_transitions — first-order transition matrix over each user's
# event sequence: P(next_type | type) from lag pairs. One shuffle on
# user_id for the ordered lag pass; the pair rollup and the per-source
# normalizing join are vocabulary-sized. Ties in ts are broken by
# event_id so both engines see the same sequence.
# --------------------------------------------------------------------------


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    byu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("from_type", F.lag("event_type").over(byu))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_t"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("_t"), 6).alias("p"),
    )


register(
    "rel_event_transitions",
    _event_transitions,
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type
      FROM events
    ),
    pairs AS (
      SELECT from_type, event_type AS to_type, count(*) AS n
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY from_type, event_type
    ),
    totals AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS t
      FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n, round(p.n / t.t, 6) AS p
    FROM pairs p JOIN totals t USING (from_type)
    """,
)


# --------------------------------------------------------------------------
# rel_trend_slope — per-segment least-squares trend of value over time,
# from the closed-form sums (n, Σx, Σy, Σxy, Σx²) — one partial-
# aggregated groupBy, no iteration. x is HOURS since the window start so
# the sums stay small enough for exact DECIMAL accumulation → the slope
# is deterministic cross-engine after rounding. The same five sums are
# mergeable (rel_incremental_agg pattern), so the trend updates
# incrementally at scale.
# --------------------------------------------------------------------------


def _trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (
        (F.unix_micros(F.col("ts")) - F.lit(1_704_067_200_000_000))
        / F.lit(3_600_000_000.0)
    )  # hours since 2024-01-01 UTC
    sums = e.select(
        "event_type",
        _dec(x, "18,6").alias("x"),
        _dec(F.col("value")).alias("y"),
    ).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (
        F.col("n").cast("double"),
        F.col("sx").cast("double"),
        F.col("sy").cast("double"),
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
    )
    denom = n * sxx - sx * sx
    # try_divide: a degenerate group (all x equal) has denom exactly 0 —
    # ANSI mode would throw on plain division; NULL slope matches DuckDB
    slope = F.try_divide(n * sxy - sx * sy, denom)
    return sums.select(
        "event_type",
        F.col("n"),
        F.round(slope, 6).alias("slope_per_hour"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


register(
    "rel_trend_slope",
    _trend_slope,
    """
    WITH s AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM (
        SELECT event_type,
               CAST((epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000)
                    / 3600000000.0 AS DECIMAL(18,6)) AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events WHERE value IS NOT NULL
      ) GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope_per_hour,
           round((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / n, 6) AS intercept
    FROM s
    """,
)


# --------------------------------------------------------------------------
# rel_chi_square — independence test between market segment and event
# type: chi² = Σ (observed − expected)² / expected over the contingency
# table. The observed table is one groupBy; marginals are two tiny
# rollups broadcast back; everything downstream of the first aggregation
# moves vocabulary-sized frames. All counts are integers until the final
# ratio, rounded to 6 — deterministic cross-engine.
# --------------------------------------------------------------------------


def _chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    obs = (
        e.join(F.broadcast(c), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("o"))
    )
    row_m = obs.groupBy("c_mktsegment").agg(F.sum("o").alias("_r"))
    col_m = obs.groupBy("event_type").agg(F.sum("o").alias("_c"))
    total = obs.agg(F.sum("o").alias("_t"))
    cell = (
        obs.join(F.broadcast(row_m), "c_mktsegment")
        .join(F.broadcast(col_m), "event_type")
        .crossJoin(F.broadcast(total))
        .select(
            "c_mktsegment",
            "event_type",
            "o",
            (
                F.col("_r").cast("double")
                * F.col("_c")
                / F.col("_t")
            ).alias("exp"),
        )
    )
    return (
        cell.withColumn(
            "chi2_term",
            F.round(
                F.pow(F.col("o") - F.col("exp"), 2) / F.col("exp"), 6
            ),
        )
        .select(
            "c_mktsegment",
            "event_type",
            "o",
            F.round("exp", 6).alias("expected"),
            "chi2_term",
        )
    )


register(
    "rel_chi_square",
    _chi_square,
    """
    WITH obs AS (
      SELECT c_mktsegment, event_type, count(*) AS o
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2
    ),
    rm AS (SELECT c_mktsegment, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    cm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
    SELECT obs.c_mktsegment, obs.event_type, obs.o,
           round(CAST(rm.r AS DOUBLE) * cm.c / t.n, 6) AS expected,
           round(pow(obs.o - CAST(rm.r AS DOUBLE) * cm.c / t.n, 2)
                 / (CAST(rm.r AS DOUBLE) * cm.c / t.n), 6) AS chi2_term
    FROM obs JOIN rm USING (c_mktsegment) JOIN cm USING (event_type)
    CROSS JOIN t
    """,
)


# --------------------------------------------------------------------------
# Round-4 TPC-H classics over the testbed's available columns.
#
# rel_q6_forecast_revenue — TPC-H Q6 verbatim shape: the pure-scan
# aggregate (date band + discount band + quantity cap → one global sum).
# The 100 TB posture is maximal: every predicate pushes into the parquet
# scan, the projection is two columns, and the only exchange is the
# single-row final aggregate.
# --------------------------------------------------------------------------


def _q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")), "18,4"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


register(
    "rel_q6_forecast_revenue",
    _q6,
    """
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)

# --------------------------------------------------------------------------
# rel_q4_order_priority — TPC-H Q4 shape (EXISTS-decorrelated to a semi
# join): count orders per priority having at least one late-shipped line
# (the testbed carries no commit/receipt dates, so "late" = shipped after
# the order quarter; the semi-join-then-aggregate shape is the point).
# Scale: the EXISTS lowers to LeftSemi on l_orderkey — the lineitem side
# never duplicates order rows, and the final group key has 5 values.
# --------------------------------------------------------------------------


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = (load_table(spark, sf_dir, t) for t in ("orders", "lineitem"))
    window = o.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    late = l.filter(F.col("l_shipdate") >= "1997-04-01").select("l_orderkey")
    return (
        window.join(late, window.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


register(
    "rel_q4_order_priority",
    _q4,
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= TIMESTAMP '1997-04-01'
      )
    GROUP BY o_orderpriority
    """,
)

# --------------------------------------------------------------------------
# rel_q10_returned_items — TPC-H Q10 shape: revenue lost to returns per
# customer, top 20. The fact side filters to l_returnflag = 'R' at the
# scan; only NATION is broadcast (a true fixed-size dim) — customer is
# fact-proportional (scales with SF), so the customer join shuffles and
# AQE picks the strategy at runtime, matching rel_q22's dim-chain
# posture (VERDICT r4 flagged the earlier forced customer broadcast as
# an OOM at 100 TB).
# --------------------------------------------------------------------------


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, n, o, l = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "nation", "orders", "lineitem")
    )
    revenue = F.sum(
        _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
    ).cast("double").alias("revenue")
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-07-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue)
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


register(
    "rel_q10_returned_items",
    _q10,
    """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# --------------------------------------------------------------------------
# rel_q14_promo_share — TPC-H Q14 shape: promo revenue share via a
# conditional aggregate over one month of lineitem ⨝ broadcast part.
# DOUBLE division happens once, after both DECIMAL sums finalize, so the
# engines agree bit-for-bit on the ratio input.
# --------------------------------------------------------------------------


def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, l = (load_table(spark, sf_dir, t) for t in ("part", "lineitem"))
    rev = _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
    month = l.filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    return (
        month.join(F.broadcast(p), month.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
            .alias("_promo"),
            F.sum(rev).alias("_total"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("_promo").cast("double")
                / F.col("_total").cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.col("_promo").cast("double").alias("promo_revenue"),
            F.col("_total").cast("double").alias("total_revenue"),
        )
    )


register(
    "rel_q14_promo_share",
    _q14,
    """
    WITH agg AS (
      SELECT
        sum(CASE WHEN p_type = 'PROMO'
            THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
        sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS total
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate < TIMESTAMP '1997-10-01'
    )
    SELECT round(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE), 6) AS promo_revenue_pct,
           CAST(promo AS DOUBLE) AS promo_revenue,
           CAST(total AS DOUBLE) AS total_revenue
    FROM agg
    """,
)


# --------------------------------------------------------------------------
# rel_cms_heavy_hitters — count-min-sketch frequency top-20 over
# events.user_id (operators/sketches.py: 1024 exact-integer counters
# built in one map-side-combining shuffle, broadcast back; the estimate
# is a min over integers, so the approximate operator hash-gates).
# --------------------------------------------------------------------------

register(
    "rel_cms_heavy_hitters",
    lambda spark, sf_dir: _sketches.cms_heavy_hitters(
        load_table(spark, sf_dir, "events"), "user_id"
    ),
    _sketches.sql_cms_heavy_hitters(
        "SELECT user_id FROM events", "user_id"
    ),
)


# --------------------------------------------------------------------------
# rel_bloom_prejoin — bloom-filter pre-join pruning stats: orders probed
# against a bloom of BUILDING-segment customers before the exact semi
# join (operators/sketches.py: the no-false-negative contract and the
# false-positive gap are both part of the gated output).
# --------------------------------------------------------------------------

register(
    "rel_bloom_prejoin",
    lambda spark, sf_dir: _sketches.bloom_prejoin_stats(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        "o_orderpriority",
        load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        ),
        "c_custkey",
    ),
    _sketches.sql_bloom_prejoin_stats(
        "SELECT o_custkey, o_orderpriority FROM orders",
        "o_custkey",
        "o_orderpriority",
        "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'",
        "c_custkey",
    ),
)


# --------------------------------------------------------------------------
# rel_q19_disjunctive — TPC-H Q19 shape: an OR-of-ANDs predicate spanning
# BOTH join sides. Catalyst splits the disjunction: the parts of each
# branch that touch only lineitem (quantity bands) or only part (brand ×
# size bands) are pushed to the respective scans as an OR filter, the
# cross-side conjunctions evaluate after the broadcast join — the
# archetype of complex-predicate pushdown.
# --------------------------------------------------------------------------

_Q19_BRANCHES = [
    # (brand, size_max, qty_lo, qty_hi)
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),  # absent brand — branch matches nothing
    ("Brand#3", 20, 25, 35),
]


def _q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, l = (load_table(spark, sf_dir, t) for t in ("part", "lineitem"))
    branch = None
    for brand, size_max, qlo, qhi in _Q19_BRANCHES:
        b = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, size_max))
            & (F.col("l_quantity").between(qlo, qhi))
        )
        branch = b if branch is None else (branch | b)
    revenue = F.sum(
        _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
    ).cast("double").alias("revenue")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(revenue, F.count("*").alias("n_lineitems"))
    )


_Q19_SQL_BRANCH = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
    f"AND l_quantity BETWEEN {lo} AND {hi})"
    for b, s, lo, hi in _Q19_BRANCHES
)

register(
    "rel_q19_disjunctive",
    _q19,
    f"""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {_Q19_SQL_BRANCH}
    """,
)


# --------------------------------------------------------------------------
# rel_q15_top_supplier — TPC-H Q15 shape: the revenue view + "suppliers
# hitting the maximum" correlated filter, decorrelated to a broadcast
# one-row max joined back (no second scan of the fact: the view frame is
# reused for both the max and the final filter).
# --------------------------------------------------------------------------


def _q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, l = (load_table(spark, sf_dir, t) for t in ("supplier", "lineitem"))
    revenue_view = (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
            ).cast("double").alias("total_revenue")
        )
    )
    mx = revenue_view.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue_view.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue"),
        )
    )


register(
    "rel_q15_top_supplier",
    _q15,
    """
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)

# --------------------------------------------------------------------------
# rel_q8_market_share — TPC-H Q8 shape: a nation's share of regional
# revenue per year, via conditional aggregation over the full dim chain
# (order-customer-nation-region on the demand side, supplier-nation on
# the supply side, both chains broadcast; the DOUBLE division runs once
# after both DECIMAL sums finalize).
# --------------------------------------------------------------------------


def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, n, c, s, o, l = (
        load_table(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "supplier", "orders", "lineitem")
    )
    demand = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    rev = _dec(_dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))), "18,4")
    target = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            l.l_orderkey == o.o_orderkey,
        )
        # demand (customer-derived) and supp_nation (supplier-derived) are
        # fact-proportional — no forced broadcast; AQE picks the strategy
        # (same posture as rel_q10/rel_q22; only region/nation broadcast)
        .join(demand, o.o_custkey == F.col("c_custkey"), "leftsemi")
        .join(supp_nation, l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(target).alias("_t"),
            F.sum(rev).alias("_all"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_t").cast("double") / F.col("_all").cast("double"), 6
            ).alias("mkt_share"),
            F.col("_all").cast("double").alias("region_revenue"),
        )
    )


register(
    "rel_q8_market_share",
    _q8,
    """
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS rev,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share,
           CAST(sum(rev) AS DOUBLE) AS region_revenue
    FROM base GROUP BY o_year
    """,
)


# --------------------------------------------------------------------------
# rel_q17_small_quantity — TPC-H Q17 shape: the correlated per-part
# average (l_quantity < 0.2 * avg over that part) decorrelated into an
# explicit per-part aggregate joined back — the fact scans once for the
# averages and once for the probe, both group/join keyed on l_partkey
# (one shuffle partitioning reused), with the brand dim broadcast.
# --------------------------------------------------------------------------


def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, l = (load_table(spark, sf_dir, t) for t in ("part", "lineitem"))
    brand = p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    # The brand dim restricts the probe to ~1/25 of parts, so the average
    # side is semi-joined down to the SAME partkeys before its groupBy —
    # otherwise the full lineitem keyspace shuffles to compute thresholds
    # the final join then discards (the one scale-killer VERDICT r4 found).
    # Result-identical: the probe join already restricts to brand partkeys.
    avgq = (
        l.join(F.broadcast(brand), l.l_partkey == brand.p_partkey, "leftsemi")
        .groupBy("l_partkey")
        .agg(
            # 6-decimal round keeps the threshold comparison identical
            # across engines (avg is accumulation-order-dependent in the
            # last ulp)
            F.round(F.lit(0.2) * F.avg("l_quantity"), 6).alias("_thr")
        )
    )
    return (
        l.join(F.broadcast(brand), l.l_partkey == F.col("p_partkey"))
        .join(avgq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 6
            ).alias("avg_yearly"),
            F.count("*").alias("n_lineitems"),
        )
    )


register(
    "rel_q17_small_quantity",
    _q17,
    """
    WITH thr AS (
      SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS thr
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
      GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN thr USING (l_partkey)
    WHERE p_brand = 'Brand#23'
      AND l_quantity < thr
    """,
)


# --------------------------------------------------------------------------
# rel_q22_dormant_customers — TPC-H Q22 shape (phone-cntrycode grouping
# adapted to nation — the testbed carries no phone column): wealthy
# customers (acctbal above the global positive-balance average — a
# broadcast one-row scalar, not a correlated rescan) with NO orders
# since 2000 (LeftAnti), grouped by nation. Combines the scalar-subquery
# decorrelation and anti-join machinery in one certified plan.
# --------------------------------------------------------------------------


def _q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    n, c, o = (
        load_table(spark, sf_dir, t) for t in ("nation", "customer", "orders")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("_avg")
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    wealthy = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
    )
    return (
        wealthy.join(recent, wealthy.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(_dec(F.col("c_acctbal"))).cast("double"), 6
            ).alias("total_acctbal"),
        )
    )


register(
    "rel_q22_dormant_customers",
    _q22,
    """
    WITH avg_bal AS (
      SELECT round(avg(c_acctbal), 6) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name, count(*) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS total_acctbal
    FROM customer, avg_bal
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n_name
    """,
)


# --------------------------------------------------------------------------
# rel_q2_min_price_supplier — TPC-H Q2 shape (the testbed has no partsupp
# table, so lineitem plays the part-supplier offer relation): for each
# STANDARD small part, the EUROPE supplier(s) quoting the minimum price.
# The correlated MIN subquery decorrelates into a per-part aggregate
# joined back on (partkey, price); both consumers of the offers frame
# shuffle on l_partkey (one partitioning reused), part filter broadcast
# semi-joined into the fact scan, supplier→nation→region dim chain
# broadcast only at the nation/region tier (supplier is fact-
# proportional at real TPC-H scale).
# --------------------------------------------------------------------------


def _q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s, n, r, l = (
        load_table(spark, sf_dir, t)
        for t in ("part", "supplier", "nation", "region", "lineitem")
    )
    part_f = p.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 15)
    ).select("p_partkey")
    supp_eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        l.join(F.broadcast(part_f), l.l_partkey == part_f.p_partkey, "leftsemi")
        .join(supp_eu, l.l_suppkey == supp_eu.s_suppkey)
        .select(
            "l_partkey", "l_extendedprice", "s_name", "s_acctbal", "n_name"
        )
        # two consumers (min aggregate + the join-back probe): materialize
        # the offer frame once instead of re-running the joins per consumer
        .localCheckpoint(eager=False)
    )
    # the aggregate renames its key: minp derives FROM offers, so keeping
    # the name would make the join-back a same-lineage ambiguity
    minp = offers.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("l_extendedprice").alias("_min_price")
    )
    return (
        offers.join(
            minp,
            (F.col("l_partkey") == F.col("_mk"))
            & (F.col("l_extendedprice") == F.col("_min_price")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
    )


register(
    "rel_q2_min_price_supplier",
    _q2,
    """
    WITH offers AS (
      SELECT l_partkey, l_extendedprice, s_name, s_acctbal, n_name
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND l_partkey IN (
          SELECT p_partkey FROM part
          WHERE p_type = 'STANDARD' AND p_size < 15
        )
    ),
    minp AS (
      SELECT l_partkey, min(l_extendedprice) AS min_price
      FROM offers GROUP BY l_partkey
    )
    SELECT DISTINCT o.l_partkey AS p_partkey, s_name, n_name,
           round(s_acctbal, 2) AS s_acctbal,
           o.l_extendedprice AS min_price
    FROM offers o
    JOIN minp m ON o.l_partkey = m.l_partkey
              AND o.l_extendedprice = m.min_price
    """,
)


# --------------------------------------------------------------------------
# rel_q9_product_profit — TPC-H Q9 shape: profit on a product line
# (p_name LIKE '%widget%') by supplier nation and order year. The part
# filter broadcast-semi-joins into the lineitem scan FIRST (~13% of
# parts → the orders join input shrinks before the big shuffle); orders
# joins on l_orderkey (fact-fact, shuffle); nation broadcasts onto
# supplier, the supplier join left to AQE (fact-proportional).
# --------------------------------------------------------------------------


def _q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s, n, o, l = (
        load_table(spark, sf_dir, t)
        for t in ("part", "supplier", "nation", "orders", "lineitem")
    )
    part_f = p.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    supp_nation = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", "n_name")
    amount = F.sum(
        _dec(
            _dec(F.col("l_extendedprice")) * (1 - _dec(F.col("l_discount"))),
            "18,4",
        )
    ).cast("double")
    return (
        l.join(F.broadcast(part_f), l.l_partkey == part_f.p_partkey, "leftsemi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(supp_nation, l.l_suppkey == supp_nation.s_suppkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(amount, 6).alias("sum_profit"))
    )


register(
    "rel_q9_product_profit",
    _q9,
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
             AS DOUBLE), 6) AS sum_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
    GROUP BY 1, 2
    """,
)


# --------------------------------------------------------------------------
# rel_q11_important_stock — TPC-H Q11 shape: per-part value held by one
# nation's suppliers, kept only where it exceeds a FRACTION of the
# nation's total (a one-row broadcast scalar, the same decorrelation as
# rel_q22): group-by + global-threshold HAVING. The value frame
# aggregates ONCE and is reused for both the total and the per-part
# filter via a lazy checkpoint barrier.
# --------------------------------------------------------------------------


def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, n, l = (
        load_table(spark, sf_dir, t)
        for t in ("supplier", "nation", "lineitem")
    )
    nat_supp = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
        s.s_nationkey == n.n_nationkey,
        "leftsemi",
    ).select("s_suppkey")
    per_part = (
        l.join(nat_supp, l.l_suppkey == nat_supp.s_suppkey, "leftsemi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"))).alias("_val"))
        # consumed twice (global total + the threshold filter): barrier
        # stops the scan + groupBy re-executing per consumer
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(
        (F.sum("_val") * F.lit(0.001).cast("decimal(8,4)")).alias("_thr")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val") > F.col("_thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_val").cast("double").alias("part_value"),
        )
    )


register(
    "rel_q11_important_stock",
    _q11,
    """
    WITH per_part AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
      )
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
    FROM per_part
    WHERE val > (SELECT sum(val) * CAST(0.001 AS DECIMAL(8,4)) FROM per_part)
    """,
)


# --------------------------------------------------------------------------
# rel_q16_supplier_count — TPC-H Q16 shape: distinct-supplier counts per
# part attribute triple, EXCLUDING a complaint set (the NOT IN subquery
# → broadcast anti-join; the testbed's stand-in for Q16's complaint
# suppliers is negative account balance). Distinct-agg shuffles on the
# (brand, type, size) grouping after the join — count(DISTINCT) lowers
# to the two-shuffle Expand form Spark plans for exact distincts.
# --------------------------------------------------------------------------


def _q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s, l = (
        load_table(spark, sf_dir, t) for t in ("part", "supplier", "lineitem")
    )
    part_f = p.filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 14, 23, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(part_f), l.l_partkey == part_f.p_partkey)
        .join(F.broadcast(bad_supp), l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("bigint").alias("p_size"),
            "supplier_cnt",
        )
    )


register(
    "rel_q16_supplier_count",
    _q16,
    """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)


# --------------------------------------------------------------------------
# rel_q20_excess_shippers — TPC-H Q20 shape: the nested semi-join chain.
# ASIA suppliers who moved more than 120 units of 'small%' parts during
# 1997: inner per-supplier aggregate over the part-restricted fact →
# HAVING → semi-join into supplier. The part filter broadcast-semi-joins
# into the scan; the supplier probe is the tiny aggregated survivors
# frame. (Region-level restriction rather than Q20's single nation: the
# sf0.001 testbed carries 10 suppliers across 10 nations, so any one
# nation is empty there and the parity sweep would trivially 0-row.)
# --------------------------------------------------------------------------


def _q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s, n, r, l = (
        load_table(spark, sf_dir, t)
        for t in ("part", "supplier", "nation", "region", "lineitem")
    )
    part_f = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    movers = (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(part_f), l.l_partkey == part_f.p_partkey, "leftsemi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"), "18,2")).alias("_qty"))
        .filter(F.col("_qty") > 120)
    )
    asia_nations = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
        "leftsemi",
    ).select("n_nationkey")
    return (
        s.join(
            F.broadcast(asia_nations),
            s.s_nationkey == asia_nations.n_nationkey,
            "leftsemi",
        )
        .join(movers, s.s_suppkey == movers.l_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_qty").cast("double").alias("qty_moved"),
        )
    )


register(
    "rel_q20_excess_shippers",
    _q20,
    """
    WITH movers AS (
      SELECT l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    SELECT s_suppkey, s_name, CAST(qty AS DOUBLE) AS qty_moved
    FROM supplier
    JOIN movers ON s_suppkey = l_suppkey
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    """,
)


# --------------------------------------------------------------------------
# rel_q21_sole_blame — TPC-H Q21 shape: the EXISTS + NOT-EXISTS double
# correlation ("the supplier whose line is the ONLY problem on a multi-
# supplier order"). The testbed has no receipt/commit dates, so the
# problem marker is l_returnflag = 'R' on finished ('F') orders. Both
# correlated quantifiers decorrelate into ONE per-order aggregate pass:
# n_suppliers (EXISTS another supplier), n_flagged + the flagged key
# (NOT EXISTS another flagged supplier) — no per-row rescans, one
# shuffle on orderkey, then a count per supplier.
# --------------------------------------------------------------------------


def _q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, o, l = (
        load_table(spark, sf_dir, t)
        for t in ("supplier", "orders", "lineitem")
    )
    per_supp = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            l.l_orderkey == F.col("o_orderkey"),
            "leftsemi",
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("_has_r"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("_n_supp"),
        F.sum("_has_r").alias("_n_flagged"),
        F.max(F.when(F.col("_has_r") == 1, F.col("l_suppkey"))).alias("_blame"),
    )
    blamed = per_order.filter(
        (F.col("_n_supp") >= 2) & (F.col("_n_flagged") == 1)
    )
    return (
        blamed.groupBy("_blame")
        .agg(F.count("*").alias("numwait"))
        .join(s, F.col("_blame") == s.s_suppkey)
        .select("s_name", "numwait")
    )


register(
    "rel_q21_sole_blame",
    _q21,
    """
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      )
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(has_r) AS n_flagged,
             max(CASE WHEN has_r = 1 THEN l_suppkey END) AS blame
      FROM per_supp GROUP BY 1
    )
    SELECT s_name, numwait FROM (
      SELECT blame, CAST(count(*) AS BIGINT) AS numwait
      FROM per_order
      WHERE n_supp >= 2 AND n_flagged = 1
      GROUP BY blame
    ) JOIN supplier ON blame = s_suppkey
    """,
)


# --------------------------------------------------------------------------
# rel_q12_late_priority — TPC-H Q12 shape (SQL ref: dbgen queries/12.sql):
# per ship-mode counts of urgent vs non-urgent orders among late-delivered
# lines. The synthetic lineitem has no l_shipmode/l_receiptdate, so the
# shape keeps Q12's two defining features — a cross-table date predicate
# (shipped > 60 days after order placement) and the conditional-priority
# split — keyed on l_returnflag. The lateness predicate references both
# sides, so it cannot be pushed below the join; the join itself is
# fact-to-fact on l_orderkey (both sides shuffle-partition on the key, AQE
# picks sort-merge; neither side is broadcastable at scale). Only the
# three needed columns survive each scan.
# --------------------------------------------------------------------------


def _q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o = (load_table(spark, sf_dir, t) for t in ("lineitem", "orders"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.select("l_orderkey", "l_returnflag", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


register(
    "rel_q12_late_priority",
    _q12,
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)


# --------------------------------------------------------------------------
# rel_grouping_sets — GROUPING SETS with an ASYMMETRIC set list:
# ((lang), (source)) — two independent one-dimension slices computed in
# ONE scan, which neither ROLLUP nor CUBE can express (rollup nests,
# cube powersets; both would add unwanted sets). Spark's Expand operator
# replicates each input row once per set before a single partial+final
# aggregation — at 100 TB that is one fact scan instead of two, at the
# cost of a 2× expanded shuffle input that map-side combine collapses to
# |langs| + |sources| groups.
# --------------------------------------------------------------------------


def _grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupingSets([["lang"], ["source"]], "lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars")).alias("sum_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            "n_docs",
            "sum_chars",
        )
    )


register(
    "rel_grouping_sets",
    _grouping_sets,
    """
    SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY GROUPING SETS ((lang), (source))
    """,
)


# --------------------------------------------------------------------------
# rel_kmv_setops — union/intersection cardinality of the click vs
# purchase user populations from merged KMV sketches (Beyer et al.
# SIGMOD'07 multiset operations; operators/sketches.py::kmv_setops).
# Exact counts ride along so the estimate's error is visible in the
# result itself.
# --------------------------------------------------------------------------

register(
    "rel_kmv_setops",
    lambda spark, sf_dir: _sketches.kmv_setops(
        load_table(spark, sf_dir, "events"),
        "event_type",
        "user_id",
        "click",
        "purchase",
    ),
    _sketches.sql_kmv_setops(
        "SELECT event_type, user_id FROM events",
        "event_type",
        "user_id",
        "click",
        "purchase",
    ),
)


# --------------------------------------------------------------------------
# rel_correlation_matrix — pairwise Pearson correlations between the four
# lineitem measures in ONE scan: all sums (x, x², xy) accumulate as
# exact DECIMALs (order-independent, so the result is deterministic
# under any partitioning), the corr formula runs as double arithmetic on
# the final 1-row aggregate, and the 6 pairs unpivot with a stack().
# The feature-screening pass a model pipeline runs before training —
# never a per-pair rescan, never a float accumulation race.
# --------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        *[
            F.col(c).cast("decimal(18,4)").alias(c)
            for c in _CORR_COLS
        ]
    )
    aggs = [F.count("*").alias("_n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c)).alias(f"_s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"_q_{c}"))
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"_p_{a}_{b}"))
    wide = li.agg(*aggs)

    def corr(a: str, b: str):
        n = F.col("_n").cast("double")
        sa = F.col(f"_s_{a}").cast("double")
        sb = F.col(f"_s_{b}").cast("double")
        qa = F.col(f"_q_{a}").cast("double")
        qb = F.col(f"_q_{b}").cast("double")
        p = F.col(f"_p_{a}_{b}").cast("double")
        return F.round(
            (n * p - sa * sb)
            / (F.sqrt(n * qa - sa * sa) * F.sqrt(n * qb - sb * sb)),
            6,
        )

    cells = wide.select(
        *[corr(a, b).alias(f"_c{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack = ", ".join(
        f"'{a}', '{b}', _c{i}" for i, (a, b) in enumerate(pairs)
    )
    return cells.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, pearson_corr)"
    )


def _sql_correlation_matrix() -> str:
    sums = ["count(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"sum(CAST({c} AS DECIMAL(18,4))) AS s_{c}")
        sums.append(
            # DECIMAL(19,4): forces DuckDB's int128 multiply (the 18,4
            # product overflows its int64 fast path); values identical
            f"sum(CAST({c} AS DECIMAL(19,4)) * CAST({c} AS DECIMAL(19,4)))"
            f" AS q_{c}"
        )
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        sums.append(
            f"sum(CAST({a} AS DECIMAL(19,4)) * CAST({b} AS DECIMAL(19,4)))"
            f" AS p_{a}_{b}"
        )
    arms = []
    for a, b in pairs:
        expr = (
            f"(CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / (sqrt(CAST(n AS DOUBLE) * CAST(q_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(q_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        arms.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
            f" round({expr}, 6) AS pearson_corr FROM s"
        )
    union = "\n    UNION ALL\n    ".join(arms)
    return f"""
    WITH s AS (SELECT {", ".join(sums)} FROM lineitem)
    {union}
    """


register(
    "rel_correlation_matrix", _correlation_matrix, _sql_correlation_matrix()
)


# --------------------------------------------------------------------------
# rel_duplicate_orders — possible-duplicate-invoice detection (the
# reconciliation screen finance teams run): order pairs from the SAME
# customer whose totals differ by <= 5000.00 and whose order dates fall
# within 60 days. Self-join keyed on o_custkey — per-customer order
# counts are bounded (TPC-H ~10), so the equi-join fan-out is tiny and
# the inequality predicates evaluate post-join; no cartesian, no range
# explosion. Price deltas compare as exact DECIMAL(18,2).
# --------------------------------------------------------------------------


def _duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("_d"),
        _dec(F.col("o_totalprice")).alias("_p"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .withColumn(
            "day_gap",
            F.abs(F.datediff(F.col("b._d"), F.col("a._d"))).cast("int"),
        )
        .withColumn(
            "price_gap",
            F.abs(F.col("b._p") - F.col("a._p")).cast("double"),
        )
        .filter((F.col("day_gap") <= 60) & (F.col("price_gap") <= 5000.0))
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("order_a"),
            F.col("b.o_orderkey").alias("order_b"),
            "day_gap",
            "price_gap",
        )
    )


register(
    "rel_duplicate_orders",
    _duplicate_orders,
    """
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a,
           b.o_orderkey AS order_b,
           CAST(abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                              CAST(b.o_orderdate AS DATE))) AS INTEGER)
             AS day_gap,
           CAST(abs(CAST(b.o_totalprice AS DECIMAL(18,2))
                    - CAST(a.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_gap
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    WHERE abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                        CAST(b.o_orderdate AS DATE))) <= 60
      AND abs(CAST(b.o_totalprice AS DECIMAL(18,2))
              - CAST(a.o_totalprice AS DECIMAL(18,2))) <= 5000.00
    """,
)


# --------------------------------------------------------------------------
# rel_event_lateness — watermark-delay planning from arrival data: at
# each candidate watermark W, how many events would arrive LATER than
# the watermark (running max of event time over ARRIVAL order, minus
# the event's own time). The global running max is the exact quantity
# a streaming source's watermark tracks; this batch sweep is how the
# delay is chosen before deploying the stream (the companion to
# rel_arrival_disorder's per-key inversion profile).
#
# Scale: the running max runs through two_pass_running_max (range-
# partition on arrival order, per-partition cummax + broadcast carry of
# earlier partitions' maxima) — NEVER an unpartitioned ordered window
# over the event log; the per-W tally is one conditional-aggregation
# pass unpivoted with a constant-size stack().
# --------------------------------------------------------------------------

LATENESS_WATERMARKS_SEC = (60, 300, 900)


def _event_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.util import two_pass_running_max

    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts")).alias("_us")
    )
    rm = two_pass_running_max(
        e, [F.col("event_id")], "_us", out_col="_wm"
    ).withColumn("_late_us", F.col("_wm") - F.col("_us"))
    aggs = [F.count("*").cast("bigint").alias("_n")]
    for w in LATENESS_WATERMARKS_SEC:
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("_late_us") > w * 1_000_000, 1)),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"_l_{w}")
        )
    wide = rm.agg(*aggs)
    stack = ", ".join(f"{w}, _l_{w}" for w in LATENESS_WATERMARKS_SEC)
    return wide.selectExpr(
        f"stack({len(LATENESS_WATERMARKS_SEC)}, {stack})"
        " AS (watermark_sec, n_late)",
        "_n",
    ).select(
        F.col("watermark_sec").cast("int").alias("watermark_sec"),
        "n_late",
        F.round(F.col("n_late") / F.col("_n"), 6).alias("late_share"),
    )


register(
    "rel_event_lateness",
    _event_lateness,
    f"""
    WITH lat AS (
      SELECT epoch_us(ts) AS us,
             max(epoch_us(ts)) OVER (ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - epoch_us(ts) AS late_us
      FROM events
    ),
    spine AS (SELECT CAST(unnest([{", ".join(str(w) for w in LATENESS_WATERMARKS_SEC)}]) AS INTEGER) AS watermark_sec)
    SELECT s.watermark_sec,
           CAST(coalesce(sum(CASE WHEN late_us > s.watermark_sec * 1000000
                                  THEN 1 END), 0) AS BIGINT) AS n_late,
           round(CAST(coalesce(sum(CASE WHEN late_us >
                                        s.watermark_sec * 1000000
                                   THEN 1 END), 0) AS DOUBLE)
                 / count(*), 6) AS late_share
    FROM spine s CROSS JOIN lat
    GROUP BY 1
    """,
)


# --------------------------------------------------------------------------
# rel_skyline — 2-dimensional Pareto front (skyline) over orders: the
# orders not STRICTLY dominated on (o_orderdate, o_totalprice) — no
# other order is both more recent AND more expensive. The classic
# "best tradeoff set" operator (Börzsönyi et al. 2001, "The Skyline
# Operator").
#
# Scale: never the O(n²) dominance anti-join. Dominance in 2-D
# collapses to a prefix extremum over the DATE-LEVEL rollup: an order
# survives iff its price exceeds the max price over all strictly later
# dates. The date frame is calendar-bounded (one row per distinct
# order date — ~2.5k for 7 years at ANY data scale), so its ordered
# window is bounded-input by construction (meta-pin whitelist), and it
# broadcasts back over the orders scan.
# --------------------------------------------------------------------------


def _skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    daily = o.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("_mp")
    )
    wdesc = Window.orderBy(F.col("o_orderdate").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fence = daily.select(
        "o_orderdate", F.max("_mp").over(wdesc).alias("_fence")
    )
    return (
        o.join(F.broadcast(fence), "o_orderdate")
        .filter(
            # >=: dominance is STRICT in both dims, so an order matching
            # the later-date max price is not dominated (tie-survival)
            F.col("_fence").isNull()
            | (F.col("o_totalprice") >= F.col("_fence"))
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


register(
    "rel_skyline",
    _skyline_orders,
    """
    WITH daily AS (
      SELECT o_orderdate, max(o_totalprice) AS mp
      FROM orders GROUP BY 1
    ),
    fence AS (
      SELECT o_orderdate,
             max(mp) OVER (ORDER BY o_orderdate DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS f
      FROM daily
    )
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM orders o JOIN fence USING (o_orderdate)
    WHERE fence.f IS NULL OR o.o_totalprice >= fence.f
    """,
)


# --------------------------------------------------------------------------
# rel_cohort_ltv — the cohort revenue triangle: customers grouped by
# first-order month, revenue tracked by months-since-first-order. The
# standard lifetime-value readout (rel_retention's revenue-weighted
# sibling: retention counts active users, LTV sums what they spend).
#
# Scale: first-order month is one hash aggregation on o_custkey; the
# attach-back is a custkey-keyed hash equi-join (|customers| rows —
# deliberately NOT broadcast); the triangle rollup shuffles only
# (cohort, offset) cells. Month arithmetic is exact integer math on
# extracted parts.
# --------------------------------------------------------------------------


def _cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mix = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("cohort"),
        F.min(mix).alias("_c0"),
    )
    return (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort",
            (mix - F.col("_c0")).cast("int").alias("month_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(_dec(F.col("o_totalprice")))
            .cast("double")
            .alias("revenue"),
        )
    )


register(
    "rel_cohort_ltv",
    _cohort_ltv,
    """
    WITH first AS (
      SELECT o_custkey,
             -- CAST: DuckDB's date_trunc('month') yields DATE, whose
             -- raw-fetch repr diverges from Spark's timestamp
             CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP)
               AS cohort,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS c0
      FROM orders GROUP BY 1
    )
    SELECT f.cohort,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - f.c0
                AS INTEGER) AS month_offset,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN first f USING (o_custkey)
    GROUP BY 1, 2
    """,
)


# --------------------------------------------------------------------------
# rel_mad_outliers — robust dispersion screen per return-flag class:
# exact median, median absolute deviation, and the count of rows
# outside the 3-sigma-equivalent robust fence (3 · 1.4826 · MAD).
# MAD-based fences are the outlier rule that survives the outliers
# themselves (unlike mean/stddev — rel_value_outliers' z-scores).
#
# Scale: BOTH exact medians run as bucket-histogram medians (the
# classic two-round exact quantile): round 1 is a plain hash
# aggregation into a bounded (class, bucket) histogram — map-side
# partial, shuffle O(buckets × partitions) instead of O(rows) — whose
# cumulative counts locate the middle bucket(s); round 2 ranks ONLY
# the rows of those buckets (~1/|buckets| of the table) through
# two_pass_rank_in_groups and reads the median off the global
# position arithmetic. The return-flag groups are FEW and HUGE
# (3 classes × billions of rows at 100 TB) — exactly the case where
# Window.partitionBy(flag).orderBy would funnel each class through one
# task, and where even the two-pass grouped rank's O(rows) range
# shuffle (the round-7 shape, 3.85 s at sf0.1) is dominated by this
# histogram screen (~2 s). A (class, price, count) value-domain rollup
# was prescribed and MEASURED WORSE (6.5 s): l_extendedprice is
# quantity × part price, so the domain is ~as large as the row count
# (594k distinct / 600k rows at sf0.1) and the rollup only adds a
# full-width shuffle. See SCALE.md "mad_outliers weighted-median
# episode".
# --------------------------------------------------------------------------

MAD_FENCE_K = 3.0 * 1.4826


MAD_HIST_WIDTH = 100  # bucket width for the histogram median screen


def _hist_median(
    df: DataFrame, group: str, value: str, out: str, width: int
) -> DataFrame:
    """Exact per-group median via the two-round bucket-histogram
    screen. Round 1: hash-aggregate a (group, floor(value/width))
    histogram — map-side partial, so the shuffle carries
    O(buckets × partitions) rows — and read the middle positions
    floor((n+1)/2) / floor(n/2)+1 off its per-group cumulative counts
    (the window runs over the HISTOGRAM, bounded by the value domain /
    width, never the data). Round 2: re-scan only the rows of the
    bucket(s) covering those positions (~1/|buckets| of the table),
    collapse them to their exact (group, value) rollup — values here
    are discrete decimals, so the rollup is bounded by
    selected_buckets × width / value_resolution rows per group,
    independent of data size — and read the median off the rollup's
    cumulative counts; the 1-2 surviving values' average =
    quantile_cont(0.5).

    Every window below is partitionBy(group) over a BOUNDED frame (the
    histogram: ≤ domain/width rows per group; the round-2 rollup: the
    per-bucket value domain) — never over the data rows."""
    bkt = F.floor(F.col(value) / width).cast("long")
    hist = df.groupBy(F.col(group), bkt.alias("_bkt")).agg(
        F.count("*").alias("_hc")
    )
    wcum = (
        Window.partitionBy(group)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(group)
    cum = hist.select(
        group,
        "_bkt",
        "_hc",
        F.sum("_hc").over(wcum).alias("_cumh"),
        F.sum("_hc").over(wall).alias("_n"),
    )
    p1 = F.floor((F.col("_n") + 1) / 2)
    p2 = F.floor(F.col("_n") / 2) + 1
    before = F.col("_cumh") - F.col("_hc")
    targets = (
        cum.filter(
            ((before < p1) & (p1 <= F.col("_cumh")))
            | ((before < p2) & (p2 <= F.col("_cumh")))
        )
        .groupBy(group)
        .agg(
            # p2 <= p1 + 1, so target buckets are value-adjacent: the
            # selected rows are contiguous in global order starting at
            # the first target bucket's offset
            F.min(before).alias("_off0"),
            F.max("_n").alias("_n"),
            F.collect_set("_bkt").alias("_bkts"),
        )
    )
    sel = df.join(F.broadcast(targets), group).filter(
        F.array_contains(F.col("_bkts"), bkt)
    )
    roll = sel.groupBy(group, value).agg(
        F.count("*").alias("_c"),
        F.first("_off0").alias("_off0"),
        F.first("_n").alias("_n"),
    )
    wv = (
        Window.partitionBy(group)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumv = roll.withColumn("_cum", F.col("_off0") + F.sum("_c").over(wv))
    lo = F.col("_cum") - F.col("_c")
    return (
        cumv.filter(
            ((lo < p1) & (p1 <= F.col("_cum")))
            | ((lo < p2) & (p2 <= F.col("_cum")))
        )
        .groupBy(group)
        .agg(F.avg(value).alias(out))
    )


def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    # 3-row result, checkpointed: dev has THREE consumers (the dev
    # histogram, its round-2 rollup, and the fence tally) — without the
    # barrier each would replay the entire median-1 subtree
    med = _hist_median(
        li, "l_returnflag", "l_extendedprice", "median_price",
        MAD_HIST_WIDTH,
    ).localCheckpoint()
    # deviation = |price - class median|, derived from the 2-column
    # columnar scan + a broadcast of the 3-row median frame wherever
    # consumed — deliberately NOT checkpointed: at scale re-deriving
    # from the pruned scan is cheaper than materializing an O(rows)
    # checkpoint (the r7 finding), and each consumer's scan stays
    # pushed down
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("median_price")).alias(
            "_dev"
        ),
        "median_price",
    )
    mad = _hist_median(dev, "l_returnflag", "_dev", "_mad", MAD_HIST_WIDTH)
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.max("median_price"), 6).alias("median_price"),
            F.round(F.max("_mad"), 6).alias("mad"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_dev") > F.lit(MAD_FENCE_K) * F.col("_mad"),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


register(
    "rel_mad_outliers",
    _mad_outliers,
    f"""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
      FROM lineitem GROUP BY 1
    ),
    dev AS (
      SELECT l.l_returnflag, abs(l.l_extendedprice - md.m) AS dv, md.m
      FROM lineitem l JOIN med md USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, quantile_cont(dv, 0.5) AS md FROM dev
      GROUP BY 1
    )
    SELECT d.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(max(d.m), 6) AS median_price,
           round(max(a.md), 6) AS mad,
           CAST(coalesce(sum(CASE WHEN d.dv > {MAD_FENCE_K!r} * a.md
                                  THEN 1 END), 0) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a USING (l_returnflag)
    GROUP BY 1
    """,
)


# --------------------------------------------------------------------------
# rel_rfm_segments — RFM (recency / frequency / monetary) customer
# segmentation, the classic CRM cube: quintile-score each customer on
# the three dimensions and report cell occupancy. Scores are 1..5 by
# ntile over (metric, custkey) ascending — the deterministic total
# order both engines share.
#
# Scale: the per-customer rollup is one hash aggregation; each of the
# THREE global quintile assignments runs through two_pass_rank +
# ntile_from_rank (the zorder pattern) — never an unpartitioned
# ntile window over the customer frame; the final cube rollup shuffles
# 125 cells.
# --------------------------------------------------------------------------


def _rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.util import ntile_from_rank, two_pass_rank

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.unix_micros(F.date_trunc("day", "o_orderdate"))).alias(
            "_rec"
        ),
        F.count("*").cast("long").alias("_freq"),
        F.sum(_dec(F.col("o_totalprice"))).alias("_mon"),
    )
    scored = per_cust
    for dim, col in (("r", "_rec"), ("f", "_freq"), ("m", "_mon")):
        scored = two_pass_rank(
            scored,
            [F.col(col), F.col("o_custkey")],
            out_col=f"_rk_{dim}",
        )
    # customer count = max dense rank of the (checkpointed) ranked
    # frame — not a second scan of the orders rollup
    tot = scored.agg(F.max("_rk_r").alias("_t"))
    scored = scored.crossJoin(F.broadcast(tot))
    for dim in ("r", "f", "m"):
        scored = scored.withColumn(
            f"{dim}_score",
            ntile_from_rank(F.col(f"_rk_{dim}"), F.col("_t"), 5),
        )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )


register(
    "rel_rfm_segments",
    _rfm_segments,
    """
    WITH per_cust AS (
      SELECT o_custkey,
             epoch_us(date_trunc('day', max(o_orderdate))) AS rec,
             count(*) AS freq,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT CAST(ntile(5) OVER (ORDER BY rec, o_custkey) AS INTEGER)
               AS r_score,
             CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS INTEGER)
               AS f_score,
             CAST(ntile(5) OVER (ORDER BY mon, o_custkey) AS INTEGER)
               AS m_score
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1, 2, 3
    """,
)


# --------------------------------------------------------------------------
# rel_ab_conversion_lift — the A/B readout: users split into two
# deterministic cohorts (user_id parity — the stand-in for a bucketing
# hash), conversion = "has at least one purchase event", reported with
# relative lift and the two-proportion z statistic (the go/no-go number
# every experimentation platform prints).
#
# Scale: one (user, cohort) rollup with a conditional max (hash partial
# agg on user_id), then a 2-row conditional aggregate; all counts are
# exact integers and the z arithmetic is the same double expression on
# both engines. Nothing beyond the user rollup ever shuffles.
# --------------------------------------------------------------------------


AB_PURCHASE_THRESHOLD = 14  # "converted" = heavy purchaser (every
# testbed user has >= 1 purchase, so presence alone saturates at 1.0)


def _ab_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    users = e.groupBy("user_id").agg(
        F.when(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", 1)),
                F.lit(0),
            )
            >= AB_PURCHASE_THRESHOLD,
            1,
        )
        .otherwise(0)
        .alias("_conv")
    )
    wide = users.agg(
        F.coalesce(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1)), F.lit(0)
        ).cast("bigint").alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("user_id") % 2 == 1, 1)), F.lit(0)
        ).cast("bigint").alias("n_b"),
        F.coalesce(
            F.sum(F.when(F.col("user_id") % 2 == 0, F.col("_conv"))),
            F.lit(0),
        ).cast("bigint").alias("c_a"),
        F.coalesce(
            F.sum(F.when(F.col("user_id") % 2 == 1, F.col("_conv"))),
            F.lit(0),
        ).cast("bigint").alias("c_b"),
    )
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    # try_divide: a saturated metric (pool 0 or 1) yields NULL like the
    # oracle, instead of an ANSI divide-by-zero throw
    z = F.try_divide(
        p_b - p_a,
        F.sqrt(
            pool
            * (1 - pool)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("conv_a"),
        F.round(p_b, 6).alias("conv_b"),
        # try_divide here too: a zero-converter control cohort must
        # yield NULL (like the oracle's NULLIF-free DOUBLE division),
        # not an ANSI DIVIDE_BY_ZERO before the guarded z is reached
        F.round(F.try_divide(p_b - p_a, p_a), 6).alias("rel_lift"),
        F.round(z, 6).alias("z_score"),
    )


register(
    "rel_ab_conversion_lift",
    _ab_conversion_lift,
    """
    WITH users AS (
      SELECT user_id,
             CASE WHEN coalesce(sum(CASE WHEN event_type = 'purchase'
                                         THEN 1 END), 0) >= 14
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY 1
    ),
    wide AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN user_id % 2 = 0 THEN 1 END), 0)
             AS BIGINT) AS n_a,
        CAST(coalesce(sum(CASE WHEN user_id % 2 = 1 THEN 1 END), 0)
             AS BIGINT) AS n_b,
        CAST(coalesce(sum(CASE WHEN user_id % 2 = 0 THEN conv END), 0)
             AS BIGINT) AS c_a,
        CAST(coalesce(sum(CASE WHEN user_id % 2 = 1 THEN conv END), 0)
             AS BIGINT) AS c_b
      FROM users
    )
    SELECT n_a, n_b,
           round(CAST(c_a AS DOUBLE) / n_a, 6) AS conv_a,
           round(CAST(c_b AS DOUBLE) / n_b, 6) AS conv_b,
           round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / (CAST(c_a AS DOUBLE) / n_a), 6) AS rel_lift,
           round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a
                           + CAST(1 AS DOUBLE) / n_b)), 6) AS z_score
    FROM wide
    """,
)


# --------------------------------------------------------------------------
# rel_seasonality_index — classical multiplicative seasonal
# decomposition (ratio-to-moving-average, the pre-STL textbook method):
# monthly revenue / centered 12-month moving average, averaged per
# calendar month. An index above 1 marks the high season; the
# de-seasonalization factor demand forecasting divides by.
#
# Scale: the month-level rollup is calendar-bounded (one row per
# distinct order month — 80 rows for 7 years at ANY data scale), so its
# ordered moving-average window is bounded-input by construction
# (meta-pin whitelist); everything data-sized is the one hash partial
# aggregation into that frame. Ratios round to 9 and accumulate as
# exact decimals so the per-month mean is order-independent.
# --------------------------------------------------------------------------


def _seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("_mo")
    ).agg(F.sum(_dec(F.col("o_totalprice"))).alias("_rev"))
    w = Window.orderBy("_mo").rowsBetween(-5, 6)
    ma = (
        monthly.withColumn("_n", F.count("*").over(w))
        .withColumn(
            "_ma",
            F.sum("_rev").over(w).cast("double") / F.col("_n"),
        )
        .filter(F.col("_n") == 12)  # full centered window only
        .select(
            F.month("_mo").alias("month_num"),
            (F.col("_rev").cast("double") / F.col("_ma")).alias("_ratio"),
        )
    )
    return ma.groupBy("month_num").agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.round(
            F.avg(F.round(F.col("_ratio"), 9).cast("decimal(18,9)"))
            .cast("double"),
            6,
        ).alias("seasonal_index"),
    )


register(
    "rel_seasonality_index",
    _seasonality_index,
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mo,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    ma AS (
      SELECT mo, rev,
             count(*) OVER win AS n,
             CAST(sum(rev) OVER win AS DOUBLE)
               / count(*) OVER win AS m
      FROM monthly
      WINDOW win AS (ORDER BY mo ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
    )
    SELECT CAST(month(mo) AS INTEGER) AS month_num,
           CAST(count(*) AS BIGINT) AS n_months,
           round(CAST(avg(CAST(round(CAST(rev AS DOUBLE) / m, 9)
                               AS DECIMAL(18,9))) AS DOUBLE), 6)
             AS seasonal_index
    FROM ma WHERE n = 12
    GROUP BY 1
    """,
)
