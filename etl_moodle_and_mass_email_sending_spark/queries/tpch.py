"""[EXT] M5 — relational completeness, TPC-H family (SURVEY.md §7):
the 22 classic query shapes plus the supplier/part volume rollup —
the join/group-by/sort classes the reference lacks (§2.6 negatives),
each oracle-checked. Formerly queries/relational.py; split by family
in round 8 (VERDICT r7 item 6) with zero behavior change. The
numeric-parity policy below applies to every rel_* module
(windows.py, quality.py, finance.py import _dec from here).

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


