"""[EXT] M5 — relational completeness, finance / CRM / sketch / layout family (SURVEY.md §7),
each query oracle-checked. Formerly part of queries/relational.py; split
by family in round 8 (VERDICT r7 item 6) with zero behavior change. The
shared numeric-parity policy (exact DECIMAL internals, DOUBLE output
projections) is documented in queries/tpch.py, which also owns _dec.
Scale notes per query are inline (broadcast choices, shuffle keys, AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..registry import register
from .tpch import _dec
from ..operators import sketches as _sketches

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
# rel_kmv_distinct — deterministic KMV distinct-count sketch per
# event_type over user_id (operators/sketches.py has the full scale
# rationale: two-stage salted top-k, 8-byte shuffle payloads).
# --------------------------------------------------------------------------



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
    # global top-20 via orderBy+limit: Spark compiles this to
    # TakeOrderedAndProject — per-partition top-k partials merged at
    # the driver, k rows over the wire per partition. Strictly better
    # than the former salted two-stage rank windows (round 14: no
    # WindowExec node, one stage less, no 320-row single-partition
    # barrier), and distributed-safe at any SF by construction.
    top = pairs.orderBy(
        F.col("n_pair").desc(), F.col("pa"), F.col("pb")
    ).limit(20)
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
    # the class-share denominator IS the grand total already carried by
    # the crossJoin (sum of class revenues = sum of part revenues); the
    # separate agg this replaces re-read the whole checkpointed ranked
    # frame — noise-level at sf0.1 (~2.3 s either way) but a second
    # corpus-sized pass at the 100 TB design point
    out = ranked.select(cls.alias("abc_class"), "_rev", "_t")
    return (
        out.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("_rev").alias("_crev"),
            F.first("_t").alias("_t2"),
        )
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
    # suffix max over the calendar-bounded (~2.4k-row) date rollup as
    # a broadcast triangular self-join (the prefix_offsets pattern,
    # round 14): _fence(d) = max daily price over STRICTLY LATER
    # dates; NULL for the last date — identical to the former
    # unboundedPreceding..-1 desc window, with no WindowExec node
    later = daily.select(
        F.col("o_orderdate").alias("_d2"), F.col("_mp").alias("_mp2")
    )
    fence = (
        daily.select("o_orderdate")
        .join(F.broadcast(later), F.col("_d2") > F.col("o_orderdate"), "left")
        .groupBy("o_orderdate")
        .agg(F.max("_mp2").alias("_fence"))
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
    from ..operators.util import ntile_from_rank, two_pass_rank_in_groups

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.unix_micros(F.date_trunc("day", "o_orderdate"))).alias(
            "_rec"
        ),
        F.count("*").cast("long").alias("_freq"),
        F.sum(_dec(F.col("o_totalprice"))).alias("_mon"),
    )
    # ONE grouped two-pass rank over the (dim, value)-exploded rollup
    # replaces three CHAINED two_pass_rank passes (each paid its own
    # range shuffle + sampling pass + eager localCheckpoint of the
    # whole customer frame; round 14, guide §2.4). All three metrics
    # cast losslessly into one DECIMAL(38,6) order key (_rec/_freq are
    # bigint, _mon is a DECIMAL(_,2) sum), and ranks only ever compare
    # within a dim group, so per-dim order — and therefore every
    # ntile-5 score — is unchanged.
    exploded = per_cust.select(
        "o_custkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dim).alias("_dim"),
                        F.col(col)
                        .cast("decimal(38,6)")
                        .alias("_val"),
                    )
                    for dim, col in (
                        ("r", "_rec"),
                        ("f", "_freq"),
                        ("m", "_mon"),
                    )
                ]
            )
        ).alias("_dv"),
    ).select("o_custkey", "_dv._dim", "_dv._val")
    ranked = two_pass_rank_in_groups(
        exploded,
        "_dim",
        [F.col("_val"), F.col("o_custkey")],
        out_col="_rk",
    )
    scores = ranked.groupBy("o_custkey").agg(
        *[
            F.max(
                F.when(F.col("_dim") == dim, F.col("_rk"))
            ).alias(f"_rk_{dim}")
            for dim in ("r", "f", "m")
        ]
    )
    # customer count = max per-dim dense rank — not a second scan of
    # the orders rollup
    tot = scores.agg(F.max("_rk_r").alias("_t"))
    scored = scores.crossJoin(F.broadcast(tot))
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
    # centered 12-row moving window over the calendar-bounded (~80-row)
    # month rollup, window-free (round 14): the row index comes from a
    # broadcast triangular self-join (count of months ≤ m — exact ROWS
    # semantics even across month gaps), then a broadcast band
    # self-join on index distance — no WindowExec node, no range
    # shuffle on a frame this small
    tri = monthly.select(F.col("_mo").alias("_m2"))
    idx = (
        monthly.join(F.broadcast(tri), F.col("_m2") <= F.col("_mo"))
        .groupBy("_mo", "_rev")
        .agg(F.count("*").cast("int").alias("_i"))
    )
    band = idx.select(
        F.col("_i").alias("_i2"), F.col("_rev").alias("_rev2")
    )
    ma = (
        idx.join(
            F.broadcast(band),
            (F.col("_i2") >= F.col("_i") - 5)
            & (F.col("_i2") <= F.col("_i") + 6),
        )
        .groupBy("_mo", "_rev")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_rev2").alias("_s"),
        )
        .withColumn("_ma", F.col("_s").cast("double") / F.col("_n"))
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


# --------------------------------------------------------------------------
# rel_bucketed_join — co-located sort-merge join over PRE-BUCKETED tables:
# both sides are written once per session with bucketBy(8, custkey) +
# sortBy, and the join itself runs with ZERO exchange on either input
# (pinned in test_plan_quality) — the "bucket once, join many" layout
# that turns every subsequent fact⋈fact join on the bucket key into a
# shuffle-free local merge. At 100 TB this is THE lever for repeated
# big-big joins: the one-time bucketed write amortizes across every
# downstream join/agg keyed on custkey, and the merge hint keeps the
# plan stable against broadcast-threshold drift. The only exchange left
# in the plan is the final 5-group segment rollup.
# --------------------------------------------------------------------------

_BKT_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders/customer bucketed by custkey once per (session,
    sf_dir); return the catalog table names."""
    import hashlib
    import os

    from ..operators.util import scratch_dir

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_orders, t_cust = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    if not spark.catalog.tableExists(t_orders):
        base = scratch_dir("bucketed_join_")
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .write.bucketBy(_BKT_BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .option("path", os.path.join(base, "orders"))
            .mode("overwrite")
            .saveAsTable(t_orders)
        )
        (
            load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.bucketBy(_BKT_BUCKETS, "c_custkey")
            .sortBy("c_custkey")
            .option("path", os.path.join(base, "customer"))
            .mode("overwrite")
            .saveAsTable(t_cust)
        )
    return t_orders, t_cust


def _bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_cust = _bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    joined = o.hint("merge").join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(_dec(F.col("o_totalprice")))
            .cast("double")
            .alias("total_revenue"),
        )
        .select("c_mktsegment", "n_orders", "n_customers", "total_revenue")
    )


register(
    "rel_bucketed_join",
    _bucketed_join,
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)


# --------------------------------------------------------------------------
# rel_skew_stats — join-key skew diagnosis: the pre-flight report you
# run BEFORE choosing a salting factor (rel_skew_salted_agg/_join are
# the cure; this is the diagnosis). Per candidate key: group-size
# distribution (max / exact p50 / p99), the heaviest key's share of all
# rows, and max/p50 as the skew ratio AQE's skew-join threshold keys
# off. Shape: one map-side-combined groupBy per key column (the count
# shuffle moves one row per distinct key), then a single-row rollup —
# at 100 TB the shuffle payload is |keys| counters, not rows.
# --------------------------------------------------------------------------


def _skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(table: str, key: str) -> DataFrame:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return g.agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_group"),
            F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_group"),
            F.round(F.expr("percentile(cnt, 0.99)"), 6).alias(
                "p99_group"
            ),
            F.round(
                F.max("cnt").cast("double") / F.sum("cnt"), 6
            ).alias("top_key_share"),
        ).select(
            F.lit(f"{table}.{key}").alias("key_col"),
            "n_rows",
            "n_keys",
            "max_group",
            "p50_group",
            "p99_group",
            "top_key_share",
            F.round(
                F.col("max_group").cast("double") / F.col("p50_group"), 6
            ).alias("skew_ratio"),
        )

    return one("orders", "o_custkey").unionByName(
        one("lineitem", "l_suppkey")
    )


def _sql_skew_stats() -> str:
    def one(table: str, key: str) -> str:
        return f"""
      SELECT '{table}.{key}' AS key_col,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_group,
             round(quantile_cont(cnt, 0.5), 6) AS p50_group,
             round(quantile_cont(cnt, 0.99), 6) AS p99_group,
             round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6)
               AS top_key_share,
             round(CAST(max(cnt) AS DOUBLE)
                   / quantile_cont(cnt, 0.5), 6) AS skew_ratio
      FROM (SELECT {key}, CAST(count(*) AS BIGINT) AS cnt
            FROM {table} GROUP BY 1)"""

    return (
        one("orders", "o_custkey")
        + " UNION ALL "
        + one("lineitem", "l_suppkey")
    )


register("rel_skew_stats", _skew_stats, _sql_skew_stats())


# --------------------------------------------------------------------------
# rel_join_cardinality — join-size estimation audit: for each candidate
# join, the textbook independence estimate |A|·|B| / max(ndv_A, ndv_B)
# (what a Catalyst-style CBO assumes from table stats) next to the
# EXACT output cardinality Σ_k cnt_A(k)·cnt_B(k) computed from the two
# per-key count tables — the report that tells you which joins the
# optimizer will mis-size and by how much before you let AQE loose on
# them. Shape: one map-side-combined groupBy per side (|keys| counters
# over the wire), the Σ product via a join of the two count tables on
# the key, single-row rollup per join. rel_skew_stats diagnoses one
# side's distribution; this diagnoses the pairing.
# --------------------------------------------------------------------------


def _join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(
        lt: str, lk: str, rt: str, rk: str
    ) -> DataFrame:
        a = (
            load_table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count(F.lit(1)).alias("ca"))
        )
        b = (
            load_table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        actual = a.join(b, "k").agg(
            F.sum(F.col("ca") * F.col("cb")).alias("actual_rows")
        )
        stats = a.agg(
            F.sum("ca").alias("rows_left"),
            F.count(F.lit(1)).alias("ndv_left"),
        ).crossJoin(
            b.agg(
                F.sum("cb").alias("rows_right"),
                F.count(F.lit(1)).alias("ndv_right"),
            )
        )
        est = (
            F.col("rows_left").cast("double")
            * F.col("rows_right")
            / F.greatest("ndv_left", "ndv_right")
        )
        return stats.crossJoin(actual).select(
            F.lit(f"{lt}.{lk} = {rt}.{rk}").alias("join_key"),
            F.col("rows_left").cast("bigint").alias("rows_left"),
            F.col("rows_right").cast("bigint").alias("rows_right"),
            F.col("ndv_left").cast("bigint").alias("ndv_left"),
            F.col("ndv_right").cast("bigint").alias("ndv_right"),
            F.round(est, 6).alias("est_rows"),
            F.col("actual_rows").cast("bigint").alias("actual_rows"),
            F.round(est / F.col("actual_rows"), 6).alias(
                "est_over_actual"
            ),
        )

    return (
        one("orders", "o_custkey", "customer", "c_custkey")
        .unionByName(one("lineitem", "l_partkey", "part", "p_partkey"))
        .unionByName(one("lineitem", "l_suppkey", "supplier", "s_suppkey"))
    )


def _sql_join_cardinality() -> str:
    def one(lt: str, lk: str, rt: str, rk: str) -> str:
        return f"""
      SELECT '{lt}.{lk} = {rt}.{rk}' AS join_key,
             CAST(s.rows_left AS BIGINT) AS rows_left,
             CAST(s.rows_right AS BIGINT) AS rows_right,
             CAST(s.ndv_left AS BIGINT) AS ndv_left,
             CAST(s.ndv_right AS BIGINT) AS ndv_right,
             round(CAST(s.rows_left AS DOUBLE) * s.rows_right
                   / greatest(s.ndv_left, s.ndv_right), 6) AS est_rows,
             CAST(x.actual_rows AS BIGINT) AS actual_rows,
             round(CAST(s.rows_left AS DOUBLE) * s.rows_right
                   / greatest(s.ndv_left, s.ndv_right)
                   / x.actual_rows, 6) AS est_over_actual
      FROM (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM {lt}) AS rows_left,
               (SELECT CAST(count(DISTINCT {lk}) AS BIGINT) FROM {lt})
                 AS ndv_left,
               (SELECT CAST(count(*) AS BIGINT) FROM {rt}) AS rows_right,
               (SELECT CAST(count(DISTINCT {rk}) AS BIGINT) FROM {rt})
                 AS ndv_right
      ) s CROSS JOIN (
        SELECT CAST(sum(ca * cb) AS BIGINT) AS actual_rows
        FROM (SELECT {lk} AS k, CAST(count(*) AS BIGINT) AS ca
              FROM {lt} GROUP BY 1) a
        JOIN (SELECT {rk} AS k, CAST(count(*) AS BIGINT) AS cb
              FROM {rt} GROUP BY 1) b USING (k)
      ) x"""

    return (
        one("orders", "o_custkey", "customer", "c_custkey")
        + " UNION ALL "
        + one("lineitem", "l_partkey", "part", "p_partkey")
        + " UNION ALL "
        + one("lineitem", "l_suppkey", "supplier", "s_suppkey")
    )


register(
    "rel_join_cardinality",
    _join_cardinality,
    _sql_join_cardinality(),
)


# --------------------------------------------------------------------------
# rel_changepoint — CUSUM mean-shift detection on the daily revenue
# series (Page 1954): the largest |cumulative deviation from the global
# mean| marks the most likely level-shift point — the monitoring query
# behind "did revenue structurally change, and when?".
#
# Numeric parity: the corpus collapses to the DATE-LEVEL rollup first
# (exact DECIMAL revenue per day); the CUSUM numerator is kept exact by
# scaling through n — C_d·n = n·cumrev_d − idx_d·total, all
# DECIMAL×BIGINT products — and doubles appear only in the final
# round(·/n, 4) projections (cents < 2^53, so the casts are exact).
#
# Scale shape: one map-side-combined groupBy onto the calendar-bounded
# daily frame (~2.4k rows at ANY SF); the single-row (n, total) frame
# joins back via broadcast; the running sum + row_number window is
# global-but-bounded (whitelisted in the meta-pin with the bound
# stated); argmax via one more 1-row aggregate. The fact table is never
# sorted or range-shuffled.
# --------------------------------------------------------------------------


def _changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(_dec(F.col("o_totalprice"))).alias("rev")
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("rev").alias("total"),
    )
    # running sum + row index over the calendar-bounded (~2.4k-row)
    # daily rollup, window-free (round 14): ONE broadcast triangular
    # self-join yields both the prefix sum and the row index (exact
    # decimal sums; the ≤|days|² pair fan-out is calendar-bounded at
    # any SF) — lighter than the two-pass range-shuffle machinery on
    # a frame this small, no WindowExec node either way
    earlier = daily.select(
        F.col("day").alias("_d2"), F.col("rev").alias("_rev2")
    )
    cum = (
        daily.select("day")
        .join(F.broadcast(earlier), F.col("_d2") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.sum("_rev2").alias("cumrev"),
            F.count("*").cast("int").alias("idx"),
        )
        .crossJoin(F.broadcast(stats))
        .select("day", "n_days", "total", "cumrev", "idx")
        # idx = n_days has CUSUM exactly 0 by construction and an empty
        # "after" side — not a candidate
        .filter(F.col("idx") < F.col("n_days"))
        .withColumn(
            "numer",
            F.col("n_days") * F.col("cumrev") - F.col("idx") * F.col("total"),
        )
    )
    best = cum.select(
        F.struct(
            F.abs(F.col("numer")).alias("a"),
            (-F.unix_timestamp("day")).alias("negday"),
            F.col("day"),
            F.col("idx"),
            F.col("n_days"),
            F.col("total"),
            F.col("cumrev"),
            F.col("numer"),
        ).alias("s")
    ).agg(F.max("s").alias("s"))
    return best.select(
        F.col("s.day").alias("cp_day"),
        F.col("s.n_days").alias("n_days"),
        F.round(
            F.col("s.numer").cast("double") / F.col("s.n_days"), 4
        ).alias("cusum_peak"),
        F.round(
            F.col("s.cumrev").cast("double") / F.col("s.idx"), 4
        ).alias("mean_before"),
        F.round(
            (F.col("s.total") - F.col("s.cumrev")).cast("double")
            / (F.col("s.n_days") - F.col("s.idx")),
            4,
        ).alias("mean_after"),
    )


register(
    "rel_changepoint",
    _changepoint,
    # oracle ranks by (|numer| DESC, day ASC) over the bounded daily
    # frame — equivalent to the struct-max (ties broken to the earliest
    # day on both engines)
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS rev
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(rev) AS DECIMAL(38,2)) AS total
      FROM daily
    ),
    cum AS (
      SELECT day, n_days, total,
             CAST(sum(rev) OVER (ORDER BY day) AS DECIMAL(38,2)) AS cumrev,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
      FROM daily CROSS JOIN stats
    ),
    scored AS (
      SELECT *, n_days * cumrev - idx * total AS numer
      FROM cum WHERE idx < n_days
    )
    SELECT CAST(day AS TIMESTAMP) AS cp_day,
           n_days,
           round(CAST(numer AS DOUBLE) / n_days, 4) AS cusum_peak,
           round(CAST(cumrev AS DOUBLE) / idx, 4) AS mean_before,
           round(CAST(total - cumrev AS DOUBLE) / (n_days - idx), 4)
             AS mean_after
    FROM scored
    ORDER BY abs(numer) DESC, day ASC
    LIMIT 1
    """,
)


# --------------------------------------------------------------------------
# rel_zorder_execute (round 11) — the layout plan's EFFECT receipt
# (the compaction_plan→compaction_execute promotion applied to
# z-ordering): rel_zorder_layout assigns Morton-order file buckets;
# this measures what the assignment BUYS at read time, against the
# baseline a naive writer produces (arrival order = event_id ranges).
# Per layout: the per-file min/max envelope tightness on BOTH
# dimensions (avg span) and the file-skip rate a point predicate on
# user_id achieves against the envelopes (16 deterministic probes) —
# the number a lakehouse layout decision is actually made on. Z-order
# must show far tighter user spans and a high skip rate; arrival
# order must show near-full spans and ~zero skips.
#
# 100 TB shape: both layouts rank via the two-pass global rank (range
# shuffle + broadcast offsets, no single-task sort); envelopes are a
# 32-row-per-layout map-side-combined rollup; the probe sweep is a
# broadcast 16-literal fan-out over the 64-row envelope frame. The
# receipt is 2 rows.
# --------------------------------------------------------------------------

ZX_BUCKETS = 32
ZX_N_PROBES = 16  # probes per dimension, evenly spaced in the domain


def _zorder_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import zorder_value
    from ..operators.util import ntile_from_rank, two_pass_rank_in_groups

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000))
        .cast("bigint")
        .alias("epoch_hour"),
    )
    z = e.withColumn("zvalue", zorder_value("user_id", "epoch_hour"))

    # BOTH layouts rank through ONE grouped two-pass rank over the
    # tagged union (round 14, guide §2.4: share the exchange): the
    # per-layout order key is unified into `_ord` (zvalue for the
    # z-order layout, event_id for arrival order — the original
    # per-layout order_by verbatim), so one range shuffle + one
    # localCheckpoint replaces two of each, and the per-layout totals
    # come from one 2-row broadcast instead of a crossJoin per layout.
    # The arrival branch projects zvalue away, so its Morton expression
    # is pruned from that side of the union.
    both_in = z.select(
        F.lit("zorder").alias("layout"),
        "user_id",
        "epoch_hour",
        F.col("zvalue").alias("_ord"),
        "event_id",
    ).unionByName(
        z.select(
            F.lit("arrival").alias("layout"),
            "user_id",
            "epoch_hour",
            F.col("event_id").alias("_ord"),
            "event_id",
        )
    )
    ranked = two_pass_rank_in_groups(
        both_in,
        "layout",
        [F.col("_ord"), F.col("event_id")],
        out_col="_rank",
    )
    tot = ranked.groupBy("layout").agg(F.max("_rank").alias("_n"))
    both = ranked.join(F.broadcast(tot), "layout").select(
        "layout",
        "user_id",
        "epoch_hour",
        ntile_from_rank(F.col("_rank"), F.col("_n"), ZX_BUCKETS).alias(
            "_bucket"
        ),
    )
    env = both.groupBy("layout", "_bucket").agg(
        F.min("user_id").alias("_minu"),
        F.max("user_id").alias("_maxu"),
        F.min("epoch_hour").alias("_minh"),
        F.max("epoch_hour").alias("_maxh"),
    )
    # probes: ZX_N_PROBES evenly-spaced points of each dimension's
    # GLOBAL domain (derived, never hardcoded — both user_id and
    # epoch-hour ranges are data-dependent and SF-dependent); integer
    # arithmetic so both engines pick identical probes
    dom = e.agg(
        F.min("user_id").alias("_u0"),
        F.max("user_id").alias("_u1"),
        F.min("epoch_hour").alias("_g0"),
        F.max("epoch_hour").alias("_g1"),
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(1, ZX_N_PROBES + 1)])
    ).alias("_k")
    step = F.lit(ZX_N_PROBES + 1)

    def probe(lo: str, hi: str):
        return (
            F.col(lo)
            + ((F.col(hi) - F.col(lo)) * F.col("_k"))
            .cast("bigint")
            / step
        ).cast("bigint")

    fanned = (
        env.crossJoin(F.broadcast(dom))
        .select(
            "layout", "_minu", "_maxu", "_minh", "_maxh",
            "_u0", "_u1", "_g0", "_g1", ks,
        )
        .withColumn("_up", probe("_u0", "_u1"))
        .withColumn("_hp", probe("_g0", "_g1"))
    )
    skip = fanned.groupBy("layout").agg(
        F.avg(
            F.when(
                (F.col("_up") < F.col("_minu"))
                | (F.col("_up") > F.col("_maxu")),
                1.0,
            ).otherwise(0.0)
        ).alias("_sr"),
        F.avg(
            F.when(
                (F.col("_hp") < F.col("_minh"))
                | (F.col("_hp") > F.col("_maxh")),
                1.0,
            ).otherwise(0.0)
        ).alias("_hsr"),
    )
    spans = env.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.round(F.avg(F.col("_maxu") - F.col("_minu")), 3).alias(
            "avg_user_span"
        ),
        F.round(F.avg(F.col("_maxh") - F.col("_minh")), 3).alias(
            "avg_hour_span"
        ),
    )
    return (
        spans.join(skip, "layout")
        .select(
            "layout",
            "n_buckets",
            "avg_user_span",
            "avg_hour_span",
            F.round(F.col("_sr"), 6).alias("user_skip_rate"),
            F.round(F.col("_hsr"), 6).alias("hour_skip_rate"),
        )
    )


def _sql_zorder_execute() -> str:
    from ..operators.sketches import sql_zorder_value

    zexpr = sql_zorder_value("user_id", "epoch_hour")
    return f"""
    WITH base AS (
      SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS epoch_hour
      FROM events
    ),
    z AS (SELECT *, {zexpr} AS zvalue FROM base),
    lay AS (
      SELECT 'zorder' AS layout, user_id, epoch_hour,
             CAST(ntile({ZX_BUCKETS}) OVER (ORDER BY zvalue, event_id)
                  AS INTEGER) AS bucket
      FROM z
      UNION ALL
      SELECT 'arrival', user_id, epoch_hour,
             CAST(ntile({ZX_BUCKETS}) OVER (ORDER BY event_id)
                  AS INTEGER) AS bucket
      FROM base
    ),
    env AS (
      SELECT layout, bucket,
             min(user_id) AS minu, max(user_id) AS maxu,
             min(epoch_hour) AS minh, max(epoch_hour) AS maxh
      FROM lay GROUP BY 1, 2
    ),
    dom AS (
      SELECT min(user_id) AS u0, max(user_id) AS u1,
             min(epoch_hour) AS g0, max(epoch_hour) AS g1
      FROM base
    ),
    skip AS (
      SELECT layout,
             avg(CASE WHEN up < minu OR up > maxu THEN 1.0 ELSE 0.0
                 END) AS sr,
             avg(CASE WHEN hp < minh OR hp > maxh THEN 1.0 ELSE 0.0
                 END) AS hsr
      FROM (
        SELECT e.layout, e.minu, e.maxu, e.minh, e.maxh,
               u0 + CAST((u1 - u0) * k AS BIGINT) // {ZX_N_PROBES + 1}
                 AS up,
               g0 + CAST((g1 - g0) * k AS BIGINT) // {ZX_N_PROBES + 1}
                 AS hp
        FROM env e CROSS JOIN dom
        CROSS JOIN (SELECT unnest(range(1, {ZX_N_PROBES + 1})) AS k)
      )
      GROUP BY 1
    ),
    spans AS (
      SELECT layout, CAST(count(*) AS BIGINT) AS n_buckets,
             round(avg(maxu - minu), 3) AS avg_user_span,
             round(avg(maxh - minh), 3) AS avg_hour_span
      FROM env GROUP BY 1
    )
    SELECT layout, n_buckets, avg_user_span, avg_hour_span,
           round(sr, 6) AS user_skip_rate,
           round(hsr, 6) AS hour_skip_rate
    FROM spans JOIN skip USING (layout)
    """


register("rel_zorder_execute", _zorder_execute, _sql_zorder_execute())


# --------------------------------------------------------------------------
# rel_poisson_bootstrap (round 14) — bootstrap confidence intervals
# without resampling passes: the Poisson bootstrap (Chamandy et al.,
# "Estimating Uncertainty for Massive Data Streams", Google 2012; Kleiner
# et al.'s BLB is the heavier cousin). Classical bootstrap resamples the
# dataset R times — unusable at 100 TB. The Poisson trick observes that a
# bootstrap resample's per-row multiplicity is ~Binomial(n, 1/n) ≈
# Poisson(1), so ONE scan can maintain R weighted counters per group,
# drawing each row's replica-r multiplicity from a per-(row, replica)
# hash. Report: per-group point estimate of mean order value, bootstrap
# mean/sd of the R replica estimates, and the normal-approximation 95% CI.
#
# Determinism/parity: multiplicities come from the portable hash32
# (identical in both engines); weighted sums run as exact INTEGER CENTS
# (v is DECIMAL(_,2) so v·100 is a lossless bigint; round 14 — the
# boxed-BigDecimal sums were the aggregate's dominant cost) and counts
# in BIGINT (order-independent), so every replica estimate is the
# same IEEE double on both engines; the across-replica mean/variance are
# explicit left-associative addition chains over the R=32 estimate
# columns (identical fold order), not engine-order row aggregates.
#
# 100 TB shape: a single scan with R×2 partial-aggregating counters per
# group (map-side combine; no row blowup, no shuffle beyond the 5-group
# rollup). R scales the counter width, never the scan count. The R
# uniform draws use Kirsch–Mitzenmacher double hashing (two md5 draws
# per row, u_r = (a + r·b) mod 2^32 — the bloom-filter construction):
# hashing cost is O(1) per row, not O(R). The hashed projection sits
# behind a lazy localCheckpoint barrier because Catalyst's
# CollapseProject would otherwise substitute the md5 trees into all
# 2R aggregate expressions, re-evaluating them 2R times per row
# (measured: 21.5 s → 1.9 s at sf0.1); at warehouse scale the
# per-row (a, b) pair would live with the table, amortized across
# every bootstrap read.
# --------------------------------------------------------------------------

BOOT_R = 32  # bootstrap replicas
BOOT_SEED0 = 1000  # replica r hashes with seed BOOT_SEED0 + r
BOOT_Z95 = 1.96
# cumulative Poisson(1) CDF at k = 0..4: multiplicity = first k whose
# cumulative probability exceeds the row's uniform hash (else 5)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)
_U_SCALE = 4294967296.0  # 2^32: hash32 -> uniform [0, 1)


def poisson_bootstrap_ci(
    prepared: DataFrame, group_col: str = "priority"
) -> DataFrame:
    """Per-group Poisson-bootstrap mean CI over a prepared frame with
    columns (group_col, v DECIMAL, _ha, _hb) — the caller computes the
    two portable hash32 draws (and any projection barrier). A group
    where some replica draws zero total multiplicity (possible only for
    tiny groups) reports NULL boot/CI columns on both engines
    (try_divide + an explicit NULL guard around the fold)."""

    def mult(r: int) -> Column:
        u = (
            (F.col("_ha") + F.lit(r) * F.col("_hb")) % F.lit(int(_U_SCALE))
        ) / F.lit(_U_SCALE)
        w: Column = F.lit(5)
        for k in range(len(_POIS_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
        return w

    # Replica sums run over INTEGER CENTS (v is DECIMAL(_,2), so
    # v·100 is an exact bigint): integer addition is associative, so
    # the estimates stay order-independent like the DECIMAL form, but
    # the 32 weighted sums run as codegen'd long arithmetic instead of
    # boxed BigDecimal — measured 2.2 s → 0.8 s for the aggregate at
    # sf0.1 (round 14, guide §1.2 per-task work). The replica estimate
    # divides the exact cents by 100.0 first: double(cents) is exact
    # below 2^53 and the /100.0 rounds once, so the estimate is the
    # same correctly-rounded double the DECIMAL→double cast produced
    # (driver-sim hash-verified at sf0.001/sf0.01).
    # EXACTNESS BOUND (round 15, VERDICT r14 item 9 / ADVICE r14): the
    # bigint replica sums and the double(cents) conversion are exact
    # only while |Σ w·cents| < 2^53 (≈ $90 T of group value mass;
    # multiplicity w ≤ 5, so 5·Σ|cents| bounds every replica sum).
    # Past it, a non-ANSI bigint Sum would keep wrapping silently at
    # 2^63 and the double conversion would round before 2^63 — either
    # silently diverging from the DECIMAL-form oracle. The _sav guard
    # aggregate (ONE decimal abs-sum next to the 32 long sums) makes
    # that loud: assert_true throws on any group whose value mass
    # could breach the bound, instead of returning a wrapped estimate.
    cents = (F.col("v") * 100).cast("bigint")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("v").alias("_sv"),
        F.sum(F.abs(F.col("v"))).alias("_sav"),
    ]
    for r in range(BOOT_R):
        w = mult(r)
        aggs.append(F.sum(w * cents).alias(f"_sw{r}"))
        aggs.append(F.sum(w).cast("bigint").alias(f"_cw{r}"))
    wide = prepared.groupBy(group_col).agg(*aggs)
    # assert_true returns NULL when the bound holds (so the when()
    # passes _pe through unchanged) and THROWS when a group's 5*|v|
    # mass could overflow the exact-cents window — output-reachable
    # via point_est so the optimizer cannot prune the guard
    guard_ok = F.assert_true(
        F.coalesce(F.col("_sav"), F.lit(0)).cast("double") * 500.0
        < F.lit(2.0**53),
        F.lit(
            "poisson_bootstrap_ci: group value mass exceeds the "
            "exact integer-cents bound (|5*sum(cents)| >= 2^53); "
            "the bigint replica sums would silently lose exactness"
        ),
    )
    ests = wide.select(
        group_col,
        "n_rows",
        F.when(
            guard_ok.isNull(),
            F.col("_sv").cast("double") / F.col("n_rows"),
        ).alias("_pe"),
        *[
            F.try_divide(
                F.col(f"_sw{r}").cast("double") / F.lit(100.0),
                F.col(f"_cw{r}"),
            ).alias(f"_e{r}")
            for r in range(BOOT_R)
        ],
    )
    s1 = ests["_e0"]
    s2 = ests["_e0"] * ests["_e0"]
    for r in range(1, BOOT_R):
        s1 = s1 + ests[f"_e{r}"]
        s2 = s2 + ests[f"_e{r}"] * ests[f"_e{r}"]
    folded = ests.select(
        group_col,
        "n_rows",
        "_pe",
        (s1 / F.lit(float(BOOT_R))).alias("_bm"),
        # explicit NULL guard: Spark's and DuckDB's greatest() both
        # SKIP nulls, which would turn a NULL variance into sd = 0.0
        F.when(s1.isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.sqrt(
                F.greatest(
                    (s2 - s1 * s1 / F.lit(float(BOOT_R)))
                    / F.lit(float(BOOT_R - 1)),
                    F.lit(0.0),
                )
            )
        )
        .alias("_bs"),
    )
    return folded.select(
        group_col,
        "n_rows",
        F.round("_pe", 6).alias("point_est"),
        F.round("_bm", 6).alias("boot_mean"),
        F.round("_bs", 6).alias("boot_sd"),
        F.round(F.col("_bm") - F.lit(BOOT_Z95) * F.col("_bs"), 6).alias("ci_lo"),
        F.round(F.col("_bm") + F.lit(BOOT_Z95) * F.col("_bs"), 6).alias("ci_hi"),
    )


def _poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash32

    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("priority"),
            _dec(F.col("o_totalprice")).alias("v"),
            hash32(F.col("o_orderkey"), seed=BOOT_SEED0).alias("_ha"),
            hash32(F.col("o_orderkey"), seed=BOOT_SEED0 + 1).alias("_hb"),
        )
        # barrier: stops CollapseProject substituting the md5 trees
        # into every aggregate expression (2R re-evaluations per row;
        # 21.5 s → 4.9 s at sf0.1). The multiplicity CASE chains stay
        # in the aggregate — they are cheap arithmetic over the two
        # materialized hash columns, and materializing all R of them
        # instead measures slower (7.4 s: checkpoint width dominates).
        .localCheckpoint(eager=False)
    )
    return poisson_bootstrap_ci(o)


def _sql_poisson_bootstrap() -> str:
    from ..functions.hashing import sql_hash32

    def mult(r: int) -> str:
        u = (
            f"(CAST((ha + {r} * hb) % {int(_U_SCALE)} AS DOUBLE)"
            f" / {_U_SCALE!r})"
        )
        branches = " ".join(
            f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
        )
        return f"(CASE {branches} ELSE 5 END)"

    sw = ",\n        ".join(
        f"SUM(CAST({mult(r)} AS DECIMAL(19,2)) * v) AS sw{r},"
        f" CAST(SUM({mult(r)}) AS BIGINT) AS cw{r}"
        for r in range(BOOT_R)
    )
    es = ",\n        ".join(
        f"CASE WHEN cw{r} = 0 THEN NULL"
        f" ELSE CAST(sw{r} AS DOUBLE) / cw{r} END AS e{r}"
        for r in range(BOOT_R)
    )
    s1 = " + ".join(f"e{r}" for r in range(BOOT_R))
    s2 = " + ".join(f"e{r} * e{r}" for r in range(BOOT_R))
    return f"""
    WITH o AS (
      SELECT o_orderpriority AS priority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             {sql_hash32('o_orderkey', BOOT_SEED0)} AS ha,
             {sql_hash32('o_orderkey', BOOT_SEED0 + 1)} AS hb
      FROM orders
    ),
    wide AS (
      SELECT priority, CAST(count(*) AS BIGINT) AS n_rows, SUM(v) AS sv,
        {sw}
      FROM o GROUP BY 1
    ),
    ests AS (
      SELECT priority, n_rows, CAST(sv AS DOUBLE) / n_rows AS pe,
        {es}
      FROM wide
    ),
    folded AS (
      SELECT priority, n_rows, pe,
             ({s1}) / {float(BOOT_R)!r} AS bm,
             CASE WHEN ({s1}) IS NULL THEN NULL ELSE
               sqrt(greatest((({s2}) - ({s1}) * ({s1}) / {float(BOOT_R)!r})
                             / {float(BOOT_R - 1)!r}, 0.0)) END AS bs
      FROM ests
    )
    SELECT priority, n_rows,
           round(pe, 6) AS point_est,
           round(bm, 6) AS boot_mean,
           round(bs, 6) AS boot_sd,
           round(bm - {BOOT_Z95!r} * bs, 6) AS ci_lo,
           round(bm + {BOOT_Z95!r} * bs, 6) AS ci_hi
    FROM folded
    """


register(
    "rel_poisson_bootstrap", _poisson_bootstrap, _sql_poisson_bootstrap()
)
