"""Widened OLAP coverage (round 2): the join types and window
functions the round-1 catalog didn't yet attest — LEFT/FULL OUTER
joins, conditional (CASE) aggregation, disjunctive predicate pushdown,
ratio-of-exact-sums, and the distribution window family
(ntile / percent_rank / cume_dist / first_value / last_value /
nth_value).

These generalize the reference's analysis surface the same way the
TPC-H-shaped queries in parity.py do (its pandas merges are all inner
or isin-semi — SURVEY §2.4 names outer joins as engine-surface gaps),
and each carries a bit-exact DuckDB oracle.

Scale posture per query is inline; nothing here introduces a new
shuffle pattern beyond what parity.py already demonstrates (broadcast
dims, partial+final aggs, single-window sorts with unique tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_processing_etl_orchestration_spark.functions.exact import (
    exact_avg,
    exact_sum,
    sql_exact_sum,
    sql_ts_str,
    ts_str,
)
from batch_processing_etl_orchestration_spark.plans.registry import register
from batch_processing_etl_orchestration_spark.tables import load_table


# ---------------------------------------------------------------------------
# LEFT OUTER join + distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------


@register(
    "q_left_join_order_counts",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    GROUP BY 1
    """,
    tags=("J", "left-outer"),
)
def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution via LEFT OUTER join (TPC-H
    Q13 shape): customers with zero orders must survive with count 0 —
    the outer-join semantic an inner join would silently drop.

    Scale: orders pre-aggregates to (custkey, count) BEFORE the join —
    the outer join's right side is one row per ordering customer, so
    the join handles |customers| rows, not |orders| (joining at order
    grain and counting after would shuffle the full fact through the
    join). Second agg is on a tiny key domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_ordering_cust = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n")
    )
    per_cust = c.join(
        per_ordering_cust, c["c_custkey"] == per_ordering_cust["o_custkey"], "left"
    ).select(F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# FULL OUTER join — reconcile two aggregates
# ---------------------------------------------------------------------------


@register(
    "q_full_outer_daily_types",
    oracle=f"""
    WITH c AS (
      SELECT {sql_ts_str("date_trunc('day', ts)")} AS day,
             COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT {sql_ts_str("date_trunc('day', ts)")} AS day,
             COUNT(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(c.day, p.day) AS day, c.n_clicks, p.n_purchases
    FROM c FULL OUTER JOIN p ON c.day = p.day
    """,
    tags=("J", "full-outer"),
)
def q_full_outer_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two daily aggregates with a FULL OUTER join — days
    present on either side survive with nulls on the missing side (the
    data-quality reconciliation shape: feed A vs feed B).

    Scale: both inputs pre-aggregate to |days| rows before the join —
    the outer join is over bounded key cardinality regardless of event
    volume."""
    ev = load_table(spark, sf_dir, "events")
    day = ts_str(F.date_trunc("day", F.col("ts"))).alias("day")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = clicks.alias("c").join(
        purchases.alias("p"), F.col("c.day") == F.col("p.day"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
        "n_clicks",
        "n_purchases",
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (TPC-H Q12 shape, adapted to fixture columns)
# ---------------------------------------------------------------------------


@register(
    "q_priority_line_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=("A", "case-agg"),
)
def q_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional CASE counts inside an aggregate over a fact-fact
    join (TPC-H Q12 shape on the fixture's columns).

    Scale: shipdate predicate pushes to the lineitem scan; the join
    shuffles on orderkey (AQE-splittable); CASE branches are codegen'd
    expressions, one pass."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Ratio of exact sums (TPC-H Q14 promo revenue)
# ---------------------------------------------------------------------------


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT {sql_ts_str("date_trunc('month', l_shipdate)")} AS month,
           100.0 * {sql_exact_sum(
               "CASE WHEN p_type = 'PROMO' "
               "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {sql_exact_sum('l_extendedprice * (1 - l_discount)')}
             AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
    tags=("A", "ratio"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share per month (TPC-H Q14): ratio of two
    scaled-long exact sums — numerator conditional on the part type.
    Both engines compute identical int64 sums, then one deterministic
    IEEE division each.

    Scale: part is the broadcast side (dim-sized); lineitem streams
    once; agg keys are months (bounded)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(ts_str(F.date_trunc("month", F.col("l_shipdate"))).alias("month"))
        .agg(
            (F.lit(100.0) * exact_sum(promo_rev) / exact_sum(rev)).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Disjunctive predicate pushdown (TPC-H Q19 shape)
# ---------------------------------------------------------------------------


@register(
    "q_disjunctive_revenue",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity < 20)
       OR (p_type = 'PROMO' AND l_quantity BETWEEN 5 AND 25)
    """,
    tags=("P", "disjunctive"),
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate across both join sides (TPC-H Q19 shape).
    Catalyst splits the disjunction: single-side conjuncts
    (l_quantity bounds OR-reduced) can push below the join while the
    cross-side residual evaluates after — the planner test asserts the
    scan isn't unfiltered.

    Scale: part broadcasts; one lineitem pass; global agg is a single
    partial+final reduce."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_type")
    joined = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & (F.col("l_quantity") < 20))
        | ((F.col("p_type") == "PROMO") & F.col("l_quantity").between(5, 25))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.where(cond).agg(
        F.count(F.lit(1)).alias("n_rows"), exact_sum(rev).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Distribution window family: ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------


@register(
    "q_window_distribution",
    oracle="""
    SELECT c_mktsegment,
           c_custkey,
           ntile(4)      OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("W", "distribution"),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per market segment — quartile
    bucketing (ntile), relative rank, cumulative distribution. Order
    key carries the unique c_custkey tiebreak so every function is
    deterministic; pct/cume round to 6dp (k/n rationals — engines
    agree, rounding guards the 1-ulp division edge).

    Scale: one shuffle on segment, one in-partition sort — same
    profile as any ranked window; segments are balanced here, skewed
    partitions would salt via two-level ntile."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Value-positional window family: first_value / last_value / nth_value
# ---------------------------------------------------------------------------


@register(
    "q_window_first_last",
    oracle=f"""
    SELECT DISTINCT
           user_id,
           {sql_ts_str("date_trunc('day', ts)")} AS day,
           first_value(event_type) OVER w AS first_event,
           last_value(event_type)  OVER w AS last_event,
           nth_value(event_type, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("W", "positional"),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last/second event of each user-day via positional window
    functions over an unbounded frame (the session-summary shape:
    entry page, exit page, second action). (ts, event_id) ordering is
    unique → deterministic; DISTINCT collapses to one row per
    user-day.

    Scale: one shuffle on (user, day), one sort; DISTINCT reuses the
    same partitioning (no second exchange)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = (
        Window.partitionBy("user_id", day)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        ts_str(day).alias("day"),
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(w).alias("last_event"),
        F.nth_value("event_type", 2).over(w).alias("second_event"),
    ).distinct()


# ---------------------------------------------------------------------------
# UNPIVOT / melt — wide → long reshape (inverse of the pivot family)
# ---------------------------------------------------------------------------


@register(
    "q_unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem
    )
    """,
    tags=("W", "reshape"),
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): three measure columns reshaped to
    (key, measure-name, value) long form — the inverse of the A4/A5
    pivots and the wide→long step a metrics store ingests. Native
    DataFrame.unpivot (Spark's Expand node), oracle = UNION ALL
    unrolling.

    Scale: Expand emits 3 rows per input row in the same task — no
    shuffle, no extra scan (vs the UNION ALL formulation's 3 scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=>)
# ---------------------------------------------------------------------------


@register(
    "q_nullsafe_join",
    oracle=f"""
    WITH a AS (
      SELECT NULLIF(user_id % 10, 0) AS bucket,
             COUNT(*) AS n_a,
             {sql_exact_sum('value')} AS val_a
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    b AS (
      SELECT NULLIF(user_id % 10, 0) AS bucket,
             COUNT(*) AS n_b
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT a.bucket, n_a, val_a, n_b
    FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    """,
    tags=("J", "null-safe"),
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    bucket on both sides must MATCH (one joined row), where a plain
    equi-join would silently drop it — the semantic trap in joining on
    nullable keys (the reference's fromba column is exactly such a
    key).

    Scale: same shuffle profile as an equi-join — null-safe equality
    still hash-partitions (nulls hash to one partition; a heavy null
    key would need the salted-agg treatment)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.nullif(F.col("user_id") % 10, F.lit(0)).alias("bucket")
    a = (
        ev.where(F.col("event_type") == "click")
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n_a"), exact_sum("value").alias("val_a"))
    )
    b = (
        ev.where(F.col("event_type") == "view")
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a["bucket"].eqNullSafe(b["bucket"])).select(
        a["bucket"], "n_a", "val_a", "n_b"
    )


# ---------------------------------------------------------------------------
# Multiset set-ops: INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------


@register(
    "q_set_ops_all",
    oracle="""
    WITH c AS (SELECT user_id, date_trunc('day', ts) AS day FROM events
               WHERE event_type = 'click'),
         v AS (SELECT user_id, date_trunc('day', ts) AS day FROM events
               WHERE event_type = 'view')
    SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (
      SELECT * FROM c INTERSECT ALL SELECT * FROM v
    )
    UNION ALL
    SELECT 'except_all', COUNT(*) FROM (
      SELECT * FROM c EXCEPT ALL SELECT * FROM v
    )
    """,
    tags=("O", "set-ops"),
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) semantics: INTERSECT ALL keeps min(multiplicity),
    EXCEPT ALL subtracts multiplicities — vs the DISTINCT set-ops
    already covered by q_set_ops. The (user, day) bags differ exactly
    by repeat visits, which DISTINCT forms erase.

    Scale: both plan as a single aggregate on the compared columns with
    count columns, then a generate — one shuffle each, same key profile
    as DISTINCT set-ops."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    c = ev.where(F.col("event_type") == "click").select("user_id", day)
    v = ev.where(F.col("event_type") == "view").select("user_id", day)
    inter = c.intersectAll(v).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    exc = c.exceptAll(v).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# IN-subquery over a HAVING aggregate (TPC-H Q18 shape)
# ---------------------------------------------------------------------------


@register(
    "q_large_volume_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           {sql_ts_str('o.o_orderdate')} AS o_orderdate,
           o.o_totalprice,
           {sql_exact_sum('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY 1
      HAVING CAST(SUM(CAST(ROUND(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 > 150
    )
    GROUP BY 1, 2, 3
    """,
    tags=("J", "subquery"),
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): orders whose lineitems
    total more than 150 units — an IN-subquery over a grouped HAVING,
    planned as a semi-join against the aggregated fact.

    Scale: the HAVING aggregate reduces lineitem to qualifying
    orderkeys before any join; both joins then key on orderkey (AQE
    co-planned). The quantity threshold uses the scaled-long sum on
    both sides so the HAVING boundary can't flap on float noise."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        l.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(qualifying, o["o_orderkey"] == qualifying["l_orderkey"], "left_semi")
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy(
            "o_orderkey",
            ts_str("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(exact_sum("l_quantity").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# Scalar-avg subquery + NOT EXISTS anti-join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@register(
    "q_global_sales_opportunity",
    oracle="""
    SELECT c_custkey % 7 AS segment_code,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(ROUND(c_acctbal * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS total_bal
    FROM customer c
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000.0 / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    # empty-ok: at sf0.01 every above-average-balance customer happens
    # to have orders, so the anti-join legitimately returns 0 rows
    tags=("J", "anti", "scalar-subquery", "empty-ok"),
)
def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promising inactive customers (TPC-H Q22 shape): above-average
    balance AND no orders — a scalar aggregate subquery feeding a
    filter plus a NOT EXISTS anti-join, grouped by a derived segment
    code.

    Scale: the scalar avg is one tiny global agg joined in as a
    broadcast single-row table (no driver-side collect — the plan
    stays fully declarative); the anti-join keys on custkey; the
    exact-avg threshold uses scaled-long on both sides so the
    comparison boundary is bit-stable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_row = (
        c.where(F.col("c_acctbal") > 0.0).agg(exact_avg("c_acctbal").alias("_avg"))
    )
    return (
        c.crossJoin(F.broadcast(avg_row))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("segment_code"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum("c_acctbal").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Bi-directional nation-pair volume (TPC-H Q7 shape): the same dimension
# joined twice under a cross-pair OR predicate
# ---------------------------------------------------------------------------


@register(
    "q_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_exact_sum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY 1, 2, 3
    """,
    tags=("J", "multi-join"),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-directional trade volume between two nations by ship year
    (TPC-H Q7 shape): a 6-relation join tree where NATION joins twice
    (supplier side and customer side) under a cross-pair OR predicate.

    Scale: all three dims (supplier, customer-side nation rows)
    broadcast; the nation-name predicates push into each nation scan
    BEFORE the broadcast, so the fact pipeline filters early on both
    foreign keys; lineitem⋈orders is the only shuffle pair (AQE
    co-planned)."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nations = ("NATION_1", "NATION_2")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c.join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))),
              o["o_custkey"] == c["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(exact_sum(volume).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Daily anomaly detection (round 3): z-score of daily event counts vs
# the event type's own history — the monitoring query a 100 TB
# ingest pipeline runs to catch feed outages / replays. All moments
# derive from exact integer sums (counts, squared counts), so
# mean/std/z involve no order-sensitive double folds.
# ---------------------------------------------------------------------------


@register(
    "q_daily_anomaly_zscore",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    moments AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n_events) AS BIGINT) AS s,
             CAST(SUM(n_events * n_events) AS BIGINT) AS q
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
           CAST(ROUND((CAST(d.n_events AS DOUBLE)
                  - CAST(m.s AS DOUBLE) / CAST(m.n_days AS DOUBLE))
                 / sqrt(CAST(m.n_days * m.q - m.s * m.s AS DOUBLE)
                        / CAST(m.n_days * (m.n_days - 1) AS DOUBLE))
                 * 1000000) AS BIGINT) / 1000000.0
             AS zscore,
           abs((CAST(d.n_events AS DOUBLE)
                - CAST(m.s AS DOUBLE) / CAST(m.n_days AS DOUBLE))
               / sqrt(CAST(m.n_days * m.q - m.s * m.s AS DOUBLE)
                      / CAST(m.n_days * (m.n_days - 1) AS DOUBLE))) > 2
             AS is_anomaly
    FROM daily d JOIN moments m ON m.event_type = d.event_type
    WHERE m.n_days > 1
    """,
    tags=("events", "anomaly"),
)
def q_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily volume z-scores with |z| > 2 anomaly flags.
    Sample variance comes from the integer identity
    (n*Q - S^2) / (n*(n-1)) over bigint count sums — exact in both
    engines — then one sqrt, one subtract, one divide (each a single
    IEEE op). Scale shape: the daily rollup is the only wide shuffle;
    moments is |event_type| rows, broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").cast("bigint").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("bigint").alias("q"),
    )
    z = (
        F.col("n_events").cast("double")
        - F.col("s").cast("double") / F.col("n_days").cast("double")
    ) / F.sqrt(
        (F.col("n_days") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n_days") * (F.col("n_days") - F.lit(1))).cast("double")
    )
    return (
        daily.join(F.broadcast(moments), "event_type")
        .where(F.col("n_days") > 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            # round AFTER scaling to 1e6 (repo convention, see
            # q_interpolate_gaps): rounding the raw double at scale 6
            # diverges between Spark and DuckDB on boundary values.
            (F.round(z * 1000000).cast("bigint") / F.lit(1000000.0)).alias(
                "zscore"
            ),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Gap interpolation (round 3): linear fill of missing points in a
# sparse hourly series — the time-series repair step the reference's
# energy-data domain (hourly EIA-930 feeds with dropped hours) needs
# before resampling/joining. Anchors = hours that saw a high-value
# event (value > 180, ~5-50% of hours depending on SF).
# ---------------------------------------------------------------------------


def _interp_sql() -> str:
    from batch_processing_etl_orchestration_spark.plans.parity import (
        _TS_START,
    )

    return f"""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT unnest(generate_series(0, 719)) AS i),
    grid AS (
      SELECT t.event_type, s.i,
             TIMESTAMP '{_TS_START}' + s.i * INTERVAL 1 HOUR AS hour
      FROM types t CROSS JOIN spine s
    ),
    anchors AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_hi,
             {{exact_sum}} AS v_anchor
      FROM events WHERE value > 180 GROUP BY 1, 2
    ),
    j AS (
      SELECT g.event_type, g.i, g.hour, a.n_hi, a.v_anchor
      FROM grid g LEFT JOIN anchors a
        ON a.event_type = g.event_type AND a.hour = g.hour
    ),
    w AS (
      SELECT *,
        last_value(v_anchor IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN v_anchor IS NOT NULL THEN i END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_i,
        first_value(v_anchor IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY i
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN v_anchor IS NOT NULL THEN i END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY i
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_i
      FROM j
    )
    SELECT event_type, {{ts_str}} AS hour,
           CAST(COALESCE(n_hi, 0) AS BIGINT) AS n_hi,
           v_anchor,
           CASE WHEN v_anchor IS NOT NULL THEN v_anchor
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN CAST(ROUND((prev_v + (next_v - prev_v)
                                 * (CAST(i - prev_i AS DOUBLE)
                                    / CAST(next_i - prev_i AS DOUBLE)))
                                * 1000000) AS BIGINT) / 1000000.0
                END AS v_filled,
           (v_anchor IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL)
             AS was_interpolated
    FROM w
    """


@register(
    "q_interpolate_gaps",
    oracle=_interp_sql().format(
        exact_sum=sql_exact_sum("value"), ts_str=sql_ts_str("hour")
    ),
    tags=("events", "timeseries"),
)
def q_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over gap hours: each missing point gets
    prev + (next - prev) * frac between its nearest anchors (IGNORE
    NULLS windows), leading/trailing gaps stay null. The interpolation
    fraction is a ratio of spine *indices* (exact integers, no
    timezone arithmetic), anchors are scaled-long exact sums, and the
    fill expression has the same association in both engines, so one
    ROUND(...,6) makes it bit-stable.

    Scale shape: the spine is |types| x 720 rows (metadata-sized
    here; at 100 TB, a year x millions of series — generated, never
    shuffled wide because the window partitions by series key). The
    anchor rollup is the only corpus shuffle; each series' fill is
    one sorted window pass."""
    from batch_processing_etl_orchestration_spark.plans.parity import (
        _TS_START,
    )

    ev = load_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    spine = spark.range(720).select(
        F.col("id").alias("i"),
        F.expr(
            f"timestampadd(HOUR, id, TIMESTAMP_NTZ '{_TS_START}')"
        ).alias("hour"),
    )
    anchors = (
        ev.where(F.col("value") > 180)
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_hi"),
            exact_sum("value").alias("v_anchor"),
        )
    )
    grid = types.crossJoin(spine)
    j = grid.join(anchors, ["event_type", "hour"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anchor_i = F.when(F.col("v_anchor").isNotNull(), F.col("i"))
    wcols = j.select(
        "event_type",
        "i",
        "hour",
        "n_hi",
        "v_anchor",
        F.last("v_anchor", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(anchor_i, ignorenulls=True).over(wp).alias("prev_i"),
        F.first("v_anchor", ignorenulls=True).over(wn).alias("next_v"),
        F.first(anchor_i, ignorenulls=True).over(wn).alias("next_i"),
    )
    frac = (F.col("i") - F.col("prev_i")).cast("double") / (
        F.col("next_i") - F.col("prev_i")
    ).cast("double")
    # round AFTER scaling to 1e6 so a tie (x.xxxxxx5) is an exactly-
    # representable .5 both engines round away from zero; rounding the
    # raw double at scale 6 diverges (Spark goes through the shortest
    # decimal string, DuckDB through the binary value).
    fill = F.when(F.col("v_anchor").isNotNull(), F.col("v_anchor")).when(
        F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
        F.round(
            (F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
            * 1000000
        ).cast("bigint")
        / F.lit(1000000.0),
    )
    return wcols.select(
        "event_type",
        ts_str(F.col("hour")).alias("hour"),
        F.coalesce("n_hi", F.lit(0)).cast("bigint").alias("n_hi"),
        "v_anchor",
        fill.alias("v_filled"),
        (
            F.col("v_anchor").isNull()
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
        ).alias("was_interpolated"),
    )


# ---------------------------------------------------------------------------
# Event funnel (round 3): first-view -> first-click-after -> first-
# purchase-after per user — the sequential conversion query event
# analytics runs constantly. All three milestones resolve in stacked
# Window nodes over ONE user_id partitioning (Catalyst reuses the
# single Exchange), not three self-joins.
# ---------------------------------------------------------------------------


@register(
    "q_events_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN v ON v.user_id = e.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN c ON c.user_id = e.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT v.user_id,
           {sql_ts_str('v.t')} AS first_view,
           {sql_ts_str('c.t')} AS first_click,
           {sql_ts_str('p.t')} AS first_purchase,
           p.t IS NOT NULL AS converted
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
    tags=("events", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step funnel: each user's first view, first click strictly
    after that view, and first purchase strictly after that click
    (strict ordering, not mere presence — a click that predates every
    view doesn't convert). The oracle expresses it as chained
    min-joins; the Spark plan instead stacks three conditional-min
    Windows on the same user_id partitioning, so the whole funnel
    costs ONE shuffle regardless of funnel depth — the formulation
    that matters when the events table is 100 TB and every self-join
    would reshuffle it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    step1 = ev.withColumn("fv", fv)
    fc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("fv")),
            F.col("ts"),
        )
    ).over(w)
    step2 = step1.withColumn("fc", fc)
    fp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fc")),
            F.col("ts"),
        )
    ).over(w)
    return (
        step2.withColumn("fp", fp)
        .where(F.col("fv").isNotNull())
        .groupBy("user_id")
        .agg(
            ts_str(F.min("fv")).alias("first_view"),
            ts_str(F.min("fc")).alias("first_click"),
            ts_str(F.min("fp")).alias("first_purchase"),
            (F.min("fp").isNotNull()).alias("converted"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention (round 3): users grouped by first-activity week,
# retention = share active k weeks later — the companion report to
# the funnel. Weeks truncate to Monday in both engines; k is an
# integer day-diff div 7, so every cell is an exact distinct count.
# ---------------------------------------------------------------------------


@register(
    "q_cohort_retention",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    fw AS (SELECT user_id, MIN(wk) AS cw FROM act GROUP BY 1),
    r AS (
      SELECT f.cw, CAST(date_diff('day', f.cw, a.wk) // 7 AS BIGINT) AS k,
             a.user_id
      FROM act a JOIN fw f ON f.user_id = a.user_id
    )
    SELECT {sql_ts_str('cw')} AS cohort_week, k,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM r GROUP BY 1, 2
    """,
    tags=("events", "cohort"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: cohort_week = the user's first
    active week, k = weeks since, n_active = distinct users from that
    cohort active in week k (the k=0 row is the cohort size).

    Scale shape: activity first collapses to DISTINCT (user, week) —
    the retention grain — so everything downstream moves |users|x|weeks|
    rows, not raw events; the first-week window rides the same user_id
    partitioning, and the final agg shuffles a (week, k) key domain of
    a few hundred rows."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id")
    r = act.withColumn("cw", F.min("wk").over(w)).select(
        "user_id",
        "cw",
        F.expr("CAST(datediff(wk, cw) DIV 7 AS BIGINT)").alias("k"),
    )
    return r.groupBy(ts_str(F.col("cw")).alias("cohort_week"), "k").agg(
        F.countDistinct("user_id").alias("n_active")
    )


# ---------------------------------------------------------------------------
# Capped sessionization (round 3): sessions split on a 6h inactivity
# gap OR when they would exceed 24h total — the max-duration rule
# every analytics warehouse adds to plain gap sessionization (bot
# sessions otherwise run for weeks). The cap depends on the RUNNING
# session start, a sequential recurrence no window function
# expresses; Spark-side it's a grouped-map applyInPandas per user,
# oracle-side a DuckDB recursive CTE — both walk the same ordered
# event stream.
# ---------------------------------------------------------------------------

_SESS_GAP_US = 6 * 3600 * 1_000_000
_SESS_CAP_US = 24 * 3600 * 1_000_000


SESS_CAPPED_ORACLE = f"""
    WITH RECURSIVE numbered AS (
      SELECT user_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    walk(user_id, rn, ts, sid, sess_start, by_cap) AS (
      SELECT user_id, rn, ts, 1, ts, 0
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.ts,
             w.sid + CASE WHEN date_diff('microsecond', w.ts, n.ts)
                               > {_SESS_GAP_US}
                           OR date_diff('microsecond', w.sess_start, n.ts)
                               > {_SESS_CAP_US}
                          THEN 1 ELSE 0 END,
             CASE WHEN date_diff('microsecond', w.ts, n.ts)
                       > {_SESS_GAP_US}
                   OR date_diff('microsecond', w.sess_start, n.ts)
                       > {_SESS_CAP_US}
                  THEN n.ts ELSE w.sess_start END,
             CASE WHEN date_diff('microsecond', w.ts, n.ts)
                       <= {_SESS_GAP_US}
                   AND date_diff('microsecond', w.sess_start, n.ts)
                       > {_SESS_CAP_US}
                  THEN 1 ELSE 0 END
      FROM walk w
      JOIN numbered n ON n.user_id = w.user_id AND n.rn = w.rn + 1
    ),
    per_session AS (
      SELECT user_id, sid, COUNT(*) AS n_ev,
             date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us,
             MAX(by_cap) AS started_by_cap
      FROM walk GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(SUM(started_by_cap) AS BIGINT) AS n_cap_splits,
           CAST(MAX(dur_us) AS BIGINT) AS longest_dur_us
    FROM per_session GROUP BY 1
    """


@register(
    "q_sessionize_capped",
    oracle=SESS_CAPPED_ORACLE,
    tags=("events", "session", "streaming-walk"),
)
def q_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary under gap-6h + cap-24h rules. The cap
    comparison uses the running session start, so assignment is a
    true recurrence — computed by one ordered streaming pass
    (integer-microsecond arithmetic end to end, so the oracle's
    date_diff('microsecond') walk is bit-identical). The cap binds on
    the fixture (4 splits at sf0.01), so a cap-logic bug changes the
    hash. See capped_session_summaries for the scale posture."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return capped_session_summaries(ev)


def capped_session_summaries(ev: DataFrame) -> DataFrame:
    """Gap+cap session walk over (user_id, event_id, ts) rows.

    Scale shape: ONE shuffle (repartition on user_id), then a sorted
    STREAMING walk — `sortWithinPartitions(user_id, ts, event_id)`
    makes each user's events contiguous and ordered, and `mapInPandas`
    consumes them one Arrow batch at a time, carrying only the open
    session's counters across batch boundaries. Unlike a grouped map
    (which materializes a user's FULL history as one pandas frame — a
    degenerate bot key with 10⁸ events would OOM an executor), resident
    state here is O(1) per in-flight user plus the current batch —
    the same posture as the streaming applyInPandasWithState twin."""

    def walk(batches):
        import pandas as pd

        cols = ["user_id", "n_sessions", "n_events", "n_cap_splits", "longest_dur_us"]
        uid = None  # user of the open summary, None = none in flight
        n_sessions = n_cap = n_events = longest = 0
        sess_start = sess_first = prev = 0

        def summary():
            return (uid, n_sessions, n_events, n_cap, max(longest, prev - sess_first))

        for pdf in batches:
            raw = pdf["ts"].astype("int64")
            # Arrow hands timestamps as datetime64[ns] or [us] depending
            # on pandas version — normalize to integer microseconds
            us = raw // 1000 if str(pdf["ts"].dtype).endswith("[ns]") else raw
            closed = []
            for u, t in zip(pdf["user_id"].to_numpy(), us.to_numpy()):
                u, t = int(u), int(t)
                if u != uid:  # next user's history starts
                    if uid is not None:
                        closed.append(summary())
                    uid = u
                    n_sessions, n_cap, n_events, longest = 1, 0, 1, 0
                    sess_start = sess_first = prev = t
                    continue
                n_events += 1
                gap_break = t - prev > _SESS_GAP_US
                cap_break = not gap_break and t - sess_start > _SESS_CAP_US
                if gap_break or cap_break:
                    longest = max(longest, prev - sess_first)
                    n_sessions += 1
                    n_cap += int(cap_break)
                    sess_start = sess_first = t
                prev = t
            if closed:
                yield pd.DataFrame(closed, columns=cols)
        if uid is not None:  # flush the last user
            yield pd.DataFrame([summary()], columns=cols)

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            walk,
            "user_id LONG, n_sessions BIGINT, n_events BIGINT, "
            "n_cap_splits BIGINT, longest_dur_us BIGINT",
        )
    )


@register(
    "q_geo_radius_join",
    oracle="""
    WITH cust AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 1000 AS BIGINT) AS x,
             CAST(c_custkey * 91 % 1000 AS BIGINT) AS y
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey,
             CAST(s_suppkey * 53 % 1000 AS BIGINT) AS x,
             CAST(s_suppkey * 17 % 1000 AS BIGINT) AS y
      FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           CAST((c.x - s.x) * (c.x - s.x)
                + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS dist2
    FROM cust c, supp s
    WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 225
    """,
    tags=("join", "spatial", "blocked"),
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join (distance ≤ 15 on a 1000×1000 plane, both
    point sets placed by integer key arithmetic so distances are
    exact): GRID-CELL BLOCKING instead of the oracle's quadratic cross
    join — suppliers snap to 16-unit cells, each customer probes its
    3×3 cell neighborhood (a constant ×9 narrow explode), and an exact
    integer distance predicate verifies candidates
    (operators/spatial.py grid_radius_join). Same blocked-join algebra
    as LSH bands / pigeonhole segments / IVF cells, instantiated for
    geometry — the claim SCALE.md makes ("grid cells would block
    geo"), now executable.

    Scale: the cell join is a key-partitioned equi-join on (cx, cy);
    candidates track per-cell point density, never |L|·|R|. The DuckDB
    oracle IS the naive cross join — affordable at sf0.01, which is
    exactly why the blocked plan is the one that ships."""
    from batch_processing_etl_orchestration_spark.operators.spatial import (
        grid_radius_join,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1000).cast("bigint").alias("x"),
        (F.col("c_custkey") * 91 % 1000).cast("bigint").alias("y"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_suppkey") * 53 % 1000).cast("bigint").alias("x"),
        (F.col("s_suppkey") * 17 % 1000).cast("bigint").alias("y"),
    )
    return grid_radius_join(cust, supp, radius=15.0, cell=16.0).select(
        "c_custkey", "s_suppkey", F.col("dist2").cast("bigint").alias("dist2")
    )


@register(
    "q_trend_slope_by_type",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(date_part('day', CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(ROUND(value * 1000000) AS BIGINT) AS y_s
      FROM events
    ),
    sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx,
             SUM(y_s) AS sy_s,
             SUM(x * y_s) AS sxy_s,
             SUM(x * x) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_points,
           ROUND(
             (CAST(n AS DOUBLE) * sxy_s - CAST(sx AS DOUBLE) * sy_s)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             / 1000000.0, 8) AS slope,
           ROUND(
             (CAST(sy_s AS DOUBLE) / 1000000.0
              - ((CAST(n AS DOUBLE) * sxy_s - CAST(sx AS DOUBLE) * sy_s)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / 1000000.0) * sx)
             / n, 8) AS intercept
    FROM sums
    """,
    tags=("A+", "analytics", "regression"),
)
def q_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend line (value vs day of month) via the
    closed-form normal equations over EXACT integer sums — the
    distributed way to fit a million independent regressions: one
    map-side-combined aggregation computes (n, Σx, Σy, Σxy, Σx²) per
    group, and slope/intercept are pure driver-free projections of
    those sums. y goes through the 1e6 scaled-long grid so every sum
    is exact and the final doubles agree bit-for-bit across engines
    (the oracle mirrors the formula term-for-term, rounded at 8 dp).

    Scale: ONE shuffle of 5 wide partials per group — no window, no
    sort, no per-group iteration. This is the same
    sufficient-statistics pattern as exact_std; at 100 TB, fitting
    per-entity trends (per user, per SKU) is the identical plan with
    a bigger key."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.dayofmonth(F.to_date("ts")).cast("bigint").alias("x"),
        F.round(F.col("value") * 1000000).cast("bigint").alias("y_s"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_s").alias("sy_s"),
        F.sum(F.col("x") * F.col("y_s")).alias("sxy_s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope_s = (nd * F.col("sxy_s") - F.col("sx").cast("double") * F.col("sy_s")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    slope = slope_s / 1000000.0
    intercept = (
        F.col("sy_s").cast("double") / 1000000.0 - slope * F.col("sx")
    ) / F.col("n")
    return sums.select(
        "event_type",
        F.col("n").alias("n_points"),
        F.round(slope, 8).alias("slope"),
        F.round(intercept, 8).alias("intercept"),
    )


@register(
    "q_sole_blame_supplier",
    oracle="""
    SELECT s.s_suppkey, ANY_VALUE(s.s_name) AS s_name,
           COUNT(*) AS n_blamed_lines
    FROM supplier s
    JOIN lineitem l1
      ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
    GROUP BY s.s_suppkey
    ORDER BY n_blamed_lines DESC, s.s_suppkey
    LIMIT 10
    """,
    tags=("J+", "subquery", "decorrelated"),
)
def q_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on this fixture: suppliers whose returned
    ('R') lines sit on multi-supplier orders where they are the ONLY
    supplier with a return — the classic correlated
    EXISTS + NOT-EXISTS pair, which the oracle states literally.

    The Spark side is the DECORRELATED formulation a 100 TB plan
    wants: ONE aggregation over lineitem computes per-order
    (distinct suppliers, distinct returned-suppliers); qualifying
    orders (≥2 suppliers, exactly 1 returned-supplier) semi-join the
    returned lines; a final supplier rollup ranks. Two shuffles on
    l_orderkey + one broadcast of the supplier dim replace two
    correlated scans of lineitem — the rewrite Catalyst cannot always
    find for NOT EXISTS, done at the source."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("nr"),
    )
    qualifying = per_order.where(
        (F.col("ns") > 1) & (F.col("nr") == 1)
    ).select("l_orderkey")
    blamed = (
        li.where(F.col("l_returnflag") == "R")
        .join(qualifying, "l_orderkey", "left_semi")
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_blamed_lines"))
    )
    return (
        blamed.join(F.broadcast(supp), "s_suppkey")
        .select("s_suppkey", "s_name", "n_blamed_lines")
        .orderBy(F.desc("n_blamed_lines"), "s_suppkey")
        .limit(10)
    )


@register(
    "q_masked_customers",
    oracle="""
    SELECT sha256(CAST(c_custkey AS VARCHAR)) AS cust_token,
           substring(c_name, 1, 9) || '***' AS name_masked,
           c_mktsegment,
           CAST(ROUND(c_acctbal / 100) * 100 AS DOUBLE) + 0.0 AS acctbal_bucket
    FROM customer
    """,
    tags=("governance", "masking"),
)
def q_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic data masking, the governance view an analyst role gets
    instead of raw PII: the key pseudonymized (sha256 token — stable
    for joins, irreversible), the name truncated, the balance
    generalized to a 100-unit bucket; the segment passes through for
    aggregation. All codegen'd projections — a masking VIEW costs
    nothing at any scale, and downstream queries on the view still
    push filters/pruning through it (the PII-redaction twin for
    structured columns; northstar.py q_pii_redact covers free text)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.sha2(F.col("c_custkey").cast("string"), 256).alias("cust_token"),
        F.concat(F.substring("c_name", 1, 9), F.lit("***")).alias(
            "name_masked"
        ),
        "c_mktsegment",
        (F.round(F.col("c_acctbal") / 100) * 100 + F.lit(0.0)).alias(
            "acctbal_bucket"
        ),
    )


@register(
    "q_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE nodes AS (
      SELECT c_custkey AS node, c_acctbal AS val FROM customer
      WHERE c_custkey BETWEEN 1 AND 127
    ),
    anc(node, anc) AS (
      SELECT node, node // 2 FROM nodes WHERE node > 1
      UNION
      SELECT a.node, a.anc // 2 FROM anc a WHERE a.anc > 1
    ),
    closure AS (
      SELECT node, anc FROM anc
      UNION ALL
      SELECT node, node FROM nodes
    ),
    depths AS (
      SELECT node, COUNT(*) - 1 AS depth FROM closure GROUP BY node
    )
    SELECT c.anc AS subtree_root,
           ANY_VALUE(d.depth) AS root_depth,
           CAST(COUNT(*) AS BIGINT) AS subtree_size,
           CAST(SUM(CAST(ROUND(n.val * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS subtree_bal
    FROM closure c
    JOIN nodes n ON n.node = c.node
    JOIN depths d ON d.node = c.anc
    GROUP BY c.anc
    """,
    tags=("A+", "hierarchy", "iterative"),
)
def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup — the recursive-CTE warehouse
    pattern (org charts, BOM explosions, account trees) Spark SQL has
    no RECURSIVE keyword for, built as a POINTER-DOUBLING closure: a
    127-node binary tree over customers (parent = key/2, value =
    acctbal); each doubling round joins the partial ancestor set with
    itself, so a depth-d hierarchy closes in ceil(log2 d) rounds —
    3 self-joins here, ~30 for a billion-level-degenerate chain —
    versus d rounds of naive parent-following. Every node's subtree
    then aggregates (size, exact-cents balance, root depth) from the
    closure in one groupBy. The oracle is DuckDB's literal WITH
    RECURSIVE walk.

    Scale: closure size is nodes × avg-depth (the true output), each
    round is a key-partitioned self-join of (node, anc) longs, and
    the rollup is one shuffle — the same discipline as
    connected_components' pointer jumping, applied to hierarchy
    aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    nodes = cust.where(F.col("c_custkey").between(1, 127)).select(
        F.col("c_custkey").alias("node"), F.col("c_acctbal").alias("val")
    )
    # direct-parent pairs (node > 1); closure via doubling
    pairs = nodes.where(F.col("node") > 1).select(
        "node", (F.col("node") / 2).cast("bigint").alias("anc")
    )
    closure = pairs
    for _ in range(3):  # ceil(log2(7 levels))
        hop = closure.select(
            F.col("node").alias("_n"), F.col("anc").alias("_mid")
        ).join(
            closure.select(
                F.col("node").alias("_mid"), F.col("anc").alias("_a")
            ),
            "_mid",
        ).select(F.col("_n").alias("node"), F.col("_a").alias("anc"))
        # localCheckpoint per round (r15 optimization): `closure` is
        # referenced twice per doubling (both join sides) plus the
        # union, so without truncation the lineage TRIPLES each round
        # — the initial plan carried 114 scans / 72 exchanges of
        # redundant recomputation (the same fixpoint discipline
        # pagerank/k-hop/pointer-jumping CC already apply).
        closure = (
            closure.unionByName(hop).distinct().localCheckpoint(eager=True)
        )
    closure = closure.unionByName(
        nodes.select("node", F.col("node").alias("anc"))
    )
    depths = closure.groupBy("node").agg(
        (F.count(F.lit(1)) - 1).alias("depth")
    )
    return (
        closure.join(nodes, "node")
        .join(
            depths.select(F.col("node").alias("anc"), "depth"), "anc"
        )
        .groupBy(F.col("anc").alias("subtree_root"))
        .agg(
            F.first("depth").alias("root_depth"),
            F.count(F.lit(1)).alias("subtree_size"),
            (
                F.sum(F.round(F.col("val") * 100).cast("long")) / 100.0
            ).alias("subtree_bal"),
        )
    )


@register(
    "q_sequence_pattern",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events
      GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT {sql_ts_str("CAST(day AS TIMESTAMP)")} AS day,
           CAST(COUNT(*) AS BIGINT) AS n_user_days,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'v[^e]*p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'e') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_error
    FROM seqs GROUP BY day
    """,
    tags=("W+", "pattern", "sequence"),
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection — SQL MATCH_RECOGNIZE's job, done
    portably: each (user, day) compresses its event stream into an
    ordered type-letter string (struct-sort by (ts, event_id) inside
    the aggregation — array-local, deterministic ties), and a regex
    states the behavioral pattern: 'viewed, then purchased with no
    error in between' (v[^e]*p). Daily rollup counts matching users.

    Scale: ONE shuffle on (user, day) builds the sequences; the
    pattern test is a codegen'd regex over short strings — no
    self-joins per step the way a funnel-as-joins formulation pays,
    and arbitrarily complex order-sensitive patterns are one regex
    edit away. The per-key string is bounded by a user-day's events
    (the capped-session caveat applies to adversarial keys)."""
    ev = load_table(spark, sf_dir, "events")
    grouped = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id",
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("seq")
    )
    return grouped.groupBy(
        ts_str(F.col("day").cast("timestamp")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum(F.when(F.col("seq").rlike("v[^e]*p"), 1).otherwise(0)).alias(
            "n_matched"
        ),
        F.sum(F.when(F.col("seq").rlike("e"), 1).otherwise(0)).alias(
            "n_with_error"
        ),
    )


@register(
    "q_chisq_type_dow",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             date_part('dow', CAST(ts AS DATE)) AS dow,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT o.*,
             SUM(o.o) OVER (PARTITION BY o.event_type) AS row_n,
             SUM(o.o) OVER (PARTITION BY o.dow) AS col_n,
             SUM(o.o) OVER () AS n
      FROM obs o
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows,
           ROUND(SUM(
             (CAST(o AS DOUBLE)
              - CAST(row_n AS DOUBLE) * col_n / n)
             * (CAST(o AS DOUBLE)
                - CAST(row_n AS DOUBLE) * col_n / n)
             / (CAST(row_n AS DOUBLE) * col_n / n)
           ), 6) AS chi2
    FROM margins
    """,
    tags=("A+", "statistics"),
)
def q_chisq_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and day of
    week, computed entirely from the CONTINGENCY TABLE's sufficient
    statistics: one aggregation builds the observed cell counts
    (types × 7 — metadata-sized), window sums derive the margins, and
    the χ² statistic is a projection — the distributed recipe for "is
    this behavioral dimension independent of time" at any fact-table
    size, since the facts are touched exactly once.

    Determinism: every input to the float expression is an exact
    integer count, IEEE ×/÷ are correctly rounded, and the final sum
    runs over ≤35 cells in DECIMAL-free double — rounded at 6 dp the
    engines agree (the exact-count-in, rounded-stat-out convention of
    q_trend_slope_by_type and q_bm25_topk)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        (F.dayofweek(F.to_date("ts")) - 1).alias("dow"),  # Sun=0 like DuckDB
    ).agg(F.count(F.lit(1)).alias("o"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    m = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(w_row).alias("row_n"),
        F.sum("o").over(w_col).alias("col_n"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("dow").alias("n_dows"),
        F.round(
            F.sum((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e),
            6,
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Round 7: exponential smoothing, skyline, time-weighted average
# ---------------------------------------------------------------------------


@register(
    "q_ewma_daily_value",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    acc AS (
      SELECT event_type, day, rn,
             SUM(v * CAST(POWER(2.0, CASE WHEN rn = 1 THEN 1 ELSE rn - 1 END)
                          AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS s
      FROM seq
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           CAST(FLOOR(CAST(s AS DOUBLE) / POWER(2.0, rn) + 0.5) AS BIGINT)
             / 100.0 AS ewma_value
    FROM acc
    """,
    tags=("analytics", "timeseries", "ewma"),
)
def q_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily value per event
    type (α = 1/2, s₁ = x₁, sₜ = xₜ/2 + sₜ₋₁/2) — the smoothing
    primitive Spark has no built-in for, computed EXACTLY: with
    α = 1/2 the closed form is sₜ = (2·x₁ + Σᵢ₌₂ xᵢ·2^(i−1)) / 2ᵗ, so
    the weighted prefix accumulates in INT64 (daily sums in exact
    centi-units × power-of-two weights) and the single final division
    by 2ᵗ is an exact binary scaling — both engines emit the identical
    grid value; no float recursion ever runs.

    Plan: one groupBy (day pre-aggregation, map-side partials) + one
    window per (event_type) over DAYS — ≤31 rows per key at any data
    volume, so the window input is the aggregated domain, never the
    fact stream. Overflow bound: |daily_centi| · 2^(days) < 2^63 —
    holds through sf100 for a month window; longer horizons re-anchor
    per window (the standard EWMA restart)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    rn = F.row_number().over(w)
    seq = daily.select("event_type", "day", "v", rn.alias("rn"))
    weight = F.pow(
        F.lit(2.0),
        F.when(F.col("rn") == 1, F.lit(1)).otherwise(F.col("rn") - 1),
    ).cast("long")
    acc = seq.withColumn(
        "s",
        F.sum(F.col("v") * weight).over(
            Window.partitionBy("event_type")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return acc.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.floor(
                F.col("s").cast("double") / F.pow(F.lit(2.0), F.col("rn"))
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("ewma_value"),
    )


@register(
    "q_pareto_frontier_parts",
    oracle="""
    WITH best AS (
      SELECT p_size, MAX(p_retailprice) AS best_price
      FROM part GROUP BY 1
    ),
    fr AS (
      SELECT b.p_size, b.best_price FROM best b
      WHERE NOT EXISTS (
        SELECT 1 FROM best b2
        WHERE b2.p_size > b.p_size AND b2.best_price >= b.best_price
      )
    )
    SELECT f.p_size, f.best_price,
           COUNT(*) AS n_parts, MIN(p.p_partkey) AS min_partkey
    FROM fr f JOIN part p
      ON p.p_size = f.p_size AND p.p_retailprice = f.best_price
    GROUP BY 1, 2
    """,
    tags=("analytics", "skyline"),
)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts maximizing (p_size,
    p_retailprice): the points no other part weakly dominates with at
    least one strict improvement. The oracle does the textbook
    quadratic NOT EXISTS; the engine computes the staircase in
    O(domain log domain): pre-aggregate max price per size, sort the
    ≤~50-row size domain descending, and a point survives iff its
    price strictly exceeds the running max over larger sizes (the
    classic sort-scan skyline).

    Scale: the frontier over a BOUNDED attribute domain pre-aggregates
    first (one map-side-combine groupBy of the fact), so the ordered
    scan runs on the aggregated domain — ~|distinct sizes| rows, not
    rows of data. An unbounded x-domain uses the same staircase over
    range-partitioned x with per-partition running maxes merged by one
    boundary pass (the monoid is MAX, so partials compose); the
    quadratic oracle exists precisely because nobody can run it at
    100 TB."""
    part = load_table(spark, sf_dir, "part")
    best = part.groupBy("p_size").agg(
        F.max("p_retailprice").alias("best_price")
    )
    w = (
        Window.orderBy(F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = best.withColumn(
        "_prev_max", F.max("best_price").over(w)
    ).where(
        F.col("_prev_max").isNull()
        | (F.col("best_price") > F.col("_prev_max"))
    )
    return (
        frontier.join(
            part,
            (part["p_size"] == frontier["p_size"])
            & (part["p_retailprice"] == frontier["best_price"]),
        )
        .groupBy(frontier["p_size"], "best_price")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").alias("min_partkey"),
        )
    )


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             DATEDIFF('second', TIMESTAMP '2024-01-01', ts) AS ep,
             LEAD(DATEDIFF('second', TIMESTAMP '2024-01-01', ts))
               OVER (PARTITION BY event_type
                     ORDER BY DATEDIFF('second', TIMESTAMP '2024-01-01', ts),
                              event_id) AS nep
      FROM events
    )
    SELECT event_type,
           CAST(FLOOR(CAST(SUM(v * (nep - ep)) AS DOUBLE)
                      / SUM(nep - ep) + 0.5) AS BIGINT) / 100.0
             AS twa_value,
           COUNT(*) AS n_events,
           CAST(SUM(nep - ep) AS BIGINT) AS span_seconds
    FROM e GROUP BY 1
    """,
    tags=("analytics", "timeseries", "twa"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event stream: each observation
    holds until the next one, so the mean weights every value by its
    holding duration — the correct aggregate for irregularly sampled
    gauges (the reference's hourly energy readings are the regular
    special case). All arithmetic is integer-exact: epoch seconds from
    a FIXED timestamp anchor (pure TIMESTAMP_NTZ subtraction — no
    session-timezone dependence), centi-scaled values, and one final
    grid division; Σ v·dt is bounded by max|v| · total span, so it
    cannot overflow however many rows a stream has.

    Plan — deliberately NOT one window over the whole stream: a
    partitionBy(event_type) window puts an entire stream's history in
    one task, which is exactly the skew that kills low-cardinality
    keys at 100 TB. Instead phase 1 windows within (event_type, DAY)
    — thousands of balanced partitions — producing per-day partials
    (in-day weighted sum, first/last observation); phase 2 stitches
    day boundaries with a lead over the ≤31-row per-type day sequence
    (boundary contribution = last value of day d held until first
    observation of day d+1). The oracle computes the same integral
    with one naive lead window; hash equality proves the
    decomposition is seamless."""
    anchor = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.to_date("ts").alias("day"),
        F.expr(f"timestampdiff(SECOND, {anchor}, ts)").alias("ep"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    in_day = Window.partitionBy("event_type", "day").orderBy(
        "ep", "event_id"
    )
    stamped = ev.withColumn("nep", F.lead("ep").over(in_day))
    days = stamped.groupBy("event_type", "day").agg(
        F.sum(
            F.when(
                F.col("nep").isNotNull(),
                F.col("v") * (F.col("nep") - F.col("ep")),
            )
        ).alias("in_day_vdt"),
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.struct("ep", "event_id")).getField("ep").alias("first_ep"),
        F.max(F.struct("ep", "event_id", "v")).getField("ep").alias("last_ep"),
        F.max(F.struct("ep", "event_id", "v")).getField("v").alias("last_v"),
    )
    over_days = Window.partitionBy("event_type").orderBy("day")
    stitched = days.withColumn(
        "next_first_ep", F.lead("first_ep").over(over_days)
    ).withColumn(
        "boundary_vdt",
        F.when(
            F.col("next_first_ep").isNotNull(),
            F.col("last_v") * (F.col("next_first_ep") - F.col("last_ep")),
        ),
    ).withColumn(
        "boundary_dt",
        F.when(
            F.col("next_first_ep").isNotNull(),
            F.col("next_first_ep") - F.col("last_ep"),
        ),
    )
    return stitched.groupBy("event_type").agg(
        (
            F.floor(
                (
                    F.coalesce(F.sum("in_day_vdt"), F.lit(0))
                    + F.coalesce(F.sum("boundary_vdt"), F.lit(0))
                ).cast("double")
                / (
                    F.sum(
                        F.coalesce(F.col("last_ep") - F.col("first_ep"), F.lit(0))
                    )
                    + F.coalesce(F.sum("boundary_dt"), F.lit(0))
                )
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("twa_value"),
        F.sum("n_events").alias("n_events"),
        (
            F.sum(F.coalesce(F.col("last_ep") - F.col("first_ep"), F.lit(0)))
            + F.coalesce(F.sum("boundary_dt"), F.lit(0))
        ).alias("span_seconds"),
    )


@register(
    "q_mad_robust_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS sv
      FROM events
    ),
    m AS (
      SELECT event_type, quantile_cont(sv, 0.5) AS med_s
      FROM s GROUP BY 1
    ),
    d AS (
      SELECT s.event_type, s.sv, m.med_s,
             ABS(s.sv - m.med_s) AS adev
      FROM s JOIN m USING (event_type)
    ),
    md AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad_s
      FROM d GROUP BY 1
    )
    SELECT d.event_type,
           COUNT(*) AS n_rows,
           ANY_VALUE(d.med_s) / 100.0 AS med_value,
           ANY_VALUE(md.mad_s) / 100.0 AS mad_value,
           CAST(SUM(CASE WHEN 0.6745 * d.adev > 3.5 * md.mad_s
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN md USING (event_type)
    GROUP BY 1
    """,
    tags=("analytics", "robust", "quality"),
)
def q_mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by modified z-score (median + MAD,
    the Iglewicz-Hoaglin 3.5 rule): unlike mean/std z-scores
    (q_daily_anomaly_zscore), the breakdown point is 50% — a burst of
    garbage values cannot drag the threshold after itself, which is
    why data-quality gates on raw feeds prefer MAD.

    Determinism: values snap to the centi grid as scaled longs;
    medians of longs interpolate (a+b)/2 where a+b is exactly
    representable, so Spark's percentile() and DuckDB's
    quantile_cont() agree bit-for-bit, and every derived comparison
    is the same exact doubles on both engines.

    Scale: two shuffles of events on event_type (median pass, MAD
    pass) with the 6-row median table broadcast between them; exact
    medians per group are a sort within each group's partition —
    for a mega-group switch percentile() to approx_percentile with
    the q_value_percentiles attestation pattern."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("sv"),
    )
    # lazy checkpoint (r15 optimization): d (below) feeds the MAD
    # pass AND the final rollup, so med's full median shuffle would
    # re-run with each — truncate the 6-row median table; d's own
    # duplication is then two base scans + broadcast joins (the
    # documented two-pass floor, cheaper than materializing events).
    med = s.groupBy("event_type").agg(
        F.percentile("sv", 0.5).alias("med_s")
    ).localCheckpoint(eager=False)
    d = s.join(F.broadcast(med), "event_type").select(
        "event_type",
        "sv",
        "med_s",
        F.abs(F.col("sv") - F.col("med_s")).alias("adev"),
    )
    mad = d.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad_s")
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.first("med_s") / 100.0).alias("med_value"),
            (F.first("mad_s") / 100.0).alias("mad_value"),
            F.sum(
                F.when(
                    F.lit(0.6745) * F.col("adev")
                    > F.lit(3.5) * F.col("mad_s"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8 (cont.): customer-analytics and distribution-diagnostics family —
# RFM segmentation, Markov transitions, last-touch attribution, key-skew
# report, drift detection, exact correlation matrix.
# ---------------------------------------------------------------------------


@register(
    "q_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM orders GROUP BY 1
    ),
    th AS (
      SELECT quantile_cont(recency_days, 0.25) AS r25,
             quantile_cont(recency_days, 0.50) AS r50,
             quantile_cont(recency_days, 0.75) AS r75,
             quantile_cont(frequency, 0.25) AS f25,
             quantile_cont(frequency, 0.50) AS f50,
             quantile_cont(frequency, 0.75) AS f75,
             quantile_cont(monetary_c, 0.25) AS m25,
             quantile_cont(monetary_c, 0.50) AS m50,
             quantile_cont(monetary_c, 0.75) AS m75
      FROM per_cust
    )
    SELECT CAST(1 + CASE WHEN recency_days > r25 THEN 1 ELSE 0 END
                  + CASE WHEN recency_days > r50 THEN 1 ELSE 0 END
                  + CASE WHEN recency_days > r75 THEN 1 ELSE 0 END
                AS BIGINT) AS r_q,
           CAST(1 + CASE WHEN frequency > f25 THEN 1 ELSE 0 END
                  + CASE WHEN frequency > f50 THEN 1 ELSE 0 END
                  + CASE WHEN frequency > f75 THEN 1 ELSE 0 END
                AS BIGINT) AS f_q,
           CAST(1 + CASE WHEN monetary_c > m25 THEN 1 ELSE 0 END
                  + CASE WHEN monetary_c > m50 THEN 1 ELSE 0 END
                  + CASE WHEN monetary_c > m75 THEN 1 ELSE 0 END
                AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_c) AS BIGINT) / 100.0 AS monetary_total
    FROM per_cust, th
    GROUP BY 1, 2, 3
    """,
    tags=("analytics", "segmentation", "rfm"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles) —
    the marketing-analytics staple the reference's per-facility
    pandas rollups gesture at. Quartiles are assigned by COMPARISON
    against exact percentile thresholds, not ntile(): ntile's
    remainder distribution is engine-specific, while `score > t25`
    against an exactly interpolated threshold is the same decision on
    both engines (thresholds over integer grids interpolate at
    quarter fractions, exactly representable).

    Determinism: recency is integer days, frequency integer, monetary
    a cent-long; all aggregates integer-exact; the only doubles are
    the thresholds (exact rationals) and the final /100.0.

    Scale: one shuffle of orders on o_custkey; thresholds are a
    single broadcast row; at 1e9 customers swap F.percentile for
    approx_percentile — assignment stays comparison-based so the
    swap is drop-in (document the epsilon in the attestation)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    gmax = o.agg(F.max("od").alias("gmax"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("od").alias("last_od"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").alias("monetary_c"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "o_custkey",
            F.datediff("gmax", "last_od").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
        # lazy checkpoint (r15 optimization): per_cust feeds the
        # threshold row AND the quartile assignment — without
        # truncation the orders shuffle ran twice.
        .localCheckpoint(eager=False)
    )
    th = per_cust.agg(
        F.percentile("recency_days", 0.25).alias("r25"),
        F.percentile("recency_days", 0.50).alias("r50"),
        F.percentile("recency_days", 0.75).alias("r75"),
        F.percentile("frequency", 0.25).alias("f25"),
        F.percentile("frequency", 0.50).alias("f50"),
        F.percentile("frequency", 0.75).alias("f75"),
        F.percentile("monetary_c", 0.25).alias("m25"),
        F.percentile("monetary_c", 0.50).alias("m50"),
        F.percentile("monetary_c", 0.75).alias("m75"),
    )

    def quart(col: str, t1: str, t2: str, t3: str):
        return (
            F.lit(1)
            + F.when(F.col(col) > F.col(t1), 1).otherwise(0)
            + F.when(F.col(col) > F.col(t2), 1).otherwise(0)
            + F.when(F.col(col) > F.col(t3), 1).otherwise(0)
        ).cast("long")

    return (
        per_cust.crossJoin(F.broadcast(th))
        .select(
            quart("recency_days", "r25", "r50", "r75").alias("r_q"),
            quart("frequency", "f25", "f50", "f75").alias("f_q"),
            quart("monetary_c", "m25", "m50", "m75").alias("m_q"),
            "monetary_c",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("monetary_c") / 100.0).alias("monetary_total"),
        )
    )


@register(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    tr AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
      SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
      FROM tr GROUP BY 1
    )
    SELECT tr.prev_type, tr.event_type, tr.n_trans,
           CAST(tr.n_trans AS DOUBLE) / tot.n_from AS p_trans
    FROM tr JOIN tot USING (prev_type)
    """,
    tags=("analytics", "sequence", "markov"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current event type), the building
    block of clickstream propensity models and journey analysis
    (generalizes the reference's per-type rollups to SEQUENCE
    structure, like q_sequence_pattern but as a full conditional
    distribution).

    Determinism: transitions are integer counts; p_trans is a single
    IEEE division of exactly-represented integers — bit-identical on
    both engines. Tiebreak (ts, event_id) makes the lag total-ordered.

    Scale: one shuffle of events on user_id for the lag window (the
    per-user sort is linear within each user's partition slice), one
    partial+final count agg on (prev, next) — ≤ |types|² rows — and a
    broadcast join of the |types|-row totals. No global window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    tr = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    tot = tr.groupBy("prev_type").agg(F.sum("n_trans").alias("n_from"))
    return tr.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        "n_trans",
        (F.col("n_trans").cast("double") / F.col("n_from")).alias("p_trans"),
    )


@register(
    "q_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS value_c,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel0
      FROM events
    )
    SELECT COALESCE(channel0, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(value_c) AS BIGINT) / 100.0 AS attributed_value
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("analytics", "attribution", "window"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value is
    credited to the nearest PRECEDING non-purchase event type in the
    same user's stream ('direct' when the purchase opens the stream).
    The canonical funnel-credit model — and the IGNORE-NULLS
    last_value window is the one-pass way to express 'most recent
    qualifying predecessor' without a self-join.

    Determinism: values snap to cent-longs before the window; the
    credited channel is a deterministic function of the (ts,
    event_id)-total-ordered stream; the only double is the final
    /100.0.

    Scale: single shuffle of events on user_id; the running
    last-non-purchase carry is O(1) state per row within the window
    sort — no per-user materialization, no self-join (a ts-range
    self-join would shuffle events twice and explode on power
    users)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("channel0"),
    )
    return (
        seq.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel0", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum("value_c") / 100.0).alias("attributed_value"),
        )
    )


@register(
    "q_key_skew_report",
    oracle="""
    WITH oc AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    ls AS (
      SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    o1 AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             quantile_cont(cnt, 0.5) AS median_cnt
      FROM oc
    ),
    o2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hot
      FROM oc, o1 WHERE cnt * n_keys > 2 * total_rows
    ),
    l1 AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             quantile_cont(cnt, 0.5) AS median_cnt
      FROM ls
    ),
    l2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hot
      FROM ls, l1 WHERE cnt * n_keys > 2 * total_rows
    )
    SELECT 'orders.o_custkey' AS key_col, total_rows, n_keys, max_cnt,
           median_cnt,
           CAST(total_rows AS DOUBLE) / n_keys AS avg_cnt,
           CAST(max_cnt AS DOUBLE) * n_keys / total_rows AS skew_ratio,
           n_hot
    FROM o1, o2
    UNION ALL
    SELECT 'lineitem.l_suppkey', total_rows, n_keys, max_cnt, median_cnt,
           CAST(total_rows AS DOUBLE) / n_keys,
           CAST(max_cnt AS DOUBLE) * n_keys / total_rows,
           n_hot
    FROM l1, l2
    """,
    tags=("analytics", "diagnostics", "skew"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation-key skew diagnostics — the report a platform
    team runs BEFORE picking a partitioning strategy at 100 TB: per
    key column, total rows, distinct keys, max/median/avg per-key
    count, skew ratio (max over mean), and the hot-key count (keys
    holding > 2x their fair share). This is the measurement side of
    the salting/AQE decisions SCALE.md documents per query.

    Determinism: all counts integer; the hot-key predicate is pure
    integer arithmetic (cnt * n_keys > 2 * total — the cnt > 2*avg
    comparison cleared of its division); median interpolates integer
    halves exactly; avg and skew_ratio are two-op IEEE chains with no
    additive step (no FMA hazard).

    Scale: per source, one partial+final count shuffle on the key,
    then a single-row stats agg and a broadcast of that row back over
    the counts for the hot predicate. Exact median of the per-key
    count table sorts |keys| longs; swap for approx_percentile at
    1e9+ keys (the other stats stream)."""
    results = []
    for label, table, key in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ):
        t = load_table(spark, sf_dir, table)
        # lazy checkpoints (r15 optimization): counts feeds the stats
        # row AND the hot predicate, stats feeds the hot predicate AND
        # the report row — without truncation the fact groupBy shuffle
        # ran twice per table and the stats pass twice on top.
        counts = (
            t.groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=False)
        )
        stats = counts.agg(
            F.sum("cnt").alias("total_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.percentile("cnt", 0.5).alias("median_cnt"),
        ).localCheckpoint(eager=False)
        hot = (
            counts.crossJoin(F.broadcast(stats))
            .where(F.col("cnt") * F.col("n_keys") > 2 * F.col("total_rows"))
            .agg(F.count(F.lit(1)).alias("n_hot"))
        )
        results.append(
            stats.crossJoin(F.broadcast(hot)).select(
                F.lit(label).alias("key_col"),
                "total_rows",
                "n_keys",
                "max_cnt",
                "median_cnt",
                (F.col("total_rows").cast("double") / F.col("n_keys")).alias(
                    "avg_cnt"
                ),
                (
                    F.col("max_cnt").cast("double")
                    * F.col("n_keys")
                    / F.col("total_rows")
                ).alias("skew_ratio"),
                "n_hot",
            )
        )
    return results[0].unionByName(results[1])


@register(
    "q_value_drift_tvd",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             DATEDIFF('second', TIMESTAMP '2024-01-01', ts) AS ep
      FROM events
    ),
    bounds AS (
      SELECT MIN(ep) + MAX(ep) AS mm FROM e
    ),
    b AS (
      SELECT event_type,
             CASE WHEN ep * 2 < bounds.mm THEN 0 ELSE 1 END AS side,
             LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bucket
      FROM e, bounds
    ),
    c AS (
      SELECT event_type, bucket,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_a,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_b
      FROM b GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(SUM(cnt_a) AS BIGINT) AS n_a,
             CAST(SUM(cnt_b) AS BIGINT) AS n_b
      FROM c GROUP BY 1
    )
    SELECT c.event_type, ANY_VALUE(t.n_a) AS n_a, ANY_VALUE(t.n_b) AS n_b,
           CASE WHEN ANY_VALUE(t.n_a) = 0 OR ANY_VALUE(t.n_b) = 0 THEN 1.0
                ELSE CAST(CAST(SUM(ABS(c.cnt_a * t.n_b - c.cnt_b * t.n_a))
                               AS BIGINT) AS DOUBLE)
                     / (2.0 * ANY_VALUE(t.n_a) * ANY_VALUE(t.n_b))
           END AS tvd
    FROM c JOIN t USING (event_type)
    GROUP BY 1
    """,
    tags=("analytics", "drift", "data-quality"),
)
def q_value_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the first and second half of the
    event timeline, per event type: total-variation distance over a
    fixed 10-bucket value histogram. The deploy-gate metric behind
    'did this feed's distribution move?' — TVD is chosen over PSI
    deliberately: PSI's log-ratio is a transcendental (libm vs
    java.lang.Math differ in the last ulp), while TVD here is an
    EXACT RATIONAL — Σ|cnt_a·n_b − cnt_b·n_a| is computed in int64
    and divided once by 2·n_a·n_b.

    Determinism: epochs are integer seconds from a fixed
    TIMESTAMP_NTZ anchor (pure NTZ subtraction, no session-timezone
    dependence — the q_time_weighted_avg precedent), and the split
    compares 2·ep against min+max (shift-invariant, no midpoint
    division); buckets are floor(v/50) clamps; the single final
    division is the only rounding step.

    Scale: two partial+final aggs of events keyed by (type, bucket)
    then (type) — both tiny result sets — and a |types|-row broadcast
    join. The int64 cross-products hold to ~1e9 rows per side per
    type; past that, compute the bucket proportions in DOUBLE (the
    deterministic-rational guarantee degrades to 1-ulp, acceptable
    for a drift gate) or lift to DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("ep"),
        F.least(
            F.floor(F.col("value") / 50.0).cast("long"), F.lit(9).cast("long")
        ).alias("bucket"),
    )
    bounds = ev.agg((F.min("ep") + F.max("ep")).alias("mm"))
    b = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("ep") * 2 < F.col("mm"), 0).otherwise(1).alias("side"),
        "bucket",
    )
    # lazy checkpoint (r15 optimization): c feeds the per-type totals
    # AND the final TVD join — without truncation the events scan +
    # histogram shuffle ran twice. c is <= |types| x 10 rows.
    c = b.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("cnt_b"),
    ).localCheckpoint(eager=False)
    t = c.groupBy("event_type").agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    return (
        c.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            # One-sided type (all events in one half) = maximal drift:
            # pin tvd to 1.0 rather than divide by zero, which is an
            # engine-parity trap (Spark NULL vs DuckDB IEEE inf).
            F.when(
                (F.first("n_a") == 0) | (F.first("n_b") == 0), F.lit(1.0)
            )
            .otherwise(
                F.sum(
                    F.abs(
                        F.col("cnt_a") * F.col("n_b")
                        - F.col("cnt_b") * F.col("n_a")
                    )
                ).cast("double")
                / (F.lit(2.0) * F.first("n_a") * F.first("n_b"))
            )
            .alias("tvd"),
        )
    )


@register(
    "q_corr_matrix_exact",
    oracle="""
    WITH s AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice) AS BIGINT) AS p,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS t
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
             CAST(SUM(d) AS BIGINT) AS sd, CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(q * q) AS BIGINT) AS sqq,
             CAST(SUM(p * p) AS BIGINT) AS spp,
             CAST(SUM(d * d) AS BIGINT) AS sdd,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(q * p) AS BIGINT) AS sqp,
             CAST(SUM(q * d) AS BIGINT) AS sqd,
             CAST(SUM(q * t) AS BIGINT) AS sqt,
             CAST(SUM(p * d) AS BIGINT) AS spd,
             CAST(SUM(p * t) AS BIGINT) AS spt,
             CAST(SUM(d * t) AS BIGINT) AS sdt
      FROM s
    )
    SELECT 'quantity' AS col_x, 'extendedprice' AS col_y, n AS n_rows,
           ROUND((CAST(n AS DOUBLE) * sqp - CAST(sq AS DOUBLE) * sp)
                 / (SQRT(CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq)
                    * SQRT(CAST(n AS DOUBLE) * spp
                           - CAST(sp AS DOUBLE) * sp)), 6) + 0.0
             AS corr_xy
    FROM m
    UNION ALL
    SELECT 'quantity', 'discount', n,
           ROUND((CAST(n AS DOUBLE) * sqd - CAST(sq AS DOUBLE) * sd)
                 / (SQRT(CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq)
                    * SQRT(CAST(n AS DOUBLE) * sdd
                           - CAST(sd AS DOUBLE) * sd)), 6) + 0.0
    FROM m
    UNION ALL
    SELECT 'quantity', 'tax', n,
           ROUND((CAST(n AS DOUBLE) * sqt - CAST(sq AS DOUBLE) * st)
                 / (SQRT(CAST(n AS DOUBLE) * sqq - CAST(sq AS DOUBLE) * sq)
                    * SQRT(CAST(n AS DOUBLE) * stt
                           - CAST(st AS DOUBLE) * st)), 6) + 0.0
    FROM m
    UNION ALL
    SELECT 'extendedprice', 'discount', n,
           ROUND((CAST(n AS DOUBLE) * spd - CAST(sp AS DOUBLE) * sd)
                 / (SQRT(CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
                    * SQRT(CAST(n AS DOUBLE) * sdd
                           - CAST(sd AS DOUBLE) * sd)), 6) + 0.0
    FROM m
    UNION ALL
    SELECT 'extendedprice', 'tax', n,
           ROUND((CAST(n AS DOUBLE) * spt - CAST(sp AS DOUBLE) * st)
                 / (SQRT(CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp)
                    * SQRT(CAST(n AS DOUBLE) * stt
                           - CAST(st AS DOUBLE) * st)), 6) + 0.0
    FROM m
    UNION ALL
    SELECT 'discount', 'tax', n,
           ROUND((CAST(n AS DOUBLE) * sdt - CAST(sd AS DOUBLE) * st)
                 / (SQRT(CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)
                    * SQRT(CAST(n AS DOUBLE) * stt
                           - CAST(st AS DOUBLE) * st)), 6) + 0.0
    FROM m
    """,
    tags=("analytics", "statistics", "correlation"),
)
def q_corr_matrix_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's four
    numeric measures, computed from EXACT integer moment sums (the
    feature-selection / collinearity screen a modeling pipeline runs
    before training). The built-in corr() is deliberately avoided:
    its streaming-covariance implementations are engine- and
    order-dependent, while integer-scaled Σx, Σx², Σxy are exact and
    order-insensitive, and the closed-form combination is the same
    IEEE expression on both engines. The n·Σxy − ΣxΣy step is an
    FMA candidate (engines may differ in the last ulp — the
    functions/exact.py exact_std precedent), so corr is rounded to
    6dp with a +0.0 signed-zero normalization on both sides.

    Scale: ONE full scan and one partial+final agg producing a single
    15-sum row; the 6 output rows explode from that row without
    re-scanning. Overflow bounds: price-dollars² ≈ 1e10 per row caps
    the int64 sums near ~1e8 rows — past that, scale prices to 1e1
    or lift the squared sums to DECIMAL(38,0) (decimal_sum in
    functions/exact.py); quantity/discount/tax sums hold to 1e14
    rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round("l_extendedprice").cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum("t").alias("st"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("q") * F.col("t")).alias("sqt"),
        F.sum(F.col("p") * F.col("d")).alias("spd"),
        F.sum(F.col("p") * F.col("t")).alias("spt"),
        F.sum(F.col("d") * F.col("t")).alias("sdt"),
    )

    def corr(sx: str, sy: str, sxy: str, sxx: str, syy: str):
        n = F.col("n").cast("double")
        num = n * F.col(sxy) - F.col(sx).cast("double") * F.col(sy)
        den = F.sqrt(
            n * F.col(sxx) - F.col(sx).cast("double") * F.col(sx)
        ) * F.sqrt(n * F.col(syy) - F.col(sy).cast("double") * F.col(sy))
        return F.round(num / den, 6) + 0.0

    pairs = [
        ("quantity", "extendedprice", "sq", "sp", "sqp", "sqq", "spp"),
        ("quantity", "discount", "sq", "sd", "sqd", "sqq", "sdd"),
        ("quantity", "tax", "sq", "st", "sqt", "sqq", "stt"),
        ("extendedprice", "discount", "sp", "sd", "spd", "spp", "sdd"),
        ("extendedprice", "tax", "sp", "st", "spt", "spp", "stt"),
        ("discount", "tax", "sd", "st", "sdt", "sdd", "stt"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                F.col("n").alias("n_rows"),
                corr(sx, sy, sxy, sxx, syy).alias("corr_xy"),
            )
            for cx, cy, sx, sy, sxy, sxx, syy in pairs
        ]
    )
    return m.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "q_market_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    nb AS (
      SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM baskets
    ),
    items AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY 1
    ),
    pairs AS (
      SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM baskets a JOIN baskets b
        ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
    ),
    top_pairs AS MATERIALIZED (
      -- MATERIALIZED: without a concrete 20-row cardinality DuckDB's
      -- optimizer misestimates the pair side at 1 row and reorders
      -- the item joins into an items x items cross product (~4e10
      -- rows at sf1).
      SELECT p1, p2, n_pair FROM pairs
      ORDER BY n_pair DESC, p1, p2
      LIMIT 20
    )
    SELECT p.p1, p.p2, p.n_pair,
           CAST(p.n_pair AS DOUBLE) / nb.n_orders AS support,
           CAST(p.n_pair AS DOUBLE) / ia.n_item AS confidence,
           CAST(p.n_pair AS DOUBLE) * nb.n_orders
             / (CAST(ia.n_item AS DOUBLE) * ib.n_item) AS lift
    FROM top_pairs p
    JOIN items ia ON ia.pk = p.p1
    JOIN items ib ON ib.pk = p.p2
    CROSS JOIN nb
    ORDER BY p.n_pair DESC, p.p1, p.p2
    """,
    tags=("analytics", "association", "basket"),
)
def q_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-ordered parts: the
    top-20 part pairs by co-occurrence, with support, confidence
    (P(p2|p1)) and lift — the classic recommendation/affinity screen.

    Determinism: all counts integer; the three ratios are
    mult-then-divide IEEE chains (no additive step, no FMA hazard);
    the top-20 cut is totally ordered by (n_pair DESC, p1, p2).

    Scale: NO self-join — a basket self-join keyed on the order forces
    a second full shuffle of the fact (and at sf1 AQE mis-chose a
    6M-row broadcast build for it). Instead one groupBy(order)
    collect_set materializes each basket as an array (≤ 7 parts in
    TPC-H shape — width is the per-order line cap, never |parts|) and
    pairs are generated ARRAY-LOCALLY by a double explode + p1 < p2,
    so candidate volume is Σ b·(b−1)/2, linear in orders, with zero
    extra shuffles. The top-20 cut happens BEFORE the item-stats
    joins — a TakeOrdered (per-partition heap + driver merge) leaves
    20 rows, which then BROADCAST against the per-item counts, so the
    item table is never broadcast and never re-shuffled (the
    join-then-limit order also cross-product-bombs DuckDB's
    optimizer, which misestimates the pair cardinality at 1 and
    reorders items × items)."""
    # localCheckpoint (r15 optimization): baskets is one fact shuffle
    # but feeds the order count, the per-item counts (whose table is
    # aliased into BOTH final joins) and the pair generation —
    # without truncation the lineitem scan + basket groupBy ran four
    # times in the one plan.
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("pks"))
        .localCheckpoint(eager=False)
    )
    nb = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    items = (
        baskets.select(F.explode("pks").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .localCheckpoint(eager=False)  # |parts| rows; joined twice
    )
    top_pairs = (
        baskets.select(F.explode("pks").alias("p1"), "pks")
        .select("p1", F.explode("pks").alias("p2"))
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .orderBy(F.desc("n_pair"), "p1", "p2")
        .limit(20)
    )
    return (
        F.broadcast(top_pairs)
        .join(items.alias("ia"), F.col("ia.pk") == F.col("p1"))
        .join(items.alias("ib"), F.col("ib.pk") == F.col("p2"))
        .crossJoin(F.broadcast(nb))
        .select(
            "p1",
            "p2",
            "n_pair",
            (F.col("n_pair").cast("double") / F.col("n_orders")).alias(
                "support"
            ),
            (F.col("n_pair").cast("double") / F.col("ia.n_item")).alias(
                "confidence"
            ),
            (
                F.col("n_pair").cast("double")
                * F.col("n_orders")
                / (F.col("ia.n_item").cast("double") * F.col("ib.n_item"))
            ).alias("lift"),
        )
        .orderBy(F.desc("n_pair"), "p1", "p2")
        .limit(20)
    )


@register(
    "q_benford_deviation",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM digits)
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n_total) AS obs_p,
           CAST(CASE digit
             WHEN 1 THEN 0.3010299956639812
             WHEN 2 THEN 0.17609125905568124
             WHEN 3 THEN 0.12493873660829992
             WHEN 4 THEN 0.09691001300805642
             WHEN 5 THEN 0.07918124604762482
             WHEN 6 THEN 0.06694678963061322
             WHEN 7 THEN 0.05799194697768673
             WHEN 8 THEN 0.05115252244738129
             ELSE 0.04575749056067514
           END AS DOUBLE) AS benford_p,
           ABS(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n_total)
               - CAST(CASE digit
                   WHEN 1 THEN 0.3010299956639812
                   WHEN 2 THEN 0.17609125905568124
                   WHEN 3 THEN 0.12493873660829992
                   WHEN 4 THEN 0.09691001300805642
                   WHEN 5 THEN 0.07918124604762482
                   WHEN 6 THEN 0.06694678963061322
                   WHEN 7 THEN 0.05799194697768673
                   WHEN 8 THEN 0.05115252244738129
                   ELSE 0.04575749056067514
                 END AS DOUBLE)) AS abs_dev
    FROM digits CROSS JOIN tot
    GROUP BY 1
    """,
    tags=("analytics", "data-quality", "benford"),
)
def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    forensic data-quality check for fabricated or truncated numeric
    feeds: per leading digit, the observed share vs the Benford
    expectation log10(1+1/d), and the absolute deviation.

    Determinism: the digit comes from the decimal rendering of the
    exact cent-long (no float formatting); the expected shares are
    literal double constants (both engines parse the same decimal
    text to the same double — computing log10 at runtime would tie
    the result to each engine's libm); obs_p is one division and
    abs_dev one subtract+ABS — no FMA-fusable shape, and ABS
    normalizes any signed zero.

    Scale: single scan, partial+final count agg to ≤ 9 rows, one
    broadcast total. Nothing else moves."""
    benford = F.when(F.col("digit") == 1, 0.3010299956639812)
    for d, p in (
        (2, 0.17609125905568124),
        (3, 0.12493873660829992),
        (4, 0.09691001300805642),
        (5, 0.07918124604762482),
        (6, 0.06694678963061322),
        (7, 0.05799194697768673),
        (8, 0.05115252244738129),
    ):
        benford = benford.when(F.col("digit") == d, p)
    benford = benford.otherwise(0.04575749056067514)

    digits = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    tot = digits.agg(F.count(F.lit(1)).alias("n_total"))
    # Aggregate FIRST, then join the 1-row total onto the ≤9-row
    # result — joining before the groupBy would push every fact row
    # through the broadcast join for nothing.
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .crossJoin(F.broadcast(tot))
        .withColumn("obs_p", F.col("n_obs").cast("double") / F.col("n_total"))
        .select(
            "digit",
            "n_obs",
            "obs_p",
            benford.alias("benford_p"),
            F.abs(F.col("obs_p") - benford).alias("abs_dev"),
        )
    )


@register(
    "q_interval_islands",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             DATEDIFF('second', TIMESTAMP '2024-01-01', ts) AS s,
             DATEDIFF('second', TIMESTAMP '2024-01-01', ts)
               + 60 + (event_id % 600) AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max_e
      FROM iv
    ),
    flagged AS (
      SELECT user_id, event_id, s, e, prev_max_e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                  THEN 1 ELSE 0 END AS is_new
      FROM marked
    ),
    islands AS (
      SELECT user_id, s, e, prev_max_e, is_new,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    ),
    per_island AS (
      SELECT user_id, island_id,
             MIN(s) AS isl_s, MAX(e) AS isl_e,
             CAST(COUNT(*) AS BIGINT) AS n_ev,
             MAX(CASE WHEN is_new = 1 AND prev_max_e IS NOT NULL
                      THEN s - prev_max_e END) AS lead_gap
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(SUM(isl_e - isl_s) AS BIGINT) AS covered_s,
           MAX(isl_e - isl_s) AS max_island_s,
           COALESCE(MAX(lead_gap), 0) AS max_gap_s
    FROM per_island
    GROUP BY 1
    """,
    tags=("analytics", "timeseries", "islands"),
)
def q_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge: each event opens an interval
    [start, start + dur) of VARIABLE length (60 + event_id % 600
    seconds — deterministic, non-monotone ends), per user overlapping
    or touching intervals coalesce into islands, and the per-user
    report gives island count, covered seconds, widest island, and
    widest gap. This is the classic coverage/uptime operator (sensor
    online-time, ad-exposure unions, license-seat concurrency) that
    sessionization does NOT express: with variable durations a later
    interval can be swallowed by an earlier long one, so the island
    break is against the RUNNING MAX of interval ends, not the
    previous row's end (lag-vs-running-max is exactly the bug a naive
    port introduces).

    Determinism: all arithmetic is integer seconds from a fixed
    TIMESTAMP_NTZ anchor (no timezone/epoch dependence), window order
    totally tiebroken by (start, event_id).

    Scale: one shuffle on user_id; both windows and the island
    groupBy reuse that partitioning (no extra exchange). The running
    max is a MONOID (like sessionize's gap rule), so the hot-user
    fix from q_sessionize_skew_safe — per-day blocks + metadata-sized
    boundary stitch carrying each block's running max end — applies
    unchanged if one user owns the stream."""
    anchor = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(f"timestampdiff(SECOND, {anchor}, ts)").alias("s"),
        (
            F.expr(f"timestampdiff(SECOND, {anchor}, ts)")
            + F.lit(60)
            + F.col("event_id") % 600
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    marked = iv.withColumn(
        "prev_max_e",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("isl_s"),
        F.max("e").alias("isl_e"),
        F.count(F.lit(1)).alias("n_ev"),
        F.max(
            F.when(
                (F.col("is_new") == 1) & F.col("prev_max_e").isNotNull(),
                F.col("s") - F.col("prev_max_e"),
            )
        ).alias("lead_gap"),
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_ev").alias("n_events"),
        F.sum(F.col("isl_e") - F.col("isl_s")).alias("covered_s"),
        F.max(F.col("isl_e") - F.col("isl_s")).alias("max_island_s"),
        F.coalesce(F.max("lead_gap"), F.lit(0)).alias("max_gap_s"),
    )


@register(
    "q_k_anonymity_audit",
    oracle="""
    WITH grouped AS (
      SELECT c_nationkey AS nationkey,
             c_mktsegment AS mktsegment,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS acct_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           mktsegment, acct_band, n,
           n < 5 AS at_risk
    FROM grouped
    """,
    tags=("governance", "privacy", "k-anonymity"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers
    (nationkey, market segment, account-balance band): every QI
    equivalence class with its population and an at_risk flag for
    classes below k = 5 — the groups where a released row is
    re-identifiable and a masking/suppression pass (q_masked_customers,
    q_pii_redact) must coarsen or drop before publication. The audit
    is the measurement half of the governance loop the reference's
    warehouse lacks entirely.

    Determinism: the band is FLOOR of one IEEE division of a
    2-decimal double by an exact power-of-two-scaled constant —
    correctly rounded identically in both engines; counts and the
    k-threshold flag are integer/boolean.

    Scale: one scan, one partial+final count aggregate; output is
    bounded by QI-space cardinality (nations x segments x ~7 bands),
    not row count. At 100 TB the same plan holds — the audit never
    materializes per-row data, and generalization search (coarsening
    bands until all classes pass k) just re-runs the aggregate on the
    rolled-up output, GROUPING-SETS style, not on the fact."""
    c = load_table(spark, sf_dir, "customer")
    grouped = (
        c.select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.floor(F.col("c_acctbal") / 2000).alias("acct_band"),
        )
        .groupBy("nationkey", "mktsegment", "acct_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return grouped.select(
        "nationkey",
        "mktsegment",
        "acct_band",
        "n",
        (F.col("n") < 5).alias("at_risk"),
    )


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH pq AS (
      SELECT p_partkey, p_name FROM part WHERE p_size = 15
    ),
    eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    ),
    costs AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN pq ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT partkey, suppkey, unit_cost,
             MIN(unit_cost) OVER (PARTITION BY partkey) AS best_cost
      FROM costs
    )
    SELECT r.partkey, p.p_name, s.s_name, s.n_name, s.s_acctbal,
           r.unit_cost
    FROM ranked r
    JOIN eu_supp s ON s.s_suppkey = r.suppkey
    JOIN pq p ON p.p_partkey = r.partkey
    WHERE r.unit_cost = r.best_cost
    """,
    tags=("tpch", "subquery", "argmin"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape groupwise ARGMIN, decorrelated: for every
    size-15 part, the European supplier(s) achieving the minimum
    observed unit cost (min l_extendedprice / l_quantity over that
    part-supplier's lines — this schema has no partsupp, so lineitem
    is the cost relation). The reference's pandas idiom for this is
    groupby().min() + merge-back; the correlated-SQL idiom is
    `WHERE cost = (SELECT MIN ... WHERE ps_partkey = p_partkey)` —
    both decorrelate to the same single-pass window.

    Determinism: unit_cost is one IEEE division, identical in both
    engines; the min-equality filter keeps ALL tied suppliers (no
    arbitrary argmin pick), so ties cannot diverge.

    Scale: the size-15 part dim is broadcast INTO the lineitem scan
    first, pruning ~98% of the fact before any shuffle. Two
    exchanges, by design: the (partkey, suppkey) aggregate shuffles
    map-combined PARTIALS of the pruned fact, and the per-part MIN
    window then re-shuffles only the aggregated pairs — output-sized,
    not fact-sized (forcing both onto one partkey shuffle would trade
    away the map-side combine, strictly worse). The
    supplier→nation→region chain broadcasts. No join-back: the
    window + filter replaces the self-join a naive decorrelation
    emits."""
    pq = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == 15)
        .select(F.col("p_partkey").alias("partkey"), "p_name")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    costs = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(pq), F.col("l_partkey") == F.col("partkey"))
        .groupBy("partkey", F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    ranked = costs.withColumn(
        "best_cost", F.min("unit_cost").over(Window.partitionBy("partkey"))
    )
    return (
        ranked.where(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(eu_supp), F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(pq), "partkey")
        .select(
            "partkey", "p_name", "s_name", "n_name", "s_acctbal", "unit_cost"
        )
    )


@register(
    "q_dau_wau_stickiness",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(DATE_TRUNC('week', ts) AS DATE) AS week,
             user_id
      FROM events
    ),
    dau AS (
      SELECT day, ANY_VALUE(week) AS week,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY 1
    ),
    wau AS (
      SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM d GROUP BY 1
    )
    SELECT dau.day, dau.week, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau USING (week)
    """,
    tags=("analytics", "engagement", "stickiness"),
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness — per day, distinct active users over the
    Monday-truncated week's distinct actives: the standard engagement
    ratio (how much of the weekly audience shows up daily). Weeks are
    DATE_TRUNC('week') in both engines (Monday start) rather than
    week-of-year numbering, whose ISO year-boundary rules are an
    engine-parity trap.

    Determinism: two exact distinct counts (integers) and one IEEE
    division; a day's week is functionally determined by the day, so
    ANY_VALUE/first is deterministic.

    Scale: two partial+final distinct aggregates over (day, user) and
    (week, user) — at 100 TB swap COUNT(DISTINCT) for the HLL-partial
    rollup (q_hll_mv_distinct_users) per the documented no-Expand
    mode; the ≤53-row weekly side broadcasts into the daily result."""
    d = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.to_date(F.date_trunc("week", "ts")).alias("week"),
        "user_id",
    )
    dau = d.groupBy("day").agg(
        F.first("week").alias("week"),
        F.countDistinct("user_id").alias("dau"),
    )
    wau = d.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(F.broadcast(wau), "week").select(
        "day",
        "week",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


@register(
    "q_cusum_changepoint",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, v,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS t,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ),
    walk(event_type, rn, day, n, s_up, s_dn) AS (
      SELECT event_type, rn, day, n,
             GREATEST(CAST(0 AS BIGINT), n * v - t),
             GREATEST(CAST(0 AS BIGINT), t - n * v)
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn, s.day, s.n,
             GREATEST(CAST(0 AS BIGINT), w.s_up + s.n * s.v - s.t),
             GREATEST(CAST(0 AS BIGINT), w.s_dn + s.t - s.n * s.v)
      FROM walk w
      JOIN seq s ON s.event_type = w.event_type AND s.rn = w.rn + 1
    ),
    peaks AS (
      SELECT event_type, ANY_VALUE(n) AS n_days,
             CAST(MAX(s_up) AS BIGINT) AS max_up,
             CAST(MAX(s_dn) AS BIGINT) AS max_dn
      FROM walk GROUP BY 1
    )
    SELECT p.event_type, p.n_days, p.max_up,
           (SELECT MIN(w.day) FROM walk w
            WHERE w.event_type = p.event_type AND w.s_up = p.max_up) AS day_up,
           p.max_dn,
           (SELECT MIN(w.day) FROM walk w
            WHERE w.event_type = p.event_type AND w.s_dn = p.max_dn) AS day_dn,
           CAST(p.max_up AS DOUBLE) / (p.n_days * 100.0) AS max_up_norm,
           CAST(p.max_dn AS DOUBLE) / (p.n_days * 100.0) AS max_dn_norm
    FROM peaks p
    """,
    tags=("analytics", "changepoint", "cusum", "streaming-walk"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point screen per event stream: the
    running sums S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − μ)) and the mirrored S⁻
    over daily totals, reporting each side's peak and the FIRST day
    it is reached — the classic sequential level-shift detector
    (EWMA smooths; CUSUM localizes WHERE the mean moved).

    All arithmetic is integer-exact: daily sums in centi-units, and
    the mean is never divided out — the recurrence runs on
    n·xₜ − Σx (deviation scaled by the day count), so both engines
    walk identical int64 states; the only doubles are the two final
    normalizations. max(0,·) makes this a TRUE recurrence (no
    closed form, unlike the α=1/2 EWMA), hence the ordered
    streaming-walk / recursive-CTE pair.

    Scale: the walk consumes the AGGREGATED (type, day) domain —
    ≤31 rows per key regardless of fact volume — via the same
    repartition + sortWithinPartitions + mapInPandas O(1)-state pass
    as capped_session_summaries (never a grouped-map materialization,
    never the fact stream)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("cv").alias("v"))
    tw = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        ((F.count(F.lit(1)).over(tw) * F.col("v")) - F.sum("v").over(tw)).alias(
            "dev"
        ),
        F.count(F.lit(1)).over(tw).alias("n"),
    )

    def walk(batches):
        import pandas as pd

        cols = [
            "event_type", "n_days", "max_up", "day_up",
            "max_dn", "day_dn",
        ]
        key = None
        n = s_up = s_dn = max_up = max_dn = 0
        day_up = day_dn = ""

        def summary():
            return (key, n, max_up, day_up, max_dn, day_dn)

        for pdf in batches:
            closed = []
            for k, d, dev, nn in zip(
                pdf["event_type"], pdf["day"], pdf["dev"], pdf["n"]
            ):
                dev = int(dev)
                if k != key:
                    if key is not None:
                        closed.append(summary())
                    key, n = k, int(nn)
                    s_up = max_up = max(0, dev)
                    s_dn = max_dn = max(0, -dev)
                    day_up = day_dn = d
                    continue
                s_up = max(0, s_up + dev)
                s_dn = max(0, s_dn - dev)
                if s_up > max_up:
                    max_up, day_up = s_up, d
                if s_dn > max_dn:
                    max_dn, day_dn = s_dn, d
            if closed:
                yield pd.DataFrame(closed, columns=cols)
        if key is not None:
            yield pd.DataFrame([summary()], columns=cols)

    peaks = (
        seq.repartition("event_type")
        .sortWithinPartitions("event_type", "day")
        .mapInPandas(
            walk,
            "event_type STRING, n_days BIGINT, max_up BIGINT, "
            "day_up STRING, max_dn BIGINT, day_dn STRING",
        )
    )
    return peaks.select(
        "event_type",
        "n_days",
        "max_up",
        F.to_date("day_up").alias("day_up"),
        "max_dn",
        F.to_date("day_dn").alias("day_dn"),
        (F.col("max_up").cast("double") / (F.col("n_days") * 100.0)).alias(
            "max_up_norm"
        ),
        (F.col("max_dn").cast("double") / (F.col("n_days") * 100.0)).alias(
            "max_dn_norm"
        ),
    )


@register(
    "q_survival_km",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT CAST(MAX(ts) AS DATE) AS wd FROM events
    ),
    users AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0,
             CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                  AS DATE) AS dp
      FROM events GROUP BY 1
    ),
    durations AS (
      SELECT CAST(DATEDIFF('day', u.d0, COALESCE(u.dp, w.wd)) AS BIGINT)
               AS duration_days,
             CASE WHEN u.dp IS NULL THEN 0 ELSE 1 END AS observed
      FROM users u, w
    ),
    dd AS (
      SELECT duration_days, COUNT(*) AS n_users,
             CAST(SUM(observed) AS BIGINT) AS n_events
      FROM durations GROUP BY 1
    ),
    seq AS (
      SELECT duration_days, n_events,
             CAST(SUM(n_users) OVER (
               ORDER BY duration_days DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_risk
      FROM dd
    ),
    ev AS (
      SELECT duration_days, n_events, n_risk,
             row_number() OVER (ORDER BY duration_days) AS rn
      FROM seq WHERE n_events > 0
    ),
    walk(rn, duration_days, n_events, n_risk, s) AS (
      SELECT rn, duration_days, n_events, n_risk,
             (1000000 * (n_risk - n_events)) // n_risk
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.rn, e.duration_days, e.n_events, e.n_risk,
             (k.s * (e.n_risk - e.n_events)) // e.n_risk
      FROM walk k JOIN ev e ON e.rn = k.rn + 1
    )
    SELECT duration_days, n_risk, n_events,
           CAST((n_events * 1000000) // n_risk AS BIGINT) AS hazard_ppm,
           CAST(s AS BIGINT) AS survival_ppm
    FROM walk ORDER BY duration_days
    """,
    tags=("analytics", "survival", "streaming-walk"),
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit table for time-to-first-purchase:
    per user, days from first event to first 'purchase' event;
    users who never purchase are right-censored at the corpus
    watermark (max event date — reproducible, not wall-clock). For
    each event duration t: n_risk = users still under observation
    (duration ≥ t, censored users count — censoring at t happens
    AFTER events at t, the standard KM convention), n_events =
    first purchases at exactly t.

    All arithmetic is integer-exact: the hazard is per-million
    integer division, and the survival curve Ŝ(t) = Π (nᵢ−dᵢ)/nᵢ —
    a true sequential product with no closed form — runs as the
    scaled-integer recurrence sᵢ = ⌊sᵢ₋₁·(nᵢ−dᵢ)/nᵢ⌋ starting from
    1e6, so both engines walk identical int64 states (overflow
    headroom: s ≤ 1e6, safe to n_risk ≈ 9e12 users).

    Scale: per-user min/max is one map-combined user_id aggregation
    of the fact; everything after runs on the AGGREGATED duration
    domain (≤ observation-span-days rows regardless of fact volume)
    — the global n_risk window and the mapInPandas walk are
    single-partition by construction on that tiny domain, the same
    ordered-walk idiom as q_cusum_changepoint."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    )
    w = ev.agg(F.max("day").alias("wd"))
    users = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("day"))
        ).alias("dp"),
    )
    durations = users.crossJoin(F.broadcast(w)).select(
        F.datediff(F.coalesce("dp", "wd"), F.col("d0"))
        .cast("long")
        .alias("duration_days"),
        F.col("dp").isNotNull().cast("long").alias("observed"),
    )
    dd = durations.groupBy("duration_days").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("observed").alias("n_events"),
    )
    # Aggregated duration domain (≤ span days) — a global window here
    # is a deliberate single-partition sort of a tiny relation.
    risk_w = (
        Window.orderBy(F.col("duration_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = dd.select(
        "duration_days",
        "n_events",
        F.sum("n_users").over(risk_w).alias("n_risk"),
    ).where(F.col("n_events") > 0)

    def walk(batches):
        import pandas as pd

        cols = ["duration_days", "n_risk", "n_events", "survival_ppm"]
        s = 1_000_000
        rows = []
        for pdf in batches:
            for t, n, d in zip(
                pdf["duration_days"], pdf["n_risk"], pdf["n_events"]
            ):
                n, d = int(n), int(d)
                s = (s * (n - d)) // n
                rows.append((int(t), n, d, s))
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    km = (
        seq.withColumn("grp", F.lit(0))
        .repartition("grp")
        .sortWithinPartitions("grp", "duration_days")
        .mapInPandas(
            walk,
            "duration_days BIGINT, n_risk BIGINT, n_events BIGINT, "
            "survival_ppm BIGINT",
        )
    )
    return km.select(
        "duration_days",
        "n_risk",
        "n_events",
        F.expr("CAST((n_events * 1000000) DIV n_risk AS BIGINT)").alias(
            "hazard_ppm"
        ),
        "survival_ppm",
    ).orderBy("duration_days")


@register(
    "q_seasonal_dow_decompose",
    oracle="""
    WITH spine AS (
      SELECT CAST(unnest(generate_series(
               (SELECT CAST(MIN(ts) AS DATE) FROM events),
               (SELECT CAST(MAX(ts) AS DATE) FROM events),
               INTERVAL 1 DAY)) AS DATE) AS day
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT s.day, COALESCE(d.v, CAST(0 AS BIGINT)) AS v
      FROM spine s LEFT JOIN daily d ON d.day = s.day
    ),
    win AS (
      SELECT day, v,
             CAST(SUM(v) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sum7,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
      FROM grid
    ),
    det AS (
      SELECT (DATEDIFF('day', DATE '2023-12-25', day)) % 7 AS dow,
             7 * v - sum7 AS det7
      FROM win WHERE cnt7 = 7
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           COUNT(*) AS n_days,
           CAST(SUM(det7) AS BIGINT) AS sum_detrended_c7,
           CAST(SUM(det7) AS DOUBLE) / (700.0 * COUNT(*)) AS seasonal_value
    FROM det GROUP BY 1 ORDER BY 1
    """,
    tags=("analytics", "timeseries", "seasonal"),
)
def q_seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event-value
    series by day-of-week: trend = centered 7-day moving average
    over a COMPLETE day spine (missing days count as 0, so the
    window is calendar-correct), seasonal index = mean of the
    detrended series per weekday (0 = Monday via an epoch-anchored
    integer datediff — engine DOW numbering conventions differ, an
    integer modulus does not).

    Integer-exact core: daily totals in centi-units; the detrended
    value is kept as 7·v − Σ₇(v) (int64, in 7×centi units) so the
    moving average is never a lossy division; the only double is the
    final seasonal index — one IEEE division of two exact integers.
    Interior days only (full 7-day windows), so edge effects are
    excluded rather than averaged in.

    Scale: the fact collapses to the daily domain in one
    map-combined aggregation; the spine join, the 7-row window, and
    the 7-group rollup all run on ≤ span-days rows — the global
    window is a deliberate single-partition sort of that tiny
    domain (same posture as q_cusum_changepoint). At 100 TB the
    daily domain is still ≤ a few thousand rows."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = ev.groupBy("day").agg(F.sum("cv").alias("v"))
    grid = spine.join(daily, "day", "left").select(
        "day", F.coalesce("v", F.lit(0).cast("long")).alias("v")
    )
    # Aggregated daily domain — global window on ≤ span-days rows.
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    det = (
        grid.select(
            "day",
            "v",
            F.sum("v").over(w7).alias("sum7"),
            F.count(F.lit(1)).over(w7).alias("cnt7"),
        )
        .where(F.col("cnt7") == 7)
        .select(
            (
                F.datediff(F.col("day"), F.lit("2023-12-25").cast("date"))
                % 7
            )
            .cast("long")
            .alias("dow"),
            (F.lit(7) * F.col("v") - F.col("sum7")).alias("det7"),
        )
    )
    return (
        det.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("det7").alias("sum_detrended_c7"),
        )
        .select(
            "dow",
            "n_days",
            "sum_detrended_c7",
            (
                F.col("sum_detrended_c7").cast("double")
                / (F.lit(700.0) * F.col("n_days"))
            ).alias("seasonal_value"),
        )
        .orderBy("dow")
    )


@register(
    "q_ab_welch_ttest",
    oracle="""
    WITH assigned AS (
      SELECT event_type, user_id % 2 AS arm, value FROM events
    ),
    moments AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(SUM(CASE WHEN arm = 0
               THEN CAST(ROUND(value * 1000000) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS sx_a,
             CAST(SUM(CASE WHEN arm = 1
               THEN CAST(ROUND(value * 1000000) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS sx_b,
             CAST(SUM(CASE WHEN arm = 0
               THEN CAST(ROUND(value * value * 1000) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS sxx_a,
             CAST(SUM(CASE WHEN arm = 1
               THEN CAST(ROUND(value * value * 1000) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS sxx_b
      FROM assigned GROUP BY 1
    ),
    stats AS (
      SELECT event_type, n_a, n_b,
             (CAST(sx_a AS DOUBLE) / 1000000.0) / n_a AS mean_a,
             (CAST(sx_b AS DOUBLE) / 1000000.0) / n_b AS mean_b,
             ROUND((n_a * (CAST(sxx_a AS DOUBLE) / 1000.0)
                    - (CAST(sx_a AS DOUBLE) / 1000000.0)
                      * (CAST(sx_a AS DOUBLE) / 1000000.0))
                   / (CAST(n_a AS DOUBLE) * (n_a - 1.0)), 6) AS var_a,
             ROUND((n_b * (CAST(sxx_b AS DOUBLE) / 1000.0)
                    - (CAST(sx_b AS DOUBLE) / 1000000.0)
                      * (CAST(sx_b AS DOUBLE) / 1000000.0))
                   / (CAST(n_b AS DOUBLE) * (n_b - 1.0)), 6) AS var_b
      FROM moments
    )
    SELECT event_type, n_a, n_b, mean_a, mean_b,
           CASE WHEN n_a > 1 AND n_b > 1
                 AND (var_a / n_a + var_b / n_b) > 0.0
                THEN ROUND((mean_a - mean_b)
                           / SQRT(var_a / n_a + var_b / n_b), 4) + 0.0
                ELSE NULL END AS t_stat
    FROM stats ORDER BY event_type
    """,
    tags=("analytics", "abtest"),
)
def q_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout per event stream: users are assigned to
    arms by user_id parity (a deterministic stand-in for the hash
    bucketing an experimentation system would persist), and the
    per-type value means are compared with Welch's unequal-variance
    t statistic.

    Determinism: counts and both moment sums are scaled-long
    integers (values on the 1e-6 grid, squares on the 1e-3 grid —
    value ≤ ~560 so squared terms stay within int64 headroom to
    ~1e10 rows per arm; see functions/exact.py for the overflow
    policy). Means are exact-sum divisions; the variances take the
    n·Σx² − (Σx)² path, which is a fused-multiply-add candidate, so
    they are rounded to 6 dp on BOTH sides (the exact_std precedent)
    before feeding the t statistic; t is rounded to 4 dp and
    normalized with + 0.0 so a −0.0000x cell cannot diverge on
    signed zero (driver-hash rule).

    Scale: ONE pass over the fact — a single map-combined
    conditional aggregation per event_type; no joins, no second
    scan, output rows = |event types|."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        "value",
    )
    sv = F.round(F.col("value") * 1_000_000).cast("long")
    svv = F.round(F.col("value") * F.col("value") * 1_000).cast("long")
    zero = F.lit(0).cast("long")
    m = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, sv).otherwise(zero)).alias("sx_a"),
        F.sum(F.when(F.col("arm") == 1, sv).otherwise(zero)).alias("sx_b"),
        F.sum(F.when(F.col("arm") == 0, svv).otherwise(zero)).alias("sxx_a"),
        F.sum(F.when(F.col("arm") == 1, svv).otherwise(zero)).alias("sxx_b"),
    )
    mean_a = (F.col("sx_a").cast("double") / 1_000_000.0) / F.col("n_a")
    mean_b = (F.col("sx_b").cast("double") / 1_000_000.0) / F.col("n_b")
    var_a = F.round(
        (
            F.col("n_a") * (F.col("sxx_a").cast("double") / 1_000.0)
            - (F.col("sx_a").cast("double") / 1_000_000.0)
            * (F.col("sx_a").cast("double") / 1_000_000.0)
        )
        / (F.col("n_a").cast("double") * (F.col("n_a") - F.lit(1.0))),
        6,
    )
    var_b = F.round(
        (
            F.col("n_b") * (F.col("sxx_b").cast("double") / 1_000.0)
            - (F.col("sx_b").cast("double") / 1_000_000.0)
            * (F.col("sx_b").cast("double") / 1_000_000.0)
        )
        / (F.col("n_b").cast("double") * (F.col("n_b") - F.lit(1.0))),
        6,
    )
    stats = m.select(
        "event_type",
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    return stats.select(
        "event_type",
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        F.when(
            (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0.0),
            F.round(
                (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2), 4
            )
            + F.lit(0.0),
        ).alias("t_stat"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# The five remaining TPC-H subquery shapes, adapted to the fixture
# schema (no partsupp / commitdate columns): Q4 EXISTS-with-non-equi
# correlate, Q11 share-of-global HAVING, Q15 argmax-vs-scalar-subquery,
# Q16 anti-join + grouped COUNT(DISTINCT), Q20 nested fraction-of-group
# threshold. The reference's pandas analogues are all
# filter-groupby-merge chains (SURVEY §2.4); here each decorrelates to
# one declarative plan.
# ---------------------------------------------------------------------------


@register(
    "q_late_ship_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1 ORDER BY 1
    """,
    tags=("tpch", "subquery", "semi-join"),
)
def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a six-month window having at least
    one line shipped more than 60 days after the order date, counted
    per priority. The EXISTS correlate carries a NON-equi conjunct
    (l_shipdate > o_orderdate + 60d), so the decorrelation is a left
    semi-join on orderkey with a cross-table residual predicate —
    a strictly harder shape than Q4's commitdate-only original.

    Determinism: pure counts over exact date predicates.

    Scale: the order window pushes to the orders scan. The lineitem
    side is prefiltered with the IMPLIED bound l_shipdate >
    '1996-03-01' (min o_orderdate + 60d) — a cross-column constraint
    Catalyst cannot derive itself — so the semi-join shuffles only
    late-enough lines; the residual evaluates post-match, and the
    semi-join short-circuits per order."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .where(F.col("l_shipdate") > "1996-03-01")
    )
    late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (
            l["l_shipdate"]
            > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_important_parts",
    oracle="""
    WITH nat_supp AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
    ),
    pv AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM nat_supp)
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
             COUNT(*) AS n_parts
      FROM pv
    )
    SELECT partkey, value_cents,
           CAST(value_cents * 10000 // total_cents AS BIGINT) AS share_bps
    FROM pv, tot
    WHERE value_cents * n_parts > 3 * total_cents
    ORDER BY value_cents DESC, partkey
    """,
    tags=("tpch", "subquery", "share-of-total"),
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose revenue through
    NATION_7 suppliers exceeds 3× the MEAN per-part value — a grouped
    aggregate filtered against a GLOBAL scalar aggregate of itself
    (HAVING SUM(...) > fraction * (SELECT SUM ...)). Q11's published
    fraction is 0.0001/SF precisely because a FIXED share threshold
    vanishes as the part population grows; the mean-relative form
    keeps the selected tail scale-invariant (verified non-vacuous at
    sf0.01 and sf1 both).

    Determinism: revenue is the scaled-cents int64 sum; the share is
    integer basis points via floor division — no double accumulation
    anywhere.

    Scale: the nation's supplier list is dim-sized and broadcast as a
    semi-join INTO the lineitem scan, pruning the fact before its one
    partkey shuffle. The global total re-aggregates the already
    part-level rows (output-sized, not fact-sized) and broadcasts one
    row back; the filter + share compute stay partition-local. Same
    two-exchange economics as q_min_cost_supplier: fact shuffles once
    map-combined, everything after is output-sized."""
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    nat_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .select("s_suppkey")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    pv = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(nat_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    tot = pv.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(
            F.col("value_cents") * F.col("n_parts")
            > 3 * F.col("total_cents")
        )
        .select(
            "partkey",
            "value_cents",
            F.expr("CAST(value_cents * 10000 DIV total_cents AS BIGINT)")
            .alias("share_bps"),
        )
        .orderBy(F.col("value_cents").desc(), "partkey")
    )


@register(
    "q_top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.rev_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.rev_cents = (SELECT MAX(rev_cents) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "subquery", "argmax"),
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) achieving the
    GLOBAL maximum quarterly revenue — the view-plus-scalar-subquery
    original decorrelates to aggregate → global max → equality filter.
    Distinct from Q2's groupwise argmin: one max over ALL groups, and
    ties all survive (integer cents make the tie test exact).

    Determinism: scaled-cents int64 revenue; max-equality keeps every
    tied supplier.

    Scale: shipdate window pushes to the scan; one map-combined
    suppkey shuffle of the quarter's lines; the max is a one-row
    broadcast back over supplier-level rows; the supplier name join
    broadcasts the dim."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(cents).alias("rev_cents")
    )
    best = rev.agg(F.max("rev_cents").alias("best_cents"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(best))
        .where(F.col("rev_cents") == F.col("best_cents"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "rev_cents")
        .orderBy("s_suppkey")
    )


@register(
    "q_part_supplier_variety",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_size IN (1, 5, 11, 15, 21, 25, 31, 35, 41, 45)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
        )
    )
    SELECT p_brand, p_type, p_size, COUNT(*) AS supplier_cnt
    FROM pairs GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "anti-join", "count-distinct"),
)
def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers ship each (brand, type, size) combination,
    excluding one brand, restricting to a size list, and anti-joining
    away blacklisted suppliers (negative account balance standing in
    for Q16's complaint predicate, which needs a comment column this
    schema lacks).

    Determinism: distinct-pair counts only.

    Scale: brand/size predicates push into the broadcast part dim and
    prune the fact pre-shuffle; the blacklist is dim-sized and
    broadcast as an anti-join. COUNT(DISTINCT supplier) materializes
    as distinct-pairs-then-count: ONE shuffle keyed on the full
    (brand, type, size, suppkey) tuple with map-side distinct
    partials, then a map-combined rollup — never an Expand."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 11, 15, 21, 25, 31, 35, 41, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "q_dominant_suppliers",
    oracle="""
    WITH sq AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    pt AS (
      SELECT partkey, CAST(SUM(qty) AS BIGINT) AS total_qty
      FROM sq GROUP BY 1
    ),
    dom AS (
      SELECT sq.suppkey, COUNT(*) AS n_parts_dominated,
             CAST(SUM(sq.qty) AS BIGINT) AS qty_dominated
      FROM sq JOIN pt ON pt.partkey = sq.partkey
      WHERE sq.qty * 2 > pt.total_qty
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, n_parts_dominated, qty_dominated
    FROM dom JOIN supplier ON s_suppkey = suppkey
    ORDER BY n_parts_dominated DESC, s_suppkey
    """,
    tags=("tpch", "subquery", "fraction-of-group"),
)
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who
    shipped MORE THAN HALF of a 'small%' part's 1997 volume, for any
    such part — the nested 0.5·SUM threshold subquery of the
    original, with lineitem standing in for partsupp availability.

    Determinism: quantities are integral doubles (fixture invariant,
    asserted by the ROUND-free BIGINT cast matching on both sides);
    all sums int64.

    Scale: the 'small%' part filter broadcasts into the scan and the
    shipdate window pushes down, so the (partkey, suppkey) aggregate
    shuffles only the filtered slice map-combined. The per-part total
    re-aggregates part-supplier rows (output-sized) and joins back on
    partkey — both sides already group-level, so the join is between
    two small relations; supplier resolves by broadcast."""
    pq = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    sq = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(pq), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    pt = sq.groupBy("partkey").agg(F.sum("qty").alias("total_qty"))
    dom = (
        sq.join(pt, "partkey")
        .where(F.col("qty") * 2 > F.col("total_qty"))
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts_dominated"),
            F.sum("qty").alias("qty_dominated"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        dom.join(F.broadcast(supp), F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "n_parts_dominated", "qty_dominated")
        .orderBy(F.col("n_parts_dominated").desc(), "s_suppkey")
    )
