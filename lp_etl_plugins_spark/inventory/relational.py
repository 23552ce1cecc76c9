"""Relational operator inventory (SURVEY §2.2–§2.5) over the star schema.

Each query exercises one operator family from the reference, re-expressed
as a declarative DataFrame plan (joins stay broadcast-able, aggregations
get map-side partials, filters/pruning push down to the parquet scan).

Reference parity notes cite `/root/reference` file:line per SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import load_table, wall_literal


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: pricing summary (aggregation family A1/A3; TPC-H Q1 shape)
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation with map-side partials; the flagship query.

    Aggregation semantics per SURVEY §2.4 (the reference's only aggregates
    are counts/first — this generalizes them to the standard kernel).
    Rounding-to-grid per inventory contract (see package docstring).
    """
    li = _t(spark, sf_dir, "lineitem")
    # tz-independent cutoff on a RAW column: the literal adapts to the
    # read type (tables.wall_literal), so the predicate stays pushable
    # to the parquet scan while a non-UTC session can no longer shift
    # the day boundary
    li = li.filter(
        F.col("l_shipdate") <= wall_literal(li, "l_shipdate", "2001-09-02 00:00:00")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 6) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# J1 — multi-way equi-join chain (BGP shape; TPC-H Q5 shape)
# --------------------------------------------------------------------------


def j1_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join chain semantics of SPARQL BGPs (FdpMeasure.java:34-48)
    generalized to the star schema: revenue per nation within one region.

    Dimension tables (region/nation) are tiny → explicit broadcast so the
    big fact join never shuffles the dimension side at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


J1_SQL = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# J2 — left outer join (OPTIONAL shape, FdpMeasure.java:49-56)
# --------------------------------------------------------------------------


def j2_left_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL-pattern semantics: every customer row survives; customers
    without orders get zero count and null last date."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("o_orderdate").alias("last_order"),
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.col("last_order"),
        )
    )


J2_SQL = """
SELECT
  c_custkey,
  c_mktsegment,
  coalesce(n_orders, 0) AS n_orders,
  last_order
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders, max(o_orderdate) AS last_order
  FROM orders GROUP BY o_custkey
) po ON c_custkey = po.o_custkey
"""


# --------------------------------------------------------------------------
# J3 — anti join (FILTER NOT EXISTS, MultiAttributeDimension.java:56)
# --------------------------------------------------------------------------


def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER NOT EXISTS semantics: customers that never placed an order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


J3_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# J4 — inline VALUES lookup join (MultiAttributeDimension.java:38-43)
# --------------------------------------------------------------------------

_SEGMENT_TIERS = [
    ("AUTOMOBILE", "consumer"),
    ("MACHINERY", "industrial"),
    ("BUILDING", "industrial"),
    ("FURNITURE", "consumer"),
    ("HOUSEHOLD", "consumer"),
]


def j4_values_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join against a constant inline table (SPARQL VALUES), broadcast —
    the lookup never shuffles the probe side."""
    cust = _t(spark, sf_dir, "customer")
    tiers = spark.createDataFrame(_SEGMENT_TIERS, "c_mktsegment string, tier string")
    return (
        cust.join(F.broadcast(tiers), "c_mktsegment", "left")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


J4_SQL = """
SELECT
  tier,
  count(*) AS n_customers,
  round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
LEFT JOIN (
  VALUES ('AUTOMOBILE', 'consumer'), ('MACHINERY', 'industrial'),
         ('BUILDING', 'industrial'), ('FURNITURE', 'consumer'),
         ('HOUSEHOLD', 'consumer')
) AS tiers(c_mktsegment, tier) USING (c_mktsegment)
GROUP BY tier
"""


# --------------------------------------------------------------------------
# J5 — property-path (2-hop) join (DcatAp11ToCkanBatch.java:259)
# --------------------------------------------------------------------------


def j5_two_hop_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop chained equi-join (publisher/name path shape):
    supplier → nation → region."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation_name"), F.col("r_name").alias("region_name"))
    )


J5_SQL = """
SELECT s_suppkey, s_name, n_name AS nation_name, r_name AS region_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


# --------------------------------------------------------------------------
# J6 — broadcast codelist lookup (DcatAp11ToCkanBatch.java:425-431)
# --------------------------------------------------------------------------


def j6_codelist_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-table label join: part is the 'codelist', lineitem the
    facts. No broadcast hint — ``part`` scales with sf (unlike a real
    bounded codelist), so a forced broadcast would OOM at 100×; AQE
    picks broadcast when the built side is actually small."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


J6_SQL = """
SELECT p_brand, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_lines
FROM lineitem
LEFT JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# J7 — diff/merge against existing state (DcatAp11ToCkanBatch.java:209-251)
# --------------------------------------------------------------------------


def j7_diff_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-with-fallback + coalesce, the CKAN resource diff/merge join
    shape: match lineitem rows ("incoming") to orders ("existing state"),
    classifying the match as primary (status F) or fallback, with
    unmatched incoming rows kept (they would be created fresh).

    One join on the shared key — the primary/fallback distinction is a
    conditional on the matched row, not a second big-side shuffle (the
    fallback key set is a superset of the primary's, so two sequential
    left joins would do the same work twice).
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    existing = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return (
        li.join(existing, li.l_orderkey == existing.o_orderkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("o_orderkey").isNull(), F.lit("unmatched"))
            .when(F.col("o_orderstatus") == "F", F.lit("primary"))
            .otherwise(F.lit("fallback"))
            .alias("match_kind"),
        )
        .groupBy("match_kind")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


J7_SQL = """
SELECT
  CASE WHEN o_orderkey IS NULL THEN 'unmatched'
       WHEN o_orderstatus = 'F' THEN 'primary'
       ELSE 'fallback' END AS match_kind,
  count(*) AS n_rows
FROM lineitem
LEFT JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# J8 — map-lookup with override precedence (DcatAp11ToCkanBatch.java:511-519)
# --------------------------------------------------------------------------


def j8_lookup_with_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast lookup + per-row override: nation name resolved through
    the lookup map unless the row carries an override (here: BUILDING
    segment customers get a fixed org), mirroring ckan_organizationID
    precedence."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    override = F.when(F.col("c_mktsegment") == "BUILDING", F.lit("OVERRIDE-ORG"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select("c_custkey", F.coalesce(override, F.col("n_name")).alias("org_name"))
        .groupBy("org_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


J8_SQL = """
SELECT
  coalesce(CASE WHEN c_mktsegment = 'BUILDING' THEN 'OVERRIDE-ORG' END, n_name) AS org_name,
  count(*) AS n_customers
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# A1 — grouped count distinct + join-back filter
# (MultiAttributeDimension.java:93-100)
# --------------------------------------------------------------------------


def a1_group_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group, joined back as a filter — the
    attribute-count subquery shape: order priorities that are used by
    more than 20 distinct customers."""
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(F.countDistinct("o_custkey").alias("n_cust"))
    return counts.filter(F.col("n_cust") > 20)


A1_SQL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
FROM orders
GROUP BY o_orderpriority
HAVING count(DISTINCT o_custkey) > 20
"""


# --------------------------------------------------------------------------
# A2 — DISTINCT projection (HierarchicalDimension.java:22)
# --------------------------------------------------------------------------


def a2_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_mktsegment", "n_name")
        .distinct()
    )


A2_SQL = """
SELECT DISTINCT c_mktsegment, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


# --------------------------------------------------------------------------
# A3 — scalar/first aggregate (QueryResults.singleResult,
# DcatAp11ToCkanBatch.java:627-641)
# --------------------------------------------------------------------------


def a3_scalar_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins scalar per key, made deterministic by taking the
    minimum (the reference's 'first' is query-order dependent; the
    engine's contract is min-by-key)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order_date"),
        F.min("o_orderkey").alias("first_order_key"),
    )


A3_SQL = """
SELECT o_custkey, min(o_orderdate) AS first_order_date, min(o_orderkey) AS first_order_key
FROM orders GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# A4 — list aggregate + string join (DcatAp11ToCkanBatch.java:253-256,396-402)
# --------------------------------------------------------------------------


def a4_collect_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect-list + concat (keyword/theme aggregation shape); sorted
    before joining so the result is deterministic under parallelism."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(" ", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


A4_SQL = """
SELECT
  r_name,
  string_agg(n_name, ' ' ORDER BY n_name) AS nations,
  count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def _revenue_grouping_sets(
    spark: SparkSession, sf_dir: str, grouping: str
) -> DataFrame:
    """Shared base of the a7/a8 grouping-set siblings: the 3-table
    revenue join with exact-cents sums, aggregated through ``rollup``
    or ``cube`` — one Expand + hash aggregate with map-side partials,
    one shuffle for every level. One copy of the cents discipline and
    the grouping_id encoding."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            cents.alias("cents"),
        )
    )
    grouped = (
        joined.rollup("nation", "segment")
        if grouping == "rollup"
        else joined.cube("nation", "segment")
    )
    return grouped.agg(
        F.grouping_id().cast("bigint").alias("level"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("cents").cast("double") / 100.0, 2).alias("revenue"),
    ).select("nation", "segment", "level", "n_orders", "revenue")


# one copy of the oracle body too — GROUP BY ROLLUP/CUBE is the only
# difference between the siblings
_REVENUE_SETS_SQL = """
SELECT n_name AS nation, c_mktsegment AS segment,
       (CASE WHEN GROUPING(c_mktsegment) = 1 THEN 1 ELSE 0 END
        + CASE WHEN GROUPING(n_name) = 1 THEN 2 ELSE 0 END)::BIGINT AS level,
       count(*) AS n_orders,
       round(sum(round(o_totalprice * 100)::BIGINT)::DOUBLE / 100.0, 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY {sets}(n_name, c_mktsegment)
"""


def a7_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation in ONE pass (rollup/grouping-sets — the
    OLAP family the reference lacks): order revenue by
    (nation, market segment), per-nation subtotals, and the grand
    total, disambiguated by grouping_id. Revenue sums exact cents
    (o_totalprice is 2-decimal), so partition summation order cannot
    move the rounded output. Plan shape: _revenue_grouping_sets."""
    return _revenue_grouping_sets(spark, sf_dir, "rollup")


A7_SQL = _REVENUE_SETS_SQL.format(sets="ROLLUP")


def a8_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — a7's rollup sibling covering ALL grouping-set
    combinations (nation×segment, per-nation, per-segment, grand
    total) in one Expand + hash aggregate. Same shared base and
    exact-cents discipline: _revenue_grouping_sets."""
    return _revenue_grouping_sets(spark, sf_dir, "cube")


A8_SQL = _REVENUE_SETS_SQL.format(sets="CUBE")


def j11_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build (temporal versioning the
    reference lacks): collapse each user's event stream into validity
    intervals of their current event_type — a new version starts when
    the type CHANGES, valid_to = next version's start (NULL = current).
    Two windows over one key partition: lag() marks change rows,
    lead() over the changes closes each interval. One shuffle on
    user_id, no self-join.
    → (user_id, event_type, valid_from, valid_to, version)."""
    events = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    changed = events.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    return changed.select(
        "user_id",
        "event_type",
        F.col("t").alias("valid_from"),
        F.lead("t").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )


J11_SQL = """
WITH base AS (
  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS t, event_id
  FROM events
),
o AS (
  -- order by the TRUNCATED epoch + event_id, exactly like the Spark
  -- window: ordering by raw ts would break same-second ties differently
  SELECT user_id, event_type, t, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_type
  FROM base
),
changed AS (
  SELECT user_id, event_type, t, event_id
  FROM o WHERE prev_type IS NULL OR prev_type != event_type
)
SELECT user_id, event_type, t AS valid_from,
       lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to,
       row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS version
FROM changed
"""


# --------------------------------------------------------------------------
# A5/W1 — row number in stable order (Mapper.java:32,85)
# --------------------------------------------------------------------------


def w1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable per-key row numbering (observation-number semantics): order
    sequence per customer by date then key. Partitioned window — scales
    as one shuffle on the partition key, no global sort."""
    orders = _t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(win).alias("seq"),
    )


W1_SQL = """
SELECT
  o_custkey,
  o_orderkey,
  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS seq
FROM orders
"""


# --------------------------------------------------------------------------
# U1 — union / concat of branches (FdpToRdf.java:298-311)
# --------------------------------------------------------------------------


def u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two generated branches (.nt passthrough ∪ generated
    triples shape)."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("branch")
    )
    big = orders.filter(F.col("o_totalprice") > 200000.0).select("o_orderkey", F.lit("big").alias("branch"))
    return urgent.unionByName(big).groupBy("branch").agg(F.count(F.lit(1)).alias("n_rows"))


U1_SQL = """
SELECT branch, count(*) AS n_rows FROM (
  SELECT o_orderkey, 'urgent' AS branch FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderkey, 'big' AS branch FROM orders WHERE o_totalprice > 200000.0
) u
GROUP BY branch
"""


# --------------------------------------------------------------------------
# U2 — last-wins dedup by key (organizations.put overwrite,
# DcatAp11ToCkanBatch.java:132; SURVEY §7 hard part 3)
# --------------------------------------------------------------------------


def u2_last_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins map semantics as an explicit descending-window dedup
    (NOT dropDuplicates, which is first-wins/nondeterministic): latest
    order per customer, ties broken by highest key."""
    orders = _t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


U2_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) t WHERE rn = 1
"""


# --------------------------------------------------------------------------
# L1 — deterministic top-k (QueryResults.singleResult generalized)
# --------------------------------------------------------------------------


def l1_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limit-after-total-order with a full tie-break so the row set is
    deterministic; Spark runs this as TakeOrderedAndProject (no global
    sort materialization)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")).limit(10).select(
        "c_custkey", "c_name", "c_acctbal"
    )


L1_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
"""


# --------------------------------------------------------------------------
# P — filter / predicate family (SURVEY §2.2)
# --------------------------------------------------------------------------


def p3_null_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-skip predicate (FdpMeasure.java:88): drop rows whose computed
    'cell' is null (here: left-join miss), count survivors per status."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .filter(F.col("c_custkey").isNotNull())
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


P3_SQL = """
SELECT o_orderstatus, count(*) AS n_orders
FROM orders
LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 0) c ON o_custkey = c_custkey
WHERE c_custkey IS NOT NULL
GROUP BY o_orderstatus
"""


def p5_range_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality + range predicates (DateDimension.java:50 shape) pushed to
    the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 10.0)
            & (F.col("l_quantity") <= 20.0)
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


P5_SQL = """
SELECT l_linestatus, count(*) AS n_rows, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_quantity >= 10.0 AND l_quantity <= 20.0 AND l_returnflag = 'R'
GROUP BY l_linestatus
"""


def p12_coalesce_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """downloadURL-over-accessURL preference (DcatAp11ToCkanBatch.java:434-444):
    prefer a primary value, fall back, drop rows where both absent."""
    orders = _t(spark, sf_dir, "orders")
    key_str = F.col("o_orderkey").cast("string")
    primary = F.when(F.col("o_orderstatus") == "O", F.concat(F.lit("open/"), key_str))
    fallback = F.when(F.col("o_totalprice") > 100000.0, F.concat(F.lit("big/"), key_str))
    return (
        orders.select("o_orderkey", F.coalesce(primary, fallback).alias("url"))
        .filter(F.col("url").isNotNull())
        .withColumn("kind", F.split(F.col("url"), "/").getItem(0))
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


P12_SQL = """
SELECT kind, count(*) AS n_rows FROM (
  SELECT str_split(coalesce(
           CASE WHEN o_orderstatus = 'O' THEN 'open/' || CAST(o_orderkey AS VARCHAR) END,
           CASE WHEN o_totalprice > 100000.0 THEN 'big/' || CAST(o_orderkey AS VARCHAR) END
         ), '/')[1] AS kind
  FROM orders
  WHERE o_orderstatus = 'O' OR o_totalprice > 100000.0
) t GROUP BY kind
"""


def p13_default_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default-fill for missing values (DcatAp11ToDkanBatch.java:505-516):
    customers without a nation match get the 'unknown' label."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") != 0).select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select("c_custkey", F.coalesce(F.col("n_name"), F.lit("unknown-nation")).alias("nation_name"))
        .groupBy("nation_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


P13_SQL = """
SELECT coalesce(n_name, 'unknown-nation') AS nation_name, count(*) AS n_customers
FROM customer
LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey != 0) n
  ON c_nationkey = n_nationkey
GROUP BY 1
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "j1_star_join_revenue": j1_star_join_revenue,
    "j2_left_outer_orders": j2_left_outer_orders,
    "j3_anti_join": j3_anti_join,
    "j4_values_lookup": j4_values_lookup,
    "j5_two_hop_path": j5_two_hop_path,
    "j6_codelist_lookup": j6_codelist_lookup,
    "j7_diff_merge": j7_diff_merge,
    "j8_lookup_with_override": j8_lookup_with_override,
    "a1_group_count_distinct": a1_group_count_distinct,
    "a2_distinct_projection": a2_distinct_projection,
    "a3_scalar_first": a3_scalar_first,
    "a4_collect_concat": a4_collect_concat,
    "a7_rollup_revenue": a7_rollup_revenue,
    "a8_cube_revenue": a8_cube_revenue,
    "j11_scd2_intervals": j11_scd2_intervals,
    "w1_row_number": w1_row_number,
    "u1_union": u1_union,
    "u2_last_wins_dedup": u2_last_wins_dedup,
    "l1_top_k": l1_top_k,
    "p3_null_skip": p3_null_skip,
    "p5_range_filters": p5_range_filters,
    "p12_coalesce_preference": p12_coalesce_preference,
    "p13_default_fill": p13_default_fill,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "j1_star_join_revenue": J1_SQL,
    "j2_left_outer_orders": J2_SQL,
    "j3_anti_join": J3_SQL,
    "j4_values_lookup": J4_SQL,
    "j5_two_hop_path": J5_SQL,
    "j6_codelist_lookup": J6_SQL,
    "j7_diff_merge": J7_SQL,
    "j8_lookup_with_override": J8_SQL,
    "a1_group_count_distinct": A1_SQL,
    "a2_distinct_projection": A2_SQL,
    "a3_scalar_first": A3_SQL,
    "a4_collect_concat": A4_SQL,
    "a7_rollup_revenue": A7_SQL,
    "a8_cube_revenue": A8_SQL,
    "j11_scd2_intervals": J11_SQL,
    "w1_row_number": W1_SQL,
    "u1_union": U1_SQL,
    "u2_last_wins_dedup": U2_SQL,
    "l1_top_k": L1_SQL,
    "p3_null_skip": P3_SQL,
    "p5_range_filters": P5_SQL,
    "p12_coalesce_preference": P12_SQL,
    "p13_default_fill": P13_SQL,
}
