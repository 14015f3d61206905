"""TPC-H-adapted query corpus over the driver's synthetic star schema.

The reference executes all 22 TPC-H queries e2e
(/root/reference/fpdb-main/test/TPCHTest.cpp, queries at
/root/reference/resources/query/tpch/original/*.sql). The driver's testdata is
a reduced TPC-H (no partsupp; fewer columns; dates stored as timestamps), so
each query here is the reference query adapted to the available columns while
preserving its *operator shape* — the plan skeleton Calcite would produce
(FilterableScan → Filter → Project → HashJoin/Group/Sort/LimitSort, per
fpdb-plan/include/fpdb/plan/prephysical/PrePOpType.h).

Every query is written with the DataFrame operator API (Spark-first: Catalyst
does pushdown/pruning/join-ordering) and paired with a DuckDB oracle string.

Aggregate convention (driver hash stability): double sums/averages go through
exact DECIMAL(25,6) per-summand casts on BOTH sides — see
pysparkdb.queries.base.dsum — because rounding a nondeterministically-ordered
double sum is not reproducible. ``DSUM(x)`` below abbreviates
``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`` in oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysparkdb.queries import register
from pysparkdb.queries.base import bigint, davg, dsum, parallel_scan, r2, tables, ts


def DSUM(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


def DAVG(x: str) -> str:
    return f"{DSUM(x)} / COUNT({x})"


@register(
    "q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')}                                        AS sum_qty,
           {DSUM('l_extendedprice')}                                   AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
           {DAVG('l_quantity')}                                        AS avg_qty,
           {DAVG('l_extendedprice')}                                   AS avg_price,
           {DAVG('l_discount')}                                        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "tpch", "group", "aggregate", "filter",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1): scan → filter → group-agg.

    Reference plan: FilterableScan → Filter → Group (partial) → Shuffle →
    Group (final) (PrePToPTransformer.cpp:433-582 two-phase group-by).
    Spark: filter reaches the parquet scan (PushedFilters), partial/final
    HashAggregate is automatic. At 100 TB: 6 grouping cells — map-side
    partial agg reduces the shuffle to ~nothing; scales linearly.
    """
    l = tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        parallel_scan(
            l.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
            .select("l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            bigint(F.count(F.lit(1))).alias("count_order"),
        )
    )


@register(
    "q3",
    f"""
    SELECT l_orderkey,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    "tpch", "join", "group", "limit_sort",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3): 3-way join → group → top-k.

    Reference: HashJoinBuild/Probe chain + Group + LimitSort
    (limitsort/LimitSortPOp.cpp:66-110 = SelectKUnstable). Spark:
    TakeOrderedAndProject. At 100 TB: customer is the small side —
    broadcast; orders⋈lineitem co-partitions on orderkey.
    """
    t = tables(spark, sf_dir)
    cutoff = ts("1996-03-15 00:00:00")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < cutoff)
    l = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q4",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 48)
    GROUP BY o_orderpriority
    """,
    "tpch", "semi_join", "group",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority check (TPC-H Q4): EXISTS → left-semi hash join.

    Reference: Calcite JOIN_TO_SEMI_JOIN (Optimizer.java:228-229) →
    HashSemiJoinProbeKernel (join/hashjoin/HashSemiJoinProbeKernel.cpp).
    Adapted predicate (no l_commitdate/l_receiptdate in testdata):
    l_quantity > 48. At 100 TB: semi join shuffles only the key column.
    """
    t = tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1996-10-01 00:00:00"))
    )
    l = t["lineitem"].filter(F.col("l_quantity") > 48)
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(bigint(F.count(F.lit(1))).alias("order_count"))
    )


@register(
    "q5",
    f"""
    SELECT n_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    "tpch", "join", "group", "sort",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5): 6-table join.

    Reference: the deepest join pipeline in the suite; bloom-filter ops are
    planted on every hash join (PrePToPTransformer.cpp:768-810). Spark:
    region/nation/supplier/customer broadcast; Catalyst's runtime bloom
    filter covers the lineitem probe. At 100 TB only orders⋈lineitem
    shuffles.
    """
    t = tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    c = t["customer"]
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


# q6's text, shared by q6_modes and scripts/mode_bench.py so the mode
# axis always measures the exact registered query.
_Q6_TEXT = f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """


@register(
    "q6",
    _Q6_TEXT,
    "tpch", "aggregate", "filter", "pushdown",
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue (TPC-H Q6): the reference's simplest pipeline —
    FilterableScan → Filter → Aggregate (scalar, no group keys;
    aggregate/AggregatePOp.cpp). All four predicates push to the parquet
    scan; partial/final agg is automatic. At 100 TB this is scan-bound —
    exactly the query S3-Select-style pushdown (s3/SelectPOp.cpp) targets.
    """
    l = tables(spark, sf_dir)["lineitem"]
    return (
        l.filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q7",
    f"""
    SELECT supp_nation, cust_nation, l_year, {DSUM('volume')} AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch", "join", "group", "date_extract",
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7): two nation dims + EXTRACT(YEAR) + an
    OR-join predicate. Reference DateExtract → Gandiva extractYear
    (fpdb-expression-gandiva/src/DateExtract.cpp:16-24). year() is cast to
    BIGINT to match DuckDB's EXTRACT type.
    """
    t = tables(spark, sf_dir)
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") <= ts("1997-12-31 00:00:00"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", bigint(F.year("l_shipdate")))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
    )


@register(
    "q8",
    f"""
    SELECT o_year,
           {DSUM("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {DSUM('volume')} AS mkt_share
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                AND TIMESTAMP '1996-12-31 00:00:00'
            AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    """,
    "tpch", "join", "case_when", "group",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8): 8-table join + CASE WHEN ratio.

    Reference: If expression from SQL CASE (CalcitePlanJsonDeserializer.cpp
    :268-274). Both ratio operands are exact decimal sums cast to double, so
    the final division is bit-identical with the oracle.
    """
    t = tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_name") == "AMERICA")
    n1 = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("n1_key")
    )
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    p = t["part"].filter(F.col("p_type") == "ECONOMY")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") <= ts("1996-12-31 00:00:00"))
    )
    vol = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "inner")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", bigint(F.year("o_orderdate")))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
    )
    case_vol = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return vol.groupBy("o_year").agg((dsum(case_vol) / dsum(F.col("volume"))).alias("mkt_share"))


@register(
    "q9",
    f"""
    SELECT nation, o_year, {DSUM('amount')} AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%blue%') profit
    GROUP BY nation, o_year
    """,
    "tpch", "join", "like", "group",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product type profit (TPC-H Q9, partsupp-free adaptation): LIKE
    pattern scan filter + 5-table join. Reference Like → Gandiva `like`
    (fpdb-expression-gandiva/src/Like.cpp:40).
    """
    t = tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%blue%"))
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            bigint(F.year("o_orderdate")).alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


@register(
    "q10",
    f"""
    SELECT c_custkey, c_name,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "tpch", "join", "group", "limit_sort",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting (TPC-H Q10): join → group → top-20."""
    t = tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    l = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_returnflag IN ('R', 'A')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    "tpch", "in_list", "case_when", "join", "group",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping mode / priority (TPC-H Q12 adapted): IN-list membership +
    CASE WHEN counting. Reference: In expands to OR-of-equals
    (CalcitePlanJsonDeserializer.cpp:239-267), If from CASE (:268-274).
    """
    t = tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l = t["lineitem"].filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
    )
    return (
        l.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            bigint(F.sum(F.when(hi, 1).otherwise(0))).alias("high_line_count"),
            bigint(F.sum(F.when(~hi, 1).otherwise(0))).alias("low_line_count"),
        )
    )


@register(
    "q13",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus <> 'P'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "tpch", "outer_join", "group", "sort",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution (TPC-H Q13): LEFT OUTER join with an extra
    join-condition predicate, double aggregation. Reference outer-match
    bookkeeping: OuterJoinHelper (join/hashjoin/OuterJoinHelper.cpp).
    COUNT(col) skips the nulls left-outer introduces — same in both engines.
    """
    t = tables(spark, sf_dir)
    joined = t["customer"].join(
        t["orders"],
        (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") != "P"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(bigint(F.count("o_orderkey")).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(bigint(F.count(F.lit(1))).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14",
    f"""
    SELECT 100.00 * {DSUM("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           / {DSUM('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    "tpch", "case_when", "join", "aggregate",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14): scalar aggregate ratio over a join."""
    t = tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1996-10-01 00:00:00"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo) / dsum(disc_price)).alias("promo_revenue"))
    )


@register(
    "q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {DSUM('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING {DSUM('l_quantity')} > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    "tpch", "semi_join", "group", "having", "limit_sort",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large volume customer (TPC-H Q18): IN-subquery (semi join against an
    aggregate) + HAVING + top-k. Threshold adapted to the testdata's order
    sizes (max per-order qty ≈ 458).
    """
    t = tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(big), F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19",
    f"""
    SELECT {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 21)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
            AND l_quantity BETWEEN 10 AND 30)
        OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 50
            AND l_quantity BETWEEN 20 AND 40))
    """,
    "tpch", "join", "filter", "aggregate",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19): disjunctive multi-attribute join
    predicate — the reference evaluates it as one Gandiva OR tree post-join;
    Catalyst additionally derives per-side implied filters
    (the EnhancedFilterJoinRule analog, rule/EnhancedFilterJoinRule.java).
    """
    t = tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 40))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q5_pred_trans",
    f"""
    SELECT n_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    "tpch", "pred_trans", "join",
)
def q5_pred_trans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 executed through the predicate-transfer pre-pass
    (pysparkdb.plans.predicate_transfer — the CIDR-2024 mode,
    PrePToPTransformerForPredTrans.cpp): every table is semi-join-reduced
    across the join graph before the join tree runs. Same oracle as q5 —
    the pass must be a pure pre-filter.
    """
    from pysparkdb.plans.predicate_transfer import extract_join_edges, predicate_transfer

    base = tables(spark, sf_dir)
    # the join graph comes from the q5 plan itself (JoinOriginTracer
    # analog), not a hand-declared edge list
    edges = extract_join_edges(q5(spark, sf_dir), base)
    t = dict(base)
    t["region"] = t["region"].filter(F.col("r_name") == "ASIA")
    t["orders"] = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    # Catalog size ranks (stats.json role): only relative order matters for
    # the small-to-large pass; orders is rank-small here because its date
    # filter is highly selective. Everything but lineitem broadcasts its
    # key set.
    sizes = {"region": 1, "nation": 2, "supplier": 3, "customer": 4,
             "orders": 5, "lineitem": 6}
    r = predicate_transfer(t, edges, sizes=sizes, broadcast_threshold=5)
    return (
        r["lineitem"]
        .join(r["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(r["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(r["customer"]),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(r["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


# q5's text, shared by q5_auto so the cost-based mode runs the exact
# registered query both sides of its crossover.
_Q5_TEXT = f"""
    SELECT n_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
"""


@register(
    "q5_auto",
    f"""
    SELECT n_name, revenue,
           TRUE AS auto_plain_below, TRUE AS auto_transfers_above
    FROM ({_Q5_TEXT}) q5
    ORDER BY revenue DESC
    """,
    "tpch", "join", "group", "predicate_transfer", "auto",
)
def q5_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predicate-transfer COST MODEL under driver evidence: TPC-H Q5
    through ``Engine.sql(q, predicate_transfer="auto")`` at both sides of
    the measured ``_AUTO_BYTES_PER_CORE`` crossover (engine.py:38,
    SCALE.md "Measured crossover"). Below the threshold (test tables are
    far under it) the plan must stay PLAIN — no LeftSemi reduction jobs;
    with the threshold forced to zero the SAME call must apply the
    transfer — LeftSemi joins present — and return identical rows. Both
    plan inspections are folded into certificate booleans the oracle
    asserts TRUE, and the returned rows come from the TRANSFERRED plan, so
    the driver hash also re-proves the pass's purity on q5. The crossover
    flip is this facade's own per-instance ``auto_bytes_per_core`` knob —
    scoped to the local Engine, so concurrent sql() calls through other
    facades never observe it (no module-global mutation; Engine.sql's
    thread-safety contract holds)."""
    from pysparkdb.engine import Engine
    from pysparkdb.plans.pushdown import explain_str

    eng = Engine(spark).attach(sf_dir, reuse=True)
    below = eng.sql(_Q5_TEXT, predicate_transfer="auto")
    plain_below = "LeftSemi" not in explain_str(below, "simple")
    eng.auto_bytes_per_core = 0
    above = eng.sql(_Q5_TEXT, predicate_transfer="auto")
    transfers_above = "LeftSemi" in explain_str(above, "simple")
    return (
        above.select("n_name", "revenue")
        .withColumn("auto_plain_below", F.lit(plain_below))
        .withColumn("auto_transfers_above", F.lit(transfers_above))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "q22",
    f"""
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           {DSUM('c_acctbal')} AS totacctbal
    FROM (SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
            AND c_acctbal > (SELECT {DSUM('c_acctbal')} / COUNT(c_acctbal)
                             FROM customer
                             WHERE c_acctbal > 0.00
                               AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    "tpch", "anti_join", "scalar_subquery", "group",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22): scalar subquery + NOT EXISTS →
    left-anti join. The reference lacks anti joins (JoinType.h has no ANTI);
    Spark provides them natively — capability superset, per SURVEY §7.4.
    The scalar average is broadcast-joined, not collected to the driver, and
    is computed as an exact decimal sum / count so the comparison boundary
    is bit-identical with the oracle.

    Adapted: the spec's NOT EXISTS probes all orders, but this corpus gives
    every custkey at least one order, which would make the result (and its
    oracle row) structurally empty at every SF — so the probe is the
    1-URGENT subset ("rich customers who never placed an urgent order"),
    preserving the scalar-subquery + anti-join + group plan shape on a
    non-vacuous answer set.
    """
    t = tables(spark, sf_dir)
    nations = [1, 2, 3, 4, 5, 6, 7]
    cust = t["customer"].filter(F.col("c_nationkey").isin(nations))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal")).alias("avg_bal"))
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select(bigint(F.col("c_nationkey")).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            bigint(F.count(F.lit(1))).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q2",
    """
    WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                       MIN(l_extendedprice) AS ps_supplycost
                FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey
    FROM part, supplier, ps, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (SELECT MIN(ps2.ps_supplycost)
                           FROM ps ps2, supplier s2, nation n2, region r2
                           WHERE ps2.ps_partkey = p_partkey
                             AND s2.s_suppkey = ps2.ps_suppkey
                             AND s2.s_nationkey = n2.n_nationkey
                             AND n2.n_regionkey = r2.r_regionkey
                             AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "tpch", "join", "scalar_subquery", "limit_sort",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum cost supplier (TPC-H Q2 adapted — testdata has no partsupp, so
    the part↔supplier cost relation is derived from lineitem:
    ps_supplycost := MIN(l_extendedprice) per (partkey, suppkey), which keeps
    Q2's plan shape — a correlated scalar MIN subquery decorrelated into a
    group-agg + equality join (Optimizer.java:129-141 RelDecorrelator path).

    MIN over double is order-insensitive, so no decimal summation is needed.
    The ORDER BY key (s_acctbal, n_name, s_name, p_partkey) is unique per row,
    making LIMIT 100 deterministic across engines. At 100 TB: the ps relation
    shuffles once on (partkey, suppkey); min-per-part is a second partial agg
    on partkey; suppliers/nations/regions broadcast.
    """
    t = tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_name") == "EUROPE")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    eu_supp = t["supplier"].join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("ps_supplycost"))
    )
    eu_ps = ps.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = eu_ps.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    p = t["part"].filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
    return (
        eu_ps.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11",
    f"""
    SELECT l_partkey AS ps_partkey,
           {DSUM('l_extendedprice * l_quantity')} AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING {DSUM('l_extendedprice * l_quantity')} >
           (SELECT {DSUM('l_extendedprice * l_quantity')} * 0.0001
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_7')
    ORDER BY part_value DESC
    """,
    "tpch", "group", "having", "scalar_subquery",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 adapted — part value is
    SUM(l_extendedprice * l_quantity) over lineitem instead of
    supplycost*availqty over partsupp). Plan shape preserved: group-agg +
    scalar-subquery threshold (HAVING > fraction of grand total).

    The scalar total is broadcast-joined, never collected to the driver.
    Both the per-part value and the grand total are exact decimal sums, and
    the 0.0001 scale is one deterministic double multiply, so the threshold
    comparison is bit-identical with the oracle. At 100 TB the filtered
    lineitem aggregates twice (partial/final) on l_partkey; the total reuses
    the same reduced relation.
    """
    t = tables(spark, sf_dir)
    n = t["nation"].filter(F.col("n_name") == "NATION_7")
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    li = t["lineitem"].join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = li.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        dsum(value).alias("part_value")
    )
    total = li.agg((dsum(value) * F.lit(0.0001)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc())
    )


@register(
    "q15",
    f"""
    WITH revenue AS (SELECT l_suppkey AS supplier_no,
                            {DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
                     FROM lineitem
                     WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                     GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "tpch", "group", "scalar_subquery", "view",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15): revenue view + MAX scalar subquery + join
    back. The reference runs this as the view-expanded Calcite plan; here the
    view is a shared DataFrame (computed once per branch by Spark; AQE reuses
    the exchange). total_revenue is an exact decimal sum cast to double on
    both sides, so the MAX-equality join is bit-exact. At 100 TB: one shuffle
    on l_suppkey; the MAX is a scalar broadcast.
    """
    t = tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#21'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch", "anti_join", "count_distinct", "in_list", "group",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 adapted — the part↔supplier
    relation comes from lineitem; the excluded-supplier predicate is
    s_acctbal < 0 since testdata has no s_comment). Shape preserved:
    NOT IN → left-anti join (a Spark-native capability the reference lacks,
    JoinType.h has no ANTI) + COUNT(DISTINCT) group-agg
    (Calcite-rewritten in the reference, TPCHTest.cpp case 16).

    At 100 TB: the exclusion list is tiny (broadcast anti join); distinct
    count is a two-phase aggregate on (brand, type, size, suppkey).
    """
    t = tables(spark, sf_dir)
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#21")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(bigint(F.countDistinct("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17",
    f"""
    SELECT {DSUM('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity < (SELECT 0.2 * ({DSUM('l_quantity')} / COUNT(l_quantity))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    "tpch", "scalar_subquery", "aggregate", "join",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17; p_container → p_type since
    testdata has no container column). The correlated AVG subquery is
    decorrelated into a per-part aggregate broadcast-joined back — the same
    rewrite Calcite's RelDecorrelator applies (Optimizer.java:129-141).

    The threshold is davg (exact decimal sum / count) scaled by 0.2 — one
    deterministic double multiply on both sides. At 100 TB the per-part AVG
    aggregates map-side before its shuffle; the filtered part list broadcasts.
    """
    t = tables(spark, sf_dir)
    p = t["part"].filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((F.lit(0.2) * davg(F.col("l_quantity"))).alias("qty_threshold"))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q20",
    f"""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (SELECT l_suppkey
                        FROM lineitem, part
                        WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
                          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                        GROUP BY l_suppkey, l_partkey
                        HAVING {DSUM('l_quantity')} > 50)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ORDER BY s_name
    """,
    "tpch", "semi_join", "having", "like", "group",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 adapted — the availability
    predicate ps_availqty > 0.5*sum(shipped) becomes a shipped-quantity
    threshold per (supplier, part), keeping the nested IN-subquery chain:
    LIKE-filtered parts → grouped lineitem HAVING → semi join suppliers →
    nation filter). The reference plans this as stacked semi joins
    (Optimizer.java:223-231 JOIN_TO_SEMI_JOIN).

    At 100 TB: group on (l_suppkey, l_partkey) is the only shuffle; the
    qualifying supplier set is tiny and broadcast for the semi join.
    """
    t = tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("red%"))
    qual = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("shipped"))
        .filter(F.col("shipped") > 50)
        .select("l_suppkey")
    )
    n = t["nation"].filter(F.col("n_name") == "NATION_3")
    return (
        t["supplier"]
        .join(F.broadcast(qual), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o2
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND o2.o_orderkey = l3.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 90 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "tpch", "semi_join", "anti_join", "theta", "group", "limit_sort",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 adapted — "late" is
    l_shipdate > o_orderdate + 90 days since testdata has no
    commit/receipt dates). Keeps Q21's signature plan: a self-joined
    EXISTS (semi join with a non-equi conjunct) plus NOT EXISTS (anti join),
    the hardest decorrelation case in the reference suite (TPCHTest.cpp
    case 21; semi-join kernels HashSemiJoinProbeKernel.cpp).

    The semi/anti joins run on (l_orderkey) equi keys with the
    supplier-inequality as a join residual, so both shuffle only once on
    orderkey. The `late` relation feeds BOTH the candidate/semi probe and
    (distinct'd) the anti build side — and those branches shuffle on
    different keys, so Catalyst's ReusedExchange cannot kick in; without
    pinning, Spark recomputes the lineitem⋈orders subtree per branch. It
    is persisted MEMORY_AND_DISK (asserted in test_plan_quality): at
    100 TB, caching the filtered late subset is strictly cheaper than a
    second full lineitem⋈orders join.
    """
    from pysparkdb.pins import pin

    t = tables(spark, sf_dir)
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    late = (
        t["lineitem"]
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    late = pin(late)
    other = t["lineitem"].select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    ).distinct()
    n = t["nation"].filter(F.col("n_name") == "NATION_1")
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(bigint(F.count(F.lit(1))).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# One cache manager per SparkSession for the hybrid-mode query (the
# reference keeps one SegmentCacheActor per executor process,
# fpdb-executor/src/Executor.cpp:46-60).
# Weak-keyed on the session (the queries/base.py _CATALOGS rationale): an
# id()-keyed dict would pin every discarded session's InMemoryRelation for
# process lifetime and could hand a stale manager to a new session that
# reuses the freed id.
import weakref

_HYBRID_CACHES: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


@register(
    "q6_hybrid",
    f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "tpch", "aggregate", "cache", "hybrid",
)
def q6_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 through the CACHING/HYBRID scan path (Mode.h:13-18): the
    4-column working set is served by the SegmentCacheManager — first call
    admits the projection (miss → parquet scan with pushdown, then cached
    as an InMemoryRelation), repeat calls serve the hot columns from
    memory, exactly the reference's hot-segment economics
    (CacheLoadPOp.cpp + PrePToS3PTransformer.cpp:309-461). Same oracle as
    q6: the cache must be semantically invisible.
    """
    from pysparkdb.plans.cache import SegmentCacheManager

    mgr = _HYBRID_CACHES.get(spark)
    if mgr is None:
        mgr = _HYBRID_CACHES[spark] = SegmentCacheManager(
            spark, capacity_bytes=1 << 30, policy="wlfu"
        )
    l = tables(spark, sf_dir)["lineitem"]
    hot = mgr.project(
        l, f"lineitem@{sf_dir}",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return (
        hot.filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q6_modes",
    f"""
    SELECT m.scan_mode,
           (SELECT {DSUM('l_extendedprice * l_discount')}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24) AS revenue
    FROM (VALUES ('caching'), ('hybrid'), ('pullup'), ('pushdown'))
         AS m(scan_mode)
    """,
    "tpch", "aggregate", "cache", "hybrid", "mode",
)
def q6_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline experiment as ONE query: TPC-H Q6 executed
    under all four execution modes of the mode axis — PULL_UP /
    PUSHDOWN_ONLY / CACHING_ONLY / HYBRID (fpdb-plan/include/fpdb/plan/
    Mode.h:13-18, selected by exec.conf:4 MODE=; exercised by the
    reference's HybridTest.cpp / CachingOnlyTest.cpp) — via
    Engine.set_mode/sql(mode=...). One row per mode carrying that mode's
    measured revenue; the oracle expects the SAME q6 scalar on every row,
    so any mode producing a divergent answer hash-fails the driver check.
    Each mode's scalar is materialized while its mode is in force (the
    mode is session-scoped, like exec.conf MODE — a bounded 4-row
    collect); the finally restores the engine-default mode AND unpersists
    the segment cache, so every invocation pays the honest cold admission
    and nothing stays pinned in the shared session afterwards. The 4-row
    certificate frame is assembled JVM-side (jvm_rows_df — Catalyst
    literals, no Python-worker RDD): the round-14 timeline attribution
    convicted local-list construction's PythonWorkerFactory dependency of
    this row's clean-host episodes (46.29 s reading with steal_d=29,
    gc 0 — BENCH_r14_timeline.json pos 139), the same class the
    ev_interval_overlap reshape cured."""
    from pysparkdb.engine import MODES, Engine
    from pysparkdb.queries.base import jvm_rows_df

    eng = Engine(spark).attach(sf_dir, reuse=True)
    try:
        rows = [
            (m, eng.sql(_Q6_TEXT, mode=m).collect()[0][0])
            for m in sorted(MODES)
        ]
    finally:
        eng.set_mode("pushdown")
        eng.clear_segment_cache()
    return jvm_rows_df(spark, rows, "scan_mode string, revenue double")


# ---------------------------------------------------------------------------
# Original-form partsupp queries (TPC-H Q2/Q11/Q16/Q20).
#
# The reference runs the ORIGINAL partsupp-based forms
# (resources/query/tpch/original/{02,11,16,20}.sql, fpdb-main/test/
# TPCHTest.cpp cases 2/11/16/20); the driver's testdata has no partsupp
# table, so the adapted q2/q11/q16/q20 above substitute lineitem-derived
# proxies. To close that parity gap without inventing data files, a
# deterministic partsupp relation is DERIVED from part × supplier with
# dbgen's topology (4 suppliers per part, stride S/4 + p/S — TPC-H spec
# §4.2.3) and arithmetic-only availqty/supplycost in place of dbgen's
# RNG. Both engines evaluate the identical integer formulas, so the
# relation is bit-identical across Spark and DuckDB with no materialized
# file and no path coupling in the oracle SQL. At 100 TB the derivation
# is map-side from part (4× fan-out, one broadcast scalar for |supplier|)
# — strictly cheaper than scanning a stored partsupp.
# ---------------------------------------------------------------------------

PARTSUPP_CTES = """
    scnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM supplier),
    psk AS (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey + gen.i * (CAST(FLOOR(s / 4.0) AS BIGINT)
                   + CAST(FLOOR(p_partkey * 1.0 / s) AS BIGINT))) % s
                  AS BIGINT) AS ps_suppkey
      FROM part, scnt, (VALUES (0), (1), (2), (3)) AS gen(i)
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST((ps_partkey * 17 + ps_suppkey * 23) % 9999 + 1
                  AS BIGINT) AS ps_availqty,
             CAST((ps_partkey * 31 + ps_suppkey * 107) % 99900 AS DOUBLE)
               / 100.0 + 1.0 AS ps_supplycost
      FROM psk
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (see module comment above): deterministic,
    bit-identical to the oracle's PARTSUPP_CTES. Map-side: part × a
    4-literal explode × one broadcast |supplier| scalar — no shuffle."""
    t = tables(spark, sf_dir)
    scnt = t["supplier"].agg(F.count(F.lit(1)).cast("long").alias("s"))
    stride = F.floor(F.col("s") / 4.0).cast("long") + F.floor(
        F.col("p_partkey") * 1.0 / F.col("s")
    ).cast("long")
    psk = (
        t["part"]
        .select("p_partkey")
        .crossJoin(F.broadcast(scnt))
        .select(
            "p_partkey",
            "s",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * stride) % F.col("s"))
            .cast("long")
            .alias("ps_suppkey"),
        )
    )
    return psk.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 23) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 107) % 99900).cast("double")
            / 100.0
            + 1.0
        ).alias("ps_supplycost"),
    )


@register(
    "q2_orig",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT s_acctbal, s_name, n_name, p_partkey
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 41 AND p_type LIKE '%ARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (SELECT MIN(ps2.ps_supplycost)
                           FROM partsupp ps2, supplier s2, nation n2, region r2
                           WHERE ps2.ps_partkey = p_partkey
                             AND s2.s_suppkey = ps2.ps_suppkey
                             AND s2.s_nationkey = n2.n_nationkey
                             AND n2.n_regionkey = r2.r_regionkey
                             AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "tpch", "join", "scalar_subquery", "limit_sort", "partsupp",
)
def q2_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum cost supplier — ORIGINAL partsupp form of TPC-H Q2
    (resources/query/tpch/original/02.sql; TPCHTest.cpp case 2), over the
    derived partsupp. Column deltas vs the reference text only where the
    testdata lacks the column (p_mfgr, s_address, s_phone, s_comment
    dropped from the SELECT; '%NICKEL' → '%ARGE' over the reduced p_type
    domain; p_size = 41 kept verbatim). Correlated MIN subquery
    decorrelated into min-per-part + equality join, Calcite
    RelDecorrelator-style. The ORDER BY key is unique per row (cost ties
    within a part are impossible: 107·Δsuppkey ≢ 0 mod 99900 for
    0 < Δ < S), so LIMIT 100 is deterministic. At 100 TB: partsupp is
    map-side derived, suppliers/nations/regions broadcast, min-cost is a
    partial agg on ps_partkey."""
    t = tables(spark, sf_dir)
    r = t["region"].filter(F.col("r_name") == "EUROPE")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    eu_supp = t["supplier"].join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eu_ps = _partsupp(spark, sf_dir).join(
        F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    min_cost = eu_ps.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    p = t["part"].filter((F.col("p_size") == 41) & F.col("p_type").like("%ARGE"))
    return (
        eu_ps.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_orig",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT ps_partkey,
           {DSUM('ps_supplycost * ps_availqty')} AS part_value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY ps_partkey
    HAVING {DSUM('ps_supplycost * ps_availqty')} >
           (SELECT {DSUM('ps_supplycost * ps_availqty')} * 0.0001
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_7')
    ORDER BY part_value DESC
    """,
    "tpch", "group", "having", "scalar_subquery", "partsupp",
)
def q11_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification — ORIGINAL partsupp form of TPC-H
    Q11 (original/11.sql; TPCHTest.cpp case 11): value is
    SUM(ps_supplycost · ps_availqty), exactly the reference's expression
    ('JAPAN' → 'NATION_7' in the synthetic nation domain). Exact decimal
    sums on both sides; the grand-total threshold is broadcast, never
    collected. At 100 TB: one shuffle on ps_partkey; the scalar reuses the
    same nation-filtered relation."""
    t = tables(spark, sf_dir)
    n = t["nation"].filter(F.col("n_name") == "NATION_7")
    s = t["supplier"].join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(s.select("s_suppkey")), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = ps.groupBy("ps_partkey").agg(dsum(value).alias("part_value"))
    total = ps.agg((dsum(value) * F.lit(0.0001)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
        .orderBy(F.col("part_value").desc())
    )


@register(
    "q16_orig",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#21'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (38, 2, 8, 31, 44, 5, 14, 24)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                             WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch", "group", "distinct_agg", "anti_join", "partsupp",
)
def q16_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship — ORIGINAL partsupp form of TPC-H Q16
    (original/16.sql; TPCHTest.cpp case 16): COUNT(DISTINCT ps_suppkey)
    per (brand, type, size) with a NOT-IN supplier exclusion. Adaptations:
    'MEDIUM PLATED%' → 'MEDIUM%' over the one-word p_type domain, and the
    s_comment complaints filter (column absent) → s_acctbal < 0, keeping
    the NOT-IN-subquery shape. NOT IN on a non-nullable key compiles to a
    left-anti join. At 100 TB: partsupp derives map-side, part broadcasts
    into the join, the distinct-agg shuffles once on the group keys."""
    t = tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#21")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(38, 2, 8, 31, 44, 5, 14, 24)
    )
    complaints = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(complaints), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(bigint(F.count_distinct(F.col("ps_suppkey"))).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_orig",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT s_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
          AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                             WHERE l_partkey = ps_partkey
                               AND l_suppkey = ps_suppkey
                               AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                               AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ORDER BY s_name
    """,
    "tpch", "semi_join", "correlated_subquery", "partsupp",
)
def q20_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion — ORIGINAL partsupp form of TPC-H Q20
    (original/20.sql; TPCHTest.cpp case 20): nested IN subqueries over
    partsupp with a correlated availqty-vs-shipped-quantity threshold
    ('antique%' → 'small%' over the synthetic p_name domain; 'KENYA' →
    'NATION_3'; s_address dropped — column absent). Strict SQL NULL
    semantics preserved: a (part, supplier) with no 1996 shipments yields
    a NULL sum, NULL comparison is false → the decorrelated form is an
    INNER join on the per-(partkey, suppkey) aggregate, not a left join.
    SUM(l_quantity) over integral-valued doubles is order-insensitive
    (exact in binary), so no decimal cast is needed. At 100 TB: lineitem
    pre-aggregates on its join keys (partial map-side), partsupp derives
    map-side, both semi joins broadcast their small sides."""
    t = tables(spark, sf_dir)
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    qualifying = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(small_parts), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    n = t["nation"].filter(F.col("n_name") == "NATION_3")
    return (
        t["supplier"]
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Join-order variants + synthetic corpus (reference e2e parity, round 6).
# The reference's test suite runs the same query DECLARED in different join
# orders (resources/query/tpch/modified/{05-jo1,05-jo2,09-jo1,09-jo2}.sql —
# exercising Calcite's LoptOptimizeJoinRule reordering) and a synthetic
# co-located-join corpus (resources/query/tpch/synthetic/co-join-*.sql).
# Here the DataFrame form BUILDS the joins in the variant's declared order
# and Catalyst must reorder to the same efficient plan (asserted in
# test_plan_quality); the oracles declare the same FROM order to DuckDB.
# ---------------------------------------------------------------------------

_Q5_VARIANT_SELECT = (
    "SELECT n_name, "
    + DSUM("l_extendedprice * (1 - l_discount)")
    + """ AS revenue
    FROM {frm}
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """
)


def _q5_variant_frames(spark: SparkSession, sf_dir: str) -> dict:
    t = tables(spark, sf_dir)
    return {
        "orders": t["orders"].filter(
            (F.col("o_orderdate") >= ts("1997-01-01 00:00:00"))
            & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
        ),
        "lineitem": t["lineitem"],
        "supplier": t["supplier"],
        "nation": t["nation"],
        "region": t["region"].filter(F.col("r_name") == "EUROPE"),
        "customer": t["customer"],
    }


def _q5_finish(joined: DataFrame) -> DataFrame:
    return (
        joined.groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "q5_jo1",
    _Q5_VARIANT_SELECT.format(frm="orders, lineitem, supplier, nation, region, customer"),
    "tpch", "join", "join_order_variant",
)
def q5_jo1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5, join-order variant 1 (modified/05-jo1.sql; the reference
    runs these to exercise Calcite join reordering, LoptOptimizeJoinRule —
    fpdb-calcite Optimizer.java:156-175). The DataFrame is BUILT in the
    file's declared order — orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈
    region ⋈ customer — i.e. fact-first with every dimension appended
    after; Catalyst must still broadcast the dims and keep the plan
    cartesian-free (asserted in test_plan_quality), which is the Spark
    analog of the reference's reordering contract."""
    f = _q5_variant_frames(spark, sf_dir)
    joined = (
        f["orders"]
        .join(f["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(f["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(f["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(f["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            f["customer"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return _q5_finish(joined)


@register(
    "q5_jo2",
    _Q5_VARIANT_SELECT.format(frm="lineitem, orders, customer, supplier, nation, region"),
    "tpch", "join", "join_order_variant",
)
def q5_jo2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5, join-order variant 2 (modified/05-jo2.sql): declared
    lineitem-first with customer joined before supplier. Same contract as
    q5_jo1 — identical results from a different declared order, efficient
    plan regardless (and tested equal to q5_jo1 row-for-row)."""
    f = _q5_variant_frames(spark, sf_dir)
    joined = (
        f["lineitem"]
        .join(f["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(f["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            f["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(f["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(f["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return _q5_finish(joined)


@register(
    "q9_orig",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT nation, o_year, {DSUM('amount')} AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - ps_supplycost * l_quantity AS amount
          FROM partsupp, lineitem, part, supplier, orders, nation
          WHERE s_suppkey = l_suppkey
            AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
            AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey
            AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
    "tpch", "join", "like", "group", "partsupp", "join_order_variant",
)
def q9_orig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product type profit — ORIGINAL partsupp form of TPC-H Q9
    (original/09.sql; declared order from modified/09-jo1.sql, partsupp
    first): amount subtracts ps_supplycost·l_quantity, the reference's
    exact expression, over the derived partsupp ('%yellow%' → '%red%' in
    the synthetic p_name domain). The (ps_partkey, ps_suppkey) →
    (l_partkey, l_suppkey) join is the one place partsupp joins the fact
    on BOTH keys; partsupp derives map-side and, being |part|×4, stays
    broadcastable next to lineitem at any scale where part is dimension-
    sized."""
    t = tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%"))
    ps = _partsupp(spark, sf_dir)
    return (
        ps.join(
            t["lineitem"],
            (F.col("ps_suppkey") == F.col("l_suppkey"))
            & (F.col("ps_partkey") == F.col("l_partkey")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            bigint(F.year("o_orderdate")).alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


@register(
    "q_co_join",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "tpch", "join", "synthetic", "colocated",
)
def q_co_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic co-located fact-fact join (resources/query/tpch/synthetic/
    co-join-2-table.sql; FPDBStoreSuperPOp's co-located-join test corpus):
    lineitem ⋈ orders on the shared key with a residual date predicate
    (l_commitdate/l_receiptdate absent in testdata → shipped >30 days
    after order date). On plain parquet this is one orderkey shuffle; the
    ZERO-Exchange layout the synthetic corpus exists for is what
    sources/files.py:write_bucketed provides — both sides bucketed by
    orderkey join with no Exchange at all (proven in
    tests/test_sources.py) — which is the Spark form of the reference's
    storage-side co-located join."""
    t = tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderpriority")
        .agg(bigint(F.count(F.lit(1))).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q9_jo2",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT nation, o_year, {DSUM('amount')} AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - ps_supplycost * l_quantity AS amount
          FROM part, lineitem, supplier, nation, partsupp, orders
          WHERE s_suppkey = l_suppkey
            AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
            AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey
            AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
    "tpch", "join", "like", "group", "partsupp", "join_order_variant",
)
def q9_jo2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9, join-order variant 2 (modified/09-jo2.sql): the same
    profit query DECLARED part-first — part ⋈ lineitem ⋈ supplier ⋈
    nation ⋈ partsupp ⋈ orders (q9_orig declares 09-jo1's partsupp-first
    order). Same reordering contract as q5_jo1/q5_jo2: Catalyst must
    produce an efficient cartesian-free plan from either declared order,
    and the two variants must agree row-for-row (both asserted in
    test_plan_quality)."""
    t = tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%"))
    ps = _partsupp(spark, sf_dir)
    return (
        p.join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            ps,
            (F.col("ps_suppkey") == F.col("l_suppkey"))
            & (F.col("ps_partkey") == F.col("l_partkey")),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            bigint(F.year("o_orderdate")).alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


@register(
    "q_co_join3",
    f"""
    WITH {PARTSUPP_CTES}
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM lineitem, orders, partsupp
    WHERE l_orderkey = o_orderkey
      AND l_partkey = ps_partkey
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND ps_availqty < 500
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "tpch", "join", "synthetic", "colocated", "partsupp",
)
def q_co_join3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic 3-table co-located join (resources/query/tpch/synthetic/
    co-join-3-table.sql): the co-located lineitem ⋈ orders fact-fact join
    plus a partsupp attach on l_partkey ONLY (the file's deliberate
    fan-out: 4 partsupp rows per part survive the availqty filter ~5% of
    the time). The reference's o_comment NOT LIKE predicate has no column
    in this testdata; the date predicate stands in (same substitution as
    q_co_join). Plan shape: one orderkey shuffle for the fact-fact join
    (zero with the bucketed layout, tests/test_sources.py), partsupp
    derives map-side and broadcasts — the 3-table form never adds a
    second fact shuffle."""
    t = tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderdate") >= ts("1994-01-01 00:00:00"))
    ps = _partsupp(spark, sf_dir).filter(F.col("ps_availqty") < 500)
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(ps), F.col("l_partkey") == F.col("ps_partkey"))
        .groupBy("o_orderpriority")
        .agg(bigint(F.count(F.lit(1))).alias("order_count"))
        .orderBy("o_orderpriority")
    )
