"""SSB (Star Schema Benchmark) query corpus, adapted to the driver's tables.

The reference executes all 13 SSB queries e2e
(/root/reference/fpdb-main/test/SSBTest.cpp; queries at
/root/reference/resources/query/ssb/original/1.1.sql … 4.3.sql). SSB's
denormalized star (lineorder + date/customer/supplier/part dims,
/root/reference/resources/metadata/ssb-sf1/csv/schema.json) maps onto the
driver's reduced TPC-H schema as:

- ``lineorder``            → lineitem ⋈ orders (o_orderdate is the date key)
- ``date`` dim attributes  → year()/month()/weekofyear() of o_orderdate
  (the reference's DateExtract expression,
  fpdb-expression-gandiva/src/DateExtract.cpp:16-24)
- ``lo_revenue``           → l_extendedprice * (1 - l_discount)
- ``lo_supplycost``        → l_quantity * p_retailprice * 0.5 (proxy; the
  driver's schema has no supplycost column)
- ``s_region``/``c_region``→ supplier/customer ⋈ nation ⋈ region (r_name)
- ``s_nation``/``c_nation``→ n_name via nationkey
- ``s_city``/``c_city``    → n_name || '_' || key % 10 — SSB cities are
  literally nation-prefix + digit ('UNITED KI1'), so the derived city keeps
  the same hierarchy nation ⊃ city with fanout 10
- ``p_category``/``p_mfgr``→ p_type (driver part table has brand/type only)
- ``p_brand1``             → p_brand

Every query preserves the reference query's *operator shape* — the
dimensional filters, the join graph, the group/sort keys — so the plan
skeleton (FilterableScan → Filter → HashJoin* → Group → Sort) matches what
the reference's Calcite planner produces for the original SQL.

Scale notes (100 TB discipline): all dim tables here are broadcast-sized
relative to the fact table; nation/region are broadcast explicitly, the
rest are left to Catalyst/AQE (supplier/part/customer auto-broadcast under
the threshold, shuffle-join above it). The fact-side filters (discount,
quantity, derived-date) sit directly on lineitem/orders columns so they
reach the parquet scan as PushedFilters before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysparkdb.queries import register
from pysparkdb.queries.base import bigint, dsum, tables


def DSUM(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


REVENUE = "l_extendedprice * (1 - l_discount)"
SUPPLYCOST = "l_quantity * p_retailprice * 0.5"

# Derived SSB dim fragments (oracle side).
_SUP_GEO = """
    (SELECT s_suppkey, n_name AS s_nation, r_name AS s_region,
            n_name || '_' || CAST(s_suppkey % 10 AS STRING) AS s_city
     FROM supplier
     JOIN nation ON s_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey) sup
"""
_CUST_GEO = """
    (SELECT c_custkey, n_name AS c_nation, r_name AS c_region,
            n_name || '_' || CAST(c_custkey % 10 AS STRING) AS c_city
     FROM customer
     JOIN nation ON c_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey) cus
"""
_FACT = """
    lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _d_year() -> F.Column:
    return bigint(F.year("o_orderdate"))


def _fact(t) -> DataFrame:
    """lineorder ≈ lineitem ⋈ orders (the SSB date join is the orders join:
    o_orderdate carries every derived date attribute)."""
    return t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))


def _sup_geo(t) -> DataFrame:
    """supplier + nation/region names + derived city (broadcast dims)."""
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            F.col("n_name").alias("s_nation"),
            F.col("r_name").alias("s_region"),
            F.concat(F.col("n_name"), F.lit("_"), (F.col("s_suppkey") % 10).cast("string")).alias("s_city"),
        )
    )


def _cust_geo(t) -> DataFrame:
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            F.col("n_name").alias("c_nation"),
            F.col("r_name").alias("c_region"),
            F.concat(F.col("n_name"), F.lit("_"), (F.col("c_custkey") % 10).cast("string")).alias("c_city"),
        )
    )


# --------------------------------------------------------------------------
# Flight 1 — restrict on date + discount + quantity, scalar revenue sum
# (reference 1.1–1.3: scan-heavy, one dim join; the pushdown showcase)
# --------------------------------------------------------------------------


@register(
    "ssb1_1",
    f"""
    SELECT {DSUM(f'l_extendedprice * l_discount')} AS revenue
    FROM {_FACT}
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      AND l_discount BETWEEN 0.01 AND 0.03
      AND l_quantity < 25
    """,
    "ssb", "aggregate", "filter", "join",
)
def ssb1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.1 (resources/query/ssb/original/1.1.sql): year + discount band
    + quantity cap → scalar revenue. d_year=1992 → 1996 (driver date range),
    integer discounts 1..3 → fractional 0.01..0.03."""
    t = tables(spark, sf_dir)
    return (
        _fact(t)
        .filter(
            (F.year("o_orderdate") == 1996)
            & F.col("l_discount").between(0.01, 0.03)
            & (F.col("l_quantity") < 25)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "ssb1_2",
    f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue
    FROM {_FACT}
    WHERE EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) = 199606
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity BETWEEN 26 AND 35
    """,
    "ssb", "aggregate", "filter", "join",
)
def ssb1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.2 (1.2.sql): d_yearmonthnum=199201 → derived yearmonthnum
    199606; tighter discount/quantity bands."""
    t = tables(spark, sf_dir)
    ym = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    return (
        _fact(t)
        .filter(
            (ym == 199606)
            & F.col("l_discount").between(0.04, 0.06)
            & F.col("l_quantity").between(26, 35)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "ssb1_3",
    f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue
    FROM {_FACT}
    WHERE WEEKOFYEAR(o_orderdate) = 6
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity BETWEEN 26 AND 35
    """,
    "ssb", "aggregate", "filter", "join",
)
def ssb1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.3 (1.3.sql): d_weeknuminyear=3 → ISO week 6 of 1996 (both
    engines use ISO-8601 week numbering)."""
    t = tables(spark, sf_dir)
    return (
        _fact(t)
        .filter(
            (F.weekofyear("o_orderdate") == 6)
            & (F.year("o_orderdate") == 1996)
            & F.col("l_discount").between(0.05, 0.07)
            & F.col("l_quantity").between(26, 35)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Flight 2 — part-category drilldown × supplier region, by (year, brand)
# --------------------------------------------------------------------------


def _flight2(spark: SparkSession, sf_dir: str, part_pred, region: str) -> DataFrame:
    t = tables(spark, sf_dir)
    p = t["part"].filter(part_pred).select("p_partkey", "p_brand")
    s = _sup_geo(t).filter(F.col("s_region") == region).select("s_suppkey")
    return (
        _fact(t)
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(_d_year().alias("d_year"), F.col("p_brand"))
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("d_year", "p_brand")
    )


def _flight2_sql(part_pred: str, region: str) -> str:
    return f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year, p_brand,
           {DSUM(REVENUE)} AS revenue
    FROM {_FACT}
    JOIN part ON l_partkey = p_partkey
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    WHERE {part_pred} AND sup.s_region = '{region}'
    GROUP BY d_year, p_brand
    ORDER BY d_year, p_brand
    """


@register("ssb2_1", _flight2_sql("p_type = 'PROMO'", "AMERICA"),
          "ssb", "group", "join", "sort")
def ssb2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.1 (2.1.sql): p_category='MFGR#12' → p_type='PROMO',
    s_region='AMERICA'; revenue by (year, brand)."""
    return _flight2(spark, sf_dir, F.col("p_type") == "PROMO", "AMERICA")


@register("ssb2_2", _flight2_sql("p_brand BETWEEN 'Brand#21' AND 'Brand#28'", "ASIA"),
          "ssb", "group", "join", "sort")
def ssb2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.2 (2.2.sql): brand range filter (string BETWEEN), s_region='ASIA'."""
    return _flight2(
        spark, sf_dir, F.col("p_brand").between("Brand#21", "Brand#28"), "ASIA"
    )


@register("ssb2_3", _flight2_sql("p_brand = 'Brand#22'", "EUROPE"),
          "ssb", "group", "join", "sort")
def ssb2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.3 (2.3.sql): single brand, s_region='EUROPE'."""
    return _flight2(spark, sf_dir, F.col("p_brand") == "Brand#22", "EUROPE")


# --------------------------------------------------------------------------
# Flight 3 — customer × supplier geography over a year range,
# ORDER BY year ASC, revenue DESC
# --------------------------------------------------------------------------


def _flight3(
    spark: SparkSession, sf_dir: str,
    cust_pred, sup_pred, date_pred,
    cust_key: str, sup_key: str,
) -> DataFrame:
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(cust_pred).select("c_custkey", cust_key)
    s = _sup_geo(t).filter(sup_pred).select("s_suppkey", sup_key)
    return (
        _fact(t)
        .filter(date_pred)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col(cust_key), F.col(sup_key), _d_year().alias("d_year"))
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("d_year").asc(), F.col("revenue").desc())
    )


def _flight3_sql(cust_pred: str, sup_pred: str, date_pred: str,
                 cust_key: str, sup_key: str) -> str:
    return f"""
    SELECT {cust_key}, {sup_key},
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
           {DSUM(REVENUE)} AS revenue
    FROM {_FACT}
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    WHERE {cust_pred} AND {sup_pred} AND {date_pred}
    GROUP BY {cust_key}, {sup_key}, d_year
    ORDER BY d_year ASC, revenue DESC
    """


@register(
    "ssb3_1",
    _flight3_sql("cus.c_region = 'ASIA'", "sup.s_region = 'ASIA'",
                 "EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1997",
                 "c_nation", "s_nation"),
    "ssb", "group", "join", "sort",
)
def ssb3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.1 (3.1.sql): intra-ASIA trade by (c_nation, s_nation, year),
    d_year 1992–1997 → 1995–1997."""
    return _flight3(
        spark, sf_dir,
        F.col("c_region") == "ASIA", F.col("s_region") == "ASIA",
        F.year("o_orderdate").between(1995, 1997),
        "c_nation", "s_nation",
    )


@register(
    "ssb3_2",
    _flight3_sql("cus.c_nation = 'NATION_7'", "sup.s_nation = 'NATION_12'",
                 "EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1997",
                 "c_city", "s_city"),
    "ssb", "group", "join", "sort",
)
def ssb3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.2 (3.2.sql): one customer nation × one supplier nation at city
    grain (derived city = nation || '_' || key%10)."""
    return _flight3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_7", F.col("s_nation") == "NATION_12",
        F.year("o_orderdate").between(1995, 1997),
        "c_city", "s_city",
    )


@register(
    "ssb3_3",
    _flight3_sql("cus.c_city IN ('NATION_13_8', 'NATION_23_2')",
                 "sup.s_city IN ('NATION_16_2', 'NATION_18_9')",
                 "EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1997",
                 "c_city", "s_city"),
    "ssb", "group", "join", "sort",
)
def ssb3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.3 (3.3.sql): two cities × two cities (IN-list dim filters)."""
    return _flight3(
        spark, sf_dir,
        F.col("c_city").isin("NATION_13_8", "NATION_23_2"),
        F.col("s_city").isin("NATION_16_2", "NATION_18_9"),
        F.year("o_orderdate").between(1995, 1997),
        "c_city", "s_city",
    )


@register(
    "ssb3_4",
    _flight3_sql("cus.c_city IN ('NATION_13_8', 'NATION_23_2')",
                 "sup.s_city IN ('NATION_16_2', 'NATION_18_9')",
                 "EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) = 199712",
                 "c_city", "s_city"),
    "ssb", "group", "join", "sort",
)
def ssb3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.4 (3.4.sql): same cities, one month (d_yearmonth → derived
    yearmonthnum 199712, the spec's Dec1997). City/month literals are chosen
    from the synthetic corpus's actual domain so the query is non-empty at
    sf0.01 AND sf0.1 (the spec's own literals name cities this corpus's
    100-supplier sf0.01 slice simply doesn't populate — an empty result
    would make the oracle row vacuous)."""
    ym = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    return _flight3(
        spark, sf_dir,
        F.col("c_city").isin("NATION_13_8", "NATION_23_2"),
        F.col("s_city").isin("NATION_16_2", "NATION_18_9"),
        ym == 199712,
        "c_city", "s_city",
    )


# --------------------------------------------------------------------------
# Flight 4 — profit (revenue − supplycost) over the full 5-table star
# --------------------------------------------------------------------------


def _flight4(
    spark: SparkSession, sf_dir: str,
    cust_pred, sup_pred, part_pred, date_pred,
    group_cols: list,
) -> DataFrame:
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(cust_pred).select("c_custkey", "c_nation")
    s = _sup_geo(t).filter(sup_pred).select("s_suppkey", "s_nation", "s_city")
    p = t["part"].filter(part_pred).select("p_partkey", "p_brand", "p_type", "p_retailprice")
    f = _fact(t) if date_pred is None else _fact(t).filter(date_pred)
    profit = _rev() - F.col("l_quantity") * F.col("p_retailprice") * 0.5
    return (
        f.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(_d_year().alias("d_year"), *[F.col(g) for g in group_cols])
        .agg(dsum(profit).alias("profit"))
        .orderBy("d_year", *group_cols)
    )


def _flight4_sql(cust_pred: str, sup_pred: str, part_pred: str,
                 date_pred: str | None, group_cols: str) -> str:
    where = f"{cust_pred} AND {sup_pred} AND {part_pred}"
    if date_pred:
        where += f" AND {date_pred}"
    return f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year, {group_cols},
           {DSUM(f'{REVENUE} - {SUPPLYCOST}')} AS profit
    FROM {_FACT}
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE {where}
    GROUP BY d_year, {group_cols}
    ORDER BY d_year, {group_cols}
    """


@register(
    "ssb4_1",
    _flight4_sql("cus.c_region = 'AMERICA'", "sup.s_region = 'AMERICA'",
                 "p_type IN ('PROMO', 'STANDARD')", None, "c_nation"),
    "ssb", "group", "join", "sort",
)
def ssb4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.1 (4.1.sql): profit by (year, customer nation), both regions
    AMERICA, two part manufacturers (→ p_type IN-list)."""
    return _flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_region") == "AMERICA",
        F.col("p_type").isin("PROMO", "STANDARD"), None,
        ["c_nation"],
    )


@register(
    "ssb4_2",
    _flight4_sql("cus.c_region = 'AMERICA'", "sup.s_region = 'AMERICA'",
                 "p_type IN ('PROMO', 'STANDARD')",
                 "EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)",
                 "s_nation, p_type"),
    "ssb", "group", "join", "sort",
)
def ssb4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.2 (4.2.sql): drill to (year, supplier nation, part category),
    two years."""
    return _flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_region") == "AMERICA",
        F.col("p_type").isin("PROMO", "STANDARD"),
        F.year("o_orderdate").isin(1995, 1996),
        ["s_nation", "p_type"],
    )


@register(
    "ssb4_3",
    _flight4_sql("cus.c_region = 'AMERICA'", "sup.s_nation = 'NATION_1'",
                 "p_type = 'ECONOMY'",
                 "EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)",
                 "s_city, p_brand"),
    "ssb", "group", "join", "sort",
)
def ssb4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.3 (4.3.sql): finest drill — (year, supplier city, brand),
    one supplier nation, one part category."""
    return _flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_nation") == "NATION_1",
        F.col("p_type") == "ECONOMY",
        F.year("o_orderdate").isin(1995, 1996),
        ["s_city", "p_brand"],
    )


# --------------------------------------------------------------------------
# Generated corpus (resources/query/ssb/generated/1.sql … 5.sql): machine-
# generated flight variants the reference ships alongside the originals —
# the distinguishing feature is month-granular grouping (d_yearmonthnum =
# year·100 + month) combined with flight-1-style fact predicates. Same
# schema mapping as above; reference years (1992/1993/1997) map into the
# driver date range (1995–2001) the way the original flights do.
# --------------------------------------------------------------------------

_D_YM = ("CAST(EXTRACT(YEAR FROM o_orderdate) * 100 "
         "+ EXTRACT(MONTH FROM o_orderdate) AS BIGINT)")


def _d_ym() -> F.Column:
    return bigint(F.year("o_orderdate") * 100 + F.month("o_orderdate"))


@register(
    "ssb_gen1",
    f"""
    SELECT {DSUM(REVENUE)} AS revenue, {_D_YM} AS d_yearmonthnum, p_brand
    FROM {_FACT}
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand BETWEEN 'Brand#21' AND 'Brand#27'
      AND sup.s_region = 'EUROPE'
      AND l_discount BETWEEN 0.01 AND 0.03
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
    GROUP BY d_yearmonthnum, p_brand
    ORDER BY d_yearmonthnum, p_brand
    """,
    "ssb", "generated", "group", "join", "sort",
)
def ssb_gen1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generated/1.sql: brand-range × EUROPE revenue by (yearmonth, brand)
    — flight 2 grouped at month grain with flight-1 discount/date fact
    predicates (brand range MFGR#2110–2117 → Brand#21–27, 1993 → 1996)."""
    t = tables(spark, sf_dir)
    s = _sup_geo(t).filter(F.col("s_region") == "EUROPE").select("s_suppkey")
    p = t["part"].filter(F.col("p_brand").between("Brand#21", "Brand#27")).select(
        "p_partkey", "p_brand"
    )
    return (
        _fact(t)
        .filter(
            F.col("l_discount").between(0.01, 0.03)
            & (F.year("o_orderdate") == 1996)
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(_d_ym().alias("d_yearmonthnum"), F.col("p_brand"))
        .agg(dsum(_rev()).alias("revenue"))
        .select("revenue", "d_yearmonthnum", "p_brand")
        .orderBy("d_yearmonthnum", "p_brand")
    )


@register(
    "ssb_gen2",
    f"""
    SELECT c_city, s_city, {_D_YM} AS d_yearmonthnum, {DSUM(REVENUE)} AS revenue
    FROM {_FACT}
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    WHERE cus.c_nation = 'NATION_5' AND sup.s_nation = 'NATION_5'
      AND l_quantity BETWEEN 16 AND 26
      AND EXTRACT(YEAR FROM o_orderdate) = 1995
    GROUP BY c_city, s_city, d_yearmonthnum
    ORDER BY d_yearmonthnum ASC, revenue DESC
    """,
    "ssb", "generated", "group", "join", "sort",
)
def ssb_gen2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generated/2.sql: same-nation (RUSSIA → NATION_5) city×city revenue
    at month grain with a quantity band (1992 → 1995)."""
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(F.col("c_nation") == "NATION_5").select("c_custkey", "c_city")
    s = _sup_geo(t).filter(F.col("s_nation") == "NATION_5").select("s_suppkey", "s_city")
    return (
        _fact(t)
        .filter(F.col("l_quantity").between(16, 26) & (F.year("o_orderdate") == 1995))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("c_city", "s_city", _d_ym().alias("d_yearmonthnum"))
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("d_yearmonthnum").asc(), F.col("revenue").desc())
    )


@register(
    "ssb_gen3",
    f"""
    SELECT {_D_YM} AS d_yearmonthnum, s_nation, p_type,
           {DSUM(f'{REVENUE} - {SUPPLYCOST}')} AS profit
    FROM {_FACT}
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE cus.c_region = 'MIDDLE EAST' AND sup.s_region = 'MIDDLE EAST'
      AND (p_type = 'ECONOMY' OR p_type = 'LARGE')
      AND l_discount BETWEEN 0.00 AND 0.02
      AND EXTRACT(YEAR FROM o_orderdate) = 1995
    GROUP BY d_yearmonthnum, s_nation, p_type
    ORDER BY d_yearmonthnum, s_nation, p_type
    """,
    "ssb", "generated", "group", "join", "sort",
)
def ssb_gen3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generated/3.sql: MIDDLE EAST × MIDDLE EAST profit by (yearmonth,
    nation, category) — flight 4's profit expression at month grain
    (p_mfgr IN (MFGR#2, MFGR#3) → p_type IN (ECONOMY, LARGE))."""
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(F.col("c_region") == "MIDDLE EAST").select("c_custkey")
    s = _sup_geo(t).filter(F.col("s_region") == "MIDDLE EAST").select(
        "s_suppkey", "s_nation"
    )
    p = t["part"].filter(F.col("p_type").isin("ECONOMY", "LARGE")).select(
        "p_partkey", "p_type", "p_retailprice"
    )
    profit = _rev() - F.col("l_quantity") * F.col("p_retailprice") * 0.5
    return (
        _fact(t)
        .filter(
            F.col("l_discount").between(0.00, 0.02) & (F.year("o_orderdate") == 1995)
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(_d_ym().alias("d_yearmonthnum"), F.col("s_nation"), F.col("p_type"))
        .agg(dsum(profit).alias("profit"))
        .orderBy("d_yearmonthnum", "s_nation", "p_type")
    )


@register(
    "ssb_gen4",
    f"""
    SELECT {DSUM(REVENUE)} AS revenue, {_D_YM} AS d_yearmonthnum, p_brand
    FROM {_FACT}
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#2'
      AND sup.s_region = 'ASIA'
      AND l_quantity BETWEEN 17 AND 27
      AND EXTRACT(YEAR FROM o_orderdate) = 1997
    GROUP BY d_yearmonthnum, p_brand
    ORDER BY d_yearmonthnum, p_brand
    """,
    "ssb", "generated", "group", "join", "sort",
)
def ssb_gen4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generated/4.sql: single brand (MFGR#5120 → Brand#2) × ASIA at
    month grain with a quantity band (1997 stays 1997 — in range)."""
    t = tables(spark, sf_dir)
    s = _sup_geo(t).filter(F.col("s_region") == "ASIA").select("s_suppkey")
    p = t["part"].filter(F.col("p_brand") == "Brand#2").select("p_partkey", "p_brand")
    return (
        _fact(t)
        .filter(F.col("l_quantity").between(17, 27) & (F.year("o_orderdate") == 1997))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(_d_ym().alias("d_yearmonthnum"), F.col("p_brand"))
        .agg(dsum(_rev()).alias("revenue"))
        .select("revenue", "d_yearmonthnum", "p_brand")
        .orderBy("d_yearmonthnum", "p_brand")
    )


@register(
    "ssb_gen5",
    f"""
    SELECT c_city, s_city, {_D_YM} AS d_yearmonthnum, {DSUM(REVENUE)} AS revenue
    FROM {_FACT}
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    WHERE cus.c_city IN ('NATION_23_2', 'NATION_18_6')
      AND sup.s_city IN ('NATION_6_9', 'NATION_19_5')
      AND l_quantity BETWEEN 12 AND 22
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
    GROUP BY c_city, s_city, d_yearmonthnum
    ORDER BY d_yearmonthnum ASC, revenue DESC
    """,
    "ssb", "generated", "group", "join", "sort",
)
def ssb_gen5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generated/5.sql: two cities × two cities (UNITED ST3/ST6 → two
    2-city IN-sets chosen non-empty in the driver data, per side like
    ssb3_3) at month grain with a quantity band
    (1993 → 1996)."""
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(F.col("c_city").isin("NATION_23_2", "NATION_18_6")).select(
        "c_custkey", "c_city"
    )
    s = _sup_geo(t).filter(F.col("s_city").isin("NATION_6_9", "NATION_19_5")).select(
        "s_suppkey", "s_city"
    )
    return (
        _fact(t)
        .filter(F.col("l_quantity").between(12, 22) & (F.year("o_orderdate") == 1996))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("c_city", "s_city", _d_ym().alias("d_yearmonthnum"))
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("d_yearmonthnum").asc(), F.col("revenue").desc())
    )
