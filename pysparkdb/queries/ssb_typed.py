"""SSB *typed/* query corpus — the reference's explicit-cast variants.

The reference ships three SSB corpora; ``typed/`` (resources/query/ssb/
typed/1.1.sql … 4.3.sql) is the original 13 flights rewritten with explicit
``CAST(col AS int)`` on every measure — the form the reference runs against
its all-string CSV schema, where arithmetic only works after a declared
cast (fpdb-calcite validates the casts; the C++ executor then runs integer
Gandiva kernels instead of float ones). Two observable differences from
``original/``:

1. **integer arithmetic** — measures are cast to int BEFORE the arithmetic,
   so every aggregate is an exact integer sum (associative, bit-stable),
   not a float sum;
2. **declared join order** — flights 2–4 of the typed files list
   ``"date"`` FIRST in the FROM clause (original/ lists the fact table
   first), i.e. the date dim drives the declared join tree; flight 1 is
   the exception (typed/1.1.sql opens ``from lineorder, "date"``, fact
   first, like original/).

This module re-expresses both properties on the driver's schema mapping
(see queries/ssb.py for the full lineorder→lineitem⋈orders mapping):
measures become fixed-point BIGINTs — extendedprice in cents, discount in
whole percent points, revenue/supplycost floored to whole currency units —
so every sum is a BIGINT sum, bit-identical across Spark and DuckDB with no
DECIMAL trick needed; and the DataFrame composition starts from ``orders``
(the date surrogate) exactly as the typed FROM order declares. Catalyst
reorders the physical join tree either way (as Calcite does for the
reference), so the declared order is a semantics-preserving provenance
marker, not a perf hazard.

Cast discipline notes (engine-parity):
- ``ROUND(x*100, 0)`` then cast: l_extendedprice/l_discount carry ≤2
  decimals, so x*100 is within 1e-9 of an integer — both engines round to
  the same integer (never a .5 tie).
- ``FLOOR`` before BIGINT cast for derived revenue/supplycost: Spark CAST
  truncates doubles while DuckDB CAST rounds, so the cast itself is NOT
  portable — FLOOR is IEEE-exact in both and makes it so.
- Sums wrapped ``CAST(SUM(..) AS BIGINT)`` (DuckDB widens SUM(BIGINT) to
  HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysparkdb.queries import register
from pysparkdb.queries.base import bigint, tables
from pysparkdb.queries.ssb import _CUST_GEO, _SUP_GEO, _cust_geo, _sup_geo

# Fixed-point integer measures (SQL side).
EXT_I = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
DISC_I = "CAST(ROUND(l_discount * 100, 0) AS BIGINT)"
QTY_I = "CAST(ROUND(l_quantity, 0) AS BIGINT)"
REV_I = "CAST(FLOOR(l_extendedprice * (1 - l_discount)) AS BIGINT)"
COST_I = "CAST(FLOOR(l_quantity * p_retailprice * 0.5) AS BIGINT)"

# Typed join order: "date" (orders) first — the declared order of
# typed/2.x-4.x's FROM clauses. Flight 1 is the reference's own
# exception (typed/1.1.sql opens `from lineorder, "date"`, fact first);
# this corpus declares orders-first UNIFORMLY, so for ssb_t1_* the
# provenance marker is the flights-2-4 convention, not flight 1's
# literal FROM order (results are unaffected — Catalyst reorders).
_FACT_T = """
    orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def ISUM(x: str) -> str:
    return f"CAST(SUM({x}) AS BIGINT)"


def _ext_i() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100, 0).cast("long")


def _disc_i() -> F.Column:
    return F.round(F.col("l_discount") * 100, 0).cast("long")


def _qty_i() -> F.Column:
    return F.round(F.col("l_quantity"), 0).cast("long")


def _rev_i() -> F.Column:
    return F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("long")


def _cost_i() -> F.Column:
    return F.floor(F.col("l_quantity") * F.col("p_retailprice") * 0.5).cast("long")


def _d_year() -> F.Column:
    return bigint(F.year("o_orderdate"))


def _fact_t(t) -> DataFrame:
    """Typed FROM order: the date surrogate (orders) leads the join tree."""
    return t["orders"].join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))


# --------------------------------------------------------------------------
# Flight 1 — typed/1.1–1.3: cast-to-int measures, integer discount band
# --------------------------------------------------------------------------


def _t_flight1(spark, sf_dir, date_pred, disc_lo, disc_hi, qty_pred) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        _fact_t(t)
        .filter(date_pred & _disc_i().between(disc_lo, disc_hi) & qty_pred)
        .agg(bigint(F.sum(_ext_i() * _disc_i())).alias("revenue"))
    )


@register(
    "ssb_t1_1",
    f"""
    SELECT {ISUM(f'{EXT_I} * {DISC_I}')} AS revenue
    FROM {_FACT_T}
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      AND {DISC_I} BETWEEN 1 AND 3
      AND {QTY_I} < 25
    """,
    "ssb", "typed", "aggregate", "filter", "join",
)
def ssb_t1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q1.1 (resources/query/ssb/typed/1.1.sql): the explicit-cast
    form of 1.1 — sum(cast(extprice as int) * cast(discount as int)) with
    the integer discount band 1..3 (percent points), exact BIGINT result."""
    return _t_flight1(
        spark, sf_dir,
        F.year("o_orderdate") == 1996, 1, 3, _qty_i() < 25,
    )


@register(
    "ssb_t1_2",
    f"""
    SELECT {ISUM(f'{EXT_I} * {DISC_I}')} AS revenue
    FROM {_FACT_T}
    WHERE EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) = 199606
      AND {DISC_I} BETWEEN 4 AND 6
      AND {QTY_I} BETWEEN 26 AND 35
    """,
    "ssb", "typed", "aggregate", "filter", "join",
)
def ssb_t1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q1.2 (typed/1.2.sql): yearmonthnum 199201 → 199606,
    integer bands 4..6 / 26..35."""
    ym = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    return _t_flight1(
        spark, sf_dir,
        ym == 199606, 4, 6, _qty_i().between(26, 35),
    )


@register(
    "ssb_t1_3",
    f"""
    SELECT {ISUM(f'{EXT_I} * {DISC_I}')} AS revenue
    FROM {_FACT_T}
    WHERE WEEKOFYEAR(o_orderdate) = 6
      AND EXTRACT(YEAR FROM o_orderdate) = 1996
      AND {DISC_I} BETWEEN 5 AND 7
      AND {QTY_I} BETWEEN 26 AND 35
    """,
    "ssb", "typed", "aggregate", "filter", "join",
)
def ssb_t1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q1.3 (typed/1.3.sql): week 3 of 1992 → ISO week 6 of 1996,
    integer bands 5..7 / 26..35."""
    return _t_flight1(
        spark, sf_dir,
        (F.weekofyear("o_orderdate") == 6) & (F.year("o_orderdate") == 1996),
        5, 7, _qty_i().between(26, 35),
    )


# --------------------------------------------------------------------------
# Flight 2 — typed/2.1–2.3: sum(cast(lo_revenue as int)) by (year, brand)
# --------------------------------------------------------------------------


def _t_flight2(spark, sf_dir, part_pred, region: str) -> DataFrame:
    t = tables(spark, sf_dir)
    p = t["part"].filter(part_pred).select("p_partkey", "p_brand")
    s = _sup_geo(t).filter(F.col("s_region") == region).select("s_suppkey")
    return (
        _fact_t(t)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(_d_year().alias("d_year"), F.col("p_brand"))
        .agg(bigint(F.sum(_rev_i())).alias("revenue"))
        .orderBy("d_year", "p_brand")
    )


def _t_flight2_sql(part_pred: str, region: str) -> str:
    return f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year, p_brand,
           {ISUM(REV_I)} AS revenue
    FROM {_FACT_T}
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE {part_pred} AND sup.s_region = '{region}'
    GROUP BY d_year, p_brand
    ORDER BY d_year, p_brand
    """


@register("ssb_t2_1", _t_flight2_sql("p_type = 'PROMO'", "AMERICA"),
          "ssb", "typed", "group", "join", "sort")
def ssb_t2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q2.1 (typed/2.1.sql): integer revenue by (year, brand),
    category MFGR#12 → p_type='PROMO', supplier region AMERICA."""
    return _t_flight2(spark, sf_dir, F.col("p_type") == "PROMO", "AMERICA")


@register("ssb_t2_2",
          _t_flight2_sql("p_brand BETWEEN 'Brand#21' AND 'Brand#28'", "ASIA"),
          "ssb", "typed", "group", "join", "sort")
def ssb_t2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q2.2 (typed/2.2.sql): brand range, supplier region ASIA."""
    return _t_flight2(
        spark, sf_dir, F.col("p_brand").between("Brand#21", "Brand#28"), "ASIA"
    )


@register("ssb_t2_3", _t_flight2_sql("p_brand = 'Brand#22'", "EUROPE"),
          "ssb", "typed", "group", "join", "sort")
def ssb_t2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q2.3 (typed/2.3.sql): single brand, supplier region
    EUROPE."""
    return _t_flight2(spark, sf_dir, F.col("p_brand") == "Brand#22", "EUROPE")


# --------------------------------------------------------------------------
# Flight 3 — typed/3.1–3.4: integer revenue by geography over a year range
# --------------------------------------------------------------------------


def _t_flight3(spark, sf_dir, cust_pred, sup_pred, date_pred,
               cust_key: str, sup_key: str) -> DataFrame:
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(cust_pred).select("c_custkey", cust_key)
    s = _sup_geo(t).filter(sup_pred).select("s_suppkey", sup_key)
    return (
        _fact_t(t)
        .filter(date_pred)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col(cust_key), F.col(sup_key), _d_year().alias("d_year"))
        .agg(bigint(F.sum(_rev_i())).alias("revenue"))
        .orderBy(F.col("d_year").asc(), F.col("revenue").desc())
    )


def _t_flight3_sql(cust_pred: str, sup_pred: str, date_pred: str,
                   cust_key: str, sup_key: str) -> str:
    return f"""
    SELECT {cust_key}, {sup_key},
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year,
           {ISUM(REV_I)} AS revenue
    FROM {_FACT_T}
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    WHERE {cust_pred} AND {sup_pred} AND {date_pred}
    GROUP BY {cust_key}, {sup_key}, d_year
    ORDER BY d_year ASC, revenue DESC
    """


@register(
    "ssb_t3_1",
    _t_flight3_sql("cus.c_region = 'ASIA'", "sup.s_region = 'ASIA'",
                   "EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1997",
                   "c_nation", "s_nation"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q3.1 (typed/3.1.sql): intra-ASIA trade, integer revenue."""
    return _t_flight3(
        spark, sf_dir,
        F.col("c_region") == "ASIA", F.col("s_region") == "ASIA",
        F.year("o_orderdate").between(1995, 1997),
        "c_nation", "s_nation",
    )


@register(
    "ssb_t3_2",
    _t_flight3_sql("cus.c_nation = 'NATION_7'", "sup.s_nation = 'NATION_12'",
                   "EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1997",
                   "c_city", "s_city"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q3.2 (typed/3.2.sql): CHINA × UNITED STATES → NATION_7 ×
    NATION_12 at city grain."""
    return _t_flight3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_7", F.col("s_nation") == "NATION_12",
        F.year("o_orderdate").between(1995, 1997),
        "c_city", "s_city",
    )


@register(
    "ssb_t3_3",
    _t_flight3_sql("cus.c_city IN ('NATION_13_8', 'NATION_23_2')",
                   "sup.s_city IN ('NATION_16_2', 'NATION_18_9')",
                   "EXTRACT(YEAR FROM o_orderdate) BETWEEN 1995 AND 1997",
                   "c_city", "s_city"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q3.3 (typed/3.3.sql): two cities × two cities."""
    return _t_flight3(
        spark, sf_dir,
        F.col("c_city").isin("NATION_13_8", "NATION_23_2"),
        F.col("s_city").isin("NATION_16_2", "NATION_18_9"),
        F.year("o_orderdate").between(1995, 1997),
        "c_city", "s_city",
    )


@register(
    "ssb_t3_4",
    _t_flight3_sql("cus.c_city IN ('NATION_13_8', 'NATION_23_2')",
                   "sup.s_city IN ('NATION_16_2', 'NATION_18_9')",
                   "EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) = 199712",
                   "c_city", "s_city"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q3.4 (typed/3.4.sql): same cities, one month
    (d_yearmonth → 199712, the spec's Dec1997; literals picked from the
    corpus's populated city domain so the result is non-empty at
    sf0.01/sf0.1 — see ssb3_4)."""
    ym = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    return _t_flight3(
        spark, sf_dir,
        F.col("c_city").isin("NATION_13_8", "NATION_23_2"),
        F.col("s_city").isin("NATION_16_2", "NATION_18_9"),
        ym == 199712,
        "c_city", "s_city",
    )


# --------------------------------------------------------------------------
# Flight 4 — typed/4.1–4.3: integer profit (revenue − supplycost) over the
# full 5-table star
# --------------------------------------------------------------------------


def _t_flight4(spark, sf_dir, cust_pred, sup_pred, part_pred, date_pred,
               group_cols: list) -> DataFrame:
    t = tables(spark, sf_dir)
    c = _cust_geo(t).filter(cust_pred).select("c_custkey", "c_nation")
    s = _sup_geo(t).filter(sup_pred).select("s_suppkey", "s_nation", "s_city")
    p = t["part"].filter(part_pred).select(
        "p_partkey", "p_brand", "p_type", "p_retailprice"
    )
    f = _fact_t(t) if date_pred is None else _fact_t(t).filter(date_pred)
    return (
        f.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(_d_year().alias("d_year"), *[F.col(g) for g in group_cols])
        .agg(bigint(F.sum(_rev_i() - _cost_i())).alias("profit"))
        .orderBy("d_year", *group_cols)
    )


def _t_flight4_sql(cust_pred: str, sup_pred: str, part_pred: str,
                   date_pred: str | None, group_cols: str) -> str:
    where = f"{cust_pred} AND {sup_pred} AND {part_pred}"
    if date_pred:
        where += f" AND {date_pred}"
    return f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS d_year, {group_cols},
           {ISUM(f'{REV_I} - {COST_I}')} AS profit
    FROM {_FACT_T}
    JOIN {_SUP_GEO} ON l_suppkey = sup.s_suppkey
    JOIN {_CUST_GEO} ON o_custkey = cus.c_custkey
    JOIN part ON l_partkey = p_partkey
    WHERE {where}
    GROUP BY d_year, {group_cols}
    ORDER BY d_year, {group_cols}
    """


@register(
    "ssb_t4_1",
    _t_flight4_sql("cus.c_region = 'AMERICA'", "sup.s_region = 'AMERICA'",
                   "p_type IN ('PROMO', 'STANDARD')", None, "c_nation"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q4.1 (typed/4.1.sql): integer profit by (year, customer
    nation), both regions AMERICA, two manufacturers → p_type IN-list."""
    return _t_flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_region") == "AMERICA",
        F.col("p_type").isin("PROMO", "STANDARD"), None,
        ["c_nation"],
    )


@register(
    "ssb_t4_2",
    _t_flight4_sql("cus.c_region = 'AMERICA'", "sup.s_region = 'AMERICA'",
                   "p_type IN ('PROMO', 'STANDARD')",
                   "EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)",
                   "s_nation, p_type"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q4.2 (typed/4.2.sql): (year, supplier nation, category),
    years 1992/1993 → 1995/1996."""
    return _t_flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_region") == "AMERICA",
        F.col("p_type").isin("PROMO", "STANDARD"),
        F.year("o_orderdate").isin(1995, 1996),
        ["s_nation", "p_type"],
    )


@register(
    "ssb_t4_3",
    _t_flight4_sql("cus.c_region = 'AMERICA'", "sup.s_nation = 'NATION_1'",
                   "p_type = 'ECONOMY'",
                   "EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)",
                   "s_city, p_brand"),
    "ssb", "typed", "group", "join", "sort",
)
def ssb_t4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB typed Q4.3 (typed/4.3.sql): finest drill — (year, supplier city,
    brand), one supplier nation, one category."""
    return _t_flight4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_nation") == "NATION_1",
        F.col("p_type") == "ECONOMY",
        F.year("o_orderdate").isin(1995, 1996),
        ["s_city", "p_brand"],
    )
