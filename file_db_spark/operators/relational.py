"""Relational operator inventory (SURVEY.md §2) mapped onto the driver
testdata tables. Each query has a Spark implementation and a DuckDB
oracle; column names are aliased identically on both sides.

Numeric-parity convention: the money-ish testdata columns are true
2-decimal values stored as double, so each input is cast to
DECIMAL(12,2) FIRST (tie-free: the double sits ~1e-11 from the 2-dp
value, so Spark's HALF_UP and DuckDB's rounding agree), all products
are computed in exact decimal arithmetic (scale grows 2→4→6, precision
stays ≤38 on both engines), SUMs are exact, and only the final
aggregate is cast back to DOUBLE. Casting a double *product* to
decimal instead is NOT parity-safe: the engines disagree on ties when
the scaled double lands exactly on x.5 (observed in round 1 at the 4th
decimal of sum_charge). AVG is expressed as exact-decimal-sum / count.

Scale notes are per-query in docstrings; overall: dims (region, nation,
supplier, part, customer) are broadcast; fact-fact joins shuffle on
their keys with AQE handling skew; all filters/projections are plain
Column exprs so they push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.paths import sql_path_parse_wildcard_search
from ..localframe import local_df

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _d2(col):
    """Exact decimal view of a true-2-decimal double column (see module
    docstring: tie-free on both engines)."""
    return col.cast("decimal(12,2)")


def _dsum(dec_col):
    """Exact, order-independent sum of an exact-decimal column, returned
    as DOUBLE (the final double cast of identical decimals is identical
    on both engines)."""
    return F.sum(dec_col).cast("double")


# ---------------------------------------------------------------------------
# A1 group-by multi-agg — flagship (dir_detail analog, TPC-H Q1 shape)
# reference: dir_detail FileDbDAL/SQLUtil.py:269-286
# ---------------------------------------------------------------------------
@_q(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: multi-aggregate group-by (the dir_detail pattern,
    FileDbDAL/SQLUtil.py:269-286). Partial aggregation map-side, single
    shuffle on a 6-value grouping key — scale-safe at any SF."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
    charge = disc_price * (1 + _d2(F.col("l_tax")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_d2(F.col("l_quantity"))).alias("sum_qty"),
            _dsum(_d2(F.col("l_extendedprice"))).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(_d2(F.col("l_quantity"))) / F.count("*")).alias("avg_qty"),
            (_dsum(_d2(F.col("l_discount"))) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P3 LIKE filter with OS-wildcard rewrite (FileDbDAL/Search.py:71-122)
# ---------------------------------------------------------------------------
@_q(
    "p3_like_filter",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part WHERE p_name LIKE '%widget%'
    """,
)
def p3_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: user wildcard '*widget*' rewritten to SQL LIKE by the F8
    parser (FileDbDAL/SQLUtil.py:177-197). Predicate pushes into scan."""
    pat = sql_path_parse_wildcard_search("*widget*")
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(pat))
        .select("p_partkey", "p_name", "p_brand")
    )


@_q(
    "p4_ilike_filter",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment ILIKE 'furn%'
    """,
)
def p4_ilike_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: case-insensitive LIKE (API/Schedule.py:34-44)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").ilike("furn%"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@_q(
    "p5_prefix_filter",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
    GROUP BY o_orderpriority
    """,
)
def p5_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: prefix/subtree predicate (startswith ≡ dir_path LIKE 'p%',
    FileDbDAL/Directory.py:222-224). startswith compiles to a sargable
    StartsWith pushed filter — at scale it prunes row groups."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").startswith("1")
            | F.col("o_orderpriority").startswith("2")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@_q(
    "p6_selectivity_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag IN ('A', 'R')
    """,
)
def p6_selectivity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: size + IN-list filter (DuplicateImageBrowser.py:33-43)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45) & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
@_q(
    "j1_broadcast_equi_join",
    """
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j1_broadcast_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the core equi-join chain (file⋈directory analog,
    FileDbDAL/SQLUtil.py:230-235). customer is a dim -> explicit
    broadcast; lineitem⋈orders shuffles on orderkey with AQE.

    Partial aggregation is pushed BELOW the join (Catalyst doesn't do
    this rewrite itself): lineitem pre-aggregates per orderkey, so the
    orderkey shuffle carries one row per order instead of one per line
    (~4x less at TPC-H shape — measured 20% faster at sf0.1, and the
    ratio grows with fan-out at 100 TB). Partials stay exact decimal;
    the double cast happens once at the end, so the result is
    bit-identical to the unrewritten form."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
    part = li.groupBy("l_orderkey").agg(
        F.sum(rev).alias("rev_o"), F.count("*").alias("nl_o")
    )
    return (
        part.join(o, part.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("rev_o").cast("double").alias("revenue"),
            F.sum("nl_o").alias("n_lines"),
        )
    )


@_q(
    "j2_left_outer_join",
    """
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def j2_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join preserving unmatched left rows (file⟕hash,
    FileDbDAL/SQLUtil.py:235-237)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _dsum(_d2(F.coalesce(F.col("o_totalprice"), F.lit(0.0)))).alias("total_spent"),
        )
    )


@_q(
    "j3_derived_key_join",
    """
    WITH keyed AS (
      SELECT p_partkey, p_retailprice, split_part(p_name, ' ', 1) AS name_key FROM part
    ), dim AS (
      SELECT DISTINCT split_part(p_name, ' ', 1) AS name_key FROM part
    )
    SELECT d.name_key, COUNT(*) AS n_parts,
           CAST(SUM(CAST(k.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM keyed k JOIN dim d ON k.name_key = d.name_key
    GROUP BY d.name_key
    """,
)
def j3_derived_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: join on a computed key (fc.extension = extension(f.name),
    FileDbDAL/SQLUtil.py:264-265) — materialize the derived key as a
    column first so it is a plain equi-join (SURVEY §4 O1)."""
    p = load_table(spark, sf_dir, "part")
    keyed = p.withColumn("name_key", F.split(F.col("p_name"), " ").getItem(0))
    dim = keyed.select("name_key").distinct()
    return (
        keyed.join(F.broadcast(dim), "name_key")
        .groupBy("name_key")
        .agg(
            F.count("*").alias("n_parts"),
            _dsum(_d2(F.col("p_retailprice"))).alias("total_price"),
        )
    )


@_q(
    "j4_self_join",
    """
    SELECT a.n_regionkey, a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def j4_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: self-join on a shared key (directory parent self-join,
    FileDbDAL/SQLUtil.py:242-247)."""
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_regionkey").alias("n_regionkey"),
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
        )
    )


@_q(
    "j6_disjunctive_join",
    """
    SELECT DISTINCT c.c_custkey, s.s_suppkey
    FROM customer c JOIN supplier s
      ON c.c_nationkey = s.s_nationkey OR CAST(floor(c.c_acctbal) AS BIGINT) = CAST(floor(s.s_acctbal) AS BIGINT)
    """,
)
def j6_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: disjunctive (OR) join decomposed into a union of equi-joins
    (FileDbDAL/Search.py:262-293). Spark would execute the OR predicate
    as a BroadcastNestedLoopJoin; the union-of-equi-joins rewrite is the
    scale-safe plan (SURVEY §4: OR-join decomposition). Derived key uses
    floor(), identical on both engines — Spark cast(double as int)
    truncates toward zero while DuckDB's rounds, so a raw cast key
    diverges on the two sides (round-1 j6 failure)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    by_nation = c.join(s, c.c_nationkey == s.s_nationkey).select("c_custkey", "s_suppkey")
    by_bal = c.join(
        s, F.floor(c.c_acctbal) == F.floor(s.s_acctbal)
    ).select("c_custkey", "s_suppkey")
    return by_nation.unionByName(by_bal).distinct()


@_q(
    "j7_array_probe_join",
    """
    SELECT t.pk, p.p_name, p.p_retailprice
    FROM (SELECT UNNEST([3, 7, 11, 19, 42, 97]) AS pk) t
    JOIN part p ON p.p_partkey = t.pk
    """,
)
def j7_array_probe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: unnest(array) probe join (search_full_path,
    FileDbDAL/Search.py:125-154). The probe list is tiny -> broadcast;
    for large probe sets this becomes a shuffle join automatically."""
    p = load_table(spark, sf_dir, "part")
    probes = local_df(spark, [(k,) for k in (3, 7, 11, 19, 42, 97)], "pk bigint")
    return (
        p.join(F.broadcast(probes), p.p_partkey == probes.pk)
        .select("pk", "p_name", "p_retailprice")
    )


@_q(
    "j13_salted_join",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY l.l_returnflag
    """,
)
def j13_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join — the manual skew playbook: the fact side gets a
    random-ish salt (deterministic here: pmod(xxhash64(orderkey,line),
    SALT) so the oracle matches), the dim side is replicated SALT ways,
    and the join key becomes (key, salt), splitting a hot key's rows
    across SALT reducers. Results are identical to the plain join (the
    oracle IS the plain join). Use when a single key dominates beyond
    what AQE skew-split handles (AQE splits partitions, not one giant
    key-group in a shuffle hash join at 100 TB)."""
    SALT = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT))
    )
    s = load_table(spark, sf_dir, "supplier")
    salts = spark.range(SALT).select(F.col("id").cast("bigint").alias("salt"))
    s_rep = s.crossJoin(F.broadcast(salts))
    return (
        li.join(
            s_rep,
            (li.l_suppkey == s_rep.s_suppkey) & (li.salt == s_rep.salt),
        )
        .groupBy("l_returnflag")
        .agg(
            _dsum(_d2(F.col("l_quantity"))).alias("sum_qty"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "j8_anti_join",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1998-01-01'
    )
    """,
)
def j8_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: anti-join = snapshot-diff deletions (NOT EXISTS,
    FileDbDAL/DirectoryCrawl.py:816-833): entities present in the
    catalog but absent from the newest snapshot (here: customers with
    no order since 1998 — every customer has SOME order in the synthetic
    data, so the unfiltered variant returns 0 rows and proves nothing)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "j9_semi_join",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate > TIMESTAMP '2000-01-01'
    )
    """,
)
def j9_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10-claim analog as a pure semi-join (EXISTS)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# ---------------------------------------------------------------------------
# Aggregations / distinct
# ---------------------------------------------------------------------------
@_q(
    "a3_minmax_activity",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
    FROM orders GROUP BY o_custkey
    """,
)
def a3_minmax_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: min/max activity rollup (vwf_directory_activity,
    FileDbDAL/SQLUtil.py:360-383)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@_q(
    "a5_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def a5_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: DISTINCT (select distinct unnest, FileDbDAL/Directory.py:210-212)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@_q(
    "a6_rollup_totals",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a6_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals: per (returnflag, linestatus), per returnflag,
    and grand total in one pass — the OLAP subtotal operator (Spark
    `rollup` == SQL GROUP BY ROLLUP), with grouping flags to
    disambiguate subtotal rows.

    Scale: Spark expands rollup into a grouping-set union over ONE
    shuffle of the (tiny) grouping key space with map-side partials —
    no extra corpus passes per subtotal level."""
    lt = load_table(spark, sf_dir, "lineitem")
    return (
        lt.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n_items",
            "sum_qty",
        )
    )


@_q(
    "a8_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(CAST(sy AS VARCHAR), 'ALL') AS ship_year,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(sy) AS INT) AS g_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM (SELECT l_returnflag, year(l_shipdate) AS sy, l_extendedprice
          FROM lineitem)
    GROUP BY CUBE (l_returnflag, sy)
    """,
)
def a8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (engine addition): full CUBE over (returnflag, ship year) —
    every subtotal combination plus the grand total in one pass, with
    grouping flags disambiguating "NULL because subtotal" from data
    NULLs (the a6 ROLLUP's bigger sibling; the reference has no
    grouping-set operator at all). Revenue goes through DECIMAL so
    every subtotal level is order-independent and engine-exact.

    Scale: Spark compiles cube() to ONE expand + one shuffle on the
    tiny grouping-key space with map-side partial aggregation — the
    corpus is read once for all four grouping sets, never once per
    level."""
    lt = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    return (
        lt.cube("l_returnflag", "ship_year")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("ship_year").cast("int").alias("g_year"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("ship_year").cast("string"), F.lit("ALL")).alias(
                "ship_year"
            ),
            "g_flag",
            "g_year",
            "n_items",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# A9-A12 multi-way join analytics (engine additions, TPC-H Q3/Q5/Q18/Q10
# shapes on the simplified testdata schema) — the join-breadth the
# reference's single-table catalog never exercises: dim-filtered 3-way
# fact joins, a 6-way join with a cross-dimension equality, and a
# HAVING-derived semi-join. Revenue math follows the module's exact-
# decimal parity convention throughout.
# ---------------------------------------------------------------------------
_REV_SQL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(12,2))))"
)


def _rev_col():
    return _dsum(_d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount"))))


@_q(
    "a9_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def a9_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (engine addition, TPC-H Q3 shape): unshipped-order revenue
    priority — segment-filtered customers ⋈ pre-cutoff orders ⋈
    post-cutoff lineitems, revenue per order, top 10.

    Scale: both filters push into their scans before any join; the
    filtered customer side is dim-sized → broadcast into orders, and
    the surviving orders shuffle-join lineitem on l_orderkey — the
    same key the groupBy then reuses, so AQE coalesces the agg into
    the join's exchange. orderBy+limit compiles to
    TakeOrderedAndProject (no global sort); unique l_orderkey
    tiebreak keeps the LIMIT deterministic cross-engine."""
    cutoff = F.lit("1996-03-15").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@_q(
    "a10_local_supplier_volume",
    f"""
    SELECT n.n_name,
           CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
)
def a10_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (engine addition, TPC-H Q5 shape): local-supplier revenue
    by nation — the classic 6-way join whose defining twist is the
    CROSS-dimension equality s_nationkey = c_nationkey (supplier and
    customer must share a nation), which no single join key carries.

    Scale: region⋈nation⋈customer collapses dim-side first (region
    and nation broadcast into customer), the year filter pushes into
    the orders scan, and the two fact joins shuffle on o_custkey then
    l_orderkey. Supplier is dim-sized → broadcast into the fact flow,
    where the s_nationkey=c_nationkey equality rides along as a
    broadcast-join residual condition instead of forcing another
    shuffle. Final agg groups on a |nations|-sized key — map-side
    partial, one tiny exchange."""
    r = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(_rev_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@_q(
    "a11_large_volume_customer",
    """
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
)
def a11_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 (engine addition, TPC-H Q18 shape): large-volume customers
    — orders whose total lineitem quantity exceeds a threshold, joined
    back to customer detail; the HAVING-subquery-as-semi-join pattern.

    Scale: the qualifying-order set is ONE map-side-combined aggregate
    over lineitem with the HAVING applied before any join; its output
    is a tiny key list → broadcast LEFT SEMI into orders, so the big
    three-way join only ever runs on qualifying orders. The second
    lineitem aggregate then runs on that pruned slice. No window, no
    correlated re-scan — lineitem is read exactly twice (once to
    qualify, once to total the survivors)."""
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d2(F.col("l_quantity"))).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        F.broadcast(qualifying),
        F.col("o_orderkey") == qualifying.l_orderkey,
        "left_semi",
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(_d2(F.col("l_quantity"))).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@_q(
    "a12_returned_item_report",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def a12_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (engine addition, TPC-H Q10 shape): lost-revenue report —
    customers who returned items in a quarter, ranked by the revenue
    of their returned lineitems.

    Scale: the returnflag filter pushes into the lineitem scan and the
    quarter filter into orders, both before the o_orderkey shuffle
    join; customer joins on the already-aggregation-bound o_custkey
    and nation broadcasts into the result. Top-20 via
    TakeOrderedAndProject with the unique c_custkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_rev_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
    )


@_q(
    "a13_decorrelated_min",
    """
    SELECT p.p_partkey, p.p_name, l.l_suppkey, l.l_orderkey,
           l.l_extendedprice AS min_price
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 40
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def a13_decorrelated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 (engine addition, TPC-H Q2's min-per-group shape):
    cheapest offer per part — the correlated-scalar-subquery pattern.
    The ORACLE deliberately keeps the correlated form (what a user
    coming from the reference's SQL habits would write); the Spark
    plan is the decorrelated one you actually want at 100 TB: a window
    MIN over l_partkey plus a filter — ONE shuffle over lineitem
    instead of a per-row re-scan, identical semantics including ties
    (every lineitem at the minimum survives, exactly like the
    correlated predicate).

    Scale: the window partitions on l_partkey (same exchange the part
    join can reuse); part is dim-sized → broadcast, and its p_size
    filter prunes the probe side before the join. No correlated
    execution anywhere in the physical plan."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    cheapest = li.withColumn("min_price", F.min("l_extendedprice").over(w)).filter(
        F.col("l_extendedprice") == F.col("min_price")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return cheapest.join(F.broadcast(p), cheapest.l_partkey == p.p_partkey).select(
        "p_partkey", "p_name", "l_suppkey", "l_orderkey", "min_price"
    )


@_q(
    "a14_priority_backlog",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def a14_priority_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 (engine addition, TPC-H Q4's EXISTS shape): orders per
    priority that had at least one line ship >45 days after the order
    date. The oracle keeps the correlated EXISTS a reference-SQL user
    would write; the Spark plan is its decorrelation — a LEFT SEMI
    join on the order key with the date comparison riding as a
    residual, then one small groupBy. Semi-join semantics give the
    EXISTS contract for free: multiple matching lines count the order
    once, no DISTINCT needed.

    Scale: the date-range filter pushes into the orders scan before
    the join; the semi join shuffles on the same orderkey both fact
    tables are naturally keyed by, and its output carries ONLY order
    columns (no lineitem fan-out ever materializes). The groupBy
    input is pre-shrunk to qualifying orders — map-side partials over
    ~5 priority values."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@_q(
    "a15_waiting_supplier",
    """
    WITH l AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM l l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (
        SELECT 1 FROM l l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM l l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.late
      )
    GROUP BY s.s_name
    """,
)
def a15_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 (engine addition, TPC-H Q21's double-correlation shape):
    suppliers who were the SOLE late shipper on a multi-supplier
    order. The oracle keeps the textbook form — an EXISTS (another
    supplier on the order) AND a NOT EXISTS (another LATE supplier on
    the order) both correlated to the probe row. Executed literally
    that is two extra passes over lineitem per probe row; the Spark
    plan decorrelates BOTH into one window pass: per order,
    n_supp = |distinct suppliers| and n_late_supp = |distinct late
    suppliers| (collect_set ignores the NULL the `late` guard leaves,
    so the late set is exact) — then a late row qualifies iff
    n_supp >= 2 (the EXISTS) and n_late_supp == 1 (the NOT EXISTS:
    the probe row itself is late, so a singleton late-set is exactly
    'no OTHER late supplier'). Proven identical semantics, including
    a supplier appearing on multiple lines of the same order.

    Scale: orders⋈lineitem is one equi-shuffle on the order key and
    the window partitions on THE SAME key — AQE reuses the exchange,
    so the whole correlation resolves in a single shuffle of the fact
    table. Order groups are tiny (lineitems per order), so the
    collect_set state is bounded; supplier is dim-sized → broadcast
    at the very end, after the fact side has been filtered to sole
    late shippers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = lines.select(
        "*",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    sole_late = flagged.where(
        F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@_q(
    "a16_dormant_accounts",
    """
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    t AS (SELECT SUM(cents) // COUNT(*) AS thr FROM c WHERE cents > 0)
    SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
           CAST(SUM(c.cents) AS DOUBLE) / 100 AS totacctbal
    FROM c, t
    WHERE c.cents > t.thr
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def a16_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 (engine addition, TPC-H Q22's shape): dormant high-balance
    accounts — customers above the average positive balance with NO
    orders since 2000, summarized per nation. The oracle keeps both textbook
    constructs: a scalar subquery in the predicate and a correlated
    NOT EXISTS. The Spark plan decorrelates both: the threshold is a
    1-row aggregate broadcast back (the d19 scalar pattern), the NOT
    EXISTS a LEFT ANTI join on the customer key. Balances go through
    exact integer cents with an integer-division (DIV / //) threshold,
    so the boundary comparison can never flip on a 1-ulp float-mean
    disagreement between engines.

    Scale: customer scans once for the threshold (map-side partials to
    ONE row) and once for the probe; the anti join shuffles on the
    same customer key orders is naturally keyed by. No correlated
    re-execution anywhere in the physical plan."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    thr = (
        c.where(F.col("cents") > 0)
        .agg(F.expr("sum(cents) DIV count(*)").alias("thr"))
    )
    cand = c.crossJoin(F.broadcast(thr)).where(F.col("cents") > F.col("thr"))
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    dormant = cand.join(o, cand.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        (F.sum("cents").cast("double") / F.lit(100)).alias("totacctbal"),
    ).select(
        F.col("c_nationkey").alias("nationkey"), "numcust", "totacctbal"
    )


# ---------------------------------------------------------------------------
# Round-6 TPC-H completion set. With the derived-partsupp family
# (a24-a28) and a29 (Q6), ALL 22 query shapes now have an a-entry:
# Q1=a1 Q2=a13 Q3=a9 Q4=a14 Q5=a10 Q6=a29 Q7=a21 Q8=a22 Q9=a24 Q10=a12
# Q11=a25 Q12=a28 Q13=a19 Q14=a23 Q15=a18 Q16=a26 Q17=a17 Q18=a11
# Q19=a20 Q20=a27 Q21=a15 Q22=a16.
# ---------------------------------------------------------------------------
@_q(
    "a17_small_qty_revenue",
    """
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 10
      AND 5 * CAST(l.l_quantity AS BIGINT)
            * (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
          < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    """,
)
def a17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 (engine addition, TPC-H Q17's shape): revenue lost to
    small-quantity orders — lines whose quantity is below 20%% of the
    part's average order quantity. The oracle keeps the textbook
    correlated-AVG-per-part scalar subquery (twice: count and sum);
    the Spark plan decorrelates it into ONE window pass over
    l_partkey. The 0.2x-average boundary is evaluated in pure integer
    arithmetic (qty*5*count < sum over integral quantities), so the
    comparison can never flip on a float-mean ulp disagreement
    between engines — the a16 integer-threshold discipline.

    Scale: one shuffle of lineitem on l_partkey serves both correlated
    subqueries at once; part is dim-sized -> broadcast with its size
    filter pruning before the join; the final groupBy runs over the
    heavily-filtered small-qty rows with map-side partials across
    ~25 brands."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    w = Window.partitionBy("l_partkey")
    flagged = li.select(
        "*",
        F.sum("qty").over(w).alias("part_qty"),
        F.count("*").over(w).alias("part_cnt"),
    )
    small = flagged.where(
        F.lit(5) * F.col("qty") * F.col("part_cnt") < F.col("part_qty")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    return (
        small.join(F.broadcast(p), small.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            (_dsum(_d2(F.col("l_extendedprice"))) / F.lit(7)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "a18_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def a18_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18 (engine addition, TPC-H Q15's shape): the supplier(s) with
    the maximum quarterly revenue. The oracle keeps the textbook view
    + scalar MAX subquery; the Spark plan aggregates once, broadcasts
    the 1-row MAX back (the d19/a16 scalar pattern) and keeps every
    tie — revenue totals are exact decimal sums, so the equality can
    never straddle a float ulp.

    Scale: ONE shuffle of the date-pruned lineitem to per-supplier
    totals (map-side partials over ~|suppliers| keys); the MAX reduces
    the tiny aggregate to one broadcast row; supplier is dim-sized ->
    broadcast join at the end. No global sort, no second pass over the
    fact table."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))).alias(
            "total_rev"
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    best = rev.crossJoin(F.broadcast(top)).where(
        F.col("total_rev") == F.col("max_rev")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(F.broadcast(s), best.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
    )


@_q(
    "a19_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority NOT LIKE '1%'
      GROUP BY c.c_custkey
    ) t GROUP BY c_count
    """,
)
def a19_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19 (engine addition, TPC-H Q13's shape): the distribution of
    customers by how many non-urgent orders they placed — the outer
    join must PRESERVE zero-order customers (they form the c_count=0
    bucket, the bucket an inner join silently drops). The non-equi
    residual (the priority filter) rides the join condition, not a
    WHERE, exactly like the textbook form — filtering after the join
    would turn matched-but-filtered customers into false zeros.

    Scale: one shuffle of orders on o_custkey against customer; the
    double aggregation collapses fast (|customers| keys, then
    |distinct counts| keys, both with map-side partials). At 100 TB
    customers with no orders survive as join misses — no spine or
    driver-side fill-in needed."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (o.o_custkey == c.c_custkey)
        & ~o.o_orderpriority.startswith("1"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q(
    "a20_bracket_revenue",
    """
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand
    """,
)
def a20_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 (engine addition, TPC-H Q19's shape): revenue under a
    disjunction of brand/size/quantity brackets that mixes columns
    from BOTH join sides. The classic execution trap is evaluating the
    OR as a filter after a full join; the right plan extracts the
    common equi-key (p_partkey = l_partkey) for the hash join and
    DERIVES the implied single-side prefilters from the disjunction —
    part pruned to the three brands at max size span, lineitem pruned
    to the quantity hull [1, 30] — before the join, leaving the exact
    OR as a cheap post-join residual. Catalyst does the extraction;
    the hull prefilters are stated explicitly so they push into the
    parquet scans (constraint propagation across an OR is not free).

    Scale: the lineitem scan reads only qty-hull rows; part is
    dim-sized -> broadcast, so the only data movement is the pruned
    fact scan itself; groupBy over 3 brands is map-side collapsed."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)  # hull of the three brackets
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#2", "Brand#4", "Brand#19")
        & F.col("p_size").between(1, 15)
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#2")
         & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#4")
           & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#19")
           & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        j.where(bracket)
        .groupBy("p_brand")
        .agg(
            _dsum(
                _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "a21_volume_shipping",
    """
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n2.n_name = 'NATION_1' AND n1.n_name = 'NATION_2')
        OR (n2.n_name = 'NATION_2' AND n1.n_name = 'NATION_1'))
    GROUP BY n2.n_name, n1.n_name, year(l.l_shipdate)
    """,
)
def a21_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21 (engine addition, TPC-H Q7's shape): shipping volume
    between a nation PAIR in either direction. The disjunctive
    nation-pair predicate can't prune either side alone to one
    nation, but its HULL can: both the supplier side and the customer
    side are pre-pruned to the two named nations (broadcast semi
    through the 2-row nation slice), shrinking the fact rows long
    before the cross-side OR is testable; the exact pair residual
    then only has to discard the two same-nation combinations.

    Scale: ONE fact-fact shuffle (lineitem ⋈ orders on the order
    key); customer joins on o_custkey pre-pruned to ~2/25ths of
    customers; supplier/nation are dim-sized broadcasts. Year
    extraction is a codegen expr; the final groupBy has 2x2xYEARS
    keys — map-side collapsed."""
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        _dsum(
            _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
        ).alias("revenue")
    )


@_q(
    "a22_market_share",
    """
    SELECT year(o.o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                                   * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                           AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY year(o.o_orderdate)
    """,
)
def a22_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22 (engine addition, TPC-H Q8's shape): one nation's share of
    PROMO-part revenue sold into a region, per year — the conditional-
    aggregate-ratio pattern. Both the numerator (CASE-gated) and the
    denominator are EXACT decimal sums normalized to one scale before
    the final double division, so the ratio is bit-identical across
    engines without any rounding smoothing.

    Scale: the region/nation/part/supplier dims all broadcast, with
    the part p_type filter pruning lineitem through the join and the
    region filter pruning the customer side; the only fact-fact
    shuffle is lineitem ⋈ orders on the order key. The CASE keeps the
    share computation in ONE aggregation pass — no second scan, no
    self-join of per-nation aggregates."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = (
        _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
    ).cast("decimal(18,4)")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return j.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@_q(
    "a23_promo_share",
    """
    SELECT month(l.l_shipdate) AS l_month,
           CAST(100 AS DOUBLE)
           * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                                     * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                                     AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                           AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY month(l.l_shipdate)
    """,
)
def a23_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23 (engine addition, TPC-H Q14's shape): the monthly share of
    revenue from promotional parts — the same conditional-ratio
    discipline as a22 (exact same-scale decimal sums, one final
    double division), over the simplest possible join.

    Scale: part broadcasts; the date filter pushes into the lineitem
    scan; one aggregation pass with 12 groups, map-side collapsed."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = (
        _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.month("l_shipdate").alias("l_month"), vol.alias("volume"), "p_type")
        .groupBy("l_month")
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# a24-a28: the partsupp-family TPC-H shapes (Q9/Q11/Q16/Q20/Q12). The
# testdata ships no partsupp table, so the engine DERIVES one: the
# distinct (l_partkey, l_suppkey) pairs of lineitem, with ps_availqty
# and ps_supplycost as pure integer functions of the pair key. Both
# engines compute the identical derivation (the oracle CTE below is
# shared by every a24-a28 oracle), and because the attributes are
# functions of the join key, the Spark plans may INLINE them wherever
# the textbook plan would pay a partsupp join — a projection instead
# of a shuffle. Q12's l_shipmode / l_commitdate / l_receiptdate are
# derived the same way (integer functions of the line key).
# ---------------------------------------------------------------------------

#: shared derived-partsupp CTE body (see above) — integer-only attrs so
#: no float boundary can flip between engines (the a16 discipline).
_PARTSUPP_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         1 + (l_partkey * 37 + l_suppkey * 17) % 9999 AS ps_availqty,
         10 + (l_partkey * 131 + l_suppkey * 59) % 990 AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) dp
)
"""


def _ps_availqty(pk, sk):
    """ps_availqty as a pure Column function of the pair key."""
    return F.lit(1) + (pk * F.lit(37) + sk * F.lit(17)) % F.lit(9999)


def _ps_supplycost(pk, sk):
    """ps_supplycost (integer dollars) as a pure Column function."""
    return F.lit(10) + (pk * F.lit(131) + sk * F.lit(59)) % F.lit(990)


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp dimension: one distinct-pair shuffle over
    lineitem. At 100 TB this is a build-once materialized dimension
    (the distinct is the same shuffle a real partsupp ETL would pay);
    queries that only need the attributes inline them instead."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")
    return pairs.select(
        pk.alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        _ps_availqty(pk, sk).alias("ps_availqty"),
        _ps_supplycost(pk, sk).alias("ps_supplycost"),
    )


@_q(
    "a24_product_profit",
    f"""
    WITH {_PARTSUPP_CTE.strip()}
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                         AS DECIMAL(18,4))
                    - CAST(ps.ps_supplycost * CAST(l.l_quantity AS BIGINT)
                           AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def a24_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24 (engine addition, TPC-H Q9's shape): per-nation, per-year
    profit on a part-name family — revenue minus supply cost. The
    oracle pays the textbook partsupp join; the Spark plan exploits
    the derived dimension's key-determinism and INLINES ps_supplycost
    as a projection on lineitem, deleting the 4th join entirely.
    Profit stays in exact same-scale decimals until the final double
    cast (the a22 discipline).

    Scale: part/supplier/nation broadcast (part's name filter prunes
    lineitem through the join); the only fact-fact shuffle is
    lineitem ⋈ orders on the order key; ~nations×years groups
    collapse map-side. The textbook plan's partsupp shuffle join —
    the largest join in Q9 — costs zero here."""
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    vol = (
        _d2(F.col("l_extendedprice")) * (1 - _d2(F.col("l_discount")))
    ).cast("decimal(18,4)")
    cost = (
        _ps_supplycost(F.col("l_partkey"), F.col("l_suppkey"))
        * F.col("l_quantity").cast("bigint")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("nation", F.year("o_orderdate").alias("o_year"),
                (vol - cost).alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@_q(
    "a25_important_stock",
    f"""
    WITH {_PARTSUPP_CTE.strip()},
    german AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
                   AND n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value
    FROM german
    GROUP BY ps_partkey
    HAVING SUM(v) * 10000 > (SELECT SUM(v) FROM german)
    """,
)
def a25_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25 (engine addition, TPC-H Q11's shape): parts whose stock
    value at one nation's suppliers exceeds a fraction of that
    nation's total stock value. The oracle keeps the textbook
    HAVING-scalar-subquery; Spark computes the per-part values ONCE,
    derives the grand total from those SAME partials, and applies the
    threshold via a broadcast one-row cross join (the a16 idiom). The
    0.0001 fraction is applied as `value * 10000 > total` — all
    integer arithmetic on integer-dollar supply costs, so the
    boundary can never flip on a float ulp.

    Scale: partsupp here is genuinely a table (the sum ranges over
    pairs, not lineitems), built by one distinct shuffle; the
    supplier/nation filter broadcasts into it; one groupBy on
    ps_partkey with map-side partials; the total re-aggregates the
    ~|parts| partials, not the pairs. No second scan of anything."""
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    german = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = german.groupBy("ps_partkey").agg(F.sum("v").alias("value"))
    total = per_part.agg(F.sum("value").alias("grand"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") * F.lit(10000) > F.col("grand"))
        .select("ps_partkey", "value")
    )


@_q(
    "a26_supplier_cnt",
    f"""
    WITH {_PARTSUPP_CTE.strip()}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def a26_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26 (engine addition, TPC-H Q16's shape): how many suppliers
    can furnish each surviving (brand, type, size) bucket, excluding
    blacklisted suppliers. The testdata's supplier has no s_comment,
    so the 'Customer Complaints' blacklist becomes the negative-
    balance suppliers — same NOT-IN-subquery shape. Spark decorrelates
    the NOT IN into a broadcast LEFT ANTI join (safe here: s_suppkey
    is never NULL, so NOT IN == anti).

    Scale: part's three filters broadcast into the derived-pair
    table; the blacklist is a handful of rows — broadcast anti; the
    COUNT(DISTINCT) shuffles once on the group key with partial
    distinct aggregation. Nothing touches lineitem twice."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = _partsupp(spark, sf_dir)
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@_q(
    "a27_excess_stock",
    f"""
    WITH {_PARTSUPP_CTE.strip()}
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_3'
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      WHERE ps.ps_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      AND 2 * ps.ps_availqty > (
        SELECT SUM(CAST(l.l_quantity AS BIGINT))
        FROM lineitem l
        WHERE l.l_partkey = ps.ps_partkey
          AND l.l_suppkey = ps.ps_suppkey
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
      )
    )
    """,
)
def a27_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27 (engine addition, TPC-H Q20's shape): suppliers in one
    nation holding excess stock (availqty above half a year's
    shipments) of a part-name family. The oracle keeps the doubly-
    nested correlated form; Spark runs it forward: ONE filtered
    aggregation of lineitem on the (part, supp) pair key, availqty
    inlined from the pair key (the derived dimension is key-
    determined, so the partsupp probe join vanishes), `2*availqty >
    sum_qty` in pure integers, then two broadcast hops (part-family
    semi, supplier dim). Pairs with no shipments in the window drop
    out of the inner join exactly as the correlated NULL comparison
    drops them.

    Scale: the pair aggregation is the only shuffle and it runs on
    the date-pruned scan; everything downstream is broadcast-sized
    (qualifying pairs << lineitem). The textbook plan's partsupp
    scan + correlated per-pair subquery become one pass."""
    pfam = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(pfam), li.l_partkey == pfam.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
    )
    excess = shipped.where(
        F.lit(2) * _ps_availqty(F.col("l_partkey"), F.col("l_suppkey"))
        > F.col("sum_qty")
    ).select(F.col("l_suppkey").alias("ps_suppkey")).distinct()
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return sup.join(
        F.broadcast(excess),
        sup.s_suppkey == F.col("ps_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")


#: Q12's derived line-shipping attributes, as SQL expressions over a
#: lineitem alias — integer functions of the line key, mirrored by the
#: Column builders below.
_A28_MODE = (
    "CASE (l.l_orderkey + l.l_linenumber) % 7 "
    "WHEN 0 THEN 'AIR' WHEN 1 THEN 'AIR REG' WHEN 2 THEN 'FOB' "
    "WHEN 3 THEN 'MAIL' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'SHIP' "
    "ELSE 'TRUCK' END"
)
_A28_COMMIT_OFF = "(l.l_orderkey * 7 + l.l_linenumber * 13) % 60 - 30"
_A28_RECEIPT_OFF = "(l.l_orderkey * 11 + l.l_linenumber * 5) % 45 - 10"


@_q(
    "a28_shipmode_priority",
    f"""
    SELECT shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT {_A28_MODE} AS shipmode,
             {_A28_COMMIT_OFF} AS commit_off,
             {_A28_RECEIPT_OFF} AS receipt_off,
             l.l_shipdate, l.l_orderkey
      FROM lineitem l
    ) d
    JOIN orders o ON o.o_orderkey = d.l_orderkey
    WHERE shipmode IN ('MAIL', 'SHIP')
      AND commit_off > 0
      AND commit_off < receipt_off
      AND year(l_shipdate + INTERVAL (receipt_off) DAY) = 1997
    GROUP BY shipmode
    """,
)
def a28_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A28 (engine addition, TPC-H Q12's shape): late-line counts by
    ship mode and order priority. The testdata carries no shipmode /
    commitdate / receiptdate, so all three are DERIVED as integer
    functions of the line key (mode = key mod 7 over the 7 TPC-H
    modes; commit/receipt as signed day offsets from the ship date) —
    identically in both engines. The late-arrival predicates
    (`shipdate < commitdate < receiptdate`) compare the integer
    offsets directly; only the receipt-year filter touches real date
    arithmetic, via whole-day adds on midnight timestamps (no DST
    surface).

    Scale: the mode/offset predicates are a pure projection+filter on
    the lineitem scan (~2/7 of lines survive the mode filter before
    any join); the one shuffle is lineitem ⋈ orders on the order key;
    two groups, map-side collapsed."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("bigint")
    mode = (
        F.element_at(
            F.array(*[F.lit(m) for m in (
                "AIR", "AIR REG", "FOB", "MAIL", "RAIL", "SHIP", "TRUCK"
            )]),
            ((ok + ln) % 7 + 1).cast("int"),
        )
    )
    commit_off = (ok * 7 + ln * 13) % 60 - 30
    receipt_off = (ok * 11 + ln * 5) % 45 - 10
    d = li.select(
        "l_orderkey",
        mode.alias("shipmode"),
        commit_off.alias("commit_off"),
        receipt_off.alias("receipt_off"),
        "l_shipdate",
    ).where(
        F.col("shipmode").isin("MAIL", "SHIP")
        & (F.col("commit_off") > 0)
        & (F.col("commit_off") < F.col("receipt_off"))
        & (
            F.year(
                F.date_add(F.col("l_shipdate"), F.col("receipt_off").cast("int"))
            )
            == 1997
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        d.join(o, d.l_orderkey == o.o_orderkey)
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@_q(
    "a29_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND CAST(l_discount AS DECIMAL(12,2))
          BETWEEN CAST('0.05' AS DECIMAL(12,2)) AND CAST('0.07' AS DECIMAL(12,2))
      AND CAST(l_quantity AS DECIMAL(12,2)) < 24
    """,
)
def a29_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A29 (engine addition, TPC-H Q6's shape): forecast-revenue-change
    — one filter-aggregate, no join, no group key. The discount
    band compares exact decimals (never a float boundary), the sum is
    exact decimal until the final double cast. Completes the full
    22-query TPC-H shape set (a1, a9-a29 + the a13 Q2 form).

    Scale: the canonical scan-dominated query — all three predicates
    push into the parquet scan (shipdate min/max prunes row groups),
    the aggregate is one map-side combine into a single row; no
    shuffle of any data row at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & _d2(F.col("l_discount")).between(
                F.expr("CAST('0.05' AS DECIMAL(12,2))"),
                F.expr("CAST('0.07' AS DECIMAL(12,2))"),
            )
            & (_d2(F.col("l_quantity")) < 24)
        )
        .agg(
            F.sum(_d2(F.col("l_extendedprice")) * _d2(F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Sorts / top-k
# ---------------------------------------------------------------------------
@_q(
    "t1_topk_priority",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def t1_topk_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: global top-k claim ordering (get_dirs_to_crawl,
    FileDbDAL/DirectoryCrawl.py:656-669). orderBy+limit compiles to
    TakeOrderedAndProject — no global sort at scale. Unique-key
    tiebreak keeps the result deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@_q(
    "t2_topk_smallest",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
)
def t2_topk_smallest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: smallest-first work queue (hash smallest files first,
    FileDbDAL/DirectoryCrawl.py:705-718)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy(
            F.col("l_quantity").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@_q(
    "t3_fifo_batch",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def t3_fifo_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: FIFO batch drain — oldest-first LIMIT batch (the removal
    queues' ORDER BY inserted_on LIMIT 10000,
    FileDbDAL/DirectoryCrawl.py:1120-1125)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@_q(
    "t4_sanitized_order_by",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def t4_sanitized_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: hostile user sort input -> sql_sanitize_order_by
    (API/Util.py:60-90) -> Column sorts. The injection attempt and the
    unknown/odd tokens are dropped; only the valid (column, direction)
    survives, and the engine appends a unique-key tiebreak so the
    LIMIT is deterministic. No SQL text is ever built from user input.
    """
    from ..functions.paths import sql_sanitize_order_by

    orders = load_table(spark, sf_dir, "orders")
    user_input = (
        "o_totalprice desc, o_orderkey; drop table orders, nosuch asc, "
        "o_orderdate sideways"
    )
    sanitized = sql_sanitize_order_by(user_input, orders.columns)
    assert sanitized == [("o_totalprice", "desc")]
    sorts = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in sanitized
    ]
    return (
        orders.orderBy(*sorts, F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@_q(
    "t5_display_cap",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_partkey ASC
    LIMIT 50
    """,
)
def t5_display_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: the CLI's 50-row display cap (CLI/__init__.py:150-152) as a
    deterministic ordered LIMIT."""
    return (
        load_table(spark, sf_dir, "part")
        .orderBy(F.col("p_partkey").asc())
        .limit(50)
        .select("p_partkey", "p_name", "p_retailprice")
    )


@_q(
    "u3_null_safe_switch",
    """
    SELECT 'requested' AS branch, n_nationkey, n_name
    FROM nation WHERE n_nationkey IN (1, 3, 5)
    UNION ALL
    SELECT 'all' AS branch, n_nationkey, n_name FROM nation
    """,
)
def u3_null_safe_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: the 'requested set, or everything when the argument is null'
    input switch (crawl_frequency_last_ctime_calculate,
    FileDbDAL/SQLUtil.py:467-480). In Spark the branch is a plain
    Python conditional choosing the DataFrame — both branches shown
    here, labeled, so the oracle can verify each."""

    def switch(keys):
        n = load_table(spark, sf_dir, "nation")
        return n.where(F.col("n_nationkey").isin(*keys)) if keys else n

    requested = switch([1, 3, 5]).select(
        F.lit("requested").alias("branch"), "n_nationkey", "n_name"
    )
    everything = switch(None).select(
        F.lit("all").alias("branch"), "n_nationkey", "n_name"
    )
    return requested.unionByName(everything)


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@_q(
    "u1_union_all_listing",
    """
    SELECT 'customer' AS type, c_custkey AS key, c_name AS name, c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier' AS type, s_suppkey AS key, s_name AS name, s_acctbal AS acctbal
    FROM supplier
    """,
)
def u1_union_all_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL two entity tables into one listing (vw_ll files+dirs,
    FileDbDAL/SQLUtil.py:223-248)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("type"),
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("type"),
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@_q(
    "u2_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: UNION with dedup (FileDbDAL/Directory.py:298-307)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@_q(
    "u4_unpivot",
    """
    WITH base AS (
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric, sum_qty AS value
    FROM base
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM base
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'n_items', n_items FROM base
    """,
)
def u4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 (engine addition): wide→long reshape — the UNPIVOT / melt
    surface, the inverse of e12's pivot. Spark's native
    `DataFrame.unpivot` (Expand physical node: one pass over the
    already-aggregated base, no re-scan, no union of N selects); the
    oracle spells it as the portable UNION ALL a reference-SQL user
    would write. Money sums route through DECIMAL on both engines
    (the cross-engine double-sum rule) and surface as exact doubles.

    Scale: the Expand multiplies only the POST-aggregation rows
    (|groups| × |metrics|), never the fact table; the one shuffle is
    the 6-key groupBy with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return base.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_price", "n_items"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# Window functions (reference §2.5: planned idiomatic replacements)
# ---------------------------------------------------------------------------
@_q(
    "w1_window_rownum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def w1_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: row_number pagination (the TODO at API/Schedule.py:33).
    Per-key top-N via window — one shuffle on the partition key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
    )


@_q(
    "w2_window_dupcount",
    """
    SELECT l_orderkey, l_linenumber, lines_in_order FROM (
      SELECT l_orderkey, l_linenumber,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS lines_in_order
      FROM lineitem
    ) WHERE lines_in_order >= 6
    """,
)
def w2_window_dupcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/J5 idiom: tag duplicate groups with count() over partition in
    one pass instead of a self-join (SURVEY §2.5)."""
    w = Window.partitionBy("l_orderkey")
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("lines_in_order", F.count("*").over(w))
        .filter(F.col("lines_in_order") >= 6)
        .select("l_orderkey", "l_linenumber", "lines_in_order")
    )


# ---------------------------------------------------------------------------
# Scalar path library exercised through SQL-parity expressions (F1-F3, F7)
# ---------------------------------------------------------------------------
@_q(
    "f1_path_scalars",
    r"""
    WITH paths AS (
      SELECT doc_id, '/data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.TXT' AS full_path
      FROM documents
    )
    SELECT doc_id, full_path,
           regexp_replace(full_path, '[/\\][^/\\]+$', '') AS parent_dir,
           regexp_replace(full_path, '^.+[/\\]', '') AS base_name,
           lower(regexp_replace(full_path, '^.+\.', '')) AS ext
    FROM paths
    """,
)
def f1_path_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3: basepath/basename/extension as native regex Columns
    (FileDbDAL/SQLUtil.py:14-61). Paths synthesized from documents rows
    (testdata has no path column). DuckDB's RE2 lacks lookbehind, so the
    oracle uses the lookbehind-free equivalent — identical output for
    depth>=2 paths like these."""
    from ..functions.paths import basename, basepath, extension

    d = load_table(spark, sf_dir, "documents")
    paths = d.select(
        "doc_id",
        F.concat(
            F.lit("/data/"),
            F.col("source"),
            F.lit("/doc_"),
            F.col("doc_id").cast("string"),
            F.lit(".TXT"),
        ).alias("full_path"),
    )
    return paths.select(
        "doc_id",
        "full_path",
        basepath("full_path").alias("parent_dir"),
        basename("full_path").alias("base_name"),
        extension("full_path").alias("ext"),
    )


@_q(
    "w3_window_suite",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w3_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 breadth: the full analytic-window surface beyond w1/w2 —
    lag/lead, ntile quartiles, percent_rank, cume_dist, and a running
    ROWS-frame sum, all over one (customer, order-date) window.

    Determinism: the window orders by (o_orderdate, o_orderkey) — a
    total order — so lag/lead/ntile are reproducible, and
    percent_rank/cume_dist are exact rational divisions. The running
    sum is DECIMAL-FIRST (then cast to double): a raw double windowed
    sum is association-order-sensitive and engines may evaluate
    cumulative frames via segment trees, so only exact decimal partials
    guarantee bit-identical results (the a1 lesson applied to windows).

    Scale: ONE shuffle on o_custkey serves every window function
    (identical partitioning + ordering -> a single WindowExec); frames
    are ROWS-bounded so state is O(1) per row."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("bigint").alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(wrun)
        .cast("double")
        .alias("running_spend"),
    )


@_q(
    "f2_sql_surface",
    r"""
    WITH paths AS (
      SELECT doc_id,
             '/data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.TXT' AS full_path
      FROM documents
    )
    SELECT doc_id, full_path,
           regexp_replace(full_path, '[/\\][^/\\]+$', '') AS parent_dir,
           regexp_replace(full_path, '^.+[/\\]', '') AS base_name,
           lower(regexp_replace(full_path, '^.+\.', '')) AS ext,
           regexp_replace(full_path, '[/\\][^/\\]+$', '') || '\' ||
             regexp_replace(full_path, '^.+[/\\]', '') AS rejoined,
           regexp_replace(trim(full_path || '///'), '([^:])?[\\|/]+$', '\1') AS stripped,
           CAST(doc_id AS DOUBLE) / 1000.0 AS size_from_kb,
           CAST(doc_id AS DOUBLE) * 1024.0 AS disp_gb,
           least(greatest(CAST(doc_id AS DOUBLE), 100.0), 400.0) AS clamped
    FROM paths
    """,
)
def f2_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 SQL-callable surface: the same F1-F7/F12 scalars as
    f1_path_scalars, but invoked THROUGH the registered Spark SQL-body
    functions (functions/sqlsurface.py) from a plain SQL string — the
    PL/pgSQL-parity call path. Catalyst inlines SQL-body functions, so
    this plan is identical to the Column-expression form (no Python
    UDF anywhere); the DuckDB oracle mirrors the expressions inline
    (RE2 has no lookbehind — equivalent form for depth>=2 paths)."""
    from ..catalog import load_table as _lt
    from ..functions.sqlsurface import register_sql_functions

    register_sql_functions(spark)
    _lt(spark, sf_dir, "documents").createOrReplaceTempView("__fdb_docs")
    return spark.sql(
        r"""
        WITH paths AS (
          SELECT doc_id,
                 concat('/data/', source, '/doc_', CAST(doc_id AS STRING), '.TXT') AS full_path
          FROM __fdb_docs
        )
        SELECT doc_id, full_path,
               fdb_basepath(full_path) AS parent_dir,
               fdb_basename(full_path) AS base_name,
               fdb_extension(full_path) AS ext,
               fdb_path_join(fdb_basepath(full_path), fdb_basename(full_path)) AS rejoined,
               fdb_strip_trailing_slashes(concat(full_path, '///')) AS stripped,
               fdb_kb(CAST(doc_id AS DOUBLE)) AS size_from_kb,
               fdb_to_gb(CAST(doc_id AS DOUBLE)) AS disp_gb,
               fdb_clamp(CAST(doc_id AS DOUBLE), 100.0, 400.0) AS clamped
        FROM paths
        """
    )


# ---------------------------------------------------------------------------
# a7: JOIN-KEY SKEW PROFILER — the diagnostic that decides when a join
# needs j13's salting (or AQE skew splitting). Profiles a key column's
# distribution: global shape stats plus the top heavy hitters with
# their row share — the number an engineer (or an auto-tuner) compares
# against the per-task row budget before picking a join strategy.
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


@_q(
    "a7_skew_profile",
    f"""
    WITH keyed AS (
      SELECT l_suppkey AS k, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_suppkey
    ), stats AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST(MIN(cnt) AS BIGINT) AS min_cnt
      FROM keyed
    ), top AS (
      SELECT k, cnt, rank FROM (
        SELECT k, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, k ASC) AS BIGINT) AS rank
        FROM keyed
      ) WHERE rank <= {SKEW_TOP_K}
    )
    SELECT 'summary' AS part, CAST(NULL AS BIGINT) AS k,
           n_rows, n_keys, max_cnt AS cnt, CAST(NULL AS BIGINT) AS rank,
           CAST(max_cnt AS DOUBLE) / n_rows AS share,
           CAST(max_cnt AS DOUBLE) * n_keys / n_rows AS skew_factor
    FROM stats
    UNION ALL
    SELECT 'top', t.k, s.n_rows, s.n_keys, t.cnt, t.rank,
           CAST(t.cnt AS DOUBLE) / s.n_rows,
           CAST(NULL AS DOUBLE)
    FROM top t CROSS JOIN stats s
    """,
)
def a7_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profile of lineitem.l_suppkey: one summary row
    (row/key counts, max/min key frequency, heaviest key's row share,
    and skew_factor = max_cnt / avg_cnt — 1.0 means perfectly uniform)
    plus the top-{SKEW_TOP_K} heavy hitters with their shares. A
    skew_factor over ~4-5 on a join key is the signal to salt (j13) or
    lean on AQE's skew-join split; this operator is how a pipeline
    measures that instead of guessing.

    Scale: one map-side-combined groupBy on the key, then a scalar
    aggregate over the (already small) per-key count table and a
    TakeOrderedAndProject top-K — no global window, no second corpus
    scan. Profiles at 100 TB cost one aggregation of the key column
    only (column-pruned scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.groupBy(F.col("l_suppkey").alias("k")).agg(F.count("*").alias("cnt"))
    stats = keyed.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min("cnt").cast("bigint").alias("min_cnt"),
    )
    top = (
        keyed.orderBy(F.desc("cnt"), F.asc("k"))
        .limit(SKEW_TOP_K)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("k")))
            .cast("bigint"),
        )
    )
    summary = stats.select(
        F.lit("summary").alias("part"),
        F.lit(None).cast("bigint").alias("k"),
        "n_rows",
        "n_keys",
        F.col("max_cnt").alias("cnt"),
        F.lit(None).cast("bigint").alias("rank"),
        (F.col("max_cnt").cast("double") / F.col("n_rows")).alias("share"),
        (F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("n_rows")).alias(
            "skew_factor"
        ),
    )
    topped = top.crossJoin(F.broadcast(stats)).select(
        F.lit("top").alias("part"),
        F.col("k").cast("bigint").alias("k"),
        "n_rows",
        "n_keys",
        F.col("cnt").cast("bigint").alias("cnt"),
        "rank",
        (F.col("cnt").cast("double") / F.col("n_rows")).alias("share"),
        F.lit(None).cast("double").alias("skew_factor"),
    )
    return summary.unionByName(topped)
