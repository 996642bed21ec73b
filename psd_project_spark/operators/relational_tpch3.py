"""TPC-H-shape planner battery, part 3 — the remaining classic shapes.

The reference has no relational layer at all (SURVEY.md §2.9; its only
join-shaped op is the positional stats lookup, StreamingJob.java:369-385).
Parts 1–2 (operators/relational.py, relational_tpch.py) covered
Q1/Q3/Q4/Q5/Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22; this module adds
the remaining classic TPC-H plan shapes — Q2, Q9, Q11, Q12, Q16, Q20,
Q21 — **adapted to the driver's schema**: the testdata has no
``partsupp`` table and lineitem carries no commit/receipt dates, so the
part↔supplier "offer" relation is derived from lineitem facts and
"late" is defined as shipping > N days after the order date. What is
preserved is the *shape* each query exists to exercise:

- Q2  correlated-min-per-group, decorrelated: offers → min unit cost
  per part → equality join back (never a re-executed subquery).
- Q9  multi-dim profit rollup: 4-way join, profit expression pushed
  into the scan projection, agg by (nation, year).
- Q11 group-HAVING-above-global-fraction: per-key aggregate reused for
  both the groups and the 1-row global threshold (broadcast crossJoin).
- Q12 date-arithmetic join filter + conditional two-way counts.
- Q16 distinct-pair dedup → anti join (NOT IN) → count-distinct per
  attribute triple.
- Q20 nested correlated threshold (share-of-part total) → semi join
  onto suppliers.
- Q21 the four-way self-referential EXISTS / NOT EXISTS on the fact
  table, planned as one scan + semi + anti joins on the order key.

Scale notes (100 TB): dims filter *before* joining and broadcast;
every lineitem self-reference shuffles once on ``l_orderkey`` and is
reused (semi + anti hang off the same shuffle key); aggregates use
map-side partial combine; money sums accumulate in DECIMAL(27,15) so
results are order-independent and bit-identical to the DuckDB oracle
regardless of partitioning or AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.sources.registry import load_table

_DEC = "decimal(27,15)"


def _dsum(col) -> F.Column:
    return F.sum(col.cast(_DEC)).cast("double")


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# --- q2: min-cost supplier per part (correlated min, decorrelated) ----------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every LARGE part of size ≤ 10, the region-0 supplier(s)
    offering it at the minimum observed unit price.

    The part↔supplier offer relation is derived from lineitem:
    ``unit_cost = min(l_extendedprice / l_quantity)`` per
    (partkey, suppkey) — the driver schema has no partsupp
    (cf. reference absence, SURVEY.md §2.9). Plan shape: the classic Q2
    correlated ``MIN(ps_supplycost)`` subquery is decorrelated into a
    second aggregate over the *same* filtered offers frame joined back
    by part + cost equality; part and supplier dims are filtered before
    joining and broadcast (selective filters on bounded dims). The
    per-part minima frame is part-cardinality — unbounded at 100 TB —
    so it carries NO broadcast hint: both join sides are already
    hash-partitioned on p_partkey from their aggregates (exchange-free
    sort-merge), and AQE still picks broadcast when it measures small.
    ``min`` is order-independent, so the float equality join is
    deterministic across partitionings.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_brand")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(F.min("unit").alias("unit_cost"))
    )
    best = offers.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        offers.join(
            best,
            (F.col("p_partkey") == F.col("bk"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round(F.col("unit_cost"), 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_ORACLE = """
WITH offers AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_type = 'LARGE' AND p_size <= 10 AND n_regionkey = 0
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(CAST(round(CAST(CAST(unit_cost AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS unit_cost
FROM offers o
WHERE unit_cost = (
  SELECT min(unit_cost) FROM offers i WHERE i.p_partkey = o.p_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- q9: product-type profit by nation and year -----------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'small *' parts by supplier nation and order year.

    Classic Q9 shape: fact joined to part (name filter), supplier,
    nation, orders; the profit expression — revenue minus a cost proxy
    of ``0.6 * p_retailprice * l_quantity`` (no ps_supplycost in the
    driver schema) — is projected before aggregation so the rollup is a
    single shuffle on (nation, year). part/supplier/nation broadcast;
    lineitem⋈orders shuffles on orderkey.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(_dsum(amount), 6).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(CAST(round(CAST(CAST(CAST(CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount)
                           - 0.6 * p_retailprice * l_quantity
                           AS STRING) AS DECIMAL(27,15))) AS STRING) AS DOUBLE) AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE 'small%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --- q11: important parts (group sum above a global fraction) ---------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose region-0 sales value exceeds 0.1% of the total.

    Classic Q11 shape: one per-part aggregate reused twice — once as
    the output groups, once re-aggregated to the 1-row global total
    that becomes the HAVING threshold via a broadcast crossJoin. The
    per-part values are rounded *before* the second aggregate so both
    engines thresh on identical doubles.
    """
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    from psd_project_spark.functions.caching import transient_cache

    # cached: the per-part rollup feeds the 1-row global threshold AND
    # the output filter — one lineitem join+aggregate pass instead of
    # two (guide §5)
    per_part = transient_cache(
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", _revenue().alias("rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.round(_dsum(F.col("rev")), 6).alias("part_value"))
    )
    threshold = per_part.agg(
        (F.sum(F.col("part_value").cast(_DEC)).cast("double") * F.lit(0.001))
        .alias("cut")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cut"))
        .select("p_partkey", "part_value")
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(CAST(round(CAST(CAST(CAST(CAST(sum(CAST(CAST(l_extendedprice * (1.0 - l_discount)
                             AS STRING) AS DECIMAL(27,15))) AS STRING) AS DOUBLE) AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 0
  GROUP BY 1
)
SELECT p_partkey, part_value
FROM per_part
WHERE part_value > (
  SELECT CAST(CAST(sum(CAST(CAST(part_value AS STRING) AS DECIMAL(27,15))) AS STRING) AS DOUBLE) * 0.001
  FROM per_part
)
ORDER BY part_value DESC, p_partkey
"""


# --- q12: late-shipment priority counts -------------------------------------

def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: how many lines shipped > 90 days after the
    order date, split into critical (URGENT/HIGH) vs other priorities.

    Classic Q12 shape: orders⋈lineitem on the fact key with a
    date-arithmetic filter, then conditional counts in one pass (no
    second scan, no self-join). ``l_returnflag`` stands in for the
    absent ``l_shipmode``; ship-vs-order-date lag stands in for the
    absent commit/receipt dates.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1
ORDER BY 1
"""


# --- q16: supplier counts by part attributes (dedup + NOT IN) ---------------

def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers able to supply each (brand, type, size)
    combo, excluding Brand#1 / PROMO parts and suppliers with negative
    balances.

    Classic Q16 shape: the part↔supplier pair set is deduped *first*
    (``dropDuplicates`` on the two keys — one shuffle on a shrinking
    input), the NOT-IN complaint subquery becomes a broadcast left-anti
    join, and the final count is COUNT(DISTINCT) per attribute triple.
    """
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (~F.col("p_type").like("PROMO%"))
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 22, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_suppkey"))
    return (
        pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 14, 19, 22, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q20: suppliers with a dominant share of a part's shipments -------------

def q20_dominant_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-1 suppliers who shipped > 30% of the total 1995 volume of
    some 'red *' part.

    Classic Q20 shape: a correlated quantity threshold — here share of
    the part's own total instead of the absent ``ps_availqty`` —
    evaluated via one grouped frame plus a per-part total joined back,
    then collapsed to a supplier id set that SEMI-joins the supplier
    dim. The supplier table is never multiplied by qualifying parts.
    """
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    totals = shipped.groupBy(F.col("p_partkey").alias("tk")).agg(
        F.sum("qty").alias("part_total")
    )
    qualifying = (
        shipped.join(F.broadcast(totals), F.col("p_partkey") == F.col("tk"))
        .filter(F.col("qty") > F.lit(0.3) * F.col("part_total"))
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            qualifying,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
WITH shipped AS (
  SELECT p_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 1
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped o
    WHERE qty > 0.3 * (SELECT sum(qty) FROM shipped i
                       WHERE i.p_partkey = o.p_partkey)
  )
ORDER BY s_suppkey
"""


# --- q21: suppliers who alone shipped late in multi-supplier orders ---------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per region-0 supplier: finalized multi-supplier orders where
    *only* this supplier shipped late (> 60 days after the order date).

    Classic Q21 shape: one lineitem scan referenced three ways — the
    late lines (l1), an EXISTS for another supplier on the same order
    (semi join), a NOT EXISTS for another *late* supplier on the same
    order (anti join) — all co-keyed on ``l_orderkey`` so the three
    hang off one shuffle, never a per-row subquery. ``late`` derives
    from ship-vs-order-date lag (no receipt/commit dates in schema).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late1 = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late3 = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    lone_late = (
        late1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        lone_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_regionkey = 0
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND o3.o_orderstatus = 'F'
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_ORACLE),
    "q9_product_profit": (q9_product_profit, Q9_ORACLE),
    "q11_important_parts": (q11_important_parts, Q11_ORACLE),
    "q12_late_shipment_priority": (q12_late_shipment_priority, Q12_ORACLE),
    "q16_supplier_count": (q16_supplier_count, Q16_ORACLE),
    "q20_dominant_share_suppliers": (
        q20_dominant_share_suppliers,
        Q20_ORACLE,
    ),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_ORACLE),
}
