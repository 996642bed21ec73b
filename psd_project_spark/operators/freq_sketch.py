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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psd_project_spark.functions import hll_sql as HLL
from psd_project_spark.functions import text as T
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
    DOUBLE literals; sqrt is IEEE correctly-rounded in both)."""
    D = "CAST({} AS DOUBLE)"
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
        stages.append((f"{name}_est", f"round(mu + sigma * {w}, 6)"))
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
         sum(CAST(l_extendedprice AS {_MQ_DEC})) AS s1,
         sum(CAST(l_extendedprice * l_extendedprice AS {_MQ_DEC})) AS s2,
         sum(CAST(l_extendedprice * l_extendedprice * l_extendedprice
                  AS {_MQ_DEC})) AS s3
  FROM lineitem GROUP BY 1
),
{', '.join(ctes)}
SELECT l_returnflag, n, round(mu, 6) AS mean, round(sigma, 6) AS stddev,
       round(g1, 6) AS skewness, q10_est, q50_est, q90_est
FROM {cur} ORDER BY l_returnflag
"""


QUERIES["moments_quantile_sketch"] = (moments_quantile_sketch, _mq_oracle())
