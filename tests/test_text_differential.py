"""The Arrow-batched shingle UDF must produce EXACTLY the arrays the
Catalyst HOF expression form produces (same strings, same
first-occurrence order) — the HOF fragments still generate the DuckDB
oracles, so any drift here is an oracle break."""

import pytest
from pyspark.sql import functions as F

import psd_project_spark.functions.text as T
from psd_project_spark.functions.text_udfs import make_shingles_udf
from psd_project_spark.sources.registry import load_table
from tests.conftest import SF_DIR, SF_DIR_MID


@pytest.mark.parametrize("k", [3, 4])
@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID])
def test_shingles_udf_equals_hof_expression(spark, k, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    both = d.select(
        "doc_id",
        make_shingles_udf(k)(F.col("text")).alias("udf"),
        F.expr(
            T.shingles_expr(f"({T.tokens_expr()})", k=k)
        ).alias("hof"),
    )
    bad = both.filter(F.col("udf") != F.col("hof")).count()
    assert bad == 0


def test_shingles_udf_edge_cases(spark):
    rows = [
        (1, ""),
        (2, "one"),
        (3, "a b c"),
        (4, "  padded  doc  here  "),
        (5, "x y x y x y"),  # duplicate shingles → first-occurrence dedup
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    both = d.select(
        "doc_id",
        make_shingles_udf(3)(F.col("text")).alias("udf"),
        F.expr(T.shingles_expr(f"({T.tokens_expr()})", k=3)).alias("hof"),
    ).collect()
    for r in both:
        assert list(r["udf"]) == list(r["hof"]), (r["doc_id"], r["udf"], r["hof"])
